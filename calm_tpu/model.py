"""The parameterized decoder-only transformer, TPU-native.

One forward function covers every supported architecture family
(Llama/Mistral/Mixtral/Qwen2/Yi/OLMo(+E)/Gemma/MiniCPM/Cohere/InternLM2/
DBRX/Phi3/Xverse) through ModelConfig knobs, mirroring the reference's single
parameterized transformer (src/model.h:12-30, src/infer.c:311-472) —
re-designed as a pure-functional JAX program:

- weights are a pytree of QTensors stacked over layers, so the whole layer
  stack runs under one ``lax.scan`` — the TPU analogue of the reference's
  "one cooperative kernel per token" (src/infer.cu:404-626): a single jitted
  program per decode step, no per-layer dispatch overhead
- the KV cache is a donated buffer updated with scatters; attention sinks +
  rolling window (StreamingLLM, reference src/infer.c:329-332,383-394) are
  computed from a traced ``pos`` so no recompilation ever happens mid-stream
- batched prefill (B, T) is first-class (the reference processes prompts
  serially, README.md:80 — here prefill rides the MXU)
- tensor/expert parallelism (new scope vs the single-GPU reference,
  SURVEY.md §2.3) is expressed with explicit collectives: the same layer code
  runs under ``shard_map`` with a ShardingPlan naming the mesh axes; local
  dimensions are derived from the (sharded) weight shapes, and partial sums
  close with one psum per residual write.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from calm_tpu.config import ModelConfig
from calm_tpu.container import TensorFile
from calm_tpu.ops.norms import rmsnorm
from calm_tpu.ops.qmm import QTensor, embed_lookup, qmatmul
from calm_tpu.ops.rope import apply_rope, rope_tables
from calm_tpu.parallel.plan import NO_SHARDING, ShardingPlan

KV_SINKS = 2  # attention sinks kept live in the rolling window


def _shallow_pytree(cls):
    """Register a dataclass as a pytree over its (non-recursed) fields."""
    def flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    cls.tree_flatten = flatten
    cls.tree_unflatten = classmethod(lambda c, aux, ch: c(*ch))
    return jax.tree_util.register_pytree_node_class(cls)


@_shallow_pytree
@dataclasses.dataclass
class LayerWeights:
    attn_norm: Any   # (L, D) f32
    ffn_norm: Any    # (L, D) f32 (zeros when norm_par)
    wq: QTensor      # (L, q_dim, D)
    wk: QTensor      # (L, kv_dim, D)
    wv: QTensor      # (L, kv_dim, D)
    wo: QTensor      # (L, D, q_dim)
    bq: Any          # (L, q_dim) f32 (zeros when absent)
    bk: Any          # (L, kv_dim) f32
    bv: Any          # (L, kv_dim) f32
    w1: QTensor      # (L, [E,] H, D)
    w2: QTensor      # (L, [E,] D, H)
    w3: QTensor      # (L, [E,] H, D)
    moegate: Any     # QTensor (L, E, D) or None
    q_norm: Any = None  # (L, q_dim) f32 when cfg.norm_qk (OLMoE), else None
    k_norm: Any = None  # (L, kv_dim) f32 when cfg.norm_qk, else None
    # fused-gf4 decode layouts (fuse_gf4_weights); None unless the
    # single-device gf4 decode path is active:
    # w1p/w3p: (L, 8, H/8, D/8) i32 plane-major, [l, k, c] = w1[l, 8c+k]
    # w2t:     (L, H/8, D) i32 word-transposed so a word-column tile is a
    #          CONTIGUOUS slab (the (D, tc) column slice of the natural
    #          layout reads 1 KB per 5.5 KB row stride — measured slower
    #          than the 3-call path it replaced)
    # wqkv:    (L, Q+2*KV, D/8) i32 row-concat of wq/wk/wv: one kernel call
    #          instead of three (each extra dependent pallas call stalls
    #          ~12-25 us, docs/PERF_NOTES.md)
    w1p: Any = None
    w3p: Any = None
    w2t: Any = None
    wqkv: Any = None
    # plane-permuted-stream decode layouts (the offn tier): the residual
    # stream itself is carried plane-permuted ((B, 8, D/8), [:, j, c] =
    # x[:, 8c+j]) so wo + residual + ffn-norm + FFN run as ONE kernel
    # (pallas_qmm.gf4_offn) with no in-kernel activation transpose (Mosaic
    # cannot lower one — docs/PERF_NOTES.md "Trace-attributed"):
    # wo_p:  (L, 8, D/8, Q/8) plane-major over wo's OUTPUT rows
    # w2tp:  (L, H/8, D) word-transposed w2 with plane-PERMUTED output
    #        columns (replaces w2t in this tier)
    # an_pl: (L, D) f32 attn-norm weights in permuted element order
    # fn_pl: (L, 8, D/8) f32 ffn-norm weights, permuted
    wo_p: Any = None
    w2tp: Any = None
    an_pl: Any = None
    fn_pl: Any = None
    # MoE gf4: per-expert plane-major w1/w3 (L, E, 8, H/8, D/8) REPLACING
    # the natural stacks (same bytes — fuse_gf4_weights re-lays them out in
    # place); w2 stays natural, the fused MoE kernel streams it row-tiled
    w1pe: Any = None
    w3pe: Any = None


@_shallow_pytree
@dataclasses.dataclass
class Weights:
    embed: QTensor       # (V, D)
    layers: LayerWeights
    final_norm: Any      # (D,) f32
    output: QTensor      # (V, D); may alias embed (tied)


@_shallow_pytree
@dataclasses.dataclass
class KVCache:
    """Head-major cache: each (kv-head, S, hd) plane is contiguous so decode
    attention streams it linearly (the TPU analogue of the reference's
    transposed K/V layouts, src/infer.cu:474-481)."""

    k: jax.Array  # (L, B, KVH, S, HD)
    v: jax.Array  # (L, B, KVH, S, HD)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int = 1, dtype=jnp.bfloat16,
               tp_size: int = 1) -> "KVCache":
        shape = (cfg.n_layers, batch, cfg.n_kv_heads // tp_size,
                 cfg.seq_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# weight loading
# ---------------------------------------------------------------------------


def _file_dtype(fmt: str):
    import ml_dtypes
    return {"fp16": np.dtype(np.float16),
            "fp8": np.dtype(ml_dtypes.float8_e5m2),
            "fp8e4": np.dtype(ml_dtypes.float8_e4m3fn),
            "gf4": np.dtype(np.int32)}[fmt]


class WeightDesc:
    """Lazy host-side view of one (possibly layer-stacked) container tensor.

    ``fetch(index)`` materializes only the requested slice: the underlying
    container is an np.memmap, so a row/column shard faults in just its own
    file pages — this is what lets each host of a multi-host mesh read only
    its 1/tp (1/ep, 1/pp) of the weights (SURVEY.md §5 checkpoint row; the
    reference is single-GPU and always reads everything, src/run.c:550-574).
    """

    __slots__ = ("shape", "dtype", "_fetch", "fetched_bytes")

    def __init__(self, shape, dtype, fetch):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self._fetch = fetch
        self.fetched_bytes = 0  # instrumentation for loading tests

    def fetch(self, index=None) -> np.ndarray:
        if index is None:
            index = (slice(None),) * len(self.shape)
        out = np.ascontiguousarray(self._fetch(tuple(index)))
        self.fetched_bytes += out.nbytes
        return out


def weight_descs(tf: TensorFile, cfg: ModelConfig) -> Weights:
    """A Weights-shaped pytree whose leaves are WeightDescs (QTensor.data /
    .scale included). Name schema and shape validation mirror the reference
    loader (src/run.c:71-117): gf4 tensors pack the contraction axis 8:1;
    the qkv bias rides as one fused tensor in the container and is split
    here so each section can shard with its projection.
    """
    fmt = cfg.dtype
    wdt = _file_dtype(fmt)
    gs = 8 if fmt == "gf4" else 1
    L = cfg.n_layers
    D, Hd, Q, KV, V, E = (cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim,
                          cfg.vocab_size, cfg.n_experts)

    def desc(name, shape, dtype=None):
        dtype = wdt if dtype is None else dtype
        tf.get(name, None, dtype, shape)  # validate now, fetch lazily
        return WeightDesc(shape, dtype,
                          lambda idx: tf.get(name, None, dtype, shape)[idx])

    def desc_stack(name, per_layer_shape, dtype=None):
        """(L, *per_layer_shape) stacked lazily: a layer/pp shard stacks
        only its own layers' slices."""
        dtype = wdt if dtype is None else dtype
        for l in range(L):
            tf.get(name, l, dtype, per_layer_shape)  # validate all layers

        def fetch(idx):
            ls = range(L)[idx[0]]
            rest = idx[1:] if len(idx) > 1 else ()
            parts = [tf.get(name, l, dtype, per_layer_shape)[rest]
                     for l in ls]
            return np.stack(parts)

        return WeightDesc((L,) + tuple(per_layer_shape), dtype, fetch)

    def desc_const(arr):
        return WeightDesc(arr.shape, arr.dtype, lambda idx: arr[idx])

    def qdesc(name, shape):
        scale = (desc(name + ".scale", (1,), np.float32)
                 if fmt == "fp8e4" else None)
        return QTensor(desc(name, shape), fmt, scale)

    def qdesc_stack(name, shape, scale_shape=(1,)):
        scale = (desc_stack(name + ".scale", scale_shape, np.float32)
                 if fmt == "fp8e4" else None)
        return QTensor(desc_stack(name, shape), fmt, scale)

    embed = qdesc("model.embed.weight", (V, D // gs))

    attn_norm = desc_stack("model.layers.%d.attn.norm.weight", (D,),
                           np.float32)
    if cfg.norm_par:
        ffn_norm = desc_const(np.zeros((L, D), np.float32))
    else:
        ffn_norm = desc_stack("model.layers.%d.mlp.norm.weight", (D,),
                              np.float32)

    wq = qdesc_stack("model.layers.%d.attn.wq.weight", (Q, D // gs))
    wk = qdesc_stack("model.layers.%d.attn.wk.weight", (KV, D // gs))
    wv = qdesc_stack("model.layers.%d.attn.wv.weight", (KV, D // gs))
    wo = qdesc_stack("model.layers.%d.attn.wo.weight", (D, Q // gs))

    if tf.find("model.layers.%d.attn.wqkv.bias", 0):
        bqkv = np.stack([np.asarray(
            tf.get("model.layers.%d.attn.wqkv.bias", l, np.float32,
                   (Q + 2 * KV,))) for l in range(L)])
    else:
        bqkv = np.zeros((L, Q + 2 * KV), np.float32)
    bq = desc_const(np.ascontiguousarray(bqkv[:, :Q]))
    bk = desc_const(np.ascontiguousarray(bqkv[:, Q:Q + KV]))
    bv = desc_const(np.ascontiguousarray(bqkv[:, Q + KV:]))

    if E:
        # MoE expert stacks quantize per (layer, expert): scales are (L, E, 1)
        def qdesc_moe(name, shape):
            return qdesc_stack(name, shape, scale_shape=(E, 1))

        w1 = qdesc_moe("model.layers.%d.mlp.w1.weight", (E, Hd, D // gs))
        w2 = qdesc_moe("model.layers.%d.mlp.w2.weight", (E, D, Hd // gs))
        w3 = qdesc_moe("model.layers.%d.mlp.w3.weight", (E, Hd, D // gs))
        moegate = qdesc_stack("model.layers.%d.moegate.weight", (E, D // gs))
    else:
        w1 = qdesc_stack("model.layers.%d.mlp.w1.weight", (Hd, D // gs))
        w2 = qdesc_stack("model.layers.%d.mlp.w2.weight", (D, Hd // gs))
        w3 = qdesc_stack("model.layers.%d.mlp.w3.weight", (Hd, D // gs))
        moegate = None

    if cfg.norm_qk:
        q_norm = desc_stack("model.layers.%d.attn.q_norm.weight", (Q,),
                            np.float32)
        k_norm = desc_stack("model.layers.%d.attn.k_norm.weight", (KV,),
                            np.float32)
    else:
        q_norm = k_norm = None

    final_norm = desc("model.norm.weight", (D,), np.float32)

    if tf.find("model.output.weight") is None:
        output = embed  # tied embeddings (same descs: fetched once per shard)
    else:
        output = qdesc("model.output.weight", (V, D // gs))

    layers = LayerWeights(
        attn_norm=attn_norm, ffn_norm=ffn_norm,
        wq=wq, wk=wk, wv=wv, wo=wo, bq=bq, bk=bk, bv=bv,
        w1=w1, w2=w2, w3=w3, moegate=moegate,
        q_norm=q_norm, k_norm=k_norm)

    return Weights(embed=embed, layers=layers,
                   final_norm=final_norm, output=output)


def _is_desc(x):
    return isinstance(x, WeightDesc)


def fuse_gf4_weights(w: Weights, cfg: ModelConfig,
                     reserve_bytes: int = 0,
                     epilogue: bool = True, xp=jnp) -> Weights:
    """Re-lay-out gf4 weights into the plane-major decode layouts IN PLACE
    of the naturals — the TPU analogue of the Metal backend's load-time
    weight massage (src/infer.m:134-164) taken to its conclusion: every
    layout is a pure permutation of the packed words (same bytes), the
    natural original is DROPPED once its permutation exists, and the XLA
    paths (prefill, CPU, Pallas-declined shapes) consume the permuted
    layouts directly (ops/qmm.py qmatmul_w1p/_w2t/_wo_p). Zero HBM
    duplication -> FULL fusion at any model size / KV dtype; peak device
    transient during the massage is one weight stack.

    ``reserve_bytes`` is accepted for API compatibility and ignored — with
    no duplicates there is no budget to tier against.

    TAKES OWNERSHIP of ``w``: the input pytree is mutated (originals become
    None as their re-laid-out buffers land). Don't reuse the argument after
    calling; use the return value. No-op for non-gf4 or already-fused
    weights.

    ``epilogue=False`` skips the offn (plane-permuted-stream) tier and
    keeps natural wo + w2t: the fused epilogue folds the residual close
    into one kernel, which is wrong under tp (the wo partial needs a psum
    first) — the per-shard fusion (parallel/sharding.py) passes False.

    Also runs as a TRACED function (inside shard_map for per-shard fusion
    of tp/ep-sharded weights): all layout ops are jnp, and the transient-
    management block_until_ready is skipped on tracers.

    ``xp=numpy`` runs the same permutations on a HOST pytree (numpy
    leaves) — used by load_weights_fused so big models never pay the
    device-side permutation transient (a Mixtral-geometry 12 GiB gf4
    expert stack + its 3.8 GiB transpose output OOMs the 16 GiB chip)."""
    del reserve_bytes
    if (cfg.dtype != "gf4" or w.layers.w1p is not None
            or w.layers.w1pe is not None
            or w.layers.wqkv is not None or cfg.hidden_dim % 8):
        return w
    layers = w.layers

    def take(field):
        d = xp.asarray(getattr(layers, field).data)
        setattr(layers, field, None)
        return d

    def settle(x):
        if not isinstance(x, jax.core.Tracer):
            jax.block_until_ready(x)
        return x

    # qkv row-concat: one kernel call instead of three. The concat is the
    # only non-permutation (it copies); drop the originals right after so
    # the transient is one qkv group, not two.
    wqkv = settle(xp.concatenate([take("wq"), take("wk"), take("wv")],
                                 axis=1))
    if cfg.n_experts:
        # MoE: per-expert plane-major w1/w3 feed the one-call fused FFN
        # sweep (pallas_qmm.gf4_moe_ffn); w2 stays NATURAL — the fused
        # kernel tiles it over output rows where natural is contiguous.
        He = layers.w1.shape[2]
        if He % 8 == 0:
            Lw, E = layers.w1.data.shape[:2]
            gd = layers.w1.data.shape[3]

            def planes_e(d):
                return settle(d.reshape(Lw, E, He // 8, 8, gd)
                              .transpose(0, 1, 3, 2, 4))

            layers = dataclasses.replace(
                layers, w1pe=planes_e(take("w1")),
                w3pe=planes_e(take("w3")), wqkv=wqkv)
        else:
            layers = dataclasses.replace(layers, wqkv=wqkv)
        return Weights(embed=w.embed, layers=layers,
                       final_norm=w.final_norm, output=w.output)

    L, H, gd = layers.w1.data.shape
    D = 8 * gd

    def planes(d):
        return settle(d.reshape(L, H // 8, 8, gd).transpose(0, 2, 1, 3))

    w1p = planes(take("w1"))
    w3p = planes(take("w3"))
    w2t = settle(take("w2").transpose(0, 2, 1))  # (L, H/8, D)

    # offn tier: ALSO plane-permute the epilogue weights so decode runs
    # wo + residual + ffn-norm + FFN as one kernel on a plane-permuted
    # residual stream (pallas_qmm.gf4_offn). Requires a post-attn norm
    # (norm_par reuses the attn-normed input — epilogue shape differs).
    if not cfg.norm_par and epilogue:
        wo_p = settle(take("wo").reshape(L, gd, 8, -1).transpose(0, 2, 1, 3))
        w2tp = settle(w2t.reshape(L, H // 8, gd, 8).transpose(0, 1, 3, 2)
                      .reshape(L, H // 8, D))
        w2t = None
        an_pl = (xp.asarray(layers.attn_norm)
                 .reshape(L, gd, 8).transpose(0, 2, 1).reshape(L, D))
        fn_pl = (xp.asarray(layers.ffn_norm)
                 .reshape(L, gd, 8).transpose(0, 2, 1))
        layers = dataclasses.replace(
            layers, w1p=w1p, w3p=w3p, wqkv=wqkv,
            wo_p=wo_p, w2tp=w2tp, an_pl=an_pl, fn_pl=fn_pl)
    else:
        layers = dataclasses.replace(layers, w1p=w1p, w3p=w3p, w2t=w2t,
                                     wqkv=wqkv)
    return Weights(embed=w.embed, layers=layers, final_norm=w.final_norm,
                   output=w.output)


def load_weights(tf: TensorFile, cfg: ModelConfig) -> Weights:
    """Wire container tensors into the (host-replicated) device pytree."""
    descs = weight_descs(tf, cfg)
    fetched: dict[int, jax.Array] = {}  # tied embed/output load once

    def materialize(d: WeightDesc):
        key = id(d)
        if key not in fetched:
            fetched[key] = jnp.asarray(d.fetch())
        return fetched[key]

    return jax.tree.map(materialize, descs, is_leaf=_is_desc)


def load_weights_fused(tf: TensorFile, cfg: ModelConfig) -> Weights:
    """Load + gf4-fuse with the permutations run on HOST (numpy over the
    memmap'd naturals), then upload the finished layouts. Bit-identical to
    fuse_gf4_weights(load_weights(...)) — the permutations move the same
    packed words — but the device never holds a natural + its permutation
    simultaneously: the device-side massage transposes a full weight stack
    (one 3.8 GiB transient for a Mixtral-geometry expert stack on top of
    ~12 GiB resident = OOM on a 16 GiB v5e). No-op fusion for non-gf4."""
    descs = weight_descs(tf, cfg)
    fetched: dict[int, np.ndarray] = {}  # tied embed/output fetch once

    def materialize(d: WeightDesc):
        key = id(d)
        if key not in fetched:
            fetched[key] = d.fetch()
        return fetched[key]

    host = jax.tree.map(materialize, descs, is_leaf=_is_desc)
    host = fuse_gf4_weights(host, cfg, xp=np)

    uploaded: dict[int, jax.Array] = {}  # keep tied tensors tied on device

    def upload(x):
        key = id(x)
        if key not in uploaded:
            uploaded[key] = jnp.asarray(x)
        return uploaded[key]

    return jax.tree.map(upload, host)


# ---------------------------------------------------------------------------
# forward pass
# ---------------------------------------------------------------------------


def _psum(x, axes: tuple[str, ...]):
    return jax.lax.psum(x, axes) if axes else x


def _close_residual(y, plan: ShardingPlan, with_ep: bool = False):
    """Close a row-sharded matvec's partial sum over tp (and ep for MoE).

    plan.rs_ag decomposes the tp all-reduce into reduce-scatter +
    all-gather along the feature axis: same reduction (bitwise, ring order
    aside), but two independent collectives that XLA's latency-hiding
    scheduler can overlap with adjacent compute — the BASELINE's
    "collectives overlapped with matmul" formulation. ``with_ep`` adds the
    ep close for the MoE ffn (expert partials are dense over the feature
    axis, so ep still closes with a psum first).
    """
    if with_ep and plan.ep is not None:
        y = jax.lax.psum(y, plan.ep)
    if plan.tp is None:
        return y
    if plan.rs_ag:
        part = jax.lax.psum_scatter(y, plan.tp,
                                    scatter_dimension=y.ndim - 1, tiled=True)
        return jax.lax.all_gather(part, plan.tp, axis=y.ndim - 1, tiled=True)
    return jax.lax.psum(y, plan.tp)


def pallas_decode_enabled() -> bool:
    from calm_tpu.ops import qmm
    return qmm._USE_PALLAS


def _norm(cfg: ModelConfig, x, weight):
    return rmsnorm(x, weight, cfg.norm_eps, subtract_mean=cfg.norm_ln)


def _act(cfg: ModelConfig, x):
    if cfg.act_gelu:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.silu(x)


def _clip(cfg: ModelConfig, x):
    if math.isfinite(cfg.qkv_clip):
        return jnp.clip(x, -cfg.qkv_clip, cfg.qkv_clip)
    return x


def _qk_norm(cfg: ModelConfig, x, weight, global_dim: int, tp_axis):
    """Full-vector RMSNorm on a q/k projection (OLMoE). Under tp the vector
    is column-sharded, so the mean-square closes with a scalar psum; the
    norm weight rides permuted/sharded with its projection rows, and the
    mean-square is permutation-invariant, so numerics match the unsharded
    HF forward exactly."""
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    if tp_axis is not None:
        ss = jax.lax.psum(ss, tp_axis)
    return x * jax.lax.rsqrt(ss / global_dim + cfg.norm_eps) * weight


def _embed(cfg: ModelConfig, embed: QTensor, tokens, plan: ShardingPlan):
    """Token embedding; vocab-sharded under tp with masked lookup + psum."""
    if plan.tp is None:
        return embed_lookup(tokens, embed)
    v_local = embed.data.shape[0]
    off = jax.lax.axis_index(plan.tp) * v_local
    lid = tokens - off
    ok = (lid >= 0) & (lid < v_local)
    rows = embed_lookup(jnp.clip(lid, 0, v_local - 1), embed)
    return jax.lax.psum(rows * ok[..., None], plan.tp)


def _attention(cfg: ModelConfig, q, kc, vc, layer, q_pos, kv_len,
               batch_off=None, fresh=None, plan: ShardingPlan = NO_SHARDING,
               pt=None, tree=None):
    """GQA attention over the (possibly rolled) cache — fully head-local
    (cache is sharded over kv-heads under tp, so no collective here).

    q: (B, T, H, hd); caches: (L, B, KVH, S, hd) with ``layer`` selecting
    the plane; q_pos: (B, T) absolute positions; kv_len: (B,) valid rows.

    The decode path hands the FULL stacked cache to the Pallas kernel and
    indexes the layer inside it — slicing here would materialize a copy of
    the whole (B, KVH, S, hd) plane every layer (measured ~3 ms/token at 7B).

    Masking rule: cache row s is visible to query t iff s < kv_len[b] and,
    when the query is part of an in-window prefill (q_pos < S), s <= q_pos
    (causality). For rolled decode (q_pos >= S) every valid row is visible —
    cache rows are not time-ordered after wrap but attention is
    position-agnostic post-RoPE (reference: src/infer.c:330-332).
    """
    B, T, H, hd = q.shape
    KVH = kc.shape[2]
    M = H // KVH
    sp_decode = plan.sp is not None and T == 1

    qf = q.reshape(B, T, KVH, M, hd).astype(jnp.float32)

    if pallas_decode_enabled() and T == 1 and not sp_decode:
        from calm_tpu.ops import pallas_attn
        out = pallas_attn.decode_attention(
            qf[:, 0].reshape(B, KVH * M, hd), kc, vc, kv_len, layer,
            jnp.int32(0) if batch_off is None else batch_off, fresh=fresh,
            pt=pt)
        return out.reshape(B, T, H * hd)

    if pallas_decode_enabled() and sp_decode and pt is None:
        # sp decode on the Pallas kernel: each shard runs flash decode over
        # its LOCAL S-shard and emits unnormalized (acc, max, sum); the
        # exact softmax closes with one pmax + two psums over sp (the
        # flash-decoding split-KV merge, across chips). Masking: local
        # kv_len = how many of this shard's rows [off, off+S_loc) are
        # globally valid — causality is subsumed (decode kv_len = pos+1;
        # rolled windows expose every valid row, src/infer.c:330-332).
        from calm_tpu.ops import pallas_attn
        S_loc = kc.shape[3]
        off = jax.lax.axis_index(plan.sp) * S_loc
        kv_loc = jnp.clip(kv_len - off, 0, S_loc)
        acc, m_loc, l_loc = pallas_attn.decode_attention(
            qf[:, 0].reshape(B, KVH * M, hd), kc, vc, kv_loc, layer,
            jnp.int32(0) if batch_off is None else batch_off, partials=True)
        m_glob = jax.lax.pmax(m_loc, plan.sp)
        scale = jnp.exp(m_loc - m_glob)  # -inf (empty shard) -> 0
        num = jax.lax.psum(acc * scale, plan.sp)
        l_glob = jax.lax.psum(l_loc * scale, plan.sp)
        return (num / l_glob).reshape(B, T, H * hd)

    k_cache = jax.lax.dynamic_index_in_dim(kc, layer, 0, keepdims=False)
    v_cache = jax.lax.dynamic_index_in_dim(vc, layer, 0, keepdims=False)
    if pt is not None:
        # jnp oracle for the paged layout: gather slot pages back to a
        # dense (B, KVH, n_blocks*PR, hd) view (off the hot path)
        PR = kc.shape[3]
        nb = pt.shape[1]
        k_cache = (k_cache[pt].transpose(0, 2, 1, 3, 4)
                   .reshape(B, KVH, nb * PR, hd))
        v_cache = (v_cache[pt].transpose(0, 2, 1, 3, 4)
                   .reshape(B, KVH, nb * PR, hd))
    elif batch_off is not None:
        k_cache = jax.lax.dynamic_slice_in_dim(k_cache, batch_off, B, axis=0)
        v_cache = jax.lax.dynamic_slice_in_dim(v_cache, batch_off, B, axis=0)
    S = k_cache.shape[2]

    # fast (TPU) mode: bf16 operands + f32 accumulation ride the MXU at
    # full rate; the precise f32 path remains the test oracle off-TPU
    cdt = jnp.bfloat16 if pallas_decode_enabled() else jnp.float32
    kf = k_cache.astype(cdt)
    vf = v_cache.astype(cdt)

    scores = jnp.einsum("btkmh,bksh->bkmts", qf.astype(cdt), kf,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)

    # sp decode: this shard holds cache rows [off, off + S); masks use
    # GLOBAL row ids and the softmax merges across shards below
    off = (jax.lax.axis_index(plan.sp) * S) if sp_decode else 0
    s_glob = cfg.seq_len if sp_decode else S

    s_idx = off + jnp.arange(S)[None, None, :]                 # (1, 1, S)
    valid = s_idx < kv_len[:, None, None]                      # (B, 1, S)
    causal = s_idx <= q_pos[:, :, None]                        # (B, T, S)
    rolled = (q_pos[:, :, None] >= s_glob)                     # wrap: all valid rows visible
    mask = valid & (causal | rolled)                           # (B, T, S)
    if tree is not None:
        # draft-tree verify (tree_verify_fn): the T queries are the tree's
        # nodes, living in cache rows [kv_len - N, kv_len); a node sees the
        # plain context below the tree plus its ANCESTORS only — the
        # flat-causal rule would let siblings leak across lanes
        N = tree.shape[0]
        # tree[None] broadcast to (B, T, N) below assumes query t IS tree
        # node t; a caller passing a tree whose node count differs from the
        # query count would get silently wrong masking if shapes happened
        # to broadcast
        assert T == N, f"tree verify needs one query per node (T={T}, N={N})"
        p0 = kv_len[:, None, None] - N                         # (B, 1, 1)
        in_tree = (s_idx >= p0) & (s_idx < kv_len[:, None, None])
        col = jnp.clip(s_idx - p0, 0, N - 1)                   # (B, 1, S)
        tv = jnp.take_along_axis(
            jnp.broadcast_to(tree[None], (B, T, N)),
            jnp.broadcast_to(col, (B, T, S)), axis=2)          # (B, T, S)
        mask = valid & jnp.where(in_tree, tv, causal)

    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    if sp_decode:
        # partial-softmax merge over the sp axis (flash-decoding style):
        # each shard contributes (max, sum, numerator); three tiny
        # collectives reassemble the exact softmax
        m_loc = jnp.max(scores, axis=-1, keepdims=True)        # (B,KVH,M,T,1)
        m_glob = jax.lax.pmax(m_loc, plan.sp)
        p = jnp.exp(scores - m_glob)                           # masked -> 0
        l_glob = jax.lax.psum(jnp.sum(p, axis=-1, keepdims=True), plan.sp)
        num = jnp.einsum("bkmts,bksh->btkmh", p.astype(cdt), vf,
                         preferred_element_type=jnp.float32)
        num = jax.lax.psum(num, plan.sp)
        out = num / l_glob.transpose(0, 3, 1, 2, 4)            # (B,T,KVH,M,1)
        return out.reshape(B, T, H * hd)

    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkmts,bksh->btkmh", att.astype(cdt), vf,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, H * hd)


def _attention_fresh(cfg: ModelConfig, q, k, v, q_pos):
    """Causal attention over freshly-projected K/V (no cache read) — the
    sequence-parallel prefill path: each sp shard attends its local queries
    (absolute positions q_pos) against the all-gathered K/V of the whole
    prompt. k/v absolute positions are 0..T_full-1 (sp prefill requires
    pos0 == 0)."""
    B, T, H, hd = q.shape
    KVH, T_full = k.shape[2], k.shape[1]
    M = H // KVH
    cdt = jnp.bfloat16 if pallas_decode_enabled() else jnp.float32

    qf = q.reshape(B, T, KVH, M, hd).astype(cdt)
    kf = k.transpose(0, 2, 1, 3).astype(cdt)   # (B, KVH, T_full, hd)
    vf = v.transpose(0, 2, 1, 3).astype(cdt)

    scores = jnp.einsum("btkmh,bksh->bkmts", qf, kf,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    causal = jnp.arange(T_full)[None, None, :] <= q_pos[:, :, None]
    scores = jnp.where(causal[:, None, None, :, :], scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkmts,bksh->btkmh", att.astype(cdt), vf,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, H * hd)


def _attention_ring(cfg: ModelConfig, q, k, v, q_pos, sp_axis: str,
                    kv_dtype):
    """Blockwise RING attention for sp prefill (plan.ring): the K/V chunks
    rotate around the sp axis via collective-permute while each shard folds
    one chunk per hop into a running online softmax. Numerically the same
    softmax as :func:`_attention_fresh` with a different association;
    memory stays O(T_local) per shard (the all-gather path transiently
    materializes the full prompt's K/V on every shard). Chunks travel at
    cache precision, like the all-gather. Hop r holds shard (i - r) mod n's
    chunk; the first hop is the LOCAL chunk, whose causal diagonal
    guarantees the running max is finite from the start."""
    B, T, H, hd = q.shape
    KVH = k.shape[2]
    M = H // KVH
    n = jax.lax.axis_size(sp_axis)
    i = jax.lax.axis_index(sp_axis)
    cdt = jnp.bfloat16 if pallas_decode_enabled() else jnp.float32

    qf = q.reshape(B, T, KVH, M, hd).astype(cdt)
    kc = k.astype(kv_dtype)
    vc = v.astype(kv_dtype)
    m = jnp.full((B, KVH, M, T), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, KVH, M, T), jnp.float32)
    acc = jnp.zeros((B, T, KVH, M, hd), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]
    scale = 1.0 / math.sqrt(hd)

    for r in range(n):
        base = (jax.lax.rem(i - r + n, n) * T).astype(jnp.int32)
        kf = kc.transpose(0, 2, 1, 3).astype(cdt)   # (B, KVH, T, hd)
        vf = vc.transpose(0, 2, 1, 3).astype(cdt)
        s = jnp.einsum("btkmh,bksh->bkmts", qf, kf,
                       preferred_element_type=jnp.float32) * scale
        causal = ((base + jnp.arange(T, dtype=jnp.int32))[None, None, :]
                  <= q_pos[:, :, None])              # (B, T_q, T_kv)
        s = jnp.where(causal[:, None, None, :, :], s, -jnp.inf)
        cm = jnp.max(s, axis=-1)                     # (B, KVH, M, T_q)
        m_new = jnp.maximum(m, cm)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new[..., None]), 0.0)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
        l = l * alpha + p.sum(-1)
        hop = jnp.einsum("bkmts,bksh->btkmh", p.astype(cdt), vf,
                         preferred_element_type=jnp.float32)
        acc = acc * alpha.transpose(0, 3, 1, 2)[..., None] + hop
        m = m_new
        if r != n - 1:
            kc = jax.lax.ppermute(kc, sp_axis, perm)
            vc = jax.lax.ppermute(vc, sp_axis, perm)

    out = acc / jnp.maximum(l.transpose(0, 3, 1, 2)[..., None], 1e-37)
    return out.reshape(B, T, H * hd)


def _moe_ffn(cfg: ModelConfig, xb2, lw: LayerWeights, layer,
             plan: ShardingPlan):
    """Top-k routed MoE ffn; returns the (partial) residual contribution.

    Routing mirrors the reference gate (src/infer.c:277-305): softmax over
    expert logits, top-k, weights renormalized over the selected set. Under
    ep the expert axis is sharded: routing is computed replicated, each shard
    evaluates only its resident experts (masked), and the closing psum
    reassembles (reference has no EP — single-GPU gathers all active experts,
    src/infer.cu:597-620).
    """
    gate = qmatmul(xb2, lw.moegate, layer=layer, stage="moegate")  # (B, T, E) replicated
    if cfg.moe_renorm:
        top_vals, top_idx = jax.lax.top_k(gate, cfg.n_experts_ac)
        moe_w = jax.nn.softmax(top_vals, axis=-1)          # (B, T, A)
    else:
        # OLMoE (norm_topk_prob=False): weights are the softmax-over-all
        # probabilities of the selected experts, NOT renormalized
        probs = jax.nn.softmax(gate, axis=-1)
        moe_w, top_idx = jax.lax.top_k(probs, cfg.n_experts_ac)

    e_local = (lw.w1pe.shape[1] if lw.w1 is None
               else lw.w1.data.shape[1])                   # local expert count
    if plan.ep is not None:
        off = jax.lax.axis_index(plan.ep) * e_local
    else:
        off = 0

    # decode fast path: dense unique-expert sweep — each ACTIVE expert's
    # packed bytes stream exactly once per layer regardless of how many
    # rows routed to it (the per-row formulation re-read a shared expert's
    # tile per row: ~4x redundant HBM traffic at B=8 top-2; an XLA gather
    # formulation copies whole expert weights — 3x traffic)
    B, T, D = xb2.shape
    if pallas_decode_enabled():
        from calm_tpu.ops import pallas_qmm
        fused = (lw.w1pe is not None and pallas_qmm.gf4_moe_ffn_supported(
            (B * T, D), lw.w1pe, lw.w2.data))
        if fused or (lw.w1 is not None
                and pallas_qmm.moe_supported(xb2.shape, lw.w1.data, lw.w1.fmt)
                and pallas_qmm.moe_supported(
                    (B * T, lw.w2.data.shape[-1] * (8 if lw.w2.fmt == "gf4" else 1)),
                    lw.w2.data, lw.w2.fmt)):
            R = B * T * cfg.n_experts_ac
            A = min(cfg.n_experts, R)     # expert slots (static)
            flat = top_idx.reshape(R)
            # sorted unique ids, compacted to the front, padded by repeating
            # the LAST unique value (adjacent equal ids keep the same weight
            # block index -> padding costs no extra DMA)
            s = jnp.sort(flat)
            firsts = jnp.concatenate(
                [jnp.ones((1,), bool), s[1:] != s[:-1]])
            order = jnp.argsort(jnp.logical_not(firsts), stable=True)
            su = s[order]                 # uniques first, still sorted
            cnt = jnp.sum(firsts.astype(jnp.int32))
            pad = su[jnp.clip(cnt - 1, 0, R - 1)]
            slot_live = jnp.arange(A) < cnt
            uniq = jnp.where(slot_live, su[:A], pad)   # global expert ids
            # ep: this shard evaluates only its resident experts; non-local
            # slots read the first local slot's tile (one extra re-read at
            # worst) and are masked out of the combine
            lid_raw = uniq - off
            islocal = slot_live & (lid_raw >= 0) & (lid_raw < e_local)
            fill = jnp.clip(lid_raw[jnp.argmax(islocal)], 0, e_local - 1)
            lid = jnp.where(islocal, jnp.clip(lid_raw, 0, e_local - 1),
                            jnp.where(jnp.any(islocal), fill, 0))

            if fused:
                # one-call whole-FFN expert sweep; dead padding slots repeat
                # the LAST live slot's id so their index maps match the
                # previous grid step block-for-block (zero extra DMA)
                pad_id = lid[jnp.clip(cnt - 1, 0, A - 1)]
                lid2 = jnp.where(jnp.arange(A) < cnt, lid, pad_id)
                z = pallas_qmm.gf4_moe_ffn(
                    xb2.reshape(B * T, D).astype(jnp.float32), lw.w1pe,
                    lw.w3pe, lw.w2.data, lid2, jnp.minimum(cnt, A), layer,
                    cfg.act_gelu)                         # (A, BT, D)
            else:
                xf = xb2.reshape(1, B * T, D).astype(jnp.float32)
                y1 = pallas_qmm.qmm_moe_dense(xf, lw.w1.data, lid,
                                              lw.w1.fmt, layer)  # (A, BT, H)
                y3 = pallas_qmm.qmm_moe_dense(xf, lw.w3.data, lid,
                                              lw.w3.fmt, layer)
                h = _act(cfg, y1) * y3                    # (A, BT, H)
                z = pallas_qmm.qmm_moe_dense(h, lw.w2.data, lid, lw.w2.fmt,
                                             layer)       # (A, BT, D)
            # combine: row bt takes slot a with its gate weight iff routed
            # there and the slot is a live local expert (padded/duplicate
            # slots contribute zero — no double counting)
            eq = (top_idx.reshape(B * T, cfg.n_experts_ac)[:, :, None]
                  == uniq[None, None, :])                 # (BT, K, A)
            wmat = jnp.sum(
                moe_w.reshape(B * T, cfg.n_experts_ac)[:, :, None]
                * eq.astype(jnp.float32), axis=1)
            wmat = wmat * islocal[None, :].astype(jnp.float32)  # (BT, A)
            out = jnp.einsum("ba,abd->bd", wmat, z)
            return out.reshape(B, T, D)

    def expert_ffn(lidx, xin):                             # lidx scalar, xin (D,)
        w2 = lw.w2[layer, lidx]
        if lw.w1 is None:
            # plane-major packed slice (8, H/8, D/8): logical row k*g_h + c
            # of the flattened view is natural row 8c+k — matmul in the
            # permuted order, then un-permute the (cheap) activation
            from calm_tpu.ops.qmm import QTensor
            g_h, g_d = lw.w1pe.shape[3], lw.w1pe.shape[4]

            def pmm(ws):
                qt = QTensor(ws[layer, lidx].reshape(8 * g_h, g_d), "gf4")
                yp = qmatmul(xin, qt)                      # plane order
                return yp.reshape(8, g_h).T.reshape(8 * g_h)
            h = _act(cfg, pmm(lw.w1pe)) * pmm(lw.w3pe)
        else:
            w1 = lw.w1[layer, lidx]  # QTensor indexing keeps the fp8e4 scale
            w3 = lw.w3[layer, lidx]
            h = _act(cfg, qmatmul(xin, w1)) * qmatmul(xin, w3)
        return qmatmul(h, w2)                              # (D,) partial over tp

    def per_token(eidxs, wts, xin):                        # (A,), (A,), (D,)
        def one(e, wa):
            lid = e - off
            ok = ((lid >= 0) & (lid < e_local)).astype(jnp.float32)
            out = expert_ffn(jnp.clip(lid, 0, e_local - 1), xin)
            return out * (wa * ok)
        return jax.vmap(one)(eidxs, wts).sum(0)            # (D,)

    return jax.vmap(jax.vmap(per_token))(top_idx, moe_w, xb2)  # (B, T, D)


def _layer(cfg: ModelConfig, x, lw: LayerWeights, layer, kc, vc, pos, kv_pos,
           kv_len, kv_dtype, rolling: bool, rope, plan: ShardingPlan,
           batch_off=None, pt=None, planed: bool = False, qkv_in=None,
           tree=None, qkv_raw=None):
    """One transformer layer on a (B, T, D) activation wave.

    ``planed`` (gf4 offn tier, decode T==1 only): x is the plane-permuted
    residual (B, 8, D/8) ([:, j, c] = x_nat[:, 8c+j]); qkv projects through
    the pre-planed fused wqkv kernel and the whole epilogue (wo + residual
    + ffn-norm + FFN) runs as one pallas call (gf4_offn). The return x is
    permuted too — _run_layers un-permutes after the scan.

    kc/vc: the FULL (L, B, KVH_local, S, hd) caches, updated in place at
    ``layer`` with dynamic-update-slices. Carrying the whole buffer (instead
    of scanning per-layer slices as scan xs/ys) is what lets XLA alias the
    donated cache: a modified xs->ys slice costs a full-plane copy per layer
    (~3 ms/token at 7B), a DUS into a carried buffer writes only the touched
    rows. pos: (B, T) absolute positions; kv_pos: (B, T) cache write rows
    (must be contiguous along T); kv_len: (B,). Local head/hidden dims come
    from the weight shards. Returns (x, kc, vc).
    """
    if planed:
        B, T, D = x.shape[0], 1, 8 * x.shape[2]
    else:
        B, T, D = x.shape
    hd = cfg.head_dim
    # local (per-tp-shard) projection widths from the always-present bias
    # rows — the weights themselves may live only in fused layouts
    q_local = lw.bq.shape[1]   # q_dim / tp
    kv_local = lw.bk.shape[1]  # kv_dim / tp
    H, KVH = q_local // hd, kv_local // hd

    def row(a):  # per-layer slice of a small stacked tensor (XLA fuses it)
        return jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)

    qkv = None
    if planed and qkv_in is not None:
        # rotated fusion boundary: the PREVIOUS layer's offn_qkv call
        # already projected this layer's qkv (gf4_offn_qkv) — consume it
        qkv = qkv_in.reshape(B, 1, q_local + 2 * kv_local)
    elif qkv_raw is not None:
        # byte-format rotated boundary: the previous layer's qx supercall
        # projected this layer's q/k/v (pallas_qmm.qx_offn_qkv)
        qkv = jnp.concatenate(qkv_raw, axis=-1).reshape(
            B, 1, q_local + 2 * kv_local)
    elif planed:
        from calm_tpu.ops import pallas_qmm
        # norm on the permuted flat vector (rms/mean are permutation-
        # invariant; weights pre-permuted to match) feeds the fused qkv
        # kernel in its native plane layout — no per-call transpose
        xb = _norm(cfg, x.reshape(B, D), row(lw.an_pl))
        qkv = pallas_qmm.qmm_decode(
            xb.reshape(B, 8, D // 8), lw.wqkv, "gf4", layer,
            pre_planed=True, stage="wqkv").reshape(B, 1, q_local + 2 * kv_local)
    else:
        xb = _norm(cfg, x, row(lw.attn_norm))
    if qkv is None and pallas_decode_enabled() and lw.wqkv is not None:
        from calm_tpu.ops import pallas_qmm
        if pallas_qmm.supported((B * T, D), lw.wqkv, "gf4"):
            # fused row-concat qkv: one kernel streams all three
            # projections (3 dependent calls -> 1, see fuse_gf4_weights)
            qkv = pallas_qmm.qmm_decode(
                xb.reshape(B * T, D).astype(jnp.float32), lw.wqkv, "gf4",
                layer, stage="wqkv").reshape(B, T, q_local + 2 * kv_local)
    if qkv is None and lw.wq is None:
        # naturals dropped at fusion: the row-concat wqkv IS the weight
        # (qmatmul dispatches Pallas or the fused-XLA dequant dot)
        from calm_tpu.ops.qmm import QTensor
        qkv = qmatmul(xb, QTensor(lw.wqkv, "gf4"), layer=layer,
                      stage="wqkv")
    if qkv is not None:
        q = qkv[..., :q_local] + row(lw.bq)
        k = qkv[..., q_local:q_local + kv_local] + row(lw.bk)
        v = qkv[..., q_local + kv_local:] + row(lw.bv)
    else:
        q = qmatmul(xb, lw.wq, layer=layer, stage="wqkv") + row(lw.bq)
        k = qmatmul(xb, lw.wk, layer=layer, stage="wqkv") + row(lw.bk)
        v = qmatmul(xb, lw.wv, layer=layer, stage="wqkv") + row(lw.bv)
    if cfg.norm_qk:  # OLMoE: RMSNorm the full q/k vectors before clip/RoPE
        q = _qk_norm(cfg, q, row(lw.q_norm), cfg.q_dim, plan.tp)
        k = _qk_norm(cfg, k, row(lw.k_norm), cfg.kv_dim, plan.tp)
    q, k, v = _clip(cfg, q), _clip(cfg, k), _clip(cfg, v)

    if B * T > 1:
        # keep the rope interleave OUT of the projection dots: at B >= 8
        # XLA fuses the (hd/2, 2) de-interleave into the qkv matvecs and
        # materializes a RESHAPED COPY of each weight slice per layer
        # (traced: 33 MB `reshape` per layer, ~2.9 ms/step at B=8 7B fp8)
        q, k = jax.lax.optimization_barrier((q, k))
    cos, sin, cos1, sin1 = rope  # tables precomputed once per step
    q = apply_rope(q.reshape(B, T, H, hd), cos, sin)
    k = apply_rope(k.reshape(B, T, KVH, hd), cos, sin)
    v = v.reshape(B, T, KVH, hd)

    # write the new rows head-major at kv_pos[b, 0]: one in-place DUS per
    # sequence slot (kv_pos is contiguous along T: decode T=1, prefill a
    # pos0..pos0+T run)
    kh = k.transpose(0, 2, 1, 3).astype(kv_dtype)[None]  # (1, B, KVH, T, hd)
    vh = v.transpose(0, 2, 1, 3).astype(kv_dtype)[None]
    boff = jnp.int32(0) if batch_off is None else batch_off
    # Deferred-write decode (pallas path): the fresh rows ride into the
    # attention kernel directly and _run_layers batches ONE cache write per
    # step after the scan — the per-layer DUS stream costs 0.64 ms/step at
    # B=1 and 2.5 at B=8 (measured by no-write ablation).
    sp_decode = plan.sp is not None and T == 1
    defer = T == 1 and pallas_decode_enabled() and not sp_decode
    if pt is not None and not defer:
        # paged write: logical row kv_pos lives in page pt[b, row // PR]
        PR = kc.shape[3]
        for b in range(B):
            lp = kv_pos[b, 0]
            page = pt[b, lp // PR]
            rix = lp % PR
            kc = jax.lax.dynamic_update_slice(
                kc, kh[:, b:b + 1], (layer, page, 0, rix, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, vh[:, b:b + 1], (layer, page, 0, rix, 0))
    elif sp_decode:
        # cache rows are S-sharded over sp: only the shard owning global
        # row kv_pos writes it (others rewrite their own current row)
        S_local = kc.shape[3]
        off = jax.lax.axis_index(plan.sp) * S_local
        for b in range(B):
            wr = kv_pos[b, 0] - off
            own = (wr >= 0) & (wr < S_local)
            wrc = jnp.clip(wr, 0, S_local - T)
            cur_k = jax.lax.dynamic_slice(
                kc, (layer, boff + b, 0, wrc, 0), (1, 1, KVH, T, hd))
            cur_v = jax.lax.dynamic_slice(
                vc, (layer, boff + b, 0, wrc, 0), (1, 1, KVH, T, hd))
            kc = jax.lax.dynamic_update_slice(
                kc, jnp.where(own, kh[:, b:b + 1], cur_k),
                (layer, boff + b, 0, wrc, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, jnp.where(own, vh[:, b:b + 1], cur_v),
                (layer, boff + b, 0, wrc, 0))
    elif not defer:
        # per-slot in-place DUS (kv_pos is contiguous along T). An XLA
        # scatter formulation (cache.at[layer, b_idx, :, rows].set) was
        # measured at 645 ms/step vs this loop's 22.5 at B=8 — TPU scatter
        # materializes; never "batch" these writes through a scatter.
        for b in range(B):
            kc = jax.lax.dynamic_update_slice(
                kc, kh[:, b:b + 1], (layer, boff + b, 0, kv_pos[b, 0], 0))
            vc = jax.lax.dynamic_update_slice(
                vc, vh[:, b:b + 1], (layer, boff + b, 0, kv_pos[b, 0], 0))

    if rolling and pt is not None:
        # paged sink rotation: each slot's sinks live in its OWN page 0
        for b in range(B):
            page0 = pt[b, 0]
            s5 = jax.lax.dynamic_slice(
                kc, (layer, page0, 0, 0, 0), (1, 1, KVH, KV_SINKS, hd))
            sink = s5[0].transpose(0, 2, 1, 3).astype(jnp.float32)
            rotated = apply_rope(sink, cos1[b:b + 1], sin1[b:b + 1])
            wrapped = pos[b, -1] >= cfg.seq_len
            upd = (jnp.where(wrapped, rotated, sink).transpose(0, 2, 1, 3)
                   .astype(kv_dtype)[None])
            kc = jax.lax.dynamic_update_slice(kc, upd,
                                              (layer, page0, 0, 0, 0))
    elif rolling:
        # rotate sink keys forward by one position so their relative RoPE
        # phase tracks the sliding window (reference: src/infer.c:383-394)
        sink5 = jax.lax.dynamic_slice(
            kc, (layer, boff, 0, 0, 0), (1, B, KVH, KV_SINKS, hd))
        sink = sink5[0].transpose(0, 2, 1, 3).astype(jnp.float32)
        rotated = apply_rope(sink, cos1, sin1)
        wrapped = (pos[:, -1] >= cfg.seq_len)[:, None, None, None]
        if plan.sp is not None:
            # sinks (global rows 0..KV_SINKS) live in sp shard 0 only
            wrapped = wrapped & (jax.lax.axis_index(plan.sp) == 0)
        upd = (jnp.where(wrapped, rotated, sink).transpose(0, 2, 1, 3)
               .astype(kv_dtype)[None])
        kc = jax.lax.dynamic_update_slice(kc, upd, (layer, boff, 0, 0, 0))

    if plan.sp is not None and T > 1:
        if plan.ring:
            # blockwise ring attention: chunks rotate via ppermute, peak
            # per-shard memory O(T_local) (see _attention_ring)
            att = _attention_ring(cfg, q, k, v, pos, plan.sp, kv_dtype)
        else:
            # sequence-parallel prefill: all-gather the fresh K/V chunks
            # over sp (cache rows are S-sharded; reading them back would
            # need the same collective anyway) and attend local queries
            # causally. Gather at cache precision: halves the collective
            # bytes and keeps numerics identical to the cache-read path.
            k_all = jax.lax.all_gather(k.astype(kv_dtype), plan.sp, axis=1,
                                       tiled=True)
            v_all = jax.lax.all_gather(v.astype(kv_dtype), plan.sp, axis=1,
                                       tiled=True)
            att = _attention_fresh(cfg, q, k_all, v_all, pos)
    elif T > 1 and not rolling and pallas_decode_enabled() and tree is None:
        # flash prefill: blockwise online softmax against the carried cache
        # (the jnp path materializes (KVH, M, T, S) f32 scores — 2 GB
        # transient per layer at T=S=4096)
        from calm_tpu.ops import pallas_attn
        qg = q.reshape(B, T, KVH, H // KVH, hd).astype(jnp.float32)
        att = pallas_attn.prefill_attention(qg, kc, vc, pos[:, 0], kv_len,
                                            layer)
        att = att.reshape(B, T, H * hd)
    else:
        # tree verify rides the jnp path: T = tree-node count is tiny, and
        # the flash prefill kernel assumes a contiguous causal pos run
        fresh = ((kh[0, :, :, 0, :], vh[0, :, :, 0, :], kv_pos[:, 0])
                 if defer else None)
        att = _attention(cfg, q, kc, vc, layer, pos, kv_len, batch_off,
                         fresh=fresh, plan=plan, pt=pt, tree=tree)

    if qkv_raw is not None:
        # byte-format streaming supercall: wo + residual + ffn-norm + FFN
        # + next layer's attn-norm + q/k/v in ONE pallas call on NATURAL
        # weight layouts (pallas_qmm.qx_offn_qkv) — the whole ~215 MB/layer
        # weight stream rides a single double-buffered pipeline, removing
        # the dependent-op boundary bubbles of the per-matvec XLA path
        from calm_tpu.ops import pallas_qmm
        x_new, qn, kn, vn = pallas_qmm.qx_offn_qkv(
            att.reshape(B, q_local).astype(jnp.float32),
            x.reshape(B, D).astype(jnp.float32),
            lw.ffn_norm, lw.attn_norm,
            lw.wo.data, lw.w1.data, lw.w3.data, lw.w2.data,
            lw.wq.data, lw.wk.data, lw.wv.data,
            layer, lw.wq.fmt, cfg.act_gelu, cfg.norm_eps, cfg.norm_ln)
        fresh_out = ((kh[0, :, :, 0, :], vh[0, :, :, 0, :])
                     if defer else None)
        return x_new.reshape(B, 1, D), kc, vc, fresh_out, (qn, kn, vn)

    if planed:
        from calm_tpu.ops import pallas_qmm
        # one tiny XLA transpose (B*Q floats) planarizes the attention
        # output; the offn kernel then does wo + residual + ffn-norm + FFN
        # without leaving VMEM (kills the wo call boundary traced at
        # 193 GB/s vs the fused FFN's 444 — docs/PERF_NOTES.md)
        a_pl = (att.reshape(B, q_local // 8, 8).transpose(0, 2, 1)
                .astype(jnp.float32))
        fresh_out = ((kh[0, :, :, 0, :], vh[0, :, :, 0, :])
                     if defer else None)
        if qkv_in is not None:
            # rotated boundary: one call does offn AND the next layer's
            # attn-norm + qkv projection (weight DMA hidden under the
            # FFN decode — see pallas_qmm.gf4_offn_qkv)
            L = lw.an_pl.shape[0]
            x, qkv_next = pallas_qmm.gf4_offn_qkv(
                a_pl, x, lw.fn_pl, lw.an_pl.reshape(L, 8, D // 8),
                lw.wo_p, lw.w1p, lw.w3p, lw.w2tp, lw.wqkv, layer,
                cfg.act_gelu, cfg.norm_eps, cfg.norm_ln)
            return x, kc, vc, fresh_out, qkv_next
        ffn, r1 = pallas_qmm.gf4_offn(
            a_pl, x, lw.fn_pl, lw.wo_p, lw.w1p, lw.w3p, lw.w2tp, layer,
            cfg.act_gelu, cfg.norm_eps, cfg.norm_ln)
        x = r1 + ffn.reshape(B, 8, D // 8)
        return x, kc, vc, fresh_out, None

    if lw.wo is not None:
        wo_out = qmatmul(att, lw.wo, layer=layer, stage="wo")
    else:
        # natural wo dropped at fusion (offn tier): consume the plane-
        # major-output layout and un-permute the (small) activation
        from calm_tpu.ops.qmm import qmatmul_wo_p
        wo_out = qmatmul_wo_p(att, lw.wo_p, layer)
    x = x + _close_residual(wo_out, plan)

    # parallel-norm architectures (Cohere) feed the ffn from the attn-normed
    # input instead of re-normalizing (reference: src/infer.c:417-420)
    xb2 = xb if cfg.norm_par else _norm(cfg, x, row(lw.ffn_norm))

    if cfg.n_experts:
        ffn = _moe_ffn(cfg, xb2, lw, layer, plan)
        x = x + _close_residual(ffn, plan, with_ep=True)  # tp + ep close
    else:
        ffn = None
        if pallas_decode_enabled() and lw.w1p is not None:
            from calm_tpu.ops import pallas_qmm
            if pallas_qmm.gf4_ffn_supported(xb2.shape, lw.w1p, lw.w2t):
                ffn = pallas_qmm.gf4_ffn(
                    xb2.reshape(B * T, D).astype(jnp.float32), lw.w1p,
                    lw.w3p, lw.w2t, layer, cfg.act_gelu).reshape(B, T, D)
        if ffn is None and lw.w1 is None:
            # naturals dropped at fusion: matmul in plane-permuted row
            # order (elementwise act glue is order-agnostic), contract the
            # permuted order against the word-transposed w2 directly
            from calm_tpu.ops.qmm import qmatmul_w1p, qmatmul_w2t
            h = (_act(cfg, qmatmul_w1p(xb2, lw.w1p, layer))
                 * qmatmul_w1p(xb2, lw.w3p, layer))
            ffn = qmatmul_w2t(h, lw.w2t if lw.w2t is not None else lw.w2tp,
                              layer, permuted_out=lw.w2t is None)
        elif ffn is None:
            h = (_act(cfg, qmatmul(xb2, lw.w1, layer=layer, stage="ffn"))
                 * qmatmul(xb2, lw.w3, layer=layer, stage="ffn"))
            ffn = qmatmul(h, lw.w2, layer=layer, stage="ffn")
        x = x + _close_residual(ffn, plan)

    # deferred mode: hand the fresh rows (B, KVH, hd) up for the post-scan
    # batched cache write
    return x, kc, vc, ((kh[0, :, :, 0, :], vh[0, :, :, 0, :])
                       if defer else None), None


import os as _os_mod

# Rotated gf4 fusion boundary (pallas_qmm.gf4_offn_qkv): each layer's
# supercall projects the NEXT layer's qkv as extra grid steps, so the
# per-layer wqkv call (and its ~13-16 us boundary stall) disappears.
# Read ONCE at import: toggling the env after the first compile would be
# silently ignored by jit caching.
ROTATED_DECODE = _os_mod.environ.get("CALM_ROT", "1") == "1"

LAYER_UNROLL = 1  # lax.scan unroll factor over layers. MEASURED on v5e:
                  # unroll=1 streams layer weights at ~708 GB/s; unroll=8
                  # collapses to ~222 GB/s (the unrolled body defeats XLA's
                  # per-iteration weight-slice streaming). Keep at 1.


def _rope_tables(cfg: ModelConfig, pos, batch: int):
    """Per-step rope tables shared by every layer (pos-only dependence)."""
    cos, sin = rope_tables(pos, cfg.head_dim, cfg.rope_theta, cfg.rotary_dim)
    cos1, sin1 = rope_tables(jnp.ones((batch, KV_SINKS), jnp.int32),
                             cfg.head_dim, cfg.rope_theta, cfg.rotary_dim)
    return (cos, sin, cos1, sin1)


def _run_layers(cfg: ModelConfig, w: Weights, x, pos, kv_pos, kv_len,
                cache: KVCache, rolling: bool, rope,
                plan: ShardingPlan,
                batch_off=None, pt=None,
                tree=None) -> tuple[jax.Array, KVCache]:
    """The layer-stack scan on an embedded activation wave; the cache's
    leading axis defines how many (local) layers run — under pipeline
    parallelism each stage holds and runs only its layer shard."""
    kv_dtype = cache.k.dtype
    n_layers = cache.k.shape[0]
    lw = w.layers

    B, T, D = x.shape
    planed = False
    if (T == 1 and lw.wo_p is not None and pallas_decode_enabled()
            and plan.tp is None and plan.sp is None and plan.ep is None):
        from calm_tpu.ops import pallas_qmm
        q_local = lw.bq.shape[1]
        planed = (pallas_qmm.supported((B, D), lw.wqkv, "gf4")
                  and pallas_qmm.gf4_offn_supported(
                      (B, 8, q_local // 8), (B, 8, D // 8),
                      lw.wo_p, lw.w1p, lw.w2tp))
    qkv0 = None
    if planed:
        # carry the residual plane-permuted across the whole layer scan
        # (one 16 KB transpose in, one out — per step, not per layer)
        x = x.reshape(B, D // 8, 8).transpose(0, 2, 1)
        # rotated fusion boundary (flat-grid offn_qkv supercall): ON by
        # default; CALM_ROT=0 falls back to the separate offn + wqkv pair.
        # Read once at import (ROTATED_DECODE) — a trace-time env read is
        # silently ignored after the first compile (jit caching).
        if (ROTATED_DECODE and lw.an_pl is not None
                and n_layers == lw.wqkv.shape[0]):
            # rotated fusion boundary: prime the carry with layer 0's
            # qkv; every later layer's arrives from its predecessor's
            # offn_qkv call (pallas_qmm.gf4_offn_qkv)
            from calm_tpu.ops import pallas_qmm
            xb0 = _norm(cfg, x.reshape(B, D),
                        jax.lax.dynamic_index_in_dim(lw.an_pl, 0, 0,
                                                     keepdims=False))
            qkv0 = pallas_qmm.qmm_decode(
                xb0.reshape(B, 8, D // 8), lw.wqkv, "gf4", jnp.int32(0),
                pre_planed=True, stage="wqkv")

    qx0 = None
    if (not planed and T == 1 and tree is None and pt is None
            and ROTATED_DECODE and pallas_decode_enabled()
            and plan.tp is None and plan.sp is None and plan.ep is None
            and not cfg.norm_par and not cfg.n_experts
            and lw.wq is not None and lw.w1 is not None
            and lw.wo is not None and lw.w2 is not None
            and lw.wq.fmt in ("fp8", "fp16") and lw.wq.data.ndim == 3
            and n_layers == lw.wq.data.shape[0]):
        from calm_tpu.ops import pallas_qmm
        from calm_tpu.ops import qmm as _qmm_mod
        q_local = lw.bq.shape[1]
        kv_local = lw.bk.shape[1]
        # --precise runs f32-grade dots; the supercall is bf16-operand
        if not _qmm_mod._PRECISE and pallas_qmm.qx_offn_supported(
                lw.wq.fmt, B, (D, lw.w1.data.shape[1], q_local, kv_local)):
            # prime the carry with layer 0's q/k/v; every later layer's
            # arrives from its predecessor's qx supercall
            an0 = jax.lax.dynamic_index_in_dim(lw.attn_norm, 0, 0,
                                               keepdims=False)
            xb0 = _norm(cfg, x[:, 0, :], an0)
            qx0 = (qmatmul(xb0, lw.wq, layer=jnp.int32(0), stage="wqkv"),
                   qmatmul(xb0, lw.wk, layer=jnp.int32(0), stage="wqkv"),
                   qmatmul(xb0, lw.wv, layer=jnp.int32(0), stage="wqkv"))

    def body(carry, layer):
        if qkv0 is not None:
            x, qkv_c, kc, vc = carry
            x, kc, vc, fresh, qkv_n = _layer(
                cfg, x, w.layers, layer, kc, vc, pos, kv_pos, kv_len,
                kv_dtype, rolling, rope, plan, batch_off, pt,
                planed=planed, qkv_in=qkv_c)
            return (x, qkv_n, kc, vc), fresh
        if qx0 is not None:
            x, qkv_c, kc, vc = carry
            x, kc, vc, fresh, qkv_n = _layer(
                cfg, x, w.layers, layer, kc, vc, pos, kv_pos, kv_len,
                kv_dtype, rolling, rope, plan, batch_off, pt,
                qkv_raw=qkv_c)
            return (x, qkv_n, kc, vc), fresh
        x, kc, vc = carry
        x, kc, vc, fresh, _ = _layer(cfg, x, w.layers, layer, kc, vc, pos,
                                     kv_pos, kv_len, kv_dtype, rolling,
                                     rope, plan, batch_off, pt,
                                     planed=planed, tree=tree)
        return (x, kc, vc), fresh

    unroll = min(LAYER_UNROLL, n_layers)
    if n_layers % unroll:
        unroll = 1
    if qkv0 is not None:
        (x, _, k_new, v_new), fresh = jax.lax.scan(
            body, (x, qkv0, cache.k, cache.v),
            jnp.arange(n_layers, dtype=jnp.int32), unroll=unroll)
    elif qx0 is not None:
        (x, _, k_new, v_new), fresh = jax.lax.scan(
            body, (x, qx0, cache.k, cache.v),
            jnp.arange(n_layers, dtype=jnp.int32), unroll=unroll)
    else:
        (x, k_new, v_new), fresh = jax.lax.scan(
            body, (x, cache.k, cache.v),
            jnp.arange(n_layers, dtype=jnp.int32), unroll=unroll)
    if planed:
        x = x.transpose(0, 2, 1).reshape(B, T, D)

    if fresh is not None:
        # deferred decode writes: ONE (all-layer) DUS per slot per step
        # instead of one per slot per layer (0.64 ms/step at B=1, 2.5 at
        # B=8 reclaimed — measured)
        fk, fv = fresh  # (L_local, B, KVH, hd) stacked by the scan
        boff = jnp.int32(0) if batch_off is None else batch_off
        B = x.shape[0]
        PR = cache.k.shape[3]
        for b in range(B):
            rows_k = fk[:, b:b + 1, :, None, :]  # (L, 1, KVH, 1, hd)
            rows_v = fv[:, b:b + 1, :, None, :]
            if pt is not None:
                lp = kv_pos[b, 0]
                loc = (0, pt[b, lp // PR], 0, lp % PR, 0)
            else:
                loc = (0, boff + b, 0, kv_pos[b, 0], 0)
            k_new = jax.lax.dynamic_update_slice(k_new, rows_k, loc)
            v_new = jax.lax.dynamic_update_slice(v_new, rows_v, loc)

    return x, KVCache(k_new, v_new)


def _head(cfg: ModelConfig, w: Weights, x, logits_mode: str):
    if logits_mode == "none":
        return None
    if logits_mode == "last":
        x = x[:, -1:, :]
    x = _norm(cfg, x, w.final_norm)
    logits = qmatmul(x, w.output, stage="head")  # (B, T or 1, V_local)
    if logits_mode == "last":
        logits = logits[:, 0, :]
    return logits


def _forward(cfg: ModelConfig, w: Weights, tokens, pos, kv_pos, kv_len,
             cache: KVCache, rolling: bool, logits_mode: str,
             plan: ShardingPlan = NO_SHARDING, pt=None, tree=None):
    """Shared forward: tokens/pos/kv_pos (B, T), kv_len (B,)."""
    x = _embed(cfg, w.embed, tokens, plan)  # (B, T, D)
    rope = _rope_tables(cfg, pos, tokens.shape[0])
    x, cache = _run_layers(cfg, w, x, pos, kv_pos, kv_len, cache,
                           rolling, rope, plan, pt=pt, tree=tree)
    return _head(cfg, w, x, logits_mode), cache


def decode_indices(cfg: ModelConfig, pos):
    """Attention-sink + rolling-window indices from the traced pos, exactly
    as the reference computes per step (src/infer.c:329-332):
      kv_sink = pos >= S ? KV_SINKS : 0
      kv_pos  = kv_sink + (pos - kv_sink) % (S - kv_sink)
      kv_len  = min(pos + 1, S)
    """
    S = cfg.seq_len
    kv_sink = jnp.where(pos >= S, KV_SINKS, 0)
    kv_pos = kv_sink + (pos - kv_sink) % (S - kv_sink)
    kv_len = jnp.minimum(pos + 1, S)
    return kv_pos, kv_len


def decode_step_fn(cfg: ModelConfig, w: Weights, token, pos, cache: KVCache,
                   plan: ShardingPlan = NO_SHARDING, rolling: bool = True):
    """One token for each sequence slot: token (B,), pos (B,) -> logits (B, V).

    ``rolling=False`` (static) compiles out the per-layer sink-rotation ops
    — callers that KNOW the whole chunk stays below seq_len (host sees pos)
    pick the cheaper program, like the reference's host-side wrap branch
    (src/infer.cu:677). With pos < seq_len the two variants are
    numerically identical (the rotation is a no-op write there)."""
    kv_pos, kv_len = decode_indices(cfg, pos)
    return _forward(cfg, w, token[:, None], pos[:, None], kv_pos[:, None],
                    kv_len, cache, rolling=rolling, logits_mode="last",
                    plan=plan)


def prefill_fn(cfg: ModelConfig, w: Weights, tokens, pos0, cache: KVCache,
               logits_mode: str = "last", plan: ShardingPlan = NO_SHARDING):
    """Batched prompt processing: tokens (B, T) starting at pos0 (B,).

    Requires pos0 + T <= seq_len (no rolling during prefill). Returns logits
    per logits_mode ("last" (B,V) | "all" (B,T,V) | "none") and the cache.
    """
    B, T = tokens.shape
    pos = pos0[:, None] + jnp.arange(T)[None, :]
    kv_len = pos0 + T
    return _forward(cfg, w, tokens, pos, pos, kv_len, cache,
                    rolling=False, logits_mode=logits_mode, plan=plan)


def tree_verify_fn(cfg: ModelConfig, w: Weights, tokens, pos0, depth, tree,
                   cache: KVCache, plan: ShardingPlan = NO_SHARDING):
    """Verify a static-shape speculation TREE in one forward (draft-tree
    decoding — beyond the reference, which has no speculation at all).

    tokens (1, N): the tree's nodes in flat order (node 0 = the current
    token / root); depth (N,) int32: each node's depth below the root
    (root = 0) — RoPE positions are pos0 + depth, so sibling lanes share
    positions; tree (N, N) bool: ancestor-or-self reachability — the
    attention mask that keeps lanes from seeing each other (consumed by
    _attention). KV rows land FLAT at pos0 + [0, N): the caller relocates
    the accepted path onto contiguous rows afterwards (cache_move_rows).

    Requires pos0 + N <= seq_len (no rolling mid-tree; callers fall back
    to plain stepping near the window edge, like speculative_generate).
    Returns (logits (1, N, V), cache): logits[0, j] is the target's
    next-token verdict after consuming node j along its ancestor path.
    """
    B, N = tokens.shape
    pos = pos0[:, None] + depth[None, :]
    kv_pos = pos0[:, None] + jnp.arange(N, dtype=jnp.int32)[None, :]
    kv_len = pos0 + N
    return _forward(cfg, w, tokens, pos, kv_pos, kv_len, cache,
                    rolling=False, logits_mode="all", plan=plan, tree=tree)


def cache_move_rows_fn(cache: KVCache, src0, dst0, n: int) -> KVCache:
    """Relocate ``n`` cache rows from [src0, src0+n) to [dst0, dst0+n) in
    every layer/slot (static n, traced offsets): the tree-verify accepted
    path lands on contiguous rows. Functional slice-then-update, so
    overlapping ranges are safe."""
    def move(buf):
        rows = jax.lax.dynamic_slice_in_dim(buf, src0, n, axis=3)
        return jax.lax.dynamic_update_slice_in_dim(buf, rows, dst0, axis=3)
    return KVCache(move(cache.k), move(cache.v))


def cache_bcast_rows_fn(cache: KVCache, lane, row0, n: int) -> KVCache:
    """Broadcast one batch lane's cache rows [row0, row0+n) to EVERY lane
    (static n): after a tree round the winning draft lane's chain becomes
    the shared history for the next round's batched draft scan."""
    def bcast(buf):
        rows = jax.lax.dynamic_slice(
            buf, (0, lane, 0, row0, 0),
            (buf.shape[0], 1, buf.shape[2], n, buf.shape[4]))
        rows = jnp.broadcast_to(rows, (buf.shape[0], buf.shape[1],
                                       buf.shape[2], n, buf.shape[4]))
        return jax.lax.dynamic_update_slice(buf, rows, (0, 0, 0, row0, 0))
    return KVCache(bcast(cache.k), bcast(cache.v))


def decode_scan_sampled_fn(cfg: ModelConfig, w: Weights, token, pos0,
                           cache: KVCache, n_steps: int, key,
                           temperature, minp,
                           plan: ShardingPlan = NO_SHARDING,
                           rolling: bool = True):
    """Sampled decode of n_steps tokens entirely on device: min-p sampling
    (calm_tpu.sampler.device_sample) runs inside the scan, so the host sees
    only the final (B, N) token ids — no per-token logits transfer. key is a
    jax PRNG key; temperature/minp are per-slot (B,) arrays."""
    from calm_tpu.sampler import device_sample

    def body(carry, _):
        tok, pos, cache, key = carry
        logits, cache = decode_step_fn(cfg, w, tok, pos, cache, plan,
                                       rolling)
        key, sub = jax.random.split(key)
        nxt = device_sample(logits, sub, temperature, minp)
        return (nxt, pos + 1, cache, key), (nxt, logits)

    (_, _, cache, _), (toks, logits) = jax.lax.scan(
        body, (token, pos0, cache, key), None, length=n_steps)
    return toks.T, cache, logits  # logits: (N, B, V) per-step distributions


decode_scan_sampled = jax.jit(
    decode_scan_sampled_fn,
    static_argnames=("cfg", "n_steps", "plan", "rolling"),
    donate_argnames=("cache",))


def prefill_sp_fn(cfg: ModelConfig, w: Weights, tokens, cache: KVCache,
                  plan: ShardingPlan):
    """Sequence-parallel full-window prefill (runs under shard_map).

    tokens: the LOCAL (B, T_local) chunk of a prompt sharded over plan.sp in
    mesh-axis order; cache: the local S-shard (S_local == T_local). Each
    shard projects QKV for its chunk at its absolute positions, K/V are
    all-gathered for the causal attention (see _attention_fresh), and the
    chunk's rows land in the local cache shard. Requires pos0 == 0 and
    T_total == seq_len — the long-context ingestion case (the reference has
    no sequence parallelism at all, SURVEY.md §2.3). Returns per-shard
    logits (B, T_local, V_local) and the cache shard.
    """
    B, T_local = tokens.shape
    i = jax.lax.axis_index(plan.sp)
    pos = (i * T_local
           + jnp.broadcast_to(jnp.arange(T_local, dtype=jnp.int32)[None, :],
                              (B, T_local)))
    kv_pos = jnp.broadcast_to(jnp.arange(T_local, dtype=jnp.int32)[None, :],
                              (B, T_local))  # rows within the local S shard
    kv_len = jnp.full((B,), T_local, jnp.int32)
    return _forward(cfg, w, tokens, pos, kv_pos, kv_len, cache,
                    rolling=False, logits_mode="all", plan=plan)


def greedy_next(logits, plan: ShardingPlan = NO_SHARDING):
    """Global argmax over (possibly vocab-sharded) logits (B, V_local).

    Under tp each shard holds a vocab slice: the winner is resolved with a
    pmax on the max value and a pmin on the matching global index (first-
    occurrence tie-break, same as jnp.argmax)."""
    if plan.tp is None:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    v_local = logits.shape[-1]
    loc_idx = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    loc_val = jnp.max(logits, axis=-1)
    g_val = jax.lax.pmax(loc_val, plan.tp)
    off = jax.lax.axis_index(plan.tp) * v_local
    cand = jnp.where(loc_val == g_val, off + loc_idx, jnp.int32(2 ** 30))
    return jax.lax.pmin(cand, plan.tp).astype(jnp.int32)


def decode_scan_fn(cfg: ModelConfig, w: Weights, token, pos0, cache: KVCache,
                   n_steps: int, plan: ShardingPlan = NO_SHARDING,
                   rolling: bool = True):
    """Greedy-decode n_steps tokens entirely on device.

    One compiled program produces N tokens — the TPU counterpart of the
    reference's one-cooperative-launch-per-token design taken further: zero
    host round-trips inside the loop. Runs sharded too (the greedy argmax
    resolves across vocab shards). Returns (tokens (B, N), cache,
    per-step logits (N, B, V) so the determinism fingerprint
    (src/run.c:242-253) can be taken at the exact stop position even when a
    stop token lands mid-chunk).
    """
    def body(carry, _):
        tok, pos, cache = carry
        logits, cache = decode_step_fn(cfg, w, tok, pos, cache, plan,
                                       rolling)
        nxt = greedy_next(logits, plan)
        return (nxt, pos + 1, cache), (nxt, logits)

    (_, _, cache), (toks, logits) = jax.lax.scan(
        body, (token, pos0, cache), None, length=n_steps)
    return toks.T, cache, logits


def prefill_slot_fn(cfg: ModelConfig, w: Weights, tokens, n_valid, slot,
                    cache: KVCache, plan: ShardingPlan = NO_SHARDING,
                    pos0=None):
    """Prefill ONE batch slot of a shared multi-slot cache (continuous
    batching admission). tokens (1, T) may be right-padded; n_valid (scalar)
    marks the real length. Returns logits after token n_valid-1 (shape (V,))
    and the updated cache.

    ``pos0`` (traced scalar, default 0) starts the chunk at an offset: the
    slot's cache rows [0, pos0) must already hold valid KV (prefix-cache
    admission copies them in) and the chunk attends to them through the
    carried cache. Padded positions write garbage KV rows beyond
    pos0+n_valid — harmless: the kv_len mask hides every row until decode
    reaches and overwrites it.

    ``slot`` is the GLOBAL slot index. Under dp the cache is batch-sharded:
    every dp shard runs the same SPMD program on its clamped local slot and
    only the owning shard's write survives (the others re-write their own
    slot's current rows); the returned logits reassemble from the owner
    with a psum.
    """
    if plan.dp is not None:
        b_local = cache.k.shape[1]
        local = slot - jax.lax.axis_index(plan.dp) * b_local
        own = (local >= 0) & (local < b_local)
        slot = jnp.clip(local, 0, b_local - 1)
    else:
        own = None
    ks = jax.lax.dynamic_slice_in_dim(cache.k, slot, 1, axis=1)
    vs = jax.lax.dynamic_slice_in_dim(cache.v, slot, 1, axis=1)
    T = tokens.shape[1]
    p0 = jnp.int32(0) if pos0 is None else jnp.asarray(pos0, jnp.int32)
    pos = p0 + jnp.arange(T)[None, :]
    logits, sub = _forward(cfg, w, tokens, pos, pos,
                           (p0 + n_valid)[None], KVCache(ks, vs),
                           rolling=False, logits_mode="all", plan=plan)
    last = jax.lax.dynamic_slice_in_dim(logits[0], n_valid - 1, 1, axis=0)[0]
    new_k, new_v = sub.k, sub.v
    if own is not None:
        new_k = jnp.where(own, new_k, ks)
        new_v = jnp.where(own, new_v, vs)
        last = jax.lax.psum(jnp.where(own, last, jnp.zeros_like(last)),
                            plan.dp)
    k = jax.lax.dynamic_update_slice_in_dim(cache.k, new_k, slot, axis=1)
    v = jax.lax.dynamic_update_slice_in_dim(cache.v, new_v, slot, axis=1)
    return last, KVCache(k, v)


decode_step = jax.jit(decode_step_fn,
                      static_argnames=("cfg", "plan", "rolling"),
                      donate_argnames=("cache",))
prefill_slot = jax.jit(prefill_slot_fn, static_argnames=("cfg", "plan"),
                       donate_argnames=("cache",))
prefill = jax.jit(prefill_fn, static_argnames=("cfg", "logits_mode", "plan"),
                  donate_argnames=("cache",))
decode_scan = jax.jit(decode_scan_fn,
                      static_argnames=("cfg", "n_steps", "plan", "rolling"),
                      donate_argnames=("cache",))
tree_verify = jax.jit(tree_verify_fn, static_argnames=("cfg", "plan"),
                      donate_argnames=("cache",))
cache_move_rows = jax.jit(cache_move_rows_fn, static_argnames=("n",),
                          donate_argnames=("cache",))
cache_bcast_rows = jax.jit(cache_bcast_rows_fn, static_argnames=("n",),
                           donate_argnames=("cache",))


def logits_hash(logits: np.ndarray) -> int:
    """Fold f32 logits into the reference's 32-bit fingerprint
    (src/run.c:242-253): h = h*5 + bits(logit_k), printed as #%08x."""
    bits = np.asarray(logits, dtype=np.float32).reshape(-1).view(np.uint32)
    # vectorized horner: h = sum(bits[k] * 5^(n-1-k)) mod 2^32
    n = bits.size
    powers = np.empty(n, dtype=np.uint64)
    p = 1
    for i in range(n - 1, -1, -1):
        powers[i] = p
        p = (p * 5) & 0xFFFFFFFF
    return int((bits.astype(np.uint64) * powers).sum() & 0xFFFFFFFF)
