"""Partition specs and shard_map wrappers for the model.

The layer code in calm_tpu/model.py is written against *local* shapes with
explicit psums; these helpers supply the matching PartitionSpecs and build
jitted shard_map'd decode/prefill functions over a named mesh.

Layout (see calm_tpu/parallel/plan.py):
  wq/wk/wv, w1/w3: column-sharded over tp (output axis)
  wo, w2:          row-sharded over tp (contraction axis, psum closes)
  experts:         sharded over ep
  embed/output:    vocab-sharded over tp
  KV cache:        sharded over kv-heads (attention is collective-free)
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from calm_tpu.config import ModelConfig
from calm_tpu.model import (KVCache, LayerWeights, Weights, decode_step_fn,
                            prefill_fn, prefill_slot_fn, prefill_sp_fn)
from calm_tpu.ops.qmm import QTensor
from calm_tpu.parallel.plan import ShardingPlan

try:  # jax >= 0.6 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def weight_pspecs(cfg: ModelConfig, plan: ShardingPlan,
                  fused: bool = False) -> Weights:
    """A Weights-shaped pytree whose leaves are PartitionSpecs. Every
    LayerWeights leaf is layer-stacked on dim 0, which shards over pp
    (pipeline stages); embed/final_norm/output stay replicated across pp.

    ``fused=True``: specs for a fuse_weights_sharded pytree — the gf4
    plane-major layouts replace the naturals. Their tp axes follow the
    per-shard construction: wqkv rows and w1p/w3p plane-columns shard over
    tp (each shard's fused block is the permutation of ITS natural shard —
    the global row order differs from an unsharded fuse, which is fine:
    tp only needs w1-rows and w2-columns partitioned identically, and both
    derive from the same local shard)."""
    tp, ep, pp = plan.tp, plan.ep, plan.pp
    fmt = cfg.dtype

    def qt(spec, sspec):
        # fp8e4 per-tensor scales: (stack dims..., 1), replicated across tp
        # (a scalar per tensor shards with nothing but the stack axes)
        return QTensor(spec, fmt, sspec if fmt == "fp8e4" else None)

    gf4_fused = (fused and fmt == "gf4" and cfg.hidden_dim % 8 == 0)
    if cfg.n_experts:
        w13 = qt(P(pp, ep, tp, None), P(pp, ep, None))
        w2 = qt(P(pp, ep, None, tp), P(pp, ep, None))
        moegate = qt(P(pp, None, None), P(pp, None))  # replicated: routing is tiny
    else:
        w13 = qt(P(pp, tp, None), P(pp, None))
        w2 = qt(P(pp, None, tp), P(pp, None))
        moegate = None

    fused_fields = {}
    if gf4_fused:
        fused_fields["wqkv"] = P(pp, tp, None)
        if cfg.n_experts:
            # (L, E, 8, He/8, gd): experts over ep, plane-columns over tp
            fused_fields.update(w1pe=P(pp, ep, None, tp, None),
                                w3pe=P(pp, ep, None, tp, None),
                                w1=None, w3=None)
        else:
            # (L, 8, H/8, gd) / (L, H/8, D): plane-columns over tp
            fused_fields.update(w1p=P(pp, None, tp, None),
                                w3p=P(pp, None, tp, None),
                                w2t=P(pp, tp, None),
                                w1=None, w2=None, w3=None)
        fused_fields.update(wq=None, wk=None, wv=None)
    # non-gf4 (or H % 8 != 0) fused=True: fuse_gf4_weights is a no-op, the
    # natural specs stand

    layers = LayerWeights(
        attn_norm=P(pp, None), ffn_norm=P(pp, None),
        wq=qt(P(pp, tp, None), P(pp, None)), wk=qt(P(pp, tp, None), P(pp, None)),
        wv=qt(P(pp, tp, None), P(pp, None)), wo=qt(P(pp, None, tp), P(pp, None)),
        bq=P(pp, tp), bk=P(pp, tp), bv=P(pp, tp),
        w1=w13, w2=w2, w3=w13, moegate=moegate,
        q_norm=P(pp, tp) if cfg.norm_qk else None,
        k_norm=P(pp, tp) if cfg.norm_qk else None)
    if fused_fields:
        import dataclasses
        layers = dataclasses.replace(layers, **fused_fields)

    return Weights(embed=qt(P(tp, None), P(None)), layers=layers,
                   final_norm=P(None), output=qt(P(tp, None), P(None)))


def cache_pspecs(plan: ShardingPlan, sp: bool = False) -> KVCache:
    # (L, B, KVH, S, hd): layers shard over pp, kv-heads over tp, sequence
    # slots over dp, and (for sequence-parallel prefill) cache rows over sp
    spec = P(plan.pp, plan.dp, plan.tp, plan.sp if sp else None, None)
    return KVCache(k=spec, v=spec)


def _tree_shardings(mesh: Mesh, spec_tree):
    leaves, treedef = jax.tree_util.tree_flatten(
        spec_tree, is_leaf=lambda x: isinstance(x, P))
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, s) for s in leaves])


def shard_weights(w: Weights, cfg: ModelConfig, mesh: Mesh,
                  plan: ShardingPlan) -> Weights:
    """Place a host-loaded Weights pytree onto the mesh per the plan."""
    plan.validate(cfg, mesh.shape.get(plan.tp, 1) if plan.tp else 1,
                  mesh.shape.get(plan.ep, 1) if plan.ep else 1)
    plan.validate_pp(cfg, mesh.shape.get(plan.pp, 1) if plan.pp else 1)
    shardings = _tree_shardings(mesh, weight_pspecs(cfg, plan))
    return jax.device_put(w, shardings)


def load_weights_sharded(tf, cfg: ModelConfig, mesh: Mesh,
                         plan: ShardingPlan) -> Weights:
    """Shard-aware weight loading: each host materializes ONLY its devices'
    shards of every tensor before placement.

    Built on jax.make_array_from_callback over model.weight_descs: the
    callback receives a shard's index tuple and slices it straight out of
    the container's memmap, faulting in only that shard's file pages — a
    34B+ model on a multi-host mesh never materializes host-replicated
    (shard_weights device_puts the full pytree from every host, which blows
    host RAM at scale; keep it for tests/small models). The reference has
    no multi-device story at all (SURVEY.md §2.3)."""
    from calm_tpu.model import WeightDesc, weight_descs

    plan.validate(cfg, mesh.shape.get(plan.tp, 1) if plan.tp else 1,
                  mesh.shape.get(plan.ep, 1) if plan.ep else 1)
    plan.validate_pp(cfg, mesh.shape.get(plan.pp, 1) if plan.pp else 1)
    descs = weight_descs(tf, cfg)
    specs = weight_pspecs(cfg, plan)
    made: dict[tuple, jax.Array] = {}  # tied embed/output: one device copy

    def make(d, spec):
        key = (id(d), spec)
        if key not in made:
            sh = NamedSharding(mesh, spec)
            cache: dict[tuple, object] = {}  # replicated axes: slice once

            def cb(index, d=d, cache=cache):
                k = tuple((s.start, s.stop, s.step) for s in index)
                if k not in cache:
                    cache[k] = d.fetch(index)
                return cache[k]

            made[key] = jax.make_array_from_callback(d.shape, sh, cb)
        return made[key]

    return jax.tree.map(
        make, descs, specs,
        is_leaf=lambda x: isinstance(x, WeightDesc))


def shard_cache(cache: KVCache, mesh: Mesh, plan: ShardingPlan) -> KVCache:
    return jax.device_put(cache, _tree_shardings(mesh, cache_pspecs(plan)))


def fuse_weights_sharded(w: Weights, cfg: ModelConfig, mesh: Mesh,
                         plan: ShardingPlan) -> tuple[Weights, bool]:
    """Per-shard gf4 layout fusion on an ALREADY-SHARDED pytree: run
    model.fuse_gf4_weights inside shard_map so each tp/ep shard permutes
    ITS OWN natural block into the fused decode layouts (zero-copy, same
    as single-device — the naturals are dropped). Correct because tp only
    requires w1-rows and w2-columns to be partitioned identically, and
    both fused blocks derive from the same local shard.

    The offn epilogue tier is disabled (epilogue=False): it folds the
    residual close into the kernel, which is wrong under tp (the wo
    partial needs its psum first) — sharded decode keeps natural wo and
    uses the fused qkv + fused FFN kernels per shard.

    Returns (weights, fused): fused=False (input unchanged) when the
    format or the PER-SHARD hidden width doesn't allow plane layouts.
    Pass ``fused`` to the step builders so their specs match."""
    from calm_tpu import model as M

    ntp = mesh.shape.get(plan.tp, 1) if plan.tp else 1
    if (cfg.dtype != "gf4" or cfg.hidden_dim % (8 * ntp)
            or w.layers.wqkv is not None):
        return w, False

    in_specs = weight_pspecs(cfg, plan)
    out_specs = weight_pspecs(cfg, plan, fused=True)
    fn = shard_map(
        lambda wl: M.fuse_gf4_weights(wl, cfg, epilogue=False),
        mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))(w), True


def sharded_decode_step(cfg: ModelConfig, mesh: Mesh, plan: ShardingPlan,
                        fused: bool = False):
    """Build the jitted multi-chip decode step: (w, token, pos, cache) ->
    (logits (B, V), cache). Under dp, token/pos/cache/logits are
    batch-sharded (the layer is batch-local: dp adds zero collectives)."""
    wspecs = weight_pspecs(cfg, plan, fused=fused)
    if plan.sp is not None:
        # sequence-parallel decode: cache rows stay S-sharded (as the sp
        # prefill leaves them); attention merges partial softmax over sp
        assert plan.sp != plan.dp, "sp decode needs its own mesh axis"
        cspecs = cache_pspecs(plan, sp=True)
    else:
        cspecs = cache_pspecs(plan)
    batch = P(plan.dp)

    fn = shard_map(partial(decode_step_fn, cfg, plan=plan), mesh=mesh,
                   in_specs=(wspecs, batch, batch, cspecs),
                   out_specs=(P(plan.dp, plan.tp), cspecs),
                   check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))


def sharded_tree_verify(cfg: ModelConfig, mesh: Mesh, plan: ShardingPlan,
                        fused: bool = False):
    """Build the jitted multi-chip tree-verify forward: (w, tokens (1, N),
    pos0 (1,), depth (N,), tree (N, N) bool, cache) -> (logits (1, N, V),
    cache). The speculation tree's node lanes ride the T axis; tp shards
    the heads exactly as in decode, the mask is replicated."""
    from calm_tpu.model import tree_verify_fn
    wspecs = weight_pspecs(cfg, plan, fused=fused)
    cspecs = cache_pspecs(plan)

    fn = shard_map(partial(tree_verify_fn, cfg, plan=plan), mesh=mesh,
                   in_specs=(wspecs, P(None, None), P(None), P(None),
                             P(None, None), cspecs),
                   out_specs=(P(None, None, plan.tp), cspecs),
                   check_vma=False)
    return jax.jit(fn, donate_argnums=(5,))


def sharded_decode_scan(cfg: ModelConfig, mesh: Mesh, plan: ShardingPlan,
                        n_steps: int, fused: bool = False):
    """Build the jitted multi-chip greedy decode scan: (w, token, pos0,
    cache) -> (tokens (B, n_steps), cache, last logits). One device program
    produces n_steps tokens on the whole mesh — no host round trips between
    tokens (the sharded counterpart of model.decode_scan)."""
    from calm_tpu.model import decode_scan_fn
    wspecs = weight_pspecs(cfg, plan, fused=fused)
    if plan.sp is not None:
        assert plan.sp != plan.dp, "sp decode needs its own mesh axis"
        cspecs = cache_pspecs(plan, sp=True)
    else:
        cspecs = cache_pspecs(plan)
    batch = P(plan.dp)

    fn = shard_map(partial(decode_scan_fn, cfg, n_steps=n_steps, plan=plan),
                   mesh=mesh,
                   in_specs=(wspecs, batch, batch, cspecs),
                   out_specs=(P(plan.dp, None), cspecs,
                              P(None, plan.dp, plan.tp)),
                   check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))


def sharded_prefill_slot(cfg: ModelConfig, mesh: Mesh, plan: ShardingPlan,
                         fused: bool = False):
    """Build the jitted single-slot prefill for continuous batching on a
    sharded model: (w, tokens (1, T), n_valid, slot, cache) ->
    (last-token logits (V,), cache). ``slot`` addresses the GLOBAL batch;
    under dp every shard runs the same SPMD admission and only the owning
    shard's cache write survives (model.prefill_slot_fn)."""
    wspecs = weight_pspecs(cfg, plan, fused=fused)
    cspecs = cache_pspecs(plan)
    rep = P()

    fn = shard_map(partial(prefill_slot_fn, cfg, plan=plan), mesh=mesh,
                   in_specs=(wspecs, rep, rep, rep, cspecs),
                   out_specs=(P(plan.tp), cspecs), check_vma=False)
    return jax.jit(fn, donate_argnums=(4,))


def sharded_prefill_sp(cfg: ModelConfig, mesh: Mesh, plan: ShardingPlan,
                       fused: bool = False):
    """Build the jitted sequence-parallel full-window prefill:
    (w, tokens (B, T==seq_len), cache) -> (logits (B, T, V), cache).
    Prompt chunks shard over plan.sp; fresh K/V all-gather inside each layer
    (model.prefill_sp_fn); cache rows come back S-sharded over sp."""
    assert plan.sp is not None
    wspecs = weight_pspecs(cfg, plan, fused=fused)
    cspecs = cache_pspecs(plan, sp=True)

    fn = shard_map(partial(prefill_sp_fn, cfg, plan=plan), mesh=mesh,
                   in_specs=(wspecs, P(None, plan.sp), cspecs),
                   out_specs=(P(None, plan.sp, plan.tp), cspecs),
                   check_vma=False)
    return jax.jit(fn, donate_argnums=(2,))


def sharded_prefill(cfg: ModelConfig, mesh: Mesh, plan: ShardingPlan,
                    logits_mode: str = "last", fused: bool = False):
    """Build the jitted multi-chip prefill: (w, tokens, pos0, cache)."""
    wspecs = weight_pspecs(cfg, plan, fused=fused)
    cspecs = cache_pspecs(plan)
    batch = P(plan.dp)
    if logits_mode == "last":
        out_logits = P(plan.dp, plan.tp)
    elif logits_mode == "all":
        out_logits = P(plan.dp, None, plan.tp)
    else:
        out_logits = None

    fn = shard_map(partial(prefill_fn, cfg, logits_mode=logits_mode, plan=plan),
                   mesh=mesh, in_specs=(wspecs, P(plan.dp, None), batch, cspecs),
                   out_specs=(out_logits, cspecs), check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))
