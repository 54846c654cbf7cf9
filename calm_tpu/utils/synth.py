"""Synthetic model weights generated directly on device.

For benchmarking and compile-checks we need full-size models without
downloading checkpoints: decode throughput is weight-value-independent
(bandwidth-bound), so weights are filled with a cheap deterministic pattern.
Everything is created device-side under jit — no multi-GB host allocations
or host->device transfers through the tunnel.

fp8/gf4 payloads mask exponent bits so no inf/NaN patterns appear (garbage
activations are fine for speed; non-finite values are not, since they can
change exp/softmax behavior).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from calm_tpu.config import ModelConfig
from calm_tpu.model import LayerWeights, Weights
from calm_tpu.ops.qmm import QTensor


@partial(jax.jit, static_argnames=("shape", "fmt"))
def _fill(shape, fmt: str, seed: int = 0):
    n = math.prod(shape)
    i = (jax.lax.iota(jnp.uint32, n) * jnp.uint32(2654435761) + jnp.uint32(seed))
    if fmt == "fp16":
        # small-magnitude halves: sign + low exponents, |x| < ~0.06
        bits = (i & jnp.uint32(0x83FF)) | jnp.uint32(0x2400)
        return jax.lax.bitcast_convert_type(
            bits.astype(jnp.uint16), jnp.float16).reshape(shape)
    if fmt == "fp8":
        bits = (i & jnp.uint32(0x9F)).astype(jnp.uint8)  # exp <= 7 -> finite, small
        return jax.lax.bitcast_convert_type(bits, jnp.float8_e5m2).reshape(shape)
    if fmt == "fp8e4":
        bits = (i & jnp.uint32(0xBF)).astype(jnp.uint8)  # exp <= 7: no NaN (0x7F)
        return jax.lax.bitcast_convert_type(bits, jnp.float8_e4m3fn).reshape(shape)
    if fmt == "gf4":
        # random 3-bit codes; scale byte masked to small finite fp8
        word = (i & jnp.uint32(0xFFFFFF00)) | (i & jnp.uint32(0x1F))
        return jax.lax.bitcast_convert_type(word, jnp.int32).reshape(shape)
    if fmt == "f32":
        bits = (i & jnp.uint32(0x807FFFFF)) | jnp.uint32(0x3E800000)  # ~[0.25, 0.5)
        return jax.lax.bitcast_convert_type(bits, jnp.float32).reshape(shape)
    raise ValueError(fmt)


def synth_weights(cfg: ModelConfig, seed: int = 0,
                  fused: bool = False) -> Weights:
    """Device-resident random weights with the exact container layouts.

    ``fused=True`` (gf4 MoE only) fills the fused decode layouts
    (wqkv / per-expert plane-major w1pe/w3pe) DIRECTLY instead of filling
    naturals and permuting: the device-side permutation holds a natural
    stack plus its transpose simultaneously (~3.8 GiB transient at
    Mixtral geometry on ~12 GiB resident = OOM on 16 GiB v5e). Values
    differ from fuse_gf4_weights(synth_weights(...)) — fine for
    bandwidth benchmarks, NOT for golden-hash pins. Real checkpoints
    take the equivalent host-side route (model.load_weights_fused)."""
    fmt = cfg.dtype
    gs = 8 if fmt == "gf4" else 1
    D, Hd, Q, KV, V, E, L = (cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim,
                             cfg.vocab_size, cfg.n_experts, cfg.n_layers)

    k = [seed]

    def nxt():
        k[0] += 1
        return k[0]

    def qt(*shape):
        data = _fill(tuple(shape), fmt, nxt())
        # fp8e4 carries a per-tensor dequant scale (unit here — the bench
        # still pays the real scale-multiply on the hot path)
        scale = (jnp.ones(tuple(shape[:-2]) + (1,), jnp.float32)
                 if fmt == "fp8e4" else None)
        return QTensor(data, fmt, scale)

    def f32(*shape):
        return _fill(tuple(shape), "f32", nxt())

    if fused and not (fmt == "gf4" and E and Hd % 8 == 0):
        raise ValueError("fused synth is the gf4-MoE OOM workaround only")

    fe = dict(w1pe=None, w3pe=None, wqkv=None)
    if E and not fused:
        w1 = qt(L, E, Hd, D // gs)
        w3 = qt(L, E, Hd, D // gs)
    elif E:
        # fused decode layouts generated in place of the naturals (the
        # shapes fuse_gf4_weights would build: plane-major expert stacks
        # + row-concat qkv); fuse_gf4_weights no-ops on the result
        w1 = w3 = None
        fe = dict(w1pe=_fill((L, E, 8, Hd // 8, D // gs), fmt, nxt()),
                  w3pe=_fill((L, E, 8, Hd // 8, D // gs), fmt, nxt()),
                  wqkv=_fill((L, Q + 2 * KV, D // gs), fmt, nxt()))
    else:
        w1 = qt(L, Hd, D // gs)
        w3 = qt(L, Hd, D // gs)
    if E:
        w2 = qt(L, E, D, Hd // gs)
        moegate = qt(L, E, D // gs)
    else:
        w2 = qt(L, D, Hd // gs)
        moegate = None

    layers = LayerWeights(
        attn_norm=f32(L, D), ffn_norm=f32(L, D),
        wq=None if fused else qt(L, Q, D // gs),
        wk=None if fused else qt(L, KV, D // gs),
        wv=None if fused else qt(L, KV, D // gs),
        wo=qt(L, D, Q // gs),
        bq=jnp.zeros((L, Q), jnp.float32), bk=jnp.zeros((L, KV), jnp.float32),
        bv=jnp.zeros((L, KV), jnp.float32),
        w1=w1, w2=w2, w3=w3, moegate=moegate, **fe)

    return Weights(embed=qt(V, D // gs), layers=layers,
                   final_norm=f32(D), output=qt(V, D // gs))


def weight_bytes(cfg: ModelConfig) -> tuple[int, int]:
    """(total_bytes, decode_bandwidth_bytes) for a synthetic model, matching
    the container accounting (reference: src/run.c:523-532): embedding is
    excluded from per-token bandwidth (one row read), MoE mlp scaled to
    active experts. Untied output assumed (synth always has one)."""
    bits = {"fp16": 16, "fp8": 8, "fp8e4": 8, "gf4": 4}[cfg.dtype]
    D, Hd, Q, KV, V, E, L = (cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim,
                             cfg.vocab_size, cfg.n_experts, cfg.n_layers)

    def b(n):  # quantized tensor bytes
        return n * bits // 8

    per_layer = b(Q * D + 2 * KV * D + D * Q)  # attention
    norms = 4 * (2 * L * D + D)
    if E:
        mlp_all = b(E * 3 * Hd * D)
        gate = b(E * D)
        mlp_bw = mlp_all // E * cfg.n_experts_ac + gate
        mlp_total = mlp_all + gate
    else:
        mlp_total = mlp_bw = b(3 * Hd * D)
    embed = b(V * D)
    output = b(V * D)
    total = embed + output + L * (per_layer + mlp_total) + norms
    bandwidth = output + L * (per_layer + mlp_bw) + norms
    return total, bandwidth
