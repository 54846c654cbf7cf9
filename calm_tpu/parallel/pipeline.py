"""Pipeline parallelism: the layer stack sharded into stages over a mesh axis.

New scope vs the single-GPU reference (SURVEY.md §2.3 lists PP as an
extension). The capacity story: a model whose weights exceed one chip's HBM
splits its LAYERS across the pp axis — each stage holds (and streams, per
token) only its layer shard and the matching shard of the KV cache.

Decode schedule (this module): the activation wave hops stage to stage with
``jax.lax.ppermute``; stage s runs its local layer scan only on its turn
(``lax.cond`` keeps inactive stages from touching their weights), and the
final stage's logits are broadcast back with one psum. Latency is the sum of
stage times — for single-stream decode PP buys CAPACITY, not speed; combine
with dp (slots) to fill the bubble, or with tp inside each stage for speed.
A microbatched GPipe schedule over the dp slots is the natural extension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from calm_tpu.config import ModelConfig
from calm_tpu.model import (KVCache, _embed, _head, _rope_tables,
                            _run_layers, decode_indices)
from calm_tpu.parallel.plan import ShardingPlan
from calm_tpu.parallel.sharding import (cache_pspecs, shard_map,
                                        weight_pspecs)


def decode_step_pp_fn(cfg: ModelConfig, w, token, pos, cache: KVCache,
                      plan: ShardingPlan):
    """One decode token across pp stages (runs under shard_map).

    w.layers leaves and the cache are the LOCAL layer shard; embed/output
    are replicated. Every stage starts from the same embedded x; on
    superstep s only stage s transforms the wave (cond), then the wave
    ppermutes forward. After pp supersteps the fully-transformed x sits on
    stage 0, which computes logits; a psum broadcasts them.
    """
    pp = jax.lax.axis_size(plan.pp)
    stage = jax.lax.axis_index(plan.pp)

    kv_pos, kv_len = decode_indices(cfg, pos)
    kv_pos, q_pos = kv_pos[:, None], pos[:, None]
    x = _embed(cfg, w.embed, token[:, None], plan)
    rope = _rope_tables(cfg, q_pos, token.shape[0])

    kc, vc = cache.k, cache.v
    for s in range(pp):
        def active(x, kc, vc):
            x2, c2 = _run_layers(cfg, w, x, q_pos, kv_pos, kv_len,
                                 KVCache(kc, vc), rolling=True, rope=rope,
                                 plan=plan)
            return x2, c2.k, c2.v

        x, kc, vc = jax.lax.cond(stage == s, active,
                                 lambda x, kc, vc: (x, kc, vc), x, kc, vc)
        x = jax.lax.ppermute(x, plan.pp,
                             [(i, (i + 1) % pp) for i in range(pp)])

    # the finished wave landed back on stage 0
    logits = _head(cfg, w, x, "last")
    logits = jnp.where(stage == 0, logits, jnp.zeros_like(logits))
    logits = jax.lax.psum(logits, plan.pp)
    return logits, KVCache(kc, vc)


def sharded_decode_step_pp(cfg: ModelConfig, mesh: Mesh, plan: ShardingPlan):
    """Build the jitted pipeline-parallel decode step:
    (w, token (B,), pos (B,), cache) -> (logits (B, V), cache)."""
    assert plan.pp is not None
    wspecs = weight_pspecs(cfg, plan)
    cspecs = cache_pspecs(plan)
    batch = P(plan.dp)

    fn = shard_map(partial(decode_step_pp_fn, cfg, plan=plan), mesh=mesh,
                   in_specs=(wspecs, batch, batch, cspecs),
                   out_specs=(P(plan.dp, plan.tp), cspecs),
                   check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))


def decode_step_gpipe_fn(cfg: ModelConfig, w, token, pos, cache: KVCache,
                         plan: ShardingPlan, n_micro: int):
    """One decode token for B slots with a GPipe schedule (runs under
    shard_map): the B slots split into n_micro microbatches; superstep t has
    stage s working microbatch t - s, so all pp stages stream their layer
    shards CONCURRENTLY once the pipeline fills — the (pp-1)-step ramp is
    the only bubble. Each stage addresses its microbatch's slice of the
    full-B cache through the batch_off threading in the layer/attention
    code. Requires B % n_micro == 0.
    """
    pp = jax.lax.axis_size(plan.pp)
    stage = jax.lax.axis_index(plan.pp)
    B = token.shape[0]
    assert B % n_micro == 0
    Bm = B // n_micro

    kv_pos_f, kv_len_f = decode_indices(cfg, pos)
    q_pos_f = pos[:, None]
    x_full = _embed(cfg, w.embed, token[:, None], plan)     # (B, 1, D)
    rope_f = _rope_tables(cfg, q_pos_f, B)

    V_local = (w.output.shape[0] if plan.tp is None
               else w.output.data.shape[0])
    out_logits = jnp.zeros((B, V_local), jnp.float32)
    kc, vc = cache.k, cache.v
    x_buf = jnp.zeros((Bm, 1, cfg.dim), jnp.float32)

    for t in range(n_micro + pp - 1):
        m = t - stage                       # this stage's microbatch index
        valid = (m >= 0) & (m < n_micro)
        boff = jnp.clip(m, 0, n_micro - 1) * Bm

        # stage 0 injects a fresh microbatch; later stages take the wave
        inject = (stage == 0) & jnp.bool_(t < n_micro)
        x_in = jnp.where(inject,
                         jax.lax.dynamic_slice_in_dim(x_full, boff, Bm, 0),
                         x_buf)

        pos_m = jax.lax.dynamic_slice_in_dim(q_pos_f, boff, Bm, 0)
        kvp_m = jax.lax.dynamic_slice_in_dim(kv_pos_f, boff, Bm, 0)[:, None]
        kvl_m = jax.lax.dynamic_slice_in_dim(kv_len_f, boff, Bm, 0)
        rope_m = tuple(jax.lax.dynamic_slice_in_dim(r, boff, Bm, 0)
                       for r in rope_f)

        def active(x, kc, vc):
            x2, c2 = _run_layers(cfg, w, x, pos_m, kvp_m, kvl_m,
                                 KVCache(kc, vc), rolling=True, rope=rope_m,
                                 plan=plan, batch_off=boff)
            lg = jax.lax.cond(
                stage == pp - 1,
                lambda: _head(cfg, w, x2, "last"),
                lambda: jnp.zeros((Bm, V_local), jnp.float32))
            return x2, c2.k, c2.v, lg

        def passthrough(x, kc, vc):
            return x, kc, vc, jnp.zeros((Bm, V_local), jnp.float32)

        x_out, kc, vc, lg = jax.lax.cond(valid, active, passthrough,
                                         x_in, kc, vc)

        write = valid & (stage == pp - 1)
        cur = jax.lax.dynamic_slice_in_dim(out_logits, boff, Bm, 0)
        out_logits = jax.lax.dynamic_update_slice_in_dim(
            out_logits, jnp.where(write, lg, cur), boff, 0)

        x_buf = jax.lax.ppermute(x_out, plan.pp,
                                 [(i, (i + 1) % pp) for i in range(pp)])

    # only the last stage holds real logits; broadcast
    keep = (stage == pp - 1)
    out_logits = jax.lax.psum(jnp.where(keep, out_logits, 0.0), plan.pp)
    return out_logits, KVCache(kc, vc)


def sharded_decode_step_gpipe(cfg: ModelConfig, mesh: Mesh,
                              plan: ShardingPlan, n_micro: int):
    """Build the jitted GPipe decode step: (w, token (B,), pos (B,), cache)
    -> (logits (B, V), cache), with B slots pipelined as n_micro
    microbatches across the pp stages."""
    assert plan.pp is not None
    wspecs = weight_pspecs(cfg, plan)
    cspecs = cache_pspecs(plan)

    fn = shard_map(partial(decode_step_gpipe_fn, cfg, plan=plan,
                           n_micro=n_micro), mesh=mesh,
                   in_specs=(wspecs, P(), P(), cspecs),
                   out_specs=(P(None, plan.tp), cspecs),
                   check_vma=False)
    return jax.jit(fn, donate_argnums=(3,))


def make_pp_mesh(pp: int, tp: int = 1, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = pp * tp
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(pp, tp)
    return Mesh(arr, ("pp", "tp"))
