"""Pallas flash-decode attention over the head-major KV cache.

TPU counterpart of the reference's decode attention stages
(src/infer.cu:493-553: transposed-K score, softmax, transposed-V mix) fused
into ONE kernel with an online softmax:

- the cache plane of each kv-head, (S, hd), streams HBM -> VMEM in blocks at
  its storage width (bf16/f16; fp8 KV decodes in-kernel)
- blocks past kv_len are never fetched: the block index map parks them on
  block 0 (re-reading an already-resident tile costs nothing) and compute is
  predicated off — the analogue of the reference reading exactly kv_len rows
- no f32 materialization of the cache, no transposes: scores and the value
  mix run on the MXU per block, the running (max, sum, acc) live in VMEM
  scratch across the S-block grid dimension
- the kernel reads the FULL layer-stacked cache (L, B, KVH, S, hd) at a
  layer offset carried in the scalar-prefetch operand, so the layer scan
  never slices (= copies) a cache plane to feed attention — the carried
  donated cache buffer is consumed in place.

Grid: (B, S/BS), S-blocks innermost; each grid step streams ALL kv-heads'
block rows in one (KVH, BS, hd) DMA (per-head 512 KB blocks measured
434 GB/s at B=8; the fused-head 4 MB blocks 536) and loops heads in-kernel.
Scratch carries the online-softmax state between S-steps, reset at block 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def _tuning():
    from calm_tpu.chip import tuning
    return tuning()


def set_interpret(on: bool):
    global _INTERPRET
    _INTERPRET = on


def _attn_kernel(sref, q_ref, k_ref, v_ref, o_ref,
                 m_ref, l_ref, acc_ref, *, bs: int, scale: float,
                 kv_fp8: bool, kvh: int, n_b: int):
    _attn_body(sref, q_ref, k_ref, v_ref, None, None, o_ref,
               m_ref, l_ref, acc_ref, bs=bs, scale=scale, kv_fp8=kv_fp8,
               kvh=kvh, n_b=n_b)


def _attn_kernel_partials(sref, q_ref, k_ref, v_ref, o_ref, mo_ref, lo_ref,
                          m_ref, l_ref, acc_ref, *, bs: int, scale: float,
                          kv_fp8: bool, kvh: int, n_b: int):
    """Sequence-parallel decode: emit the UNNORMALIZED flash state
    (acc, running max, running sum) so the exact softmax closes with one
    pmax + two psums across the sp axis (the flash-decoding split-KV merge,
    done here across chips instead of across SMs)."""
    _attn_body(sref, q_ref, k_ref, v_ref, None, None, (o_ref, mo_ref, lo_ref),
               m_ref, l_ref, acc_ref, bs=bs, scale=scale, kv_fp8=kv_fp8,
               kvh=kvh, n_b=n_b)


def _attn_kernel_fresh(sref, q_ref, k_ref, v_ref, fk_ref, fv_ref, o_ref,
                       m_ref, l_ref, acc_ref, *, bs: int, scale: float,
                       kv_fp8: bool, kvh: int, n_b: int):
    _attn_body(sref, q_ref, k_ref, v_ref, fk_ref, fv_ref, o_ref,
               m_ref, l_ref, acc_ref, bs=bs, scale=scale, kv_fp8=kv_fp8,
               kvh=kvh, n_b=n_b)


def _attn_body(sref, q_ref, k_ref, v_ref, fk_ref, fv_ref, o_ref,
               m_ref, l_ref, acc_ref, *, bs: int, scale: float,
               kv_fp8: bool, kvh: int, n_b: int):
    """sref layout: [layer, batch_off, kv_len_0..kv_len_{B-1}
    (, kv_pos_0..kv_pos_{B-1} in fresh mode)].
    batch_off maps local q row b to cache row batch_off + b (pipeline
    microbatching addresses a slice of the full-B cache). One grid step
    holds ALL kv-heads' rows of one S-block; heads unroll in-kernel.

    Fresh mode (fk/fv given): the current token's K/V rows are NOT yet in
    the cache — the deferred-write decode path batches the cache update
    outside the layer scan. Their softmax contribution seeds the online
    state at block 0, and the stale cache row at kv_pos (rolled windows
    overwrite in place) is masked out."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    kv_len = sref[b + 2]
    block_live = s * bs < kv_len
    fresh = fk_ref is not None

    @pl.when(s == 0)
    def _():
        if fresh:
            for h in range(kvh):
                # VPU multiply-reduce: an (M, hd) x (1, hd) MXU dot with a
                # 1-lane output fails Mosaic verification
                q = q_ref[0, h].astype(jnp.float32)           # (M, hd)
                fk = fk_ref[0, h][None].astype(jnp.float32)   # (1, hd)
                sc = jnp.sum(q * fk, axis=1, keepdims=True) * scale
                m_ref[h] = sc
                l_ref[h] = jnp.ones_like(l_ref[h])
                acc_ref[h] = jnp.broadcast_to(
                    fv_ref[0, h][None].astype(jnp.float32), acc_ref[h].shape)
        else:
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(block_live)
    def _():
        col = None
        dead_col = sref[b + 2 + n_b] if fresh else None  # stale row (rolled)
        for h in range(kvh):
            q = q_ref[0, h].astype(jnp.bfloat16)     # (M, hd)
            k = k_ref[0, 0, h]                       # (BS, hd) storage dtype
            v = v_ref[0, 0, h]
            if kv_fp8:
                k = k.astype(jnp.bfloat16)
                v = v.astype(jnp.bfloat16)

            scores = jax.lax.dot_general(            # (M, BS)
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            if col is None:
                col = s * bs + jax.lax.broadcasted_iota(
                    jnp.int32, scores.shape, 1)
            live = col < kv_len
            if fresh:
                live = live & (col != dead_col)
            scores = jnp.where(live, scores, -jnp.inf)

            m_prev = m_ref[h]                        # (M, 1)
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)          # rescale of old state
            p = jnp.exp(scores - m_new)              # (M, BS)

            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(                # (M, hd)
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = m_new

    @pl.when(s == n_s - 1)
    def _():
        if isinstance(o_ref, tuple):  # partials: no normalization here
            o_ref[0][0] = acc_ref[:].astype(o_ref[0].dtype)
            o_ref[1][0] = m_ref[:]
            o_ref[2][0] = l_ref[:]
        else:
            o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "partials"))
def _decode_attention(q, k_cache, v_cache, kv_len, layer, batch_off,
                      interpret: bool, fresh=None, pt=None,
                      partials: bool = False):
    """``pt`` (B, n_blocks) int32 switches to PAGED mode: the cache's
    second axis is a physical page pool (L, P, KVH, PR, hd) and logical
    S-block j of slot b streams from page pt[b, j] — the page table rides
    in the scalar-prefetch operand and redirects the kv BlockSpec index
    map; the kernel body is unchanged (TPU-native paging uses
    attention-block-SIZED pages so per-step DMAs stay multi-MB, unlike
    GPU-style 16-row pages)."""
    B, H, hd = q.shape
    _, _, KVH, S_or_PR, _ = k_cache.shape
    M = H // KVH
    kv_fp8 = k_cache.dtype == jnp.float8_e5m2
    paged = pt is not None

    # big KV blocks measure ~3x the HBM throughput of 512-row blocks on v5e
    # (small per-step DMAs cannot hide the grid-step overhead); all kv-heads
    # ride in one (KVH, bs, hd) block per step — 434 -> 536 GB/s at B=8.
    # Cap the fused block at ~8 MiB so MHA models (large KVH) still fit two
    # double-buffered k+v blocks in VMEM.
    if paged:
        bs = S_or_PR          # page size IS the block size
        n_s = pt.shape[1]
    else:
        S = S_or_PR
        bs = min(2048, S)
        while (KVH * bs * hd * k_cache.dtype.itemsize
               > _tuning().attn_block_bytes and bs > 256):
            bs //= 2
        n_s = pl.cdiv(S, bs)
    scale = 1.0 / math.sqrt(hd)

    qkv = q.reshape(B, KVH, M, hd)

    def q_map(b, s, sref):
        return (b, 0, 0, 0)

    if paged:
        # pt entries live after [layer, batch_off, kv_len x B
        # (, kv_pos x B in fresh mode)]
        pt_off = 2 + B + (B if fresh is not None else 0)

        def kv_map(b, s, sref, pt_off=pt_off, n_s=n_s):
            # page-table redirect; dead blocks carry the slot's page 0 so
            # they re-hit the resident tile (host fills them that way)
            return (sref[0], sref[pt_off + b * n_s + s], 0, 0, 0)
    else:
        def kv_map(b, s, sref):
            # park dead blocks on block 0: already resident, no HBM traffic
            live = s * bs < sref[b + 2]
            return (sref[0], sref[1] + b, 0, jnp.where(live, s, 0), 0)

    def o_map(b, s, sref):
        return (b, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, KVH, M, hd), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KVH, bs, hd), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KVH, bs, hd), kv_map, memory_space=pltpu.VMEM),
    ]
    sref_parts = [layer[None].astype(jnp.int32),
                  batch_off[None].astype(jnp.int32),
                  kv_len.astype(jnp.int32)]
    inputs = [qkv, k_cache, v_cache]
    if partials:
        assert fresh is None and pt is None, \
            "partials mode composes with neither deferred writes nor paging"
        kern = functools.partial(_attn_kernel_partials, bs=bs, scale=scale,
                                 kv_fp8=kv_fp8, kvh=KVH, n_b=B)
    elif fresh is None:
        kern = functools.partial(_attn_kernel, bs=bs, scale=scale,
                                 kv_fp8=kv_fp8, kvh=KVH, n_b=B)
    else:
        fk, fv, kv_pos = fresh  # (B, KVH, hd) in cache dtype, (B,) rows
        f_spec = pl.BlockSpec((1, KVH, hd), lambda b, s, sref: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        in_specs += [f_spec, f_spec]
        inputs += [fk, fv]
        sref_parts.append(kv_pos.astype(jnp.int32))
        kern = functools.partial(_attn_kernel_fresh, bs=bs, scale=scale,
                                 kv_fp8=kv_fp8, kvh=KVH, n_b=B)
    if paged:
        sref_parts.append(pt.astype(jnp.int32).reshape(-1))

    out_specs = pl.BlockSpec((1, KVH, M, hd), o_map, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, KVH, M, hd), jnp.float32)
    if partials:
        ml_spec = pl.BlockSpec((1, KVH, M, 1), o_map, memory_space=pltpu.VMEM)
        ml_shape = jax.ShapeDtypeStruct((B, KVH, M, 1), jnp.float32)
        out_specs = [out_specs, ml_spec, ml_spec]
        out_shape = [out_shape, ml_shape, ml_shape]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_s),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((KVH, M, 1), jnp.float32),    # running max
            pltpu.VMEM((KVH, M, 1), jnp.float32),    # running sum
            pltpu.VMEM((KVH, M, hd), jnp.float32),   # running acc
        ],
    )

    sref = jnp.concatenate(sref_parts)
    kv_bytes = 2 * B * KVH * n_s * bs * hd * k_cache.dtype.itemsize
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * hd * n_s * bs,
            bytes_accessed=kv_bytes + 8 * B * H * hd,
            transcendentals=B * H * n_s * bs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_tuning().vmem_limit_bytes),
        interpret=interpret,
    )(sref, *inputs)
    if partials:
        acc, m, l = out
        return (acc.reshape(B, H, hd), m.reshape(B, H, 1),
                l.reshape(B, H, 1))
    return out.reshape(B, H, hd)


def decode_attention(q, k_cache, v_cache, kv_len, layer=None, batch_off=0,
                     fresh=None, pt=None, partials: bool = False):
    """q (B, H, hd) f32; caches (L, B_full, KVH, S, hd) with scalar ``layer``
    selecting the plane (or (B, KVH, S, hd) for a single-layer cache);
    local q row b attends cache row batch_off + b; kv_len (B,) ->
    (B, H, hd).

    ``fresh`` = (fresh_k (B, KVH, hd) cache-dtype, fresh_v, kv_pos (B,)):
    deferred-write mode — the current token's rows are supplied directly
    (NOT read from the cache, whose row kv_pos may hold a stale rolled
    entry); the caller batches the actual cache write after the layer scan.

    ``pt`` (B, n_blocks) int32: PAGED mode — caches are a page pool
    (L, P, KVH, page_rows, hd) and slot b's logical block j streams from
    page pt[b, j] (see calm_tpu/paged.py).

    ``partials``: return the UNNORMALIZED flash state
    (acc (B, H, hd), m (B, H, 1), l (B, H, 1)) instead of acc/l — the
    sequence-parallel decode path merges shards' partial softmaxes exactly
    with pmax/psum outside the kernel (model._attention).
    """
    if k_cache.ndim == 4:
        k_cache, v_cache = k_cache[None], v_cache[None]
        layer = jnp.int32(0)
    return _decode_attention(q, k_cache, v_cache, kv_len,
                             jnp.asarray(layer, jnp.int32),
                             jnp.asarray(batch_off, jnp.int32), _INTERPRET,
                             fresh=fresh, pt=pt, partials=partials)


# ---------------------------------------------------------------------------
# prefill flash attention over the same carried cache
# ---------------------------------------------------------------------------


def _prefill_kernel(sref, q_ref, k_ref, v_ref, o_ref,
                    m_ref, l_ref, acc_ref, *, bq: int, bs: int, m_rep: int,
                    scale: float, kv_fp8: bool):
    """sref layout: [layer, pos0_0.., pos0_{B-1}, kv_len_0..]. Query rows
    pack (t, m) pairs: row r of q-block qi is query position
    pos0 + qi*bq_t + r // m_rep (bq = bq_t * m_rep rows)."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    s = pl.program_id(3)
    n_s = pl.num_programs(3)
    B = pl.num_programs(0)

    pos0 = sref[b + 1]
    kv_len = sref[B + b + 1]
    bq_t = bq // m_rep
    # causal upper bound for this q block: its last absolute position
    q_hi = pos0 + qi * bq_t + bq_t - 1
    block_live = (s * bs < kv_len) & (s * bs <= q_hi)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(block_live)
    def _():
        # q block arrives in the model's natural (bq_t, 1, M, hd) layout
        # (strided DMA): no host-side transpose/relayout of the q tensor
        q = q_ref[0, :, 0].reshape(bq, q_ref.shape[-1]).astype(jnp.bfloat16)
        k = k_ref[0, 0, 0]                          # (bs, hd)
        v = v_ref[0, 0, 0]
        if kv_fp8:
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)

        scores = jax.lax.dot_general(                # (bq, bs)
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        col = s * bs + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        q_pos = pos0 + qi * bq_t + row // m_rep
        ok = (col < kv_len) & (col <= q_pos)
        scores = jnp.where(ok, scores, -jnp.inf)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        # rows with no visible column yet keep m == -inf; exp(-inf - -inf)
        # would be NaN — clamp the shift for those rows (their p is all 0)
        shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.exp(jnp.where(jnp.isfinite(m_prev), m_prev - shift, -jnp.inf))
        alpha = jnp.where(jnp.isfinite(m_prev), alpha, 0.0)
        p = jnp.exp(scores - shift)

        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s == n_s - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-37)
        o_ref[0, :, 0] = (acc_ref[:] / denom).reshape(
            o_ref.shape[1], o_ref.shape[3], o_ref.shape[4]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _prefill_attention(q, k_cache, v_cache, pos0, kv_len, layer,
                       interpret: bool):
    """q (B, T, KVH, M, hd) f32; caches (L, B, KVH, S, hd); pos0/kv_len (B,).
    Causal flash attention of T queries against cache rows [0, kv_len);
    query t sits at absolute position pos0 + t. -> (B, T, KVH, M, hd).

    q/o blocks DMA straight from/to the model's natural layout (strided
    (bq_t, 1, M, hd) blocks), removing the host-side (B,T,KVH,M,hd) <->
    (B,KVH,T*M,hd) transposes. With the 1024-row KV blocks this is +2.4%
    end-to-end prefill at T=2048 (190.2 -> 185.8 ms/chunk, slope-timed)."""
    B, T, KVH, M, hd = q.shape
    S = k_cache.shape[3]
    kv_fp8 = k_cache.dtype == jnp.float8_e5m2

    # 1024-row KV blocks measured 0.65 ms/layer vs 0.80 at 2048 for the
    # T=2048 prefill (smaller blocks double-buffer better against the two
    # dots + exp chain); decode keeps 2048 (bandwidth-bound, M=4 rows)
    bs = min(1024, S)
    bq_t = max(1, min(256, T))
    while T % bq_t:
        bq_t //= 2
    bq = bq_t * M
    n_q = T // bq_t
    n_s = pl.cdiv(S, bs)
    scale = 1.0 / math.sqrt(hd)

    def q_map(b, h, qi, s, sref):
        return (b, qi, h, 0, 0)

    def kv_map(b, h, qi, s, sref):
        Bn = pl.num_programs(0)
        pos0 = sref[b + 1]
        kv_len = sref[Bn + b + 1]
        q_hi = pos0 + qi * bq_t + bq_t - 1
        live = (s * bs < kv_len) & (s * bs <= q_hi)
        return (sref[0], b, h, jnp.where(live, s, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH, n_q, n_s),
        in_specs=[
            pl.BlockSpec((1, bq_t, 1, M, hd), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bs, hd), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bs, hd), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq_t, 1, M, hd), q_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
    )

    sref = jnp.concatenate([layer[None].astype(jnp.int32),
                            pos0.astype(jnp.int32), kv_len.astype(jnp.int32)])
    return pl.pallas_call(
        functools.partial(_prefill_kernel, bq=bq, bs=bs, m_rep=M,
                          scale=scale, kv_fp8=kv_fp8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, KVH, M, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_tuning().vmem_limit_bytes),
        interpret=interpret,
    )(sref, q, k_cache, v_cache)


def prefill_attention(q, k_cache, v_cache, pos0, kv_len, layer):
    """Flash prefill attention: q (B, T, KVH, M, hd) f32 against the carried
    cache at ``layer``; query t at absolute position pos0[b] + t, cache rows
    [0, kv_len[b]) visible causally. -> (B, T, KVH, M, hd)."""
    return _prefill_attention(q, k_cache, v_cache,
                              jnp.asarray(pos0, jnp.int32),
                              jnp.asarray(kv_len, jnp.int32),
                              jnp.asarray(layer, jnp.int32), _INTERPRET)
