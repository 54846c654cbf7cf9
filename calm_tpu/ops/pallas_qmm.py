"""Pallas fused dequant-matmul kernels — the decode hot path.

TPU counterpart of the reference's matmul_warppar dequant-matvec family
(src/helpers.cuh:127-278): weights stream HBM -> VMEM at their packed width
(2/1/0.5 bytes per value), dequantize on the VPU in-registers, and feed the
dot — the activation row count is tiny at decode time, so the whole op is
HBM-bandwidth-bound and the win is reading 1x packed bytes instead of
letting XLA materialize a widened copy.

Formats:
- fp16: bitcast-free upconvert
- fp8 e5m2: u8 -> u16 << 8 -> bitcast f16 (e5m2 is truncated f16, same trick
  as fp8x4_e5m2_ff, src/helpers.cuh:64-77)
- gf4: u32 word = fp8 scale byte + 8x3-bit codes; decode is shifts/masks +
  one scale multiply (src/helpers.cuh:100-113); the (TD, N/8, 8) -> (TD, N)
  regroup is a row-major view so Mosaic lowers it to a lane interleave

The grid walks output-row tiles; Pallas double-buffers the weight-tile DMA
against the previous tile's dequant+dot, so HBM stays saturated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret=True for CPU tests
_INTERPRET = False


def set_interpret(on: bool):
    global _INTERPRET
    _INTERPRET = on


# Mosaic on the current backend has no f16 type; f16/e5m2 bits are decoded to
# f32 with pure integer ops + one rebias multiply: place sign/exp/mant in the
# f32 bit positions (exponent still f16-biased), bitcast, then multiply by
# 2^112 = 2^(127-15). Zeros and subnormals come out exact; inf/NaN become
# large finite values — same fast-path tradeoff as the reference
# (src/helpers.cuh:64-77 skips NaN handling).
_REBIAS = float(2.0 ** 112)


def _f16_bits_to_f32(b):
    """b: uint32 holding f16 bits in the low 16."""
    f = pltpu.bitcast(((b & 0x8000) << 16) | ((b & 0x7FFF) << 13), jnp.float32)
    return f * _REBIAS


def _dequant_tile(w, fmt: str):
    """Dequantize a weight tile to bf16 on the VPU.

    bf16 is EXACT for fp8-e5m2 values (2-bit mantissa) and for gf4 products
    ((code-4) * e5m2-scale: <= 5 mantissa bits); fp16 weights lose 3 mantissa
    bits — the MXU's native input width (a single-pass f32 dot lowers to bf16
    operands anyway; an exact bf16x2 split is a planned quality mode).
    """
    if fmt == "fp16":
        return _f16_bits_to_f32(w.astype(jnp.uint32)).astype(jnp.bfloat16)
    if fmt == "fp8":
        return w.astype(jnp.bfloat16)  # native e5m2 -> bf16, exact
    raise ValueError(fmt)


def _pick_tile(d: int, packed_row_bytes: int) -> int:
    """Output-row tile: target ~7 MiB per weight block (v5e VMEM is large
    enough to double-buffer two such blocks, and bigger DMAs measure much
    closer to the HBM ceiling: 7 MiB tiles sustain ~360 GB/s on gf4 vs
    ~230 GB/s at 1.5 MiB). The tile is the output's lane axis, so it must be
    a multiple of 128 (or cover d exactly)."""
    from calm_tpu.chip import tuning
    target = tuning().qmm_tile_bytes
    td = max(128, min(d, target // max(packed_row_bytes, 1)))
    td = (td // 128) * 128
    return min(max(td, 128), d) if d % 128 == 0 else max(td, 128)


# the decode planes are live alongside the packed tile: raise the scoped
# VMEM cap (these chips carry 128 MiB physical; the 16 MiB default OOMs at
# the multi-MiB tile size that big DMAs need). Lazy: chip detection must
# not fire at import time.
def _vmem_params():
    from calm_tpu.chip import tuning
    return pltpu.CompilerParams(vmem_limit_bytes=tuning().vmem_limit_bytes)


def _layered_qmm_kernel(lref, x_ref, w_ref, o_ref, *, fmt: str):
    wf = _dequant_tile(w_ref[0], fmt)  # (TD, N)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), wf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _layered_gf4_kernel(lref, xp_ref, w_ref, o_ref):
    """gf4 matvec without any lane relayout.

    A (TD, N/8, 8) -> (TD, N) interleave is unsupported by the Mosaic layout
    inference, so instead each of the 8 3-bit planes is decoded to a
    lane-contiguous (TD, N/8) tile and dotted against the matching slice of a
    pre-permuted x (x[k::8] lives at xp[:, k, :]) — 8 partial MXU dots,
    f32-accumulated. Same column permutation on both operands = same result.
    """
    wu = pltpu.bitcast(w_ref[0], jnp.uint32)  # (TD, N/8)
    sf = pltpu.bitcast(((wu & 0x80) << 24) | ((wu & 0x7F) << 21), jnp.float32)
    scale = sf * (-0.25 * _REBIAS)
    acc = None
    for k in range(8):
        codes = ((wu >> (8 + 3 * k)) & 7).astype(jnp.int32).astype(jnp.float32)
        plane = ((codes - 4.0) * scale).astype(jnp.bfloat16)  # (TD, N/8)
        d = jax.lax.dot_general(
            xp_ref[:, k, :].astype(jnp.bfloat16), plane,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("fmt", "interpret"))
def _qmm(x, wdata, layer, fmt: str, interpret: bool):
    """Matvec against layer ``layer`` of the stacked (L, d, n_packed) weight.

    The layer index rides in the scalar-prefetch operand and feeds the
    weight BlockSpec's index map, so the kernel streams its layer's packed
    bytes straight from the full stacked array — handing a scan-sliced
    (d, n_packed) weight to a custom call instead makes XLA materialize the
    slice (a full weight copy per layer per token, measured: gf4 decode
    drops from ~360 to ~200 GB/s).
    """
    B = x.shape[0]
    L, d, n_packed = wdata.shape
    packed_bytes = {"fp16": 2, "fp8": 1, "gf4": 4}[fmt]
    td = _pick_tile(d, n_packed * packed_bytes)
    grid = (pl.cdiv(d, td),)
    cost = pl.CostEstimate(
        flops=2 * B * d * x.shape[1],
        bytes_accessed=d * n_packed * packed_bytes + 4 * B * (d + x.shape[1]),
        transcendentals=0)

    def w_map(i, lref):
        return (lref[0], i, 0)

    if fmt == "gf4":
        np8 = n_packed  # = N/8
        # pre-permute x so plane k aligns with xp[:, k, :] (see kernel doc).
        # (measured: this transpose op costs only ~0.2 ms/tok at 7B — the
        # gf4 whole-model gap is per-kernel-call overhead, not this)
        xp = x.astype(jnp.float32).reshape(B, np8, 8).transpose(0, 2, 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((B, 8, np8), lambda i, l: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, td, np8), w_map, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, td), lambda i, l: (0, i),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            _layered_gf4_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, d), jnp.float32),
            cost_estimate=cost,
            compiler_params=_vmem_params(),
            interpret=interpret,
        )(layer.astype(jnp.int32)[None], xp, wdata)

    if fmt == "fp16":  # Mosaic has no f16: kernel decodes raw bits
        wdata = jax.lax.bitcast_convert_type(wdata, jnp.uint16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[
            pl.BlockSpec((B, x.shape[1]), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, td, n_packed), w_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, td), lambda i, l: (0, i),
                               memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_layered_qmm_kernel, fmt=fmt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d), jnp.float32),
        cost_estimate=cost,
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(layer.astype(jnp.int32)[None], x.astype(jnp.float32), wdata)


def qmm_decode(x: jax.Array, wdata: jax.Array, fmt: str,
               layer=None) -> jax.Array:
    """x (B, n) f32 @ W[layer]^T for packed stacked W (L, d, n_packed)
    -> (B, d) f32. A 2-D W is treated as a single-layer stack."""
    if wdata.ndim == 2:
        wdata = wdata[None]
        layer = jnp.int32(0)
    return _qmm(x, wdata, jnp.asarray(layer, jnp.int32), fmt, _INTERPRET)


# ---------------------------------------------------------------------------
# fused gf4 FFN: w1/w3 + activation + w2 in ONE kernel
# ---------------------------------------------------------------------------


def _gf4_scale(wu):
    """fp8-e5m2 group-scale byte -> f32 * -0.25 (see module header)."""
    sf = pltpu.bitcast(((wu & 0x80) << 24) | ((wu & 0x7F) << 21), jnp.float32)
    return sf * (-0.25 * _REBIAS)


def _gf4_plane_dot(x_planes, wu, out_rows):
    """8-plane gf4 matvec: sum_j x_planes[:, j, :] @ dec_j(wu)^T.

    x_planes (B, 8, G) f32; wu (..., G) u32 with prod(...) == out_rows
    -> (B, out_rows) f32."""
    wu = wu.reshape(out_rows, wu.shape[-1])
    scale = _gf4_scale(wu)
    acc = None
    for j in range(8):
        codes = ((wu >> (8 + 3 * j)) & 7).astype(jnp.int32).astype(jnp.float32)
        plane = ((codes - 4.0) * scale).astype(jnp.bfloat16)
        d = jax.lax.dot_general(
            x_planes[:, j, :].astype(jnp.bfloat16), plane,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _gf4_ffn_kernel(lref, xp_ref, w1_ref, w3_ref, w2_ref, o_ref, *,
                    tc: int, g_h: int, act_gelu: bool):
    """One grid step handles ``tc`` w2 word-columns == 8*tc hidden rows:
    h = act(w1_tile @ x) * (w3_tile @ x), then out += dec(w2_cols) @ h.

    The whole FFN streams through ONE pallas_call: Pallas double-buffers
    the (w1, w3, w2) tiles of step i+1 under step i's decode+dots, so the
    3 matvecs never hit the dependent-kernel-boundary stall (measured
    ~15-26 us + a cold first-tile DMA per call: chained 8.4 MB gf4 calls
    run at 171-218 GB/s vs 361 inside one kernel, docs/PERF_NOTES.md).

    w1/w3 arrive PLANE-MAJOR over hidden: w1p[l, k, c, :] = w1[l, 8c+k, :],
    so h lands as (B, 8*tc) with h[:, k*tc+c] = h_row(8*(i*tc+c)+k) — plane
    k of a w2 word-column is the CONTIGUOUS slice h[:, k*tc:(k+1)*tc], no
    in-kernel lane shuffles (the analogue of the Metal backend's load-time
    weight massage, reference src/infer.m:134-164).
    """
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    # h1/h3: (B, 8*tc) in plane-major hidden order
    h1 = _gf4_plane_dot(xp_ref[:], w1_ref[0], 8 * tc)
    h3 = _gf4_plane_dot(xp_ref[:], w3_ref[0], 8 * tc)
    if act_gelu:
        ga = 0.7978845608028654  # sqrt(2/pi); tanh-approx gelu
        a = 0.5 * h1 * (1.0 + jnp.tanh(ga * (h1 + 0.044715 * h1 * h1 * h1)))
    else:
        a = h1 * (1.0 / (1.0 + jnp.exp(-h1)))  # silu
    h = a * h3

    # tail mask: word-columns beyond H/8 carry garbage (padded block)
    col = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    h = jnp.where(i * tc + col % tc < g_h, h, 0.0)

    # w2 word-column tile from the TRANSPOSED (H/8, D) layout: a (tc, D)
    # CONTIGUOUS slab (column slices of the natural (D, H/8) layout read
    # 1 KB per row stride — measured a net regression); plane k dots the
    # contiguous h slice
    wu2 = pltpu.bitcast(w2_ref[0], jnp.uint32)  # (tc, D)
    scale2 = _gf4_scale(wu2)
    acc = None
    for k in range(8):
        codes = ((wu2 >> (8 + 3 * k)) & 7).astype(jnp.int32).astype(jnp.float32)
        plane = ((codes - 4.0) * scale2).astype(jnp.bfloat16)  # (tc, D)
        d = jax.lax.dot_general(
            h[:, k * tc:(k + 1) * tc].astype(jnp.bfloat16), plane,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d

    @pl.when(i == 0)
    def _():
        o_ref[:] = acc

    @pl.when(i > 0)
    def _():
        o_ref[:] = o_ref[:] + acc
    del n_i


@functools.partial(jax.jit, static_argnames=("act_gelu", "interpret"))
def _gf4_ffn(x, w1p, w3p, w2t, layer, act_gelu: bool, interpret: bool):
    """x (B, D) f32; w1p/w3p (L, 8, H/8, D/8) i32 plane-major; w2t
    (L, H/8, D) i32 word-transposed (see fuse_gf4_weights) -> (B, D) f32
    = w2 @ (act(w1 x) * (w3 x))."""
    B, D = x.shape
    L, _, g_h, g_d = w1p.shape
    # tile size: keep the three double-buffered weight slabs within the
    # per-chip scratch budget
    from calm_tpu.chip import tuning
    scratch_budget = tuning().moe_scratch_bytes
    tc = 128
    while (2 * 8 * tc * g_d + tc * D) * 4 * 2 < scratch_budget and tc * 2 <= g_h:
        tc *= 2
    grid = (pl.cdiv(g_h, tc),)
    xp = x.astype(jnp.float32).reshape(B, g_d, 8).transpose(0, 2, 1)
    cost = pl.CostEstimate(
        flops=2 * B * (2 * 8 * g_h * 8 * g_d + D * 8 * g_h),
        bytes_accessed=(2 * 8 * g_h * g_d + D * g_h) * 4,
        transcendentals=8 * g_h * B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[
            pl.BlockSpec((B, 8, g_d), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tc, g_d), lambda i, l: (l[0], 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tc, g_d), lambda i, l: (l[0], 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc, D), lambda i, l: (l[0], i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), lambda i, l: (0, 0),
                               memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_gf4_ffn_kernel, tc=tc, g_h=g_h,
                          act_gelu=act_gelu),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        cost_estimate=cost,
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(layer.astype(jnp.int32)[None], xp, w1p, w3p, w2t)


def gf4_ffn(x: jax.Array, w1p: jax.Array, w3p: jax.Array, w2t: jax.Array,
            layer, act_gelu: bool) -> jax.Array:
    """Fused gf4 FFN (see _gf4_ffn). Layer-stacked weights + traced layer."""
    return _gf4_ffn(x, w1p, w3p, w2t, jnp.asarray(layer, jnp.int32),
                    act_gelu, _INTERPRET)


def gf4_ffn_supported(x_shape, w1p, w2t) -> bool:
    """Fused-FFN eligibility: fused layouts present, decode-sized batch."""
    if w1p is None or w2t is None or w1p.ndim != 4 or w2t.ndim != 3:
        return False
    rows = 1
    for s in x_shape[:-1]:
        rows *= s
    if rows > 16:
        return False
    L, eight, g_h, g_d = w1p.shape
    return (eight == 8 and x_shape[-1] == g_d * 8
            and w2t.shape[1] == g_h)


# ---------------------------------------------------------------------------
# expert-indexed matvecs for MoE decode
# ---------------------------------------------------------------------------


def _moe_dense_kernel(sref, x_ref, w_ref, o_ref, *, fmt: str):
    wf = _dequant_tile(w_ref[0, 0], fmt)  # (TD, N)
    o_ref[0] = jax.lax.dot_general(      # x block: (1, B, N), Ax via the map
        x_ref[0].astype(jnp.bfloat16), wf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _moe_dense_gf4_kernel(sref, xp_ref, w_ref, o_ref):
    wu = pltpu.bitcast(w_ref[0, 0], jnp.uint32)  # (TD, N/8)
    sf = pltpu.bitcast(((wu & 0x80) << 24) | ((wu & 0x7F) << 21), jnp.float32)
    scale = sf * (-0.25 * _REBIAS)
    acc = None
    for k in range(8):
        codes = ((wu >> (8 + 3 * k)) & 7).astype(jnp.int32).astype(jnp.float32)
        plane = ((codes - 4.0) * scale).astype(jnp.bfloat16)  # (TD, N/8)
        d = jax.lax.dot_general(
            xp_ref[0, :, k, :].astype(jnp.bfloat16), plane,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("fmt", "interpret"))
def _qmm_moe_dense(x, wstack, layer, eidx, fmt: str, interpret: bool):
    """Dense expert sweep: Y[a] = x[min(a, Ax-1)] @ W[layer, eidx[a]]^T.

    x (Ax, B, n) with Ax in {1, A} (stage 1 shares one activation set across
    experts; stage 2 feeds each expert slot its own h rows); wstack
    (L, E, d, n_packed); eidx (A,) int32 — SORTED unique expert ids padded
    by repeating the last valid id -> (A, B, d).

    This is the batched-MoE dedup: the grid is (tiles, expert-slots) with
    slots innermost, so each active expert's packed tile streams HBM->VMEM
    exactly once per tile row (adjacent equal eidx entries keep the same
    weight-block index and Pallas skips the re-DMA). The per-row variant
    this replaces re-read an expert's bytes for every row routed to it —
    at B=8 top-2 over 4 experts that was ~4x redundant traffic (measured
    106 ms/step, a full expert sweep per step). Rows not routed to slot a
    are masked by the caller (weights matrix), like the reference's on-chip
    gather of only active experts (src/infer.cu:597-620).
    """
    Ax, B, n = x.shape
    L, E, d, n_packed = wstack.shape
    A = eidx.shape[0]
    packed_bytes = {"fp16": 2, "fp8": 1, "gf4": 4}[fmt]
    td = _pick_tile(d, n_packed * packed_bytes)
    grid = (pl.cdiv(d, td), A)
    sref = jnp.concatenate([layer.astype(jnp.int32)[None],
                            eidx.astype(jnp.int32)])

    def w_map(i, a, sref):
        return (sref[0], sref[a + 1], i, 0)

    def o_map(i, a, sref):
        return (a, 0, i)

    if fmt == "gf4":
        np8 = n_packed
        xp = x.astype(jnp.float32).reshape(Ax, B, np8, 8).transpose(0, 1, 3, 2)

        def x_map(i, a, sref):
            return (a if Ax > 1 else 0, 0, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((1, B, 8, np8), x_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, td, np8), w_map, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, td), o_map,
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            _moe_dense_gf4_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, B, d), jnp.float32),
            compiler_params=_vmem_params(), interpret=interpret,
        )(sref, xp, wstack)

    if fmt == "fp16":
        wstack = jax.lax.bitcast_convert_type(wstack, jnp.uint16)

    def x_map(i, a, sref):
        return (a if Ax > 1 else 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[
            pl.BlockSpec((1, B, n), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, td, n_packed), w_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, td), o_map, memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_moe_dense_kernel, fmt=fmt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, B, d), jnp.float32),
        compiler_params=_vmem_params(), interpret=interpret,
    )(sref, x.astype(jnp.float32), wstack)


def qmm_moe_dense(x: jax.Array, wstack: jax.Array, eidx: jax.Array, fmt: str,
                  layer=None) -> jax.Array:
    """Dense expert sweep (see _qmm_moe_dense): x (Ax, B, n), eidx (A,)
    sorted-unique-padded -> (A, B, d). A 3-D (E, d, n_packed) wstack is a
    single-layer stack."""
    if wstack.ndim == 3:
        wstack = wstack[None]
        layer = jnp.int32(0)
    return _qmm_moe_dense(x, wstack, jnp.asarray(layer, jnp.int32), eidx,
                          fmt, _INTERPRET)


def moe_supported(x_shape, wstack, fmt: str) -> bool:
    if fmt not in ("fp16", "fp8", "gf4"):
        return False
    if wstack.ndim not in (3, 4):
        return False
    n = wstack.shape[-1] * (8 if fmt == "gf4" else 1)
    if x_shape[-1] != n:
        return False
    rows = 1
    for s in x_shape[:-1]:
        rows *= s
    return rows <= 16


def supported(x_shape, wdata, fmt: str) -> bool:
    """Use the Pallas path for small-row decode matvecs with lane-aligned
    contraction; everything else stays on the XLA path (prefill rides MXU).
    wdata may be a 2-D weight or a layer-stacked 3-D weight."""
    if fmt not in ("fp16", "fp8", "gf4"):
        return False
    if wdata.ndim not in (2, 3):
        return False
    rows = 1
    for s in x_shape[:-1]:
        rows *= s
    n = wdata.shape[-1] * (8 if fmt == "gf4" else 1)
    if x_shape[-1] != n:
        return False
    # NOTE: the packed minor axis need NOT be lane-aligned — Mosaic masks
    # partial lanes (verified on hw; an earlier %128 gate here silently sent
    # w2 of models with hidden_dim/8 not divisible by 128 — llama2's
    # 11008/13824 — to the XLA unpack path at ~66 GB/s)
    return rows <= 16
