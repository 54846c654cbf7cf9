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
        # plane stays f32: (codes-4)*scale has <= 6 significand bits, so the
        # MXU's own f32->bf16 input truncation is EXACT — skipping the
        # explicit astype removes ~1 VPU op/value (222 -> 206 us/layer on the
        # offn harness, docs/PERF_NOTES.md round-4 "decode op diet")
        plane = (codes - 4.0) * scale  # (TD, N/8)
        d = jax.lax.dot_general(
            xp_ref[:, k, :].astype(jnp.bfloat16), plane,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[:] = acc


@functools.lru_cache(maxsize=None)
def _qmm_jit(stage: str):
    """Per-stage jitted instance of the matvec: the function NAME carries
    the stage tag (``_qmm__wqkv`` etc.), which is what device traces show
    for the custom call — profiler.trace_table reads the tag back instead
    of guessing stages from wrapper-name fragments (the cudaprof analogue
    of an explicit kernel label, tools/cudaprof.cu:162-213)."""
    def fn(x, wdata, layer, fmt, interpret, pre_planed=False):
        return _qmm(x, wdata, layer, fmt, interpret, pre_planed)
    fn.__name__ = fn.__qualname__ = f"_qmm__{stage}" if stage else "_qmm"
    return jax.jit(fn, static_argnames=("fmt", "interpret", "pre_planed"))


def _qmm(x, wdata, layer, fmt: str, interpret: bool,
         pre_planed: bool = False):
    """Matvec against layer ``layer`` of the stacked (L, d, n_packed) weight.

    The layer index rides in the scalar-prefetch operand and feeds the
    weight BlockSpec's index map, so the kernel streams its layer's packed
    bytes straight from the full stacked array — handing a scan-sliced
    (d, n_packed) weight to a custom call instead makes XLA materialize the
    slice (a full weight copy per layer per token, measured: gf4 decode
    drops from ~360 to ~200 GB/s).

    ``pre_planed`` (gf4 only): x already carries the plane-permuted layout
    (B, 8, n/8) — the plane-major residual stream hands activations in this
    form directly, skipping the per-call transpose.
    """
    B = x.shape[0]
    L, d, n_packed = wdata.shape
    packed_bytes = {"fp16": 2, "fp8": 1, "gf4": 4}[fmt]
    td = _pick_tile(d, n_packed * packed_bytes)
    grid = (pl.cdiv(d, td),)
    n_in = x.shape[2] * 8 if pre_planed else x.shape[1]
    cost = pl.CostEstimate(
        flops=2 * B * d * n_in,
        bytes_accessed=d * n_packed * packed_bytes + 4 * B * (d + n_in),
        transcendentals=0)

    def w_map(i, lref):
        return (lref[0], i, 0)

    if fmt == "gf4":
        np8 = n_packed  # = N/8
        # pre-permute x so plane k aligns with xp[:, k, :] (see kernel doc).
        # (measured: this transpose op costs only ~0.2 ms/tok at 7B —
        # pre_planed callers avoid even that)
        if pre_planed:
            xp = x.astype(jnp.float32)
        else:
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
               layer=None, pre_planed: bool = False,
               stage: str = "") -> jax.Array:
    """x (B, n) f32 @ W[layer]^T for packed stacked W (L, d, n_packed)
    -> (B, d) f32. A 2-D W is treated as a single-layer stack. With
    ``pre_planed`` (gf4 only) x is (B, 8, n/8) in plane-permuted form.
    ``stage`` tags the kernel's trace name (profiler.trace_table)."""
    if wdata.ndim == 2:
        wdata = wdata[None]
        layer = jnp.int32(0)
    return _qmm_jit(stage)(x, wdata, jnp.asarray(layer, jnp.int32), fmt,
                           _INTERPRET, pre_planed=pre_planed)


# ---------------------------------------------------------------------------
# gf4 PREFILL matmul: row-blocked plane-dot with decode-once plane scratch
# ---------------------------------------------------------------------------


def _gf4_mm_kernel(lref, xp_ref, w_ref, o_ref, planes_ref):
    """Many-row gf4 matmul, grid (n_dtiles, n_rowblocks) — d OUTER so each
    weight tile is DMA'd and VPU-decoded exactly ONCE (into the bf16 plane
    scratch on the tile's first row-block) and reused by every row block
    via the MXU plane dots. This is what makes gf4 prefill competitive:
    the XLA path MATERIALIZES the 8x unpack to HBM per consumer (~4x the
    f32 weight bytes of extra traffic per chunk), while here the decode
    stays in VMEM and amortizes over all T rows."""
    wu = pltpu.bitcast(w_ref[0], jnp.uint32)  # (TD, N/8)

    @pl.when(pl.program_id(1) == 0)
    def _():
        scale = _gf4_scale(wu)
        for k in range(8):
            codes = ((wu >> (8 + 3 * k)) & 7).astype(jnp.int32)
            planes_ref[k] = ((codes.astype(jnp.float32) - 4.0)
                             * scale).astype(jnp.bfloat16)

    acc = None
    for k in range(8):
        d = jax.lax.dot_general(
            xp_ref[:, k, :].astype(jnp.bfloat16), planes_ref[k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[:] = acc  # xp arrives bf16; astype is a no-op kept for interpret


def _balance_tile(d: int, td: int) -> int:
    """Snap a row-tile down so the last tile isn't a sliver: d=4096 with
    td=3456 leaves a 640-row tail that costs a near-full grid step; the
    balanced 2048 splits evenly (measured on the prefill matmuls: the wo
    call ran at 38%% MXU largely on tail waste)."""
    n_t = pl.cdiv(d, td)
    return min(td, ((d + n_t - 1) // n_t + 127) // 128 * 128)


def mm_supported(x_shape, wdata, fmt: str) -> bool:
    """Row-blocked gf4 matmul eligibility: prefill-sized row counts (the
    <=16-row decode path keeps the matvec kernel; 17..31 stays on XLA)."""
    if fmt != "gf4" or wdata.ndim not in (2, 3):
        return False
    rows = 1
    for s in x_shape[:-1]:
        rows *= s
    return rows >= 32 and x_shape[-1] == wdata.shape[-1] * 8


@functools.lru_cache(maxsize=None)
def _qmm_mm_jit(stage: str):
    """Per-stage jitted row-blocked gf4 matmul (see _qmm_jit for why the
    NAME carries the stage tag)."""
    def fn(x, wdata, layer, interpret):
        R, n = x.shape
        L, d, np8 = wdata.shape
        # row block: bounded by the xp block's VMEM footprint (~8 MiB at
        # bf16 — the old 4 MiB f32 budget capped br at 72 rows for
        # 14336-wide hidden, starving the MXU: the w2t matmul traced
        # 5.0 ms/layer vs w1's 2.25 at T=2048). The block is fed bf16
        # (the kernel casts for the dot anyway): half the re-streamed
        # activation bytes per d-tile, twice the rows per step.
        br = min(512, max(32, (8 << 20) // (2 * n) // 8 * 8), R)
        if br > 128:
            br = br // 128 * 128  # whole MXU M-passes (288 rows = 2.25)
        td = _balance_tile(d, _pick_tile(d, np8 * 4))
        xp = x.astype(jnp.bfloat16).reshape(R, np8, 8).transpose(0, 2, 1)
        grid = (pl.cdiv(d, td), pl.cdiv(R, br))  # rows innermost
        cost = pl.CostEstimate(
            flops=2 * R * d * n,
            bytes_accessed=(d * np8 * 4 + 4 * R * n * pl.cdiv(d, td)
                            + 4 * R * d),
            transcendentals=0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((br, 8, np8), lambda j, i, l: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, td, np8), lambda j, i, l: (l[0], j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((br, td), lambda j, i, l: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, td, np8), jnp.bfloat16)])
        return pl.pallas_call(
            _gf4_mm_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, d), jnp.float32),
            cost_estimate=cost,
            compiler_params=_vmem_params(),
            interpret=interpret,
        )(layer.astype(jnp.int32)[None], xp, wdata)

    fn.__name__ = fn.__qualname__ = (f"_qmm_mm__{stage}" if stage
                                     else "_qmm_mm")
    return jax.jit(fn, static_argnames=("interpret",))


def qmm_prefill(x: jax.Array, wdata: jax.Array, layer=None,
                stage: str = "") -> jax.Array:
    """x (R, n) f32 @ W[layer]^T for packed gf4 stacked W (L, d, n/8)
    -> (R, d) f32, R >= 32 (prefill / large-batch shapes)."""
    if wdata.ndim == 2:
        wdata = wdata[None]
        layer = jnp.int32(0)
    return _qmm_mm_jit(stage)(x, wdata, jnp.asarray(layer, jnp.int32),
                              _INTERPRET)


def _gf4_mmt_kernel(lref, hp_ref, w_ref, o_ref, planes_ref, *, g_hp: int):
    """Word-transposed variant for the fused-FFN w2t/w2tp layout
    (L, H/8, D): each word at [c, d] packs the 8 h-planes of column 8c+k,
    so decoded plane k is (H/8, D). The planes stack at sublane offsets
    k*H/8 of ONE (H, TD) scratch — h_perm's k-major order (h[k*(H/8)+c] =
    h_nat[8c+k]) lines up with exactly that stacking, so the whole w2
    contraction is ONE K=H MXU dot instead of 8 K=H/8 plane dots (the
    8-dot form measured 44% MXU at T=2048: per-dot issue overhead and
    shallow K; single-dot + decode-once scratch is the best of both)."""
    wu = pltpu.bitcast(w_ref[0], jnp.uint32)  # (HP, TD)

    @pl.when(pl.program_id(1) == 0)
    def _():
        scale = _gf4_scale(wu)
        for k in range(8):
            codes = ((wu >> (8 + 3 * k)) & 7).astype(jnp.int32)
            planes_ref[k * g_hp:(k + 1) * g_hp, :] = (
                (codes.astype(jnp.float32) - 4.0) * scale
            ).astype(jnp.bfloat16)

    o_ref[:] = jax.lax.dot_general(
        hp_ref[:], planes_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _qmm_mmt_jit(stage: str):
    def fn(h_perm, words, layer, interpret):
        R, n = h_perm.shape          # n == H (k-major permuted order)
        L, Hp, D = words.shape
        # 8 MiB: 12 MiB measured 1.78M over the 100M scoped-VMEM cap at
        # mistral shapes (block + double buffer + the (H, td) plane
        # scratch); 8 MiB keeps ~290-row blocks on 14336-wide hidden
        br = min(512, max(32, (8 << 20) // (2 * n) // 8 * 8), R)
        if br > 128:
            br = br // 128 * 128  # whole MXU M-passes (288 rows = 2.25)
        td = _balance_tile(D, _pick_tile(D, Hp * 4))
        hp = h_perm.astype(jnp.bfloat16)  # k-major flat (R, H), see kernel
        grid = (pl.cdiv(D, td), pl.cdiv(R, br))
        cost = pl.CostEstimate(
            flops=2 * R * D * n,
            bytes_accessed=(Hp * D * 4 + 2 * R * n * pl.cdiv(D, td)
                            + 4 * R * D),
            transcendentals=0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((br, n), lambda j, i, l: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hp, td), lambda j, i, l: (l[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((br, td), lambda j, i, l: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8 * Hp, td), jnp.bfloat16)])
        return pl.pallas_call(
            functools.partial(_gf4_mmt_kernel, g_hp=Hp),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
            cost_estimate=cost,
            compiler_params=_vmem_params(),
            interpret=interpret,
        )(layer.astype(jnp.int32)[None], hp, words)

    fn.__name__ = fn.__qualname__ = (f"_qmm_mmt__{stage}" if stage
                                     else "_qmm_mmt")
    return jax.jit(fn, static_argnames=("interpret",))


def qmm_prefill_t(h_perm: jax.Array, words: jax.Array, layer,
                  stage: str = "ffn") -> jax.Array:
    """h_perm (R, H) k-major @ word-transposed w2t/w2tp (L, H/8, D) ->
    (R, D) in the layout's own column order (w2tp callers un-permute)."""
    return _qmm_mmt_jit(stage)(h_perm, words, jnp.asarray(layer, jnp.int32),
                               _INTERPRET)


def mmt_supported(h_shape, words) -> bool:
    rows = 1
    for s in h_shape[:-1]:
        rows *= s
    return (words.ndim == 3 and rows >= 32
            and h_shape[-1] == words.shape[1] * 8)


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
        # f32 plane: exact in bf16 (<= 6 significand bits) — the MXU
        # truncates for free; the explicit cast costs a VPU op/value
        plane = (codes - 4.0) * scale
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

    if g_h % tc:  # compiled out when the grid tiles H/8 exactly
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
        plane = (codes - 4.0) * scale2  # (tc, D) f32: exact in bf16
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
    # tc = 128 FIXED: measured on v5e (448-layer slope harness), tc=256
    # is 8-11 us/layer SLOWER than 128 despite fitting the scratch budget
    # (bigger tiles lengthen the per-step DMA the pipeline must hide);
    # docs/PERF_NOTES.md round-4 "decode op diet"
    tc = 128
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


# ---------------------------------------------------------------------------
# fused gf4 attention-epilogue + FFN: wo + residual + ffn-norm + FFN in ONE
# kernel, on the plane-permuted residual stream
# ---------------------------------------------------------------------------


def _gf4_w2_dot(h, wu2, tc: int):
    """h (B, 8*tc) plane-major hidden; wu2 (tc, D) u32 word-columns ->
    (B, D) f32: plane k of a w2 word-column dots the contiguous slice
    h[:, k*tc:(k+1)*tc]."""
    scale2 = _gf4_scale(wu2)
    acc = None
    for k in range(8):
        codes = ((wu2 >> (8 + 3 * k)) & 7).astype(jnp.int32).astype(jnp.float32)
        plane = (codes - 4.0) * scale2  # (tc, D) f32: exact in bf16
        d = jax.lax.dot_general(
            h[:, k * tc:(k + 1) * tc].astype(jnp.bfloat16), plane,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _gf4_offn_kernel(lref, a_ref, r_ref, g_ref, wo_ref, w1_ref, w3_ref,
                     w2_ref, o_ref, r1_ref, xn_ref, *, tc: int, g_h: int,
                     act_gelu: bool, eps: float, sub_mean: bool):
    """Attention epilogue + FFN on the plane-permuted residual stream.

    Grid step 0 computes r1 = r + wo @ a (wo plane-major over its OUTPUT
    rows, so r1 lands directly in the permuted carry order), then the
    ffn-norm into the xn scratch — everything the reference megakernel does
    between its attn_mix and w13 stages (src/infer.cu:559-607) without
    leaving VMEM. Every step then runs the fused-FFN tile math against the
    scratch. The permuted carry is what makes this legal: the norm needs
    the WHOLE r1, and r1's plane k is a plain sublane slice — no in-kernel
    (N/8, 8) -> (8, N/8) transpose (which Mosaic cannot lower; see
    docs/PERF_NOTES.md "Trace-attributed").

    Step 0's wo/norm compute also hides the first FFN tile's DMA — the
    separate-call formulation paid a cold-DMA + boundary stall there
    (wo traced at 193 GB/s in-scan vs the fused FFN's 444).
    """
    i = pl.program_id(0)
    B = a_ref.shape[0]
    G = r_ref.shape[2]
    D = 8 * G

    @pl.when(i == 0)
    def _():
        # wo: per-output-plane dots, accumulate the mean as we go
        ms = jnp.zeros((B, 1), jnp.float32)
        for k in range(8):
            y = _gf4_plane_dot(a_ref[:], wo_ref[0, k], G)  # (B, G)
            r1k = r_ref[:, k, :] + y
            r1_ref[:, k, :] = r1k
            if sub_mean:
                ms = ms + jnp.sum(r1k, axis=-1, keepdims=True)
        mu = ms / D
        ss = jnp.zeros((B, 1), jnp.float32)
        for k in range(8):
            d = r1_ref[:, k, :] - mu
            ss = ss + jnp.sum(d * d, axis=-1, keepdims=True)
        rms = jax.lax.rsqrt(ss / D + eps)
        for k in range(8):
            xn_ref[:, k, :] = ((r1_ref[:, k, :] - mu) * rms
                               * g_ref[0, k, :][None, :])

    h1 = _gf4_plane_dot(xn_ref[:], w1_ref[0], 8 * tc)
    h3 = _gf4_plane_dot(xn_ref[:], w3_ref[0], 8 * tc)
    if act_gelu:
        ga = 0.7978845608028654  # sqrt(2/pi); tanh-approx gelu
        a = 0.5 * h1 * (1.0 + jnp.tanh(ga * (h1 + 0.044715 * h1 * h1 * h1)))
    else:
        a = h1 * (1.0 / (1.0 + jnp.exp(-h1)))  # silu
    h = a * h3
    if g_h % tc:  # compiled out when the grid tiles H/8 exactly
        col = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        h = jnp.where(i * tc + col % tc < g_h, h, 0.0)

    acc = _gf4_w2_dot(h, pltpu.bitcast(w2_ref[0], jnp.uint32), tc)

    @pl.when(i == 0)
    def _():
        o_ref[:] = acc

    @pl.when(i > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("act_gelu", "eps", "sub_mean",
                                             "interpret"))
def _gf4_offn(a_pl, r_pl, g_pl, wo_p, w1p, w3p, w2tp, layer, act_gelu: bool,
              eps: float, sub_mean: bool, interpret: bool):
    """a_pl (B, 8, Q/8) plane-permuted attention output; r_pl (B, 8, D/8)
    plane-permuted residual; g_pl (L, 8, D/8) permuted ffn-norm weights;
    wo_p (L, 8, D/8, Q/8) plane-major-output wo; w1p/w3p (L, 8, H/8, D/8);
    w2tp (L, H/8, D) word-transposed w2 with PERMUTED output columns ->
    (ffn (B, D) permuted, r1 (B, 8, D/8)); the caller's new residual is
    r1 + ffn.reshape(B, 8, D/8) (a free row-major reshape)."""
    B = a_pl.shape[0]
    L, _, G, Gq = wo_p.shape
    _, _, g_h, g_d = w1p.shape
    D = 8 * G
    # tc = 128 FIXED (not auto-grown): tc=256 measured 8-11 us/layer slower
    # on v5e — docs/PERF_NOTES.md round-4 "decode op diet"
    tc = 128
    grid = (pl.cdiv(g_h, tc),)
    cost = pl.CostEstimate(
        flops=2 * B * (8 * G * 8 * Gq + 2 * 8 * g_h * 8 * g_d + D * 8 * g_h),
        bytes_accessed=(8 * G * Gq + 2 * 8 * g_h * g_d + D * g_h) * 4,
        transcendentals=8 * g_h * B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[
            pl.BlockSpec((B, 8, Gq), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, G), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G), lambda i, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G, Gq), lambda i, l: (l[0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tc, g_d), lambda i, l: (l[0], 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tc, g_d), lambda i, l: (l[0], 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc, D), lambda i, l: (l[0], i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, D), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, G), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, 8, G), jnp.float32)])
    return pl.pallas_call(
        functools.partial(_gf4_offn_kernel, tc=tc, g_h=g_h,
                          act_gelu=act_gelu, eps=eps, sub_mean=sub_mean),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, G), jnp.float32)],
        cost_estimate=cost,
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(layer.astype(jnp.int32)[None], a_pl.astype(jnp.float32),
      r_pl.astype(jnp.float32), g_pl, wo_p, w1p, w3p, w2tp)


def gf4_offn(a_pl, r_pl, g_pl, wo_p, w1p, w3p, w2tp, layer, act_gelu: bool,
             eps: float, sub_mean: bool):
    """Fused wo + residual + ffn-norm + FFN (see _gf4_offn)."""
    return _gf4_offn(a_pl, r_pl, g_pl, wo_p, w1p, w3p, w2tp,
                     jnp.asarray(layer, jnp.int32), act_gelu, float(eps),
                     sub_mean, _INTERPRET)


def _gf4_offn_qkv_kernel(lref, a_ref, r_ref, g_ref, anx_ref, wo_ref, w1_ref,
                         w3_ref, w2_ref, wqkv_ref, x_ref, qkv_ref,
                         o_acc, r1_ref, xn_ref, *, tc: int, tr: int,
                         g_h: int, t_ffn: int, act_gelu: bool, eps: float,
                         sub_mean: bool):
    """offn (wo + residual + ffn-norm + FFN) PLUS the next layer's
    attn-norm and fused qkv projection, all in one pallas call.

    FLAT-GRID phase switch: the grid is (t_ffn + t_qkv,) — steps
    0..t_ffn-1 run the fused-FFN tile math (step 0 doubling as the wo +
    residual + ffn-norm prologue, exactly _gf4_offn_kernel), step
    t_ffn-1 additionally closes the residual (x_new = r1 + ffn), norms
    it with the NEXT layer's attn-norm weights into the xn scratch, and
    steps t_ffn.. project qkv row tiles from xn against streamed
    (tr, D/8) tiles of wqkv[l+1]. Rotating the fusion boundary moves
    the wqkv matvec from its own in-scan call (traced 310 GB/s: VPU
    decode + a ~13-16 us call boundary at 12.6 MB) into this call's
    tail, where its tiles stream through the SAME double-buffered
    pipeline as the FFN tiles (the earlier formulation — wqkv as one
    (1, R, G) block landing at the last step — measured +218 us/layer:
    a 12.6 MB single-block DMA defeats the input pipeline; tile it
    like everything else). The scan carry becomes (x, qkv): layer l's
    body consumes the qkv its predecessor projected — the TPU analogue
    of the reference megakernel keeping all stages of a token in one
    launch (src/infer.cu:404-626).

    During FFN steps the wqkv index map clamps to tile 0, so its first
    tile's DMA is issued at call start and drains under the wo
    prologue compute; during qkv steps the FFN weight maps clamp to
    their last tile, so no re-DMA occurs (same trick as the MoE
    sweep's dead-slot maps, _gf4_moe_ffn).
    """
    i = pl.program_id(0)
    B = a_ref.shape[0]
    G = r_ref.shape[2]
    D = 8 * G

    @pl.when(i == 0)
    def _():
        ms = jnp.zeros((B, 1), jnp.float32)
        for k in range(8):
            y = _gf4_plane_dot(a_ref[:], wo_ref[0, k], G)  # (B, G)
            r1k = r_ref[:, k, :] + y
            r1_ref[:, k, :] = r1k
            if sub_mean:
                ms = ms + jnp.sum(r1k, axis=-1, keepdims=True)
        mu = ms / D
        ss = jnp.zeros((B, 1), jnp.float32)
        for k in range(8):
            d = r1_ref[:, k, :] - mu
            ss = ss + jnp.sum(d * d, axis=-1, keepdims=True)
        rms = jax.lax.rsqrt(ss / D + eps)
        for k in range(8):
            xn_ref[:, k, :] = ((r1_ref[:, k, :] - mu) * rms
                               * g_ref[0, k, :][None, :])

    @pl.when(i < t_ffn)
    def _():
        h1 = _gf4_plane_dot(xn_ref[:], w1_ref[0], 8 * tc)
        h3 = _gf4_plane_dot(xn_ref[:], w3_ref[0], 8 * tc)
        if act_gelu:
            ga = 0.7978845608028654  # sqrt(2/pi); tanh-approx gelu
            a = 0.5 * h1 * (1.0 + jnp.tanh(ga * (h1 + 0.044715 * h1 ** 3)))
        else:
            a = h1 * (1.0 / (1.0 + jnp.exp(-h1)))  # silu
        h = a * h3
        if g_h % tc:  # compiled out when the grid tiles H/8 exactly
            col = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
            h = jnp.where(i * tc + col % tc < g_h, h, 0.0)
        acc = _gf4_w2_dot(h, pltpu.bitcast(w2_ref[0], jnp.uint32), tc)

        @pl.when(i == 0)
        def _():
            o_acc[:] = acc

        @pl.when(i > 0)
        def _():
            o_acc[:] = o_acc[:] + acc

        @pl.when(i == t_ffn - 1)
        def _():
            # r_new = r1 + ffn; the w2tp output columns are permuted so
            # the flat ffn accumulator is already in planar order. xn is
            # dead after this step's h1/h3 dots — reuse it for the next
            # layer's normed input.
            ms = jnp.zeros((B, 1), jnp.float32)
            for k in range(8):
                xk = r1_ref[:, k, :] + o_acc[:, k * G:(k + 1) * G]
                x_ref[:, k, :] = xk
                if sub_mean:
                    ms = ms + jnp.sum(xk, axis=-1, keepdims=True)
            mu = ms / D
            ss = jnp.zeros((B, 1), jnp.float32)
            for k in range(8):
                d = x_ref[:, k, :] - mu
                ss = ss + jnp.sum(d * d, axis=-1, keepdims=True)
            rms = jax.lax.rsqrt(ss / D + eps)
            for k in range(8):
                xn_ref[:, k, :] = ((x_ref[:, k, :] - mu) * rms
                                   * anx_ref[0, k, :][None, :])

    @pl.when(i >= t_ffn)
    def _():
        # qkv tile: rows [j*tr, (j+1)*tr) of wqkv[l+1] against the normed
        # next-layer input left in xn by step t_ffn-1
        wu = pltpu.bitcast(wqkv_ref[0], jnp.uint32)  # (tr, G)
        qkv_ref[:] = _gf4_plane_dot(xn_ref[:], wu, tr)


@functools.partial(jax.jit, static_argnames=("act_gelu", "eps", "sub_mean",
                                             "interpret"))
def _gf4_offn_qkv(a_pl, r_pl, g_pl, anx_pl, wo_p, w1p, w3p, w2tp, wqkv,
                  layer, act_gelu: bool, eps: float, sub_mean: bool,
                  interpret: bool):
    """Rotated-boundary epilogue: (x_new (B, 8, D/8) planar residual,
    qkv_next (B, R) f32 = attn_norm(x_new) @ wqkv[layer+1]^T). See
    _gf4_offn_qkv_kernel. wqkv (L, R, D/8) i32 packed row-concat."""
    B = a_pl.shape[0]
    L, _, G, Gq = wo_p.shape
    _, _, g_h, g_d = w1p.shape
    R = wqkv.shape[1]
    D = 8 * G
    # tc = 128 FIXED: see _gf4_offn (tc=256 measured slower on v5e)
    tc = 128
    t_ffn = pl.cdiv(g_h, tc)
    # qkv row tile: big enough that per-step overhead (~1.5 us) amortizes,
    # small enough to stream (tr=2048 words x G lanes = 4 MiB at G=512)
    tr = min(2048, R)
    t_qkv = pl.cdiv(R, tr)
    grid = (t_ffn + t_qkv,)
    cost = pl.CostEstimate(
        flops=2 * B * (8 * G * 8 * Gq + 2 * 8 * g_h * 8 * g_d + D * 8 * g_h
                       + R * D),
        bytes_accessed=(8 * G * Gq + 2 * 8 * g_h * g_d + D * g_h
                        + R * G) * 4,
        transcendentals=8 * g_h * B)

    def ffn_i(i):
        return jnp.minimum(i, t_ffn - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[
            pl.BlockSpec((B, 8, Gq), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, G), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G), lambda i, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G),
                         lambda i, l: (jnp.minimum(l[0] + 1, L - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G, Gq), lambda i, l: (l[0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tc, g_d), lambda i, l: (l[0], 0, ffn_i(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tc, g_d), lambda i, l: (l[0], 0, ffn_i(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc, D), lambda i, l: (l[0], ffn_i(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, G),
                         lambda i, l: (jnp.minimum(l[0] + 1, L - 1),
                                       jnp.maximum(i - t_ffn, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 8, G), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tr), lambda i, l: (0, jnp.maximum(i - t_ffn, 0)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((B, 8, G), jnp.float32),
            pltpu.VMEM((B, 8, G), jnp.float32),
        ])
    return pl.pallas_call(
        functools.partial(_gf4_offn_qkv_kernel, tc=tc, tr=tr, g_h=g_h,
                          t_ffn=t_ffn, act_gelu=act_gelu, eps=eps,
                          sub_mean=sub_mean),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 8, G), jnp.float32),
                   jax.ShapeDtypeStruct((B, R), jnp.float32)],
        cost_estimate=cost,
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(layer.astype(jnp.int32)[None], a_pl.astype(jnp.float32),
      r_pl.astype(jnp.float32), g_pl, anx_pl, wo_p, w1p, w3p, w2tp, wqkv)


def gf4_offn_qkv(a_pl, r_pl, g_pl, anx_pl, wo_p, w1p, w3p, w2tp, wqkv,
                 layer, act_gelu: bool, eps: float, sub_mean: bool):
    """Fused wo + residual + ffn-norm + FFN + next-layer attn-norm + qkv
    (see _gf4_offn_qkv)."""
    return _gf4_offn_qkv(a_pl, r_pl, g_pl, anx_pl, wo_p, w1p, w3p, w2tp,
                         wqkv, jnp.asarray(layer, jnp.int32), act_gelu,
                         float(eps), sub_mean, _INTERPRET)


# ---------------------------------------------------------------------------
# byte-format (fp8 e5m2 / fp16) streaming supercall: wo + residual + ffn-norm
# + FFN + next-layer attn-norm + q/k/v in ONE pallas call on NATURAL layouts
# ---------------------------------------------------------------------------


def _qx_offn_qkv_kernel(lref, a_ref, r_ref, g_ref, anx_ref, wo_ref, w1_ref,
                        w3_ref, w2_ref, wq_ref, wk_ref, wv_ref,
                        x_ref, q_ref, k_ref, v_ref,
                        r1_ref, xn_ref, h_ref, qs_ref, ks_ref, vs_ref, *,
                        fmt: str, tw: int, th: int, td: int, tq: int,
                        tk: int, offs, D: int, H: int, Qd: int, KVd: int,
                        act_gelu: bool, eps: float, sub_mean: bool):
    """One whole fp8/fp16 layer-epilogue per call, phases on a flat grid:

      [W: wo row tiles]  r1 = r + a @ wo^T; last step norms r1 -> xn
      [F1: w1/w3 tiles]  h = act(xn @ w1^T) * (xn @ w3^T) into the h scratch
      [F2: w2 row tiles] x = r1 + h @ w2^T; last step norms x with the NEXT
                         layer's attn-norm -> xn (reused)
      [Q/K/V row tiles]  q/k/v = xn @ w^T for wq/wk/wv[l+1]

    Rationale: the XLA per-op path sustains ~675 GB/s on fp8 7B decode —
    ~92% of the 733 GB/s DMA ceiling — with the missing ~8% sitting in
    dependent-op boundaries (~0.9 ms/tok, docs/PERF_NOTES.md). One call
    streams all ~215 MB of a layer's weights through a single
    double-buffered pipeline: the e5m2->bf16 convert is 1 VPU op/value
    (~2 us per 8 MB tile vs ~11 us of DMA), so steady state is pure DMA.
    This is what the reference megakernel does for a whole token
    (src/infer.cu:404-626); here the unit is a layer and the boundary
    rotation (qkv of layer l+1) removes the remaining per-layer matvec
    call. Unlike the gf4 supercall there is NO weight relayout at all —
    every phase tiles the natural row-major stacks, so the prefill/XLA
    paths are untouched.

    Partial tiles: scratches are padded to whole tiles and every consumer
    slices [:, :N] statically — no in-kernel masks. Outputs are written
    once, at their phase's final step, from the scratches.
    """
    i = pl.program_id(0)
    o_f1, o_f2, o_q, o_k, o_v, n_all = offs
    B = a_ref.shape[0]

    def deq(ref):
        return _dequant_tile(ref[0], fmt)

    def norm_into(dst, val, gvec):
        if sub_mean:
            mu = jnp.mean(val, axis=-1, keepdims=True)
            val = val - mu
        ss = jnp.mean(val * val, axis=-1, keepdims=True)
        dst[:, :val.shape[1]] = val * jax.lax.rsqrt(ss + eps) * gvec

    @pl.when(i < o_f1)
    def _():
        y = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16), deq(wo_ref),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        r1_ref[:, pl.ds(i * tw, tw)] = r_ref[:, pl.ds(i * tw, tw)] + y

        @pl.when(i == o_f1 - 1)
        def _():
            norm_into(xn_ref, r1_ref[:, :D], g_ref[0])  # (1, D)

    @pl.when((i >= o_f1) & (i < o_f2))
    def _():
        j = i - o_f1
        xnb = xn_ref[:, :D].astype(jnp.bfloat16)
        h1 = jax.lax.dot_general(
            xnb, deq(w1_ref), dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        h3 = jax.lax.dot_general(
            xnb, deq(w3_ref), dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if act_gelu:
            ga = 0.7978845608028654  # sqrt(2/pi); tanh-approx gelu
            av = 0.5 * h1 * (1.0 + jnp.tanh(ga * (h1 + 0.044715 * h1 ** 3)))
        else:
            av = h1 * (1.0 / (1.0 + jnp.exp(-h1)))  # silu
        h_ref[:, pl.ds(j * th, th)] = av * h3

    @pl.when((i >= o_f2) & (i < o_q))
    def _():
        j = i - o_f2
        o = jax.lax.dot_general(
            h_ref[:, :H].astype(jnp.bfloat16), deq(w2_ref),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qs_ref[:, pl.ds(j * td, td)] = r1_ref[:, pl.ds(j * td, td)] + o

        @pl.when(i == o_q - 1)
        def _():
            x_ref[:] = qs_ref[:, :D]
            norm_into(xn_ref, qs_ref[:, :D], anx_ref[0])

    @pl.when(i >= o_q)
    def _():
        xnb = xn_ref[:, :D].astype(jnp.bfloat16)

        @pl.when(i < o_k)
        def _():
            y = jax.lax.dot_general(
                xnb, deq(wq_ref), dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            qs_ref[:, pl.ds((i - o_q) * tq, tq)] = y

        @pl.when((i >= o_k) & (i < o_v))
        def _():
            y = jax.lax.dot_general(
                xnb, deq(wk_ref), dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ks_ref[:, pl.ds((i - o_k) * tk, tk)] = y

        @pl.when(i >= o_v)
        def _():
            y = jax.lax.dot_general(
                xnb, deq(wv_ref), dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            vs_ref[:, pl.ds((i - o_v) * tk, tk)] = y

        @pl.when(i == n_all - 1)
        def _():
            q_ref[:] = qs_ref[:, :Qd]
            k_ref[:] = ks_ref[:, :KVd]
            v_ref[:] = vs_ref[:, :KVd]


def _pick_rows(total: int, width_bytes: int, target: int = 2 << 20) -> int:
    """Row-tile size: ~``target`` bytes per weight tile, 128-aligned.
    2 MiB measured fastest on v5e for the byte-format supercall (sweep:
    1 MiB 725, 1.5 MiB 723, 2 MiB 729, 3 MiB 698, 4 MiB 699, 5 MiB 687,
    8 MiB 672 GB/s on the mistral7b-geometry chain) — small enough that
    the per-step DMA hides, big enough to amortize step overhead."""
    t = max(128, min(total, target // max(width_bytes, 1)))
    return max(128, t // 128 * 128)


@functools.partial(jax.jit, static_argnames=("fmt", "act_gelu", "eps",
                                             "sub_mean", "interpret"))
def _qx_offn_qkv(a, r, g, anx, wo, w1, w3, w2, wq, wk, wv, layer, fmt: str,
                 act_gelu: bool, eps: float, sub_mean: bool,
                 interpret: bool):
    """a (B, Qd) f32 attention output; r (B, D) f32 residual; g/anx (L, D)
    f32 norm weights; wo (L, D, Qd), w1/w3 (L, H, D), w2 (L, D, H),
    wq (L, Qd, D), wk/wv (L, KVd, D) natural stacked weights in storage
    dtype -> (x_new (B, D), q (B, Qd), k (B, KVd), v (B, KVd)), with
    q/k/v projected from layer+1 (clamped at the top)."""
    B, Qd = a.shape
    L, D, _ = wo.shape
    H = w1.shape[1]
    KVd = wk.shape[1]
    esz = 2 if fmt == "fp16" else 1

    if fmt == "fp16":  # Mosaic has no f16: kernels decode raw bits
        wo, w1, w3, w2, wq, wk, wv = [
            jax.lax.bitcast_convert_type(x, jnp.uint16)
            for x in (wo, w1, w3, w2, wq, wk, wv)]

    tw = _pick_rows(D, Qd * esz)
    th = _pick_rows(H, D * esz)
    td = _pick_rows(D, H * esz)
    tq = _pick_rows(Qd, D * esz)
    tk = _pick_rows(KVd, D * esz)
    t_wo, t_f1, t_f2 = pl.cdiv(D, tw), pl.cdiv(H, th), pl.cdiv(D, td)
    t_q, t_k = pl.cdiv(Qd, tq), pl.cdiv(KVd, tk)
    o_f1 = t_wo
    o_f2 = o_f1 + t_f1
    o_q = o_f2 + t_f2
    o_k = o_q + t_q
    o_v = o_k + t_k
    n_all = o_v + t_k
    grid = (n_all,)

    wbytes = (D * Qd + 3 * H * D + (Qd + 2 * KVd) * D) * esz
    cost = pl.CostEstimate(
        flops=2 * B * wbytes // esz,
        bytes_accessed=wbytes + 4 * B * (2 * D + Qd),
        transcendentals=H * B)

    def clamp(lo, n_t):
        return lambda i: jnp.clip(i - lo, 0, n_t - 1)

    i_wo, i_f1 = clamp(0, t_wo), clamp(o_f1, t_f1)
    i_f2, i_q = clamp(o_f2, t_f2), clamp(o_q, t_q)
    i_k, i_v = clamp(o_k, t_k), clamp(o_v, t_k)

    # r rides padded to the widest row-tiling so in-kernel ds slices stay
    # in bounds (consumers slice [:, :D] statically)
    Dpad = max(t_wo * tw, t_f2 * td)
    if Dpad > D:
        r = jnp.pad(r, ((0, 0), (0, Dpad - D)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[
            pl.BlockSpec((B, Qd), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Dpad), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D),
                         lambda i, l: (jnp.minimum(l[0] + 1, L - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw, Qd), lambda i, l: (l[0], i_wo(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, D), lambda i, l: (l[0], i_f1(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, D), lambda i, l: (l[0], i_f1(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, td, H), lambda i, l: (l[0], i_f2(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, D),
                         lambda i, l: (jnp.minimum(l[0] + 1, L - 1),
                                       i_q(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, D),
                         lambda i, l: (jnp.minimum(l[0] + 1, L - 1),
                                       i_k(i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, D),
                         lambda i, l: (jnp.minimum(l[0] + 1, L - 1),
                                       i_v(i), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, D), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Qd), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KVd), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KVd), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, Dpad), jnp.float32),            # r1
            pltpu.VMEM((B, D), jnp.float32),               # xn
            pltpu.VMEM((B, t_f1 * th), jnp.float32),       # h
            pltpu.VMEM((B, max(t_f2 * td, t_q * tq)), jnp.float32),  # qs
            pltpu.VMEM((B, t_k * tk), jnp.float32),        # ks
            pltpu.VMEM((B, t_k * tk), jnp.float32),        # vs
        ])
    return pl.pallas_call(
        functools.partial(_qx_offn_qkv_kernel, fmt=fmt, tw=tw, th=th, td=td,
                          tq=tq, tk=tk,
                          offs=(o_f1, o_f2, o_q, o_k, o_v, n_all),
                          D=D, H=H, Qd=Qd, KVd=KVd, act_gelu=act_gelu,
                          eps=eps, sub_mean=sub_mean),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, Qd), jnp.float32),
                   jax.ShapeDtypeStruct((B, KVd), jnp.float32),
                   jax.ShapeDtypeStruct((B, KVd), jnp.float32)],
        cost_estimate=cost,
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(layer.astype(jnp.int32)[None], a.astype(jnp.float32),
      r.astype(jnp.float32), g[:, None], anx[:, None], wo, w1, w3, w2,
      wq, wk, wv)


def qx_offn_qkv(a, r, g, anx, wo, w1, w3, w2, wq, wk, wv, layer, fmt: str,
                act_gelu: bool, eps: float, sub_mean: bool):
    """Byte-format streaming supercall (see _qx_offn_qkv)."""
    return _qx_offn_qkv(a, r, g, anx, wo, w1, w3, w2, wq, wk, wv,
                        jnp.asarray(layer, jnp.int32), fmt, act_gelu,
                        float(eps), sub_mean, _INTERPRET)


def qx_offn_supported(cfg_dtype: str, B: int, shapes) -> bool:
    """Eligibility: fp8/fp16, decode-sized batch, 128-aligned dims.
    ``shapes`` = (D, H, Qd, KVd)."""
    if cfg_dtype not in ("fp8", "fp16") or B > 16:
        return False
    return all(s % 128 == 0 for s in shapes)


def gf4_offn_supported(a_shape, r_shape, wo_p, w1p, w2tp) -> bool:
    """Stream-fusion eligibility: all stream layouts present, decode-sized
    batch, matching plane geometry."""
    if wo_p is None or w1p is None or w2tp is None:
        return False
    if wo_p.ndim != 4 or w1p.ndim != 4 or w2tp.ndim != 3:
        return False
    if a_shape[0] > 16 or len(a_shape) != 3 or len(r_shape) != 3:
        return False
    L, eight, G, Gq = wo_p.shape
    return (eight == 8 and a_shape[1:] == (8, Gq) and r_shape[1:] == (8, G)
            and w1p.shape[3] == G and w2tp.shape[1] == w1p.shape[2]
            and w2tp.shape[2] == 8 * G)


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
        plane = (codes - 4.0) * scale  # (TD, N/8) f32: exact in bf16
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


def _gf4_moe_ffn_kernel(sref, xp_ref, w1_ref, w3_ref, w2_ref, o_ref, h_ref,
                        *, tc1: int, tc2: int, t1: int, g_h: int,
                        act_gelu: bool):
    """Whole-FFN expert sweep: grid (A, t1 + t2) with the expert slot
    OUTERMOST. Steps 0..t1-1 stream the expert's plane-major w1/w3 tiles and
    fill the h scratch (plane-grouped, so no in-kernel transpose — Mosaic
    cannot lower one); steps t1.. stream NATURAL-layout w2 row tiles and dot
    them against the completed h via the plane decomposition (w2's packed
    minor axis is hidden/8, so its plane k dots h plane k directly — the
    natural layout needs no transposed copy here, unlike the dense kernel
    whose grid tiles w2 over hidden). One pallas call replaces the 3
    dependent qmm_moe_dense calls per layer (each boundary stalls 15-26 us
    + a cold-tile DMA, docs/PERF_NOTES.md); the reference gathers active
    experts inside one kernel the same way (src/infer.cu:597-620).
    """
    i = pl.program_id(1)

    @pl.when(i < t1)
    def _():
        h1 = _gf4_plane_dot(xp_ref[:], w1_ref[0, 0], 8 * tc1)
        h3 = _gf4_plane_dot(xp_ref[:], w3_ref[0, 0], 8 * tc1)
        if act_gelu:
            ga = 0.7978845608028654  # sqrt(2/pi); tanh-approx gelu
            av = 0.5 * h1 * (1.0 + jnp.tanh(ga * (h1 + 0.044715 * h1 * h1 * h1)))
        else:
            av = h1 * (1.0 / (1.0 + jnp.exp(-h1)))  # silu
        h = av * h3                                  # (B, 8*tc1) plane-major
        col = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        h = jnp.where(i * tc1 + col % tc1 < g_h, h, 0.0)  # zero tail rows
        B = h.shape[0]
        h_ref[:, :, pl.ds(i * tc1, tc1)] = h.reshape(B, 8, tc1)

    @pl.when(i >= t1)
    def _():
        hp = h_ref[:, :, :]
        if hp.shape[2] != g_h:
            hp = hp[:, :, :g_h]
        wu2 = pltpu.bitcast(w2_ref[0, 0], jnp.uint32)   # (tc2, g_h)
        o_ref[0] = _gf4_plane_dot(hp, wu2, tc2)


@functools.partial(jax.jit, static_argnames=("act_gelu", "interpret"))
def _gf4_moe_ffn(x, w1pe, w3pe, w2, layer, eidx, cnt, act_gelu: bool,
                 interpret: bool):
    """x (B, D) f32; w1pe/w3pe (L, E, 8, H/8, D/8) i32 plane-major per
    expert; w2 (L, E, D, H/8) i32 NATURAL layout; eidx (A,) sorted unique
    expert ids padded by repeating the last unique; cnt — live slot count
    (dead slots' index maps pin every block to the previous slot's last
    tile, so padding costs ZERO extra HBM traffic) -> (A, B, D) f32."""
    B, D = x.shape
    L, E, _, g_h, g_d = w1pe.shape
    A = eidx.shape[0]
    from calm_tpu.chip import tuning
    budget = tuning().moe_scratch_bytes
    tc1 = 128
    while (2 * 8 * tc1 * g_d * 4) * 2 * 3 < budget * 2 and tc1 * 2 <= g_h:
        tc1 *= 2
    tc2 = 128
    while (tc2 * g_h * 4) * 2 * 3 < budget and tc2 * 2 <= D:
        tc2 *= 2
    t1, t2 = pl.cdiv(g_h, tc1), pl.cdiv(D, tc2)
    grid = (A, t1 + t2)
    xp = x.astype(jnp.float32).reshape(B, g_d, 8).transpose(0, 2, 1)
    sref = jnp.concatenate([layer.astype(jnp.int32)[None],
                            cnt.astype(jnp.int32)[None],
                            eidx.astype(jnp.int32)])
    cost = pl.CostEstimate(
        flops=2 * A * B * (2 * 8 * g_h * 8 * g_d + D * 8 * g_h),
        bytes_accessed=A * (2 * 8 * g_h * g_d + D * g_h) * 4,
        transcendentals=A * 8 * g_h * B)

    def w13_map(a, i, sref):
        dead = a >= sref[1]
        step = jnp.where(dead, t1 - 1, jnp.minimum(i, t1 - 1))
        return (sref[0], sref[a + 2], 0, step, 0)

    def w2_map(a, i, sref):
        dead = a >= sref[1]
        step = jnp.where(dead, t2 - 1, jnp.clip(i - t1, 0, t2 - 1))
        return (sref[0], sref[a + 2], step, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[
            pl.BlockSpec((B, 8, g_d), lambda a, i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, tc1, g_d), w13_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, tc1, g_d), w13_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tc2, g_h), w2_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, B, tc2),
            lambda a, i, s: (a, 0, jnp.clip(i - t1, 0, t2 - 1)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, 8, t1 * tc1), jnp.float32)])
    return pl.pallas_call(
        functools.partial(_gf4_moe_ffn_kernel, tc1=tc1, tc2=tc2, t1=t1,
                          g_h=g_h, act_gelu=act_gelu),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, B, D), jnp.float32),
        cost_estimate=cost,
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(sref, xp, w1pe, w3pe, w2)


def gf4_moe_ffn(x: jax.Array, w1pe, w3pe, w2, eidx, cnt, layer,
                act_gelu: bool) -> jax.Array:
    """Fused MoE FFN expert sweep (see _gf4_moe_ffn): (A, B, D); dead slots
    (a >= cnt) return stale values — mask them in the combine."""
    return _gf4_moe_ffn(x, w1pe, w3pe, w2, jnp.asarray(layer, jnp.int32),
                        eidx, jnp.asarray(cnt, jnp.int32), act_gelu,
                        _INTERPRET)


def gf4_moe_ffn_supported(x_shape, w1pe, w2data) -> bool:
    """Fused MoE FFN eligibility: plane-major per-expert layouts present,
    decode-sized batch, matching geometry."""
    if w1pe is None or w2data is None:
        return False
    if w1pe.ndim != 5 or w2data.ndim != 4:
        return False
    rows = 1
    for s in x_shape[:-1]:
        rows *= s
    if rows > 16:
        return False
    L, E, eight, g_h, g_d = w1pe.shape
    return (eight == 8 and x_shape[-1] == g_d * 8
            and w2data.shape[:2] == (L, E) and w2data.shape[2] == g_d * 8
            and w2data.shape[3] == g_h)


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
