"""Quantized weight tensors and dequantizing matmuls.

``QTensor`` is the device-side representation of a container weight:

- fp16: jnp.float16 payload, logical shape == payload shape
- fp8:  jnp.float8_e5m2 payload, logical shape == payload shape
- gf4:  jnp.int32 payload packing 8 values/word on the last axis
        (format spec: calm_tpu/quant.py; reference decoder src/helpers.cuh:100-113)

This module holds the *reference* jnp compute paths: XLA fuses the dequant
into the consuming dot on TPU, so even this path streams packed bytes from
HBM and expands in registers/VMEM. The hand-tuned Pallas decode kernels in
calm_tpu/ops/pallas_qmm.py override these on the hot path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

GF4_SHIFTS = tuple(8 + 3 * k for k in range(8))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A quantized 2-D (or stacked N-D) weight with static format tag.

    ``scale`` is the fp8e4 per-tensor dequant scale: a trailing (1,) vector,
    stacked along the same leading (layer/expert) axes as ``data`` — so
    plain indexing and layer-index selection apply to both uniformly. The
    scale is a power of two (quant.fp8e4_quantize), making q * scale exact.
    """

    data: jax.Array
    fmt: str  # "fp16" | "fp8" | "fp8e4" | "gf4"
    scale: jax.Array | None = None

    @property
    def shape(self):
        """Logical (unpacked) shape."""
        s = tuple(self.data.shape)
        if self.fmt == "gf4":
            return s[:-1] + (s[-1] * 8,)
        return s

    def __getitem__(self, idx) -> "QTensor":
        return QTensor(self.data[idx], self.fmt,
                       None if self.scale is None else self.scale[idx])

    def astype_packed(self):
        return self.data

    def tree_flatten(self):
        return (self.data, self.scale), (self.fmt,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], children[1])

    @classmethod
    def from_numpy(cls, arr: np.ndarray, fmt: str,
                   scale: np.ndarray | None = None) -> "QTensor":
        if fmt == "fp16":
            assert arr.dtype == np.float16
        elif fmt == "fp8":
            arr = arr.view(jnp.float8_e5m2.dtype)
        elif fmt == "fp8e4":
            arr = arr.view(jnp.float8_e4m3fn.dtype)
            assert scale is not None
        elif fmt == "gf4":
            assert arr.dtype == np.int32
        else:
            raise ValueError(f"unknown format {fmt!r}")
        return cls(jnp.asarray(arr), fmt,
                   None if scale is None else jnp.asarray(scale, jnp.float32))


def gf4_decode_words(words: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """Decode gf4 i32 words (..., g) -> (..., g*8) floats.

    value_k = (((w >> (8+3k)) & 7) - 4) * (fp8_e5m2(w & 0xff) / -4)
    """
    w = jax.lax.bitcast_convert_type(words, jnp.uint32)
    scale_bits = (w & jnp.uint32(0xFF)).astype(jnp.uint8)
    scale = jax.lax.bitcast_convert_type(scale_bits, jnp.float8_e5m2)
    scale = scale.astype(out_dtype) * (-0.25)
    parts = [(((w >> jnp.uint32(s)) & jnp.uint32(7)).astype(jnp.int8)) for s in GF4_SHIFTS]
    codes = jnp.stack(parts, axis=-1).astype(out_dtype) - 4.0
    vals = codes * scale[..., None]
    return vals.reshape(*w.shape[:-1], w.shape[-1] * 8)


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    if qt.fmt == "gf4":
        return gf4_decode_words(qt.data, dtype)
    w = qt.data.astype(dtype)
    if qt.scale is not None:
        # scale is (stack dims..., 1): append axes to broadcast over (d, n)
        s = qt.scale.reshape(qt.scale.shape[:-1]
                             + (1,) * (w.ndim - qt.scale.ndim + 1))
        w = w * s.astype(dtype)
    return w


_USE_PALLAS = False
_PRECISE = False


def enable_pallas(on: bool = True):
    """Route decode-shaped matmuls through the fused Pallas kernels
    (calm_tpu/ops/pallas_qmm.py). Engine/bench turn this on when running on
    TPU; the jnp path below stays as the reference and the prefill path."""
    global _USE_PALLAS
    _USE_PALLAS = on


def enable_precise(on: bool = True):
    """Quality mode: run the fast-path dots at Precision.HIGHEST (XLA's
    multi-pass bf16 algorithm — f32-grade accumulation on the MXU) instead
    of single-pass bf16 operands. Matters for fp16 containers, whose 10
    mantissa bits are truncated to bf16's 7 on the default path; decode
    stays HBM-bound so the extra MXU passes are largely hidden.
    (CALM_PRECISE=1 in the CLI.)"""
    global _PRECISE
    _PRECISE = on


def qmatmul(x: jax.Array, qt: QTensor, out_dtype=jnp.float32,
            layer=None, stage: str = "") -> jax.Array:
    """x (..., n) @ W^T for W (d, n) logical -> (..., d).

    When ``layer`` is given, qt.data is the LAYER-STACKED (L, d, n_packed)
    weight and the dot runs against plane ``layer`` — the layer scan passes
    the full stack plus a traced index instead of a scan-sliced weight, so
    XLA fuses the slice into its dot and the Pallas kernels index the stack
    through scalar prefetch (a scan-xs slice handed to a custom call is
    materialized: one full weight copy per layer per token).

    Row-major (d, n) weight layout follows the container contract
    (reference: src/model.h:41-48); the contraction is over the last axis of
    both operands.

    Fast (TPU) path, chosen by measurement on v5e:
    - fp16/fp8: XLA's own convert->bf16 matmul with f32 accumulation. XLA
      fuses the widening into the dot's HBM stream (measured at the DMA
      ceiling, ~640-715 GB/s on v5e for B=1 matvecs — faster than a
      hand-written Pallas dequant kernel, whose per-call pipeline cannot
      hide the VPU convert).
    - gf4: Pallas plane-dot kernel (XLA materializes the 8x int unpack at
      ~66 GB/s; the kernel streams packed words at ~360 GB/s).
    The precise path (f32 dequant + f32 dot) remains the default off-TPU and
    is the numerical reference for tests.
    """
    if (_USE_PALLAS and not _PRECISE and out_dtype == jnp.float32
            and qt.fmt == "gf4"
            and (layer is not None) == (qt.data.ndim == 3)):
        from calm_tpu.ops import pallas_qmm
        lead = x.shape[:-1]
        rows = 1
        for s in lead:
            rows *= s
        if pallas_qmm.supported(x.shape, qt.data, qt.fmt):
            out = pallas_qmm.qmm_decode(
                x.reshape(rows, x.shape[-1]).astype(jnp.float32),
                qt.data, qt.fmt, layer, stage=stage)
            return out.reshape(*lead, out.shape[-1])
        if pallas_qmm.mm_supported(x.shape, qt.data, qt.fmt):
            # prefill-sized rows: row-blocked plane-dot matmul (decode-once
            # VMEM plane scratch; the XLA path materializes the 8x unpack)
            out = pallas_qmm.qmm_prefill(
                x.reshape(rows, x.shape[-1]).astype(jnp.float32),
                qt.data, layer, stage=stage)
            return out.reshape(*lead, out.shape[-1])

    data = qt.data
    scale = qt.scale
    if layer is not None:
        data = jax.lax.dynamic_index_in_dim(data, layer, 0, keepdims=False)
        if scale is not None:
            scale = jax.lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
    # the per-tensor scale multiplies the (small) dot OUTPUT, not the weight
    # stream: same result (scalar), no widened weight copy to keep fused
    qt = QTensor(data, qt.fmt)

    if _USE_PALLAS and out_dtype == jnp.float32:
        if _PRECISE:
            w = dequant(qt, jnp.float32)
            out = jax.lax.dot_general(
                x.astype(jnp.float32), w,
                dimension_numbers=(((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            w = dequant(qt, jnp.bfloat16)
            out = jax.lax.dot_general(
                x.astype(jnp.bfloat16), w,
                dimension_numbers=(((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return out if scale is None else out * scale
    w = dequant(qt, out_dtype)
    out = jax.lax.dot_general(
        x.astype(out_dtype), w,
        dimension_numbers=(((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=out_dtype,
    )
    return out if scale is None else out * scale.astype(out_dtype)


# ---------------------------------------------------------------------------
# fused-layout (plane-major) consumption: the XLA paths for weights stored
# ONLY in the gf4 decode layouts (model.fuse_gf4_weights drops the natural
# originals — same bytes, no HBM duplicate). Prefill, CPU, and any
# shape the Pallas kernels decline route through these.
# ---------------------------------------------------------------------------


def _unpermute_last(x: jax.Array) -> jax.Array:
    """Undo the plane permutation of the last axis: perm[k*(N/8)+c] =
    nat[8c+k] -> natural order."""
    lead, n = x.shape[:-1], x.shape[-1]
    return (x.reshape(*lead, 8, n // 8).swapaxes(-1, -2)
            .reshape(*lead, n))


def qmatmul_w1p(x: jax.Array, words: jax.Array, layer,
                stage: str = "ffn") -> jax.Array:
    """x (..., D) @ plane-major w1p/w3p words (L, 8, H/8, D/8) -> h
    (..., H) in PERMUTED k-major order (h[k*(H/8)+c] = h_nat[8c+k]).
    The flattened plane-major stack is a valid row-major gf4 matrix whose
    rows are the natural rows shuffled — qmatmul (and through it the
    Pallas matvec, when shapes allow) applies unchanged; elementwise FFN
    glue is order-agnostic and qmatmul_w2t contracts the permuted order
    directly."""
    L, _, Hp, gd = words.shape
    return qmatmul(x, QTensor(words.reshape(L, 8 * Hp, gd), "gf4"),
                   layer=layer, stage=stage)


def qmatmul_w2t(h_perm: jax.Array, words: jax.Array, layer,
                permuted_out: bool, stage: str = "ffn") -> jax.Array:
    """h_perm (..., H) k-major @ word-transposed w2t/w2tp (L, H/8, D)
    -> (..., D) natural.

    Each int32 word at [c, d] packs the 8 h-planes of column 8c+k for
    output d, so the contraction pairs h's (k, c) axes with the decoded
    words' (c, k): ffn[d] = sum_{k,c} h[k,c] * w2[d, 8c+k].
    ``permuted_out`` (the w2tp layout) additionally un-permutes the
    plane-major output columns back to natural order."""
    L, Hp, Dn = words.shape
    lead = h_perm.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    if _USE_PALLAS and not _PRECISE:
        from calm_tpu.ops import pallas_qmm
        use_kernel = pallas_qmm.mmt_supported(h_perm.shape, words)
    else:
        use_kernel = False
    if use_kernel:
        out = pallas_qmm.qmm_prefill_t(
            h_perm.reshape(rows, h_perm.shape[-1]).astype(jnp.float32),
            words, layer).reshape(*lead, Dn)
    else:
        wsel = jax.lax.dynamic_index_in_dim(words, layer, 0, keepdims=False)
        dt = jnp.float32 if (_PRECISE or not _USE_PALLAS) else jnp.bfloat16
        dec = gf4_decode_words(wsel, dt).reshape(Hp, Dn, 8)
        hp = h_perm.reshape(*lead, 8, Hp).astype(dt)
        out = jnp.einsum("...kc,cdk->...d", hp, dec,
                         preferred_element_type=jnp.float32)
    return _unpermute_last(out) if permuted_out else out


def qmatmul_wo_p(att: jax.Array, words: jax.Array, layer,
                 stage: str = "wo") -> jax.Array:
    """att (..., Q) @ plane-major-OUTPUT wo_p words (L, 8, D/8, Q/8) ->
    (..., D) natural. Flattening the (8, D/8) plane axes gives a row-major
    gf4 matrix with rows in permuted order (row k*(D/8)+c = natural output
    8c+k, input packing untouched); un-permute after the matvec."""
    L, _, gd, Qp = words.shape
    flat = words.reshape(L, 8 * gd, Qp)
    return _unpermute_last(
        qmatmul(att, QTensor(flat, "gf4"), layer=layer, stage=stage))


def embed_lookup(tokens: jax.Array, qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Gather + dequantize embedding rows (reads only the needed rows)."""
    rows = qt.data[tokens]  # gather packed rows
    if qt.fmt == "gf4":
        return gf4_decode_words(rows, dtype)
    rows = rows.astype(dtype)
    if qt.scale is not None:
        rows = rows * qt.scale.astype(dtype)  # per-tensor scalar (1,)
    return rows
