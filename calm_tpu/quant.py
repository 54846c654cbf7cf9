"""Weight quantization formats: fp16, fp8 (e5m2), fp8e4 (e4m3 + scale), gf4.

Numpy reference implementations of the container-level quantization math.
The on-TPU decode paths live in calm_tpu/ops (Pallas kernels); these
functions define the bit-exact format and serve as the golden reference for
kernel tests and for the offline converter.

gf4 ("group float 4"): 8 consecutive values share one u32 word
(reference format: tools/convert.py:245-268, decoder src/infer.c:37-40):

    bits [0:8)   fp8-e5m2 group scale byte ``m`` (the group's abs-max,
                 rounded to fp8, sign included)
    bits [8+3k : 8+3k+3)  3-bit code ``q_k`` for value k in [0, 8)

    value_k = (q_k - 4) * (fp8_decode(m) / -4)

The asymmetric [-4, 3] code range is exploited by encoding the max element as
code 0 (exactly -4 * m/-4 = m). Uniform 4.0 bits/weight.
"""

from __future__ import annotations

import numpy as np
import ml_dtypes

FP8 = np.dtype(ml_dtypes.float8_e5m2)
FP8E4 = np.dtype(ml_dtypes.float8_e4m3fn)

# Shift amount of each of the 8 3-bit fields inside a gf4 word.
GF4_SHIFTS = np.array([8 + 3 * k for k in range(8)], dtype=np.uint32)


def fp8_quantize(t: np.ndarray) -> np.ndarray:
    """Round to fp8 e5m2 (round-to-nearest-even via float32)."""
    return np.asarray(t, dtype=np.float32).astype(FP8)


def fp8_dequantize(t: np.ndarray) -> np.ndarray:
    return np.asarray(t).view(FP8).astype(np.float32)


def fp8e4_quantize(t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round to fp8 e4m3fn with a power-of-two per-tensor scale.

    Beyond reference parity: the reference ships e5m2 weights only (2
    mantissa bits); e4m3 carries 3 but spans just [2^-9, 448], so a
    per-tensor scale lifts small-magnitude weight tensors out of the
    subnormal range. The scale is a power of two, so dequantization
    (q * scale) is EXACT — quality is set purely by the e4m3 rounding.
    Returns (codes, scale[1]) with max(|t/scale|) <= 448 (no NaN encodes).
    """
    t = np.asarray(t, dtype=np.float32)
    amax = float(np.max(np.abs(t))) if t.size else 0.0
    s = float(2.0 ** np.ceil(np.log2(amax / 448.0))) if amax > 0 else 1.0
    return (t / s).astype(FP8E4), np.full((1,), s, np.float32)


def fp8e4_dequantize(t: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return np.asarray(t).view(FP8E4).astype(np.float32) * np.float32(scale.reshape(()))


def gf4_quantize(t: np.ndarray) -> np.ndarray:
    """Quantize the last axis (must be a multiple of 8) to gf4 u32 words.

    Matches the container format bit-for-bit: group abs-max is rounded to
    fp8-e5m2 *before* normalization so the quantization range is exact, the
    normalized values are quantized in float16 arithmetic, and zero/degenerate
    groups quantize to all-zero codes.
    """
    t = np.asarray(t, dtype=np.float32)
    assert t.shape[-1] % 8 == 0, "gf4 requires last dim % 8 == 0"
    gt = t.reshape(*t.shape[:-1], -1, 8)

    # abs-max of each group, sign preserved, rounded to fp8
    gmaxi = np.abs(gt).argmax(axis=-1)
    gmax = np.take_along_axis(gt, gmaxi[..., None], axis=-1)
    gmax = gmax.astype(FP8).astype(np.float32)

    with np.errstate(divide="ignore", invalid="ignore"):
        gn = gt / gmax
    gn = np.nan_to_num(gn, nan=0.0, posinf=0.0, neginf=0.0)

    # normalize to [-1, 1] and quantize to [0, 8) in fp16 arithmetic;
    # positive half of the range is shorter, so clamp 8 -> 7
    q = np.clip(np.round(gn.astype(np.float16) * np.float16(-4) + np.float16(4)), 0, 7)
    q = q.astype(np.uint32)

    words = (q << GF4_SHIFTS).sum(axis=-1, dtype=np.uint32)
    words += gmax.astype(FP8).reshape(words.shape).view(np.uint8).astype(np.uint32)
    return words.view(np.int32)


def gf4_dequantize(words: np.ndarray) -> np.ndarray:
    """Decode gf4 u32 words back to float32, expanding the last axis by 8."""
    w = np.asarray(words).view(np.uint32)
    scale = (w & 0xFF).astype(np.uint8).view(FP8).astype(np.float32) / -4.0
    codes = ((w[..., None] >> GF4_SHIFTS) & 7).astype(np.int32) - 4
    vals = codes.astype(np.float32) * scale[..., None]
    return vals.reshape(*w.shape[:-1], w.shape[-1] * 8)


def quantize(t: np.ndarray, dtype: str) -> np.ndarray:
    """Quantize a float tensor for the container; dtype in {fp16, fp8, gf4}.
    (fp8e4 carries a side scale — use quantize_scaled.)"""
    if dtype == "fp16":
        return np.asarray(t, dtype=np.float32).astype(np.float16)
    if dtype == "fp8":
        return fp8_quantize(t)
    if dtype == "gf4":
        return gf4_quantize(t)
    raise ValueError(f"unknown weight dtype {dtype!r}")


def quantize_scaled(t: np.ndarray, dtype: str):
    """Quantize, returning (codes, scale-or-None). The uniform entry point
    for all four container formats; scale is a (1,)-shaped f32 for fp8e4."""
    if dtype == "fp8e4":
        return fp8e4_quantize(t)
    return quantize(t, dtype), None


def dequantize(t: np.ndarray, dtype: str, scale=None) -> np.ndarray:
    if dtype == "fp16":
        return np.asarray(t, dtype=np.float32)
    if dtype == "fp8":
        return fp8_dequantize(t)
    if dtype == "fp8e4":
        return fp8e4_dequantize(t, np.ones(1, np.float32) if scale is None else scale)
    if dtype == "gf4":
        return gf4_dequantize(t)
    raise ValueError(f"unknown weight dtype {dtype!r}")


def dtype_bits(dtype: str) -> int:
    return {"fp16": 16, "fp8": 8, "fp8e4": 8, "gf4": 4}[dtype]
