"""gf4/fp8 quantization format tests (golden math vs independent bit decoding).

The gf4 format contract is defined in calm_tpu/quant.py; these tests verify
round-trip error bounds, bit-level packing, and edge cases (zero groups,
negative maxima, inf/nan-free behavior).
"""

import numpy as np
import ml_dtypes
import pytest

from calm_tpu import quant

FP8 = np.dtype(ml_dtypes.float8_e5m2)


def manual_gf4_decode_value(word: int, k: int) -> float:
    """Independent scalar decoder following the format spec."""
    scale = np.uint8(word & 0xFF).reshape(()).view(FP8).astype(np.float32) / -4.0
    code = (word >> (8 + 3 * k)) & 7
    return float((int(code) - 4) * scale)


def test_gf4_roundtrip_error(rng):
    x = rng.standard_normal((64, 256)).astype(np.float32)
    words = quant.gf4_quantize(x)
    assert words.dtype == np.int32
    assert words.shape == (64, 32)
    y = quant.gf4_dequantize(words)
    assert y.shape == x.shape
    # 3-bit codes cover [-m, 0.75*m] in steps of m/4 where m is the fp8-rounded
    # group max; worst case is a value near -max when fp8 rounded the scale
    # down by its full 12.5% relative error: |-max - (-0.75*0.875*max)| = 0.34*max
    gmax = np.abs(x.reshape(64, 32, 8)).max(-1, keepdims=True)
    err = np.abs(y - x).reshape(64, 32, 8)
    assert np.all(err <= gmax * 0.35 + 1e-6)


def test_gf4_max_element_exact_to_fp8(rng):
    x = rng.standard_normal((8, 64)).astype(np.float32)
    words = quant.gf4_quantize(x)
    y = quant.gf4_dequantize(words)
    gx = x.reshape(8, 8, 8)
    gy = y.reshape(8, 8, 8)
    idx = np.abs(gx).argmax(-1)
    got = np.take_along_axis(gy, idx[..., None], -1)
    want = np.take_along_axis(gx, idx[..., None], -1).astype(FP8).astype(np.float32)
    # the abs-max element encodes as code 0 -> reproduces its fp8 rounding exactly
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_gf4_zero_group():
    x = np.zeros((1, 8), dtype=np.float32)
    words = quant.gf4_quantize(x)
    y = quant.gf4_dequantize(words)
    np.testing.assert_array_equal(y, x)


def test_gf4_bit_layout(rng):
    x = rng.standard_normal((4, 32)).astype(np.float32)
    words = quant.gf4_quantize(x).view(np.uint32)
    y = quant.gf4_dequantize(words.view(np.int32))
    for r in range(4):
        for g in range(4):
            for k in range(8):
                assert y[r, g * 8 + k] == pytest.approx(
                    manual_gf4_decode_value(int(words[r, g]), k), abs=0)


def test_gf4_negative_max():
    x = np.array([[-10.0, 1, 2, 3, -1, -2, -3, 5]], dtype=np.float32)
    y = quant.gf4_dequantize(quant.gf4_quantize(x))
    assert y[0, 0] == pytest.approx(-10.0, rel=0.07)
    # signs preserved
    assert np.all(np.sign(y[0, [1, 2, 3, 7]]) >= 0)


def test_fp8_roundtrip(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    q = quant.fp8_quantize(x)
    assert q.dtype == FP8
    y = quant.fp8_dequantize(q.view(np.uint8))
    # e5m2: 2 mantissa bits -> relative error <= 2^-3
    nz = x != 0
    assert np.all(np.abs(y[nz] - x[nz]) <= np.abs(x[nz]) * 0.125 + 1e-30)


def test_dtype_bits():
    assert quant.dtype_bits("fp16") == 16
    assert quant.dtype_bits("fp8") == 8
    assert quant.dtype_bits("gf4") == 4


def test_fp8e4_scale_power_of_two():
    """The per-tensor scale is a power of two, so dequantization adds zero
    rounding on top of the e4m3 codes."""
    rng = np.random.default_rng(11)
    w = (rng.standard_normal((64, 64)) * 0.02).astype(np.float32)
    q, s = quant.fp8e4_quantize(w)
    assert s.shape == (1,)
    m, e = np.frexp(float(s[0]))
    assert m == 0.5  # exact power of two
    # scaled values stay in the finite e4m3 range: no NaN codes
    deq = quant.fp8e4_dequantize(q, s)
    assert np.isfinite(deq).all()
    assert np.abs(w / s).max() <= 448.0


def test_fp8e4_better_than_e5m2():
    """3 mantissa bits + scale beats e5m2's 2 on small-magnitude weights."""
    rng = np.random.default_rng(13)
    w = (rng.standard_normal((256, 256)) * 0.02).astype(np.float32)
    q4, s4 = quant.fp8e4_quantize(w)
    err4 = quant.fp8e4_dequantize(q4, s4) - w
    err5 = quant.fp8_dequantize(quant.fp8_quantize(w)) - w
    assert np.mean(err4 ** 2) < 0.5 * np.mean(err5 ** 2)


def test_quantize_scaled_uniform_api():
    rng = np.random.default_rng(17)
    w = rng.standard_normal((16, 16)).astype(np.float32)
    for fmt in ("fp16", "fp8", "gf4"):
        q, s = quant.quantize_scaled(w, fmt)
        assert s is None
        np.testing.assert_array_equal(q, quant.quantize(w, fmt))
    q, s = quant.quantize_scaled(w, "fp8e4")
    assert s is not None
    np.testing.assert_allclose(quant.dequantize(q, "fp8e4", s),
                               quant.fp8e4_dequantize(q, s))
    assert quant.dtype_bits("fp8e4") == 8


def test_precise_mode_matches_f32():
    """Precision.HIGHEST fast-path dots reproduce the f32 reference exactly
    where the default TPU path (bf16 operands) deviates."""
    import jax
    import jax.numpy as jnp

    from calm_tpu.ops import qmm
    from calm_tpu.ops.qmm import QTensor, qmatmul

    rng = np.random.default_rng(3)
    w16 = (rng.standard_normal((128, 256)) * 0.05).astype(np.float16)
    x = jnp.asarray(rng.standard_normal((2, 256)) * 0.3, jnp.float32)
    qt = QTensor.from_numpy(w16, "fp16")

    want = np.asarray(qmatmul(x, qt))  # default path: f32 reference off-TPU

    qmm.enable_pallas(True)  # engages the bf16 fast path on any backend
    try:
        fast = np.asarray(qmatmul(x, qt))
        qmm.enable_precise(True)
        precise = np.asarray(qmatmul(x, qt))
    finally:
        qmm.enable_precise(False)
        qmm.enable_pallas(False)

    assert not np.allclose(fast, want, rtol=1e-6, atol=1e-6)  # bf16 deviates
    np.testing.assert_allclose(precise, want, rtol=1e-6, atol=1e-6)
