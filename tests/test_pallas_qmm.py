"""Pallas fused dequant-matmul kernels vs the jnp reference path
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from calm_tpu import quant
from calm_tpu.ops import qmm
from calm_tpu.ops import pallas_qmm


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_qmm.set_interpret(True)
    yield
    pallas_qmm.set_interpret(False)


def make_qt(rng, d, n, fmt):
    w = (rng.standard_normal((d, n)) * 0.1).astype(np.float32)
    return qmm.QTensor.from_numpy(quant.quantize(w, fmt), fmt), w


@pytest.mark.parametrize("fmt", ["fp16", "fp8", "gf4"])
@pytest.mark.parametrize("b", [1, 4])
def test_kernel_matches_jnp(rng, fmt, b):
    d, n = 256, 384  # n: 384 = 3*128 lanes; gf4 packs to 48 words
    qt, _ = make_qt(rng, d, n, fmt)
    x = rng.standard_normal((b, n)).astype(np.float32)

    want = np.asarray(qmm.qmatmul(jnp.asarray(x), qt))
    got = np.asarray(pallas_qmm.qmm_decode(jnp.asarray(x), qt.data, fmt))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_ragged_rows(rng):
    # d not divisible by the tile size: masking via Pallas block padding
    d, n = 200, 128
    qt, _ = make_qt(rng, d, n, "fp8")
    x = rng.standard_normal((1, n)).astype(np.float32)
    want = np.asarray(qmm.qmatmul(jnp.asarray(x), qt))
    got = np.asarray(pallas_qmm.qmm_decode(jnp.asarray(x), qt.data, "fp8"))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_dispatch_through_qmatmul(rng):
    qt, _ = make_qt(rng, 256, 256, "gf4")
    x = rng.standard_normal((1, 1, 256)).astype(np.float32)
    want = np.asarray(qmm.qmatmul(jnp.asarray(x), qt))
    qmm.enable_pallas(True)
    try:
        got = np.asarray(qmm.qmatmul(jnp.asarray(x), qt))
    finally:
        qmm.enable_pallas(False)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    assert got.shape == (1, 1, 256)


def test_supported_predicate(rng):
    qt, _ = make_qt(rng, 64, 256, "fp8")
    assert pallas_qmm.supported((1, 256), qt.data, "fp8")
    assert not pallas_qmm.supported((64, 256), qt.data, "fp8")   # big batch
    assert not pallas_qmm.supported((1, 255), qt.data, "fp8")    # dim mismatch
    qt2, _ = make_qt(rng, 64, 192, "fp8")
    assert not pallas_qmm.supported((1, 192), qt2.data, "fp8")   # 192 lanes unaligned
