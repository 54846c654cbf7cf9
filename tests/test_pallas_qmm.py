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
    # unaligned packed minor axis is fine (Mosaic masks partial lanes);
    # gating on %128 sent llama2-geometry gf4 w2 to the slow XLA path
    qt2, _ = make_qt(rng, 64, 192, "fp8")
    assert pallas_qmm.supported((1, 192), qt2.data, "fp8")


def test_unaligned_packed_minor_gf4(rng):
    """hidden_dim/8 not a multiple of 128 (llama2: 11008/8=1376) must ride
    the Pallas path and match the reference; regression for the %128 gate."""
    d, n = 128, 8 * 192  # n_packed = 192
    qt, _ = make_qt(rng, d, n, "gf4")
    x = rng.standard_normal((1, n)).astype(np.float32)
    want = np.asarray(qmm.qmatmul(jnp.asarray(x), qt))
    assert pallas_qmm.supported((1, n), qt.data, "gf4")
    got = np.asarray(pallas_qmm.qmm_decode(jnp.asarray(x), qt.data, "gf4"))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("fmt", ["fp16", "fp8", "gf4"])
def test_layered_kernel(rng, fmt):
    """Layer-stacked weights + traced layer index select the right plane."""
    L, d, n = 3, 256, 384
    ws = []
    qts = []
    for _ in range(L):
        qt, _ = make_qt(rng, d, n, fmt)
        qts.append(qt)
        ws.append(qt.data)
    stack = jnp.stack(ws)
    x = rng.standard_normal((1, n)).astype(np.float32)
    for l in range(L):
        want = np.asarray(qmm.qmatmul(jnp.asarray(x), qts[l]))
        got = np.asarray(pallas_qmm.qmm_decode(
            jnp.asarray(x), stack, fmt, jnp.int32(l)))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("act_gelu", [False, True])
@pytest.mark.parametrize("b", [1, 4])
def test_gf4_fused_ffn(rng, act_gelu, b):
    """The single-call fused FFN (w1/w3 + activation + w2) matches the
    three-matmul reference, including the plane-major w1/w3 row shuffle
    and the partial-tail mask (H/8 not a multiple of the tile)."""
    import jax
    import jax.numpy as jnp

    L, D, H = 2, 256, 8 * 72  # H/8 = 72: exercises the masked tail
    w1 = np.stack([quant.quantize(
        (rng.standard_normal((H, D)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    w3 = np.stack([quant.quantize(
        (rng.standard_normal((H, D)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    w2 = np.stack([quant.quantize(
        (rng.standard_normal((D, H)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    x = (rng.standard_normal((b, D)) * 0.5).astype(np.float32)

    def planes(w):
        return jnp.asarray(w).reshape(L, H // 8, 8, D // 8).transpose(
            0, 2, 1, 3)

    act = ((lambda v: jax.nn.gelu(v, approximate=True)) if act_gelu
           else jax.nn.silu)
    for l in range(L):
        q1 = qmm.QTensor.from_numpy(w1[l], "gf4")
        q3 = qmm.QTensor.from_numpy(w3[l], "gf4")
        q2 = qmm.QTensor.from_numpy(w2[l], "gf4")
        h = np.asarray(act(qmm.qmatmul(jnp.asarray(x), q1))
                       * qmm.qmatmul(jnp.asarray(x), q3))
        want = np.asarray(qmm.qmatmul(jnp.asarray(h), q2))
        got = np.asarray(pallas_qmm.gf4_ffn(
            jnp.asarray(x), planes(w1), planes(w3),
            jnp.asarray(w2).transpose(0, 2, 1), jnp.int32(l), act_gelu))
        np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def _perm(v):
    """Natural (B, D) -> plane-permuted (B, 8, D/8): [:, j, c] = v[:, 8c+j]."""
    B, D = v.shape
    return v.reshape(B, D // 8, 8).transpose(0, 2, 1)


def _unperm(v_pl):
    B, _, G = v_pl.shape
    return v_pl.transpose(0, 2, 1).reshape(B, 8 * G)


@pytest.mark.parametrize("sub_mean", [False, True])
@pytest.mark.parametrize("act_gelu,b", [(False, 1), (True, 4)])
def test_gf4_offn(rng, sub_mean, act_gelu, b):
    """The fused attention-epilogue kernel (wo + residual + ffn-norm + FFN
    on the plane-permuted stream) matches the separate-op reference."""
    import jax
    import jax.numpy as jnp
    from calm_tpu.ops.norms import rmsnorm

    L, D, Q, H = 2, 256, 128, 8 * 72  # Q != D: independent head_dim; tail
    eps = 1e-5
    wo = np.stack([quant.quantize(
        (rng.standard_normal((D, Q)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    w1 = np.stack([quant.quantize(
        (rng.standard_normal((H, D)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    w3 = np.stack([quant.quantize(
        (rng.standard_normal((H, D)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    w2 = np.stack([quant.quantize(
        (rng.standard_normal((D, H)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    g = (1.0 + rng.standard_normal((L, D)) * 0.1).astype(np.float32)
    a = (rng.standard_normal((b, Q)) * 0.5).astype(np.float32)
    r = (rng.standard_normal((b, D)) * 0.5).astype(np.float32)

    # stream layouts (what fuse_gf4_weights builds)
    w1p = jnp.asarray(w1).reshape(L, H // 8, 8, D // 8).transpose(0, 2, 1, 3)
    w3p = jnp.asarray(w3).reshape(L, H // 8, 8, D // 8).transpose(0, 2, 1, 3)
    wo_p = jnp.asarray(wo).reshape(L, D // 8, 8, Q // 8).transpose(0, 2, 1, 3)
    w2t = jnp.asarray(w2).transpose(0, 2, 1)                     # (L, H/8, D)
    w2tp = (w2t.reshape(L, H // 8, D // 8, 8).transpose(0, 1, 3, 2)
            .reshape(L, H // 8, D))
    g_pl = jnp.asarray(g).reshape(L, D // 8, 8).transpose(0, 2, 1)

    act = ((lambda v: jax.nn.gelu(v, approximate=True)) if act_gelu
           else jax.nn.silu)
    assert pallas_qmm.gf4_offn_supported((b, 8, Q // 8), (b, 8, D // 8),
                                         wo_p, w1p, w2tp)
    for l in range(L):
        qo = qmm.QTensor.from_numpy(wo[l], "gf4")
        q1 = qmm.QTensor.from_numpy(w1[l], "gf4")
        q3 = qmm.QTensor.from_numpy(w3[l], "gf4")
        q2 = qmm.QTensor.from_numpy(w2[l], "gf4")
        r1_want = r + np.asarray(qmm.qmatmul(jnp.asarray(a), qo))
        xn = np.asarray(rmsnorm(jnp.asarray(r1_want), jnp.asarray(g[l]),
                                eps, subtract_mean=sub_mean))
        h = np.asarray(act(qmm.qmatmul(jnp.asarray(xn), q1))
                       * qmm.qmatmul(jnp.asarray(xn), q3))
        ffn_want = np.asarray(qmm.qmatmul(jnp.asarray(h), q2))

        ffn_pl, r1_pl = pallas_qmm.gf4_offn(
            jnp.asarray(_perm(a)), jnp.asarray(_perm(r)), g_pl,
            wo_p, w1p, w3p, w2tp, jnp.int32(l), act_gelu, eps, sub_mean)
        np.testing.assert_allclose(np.asarray(_unperm(np.asarray(r1_pl))),
                                   r1_want, rtol=4e-2, atol=4e-2)
        got = _unperm(np.asarray(ffn_pl).reshape(b, 8, D // 8))
        np.testing.assert_allclose(got, ffn_want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("sub_mean", [False, True])
def test_gf4_offn_qkv(rng, sub_mean):
    """Rotated fusion boundary: the offn_qkv kernel's extra epilogue step
    (x_new = r1 + ffn, next-layer attn-norm, fused qkv projection from
    the async-copied wqkv) matches the separate-op reference, including
    the l+1 -> L-1 clamp at the last layer."""
    import jax
    import jax.numpy as jnp
    from calm_tpu.ops.norms import rmsnorm

    L, D, Q, H, R = 2, 256, 128, 8 * 72, 192
    b, eps = 1, 1e-5
    mk = lambda h, w_: np.stack([quant.quantize(
        (rng.standard_normal((h, w_)) * 0.05).astype(np.float32), "gf4")
        for _ in range(L)])
    wo, w1, w3, w2 = mk(D, Q), mk(H, D), mk(H, D), mk(D, H)
    wqkv = mk(R, D)
    g = (1.0 + rng.standard_normal((L, D)) * 0.1).astype(np.float32)
    anx = (1.0 + rng.standard_normal((L, D)) * 0.1).astype(np.float32)
    a = (rng.standard_normal((b, Q)) * 0.5).astype(np.float32)
    r = (rng.standard_normal((b, D)) * 0.5).astype(np.float32)

    w1p = jnp.asarray(w1).reshape(L, H // 8, 8, D // 8).transpose(0, 2, 1, 3)
    w3p = jnp.asarray(w3).reshape(L, H // 8, 8, D // 8).transpose(0, 2, 1, 3)
    wo_p = jnp.asarray(wo).reshape(L, D // 8, 8, Q // 8).transpose(0, 2, 1, 3)
    w2t = jnp.asarray(w2).transpose(0, 2, 1)
    w2tp = (w2t.reshape(L, H // 8, D // 8, 8).transpose(0, 1, 3, 2)
            .reshape(L, H // 8, D))
    g_pl = jnp.asarray(g).reshape(L, D // 8, 8).transpose(0, 2, 1)
    anx_pl = jnp.asarray(anx).reshape(L, D // 8, 8).transpose(0, 2, 1)

    for l in range(L):
        qo = qmm.QTensor.from_numpy(wo[l], "gf4")
        q1 = qmm.QTensor.from_numpy(w1[l], "gf4")
        q3 = qmm.QTensor.from_numpy(w3[l], "gf4")
        q2 = qmm.QTensor.from_numpy(w2[l], "gf4")
        ln = min(l + 1, L - 1)
        qn = qmm.QTensor.from_numpy(wqkv[ln], "gf4")
        r1_want = r + np.asarray(qmm.qmatmul(jnp.asarray(a), qo))
        xn = np.asarray(rmsnorm(jnp.asarray(r1_want), jnp.asarray(g[l]),
                                eps, subtract_mean=sub_mean))
        h = np.asarray(jax.nn.silu(qmm.qmatmul(jnp.asarray(xn), q1))
                       * qmm.qmatmul(jnp.asarray(xn), q3))
        x_want = r1_want + np.asarray(qmm.qmatmul(jnp.asarray(h), q2))
        xq = np.asarray(rmsnorm(jnp.asarray(x_want), jnp.asarray(anx[ln]),
                                eps, subtract_mean=sub_mean))
        qkv_want = np.asarray(qmm.qmatmul(jnp.asarray(xq), qn))

        x_pl, qkv_got = pallas_qmm.gf4_offn_qkv(
            jnp.asarray(_perm(a)), jnp.asarray(_perm(r)), g_pl, anx_pl,
            wo_p, w1p, w3p, w2tp, jnp.asarray(wqkv), jnp.int32(l),
            False, eps, sub_mean)
        np.testing.assert_allclose(_unperm(np.asarray(x_pl)), x_want,
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(qkv_got), qkv_want,
                                   rtol=5e-2, atol=5e-2)


def test_qmm_pre_planed_matches(rng):
    """pre_planed gf4 input (B, 8, n/8) gives the same result as the
    natural-layout call (the kernel's internal form, handed directly)."""
    d, n = 256, 384
    qt, _ = make_qt(rng, d, n, "gf4")
    x = rng.standard_normal((2, n)).astype(np.float32)
    want = np.asarray(pallas_qmm.qmm_decode(jnp.asarray(x), qt.data, "gf4"))
    got = np.asarray(pallas_qmm.qmm_decode(
        jnp.asarray(_perm(x)), qt.data, "gf4", pre_planed=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("act_gelu,b", [(False, 1), (True, 4)])
def test_gf4_moe_ffn_kernel(rng, act_gelu, b):
    """The fused MoE FFN sweep (plane-major w1/w3 + NATURAL w2, one call)
    matches per-expert direct computation, including padded dead slots."""
    import jax

    L, E, D, H = 2, 4, 128, 8 * 72  # H/8 = 72 < 128: tail-mask + pad path
    w1 = np.stack([np.stack([quant.quantize(
        (rng.standard_normal((H, D)) * 0.05).astype(np.float32), "gf4")
        for _ in range(E)]) for _ in range(L)])        # (L, E, H, D/8)
    w3 = np.stack([np.stack([quant.quantize(
        (rng.standard_normal((H, D)) * 0.05).astype(np.float32), "gf4")
        for _ in range(E)]) for _ in range(L)])
    w2 = np.stack([np.stack([quant.quantize(
        (rng.standard_normal((D, H)) * 0.05).astype(np.float32), "gf4")
        for _ in range(E)]) for _ in range(L)])        # (L, E, D, H/8)
    x = (rng.standard_normal((b, D)) * 0.5).astype(np.float32)

    w1pe = (jnp.asarray(w1).reshape(L, E, H // 8, 8, D // 8)
            .transpose(0, 1, 3, 2, 4))                 # (L, E, 8, H/8, D/8)
    w3pe = (jnp.asarray(w3).reshape(L, E, H // 8, 8, D // 8)
            .transpose(0, 1, 3, 2, 4))
    assert pallas_qmm.gf4_moe_ffn_supported((b, D), w1pe, jnp.asarray(w2))

    act = ((lambda v: jax.nn.gelu(v, approximate=True)) if act_gelu
           else jax.nn.silu)
    A = 3
    eidx = np.array([1, 3, 3], np.int32)  # slot 2 = dead padding
    cnt = 2
    for l in range(L):
        got = np.asarray(pallas_qmm.gf4_moe_ffn(
            jnp.asarray(x), w1pe, w3pe, jnp.asarray(w2),
            jnp.asarray(eidx), cnt, jnp.int32(l), act_gelu))
        assert got.shape == (A, b, D)
        for a in range(cnt):
            e = int(eidx[a])
            q1 = qmm.QTensor.from_numpy(w1[l, e], "gf4")
            q3 = qmm.QTensor.from_numpy(w3[l, e], "gf4")
            q2 = qmm.QTensor.from_numpy(w2[l, e], "gf4")
            h = act(qmm.qmatmul(jnp.asarray(x), q1)) \
                * qmm.qmatmul(jnp.asarray(x), q3)
            want = np.asarray(qmm.qmatmul(h, q2))
            np.testing.assert_allclose(got[a], want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("fmt", ["fp16", "fp8", "gf4"])
def test_moe_dense_kernel(rng, fmt):
    """Dense unique-expert sweep via scalar prefetch matches direct matmuls:
    Y[a, b] = x[b] @ W[l, eidx[a]]^T (shared activations, Ax == 1)."""
    L, E, d, n, B = 2, 4, 256, 384, 3
    planes = [[make_qt(rng, d, n, fmt)[0] for _ in range(E)] for _ in range(L)]
    stack = jnp.stack([jnp.stack([planes[l][e].data for e in range(E)])
                       for l in range(L)])
    x = rng.standard_normal((B, n)).astype(np.float32)
    eidx = jnp.asarray([0, 2, 3, 3], jnp.int32)  # sorted, padded by repeat
    for l in range(L):
        got = np.asarray(pallas_qmm.qmm_moe_dense(
            jnp.asarray(x)[None], stack, eidx, fmt, jnp.int32(l)))
        assert got.shape == (4, B, d)
        for a in range(4):
            for b in range(B):
                want = np.asarray(qmm.qmatmul(jnp.asarray(x[b:b + 1]),
                                              planes[l][int(eidx[a])]))
                np.testing.assert_allclose(got[a, b:b + 1], want,
                                           rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("fmt", ["fp8", "gf4"])
def test_moe_dense_kernel_per_slot_x(rng, fmt):
    """Stage-2 form (Ax == A): each expert slot dots its OWN activation
    rows (the h = silu(w1x)*w3x intermediate)."""
    E, d, n, B, A = 4, 256, 384, 2, 3
    planes = [make_qt(rng, d, n, fmt)[0] for _ in range(E)]
    stack = jnp.stack([p.data for p in planes])
    x = rng.standard_normal((A, B, n)).astype(np.float32)
    eidx = jnp.asarray([1, 2, 2], jnp.int32)
    got = np.asarray(pallas_qmm.qmm_moe_dense(
        jnp.asarray(x), stack, eidx, fmt))
    for a in range(A):
        for b in range(B):
            want = np.asarray(qmm.qmatmul(jnp.asarray(x[a, b:b + 1]),
                                          planes[int(eidx[a])]))
            np.testing.assert_allclose(got[a, b:b + 1], want,
                                       rtol=3e-2, atol=3e-2)


def test_gf4_fused_ffn_in_model(rng):
    """decode through a gf4 model with fuse_gf4_weights applied (fused FFN
    kernel path) matches the unfused reference decode."""
    from calm_tpu import model as M
    from calm_tpu.config import ModelConfig
    from calm_tpu.utils.synth import synth_weights

    cfg = ModelConfig(dim=128, hidden_dim=256, head_dim=32, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=256, seq_len=32,
                      rope_theta=10000.0, rotary_dim=32, norm_ln=False,
                      dtype="gf4")
    w = synth_weights(cfg)
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)

    cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
    want, _ = M.decode_step_fn(cfg, w, tok, pos, cache)

    wf = M.fuse_gf4_weights(w, cfg)
    assert wf.layers.w1p is not None
    # offn tier: the plane-permuted-stream epilogue layouts replace w2t
    assert wf.layers.wo_p is not None and wf.layers.w2tp is not None
    assert wf.layers.w2t is None
    qmm.enable_pallas(True)
    try:
        from calm_tpu.ops import pallas_attn
        pallas_attn.set_interpret(True)
        cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
        got, _ = M.decode_step_fn(cfg, wf, tok, pos, cache)
    finally:
        qmm.enable_pallas(False)
        pallas_attn.set_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("batch", [1, 4])
def test_gf4_moe_fused_in_model(rng, batch):
    """gf4 MoE decode through fuse_gf4_weights (w1/w3 REPLACED by the
    plane-major per-expert layouts, one-call fused FFN sweep) matches the
    unfused decode. batch > 1 exercises dedup + dead padding slots."""
    from calm_tpu import model as M
    from calm_tpu.config import ModelConfig
    from calm_tpu.utils.synth import synth_weights

    cfg = ModelConfig(dim=128, hidden_dim=256, head_dim=32, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=256, seq_len=32,
                      rope_theta=10000.0, rotary_dim=32, norm_ln=False,
                      dtype="gf4", n_experts=4, n_experts_ac=2)
    w = synth_weights(cfg)
    tok = jnp.arange(batch, dtype=jnp.int32) % 7
    pos = jnp.zeros((batch,), jnp.int32)

    cache = M.KVCache.create(cfg, batch, jnp.bfloat16)
    want, _ = M.decode_step_fn(cfg, w, tok, pos, cache)  # BEFORE fuse:
    wf = M.fuse_gf4_weights(w, cfg)                      # fuse takes ownership
    assert wf.layers.w1pe is not None and wf.layers.w1 is None
    qmm.enable_pallas(True)
    try:
        from calm_tpu.ops import pallas_attn
        pallas_attn.set_interpret(True)
        cache = M.KVCache.create(cfg, batch, jnp.bfloat16)
        got, _ = M.decode_step_fn(cfg, wf, tok, pos, cache)
    finally:
        qmm.enable_pallas(False)
        pallas_attn.set_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)
    # the non-pallas fallback (prefill path) must also run on the replaced
    # layouts and agree
    cache = M.KVCache.create(cfg, batch, jnp.bfloat16)
    got2, _ = M.decode_step_fn(cfg, wf, tok, pos, cache)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("batch", [1, 4])
def test_moe_path_in_model(rng, batch):
    """The dense unique-expert decode path produces the same logits as the
    vmap reference path on a tiny MoE model (interpret mode). batch > 1
    exercises the dedup: rows share experts, the combine must not double
    count padded slots."""
    from calm_tpu import model as M
    from calm_tpu.config import ModelConfig
    from calm_tpu.utils.synth import synth_weights

    cfg = ModelConfig(dim=128, hidden_dim=256, head_dim=32, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=256, seq_len=32,
                      rope_theta=10000.0, rotary_dim=32, norm_ln=False,
                      dtype="fp8", n_experts=4, n_experts_ac=2)
    w = synth_weights(cfg)
    tok = jnp.arange(batch, dtype=jnp.int32) % 7
    pos = jnp.zeros((batch,), jnp.int32)

    cache = M.KVCache.create(cfg, batch, jnp.bfloat16)
    want, _ = M.decode_step_fn(cfg, w, tok, pos, cache)

    qmm.enable_pallas(True)
    try:
        from calm_tpu.ops import pallas_attn
        pallas_attn.set_interpret(True)
        cache = M.KVCache.create(cfg, batch, jnp.bfloat16)
        got, _ = M.decode_step_fn(cfg, w, tok, pos, cache)
    finally:
        qmm.enable_pallas(False)
        pallas_attn.set_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("rows", [32, 100, 256])
def test_gf4_prefill_matmul(rng, rows):
    """Row-blocked gf4 prefill matmul (decode-once plane scratch) matches
    the f32 dequant reference, including partial row/d blocks."""
    d, n = 384, 256
    qt, _ = make_qt(rng, d, n, "gf4")
    x = rng.standard_normal((rows, n)).astype(np.float32)
    want = np.asarray(x @ np.asarray(qmm.dequant(qt)).T)
    assert pallas_qmm.mm_supported(x.shape, qt.data, "gf4")
    got = np.asarray(pallas_qmm.qmm_prefill(jnp.asarray(x), qt.data))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_gf4_prefill_matmul_layered(rng):
    """Layer-stacked dispatch: scalar-prefetch layer index selects the
    plane, matching per-layer dense matmuls."""
    L, d, n, rows = 3, 256, 128, 64
    stacks, dense = [], []
    for _ in range(L):
        qt, _ = make_qt(rng, d, n, "gf4")
        stacks.append(np.asarray(qt.data))
        dense.append(np.asarray(qmm.dequant(qt)))
    wdata = jnp.asarray(np.stack(stacks))
    x = rng.standard_normal((rows, n)).astype(np.float32)
    for l in range(L):
        got = np.asarray(pallas_qmm.qmm_prefill(jnp.asarray(x), wdata,
                                                jnp.int32(l)))
        np.testing.assert_allclose(got, x @ dense[l].T,
                                   rtol=3e-2, atol=3e-2)


def test_gf4_prefill_matmul_transposed(rng):
    """Word-transposed (w2t) prefill kernel: permuted-order h against the
    fused-FFN weight layout matches the einsum consumption path."""
    L, D, H, rows = 2, 256, 384, 48
    words, dense = [], []
    for _ in range(L):
        qt, _ = make_qt(rng, D, H, "gf4")       # w2: (D, H) packed along H
        words.append(np.asarray(qt.data).T)     # (H/8, D) word-transpose
        dense.append(np.asarray(qmm.dequant(qt)))
    wt = jnp.asarray(np.stack(words))
    h_nat = rng.standard_normal((rows, H)).astype(np.float32)
    # k-major permuted order: h_perm[:, k*(H/8)+c] = h_nat[:, 8c+k]
    h_perm = h_nat.reshape(rows, H // 8, 8).transpose(0, 2, 1).reshape(rows, H)
    assert pallas_qmm.mmt_supported(h_perm.shape, wt)
    for l in range(L):
        got = np.asarray(pallas_qmm.qmm_prefill_t(jnp.asarray(h_perm), wt,
                                                  jnp.int32(l)))
        np.testing.assert_allclose(got, h_nat @ dense[l].T,
                                   rtol=3e-2, atol=3e-2)


def test_gf4_prefill_kernel_in_model(rng):
    """Full prefill through fused (zero-copy) gf4 weights with the pallas
    path on: the row-blocked matmul kernels carry the prompt and the
    logits/cache match the pallas-off reference."""
    from calm_tpu import model as M
    from calm_tpu.config import ModelConfig
    from calm_tpu.utils.synth import synth_weights

    cfg = ModelConfig(dim=128, hidden_dim=256, head_dim=32, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=256, seq_len=64,
                      rope_theta=10000.0, rotary_dim=32, norm_ln=False,
                      dtype="gf4")
    wf = M.fuse_gf4_weights(synth_weights(cfg), cfg)
    toks = jnp.asarray([list(range(2, 34))], jnp.int32)  # 32 rows >= kernel min
    pos0 = jnp.zeros((1,), jnp.int32)

    cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
    want, cw = M.prefill(cfg, wf, toks, pos0, cache, logits_mode="all")

    qmm.enable_pallas(True)
    try:
        from calm_tpu.ops import pallas_attn
        pallas_attn.set_interpret(True)
        cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
        got, cg = M.prefill(cfg, wf, toks, pos0, cache, logits_mode="all")
    finally:
        qmm.enable_pallas(False)
        pallas_attn.set_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(cg.k, np.float32),
                               np.asarray(cw.k, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_gf4_prefill_matmul_tpu_interpret(rng):
    """The row-blocked prefill kernels under the STRICT multi-core TPU
    interpreter (models Mosaic memory spaces, grid revisiting, and scratch
    persistence — the decode-once plane-scratch pattern's failure class
    that the plain interpreter cannot see)."""
    from jax.experimental.pallas import tpu as pltpu

    prev = pallas_qmm._INTERPRET
    pallas_qmm._INTERPRET = pltpu.InterpretParams()
    try:
        d, n = 384, 256
        qt, _ = make_qt(rng, d, n, "gf4")
        x = rng.standard_normal((100, n)).astype(np.float32)
        want = x @ np.asarray(qmm.dequant(qt)).T
        got = np.asarray(pallas_qmm.qmm_prefill(jnp.asarray(x), qt.data))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

        D, H, rows = 256, 384, 48
        w2, _ = make_qt(rng, D, H, "gf4")
        words = jnp.asarray(np.asarray(w2.data).T[None])  # (1, H/8, D)
        h_nat = rng.standard_normal((rows, H)).astype(np.float32)
        h_perm = (h_nat.reshape(rows, H // 8, 8).transpose(0, 2, 1)
                  .reshape(rows, H))
        want2 = h_nat @ np.asarray(qmm.dequant(w2)).T
        got2 = np.asarray(pallas_qmm.qmm_prefill_t(
            jnp.asarray(h_perm), words, jnp.int32(0)))
        np.testing.assert_allclose(got2, want2, rtol=3e-2, atol=3e-2)
    finally:
        pallas_qmm._INTERPRET = prev


@pytest.mark.parametrize("moe", [False, True])
def test_gf4_fused_decode_tpu_interpret(rng, moe):
    """The whole fused gf4 decode layer (qkv + flash attention + offn or
    MoE sweep) under the STRICT multi-core TPU interpreter — covers the
    VMEM-scratch / revisiting / memory-space failure class for every hot
    kernel at once."""
    from jax.experimental.pallas import tpu as pltpu

    from calm_tpu import model as M
    from calm_tpu.config import ModelConfig
    from calm_tpu.ops import pallas_attn
    from calm_tpu.utils.synth import synth_weights

    cfg = ModelConfig(dim=128, hidden_dim=256, head_dim=32, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=256, seq_len=32,
                      rope_theta=10000.0, rotary_dim=32, norm_ln=False,
                      dtype="gf4",
                      n_experts=4 if moe else 0,
                      n_experts_ac=2 if moe else 0)
    w = synth_weights(cfg)
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)
    cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
    want, _ = M.decode_step_fn(cfg, w, tok, pos, cache)

    wf = M.fuse_gf4_weights(w, cfg)
    prev_q, prev_a = pallas_qmm._INTERPRET, pallas_attn._INTERPRET
    pallas_qmm._INTERPRET = pltpu.InterpretParams()
    pallas_attn._INTERPRET = pltpu.InterpretParams()
    qmm.enable_pallas(True)
    try:
        cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
        got, _ = M.decode_step_fn(cfg, wf, tok, pos, cache)
    finally:
        qmm.enable_pallas(False)
        pallas_qmm._INTERPRET = prev_q
        pallas_attn._INTERPRET = prev_a
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("fmt,sub_mean,b", [("fp8", False, 1),
                                            ("fp8", True, 2),
                                            ("fp16", False, 1)])
def test_qx_offn_qkv(rng, fmt, sub_mean, b):
    """Byte-format streaming supercall (wo + residual + ffn-norm + FFN +
    next-layer attn-norm + q/k/v on NATURAL layouts) matches the
    separate-op reference, including the l+1 -> L-1 clamp and partial
    row tiles (H=384 vs the 128-row tiling)."""
    import jax
    import jax.numpy as jnp
    from calm_tpu.ops.norms import rmsnorm

    L, D, H, Qd, KVd = 2, 256, 384, 256, 128
    eps = 1e-5

    def mk(h, w_):
        qts = [make_qt(rng, h, w_, fmt)[0] for _ in range(L)]
        return qmm.QTensor(jnp.stack([q.data for q in qts]), fmt)

    wo, w1, w3, w2 = mk(D, Qd), mk(H, D), mk(H, D), mk(D, H)
    wq, wk, wv = mk(Qd, D), mk(KVd, D), mk(KVd, D)
    g = (1.0 + rng.standard_normal((L, D)) * 0.1).astype(np.float32)
    anx = (1.0 + rng.standard_normal((L, D)) * 0.1).astype(np.float32)
    a = (rng.standard_normal((b, Qd)) * 0.5).astype(np.float32)
    r = (rng.standard_normal((b, D)) * 0.5).astype(np.float32)

    for l in range(L):
        ln = min(l + 1, L - 1)
        r1_want = r + np.asarray(qmm.qmatmul(jnp.asarray(a), wo[l]))
        xn = np.asarray(rmsnorm(jnp.asarray(r1_want), jnp.asarray(g[l]),
                                eps, subtract_mean=sub_mean))
        h = np.asarray(jax.nn.silu(qmm.qmatmul(jnp.asarray(xn), w1[l]))
                       * qmm.qmatmul(jnp.asarray(xn), w3[l]))
        x_want = r1_want + np.asarray(qmm.qmatmul(jnp.asarray(h), w2[l]))
        xq = np.asarray(rmsnorm(jnp.asarray(x_want), jnp.asarray(anx[ln]),
                                eps, subtract_mean=sub_mean))
        q_want = np.asarray(qmm.qmatmul(jnp.asarray(xq), wq[ln]))
        k_want = np.asarray(qmm.qmatmul(jnp.asarray(xq), wk[ln]))
        v_want = np.asarray(qmm.qmatmul(jnp.asarray(xq), wv[ln]))

        x_got, q_got, k_got, v_got = pallas_qmm.qx_offn_qkv(
            jnp.asarray(a), jnp.asarray(r), jnp.asarray(g),
            jnp.asarray(anx), wo.data, w1.data, w3.data, w2.data,
            wq.data, wk.data, wv.data, jnp.int32(l), fmt,
            False, eps, sub_mean)
        np.testing.assert_allclose(np.asarray(x_got), x_want,
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(q_got), q_want,
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(k_got), k_want,
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(v_got), v_want,
                                   rtol=5e-2, atol=5e-2)
