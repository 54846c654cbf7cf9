"""Sampler tests: RNG bit-compatibility, greedy/min-p semantics, softmax_prob."""

import math

import numpy as np
import pytest

from calm_tpu.sampler import Sampler, XorshiftRng, softmax_prob


def reference_xorshift(seed, n):
    """Straight transcription of the xorshift64* recurrence for cross-check."""
    mask = (1 << 64) - 1
    s = seed & mask
    out = []
    for _ in range(n):
        s ^= s >> 12
        s ^= (s << 25) & mask
        s ^= s >> 27
        out.append(((s * 0x2545F4914F6CDD1D) & mask) >> 32)
    return out


def test_rng_sequence():
    rng = XorshiftRng(12345)
    got = [rng.next_u32() for _ in range(16)]
    assert got == reference_xorshift(12345, 16)


def test_rng_f32_range():
    rng = XorshiftRng(7)
    vals = [rng.next_f32() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert 0.4 < np.mean(vals) < 0.6


def test_greedy():
    s = Sampler(vocab_size=5, temperature=0.0)
    logits = np.array([0.1, 3.0, 3.0, -1.0, 2.9], dtype=np.float32)
    assert s.sample(logits) == 1  # first max wins


def test_minp_only_max_when_p_high():
    # minp close to 1 keeps only tokens within log(minp)*T of the max
    s = Sampler(vocab_size=4, temperature=1.0, minp=0.99, seed=1)
    logits = np.array([0.0, 10.0, 0.0, 0.0], dtype=np.float32)
    for _ in range(20):
        assert s.sample(logits.copy()) == 1


def test_minp_distribution():
    s = Sampler(vocab_size=3, temperature=1.0, minp=0.05, seed=9)
    logits = np.array([math.log(0.6), math.log(0.3), math.log(0.1)], dtype=np.float32)
    counts = np.zeros(3)
    for _ in range(4000):
        counts[s.sample(logits.copy())] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=0.04)


def test_minp_cutoff_excludes_tail():
    # with minp=0.5, tokens below half the max prob never sampled
    s = Sampler(vocab_size=3, temperature=1.0, minp=0.5, seed=3)
    logits = np.array([0.0, math.log(0.49), -10.0], dtype=np.float32)
    seen = {s.sample(logits.copy()) for _ in range(500)}
    assert seen == {0}


def test_softmax_prob():
    logits = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    e = np.exp(logits - 3.0)
    want = e / e.sum()
    for i in range(3):
        assert softmax_prob(i, logits) == pytest.approx(want[i], rel=1e-6)


def test_temperature_sharpens():
    lo = Sampler(vocab_size=3, temperature=0.25, minp=0.0001, seed=11)
    logits = np.array([1.0, 0.5, 0.0], dtype=np.float32)
    counts = np.zeros(3)
    for _ in range(2000):
        counts[lo.sample(logits.copy())] += 1
    assert counts[0] / counts.sum() > 0.8


def test_device_sample_greedy_matches_argmax():
    import jax
    import jax.numpy as jnp
    from calm_tpu.sampler import device_sample

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 3, (4, 64)).astype(np.float32))
    toks = device_sample(logits, jax.random.PRNGKey(0),
                         jnp.zeros(4), jnp.full(4, 0.1))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), -1))


def test_device_sample_respects_cutoff():
    import jax
    import jax.numpy as jnp
    from calm_tpu.sampler import device_sample

    rng = np.random.default_rng(1)
    logits = rng.normal(0, 3, (2, 128)).astype(np.float32)
    temp, minp = 0.8, 0.3
    cutoff = logits.max(-1, keepdims=True) + np.log(minp) * temp
    ok = logits >= cutoff
    for i in range(50):
        toks = np.asarray(device_sample(jnp.asarray(logits),
                                        jax.random.PRNGKey(i),
                                        jnp.full(2, temp), jnp.full(2, minp)))
        for b in range(2):
            assert ok[b, toks[b]], (i, b)


def test_decode_scan_sampled_greedy_parity():
    import jax
    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.config import ModelConfig
    from calm_tpu.utils.synth import synth_weights

    cfg = ModelConfig(dim=64, hidden_dim=128, head_dim=16, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=256, seq_len=32,
                      rope_theta=10000.0, rotary_dim=16, norm_ln=False,
                      dtype="fp16")
    w = synth_weights(cfg)
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)

    want, _, _ = M.decode_scan(cfg, w, tok, pos,
                            M.KVCache.create(cfg, 1, jnp.float16), 6)
    got, _, _ = M.decode_scan_sampled(
        cfg, w, tok, pos, M.KVCache.create(cfg, 1, jnp.float16), 6,
        jax.random.PRNGKey(0), jnp.zeros(1), jnp.full(1, 0.1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_health_check_cpu_mesh():
    from calm_tpu.parallel.mesh import health_check
    report = health_check()
    assert report["devices"] >= 1
    assert report["psum_seconds"] < 60
