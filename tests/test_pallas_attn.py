"""Flash-decode attention kernel vs a straightforward numpy reference."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from calm_tpu.ops import pallas_attn


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_attn.set_interpret(True)
    yield
    pallas_attn.set_interpret(False)


def ref_attention(q, k, v, kv_len):
    """q (B,H,hd) f32; k/v (B,KVH,S,hd); masked softmax over [0,kv_len)."""
    B, H, hd = q.shape
    KVH, S = k.shape[1], k.shape[2]
    M = H // KVH
    out = np.zeros_like(q, dtype=np.float32)
    for b in range(B):
        for h in range(H):
            kh = k[b, h // M].astype(np.float32)
            vh = v[b, h // M].astype(np.float32)
            scores = kh[: kv_len[b]] @ q[b, h] / math.sqrt(hd)
            e = np.exp(scores - scores.max())
            out[b, h] = (e / e.sum()) @ vh[: kv_len[b]]
    return out


@pytest.mark.parametrize("kv_dtype", [jnp.float16, jnp.bfloat16])
def test_matches_reference(rng, kv_dtype):
    B, KVH, M, S, hd = 2, 2, 4, 256, 128
    q = rng.standard_normal((B, KVH * M, hd)).astype(np.float32)
    k = (rng.standard_normal((B, KVH, S, hd)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((B, KVH, S, hd)) * 0.5).astype(np.float32)
    kv_len = np.array([100, 256], np.int32)

    got = np.asarray(pallas_attn.decode_attention(
        jnp.asarray(q), jnp.asarray(k, kv_dtype), jnp.asarray(v, kv_dtype),
        jnp.asarray(kv_len)))
    want = ref_attention(q, np.asarray(jnp.asarray(k, kv_dtype), np.float32)
                         .astype(np.float32),
                         np.asarray(jnp.asarray(v, kv_dtype), np.float32),
                         kv_len)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_short_kv_len_single_block(rng):
    """kv_len smaller than one block: masking within the first block."""
    B, KVH, M, S, hd = 1, 1, 8, 1024, 128
    q = rng.standard_normal((B, KVH * M, hd)).astype(np.float32)
    k = (rng.standard_normal((B, KVH, S, hd)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((B, KVH, S, hd)) * 0.5).astype(np.float32)
    kv_len = np.array([3], np.int32)

    got = np.asarray(pallas_attn.decode_attention(
        jnp.asarray(q), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(kv_len)))
    want = ref_attention(q,
                         np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32),
                         np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32),
                         kv_len)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fp8_kv(rng):
    B, KVH, M, S, hd = 1, 2, 2, 512, 128
    q = rng.standard_normal((B, KVH * M, hd)).astype(np.float32)
    k = (rng.standard_normal((B, KVH, S, hd)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((B, KVH, S, hd)) * 0.5).astype(np.float32)
    kv_len = np.array([300], np.int32)

    k8 = jnp.asarray(k, jnp.float8_e5m2)
    v8 = jnp.asarray(v, jnp.float8_e5m2)
    got = np.asarray(pallas_attn.decode_attention(
        jnp.asarray(q), k8, v8, jnp.asarray(kv_len)))
    want = ref_attention(q, np.asarray(k8, np.float32),
                         np.asarray(v8, np.float32), kv_len)
    # fp8 kv: coarser values, same math
    np.testing.assert_allclose(got, want, rtol=6e-2, atol=6e-2)


@pytest.mark.parametrize("pos0", [0, 5])
def test_prefill_attention_parity(rng, pos0):
    """Flash prefill kernel vs plain masked softmax attention."""
    B, T, KVH, M, hd, S, L = 1, 8, 2, 2, 32, 32, 3
    layer = 1
    q = rng.standard_normal((B, T, KVH, M, hd)).astype(np.float32)
    kc = rng.standard_normal((L, B, KVH, S, hd)).astype(np.float32)
    vc = rng.standard_normal((L, B, KVH, S, hd)).astype(np.float32)
    kv_len = np.array([pos0 + T], np.int32)

    got = np.asarray(pallas_attn.prefill_attention(
        jnp.asarray(q), jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16), jnp.full((B,), pos0, jnp.int32),
        jnp.asarray(kv_len), jnp.int32(layer)))

    # reference: full masked softmax on the selected layer plane
    k = np.asarray(jnp.asarray(kc[layer], jnp.bfloat16), np.float32)
    v = np.asarray(jnp.asarray(vc[layer], jnp.bfloat16), np.float32)
    want = np.zeros_like(q)
    for b in range(B):
        for h in range(KVH):
            for m in range(M):
                for t in range(T):
                    qpos = pos0 + t
                    scores = (k[b, h] @ q[b, t, h, m]) / np.sqrt(hd)
                    mask = (np.arange(S) < kv_len[b]) & (np.arange(S) <= qpos)
                    scores = np.where(mask, scores, -np.inf)
                    p = np.exp(scores - scores.max())
                    p /= p.sum()
                    want[b, t, h, m] = p @ v[b, h]
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_prefill_attention_fp8_kv(rng):
    B, T, KVH, M, hd, S, L = 1, 4, 2, 2, 32, 16, 2
    q = rng.standard_normal((B, T, KVH, M, hd)).astype(np.float32)
    kc = (rng.standard_normal((L, B, KVH, S, hd)) * 0.25).astype(np.float32)
    vc = (rng.standard_normal((L, B, KVH, S, hd)) * 0.25).astype(np.float32)
    kc8 = jnp.asarray(kc, jnp.float8_e5m2)
    vc8 = jnp.asarray(vc, jnp.float8_e5m2)
    got = np.asarray(pallas_attn.prefill_attention(
        jnp.asarray(q), kc8, vc8, jnp.zeros((B,), jnp.int32),
        jnp.full((B,), T, jnp.int32), jnp.int32(0)))
    # reference over the fp8-rounded cache
    k = np.asarray(kc8[0], np.float32)
    v = np.asarray(vc8[0], np.float32)
    for t in range(T):
        for h in range(KVH):
            for m in range(M):
                scores = (k[0, h] @ q[0, t, h, m]) / np.sqrt(hd)
                mask = np.arange(S) <= t
                scores = np.where(mask, scores, -np.inf)
                p = np.exp(scores - scores.max()); p /= p.sum()
                np.testing.assert_allclose(got[0, t, h, m], p @ v[0, h],
                                           rtol=6e-2, atol=6e-2)


def test_deferred_write_decode_parity():
    """Deferred-KV-write decode (pallas path: fresh rows ride into the
    kernel, one batched cache write per step) must match the jnp path's
    logits step-for-step — including across the rolling-window wrap where
    the fresh row REPLACES a stale cache row in place."""
    import jax
    import jax.numpy as jnp
    from calm_tpu import model as M
    from calm_tpu.config import ModelConfig
    from calm_tpu.ops import qmm
    from calm_tpu.utils.synth import synth_weights

    cfg = ModelConfig(dim=128, hidden_dim=256, head_dim=32, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=256, seq_len=16,
                      rope_theta=10000.0, rotary_dim=32, norm_ln=False,
                      dtype="fp16")
    w = synth_weights(cfg)
    B = 2
    toks = np.arange(1, 25, dtype=np.int32).reshape(-1, 1)  # 24 > seq_len

    def run():
        cache = M.KVCache.create(cfg, B, jnp.bfloat16)
        outs = []
        for pos in range(toks.shape[0]):
            logits, cache = M.decode_step_fn(
                cfg, w, jnp.full((B,), int(toks[pos, 0]), jnp.int32),
                jnp.full((B,), pos, jnp.int32), cache)
            outs.append(np.asarray(logits))
        return np.stack(outs)

    want = run()
    qmm.enable_pallas(True)
    try:
        pallas_attn.set_interpret(True)
        got = run()
    finally:
        qmm.enable_pallas(False)
        pallas_attn.set_interpret(False)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.95
