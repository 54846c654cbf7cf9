"""jnp model vs numpy oracle parity across dtypes, architecture knobs,
rolling-window/sink behavior, and prefill-vs-serial equivalence."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from calm_tpu import container
from calm_tpu import model as M
from calm_tpu.config import ModelConfig

from tests.modelgen import tiny_config, write_tiny_model
from tests.oracle import Oracle


def build(tmp_path, cfg, **kw):
    path = str(tmp_path / "m.calm")
    write_tiny_model(path, cfg, **kw)
    tf = container.TensorFile(path)
    cfg2 = ModelConfig.from_metadata(tf.metadata)
    assert cfg2 == cfg
    w = M.load_weights(tf, cfg)
    return tf, w


def run_serial(cfg, w, tokens, kv_dtype=jnp.float16):
    """Decode tokens one by one through the jnp path, collect logits."""
    cache = M.KVCache.create(cfg, batch=1, dtype=kv_dtype)
    out = []
    for pos, tok in enumerate(tokens):
        logits, cache = M.decode_step(cfg, w,
                                      jnp.array([tok]), jnp.array([pos]), cache)
        out.append(np.asarray(logits[0]))
    return np.stack(out)


def run_oracle(tf, cfg, tokens):
    o = Oracle(tf, cfg)
    return np.stack([o.forward(int(t), p) for p, t in enumerate(tokens)])


TOKENS = [1, 5, 9, 200, 42, 7, 3, 99]


@pytest.mark.parametrize("dtype", ["fp16", "fp8", "fp8e4", "gf4"])
def test_parity_dtypes(tmp_path, dtype):
    cfg = tiny_config(dtype=dtype)
    tf, w = build(tmp_path, cfg)
    got = run_serial(cfg, w, TOKENS)
    want = run_oracle(tf, cfg, TOKENS)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_parity_gqa_vs_mha(tmp_path):
    cfg = tiny_config(n_kv_heads=4)  # MHA
    tf, w = build(tmp_path, cfg)
    np.testing.assert_allclose(run_serial(cfg, w, TOKENS),
                               run_oracle(tf, cfg, TOKENS), rtol=2e-3, atol=2e-3)


def test_parity_layernorm(tmp_path):
    cfg = tiny_config(norm_ln=True)
    tf, w = build(tmp_path, cfg)
    np.testing.assert_allclose(run_serial(cfg, w, TOKENS),
                               run_oracle(tf, cfg, TOKENS), rtol=2e-3, atol=2e-3)


def test_parity_norm_par(tmp_path):
    cfg = tiny_config(norm_ln=True, norm_par=True)
    tf, w = build(tmp_path, cfg)
    np.testing.assert_allclose(run_serial(cfg, w, TOKENS),
                               run_oracle(tf, cfg, TOKENS), rtol=2e-3, atol=2e-3)


def test_parity_gelu_clip_bias_tied(tmp_path):
    cfg = tiny_config(act_gelu=True, qkv_clip=0.8)
    tf, w = build(tmp_path, cfg, tied=True, bias=True)
    np.testing.assert_allclose(run_serial(cfg, w, TOKENS),
                               run_oracle(tf, cfg, TOKENS), rtol=2e-3, atol=2e-3)


def test_parity_partial_rotary(tmp_path):
    cfg = tiny_config(rotary_dim=6)
    tf, w = build(tmp_path, cfg)
    np.testing.assert_allclose(run_serial(cfg, w, TOKENS),
                               run_oracle(tf, cfg, TOKENS), rtol=2e-3, atol=2e-3)


def test_parity_moe(tmp_path):
    cfg = tiny_config(moe=True)
    tf, w = build(tmp_path, cfg)
    np.testing.assert_allclose(run_serial(cfg, w, TOKENS),
                               run_oracle(tf, cfg, TOKENS), rtol=2e-3, atol=2e-3)


def test_rolling_window_with_sinks(tmp_path):
    """Decode past seq_len: sink re-rotation + rolling writes must match."""
    cfg = tiny_config(seq_len=8)
    tf, w = build(tmp_path, cfg)
    rng = np.random.default_rng(3)
    tokens = rng.integers(3, 250, size=20).tolist()
    got = run_serial(cfg, w, tokens)
    want = run_oracle(tf, cfg, tokens)
    # compare after the window wraps too
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_prefill_matches_serial_decode(tmp_path):
    cfg = tiny_config()
    tf, w = build(tmp_path, cfg)
    toks = jnp.array([TOKENS])

    cache = M.KVCache.create(cfg, 1, jnp.float16)
    logits_all, cache = M.prefill(cfg, w, toks, jnp.array([0]), cache,
                                  logits_mode="all")
    serial = run_serial(cfg, w, TOKENS)
    np.testing.assert_allclose(np.asarray(logits_all[0]), serial,
                               rtol=2e-3, atol=2e-3)


def test_prefill_then_decode(tmp_path):
    cfg = tiny_config()
    tf, w = build(tmp_path, cfg)

    cache = M.KVCache.create(cfg, 1, jnp.float16)
    _, cache = M.prefill(cfg, w, jnp.array([TOKENS[:-1]]), jnp.array([0]), cache,
                         logits_mode="none")
    logits, _ = M.decode_step(cfg, w, jnp.array([TOKENS[-1]]),
                              jnp.array([len(TOKENS) - 1]), cache)
    serial = run_serial(cfg, w, TOKENS)
    np.testing.assert_allclose(np.asarray(logits[0]), serial[-1],
                               rtol=2e-3, atol=2e-3)


def test_batched_decode_independent_slots(tmp_path):
    """Two slots at different positions decode as if alone."""
    cfg = tiny_config()
    tf, w = build(tmp_path, cfg)

    # slot 0 runs TOKENS, slot 1 runs reversed; run batched, compare to solo
    seq_a, seq_b = TOKENS, TOKENS[::-1]
    cache = M.KVCache.create(cfg, 2, jnp.float16)
    got_a, got_b = [], []
    for pos in range(len(seq_a)):
        logits, cache = M.decode_step(
            cfg, w, jnp.array([seq_a[pos], seq_b[pos]]),
            jnp.array([pos, pos]), cache)
        got_a.append(np.asarray(logits[0]))
        got_b.append(np.asarray(logits[1]))

    np.testing.assert_allclose(np.stack(got_a), run_serial(cfg, w, seq_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.stack(got_b), run_serial(cfg, w, seq_b),
                               rtol=1e-4, atol=1e-4)


def test_logits_hash():
    x = np.array([1.0, -2.0, 3.5], dtype=np.float32)
    h = M.logits_hash(x)
    assert 0 <= h <= 0xFFFFFFFF
    # deterministic and sensitive
    assert h == M.logits_hash(x)
    assert h != M.logits_hash(x + 1)


def test_fuse_gf4_zero_copy(tmp_path):
    """fuse_gf4_weights REPLACES the naturals with pure permutations: all
    fused layouts present, originals dropped (no weight stored twice), and
    decode + prefill through the XLA consumption paths (ops/qmm.py
    qmatmul_w1p/_w2t/_wo_p) match the unfused reference."""
    import jax.numpy as jnp
    import numpy as np

    from calm_tpu import container
    from calm_tpu import model as M
    from tests.modelgen import tiny_config, write_tiny_model

    cfg = tiny_config(dtype="gf4")
    path = str(tmp_path / "m.calm")
    write_tiny_model(path, cfg)
    tf = container.TensorFile(path)
    w_ref = M.load_weights(tf, cfg)                 # stays unfused
    fused = M.fuse_gf4_weights(M.load_weights(tf, cfg), cfg)

    lw = fused.layers
    assert lw.wqkv is not None and lw.w1p is not None and lw.w3p is not None
    # default (non-norm_par) config takes the offn tier
    assert lw.wo_p is not None and lw.w2tp is not None and lw.w2t is None
    for f in ("w1", "w2", "w3", "wq", "wk", "wv", "wo"):
        assert getattr(lw, f) is None, f"{f} natural should be dropped"

    # decode parity (CPU XLA consumption path; reduction order differs
    # from the natural layout so exact equality is not expected)
    cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
    want, _ = M.decode_step_fn(cfg, w_ref, jnp.array([3]), jnp.array([0]),
                               cache)
    cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
    got, _ = M.decode_step_fn(cfg, fused, jnp.array([3]), jnp.array([0]),
                              cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # prefill parity: logits and the written cache rows
    toks = jnp.asarray([[3, 7, 1, 9]], jnp.int32)
    pos0 = jnp.zeros((1,), jnp.int32)
    cache_a = M.KVCache.create(cfg, 1, jnp.bfloat16)
    la, ca = M.prefill(cfg, w_ref, toks, pos0, cache_a)
    cache_b = M.KVCache.create(cfg, 1, jnp.bfloat16)
    lb, cb = M.prefill(cfg, fused, toks, pos0, cache_b)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cb.k, np.float32), np.asarray(ca.k, np.float32),
        rtol=2e-2, atol=2e-2)  # bf16 cache rows


def test_load_weights_fused_bit_exact(tmp_path):
    """load_weights_fused (host-side numpy permutations over the memmap)
    produces leaf-for-leaf BIT-identical pytrees to the device-side
    fuse_gf4_weights(load_weights(...)) route, for dense gf4, MoE gf4, and
    the non-gf4 passthrough. The host route exists because the device
    massage holds a natural weight stack plus its transpose simultaneously
    (OOM at Mixtral-geometry gf4 sizes on a 16 GiB chip)."""
    import jax
    import numpy as np

    from calm_tpu import container
    from calm_tpu import model as M
    from tests.modelgen import tiny_config, write_tiny_model

    for kw in (dict(dtype="gf4"), dict(dtype="gf4", moe=True),
               dict(dtype="gf4", norm_par=True), dict(dtype="fp8")):
        cfg = tiny_config(**kw)
        path = str(tmp_path / f"m_{kw.get('dtype')}_{kw.get('moe', 0)}"
                   f"_{kw.get('norm_par', 0)}.calm")
        write_tiny_model(path, cfg)
        tf = container.TensorFile(path)
        want = M.fuse_gf4_weights(M.load_weights(tf, cfg), cfg)
        got = M.load_weights_fused(tf, cfg)
        wl, gl = jax.tree.leaves(want), jax.tree.leaves(got)
        assert len(wl) == len(gl)
        for a, b in zip(wl, gl):
            assert a.dtype == b.dtype and a.shape == b.shape
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8))


def test_load_weights_fused_tied(tmp_path):
    """tied embed/output stays ONE device buffer through the host-fused
    loader (the upload memo dedups by host-array identity)."""
    from calm_tpu import container
    from calm_tpu import model as M
    from tests.modelgen import tiny_config, write_tiny_model

    cfg = tiny_config(dtype="gf4")
    path = str(tmp_path / "tied.calm")
    write_tiny_model(path, cfg, tied=True)
    tf = container.TensorFile(path)
    w = M.load_weights_fused(tf, cfg)
    assert w.embed.data is w.output.data


def test_fuse_gf4_norm_par_tier(tmp_path):
    """norm_par (Cohere-style) models skip the offn epilogue (the fused
    epilogue needs a post-attn norm) but still drop every natural: wo
    stays (it was never permuted), w2t replaces w2."""
    import jax.numpy as jnp
    import numpy as np

    from calm_tpu import container
    from calm_tpu import model as M
    from tests.modelgen import tiny_config, write_tiny_model

    cfg = tiny_config(dtype="gf4", norm_par=True)
    path = str(tmp_path / "m.calm")
    write_tiny_model(path, cfg)
    tf = container.TensorFile(path)
    w_ref = M.load_weights(tf, cfg)
    fused = M.fuse_gf4_weights(M.load_weights(tf, cfg), cfg)

    lw = fused.layers
    assert lw.w2t is not None and lw.wo_p is None and lw.w2tp is None
    assert lw.wo is not None  # natural wo kept: no permuted copy exists
    for f in ("w1", "w2", "w3", "wq", "wk", "wv"):
        assert getattr(lw, f) is None

    cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
    want, _ = M.decode_step_fn(cfg, w_ref, jnp.array([3]), jnp.array([0]),
                               cache)
    cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
    got, _ = M.decode_step_fn(cfg, fused, jnp.array([3]), jnp.array([0]),
                              cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
