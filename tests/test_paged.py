"""Paged KV cache: block-table decode over a shared page pool must match
the dense-cache path exactly (same logical window, scrambled physical
pages), with lazy page growth and pool reuse."""

import jax.numpy as jnp
import numpy as np
import pytest

from calm_tpu import model as M
from calm_tpu import paged
from calm_tpu.config import ModelConfig
from calm_tpu.utils.synth import synth_weights

PR = 8  # page rows (tiny for tests; real use: the attention block size)


def tiny_cfg(seq_len=32):
    return ModelConfig(dim=64, hidden_dim=128, head_dim=16, n_layers=2,
                       n_heads=4, n_kv_heads=2, vocab_size=128,
                       seq_len=seq_len, rope_theta=10000.0, rotary_dim=16,
                       norm_ln=False, dtype="fp16")


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return cfg, synth_weights(cfg)


def dense_reference(cfg, w, prompts, n_steps):
    """Greedy decode each prompt independently on a dense cache."""
    outs = []
    for toks in prompts:
        cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
        if len(toks) > 1:
            _, cache = M.prefill(cfg, w, jnp.asarray([toks[:-1]], jnp.int32),
                                 jnp.zeros((1,), jnp.int32), cache,
                                 logits_mode="none")
        tok, pos = toks[-1], len(toks) - 1
        seq = []
        for _ in range(n_steps):
            logits, cache = M.decode_step(cfg, w, jnp.array([tok]),
                                          jnp.array([pos]), cache)
            tok = int(np.argmax(np.asarray(logits[0])))
            pos += 1
            seq.append(tok)
        outs.append(seq)
    return outs


def test_paged_matches_dense(model):
    cfg, w = model
    prompts = [[1, 5, 9, 2, 7], [3, 3, 4], [11]]
    want = dense_reference(cfg, w, prompts, n_steps=6)

    dec = paged.PagedDecoder(cfg, w, n_pages=10, page_rows=PR, batch=3)
    for b, toks in enumerate(prompts):
        assert dec.admit(b, toks)
    got = [[] for _ in prompts]
    for _ in range(6):
        logits = dec.step()
        for b in range(len(prompts)):
            nxt = int(np.argmax(logits[b]))
            got[b].append(nxt)
            dec.slots[b].token = nxt
    assert got == want


def test_lazy_growth_and_release(model):
    cfg, w = model
    # pool of 6 pages << batch(2) * n_blocks(4): fits because contexts are
    # short — the dense layout would need 8
    dec = paged.PagedDecoder(cfg, w, n_pages=6, page_rows=PR, batch=2)
    assert dec.admit(0, [1, 2, 3])          # 1 page
    assert dec.admit(1, [4] * (PR + 2))     # 2 pages (9 rows)
    assert dec.pages_in_use() == 3
    for _ in range(PR):                     # slot 0 crosses into page 2
        logits = dec.step()
        for b in range(2):
            dec.slots[b].token = int(np.argmax(logits[b]))
    assert dec.pages_in_use() >= 4
    dec.release(1)
    assert dec.pages_in_use() <= 2
    # freed pages are reusable by a new admission
    assert dec.admit(1, [7] * (2 * PR))
    logits = dec.step()
    assert np.isfinite(logits).all()


def test_paged_rolling_window(model):
    """Decode past seq_len: the rolling window + per-slot sink rotation on
    paged storage matches the dense path token-for-token."""
    cfg, w = model
    prompt = [2, 9, 4]
    n = cfg.seq_len + 6 - len(prompt)  # well past the window
    want = dense_reference(cfg, w, [prompt], n_steps=n)[0]

    dec = paged.PagedDecoder(cfg, w, n_pages=6, page_rows=PR, batch=1)
    assert dec.admit(0, prompt)
    got = []
    for _ in range(n):
        logits = dec.step()
        nxt = int(np.argmax(logits[0]))
        got.append(nxt)
        dec.slots[0].token = nxt
    assert got == want
    # lifetime footprint stays bounded by the window
    assert len(dec.slots[0].pages) <= cfg.seq_len // PR


def test_inactive_slot_does_not_corrupt_active_pages(model):
    """Regression: a slot that was never admitted (or was released) still
    has its KV row written every tick and its sink rotation applied. Those
    writes must land in the dedicated parking page — not in pool page 0,
    which _alloc hands to the first admitted request. Pre-fix, slot 1's
    garbage row clobbered slot 0's sink/prompt KV and greedy decode
    diverged from the dense reference."""
    cfg, w = model
    prompt = [1, 5, 9, 2, 7]
    n = cfg.seq_len + 4 - len(prompt)  # long decode, crosses the window
    want = dense_reference(cfg, w, [prompt], n_steps=n)[0]

    dec = paged.PagedDecoder(cfg, w, n_pages=8, page_rows=PR, batch=3)
    assert dec.admit(0, prompt)        # slot 0 owns pool page 0
    assert dec.parking not in [p for s in dec.slots for p in s.pages]
    # slot 1: never admitted. slot 2: admitted then released (its pt row
    # must fall back to the parking page, not keep pointing at freed pages)
    assert dec.admit(2, [3, 3, 4])
    dec.release(2)
    assert (dec.pt[1] == dec.parking).all()
    assert (dec.pt[2] == dec.parking).all()

    got = []
    for _ in range(n):
        logits = dec.step()
        nxt = int(np.argmax(logits[0]))
        got.append(nxt)
        dec.slots[0].token = nxt
    assert got == want


def test_pool_exhaustion(model):
    cfg, w = model
    dec = paged.PagedDecoder(cfg, w, n_pages=1, page_rows=PR, batch=2)
    assert dec.admit(0, [1, 2])
    assert not dec.admit(1, [3, 4])  # graceful admission failure


def test_paged_pallas_kernel_path(model):
    """The paged decode-attention kernel (page-table BlockSpec redirect,
    interpret mode) matches the jnp paged path."""
    from calm_tpu.ops import pallas_attn, qmm

    cfg, w = model
    prompts = [[1, 5, 9, 2, 7], [3, 3, 4]]
    want = dense_reference(cfg, w, prompts, n_steps=5)

    qmm.enable_pallas(True)
    pallas_attn.set_interpret(True)
    try:
        dec = paged.PagedDecoder(cfg, w, n_pages=8, page_rows=PR, batch=2)
        for b, toks in enumerate(prompts):
            assert dec.admit(b, toks)
        got = [[] for _ in prompts]
        for _ in range(5):
            logits = dec.step()
            for b in range(len(prompts)):
                nxt = int(np.argmax(logits[b]))
                got[b].append(nxt)
                dec.slots[b].token = nxt
    finally:
        qmm.enable_pallas(False)
        pallas_attn.set_interpret(False)
    assert got == want
