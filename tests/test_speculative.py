"""Speculative decoding: output must be BIT-IDENTICAL to plain greedy decode
of the target — the draft only changes speed, never content."""

import numpy as np
import pytest

from calm_tpu.engine import Engine
from calm_tpu.speculative import speculative_generate

from tests.modelgen import tiny_config, write_tiny_model


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    target = str(d / "target.calm")
    write_tiny_model(target, tiny_config(dtype="fp16"), seed=11)
    draft_same = target
    draft_other = str(d / "draft.calm")
    write_tiny_model(draft_other, tiny_config(dtype="fp16"), seed=77)
    return target, draft_same, draft_other


PROMPT = "hello world"


def _greedy_reference(target_path):
    eng = Engine(target_path)
    return eng.generate(PROMPT, steps=24, temperature=0.0)


def test_perfect_draft_accepts_everything(models):
    target_path, draft_same, _ = models
    want = _greedy_reference(target_path)

    target = Engine(target_path)
    draft = Engine(draft_same)
    got = speculative_generate(target, draft, PROMPT, steps=24, gamma=4)
    assert got.text == want.text
    assert got.tokens == want.tokens
    # a draft that IS the target agrees on every proposal
    assert got.acceptance == 1.0


def test_mismatched_draft_still_exact(models):
    target_path, _, draft_other = models
    want = _greedy_reference(target_path)

    target = Engine(target_path)
    draft = Engine(draft_other)
    got = speculative_generate(target, draft, PROMPT, steps=24, gamma=4)
    assert got.text == want.text
    assert got.tokens == want.tokens
    # different random weights rarely agree — but output is still exact
    assert 0.0 <= got.acceptance <= 1.0


@pytest.mark.parametrize("gamma", [1, 3, 7])
def test_gamma_sweep_exact(models, gamma):
    target_path, _, draft_other = models
    want = _greedy_reference(target_path)
    target = Engine(target_path)
    draft = Engine(draft_other)
    got = speculative_generate(target, draft, PROMPT, steps=24, gamma=gamma)
    assert got.text == want.text


def test_window_edge_fallback(models):
    """Speculation near the rolling-window edge falls back to stepping and
    still matches plain greedy (which crosses the window via sinks)."""
    target_path, _, draft_other = models
    eng = Engine(target_path)
    want = eng.generate(PROMPT, steps=eng.cfg.seq_len - 2, temperature=0.0)

    target = Engine(target_path)
    draft = Engine(draft_other)
    got = speculative_generate(target, draft, PROMPT,
                               steps=target.cfg.seq_len - 2, gamma=4)
    assert got.text == want.text


def test_sampled_speculative_runs_and_differs_by_seed(models):
    """Sampled speculative decoding: deterministic per seed, varies across
    seeds, still stops/streams correctly."""
    target_path, _, draft_other = models

    def run(seed):
        target = Engine(target_path)
        draft = Engine(draft_other)
        return speculative_generate(target, draft, PROMPT, steps=24,
                                    gamma=4, temperature=0.9, minp=0.05,
                                    seed=seed)

    a1, a2, b = run(3), run(3), run(4)
    assert a1.text == a2.text           # deterministic per seed
    assert a1.text != b.text or a1.tokens != b.tokens  # seeds differ (w.h.p.)


def test_sampled_speculative_matches_target_distribution(models):
    """One speculative-sampled step reproduces the target's min-p
    distribution (Leviathan exactness), checked empirically."""
    target_path, _, draft_other = models
    temperature, minp = 1.0, 0.02

    # the target's true next-token distribution after the prompt
    eng = Engine(target_path)
    toks = eng.tokenizer.encode(PROMPT, bos=True)
    logits = None
    for p, t in enumerate(toks):
        logits = eng.step(t, p)
    from calm_tpu.speculative import _minp_probs
    p_true = _minp_probs(logits, temperature, minp)

    counts = np.zeros_like(p_true)
    trials = 300
    target = Engine(target_path)
    draft = Engine(draft_other)
    for seed in range(trials):
        target.reset()
        draft.reset()
        st = speculative_generate(target, draft, PROMPT, steps=len(toks),
                                  gamma=2, temperature=temperature,
                                  minp=minp, seed=seed + 1)
        counts[st.ids[0]] += 1
    emp = counts / counts.sum()
    support = p_true > 0.01
    assert np.abs(emp[support] - p_true[support]).max() < 0.12


# -- draft-tree speculation ---------------------------------------------------


def test_tree_perfect_draft_full_acceptance(models):
    from calm_tpu.speculative import tree_speculative_generate
    target_path, draft_same, _ = models
    want = _greedy_reference(target_path)

    target = Engine(target_path)
    draft = Engine(draft_same)
    got = tree_speculative_generate(target, draft, PROMPT, steps=24,
                                    k=2, m=4)
    assert got.text == want.text
    assert got.tokens == want.tokens
    # (logits_hash is NOT asserted: the batched verify forward legally
    # reorders accumulations vs the T=1 step — argmax chain is the contract,
    # same as the linear tests above)
    # the draft IS the target: lane 0 (its own argmax chain) always wins
    assert got.acceptance == 1.0


def test_tree_mismatched_draft_still_exact(models):
    from calm_tpu.speculative import tree_speculative_generate
    target_path, _, draft_other = models
    want = _greedy_reference(target_path)

    target = Engine(target_path)
    draft = Engine(draft_other)
    got = tree_speculative_generate(target, draft, PROMPT, steps=24,
                                    k=3, m=4)
    # greedy-exactness: the tree changes speed, never content
    assert got.text == want.text
    assert got.tokens == want.tokens


@pytest.mark.parametrize("k,m", [(1, 3), (2, 2), (4, 5)])
def test_tree_shape_sweep_exact(models, k, m):
    from calm_tpu.speculative import tree_speculative_generate
    target_path, _, draft_other = models
    want = _greedy_reference(target_path)
    got = tree_speculative_generate(Engine(target_path), Engine(draft_other),
                                    PROMPT, steps=24, k=k, m=m)
    assert got.text == want.text


def test_tree_acceptance_at_least_linear(models):
    """The tree's whole point: when the draft's top-1 misses but its top-k
    covers the target's argmax, a linear chain dies at depth 0 while the
    tree descends a sibling lane. A gf4-quantized copy of the target is a
    realistic correlated draft; over the same prompts the k=3 tree must
    accept at least as many draft tokens as the k=1 chain."""
    from calm_tpu.speculative import tree_speculative_generate
    target_path, _, _ = models

    # correlated draft: the SAME weights (same seed, same geometry) gf4-
    # quantized — the realistic speculation setup, where the draft's top-k
    # usually covers the target's argmax even when its top-1 misses
    import os
    d = os.path.dirname(target_path)
    draft_q = os.path.join(d, "draft_gf4.calm")
    if not os.path.exists(draft_q):
        write_tiny_model(draft_q, tiny_config(dtype="gf4"), seed=11)
    accs = {}
    for kk in (1, 3):
        got = tree_speculative_generate(Engine(target_path),
                                        Engine(draft_q),
                                        PROMPT, steps=32, k=kk, m=4)
        accs[kk] = got.acceptance
    # the wider tree must accept at least as much, and the run must have
    # actually exercised acceptance — equality at zero would pass the
    # inequality while testing nothing
    assert accs[3] >= accs[1]
    assert accs[3] > 0.0, accs
