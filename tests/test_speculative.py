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
