"""Engine end-to-end: generate determinism (logits hash), perplexity harness,
prefill-vs-step consistency, chat loop, CLI."""

import io

import numpy as np
import pytest

from calm_tpu.engine import Engine, chat_template, kv_cache_bytes
from tests.modelgen import tiny_config, write_tiny_model


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("eng")
    cfg = tiny_config(dtype="fp16", seq_len=64)
    path = str(d / "m.calm")
    write_tiny_model(path, cfg, seed=1)
    return Engine(path, kv_dtype="fp16")


def test_banner(engine):
    b = engine.banner()
    assert "params" in b and "context" in b


def test_bandwidth_accounting(engine):
    # n_bandwidth excludes the embedding (only one row is read per token)
    assert 0 < engine.n_bandwidth < engine.n_bytes
    assert kv_cache_bytes(engine.cfg, 16, 0) == 2 * 2 * engine.cfg.n_layers * engine.cfg.kv_dim
    # clamps at the window size
    w = kv_cache_bytes(engine.cfg, 16, 10**9)
    assert w == 2 * 2 * engine.cfg.n_layers * engine.cfg.kv_dim * engine.cfg.seq_len


def test_generate_greedy_deterministic(engine):
    engine.reset()
    s1 = engine.generate("AB", steps=8, temperature=0.0)
    engine.reset()
    s2 = engine.generate("AB", steps=8, temperature=0.0)
    assert s1.logits_hash == s2.logits_hash
    assert s1.text == s2.text
    assert s1.tokens <= 8
    assert s1.perf_line().startswith("#")


def test_generate_prefill_equals_stepping(engine):
    """Batched prompt prefill must give the same continuation as serial
    stepping (the reference's serial prompt path, src/run.c:208)."""
    engine.reset()
    fast = engine.generate("ABCD", steps=8, temperature=0.0)

    # serial: step through prompt tokens one by one
    engine.reset()
    tok = engine.tokenizer
    toks = tok.encode("ABCD", bos=True)
    for pos in range(len(toks) - 1):
        engine.step(toks[pos], pos)
    logits = engine.step(toks[-1], len(toks) - 1)
    nxt = int(np.argmax(logits))

    fast_first = tok.encode(fast.text, bos=False)
    # first generated token matches
    assert nxt == fast_first[0] or tok.decode_piece(toks[-1], nxt).decode(
        "utf-8", errors="replace") == fast.text[: len(tok.decode_piece(toks[-1], nxt))]


def test_generate_sampled_on_device(engine):
    """temperature > 0 rides the chunked on-device sampler by default:
    same seed -> identical sequence, and the run completes without
    per-token host stepping (the reference contract: one launch per token
    for every sampling mode, src/run.c:209)."""
    engine.reset()
    s1 = engine.generate("AB", steps=8, temperature=0.8, minp=0.1, seed=7)
    engine.reset()
    s2 = engine.generate("AB", steps=8, temperature=0.8, minp=0.1, seed=7)
    assert s1.text == s2.text
    assert s1.logits_hash == s2.logits_hash
    assert 0 < s1.tokens <= 8


def test_generate_reference_sampling_path(engine):
    """reference_sampling=True keeps the bit-compatible host xorshift64*
    per-token loop."""
    engine.reset()
    s1 = engine.generate("AB", steps=6, temperature=0.9, minp=0.1, seed=3,
                         reference_sampling=True)
    engine.reset()
    s2 = engine.generate("AB", steps=6, temperature=0.9, minp=0.1, seed=3,
                         reference_sampling=True)
    assert s1.text == s2.text


def test_greedy_hash_matches_step_loop(engine):
    """The chunked greedy fast path must fingerprint the logits at the
    exact final decoded position — identical to a per-step loop (a stop
    token mid-chunk must not hash a later chunk step)."""
    from calm_tpu import model as M

    engine.reset()
    fast = engine.generate("AB", steps=8, temperature=0.0)

    engine.reset()
    toks = engine.tokenizer.encode("AB", bos=True)
    for pos in range(len(toks) - 1):
        engine.step(toks[pos], pos)
    pos = len(toks) - 1
    token = toks[-1]
    stops = (engine.tokenizer.bos_id, engine.tokenizer.eos_id,
             engine.tokenizer.eot_id)
    logits = None
    while pos < 8:  # same loop bound as Engine.generate(steps=8)
        logits = engine.step(token, pos)
        pos += 1
        nxt = int(np.argmax(logits))
        if nxt in stops:
            break
        token = nxt
    assert fast.logits_hash == M.logits_hash(logits)


def test_perplexity(engine):
    ppl, err, n = engine.perplexity("ABCABCABC", steps=8)
    assert np.isfinite(ppl) and ppl > 0
    assert err >= 0 and n > 0


def test_perplexity_chunking_consistent(engine):
    """Same text, chunk sizes differ -> different context, both finite."""
    p1, _, n1 = engine.perplexity("ABCDABCD", steps=4)
    p2, _, n2 = engine.perplexity("ABCDABCD", steps=8)
    assert n1 == n2
    assert np.isfinite(p1) and np.isfinite(p2)


def test_chat_template_fallback(engine):
    # byte vocab has no chat markers: llama2 [INST] fallback
    tpl = chat_template(engine.tokenizer, has_system=True)
    assert "[INST]" in tpl and "{sys}" in tpl
    tpl = chat_template(engine.tokenizer, has_system=False)
    assert "[INST]" in tpl and "{sys}" not in tpl


def test_chat_loop_runs(engine):
    from calm_tpu.engine import chat_loop
    engine.reset()
    out = io.StringIO()
    chat_loop(engine, system_prompt="", cli_prompt="hello",
              temperature=0.0, max_turns=1,
              read_line=lambda: "ignored",
              write=out.write)
    assert "Assistant:" in out.getvalue()


def test_cli_generate(tmp_path, capsys):
    from calm_tpu import cli
    cfg = tiny_config(dtype="fp8", seq_len=32)
    path = str(tmp_path / "m.calm")
    write_tiny_model(path, cfg, seed=2)
    cli.main([path, "-t", "0", "-n", "6", "-i", "AB"])
    cap = capsys.readouterr()
    assert "params" in cap.out
    assert "tok/s" in cap.err


def test_cli_perplexity(tmp_path, capsys):
    from calm_tpu import cli
    cfg = tiny_config(dtype="fp16", seq_len=32)
    path = str(tmp_path / "m.calm")
    write_tiny_model(path, cfg, seed=3)
    txt = tmp_path / "t.txt"
    txt.write_text("ABCDABCDABCD")
    cli.main([path, "-x", str(txt), "-n", "8"])
    cap = capsys.readouterr()
    assert "perplexity:" in cap.out


def test_chat_templates_all_families():
    """Every vocab-sniffed family renders its own template (reference:
    src/run.c:318-347)."""
    from calm_tpu.engine import _TEMPLATES, _LLAMA2, chat_template

    class FakeTok:
        def __init__(self, marker):
            self.marker = marker

        def find(self, piece):
            p = piece if isinstance(piece, bytes) else piece.encode()
            return 7 if p == self.marker else -1

    for marker, with_sys, without in _TEMPLATES:
        tok = FakeTok(marker.encode())
        assert chat_template(tok, True) == with_sys, marker
        assert chat_template(tok, False) == without, marker

    tok = FakeTok(b"<<nomatch>>")
    assert chat_template(tok, True) == _LLAMA2[0]
    assert chat_template(tok, False) == _LLAMA2[1]


def test_env_hooks_calm_tokens_poso(tmp_path, capsys, monkeypatch):
    """CALM_TOKENS dumps prompt ids; CALM_POSO offsets decode positions
    (reference: src/run.c:181-187,605-607)."""
    from calm_tpu import cli
    from tests.modelgen import tiny_config, write_tiny_model

    path = str(tmp_path / "m.calm")
    write_tiny_model(path, tiny_config(dtype="fp16"))

    monkeypatch.setenv("CALM_TOKENS", "1")
    monkeypatch.setenv("CALM_POSO", "3")
    cli.main([path, "-t", "0", "-n", "8", "-i", "hi"])
    out = capsys.readouterr().out
    assert ":" in out and "[" in out  # token id dump rendered


def test_shared_weights_same_container(tmp_path):
    """Two engines on one container share a single device weight copy
    (speculative decoding with target==draft must not double HBM)."""
    cfg = tiny_config(dtype="fp16", seq_len=32)
    path = str(tmp_path / "shared.calm")
    write_tiny_model(path, cfg, seed=4)
    a = Engine(path, context=16)
    b = Engine(path, context=32)  # different context: same weights
    assert a.weights is b.weights

    other = str(tmp_path / "other.calm")
    write_tiny_model(other, cfg, seed=5)
    c = Engine(other, context=16)
    assert c.weights is not a.weights


def test_calm_cpu_env(tmp_path):
    """CALM_CPU=1 forces the CPU backend (reference run.c:503-511) — checked
    in a subprocess since backend choice happens at jax init."""
    import subprocess
    import sys as _sys

    cfg = tiny_config(dtype="fp16", seq_len=32)
    path = str(tmp_path / "cpu.calm")
    write_tiny_model(path, cfg, seed=6)
    code = (
        "import os; os.environ['CALM_CPU']='1';"
        "import calm_tpu.cli as cli, jax;"
        f"cli.main(['{path}', '-t', '0', '-n', '4', '-i', 'hi']);"
        "assert jax.default_backend() == 'cpu', jax.default_backend()"
    )
    r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]


def test_generate_across_window_edge(tmp_path):
    """A generation crossing seq_len switches from the non-rolling chunk
    program to the rolling one mid-stream and matches the per-step loop
    (the host-side wrap branch, reference src/run.c:208 + infer.cu:677)."""
    from calm_tpu import model as M
    from calm_tpu.engine import Engine

    cfg = tiny_config(dtype="fp16", seq_len=32)
    path = str(tmp_path / "edge.calm")
    write_tiny_model(path, cfg, seed=11)
    eng = Engine(path, kv_dtype="fp16")

    eng.reset()
    fast = eng.generate("AB", steps=40, temperature=0.0)

    eng.reset()
    toks = eng.tokenizer.encode("AB", bos=True)
    for pos in range(len(toks) - 1):
        eng.step(toks[pos], pos)
    pos = len(toks) - 1
    token = toks[-1]
    stops = (eng.tokenizer.bos_id, eng.tokenizer.eos_id,
             eng.tokenizer.eot_id)
    logits = None
    while pos < 40:
        logits = eng.step(token, pos)
        pos += 1
        nxt = int(np.argmax(logits))
        if nxt in stops:
            break
        token = nxt
    assert fast.tokens == pos
    assert fast.logits_hash == M.logits_hash(logits)


def test_restart_determinism(tmp_path):
    """Failure-recovery contract: kill a generation midway, rebuild the
    engine from the container (fresh process state), replay the prompt +
    already-emitted tokens via prefill, and the continuation must produce
    the exact same tokens and final logits as the uninterrupted run.
    Weights are immutable on disk and decode state is derived, so restart
    is deterministic by construction — this pins it (SURVEY §5
    failure-detection: the reference aborts-on-error; a multi-host serving
    engine must also restart reproducibly)."""
    from calm_tpu import model as M

    cfg = tiny_config(dtype="fp16", seq_len=64)
    path = str(tmp_path / "restart.calm")
    write_tiny_model(path, cfg, seed=3)

    def greedy_tokens(eng, start_tokens, n_total, prefill: bool):
        # stop tokens ignored: determinism is the contract under test
        toks = list(start_tokens)
        if len(toks) > 1:
            if prefill:
                eng.prefill_tokens(toks[:-1])
            else:
                for p in range(len(toks) - 1):
                    eng.step(toks[p], p)
        pos, token = len(toks) - 1, toks[-1]
        logits = None
        while pos < n_total:
            logits = eng.step(token, pos)
            pos += 1
            token = int(np.argmax(logits))
            toks.append(token)
        return toks, logits

    eng_a = Engine(path, kv_dtype="fp16")
    prompt = eng_a.tokenizer.encode("AB", bos=True)
    full, logits_full = greedy_tokens(eng_a, prompt, 16, prefill=False)

    # "crash" after 6 generated tokens: a brand-new engine resumes from
    # the durable inputs only (container + token history)
    cut = len(prompt) + 6
    assert cut < len(full)

    # step-replay resume: the same per-token path -> BITWISE identical
    eng_b = Engine(path, kv_dtype="fp16")
    resumed, logits_resumed = greedy_tokens(eng_b, full[:cut], 16,
                                            prefill=False)
    assert resumed == full
    assert M.logits_hash(logits_resumed) == M.logits_hash(logits_full)

    # fast (batched-prefill) resume: KV rows are written by the prefill
    # kernel whose accumulation order differs at the ulp from stepping —
    # the TOKEN stream must still be identical (greedy is robust to it)
    eng_c = Engine(path, kv_dtype="fp16")
    resumed_fast, logits_fast = greedy_tokens(eng_c, full[:cut], 16,
                                              prefill=True)
    assert resumed_fast == full
    np.testing.assert_allclose(logits_fast, logits_full,
                               rtol=1e-3, atol=1e-3)
