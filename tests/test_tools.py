"""Offline tools run end-to-end (CLI surface smoke + output sanity)."""

import json
import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


def test_sol_roofline(capsys):
    import sol
    sol.main(["--model", "mistral7b", "--dtype", "fp8", "--chip", "TPU v5e",
              "-v"])
    out = capsys.readouterr().out
    assert "SoL" in out and "bandwidth-bound" in out
    assert "ffn" in out  # stage breakdown present


def test_sol_ctx_sweep(capsys):
    import sol
    sol.main(["--sweep-ctx", "--model", "llama3-8b", "--dtype", "gf4"])
    out = capsys.readouterr().out
    assert out.count("SoL") == 7  # 2k..128k


def test_chart_table(tmp_path, capsys):
    import chart
    p = tmp_path / "r.jsonl"
    p.write_text(json.dumps({"metric": "m", "value": 50.0,
                             "unit": "%", "vs_baseline": 0.5}) + "\n")
    chart.main([str(p), "-o", str(tmp_path / "out.png")])
    out = capsys.readouterr().out
    assert "m" in out and "50.00" in out


def test_act_study(capsys):
    import act
    act.main()
    out = capsys.readouterr().out
    assert "beta" in out


def test_quality_tool(capsys):
    import importlib
    quality = importlib.import_module("quality")
    quality.main(["--dim", "64", "--layers", "2"])
    out = capsys.readouterr().out
    assert "SNR" in out and "argmax agreement" in out
    # fp16 must be far more accurate than gf4
    lines = [l for l in out.splitlines() if "bpw" in l]
    snrs = {l.split()[0]: float(l.split("SNR")[1].split("dB")[0])
            for l in lines}
    # e4m3+scale carries one more mantissa bit than e5m2
    assert snrs["fp16"] > snrs["fp8e4"] > snrs["fp8"] > snrs["gf4"]


def test_pplx_corpus_exists():
    path = os.path.join(TOOLS, "pplx.txt")
    text = open(path).read()
    assert len(text) > 4000  # a real corpus, not a stub
    assert "bandwidth" in text


def test_sol_scaling_report(capsys):
    import importlib
    sol = importlib.import_module("sol")
    sol.main(["--scaling"])
    out = capsys.readouterr().out
    assert "scaling efficiency" in out and "tp=8" in out
    assert "BASELINE target" in out
