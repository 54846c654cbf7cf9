"""Bandwidth-accounting / roofline model tests."""

import numpy as np

from calm_tpu.parallel.mesh import Topology
from calm_tpu.profiler import (roofline, roofline_report, stage_bytes,
                               step_bytes, step_flops)
from tests.modelgen import tiny_config

TOPO = Topology(1, "TPU v5 lite", 16, 819.0)


def test_stage_bytes_dense():
    cfg = tiny_config(dtype="fp8")
    s = stage_bytes(cfg, kv_bits=16, pos=5)
    D, Hd, Q, KV, L = cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim, cfg.n_layers
    assert s["embed"] == D  # one fp8 row
    assert s["wqkv"] == L * (Q + 2 * KV) * D
    assert s["ffn"] == L * 3 * Hd * D
    assert s["attn_read_kv"] == L * 2 * KV * 2 * 6  # kv_len=6, fp16 rows
    assert s["lm_head"] == cfg.vocab_size * D
    assert "moegate" not in s


def test_stage_bytes_moe_scales_with_active():
    cfg = tiny_config(dtype="gf4", moe=True)
    s = stage_bytes(cfg)
    # gf4 = 0.5 bytes/weight; only active experts counted
    L, Hd, D = cfg.n_layers, cfg.hidden_dim, cfg.dim
    assert s["ffn"] == L * cfg.n_experts_ac * 3 * Hd * D * 0.5
    assert s["moegate"] == L * cfg.n_experts * D * 0.5


def test_kv_len_clamps():
    cfg = tiny_config(seq_len=16)
    far = stage_bytes(cfg, pos=10**6)["attn_read_kv"]
    end = stage_bytes(cfg, pos=15)["attn_read_kv"]
    assert far == end


def test_roofline_bandwidth_bound():
    cfg = tiny_config()
    r = roofline(cfg, topo=TOPO)
    assert r.bound == "bandwidth"  # single-token decode always is
    assert r.bytes_per_token == step_bytes(cfg)
    assert r.flops_per_token == step_flops(cfg)
    a = r.achieved(r.sol_ms_per_token)
    assert abs(a["pct_sol_latency"] - 100.0) < 1e-6


def test_roofline_report_format():
    cfg = tiny_config()
    rep = roofline_report(cfg, ms_per_token=1.0, topo=TOPO)
    assert "roofline" in rep and "achieved" in rep and "ffn" in rep


def test_flops_sane():
    cfg = tiny_config()
    # >= 2 * weight-params touched per token
    f = step_flops(cfg, pos=0)
    assert f > 2 * cfg.n_layers * 3 * cfg.hidden_dim * cfg.dim
