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


def test_parse_trace_and_table(tmp_path):
    """parse_trace aggregates device events from a real captured trace and
    trace_table formats the cudaprof-style report (count/mean/total/share).
    Runs on the CPU backend — the parser only needs the Chrome-trace files
    jax.profiler writes."""
    import jax
    import jax.numpy as jnp

    from calm_tpu.profiler import parse_trace, trace, trace_table

    x = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda a: a @ a + 1.0)
    np.asarray(f(x))  # compile outside the trace
    with trace(str(tmp_path / "tr")):
        for _ in range(3):
            np.asarray(f(x))

    stats = parse_trace(str(tmp_path / "tr"))
    assert stats, "no events parsed from the trace"
    assert all(s.count >= 1 and s.total_us >= 0 for s in stats)
    # sorted by total time descending
    totals = [s.total_us for s in stats]
    assert totals == sorted(totals, reverse=True)

    table = trace_table(str(tmp_path / "tr"), tiny_config(), steps=3,
                        topo=TOPO)
    assert "per-op table" in table
    assert "calls" in table and "share" in table
    # v2 columns: per-unit utilization + the limiting unit
    assert "HBM%" in table and "MXU%" in table and "VPU%" in table


def test_op_stage_tags():
    """Explicit ``__<stage>`` kernel-name tags and known kernel base names
    resolve to stage labels; unknown ops resolve to none."""
    from calm_tpu.profiler import _op_stage

    assert _op_stage("_qmm__wqkv.18") == ("wqkv", "gf4")
    assert _op_stage("_qmm__wo.3") == ("wo", "gf4")
    assert _op_stage("_qmm.18") == ("gf4 matvec", "gf4")
    assert _op_stage("_gf4_ffn.5") == ("gf4 fused ffn", "gf4")
    assert _op_stage("_decode_attention.7")[1] is None
    assert _op_stage("fusion.123") == (None, None)


def test_trace_table_utilization_math(tmp_path):
    """Synthetic trace: a 1 ms op moving 600 MB with known flops /
    transcendentals produces the expected HBM/MXU/VPU percentages and
    limiter tag against the v5e peaks."""
    import gzip
    import json
    import os

    from calm_tpu.profiler import trace_table

    run = tmp_path / "tr" / "plugins" / "profile" / "run1"
    os.makedirs(run)
    events = [
        {"ph": "M", "name": "process_name", "pid": 7,
         "args": {"name": "/device:TPU:0"}},
        # gf4-tagged kernel: 600 MB in 1 ms = 600 GB/s = 73.3% of 819;
        # VPU: 10 ops/byte * 600 MB = 6e9 ops in 1 ms = 6e12 ops/s = 98.4%
        # of 6.1e12 -> vpu-bound
        {"ph": "X", "pid": 7, "name": "_qmm__wqkv.1", "ts": 0, "dur": 1000,
         "args": {"bytes_accessed": 600_000_000, "flops": 1_000_000}},
        # untagged op: 500 MB in 1 ms, flops 100e9 in 1 ms = 100e12 = 50.8%
        # of 197e12 MXU vs 61% HBM -> hbm-bound
        {"ph": "X", "pid": 7, "name": "fusion.9", "ts": 2000, "dur": 1000,
         "args": {"bytes_accessed": 500_000_000, "flops": 100_000_000_000}},
    ]
    with gzip.open(run / "x.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    table = trace_table(str(tmp_path / "tr"), steps=1, topo=TOPO)
    lines = {l.split()[1]: l for l in table.splitlines() if "_qmm" in l
             or "fusion" in l}
    q = lines["_qmm__wqkv.1"]
    assert "vpu (wqkv)" in q and " 600 " in q
    f = lines["fusion.9"]
    assert f.rstrip().endswith("hbm") and " 50.8 " in f
