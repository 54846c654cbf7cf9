"""Speed-of-light roofline calculator for TPU decode.

CLI re-derivation of the reference's analytic notebook (tools/sol.ipynb):
per (model, chip) it computes bytes/token and flops/token from the model
geometry, takes latency >= max(bytes/bw, flops/peak), and prints the SoL
tokens/s plus where the bytes go — the number the engine's achieved GB/s is
judged against (same methodology as the per-sequence perf line,
reference src/run.c:249-253).

Usage:
  python tools/sol.py                         # preset sweep on all chips
  python tools/sol.py --model mistral7b --dtype fp8 --ctx 8192 --batch 4
  python tools/sol.py --sweep-ctx             # context sweep table
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from calm_tpu.config import ModelConfig  # noqa: E402
from calm_tpu.parallel.mesh import CHIP_TABLE, Topology  # noqa: E402
from calm_tpu.profiler import roofline, stage_bytes  # noqa: E402

PRESETS = {
    "tinyllama": dict(dim=2048, hidden_dim=5632, head_dim=64, n_layers=22,
                      n_heads=32, n_kv_heads=4, vocab_size=32000),
    "llama2-7b": dict(dim=4096, hidden_dim=11008, head_dim=128, n_layers=32,
                      n_heads=32, n_kv_heads=32, vocab_size=32000),
    "mistral7b": dict(dim=4096, hidden_dim=14336, head_dim=128, n_layers=32,
                      n_heads=32, n_kv_heads=8, vocab_size=32000),
    "llama3-8b": dict(dim=4096, hidden_dim=14336, head_dim=128, n_layers=32,
                      n_heads=32, n_kv_heads=8, vocab_size=128256),
    "llama2-13b": dict(dim=5120, hidden_dim=13824, head_dim=128, n_layers=40,
                       n_heads=40, n_kv_heads=40, vocab_size=32000),
    "yi-34b": dict(dim=7168, hidden_dim=20480, head_dim=128, n_layers=60,
                   n_heads=56, n_kv_heads=8, vocab_size=64000),
    "mixtral8x7b": dict(dim=4096, hidden_dim=14336, head_dim=128, n_layers=32,
                        n_heads=32, n_kv_heads=8, vocab_size=32000,
                        n_experts=8, n_experts_ac=2),
}


def make_cfg(name: str, dtype: str, ctx: int) -> ModelConfig:
    shape = dict(PRESETS[name])
    return ModelConfig(**shape, seq_len=ctx, rope_theta=10000.0,
                       norm_ln=False, dtype=dtype,
                       rotary_dim=shape["head_dim"])


def topo_for(chip: str) -> Topology:
    gb, gbps = CHIP_TABLE[chip]
    return Topology(1, chip, gb, gbps)


def report_one(model: str, dtype: str, ctx: int, pos: int, kv_bits: int,
               chip: str, verbose: bool):
    cfg = make_cfg(model, dtype, ctx)
    r = roofline(cfg, kv_bits, pos, topo_for(chip))
    tok_s = 1000.0 / r.sol_ms_per_token
    line = (f"{model:>12} {dtype:>4} ctx={ctx:<6} pos={pos:<6} {chip:>12}: "
            f"SoL {tok_s:7.1f} tok/s  ({r.bytes_per_token / 1e9:.2f} GB/tok, "
            f"{r.bound}-bound)")
    print(line)
    if verbose:
        stages = stage_bytes(cfg, kv_bits, pos)
        total = sum(stages.values())
        for name, b in sorted(stages.items(), key=lambda kv: -kv[1]):
            print(f"    {name:<14} {b / 1e6:9.2f} MB/tok ({100 * b / total:4.1f}%)")


# published aggregate inter-chip bandwidth per chip, GB/s (one direction).
# ICI: within a slice; DCN: the per-host data-center link for multi-slice.
ICI_GBPS = {"TPU v5e": 200.0, "TPU v5p": 600.0, "TPU v6e": 450.0}
DCN_GBPS = 25.0   # ~200 Gbit/s NIC per host, conservative
COLL_LAT_US = {"ici": 2.0, "dcn": 25.0}  # per-collective launch+hop latency


def scaling_report(model: str, dtype: str, ctx: int, pos: int, kv_bits: int,
                   chip: str):
    """Analytic decode scaling over tp (ICI) and a 2-host dp/ep split (DCN).

    This environment has one physical chip, so multi-chip efficiency is
    MODELED, not measured: per-chip time = max(local bytes / HBM bw, flops)
    plus per-layer collective cost 2 * psum(activation) with the latency
    term dominating at decode sizes. The BASELINE north star (>=80%
    tokens/s scaling efficiency to 2 hosts on gf4 Mixtral) is evaluated
    under this model; real-slice numbers must replace it when hardware is
    available (docs/ROADMAP.md).
    """
    cfg = make_cfg(model, dtype, ctx)
    topo = topo_for(chip)
    r1 = roofline(cfg, kv_bits, pos, topo)
    t1 = r1.sol_ms_per_token
    act_bytes = cfg.dim * 4  # f32 activation row psummed per residual close
    print(f"# analytic decode scaling — {model} {dtype} ctx={ctx} on {chip}"
          f" (1-chip SoL {1000.0 / t1:.1f} tok/s)")

    for n in (2, 4, 8):
        # tp over ICI: weights+kv shard n ways; 2 psums per layer
        coll = 2 * cfg.n_layers * (
            COLL_LAT_US["ici"] / 1e3
            + act_bytes * (n - 1) / n / (ICI_GBPS[chip] * 1e6))
        tn = t1 / n + coll
        eff = t1 / (n * tn) * 100.0
        # rs_ag (plan.rs_ag): the all-reduce splits into reduce-scatter +
        # all-gather, each moving (n-1)/n of the activation — same total
        # ring bytes, but the scheduler can hide one phase under the
        # neighboring matvec's HBM stream; model the bound where the
        # all-gather overlaps fully and only the reduce-scatter (plus one
        # latency) stays exposed
        coll_ov = 2 * cfg.n_layers * (
            COLL_LAT_US["ici"] / 1e3
            + 0.5 * act_bytes * (n - 1) / n / (ICI_GBPS[chip] * 1e6))
        tn_ov = t1 / n + coll_ov
        eff_ov = t1 / (n * tn_ov) * 100.0
        print(f"  tp={n} (ICI): {1000.0 / tn:7.1f} tok/s/stream, "
              f"scaling efficiency {eff:5.1f}% "
              f"(rs_ag overlap bound: {1000.0 / tn_ov:.1f} tok/s, "
              f"{eff_ov:.1f}%)")

    # 2 hosts over DCN: dp (independent streams — embarrassingly parallel,
    # aggregate tokens/s doubles) and ep for MoE (routing psum crosses DCN)
    if cfg.n_experts:
        coll = cfg.n_layers * (COLL_LAT_US["dcn"] / 1e3
                               + act_bytes / (DCN_GBPS * 1e6))
        # ep=2: each host holds E/2 experts; active-expert bytes per host
        # halve only when both active experts land on one host — worst case
        # keeps all active bytes local-bound, best case halves; use E/2
        t2 = t1 / 2 + coll
        eff = t1 / (2 * t2) * 100.0
        tgt = "meets" if eff >= 80.0 else "MISSES"
        print(f"  ep=2 x 1 host each (DCN): {1000.0 / t2:7.1f} tok/s/stream, "
              f"efficiency {eff:5.1f}% — {tgt} the >=80% BASELINE target "
              f"(analytic)")
    print(f"  dp=2 hosts (DCN): 2x aggregate tokens/s at unchanged latency "
          f"(no per-layer collectives; efficiency ~100%)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(PRESETS), default=None)
    ap.add_argument("--dtype", choices=["fp16", "fp8", "fp8e4", "gf4"], default="fp8")
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--pos", type=int, default=None,
                    help="decode position (default ctx-1)")
    ap.add_argument("--kv-bits", type=int, default=16, choices=[8, 16])
    ap.add_argument("--chip", choices=sorted(k for k in CHIP_TABLE if k != "cpu"),
                    default=None)
    ap.add_argument("--sweep-ctx", action="store_true",
                    help="sweep context 2k..128k for one model/chip")
    ap.add_argument("--scaling", action="store_true",
                    help="analytic tp/ep/dp scaling-efficiency report")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="per-stage byte breakdown")
    args = ap.parse_args(argv)

    pos = args.pos if args.pos is not None else args.ctx - 1
    chips = [args.chip] if args.chip else ["TPU v5e", "TPU v5p", "TPU v6e"]
    models = [args.model] if args.model else sorted(PRESETS)

    if args.scaling:
        scaling_report(args.model or "mixtral8x7b",
                       args.dtype if args.model else "gf4",
                       args.ctx, pos, args.kv_bits, args.chip or "TPU v5e")
        return

    if args.sweep_ctx:
        model = args.model or "mistral7b"
        chip = args.chip or "TPU v5e"
        for ctx in (2048, 4096, 8192, 16384, 32768, 65536, 131072):
            kv_bits = 8 if ctx > 4096 else args.kv_bits
            report_one(model, args.dtype, ctx, ctx - 1, kv_bits, chip,
                       args.verbose)
        return

    for chip in chips:
        for model in models:
            report_one(model, args.dtype, args.ctx, pos, args.kv_bits, chip,
                       args.verbose)


if __name__ == "__main__":
    main()
