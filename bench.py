"""Decode-throughput benchmark on the local TPU chip.

Measures single-stream greedy decode tokens/s and achieved HBM bandwidth on
a synthetic Mistral-7B (weight values are irrelevant for bandwidth-bound
decode), following the reference measurement protocol (README.md:86,111):
32-token runs at an early context offset and near the end of the window,
bandwidth computed from weight bytes/token + KV bytes at the position
(reference: src/run.c:211-212,249-253).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = % of chip HBM speed-of-light sustained (the reference sustains ~92%
of RTX 4090 peak on the same metric, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

if os.environ.get("CALM_CPU", "0") == "1":
    # debug/CI hook, same as the CLI: the axon plugin ignores
    # JAX_PLATFORMS, force via config BEFORE any backend init
    jax.config.update("jax_platforms", "cpu")

from calm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp

from calm_tpu.config import ModelConfig
from calm_tpu import model as M
from calm_tpu.engine import kv_cache_bytes
from calm_tpu.parallel.mesh import detect_topology
from calm_tpu.utils.synth import synth_weights, weight_bytes

SHAPES = {
    # dim, hidden, head_dim, layers, heads, kv_heads, vocab, experts/active
    "mistral7b": dict(dim=4096, hidden_dim=14336, head_dim=128, n_layers=32,
                      n_heads=32, n_kv_heads=8, vocab_size=32000),
    "llama3-8b": dict(dim=4096, hidden_dim=14336, head_dim=128, n_layers=32,
                      n_heads=32, n_kv_heads=8, vocab_size=128256),
    "llama2-7b": dict(dim=4096, hidden_dim=11008, head_dim=128, n_layers=32,
                      n_heads=32, n_kv_heads=32, vocab_size=32000),
    # 13B fp8 (~12.2 GiB) fits the 16 GiB chip with --kv fp8 (the MHA cache
    # at 4096 ctx is 3.3 GiB in bf16, 1.7 in fp8)
    "llama2-13b": dict(dim=5120, hidden_dim=13824, head_dim=128, n_layers=40,
                       n_heads=40, n_kv_heads=40, vocab_size=32000),
    "mixtral8x7b": dict(dim=4096, hidden_dim=14336, head_dim=128, n_layers=32,
                        n_heads=32, n_kv_heads=8, vocab_size=32000,
                        n_experts=8, n_experts_ac=2),
    # single-chip MoE proxy: Mixtral geometry at 4 experts (8x7B gf4 is
    # ~23 GB and needs >=2 chips; EP sharding is exercised by the mesh tests
    # and __graft_entry__.dryrun_multichip)
    "mixtral4x7b": dict(dim=4096, hidden_dim=14336, head_dim=128, n_layers=32,
                        n_heads=32, n_kv_heads=8, vocab_size=32000,
                        n_experts=4, n_experts_ac=2),
    "tiny": dict(dim=256, hidden_dim=512, head_dim=64, n_layers=2,
                 n_heads=4, n_kv_heads=2, vocab_size=2048),
}


def bench_decode(cfg: ModelConfig, kv_dtype, steps: int, pos0: int,
                 repeats: int = 5, batch: int = 1, passes: int = 3,
                 max_passes: int = 6, spread_gate: float = 2.0):
    """Marginal per-step decode time via the slope method: time scans of
    ``steps`` and ``2*steps`` tokens and difference them, so the per-program
    launch cost cancels (through the axon tunnel a launch is ~27 ms of RPC
    — 0.8 ms/token of pure measurement artifact at 32 steps; on a
    chip-local deployment launches are microseconds). Both windows start at
    pos0, matching the reference's 32-token-window protocol
    (README.md:86,111).

    Variance defense (VERDICT r4 weak #1: single-shot captures drifted
    657-675 GB/s across tunnel sessions while the code improved): the whole
    slope measurement runs ``passes`` independent times — each pass takes
    min-of-``repeats`` for both windows, so a pass is a full measurement,
    not one sample — and the reported slope is the MEDIAN of passes. If the
    pass spread ((max-min)/median) exceeds ``spread_gate`` percent, extra
    passes run (up to ``max_passes``) and the spread is reported either
    way so a noisy session is visible in the artifact instead of silently
    becoming the official number. Compile happens once; extra passes cost
    only timed runs.

    Returns (median seconds for ``steps`` tokens, spread_pct, tokens)."""
    import statistics

    import numpy as np

    # gf4 MoE: fill the fused layouts directly — the on-device massage's
    # one-weight-stack transient OOMs the chip at Mixtral geometry
    fused = cfg.dtype == "gf4" and cfg.n_experts and cfg.hidden_dim % 8 == 0
    w = M.fuse_gf4_weights(synth_weights(cfg, fused=bool(fused)), cfg)
    jax.block_until_ready(w)

    compiled = set()

    def run(n):
        first = n not in compiled  # first call at this length compiles
        compiled.add(n)
        best = None
        toks = None
        for r in range(repeats + (1 if first else 0)):
            cache = M.KVCache.create(cfg, batch, kv_dtype)
            token = jnp.zeros((batch,), jnp.int32)
            start = jnp.full((batch,), pos0, jnp.int32)
            t0 = time.perf_counter()
            toks, cache, _ = M.decode_scan(
                cfg, w, token, start, cache, n,
                rolling=pos0 + n >= cfg.seq_len)
            # force a tiny device->host copy: on the axon platform
            # block_until_ready returns before execution finishes
            toks = np.asarray(toks)
            dt = time.perf_counter() - t0
            if not (first and r == 0):  # drop the compile run
                best = dt if best is None else min(best, dt)
            del cache
        return best, toks

    slopes = []
    toks = None
    while len(slopes) < passes or (len(slopes) < max_passes
                                   and _spread_pct(slopes) > spread_gate):
        t1, toks = run(steps)
        t2, _ = run(2 * steps)
        slopes.append(max(t2 - t1, 1e-9))

    spread = _spread_pct(slopes)
    if spread > spread_gate:
        print(f"# WARNING: slope spread {spread:.1f}% > {spread_gate:.0f}% "
              f"after {len(slopes)} passes — noisy tunnel session, treat "
              "the captured number with suspicion "
              f"(passes: {[round(s * 1000, 2) for s in slopes]} ms)",
              file=sys.stderr)
    return statistics.median(slopes), spread, toks


def _spread_pct(slopes):
    if len(slopes) < 2:
        return float("inf")
    import statistics
    med = statistics.median(slopes)
    return 100.0 * (max(slopes) - min(slopes)) / med


def bench_prefill(cfg: ModelConfig, kv_dtype, T: int, repeats: int = 3):
    """Marginal prefill chunk time via the same slope method as decode:
    time 1-chunk and 2-chunk prompt ingestion (chunk = (1, T) tokens) and
    difference, so compile/launch cancels and the measured chunk is the
    SECOND one (attending over T prior context — matching the historical
    chunked-prefill methodology in docs/PERF_NOTES.md). Returns seconds
    for one T-token chunk."""
    import numpy as np

    fused = cfg.dtype == "gf4" and cfg.n_experts and cfg.hidden_dim % 8 == 0
    w = M.fuse_gf4_weights(synth_weights(cfg, fused=bool(fused)), cfg)
    jax.block_until_ready(w)
    tokens = jnp.zeros((1, T), jnp.int32)

    def run(n_chunks):
        best = None
        for r in range(repeats + 1):
            cache = M.KVCache.create(cfg, 1, kv_dtype)
            t0 = time.perf_counter()
            logits = None
            for c in range(n_chunks):
                pos0 = jnp.full((1,), c * T, jnp.int32)
                logits, cache = M.prefill(cfg, w, tokens, pos0, cache)
            np.asarray(logits)  # fence (block_until_ready lies on axon)
            dt = time.perf_counter() - t0
            if r > 0:
                best = dt if best is None else min(best, dt)
            del cache
        return best

    t1 = run(1)
    t2 = run(2)
    return max(t2 - t1, 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mistral7b", choices=sorted(SHAPES))
    ap.add_argument("--dtype", default="fp8", choices=["fp16", "fp8", "fp8e4", "gf4"])
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "fp16", "fp8"])
    ap.add_argument("--batch", type=int, default=1,
                    help="decode slots (batched serving throughput; the "
                         "weight stream amortizes across slots)")
    ap.add_argument("--prefill", type=int, default=0, metavar="T",
                    help="measure prompt-ingestion tok/s for a T-token "
                         "chunk instead of decode (prefill is MXU/compute-"
                         "bound, reported vs the bf16 matmul roofline)")
    args = ap.parse_args(argv)

    import os

    from calm_tpu.ops import qmm
    qmm.enable_pallas(jax.default_backend() == "tpu")
    if os.environ.get("CALM_PRECISE", "0") == "1":
        qmm.enable_precise(True)

    topo = detect_topology()
    shape = dict(SHAPES[args.model])
    cfg = ModelConfig(**shape, seq_len=args.ctx, rope_theta=10000.0,
                      norm_ln=False, dtype=args.dtype,
                      rotary_dim=shape["head_dim"])

    kv_dtype = {"bf16": jnp.bfloat16, "fp16": jnp.float16,
                "fp8": jnp.float8_e5m2}[args.kv]
    kv_bits = 8 if args.kv == "fp8" else 16
    total_bytes, bw_bytes = weight_bytes(cfg)

    if args.prefill:
        if args.ctx < 2 * args.prefill:
            ap.error("--ctx must be >= 2*T so the two-chunk slope fits")
        T = args.prefill
        secs = bench_prefill(cfg, kv_dtype, T)
        tok_s = T / secs
        # prefill is compute-bound: report vs the bf16 MXU roofline.
        # flops/token ~= 2 * active weight params, head excluded (logits
        # once per chunk); attention flops are <1% at these contexts.
        bits = {"fp16": 16, "fp8": 8, "fp8e4": 8, "gf4": 4}[cfg.dtype]
        head_bytes = cfg.vocab_size * cfg.dim * bits // 8
        params_act = (bw_bytes - head_bytes) * 8 // bits
        achieved_tf = 2 * params_act * tok_s / 1e12
        peak_tf = {"TPU v4": 275.0, "TPU v5 lite": 197.0,
                   "TPU v5p": 459.0, "TPU v6 lite": 918.0}.get(
                       topo.device_kind)
        print(f"# prefill T={T}: {tok_s:.0f} tok/s, "
              f"{secs * 1000:.1f} ms/chunk, {achieved_tf:.1f} TFLOP/s"
              + (f" = {100 * achieved_tf / peak_tf:.1f}% of bf16 MXU peak"
                 if peak_tf else ""), file=sys.stderr)
        out = {"metric": f"prefill_tok_s_{args.model}_{args.dtype}",
               "value": round(tok_s, 1), "unit": "tok/s"}
        if peak_tf:
            out["pct_mxu_peak"] = round(100 * achieved_tf / peak_tf, 2)
        print(json.dumps(out))
        return

    if args.ctx < 2 * args.steps + 1:
        ap.error(f"--ctx must be >= 2*steps+1 ({2 * args.steps + 1}) so the "
                 "last32 slope window fits inside the context")

    results = {}
    # the slope covers tokens at positions [pos0+steps, pos0+2*steps): put
    # that marginal window at the protocol's early/late positions (clamped
    # so tiny contexts never feed negative positions into decode_indices)
    for name, pos0 in (("first32",
                        max(0, min(2000, args.ctx // 2) - args.steps)),
                       ("last32", args.ctx - 2 * args.steps - 1)):
        secs, spread, _ = bench_decode(cfg, kv_dtype, args.steps, pos0,
                                       batch=args.batch)
        read = sum(bw_bytes + args.batch * kv_cache_bytes(
            cfg, kv_bits, pos0 + args.steps + i) for i in range(args.steps))
        results[name] = dict(
            tok_s=args.batch * args.steps / secs,
            gb_s=read / 1e9 / secs,
            ms_tok=secs * 1000 / args.steps,
            spread_pct=spread,
        )
        print(f"# {name}: {results[name]['tok_s']:.1f} tok/s"
              f"{f' (batch {args.batch})' if args.batch > 1 else ''}, "
              f"{results[name]['gb_s']:.1f} GB/s, "
              f"{results[name]['ms_tok']:.2f} ms/step "
              f"(median of passes, spread {spread:.1f}%)", file=sys.stderr)

    gb_s = results["first32"]["gb_s"]
    pct_sol = 100.0 * gb_s / topo.hbm_gbps_per_chip
    print(f"# chip: {topo.device_kind} (SoL {topo.hbm_gbps_per_chip} GB/s); "
          f"model {args.model} {args.dtype} ({total_bytes / 2**30:.1f} GiB)",
          file=sys.stderr)
    # attainable ceiling, round-4 re-derivation (tools/dma_ceiling.py): a
    # pure-DMA Pallas kernel streaming a MODEL-SIZED (3.2 GB) buffer
    # measures ~733 GB/s on v5e; small hot buffers reach 758-878. The old
    # 690 figure (one 32 MB shape) understated the silicon — report the
    # model-stream number so the headline gap is honest (docs/PERF_NOTES.md
    # "Chip reality", VERDICT r3 weak #1).
    attainable = 733.0 if topo.device_kind == "TPU v5 lite" else None
    if attainable:
        print(f"# vs measured-attainable ceiling (~{attainable:.0f} GB/s): "
              f"{100.0 * gb_s / attainable:.1f}%", file=sys.stderr)

    # reference sustains ~92% of peak HBM bandwidth on this metric (BASELINE.md)
    out = {
        "metric": f"pct_hbm_sol_{args.model}_{args.dtype}_decode",
        "value": round(pct_sol, 2),
        "unit": "% of HBM speed-of-light",
        "vs_baseline": round(pct_sol / 92.0, 4),
        "spread_pct": round(results["first32"]["spread_pct"], 2),
        "gb_s": round(gb_s, 1),
    }
    if attainable:
        out["pct_of_attainable_ceiling"] = round(100.0 * gb_s / attainable, 2)
        out["attainable_ceiling_gbps"] = attainable
    print(json.dumps(out))


if __name__ == "__main__":
    main()
