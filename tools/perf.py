"""Profile a decode run: jax.profiler trace + achieved-vs-SoL report.

The TPU equivalent of the reference's CUPTI injection profiler
(tools/cudaprof.cu + PROF_TOKEN byte accounting): measures a real decode,
compares achieved HBM bandwidth against the analytic per-stage bytes model
(calm_tpu/profiler.py), and optionally writes a TensorBoard-loadable trace.

Usage:
  python tools/perf.py model.calm [-n 32] [--trace /tmp/trace]
  python tools/perf.py --synthetic mistral7b --dtype fp8   # no model file
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("CALM_CPU", "0") == "1":
    # the axon plugin ignores JAX_PLATFORMS; force pre-init
    jax.config.update("jax_platforms", "cpu")

from calm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from calm_tpu import model as M  # noqa: E402
from calm_tpu.config import ModelConfig  # noqa: E402
from calm_tpu.profiler import roofline_report  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", nargs="?")
    ap.add_argument("--synthetic", default=None,
                    help="bench.py shape name instead of a checkpoint")
    ap.add_argument("--dtype", default="fp8", choices=["fp16", "fp8", "fp8e4", "gf4"])
    ap.add_argument("-n", dest="steps", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--pos", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=1,
                    help="decode slots (attribute batched-serving glue)")
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--prefill", type=int, default=0, metavar="T",
                    help="trace a T-token prefill chunk instead of decode")
    args = ap.parse_args(argv)

    from calm_tpu.ops import qmm
    qmm.enable_pallas(jax.default_backend() == "tpu")

    if args.synthetic:
        from bench import SHAPES
        from calm_tpu.utils.synth import synth_weights
        shape = dict(SHAPES[args.synthetic])
        cfg = ModelConfig(**shape, seq_len=args.ctx, rope_theta=10000.0,
                          norm_ln=False, dtype=args.dtype,
                          rotary_dim=shape["head_dim"])
        w = synth_weights(cfg)
    elif args.checkpoint:
        from calm_tpu.container import TensorFile
        tf = TensorFile(args.checkpoint)
        cfg = ModelConfig.from_metadata(tf.metadata, args.ctx)
        w = M.load_weights(tf, cfg)
    else:
        ap.error("need a checkpoint or --synthetic <shape>")
    w = M.fuse_gf4_weights(w, cfg)

    kv_dtype = jnp.float8_e5m2 if cfg.seq_len > 4096 else jnp.bfloat16
    kv_bits = 8 if kv_dtype == jnp.float8_e5m2 else 16

    if args.prefill:
        T = args.prefill

        def run():
            cache = M.KVCache.create(cfg, args.batch, kv_dtype)
            tokens = jnp.zeros((args.batch, T), jnp.int32)
            pos0 = jnp.zeros((args.batch,), jnp.int32)
            t0 = time.perf_counter()
            logits, cache2 = M.prefill(cfg, w, tokens, pos0, cache,
                                       logits_mode="last")
            np.asarray(logits)
            return time.perf_counter() - t0
    else:
        def run():
            cache = M.KVCache.create(cfg, args.batch, kv_dtype)
            tok = jnp.zeros((args.batch,), jnp.int32)
            pos = jnp.full((args.batch,), args.pos, jnp.int32)
            t0 = time.perf_counter()
            toks, _, _ = M.decode_scan(
                cfg, w, tok, pos, cache, args.steps,
                rolling=args.pos + args.steps >= cfg.seq_len)
            np.asarray(toks)
            return time.perf_counter() - t0

    run()  # compile
    best = min(run() for _ in range(3))

    trace_ctx = (jax.profiler.trace(args.trace) if args.trace
                 else contextlib.nullcontext())
    with trace_ctx:
        run()

    if args.prefill:
        print(f"# prefill T={args.prefill}: {best * 1e3:.1f} ms/chunk, "
              f"{args.prefill / best:.0f} tok/s")
        ms_tok = best * 1000 / args.prefill
    else:
        ms_tok = best * 1000 / args.steps
        print(roofline_report(cfg, ms_tok, kv_bits, args.pos))
    if args.trace:
        # measured per-op table parsed from our own trace — the automated
        # equivalent of the reference's CUPTI report (cudaprof.cu:162-213)
        from calm_tpu.profiler import trace_table
        print(trace_table(args.trace, cfg,
                          steps=1 if args.prefill else args.steps,
                          kv_bits=kv_bits, pos=args.pos))
        print(f"# trace written to {args.trace} (load with TensorBoard)")


if __name__ == "__main__":
    main()
