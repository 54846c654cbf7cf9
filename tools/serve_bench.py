"""Serving-level benchmark: continuous-batching throughput + latency.

bench.py measures the single-stream decode rate (the reference's perf
line, src/run.c:249-253); this measures what a DEPLOYMENT sees — aggregate
tokens/s across slots, time-to-first-token percentiles, and the effect of
the serving features (paged pool, prefix sharing, speculation, dp shards)
— on a synthetic request load. The reference has no serving story at all
(single-sequence driver, SURVEY.md §2.3).

    python tools/serve_bench.py --synthetic mistral7b --dtype fp8 \
        --batch 8 --requests 32 --prompt-len 128 --max-tokens 64
    python tools/serve_bench.py m.calm --page-rows 512 --prefix-share 0.5
    CALM_CPU=1 python tools/serve_bench.py --synthetic tiny ...  # debug

Emits one JSON line:
  {"metric": "serve_agg_tok_s", "value": ..., "unit": "tok/s", ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("CALM_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from calm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(prog="serve_bench")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--synthetic", default=None,
                    help="bench.py shape name (synthetic weights)")
    ap.add_argument("--dtype", default="fp8",
                    choices=["fp16", "fp8", "fp8e4", "gf4"])
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=128,
                    help="tokens per prompt (synthetic token ids)")
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--prefix-share", type=float, default=0.0,
                    help="fraction of the prompt shared across requests "
                         "(exercises the prefix cache when enabled)")
    ap.add_argument("--prefix-cache-tokens", type=int, default=0)
    ap.add_argument("--page-rows", type=int, default=0)
    ap.add_argument("--pool-pages", type=int, default=0)
    ap.add_argument("--draft", default=None)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args(argv)

    from calm_tpu.serve import Server

    if args.synthetic:
        # synthesize a container via the bench shapes + the test modelgen
        # (the Server needs a real container: tokenizer rides inside)
        import bench
        from calm_tpu.config import ModelConfig
        from tests.modelgen import write_tiny_model
        shape = dict(bench.SHAPES[args.synthetic])
        cfg = ModelConfig(**shape, seq_len=args.ctx, rope_theta=10000.0,
                          norm_ln=False, dtype=args.dtype,
                          rotary_dim=shape["head_dim"])
        path = (f"/tmp/serve_bench_{args.synthetic}_{args.dtype}"
                f"_{args.ctx}.calm")
        if not os.path.exists(path):
            print(f"# synthesizing {path} ...", file=sys.stderr)
            write_tiny_model(path, cfg, seed=3)
    else:
        path = args.checkpoint
        if path is None:
            ap.error("need a checkpoint or --synthetic <shape>")

    srv = Server(path, batch=args.batch,
                 context=args.ctx if args.synthetic is None else 0,
                 prefix_cache_tokens=args.prefix_cache_tokens,
                 page_rows=args.page_rows, pool_pages=args.pool_pages,
                 draft_path=args.draft, gamma=args.gamma)
    print(srv.engine.banner(), file=sys.stderr)
    eng = srv.engine
    V = eng.cfg.vocab_size

    # synthetic prompts straight from token ids (encode via decode() of
    # random ids would tokenize differently; the server API takes text, so
    # build texts the tokenizer round-trips reasonably)
    rng = np.random.default_rng(11)
    shared_n = int(args.prompt_len * args.prefix_share)
    shared = " ".join(str(int(x)) for x in rng.integers(0, 999, shared_n))
    prompts = []
    for i in range(args.requests):
        tail_n = max(1, args.prompt_len - shared_n)
        tail = " ".join(str(int(x))
                        for x in rng.integers(0, 999, tail_n))
        prompts.append((shared + " " + tail).strip())

    # warmup: run a small request load first so every program variant
    # (prefill chunks, decode at each occupancy, speculation rounds) is
    # compiled before the measured pass — through the tunnel a cold
    # compile is seconds-to-minutes and lands INSIDE TTFT otherwise (the
    # first capture of this bench showed TTFT p50 = 329 s of pure jit)
    warm = [srv.submit(p, max_tokens=4, temperature=args.temperature)
            for p in prompts[: min(len(prompts), args.batch + 1)]]
    srv.run_until_drained(max_ticks=100000)
    assert all(r.done for r in warm)

    t0 = time.perf_counter()
    reqs = [srv.submit(p, max_tokens=args.max_tokens,
                       temperature=args.temperature) for p in prompts]
    srv.run_until_drained(max_ticks=100000)
    wall = time.perf_counter() - t0
    assert all(r.done for r in reqs)

    gen = sum(r.n_generated for r in reqs)
    ttft = np.asarray(sorted(
        (r.first_token_at - r.submitted_at) * 1e3
        for r in reqs if r.first_token_at))
    agg = gen / wall
    line = (f"# {args.requests} reqs x <= {args.max_tokens} tok on "
            f"{args.batch} slots: {gen} tokens in {wall:.2f}s = "
            f"{agg:.1f} tok/s aggregate; TTFT ms "
            f"p50 {np.percentile(ttft, 50):.0f} "
            f"p95 {np.percentile(ttft, 95):.0f}")
    if srv.prefix_cache is not None:
        line += f"; prefix hits {srv.prefix_cache.hits}"
    if srv._draft is not None:
        line += (f"; spec acceptance "
                 f"{srv.spec_accepted / max(srv.spec_emitted, 1):.2f}")
    print(line, file=sys.stderr)

    tag = args.synthetic or os.path.basename(path)
    print(json.dumps({
        "metric": f"serve_agg_tok_s_{tag}_{args.dtype}",
        "value": round(agg, 2), "unit": "tok/s aggregate",
        "ttft_p50_ms": round(float(np.percentile(ttft, 50)), 1),
        "ttft_p95_ms": round(float(np.percentile(ttft, 95)), 1),
        "requests": args.requests, "slots": args.batch,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
