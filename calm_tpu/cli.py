"""Command-line driver: generate / chat / perplexity.

Flag-compatible with the reference CLI (src/run.c:421-490):
  -t temperature   -p min-p   -s seed   -n steps   -r sequences
  -c context       -i prompt (- reads stdin)   -x ppl-file   -y system-prompt

Env hooks (reference: src/run.c:181-187,503-511,605-607):
  CALM_TOKENS=1  dump prompt token ids
  CALM_POSO=N    offset positions by N (late-context decode profiling)
  CALM_CPU=1     force the CPU backend (reference's backend override)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

if os.environ.get("CALM_CPU", "0") == "1":
    # must run before any jax backend initialization; the TPU tunnel plugin
    # ignores the JAX_PLATFORMS env var, the config key works everywhere
    import jax
    jax.config.update("jax_platforms", "cpu")

from calm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from calm_tpu.container import ContainerError
from calm_tpu.engine import Engine, chat_loop


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="calm_tpu", description="TPU-native quantized LLM inference")
    ap.add_argument("checkpoint", help=".calm safetensors model file")
    ap.add_argument("-t", dest="temperature", type=float, default=1.0,
                    help="temperature in [0,inf], default 1.0 (0 = greedy)")
    ap.add_argument("-p", dest="minp", type=float, default=0.1,
                    help="min-p cutoff in [0,1], default 0.1")
    ap.add_argument("-s", dest="seed", type=int, default=0,
                    help="random seed, default time-based")
    ap.add_argument("-n", dest="steps", type=int, default=256,
                    help="steps to run, 0 = max_seq_len, -1 = infinite")
    ap.add_argument("-r", dest="sequences", type=int, default=1,
                    help="number of sequences to decode")
    ap.add_argument("-c", dest="context", type=int, default=0,
                    help="context length override")
    ap.add_argument("-i", dest="prompt", type=str, default=None,
                    help="input prompt (- to read stdin)")
    ap.add_argument("-x", dest="perplexity", type=str, default=None,
                    help="compute perplexity for a text file")
    ap.add_argument("-y", dest="system", type=str, default=None,
                    help="chat mode with this system prompt")
    ap.add_argument("--kv", dest="kv", type=str, default=None,
                    choices=["bf16", "fp16", "fp8"], help="KV cache dtype")
    ap.add_argument("--draft", type=str, default=None,
                    help="draft model (.calm) for greedy speculative "
                         "decoding (output identical to -t 0, just faster)")
    ap.add_argument("--gamma", type=int, default=4,
                    help="speculation depth (tokens drafted per round)")
    ap.add_argument("--precise", action="store_true",
                    help="f32-grade matvec accumulation (Precision.HIGHEST "
                         "multi-pass MXU dots); also CALM_PRECISE=1")
    ap.add_argument("--reference-sampling", action="store_true",
                    help="per-token host sampling with the reference's "
                         "bit-compatible xorshift64* stream (src/sampler.c) "
                         "instead of the chunked on-device sampler")
    args = ap.parse_args(argv)

    seed = args.seed if args.seed > 0 else int(time.time())
    prompt = args.prompt
    if prompt == "-":
        prompt = sys.stdin.read()

    try:
        precise = args.precise or os.environ.get("CALM_PRECISE", "0") == "1"
        engine = Engine(args.checkpoint, context=args.context,
                        kv_dtype=args.kv, precise=precise)
    except (FileNotFoundError, IsADirectoryError) as e:
        print(f"failed to open {args.checkpoint}: {e}", file=sys.stderr)
        raise SystemExit(1)
    except ContainerError as e:
        print(f"failed to load {args.checkpoint}: {e}", file=sys.stderr)
        raise SystemExit(1)
    print(engine.banner())
    import jax
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} x{jax.device_count()} "
          f"({jax.default_backend()})")  # device banner (src/infer.cu:82-85)

    pos_offset = int(os.environ.get("CALM_POSO", "0"))
    steps = args.steps if args.steps != 0 else engine.cfg.seq_len

    if os.environ.get("CALM_TOKENS", "0") == "1" and prompt:
        toks = engine.tokenizer.encode(prompt, bos=True)
        print("".join(f"[{engine.tokenizer.decode([t])}:{t}]" for t in toks))

    # warmup forward: compiles the decode program (src/run.c:612)
    engine.step(0, pos_offset)
    engine.reset()

    if args.perplexity:
        with open(args.perplexity, "r", errors="replace") as f:
            text = f.read(64 * 1024)
        t0 = time.perf_counter()
        ppl, err, n = engine.perplexity(text, steps,
                                        progress=lambda s: print(s, flush=True))
        dt = time.perf_counter() - t0
        print(f"# perplexity: {ppl:.3f} ± {err:.3f} "
              f"({dt:.2f} sec, {n / dt:.2f} tok/s)")
    elif args.system is not None:
        chat_loop(engine, args.system, prompt,
                  temperature=args.temperature, minp=args.minp, seed=seed,
                  reference_sampling=args.reference_sampling)
    elif args.draft:
        from calm_tpu.speculative import speculative_generate
        draft = Engine(args.draft, context=args.context, kv_dtype=args.kv)
        print(draft.banner())
        for _ in range(args.sequences):
            engine.reset()
            draft.reset()
            stats = speculative_generate(
                engine, draft, prompt or "", steps, gamma=args.gamma,
                temperature=args.temperature, minp=args.minp, seed=seed,
                pos_offset=pos_offset, echo=True,
                on_piece=lambda s: print(s, end="", flush=True))
            print()
            print(stats.perf_line(), file=sys.stderr)
            print(f"# speculative: acceptance {stats.acceptance:.2f} over "
                  f"{stats.rounds} rounds (gamma {args.gamma})",
                  file=sys.stderr)
    else:
        for _ in range(args.sequences):
            engine.reset()
            stats = engine.generate(
                prompt or "", steps, temperature=args.temperature,
                minp=args.minp, seed=seed, pos_offset=pos_offset, echo=True,
                reference_sampling=args.reference_sampling,
                on_piece=lambda s: print(s, end="", flush=True))
            print()
            print(stats.perf_line(), file=sys.stderr)


if __name__ == "__main__":
    main()
