"""Quantization quality analysis: per-tensor error + end-to-end logit drift.

The reference's quality gate is perplexity on real checkpoints (~0.5% fp8
penalty, README.md:66) via `run -x`. This tool provides the offline
complement that needs no checkpoint download:

1. per-format quantization SNR / max-error over weight-like distributions
   (the format math itself, reference encode tools/convert.py:245-268)
2. end-to-end logit drift of a synthetic model converted at fp16/fp8/gf4
   against its f32 oracle — the engine-level error the ppl harness would
   integrate over a corpus

Usage: python tools/quality.py [--dim 256] [--layers 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("CALM_CPU", "0") == "1":
    # the axon plugin ignores JAX_PLATFORMS; force via config pre-init
    jax.config.update("jax_platforms", "cpu")

from calm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402

from calm_tpu import quant  # noqa: E402


def format_snr():
    rng = np.random.default_rng(0)
    print("# format error on N(0, 0.02) weights (typical trained scale):")
    w = (rng.standard_normal((512, 512)) * 0.02).astype(np.float32)
    for fmt in ("fp16", "fp8", "fp8e4", "gf4"):
        q, s = quant.quantize_scaled(w, fmt)
        deq = np.asarray(quant_dequant(q, fmt, s), np.float32)
        err = deq - w
        snr = 10 * np.log10(np.mean(w * w) / max(np.mean(err * err), 1e-30))
        rel = np.abs(err).max() / np.abs(w).max()
        bits = quant.dtype_bits(fmt)
        print(f"  {fmt:>5} ({bits:2d} bpw): SNR {snr:6.1f} dB, "
              f"max |err| {rel * 100:5.2f}% of max |w|")


def quant_dequant(q: np.ndarray, fmt: str, scale=None) -> np.ndarray:
    import jax.numpy as jnp
    from calm_tpu.ops.qmm import QTensor, dequant
    return np.asarray(dequant(QTensor.from_numpy(q, fmt, scale=scale),
                              jnp.float32))


def logit_drift(dim: int, layers: int):
    import tempfile

    import jax.numpy as jnp

    from calm_tpu import container
    from calm_tpu import model as M
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from modelgen import tiny_config, write_tiny_model
    from oracle import Oracle

    print(f"# end-to-end logit drift, synthetic {layers}-layer dim-{dim} "
          f"model, 6-token greedy decode vs f32 oracle:")
    tokens = [1, 5, 9, 200, 42, 7]
    with tempfile.TemporaryDirectory() as d:
        for fmt in ("fp16", "fp8", "fp8e4", "gf4"):
            kwargs = {}
            if fmt == "gf4":
                kwargs = dict(dim=64, hidden_dim=64, head_dim=16,
                              rotary_dim=16, vocab_size=272)
            cfg = tiny_config(dtype=fmt, **kwargs)
            path = os.path.join(d, f"{fmt}.calm")
            write_tiny_model(path, cfg, seed=5)
            tf = container.TensorFile(path)
            w = M.load_weights(tf, cfg)
            oracle = Oracle(tf, cfg)

            cache = M.KVCache.create(cfg, 1, jnp.float16)
            drifts, agree = [], 0
            for pos, t in enumerate(tokens):
                got, cache = M.decode_step(cfg, w, jnp.asarray([t]),
                                           jnp.asarray([pos]), cache)
                got = np.asarray(got[0], np.float32)
                want = oracle.forward(t, pos)
                drifts.append(np.abs(got - want).max()
                              / max(np.abs(want).max(), 1e-9))
                agree += int(got.argmax() == want.argmax())
            print(f"  {fmt:>4}: max rel logit drift "
                  f"{100 * max(drifts):5.2f}%, argmax agreement "
                  f"{agree}/{len(tokens)} (drift here is engine-vs-oracle "
                  f"numerics; quantization loss is in the oracle too)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args(argv)
    format_snr()
    logit_drift(args.dim, args.layers)


if __name__ == "__main__":
    main()
