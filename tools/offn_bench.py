"""Standalone hw check for the fused attn-epilogue (offn) kernel:
does it lower on Mosaic, and what rate does a dependent in-scan chain
sustain vs the separate wo + fused-FFN formulation? (slope method)"""

import sys
import time

import jax

import os as _os
if _os.environ.get("CALM_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from calm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
from calm_tpu.ops import pallas_qmm  # noqa: E402

D, Q, H, L = 4096, 4096, 14336, 32  # mistral-7B geometry
eps = 1e-5


def rnd_gf4(rng, shape):
    # random packed words: scale byte small-exponent, codes arbitrary
    w = rng.integers(0, 2**31, shape, dtype=np.int64).astype(np.uint32)
    w = (w & ~np.uint32(0xFF)) | np.uint32(0x30)  # fixed small e5m2 scale
    return jnp.asarray(w.view(np.int32))


def main():
    rng = np.random.default_rng(0)
    wo_p = rnd_gf4(rng, (L, 8, D // 8, Q // 8))
    w1p = rnd_gf4(rng, (L, 8, H // 8, D // 8))
    w3p = rnd_gf4(rng, (L, 8, H // 8, D // 8))
    w2tp = rnd_gf4(rng, (L, H // 8, D))
    g_pl = jnp.ones((L, 8, D // 8), jnp.float32)
    B = 1
    a0 = jnp.asarray(rng.standard_normal((B, 8, Q // 8)), jnp.float32) * 0.05
    r0 = jnp.asarray(rng.standard_normal((B, 8, D // 8)), jnp.float32) * 0.05

    bytes_per_layer = (wo_p.nbytes + w1p.nbytes + w3p.nbytes + w2tp.nbytes) / L

    def chain(n):
        def body(carry, l):
            a, r = carry
            ffn, r1 = pallas_qmm.gf4_offn(a, r, g_pl, wo_p, w1p, w3p, w2tp,
                                          l % L, False, eps, False)
            x = r1 + ffn.reshape(B, 8, D // 8)
            # keep the dependency real without growing values
            return (a + x[:, :, :Q // 8] * 1e-20, x * 0.5), ()

        return jax.jit(lambda a, r: jax.lax.scan(
            body, (a, r), jnp.arange(n, dtype=jnp.int32))[0][1])

    def run(f, *args):
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])  # fence through the tunnel

    N1, N2 = 8, 40
    mins = {}
    for n in (N1, N2):
        print(f"compiling chain({n})...", flush=True)
        tc0 = time.perf_counter()
        f = chain(n)
        run(f, a0, r0)  # compile
        print(f"  compiled+ran in {time.perf_counter() - tc0:.1f}s",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(f, a0, r0)
            ts.append(time.perf_counter() - t0)
        mins[n] = min(ts)
        print(f"  chain({n}): {mins[n] * 1e3:.2f} ms", flush=True)
    per_layer = (mins[N2] - mins[N1]) / (N2 - N1)
    gbs = bytes_per_layer / per_layer / 1e9
    print(f"offn chain: {per_layer * 1e6:.1f} us/layer, {gbs:.0f} GB/s "
          f"({bytes_per_layer / 1e6:.1f} MB/layer)")


if __name__ == "__main__":
    main()
