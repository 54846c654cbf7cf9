"""Measure the gf4 decode ceiling directly on hardware.

Three rates, slope-method (docs/PERF_NOTES.md methodology), isolating the
gf4 VPU-decode bound the round-3 trace could only infer analytically:

  dma     pure u32 streaming read (the HBM attainable ceiling)
  decode  plane decode only (shift/and/cvt/fma/cast, planes summed)
  dot     decode + 8-plane MXU matvec (= _layered_gf4_kernel standalone)

If decode ~= dot, the plane-dot kernel is VPU-decode-bound and the
whole-model gf4 ceiling is decode_rate minus call overheads; if
dot << decode, the MXU feed is the limiter and sub-chunking is back on
the table. Each chained call consumes the previous call's scalar output
(seed operand) so XLA cannot CSE/hoist the pure custom calls out of the
timing scan.
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from calm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
from calm_tpu.ops import pallas_qmm  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def rnd_gf4(rng, shape):
    w = rng.integers(0, 2**31, shape, dtype=np.int64).astype(np.uint32)
    w = (w & ~np.uint32(0xFF)) | np.uint32(0x30)
    return jnp.asarray(w.view(np.int32))


def _dma_kernel(s_ref, w_ref, o_ref):
    i = pl.program_id(0)
    s = jnp.sum(w_ref[0].astype(jnp.float32))

    @pl.when(i == 0)
    def _():
        o_ref[0, 0] = s + s_ref[0, 0]

    @pl.when(i > 0)
    def _():
        o_ref[0, 0] = o_ref[0, 0] + s


def _decode_kernel(s_ref, w_ref, o_ref, *, full: bool):
    """Decode all 8 planes; sum them (1 extra add/value) into o."""
    i = pl.program_id(0)
    wu = pltpu.bitcast(w_ref[0], jnp.uint32)
    sf = pltpu.bitcast(((wu & 0x80) << 24) | ((wu & 0x7F) << 21), jnp.float32)
    scale = sf * (-0.25 * float(2.0 ** 112))
    acc = None
    for k in range(8):
        codes = (wu >> (8 + 3 * k)) & 7 if k < 7 else wu >> 29
        plane = ((codes.astype(jnp.int32).astype(jnp.float32) - 4.0) * scale)
        if full:
            plane = plane.astype(jnp.bfloat16).astype(jnp.float32)
        acc = plane if acc is None else acc + plane
    s = jnp.sum(acc)

    @pl.when(i == 0)
    def _():
        o_ref[0, 0] = s + s_ref[0, 0]

    @pl.when(i > 0)
    def _():
        o_ref[0, 0] = o_ref[0, 0] + s


def stream_call(kernel, seed, w, td):
    L, d, g = w.shape
    grid = (d // td,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, td, g), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
    )(seed.reshape(1, 1), w)


def time_it(f, *args, reps=6):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    # one big weight: 16384 x 4096 gf4 = 32 MiB packed; the seed chain
    # makes every scan iteration re-stream it
    d, n = 16384, 4096
    w = rnd_gf4(rng, (1, d, n // 8))
    mb = w.nbytes / 1e6
    x = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)

    def chain(callf, nrep):
        @jax.jit
        def f(w):
            def body(c, _):
                r = callf(c, w)
                return jax.tree.leaves(r)[0].ravel()[0].astype(
                    jnp.float32) * 1e-30, ()
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(nrep))[0]
        return f

    def slope(callf, n1=16, n2=80):
        ts = {n: time_it(chain(callf, n), w) for n in (n1, 48, n2)}
        per = (ts[n2] - ts[n1]) / (n2 - n1)
        mid = (ts[48] - ts[n1]) / (48 - n1)
        print(f"    [t16={ts[n1]*1e3:.2f} t48={ts[48]*1e3:.2f} "
              f"t80={ts[n2]*1e3:.2f} ms; mid-slope "
              f"{mid*1e6:.1f} us]", flush=True)
        return per, mb * 1e6 / per / 1e9

    for td in (2048, 4096):
        per, rate = slope(lambda s, w: stream_call(_dma_kernel, s, w, td))
        print(f"dma    td={td}: {per * 1e6:7.1f} us  {rate:5.0f} GB/s",
              flush=True)
    for td in (2048, 4096):
        per, rate = slope(lambda s, w: stream_call(
            functools.partial(_decode_kernel, full=False), s, w, td))
        print(f"decode td={td}: {per * 1e6:7.1f} us  {rate:5.0f} GB/s "
              "(no bf16 cast)", flush=True)
        per, rate = slope(lambda s, w: stream_call(
            functools.partial(_decode_kernel, full=True), s, w, td))
        print(f"decode td={td}: {per * 1e6:7.1f} us  {rate:5.0f} GB/s "
              "(with bf16 round-trip)", flush=True)

    # decode + dot: the production matvec kernel, standalone; the seed
    # perturbs x so the chained calls stay distinct
    def dot_call(s, w):
        return pallas_qmm.qmm_decode(x + s, w, "gf4", jnp.int32(0),
                                     stage="bound")
    per, rate = slope(dot_call)
    print(f"dot          : {per * 1e6:7.1f} us  {rate:5.0f} GB/s "
          "(plane-dot matvec)", flush=True)


if __name__ == "__main__":
    main()
