"""Persistent XLA compilation cache.

The axon tunnel's compile server latency is wildly variable (the same tiny
program has measured 10 s and 350 s in one session); a persistent on-disk
cache makes every repeat invocation of the CLI / bench / tools hit compiled
executables in well under a second. The reference has no analogue (CUDA
kernels compile at build time); for a jit-compiled framework the cache IS
the build artifact store.

Enabled by default at every entry point (CLI, bench, tools); opt out with
CALM_NO_COMPILE_CACHE=1. The cache key includes the compiler version and
device kind, so a libtpu/jaxlib bump invalidates entries automatically.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    if os.environ.get("CALM_NO_COMPILE_CACHE", "0") == "1":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already configured one
    path = os.environ.get(
        "CALM_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "calm_tpu", "xla"))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything, even fast compiles: the tunnel round trip alone
    # makes a "fast" compile cost seconds
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
