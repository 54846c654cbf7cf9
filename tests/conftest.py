"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (TP/EP/DP) is validated without TPU hardware by forcing
the JAX CPU backend to expose 8 devices, per the build-plan test strategy
(SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests run on CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# single host core: don't oversubscribe
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# Quick CI lane: `pytest -m quick` (~3 min) — container/tokenizer/sampler/
# quant unit surface + kernel interpret checks + the core model parity file.
# The full suite (~13 min on one core) stays the merge gate; the quick lane
# is the inner-loop signal. Modules, not per-test marks, so new tests in a
# fast file inherit the lane automatically.
_QUICK_MODULES = {
    "test_container", "test_native", "test_tokenizer", "test_sampler",
    "test_quant", "test_chip", "test_profiler", "test_tools",
    "test_pallas_attn", "test_model",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast inner-loop lane (pytest -m quick, ~3 min)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for it in items:
        if it.module.__name__ in _QUICK_MODULES:
            it.add_marker(_pytest.mark.quick)
