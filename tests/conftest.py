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
