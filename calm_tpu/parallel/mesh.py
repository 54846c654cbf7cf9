"""Mesh construction helpers.

Axis convention: ("dp", "tp", "ep") — data/continuous-batching over DCN,
tensor-parallel over ICI (fastest axis), expert-parallel over ICI. Axes of
size 1 are kept in the mesh (they cost nothing) so sharding specs stay
uniform across topologies.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class Topology:
    n_devices: int
    device_kind: str
    hbm_gb_per_chip: float
    hbm_gbps_per_chip: float  # speed-of-light HBM bandwidth


# per-chip HBM capacity / bandwidth, used by the roofline reporter
# (the TPU analogue of the reference's GPU table in tools/sol.ipynb)
CHIP_TABLE = {
    "TPU v4": (32, 1228.0),
    "TPU v5 lite": (16, 819.0),
    "TPU v5e": (16, 819.0),
    "TPU v5": (95, 2765.0),
    "TPU v5p": (95, 2765.0),
    "TPU v6 lite": (32, 1640.0),
    "TPU v6e": (32, 1640.0),
    "TPU7x": (192, 7300.0),
    "cpu": (0, 50.0),
}


def detect_topology() -> Topology:
    devs = jax.devices()
    kind = devs[0].device_kind
    gb, gbps = CHIP_TABLE.get(kind, CHIP_TABLE.get("cpu"))
    for k, v in CHIP_TABLE.items():
        if kind.startswith(k):
            gb, gbps = v
            break
    return Topology(len(devs), kind, gb, gbps)


def make_mesh(tp: int = 1, ep: int = 1, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * ep
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, ep, tp)
    return Mesh(arr, ("dp", "ep", "tp"))
