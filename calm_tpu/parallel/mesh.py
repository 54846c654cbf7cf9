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
# (the TPU analogue of the reference's GPU table in tools/sol.ipynb).
# Single source of truth lives in calm_tpu.chip alongside the kernel tuning.
from calm_tpu.chip import CHIP_TABLE  # noqa: E402  (re-export)


def detect_topology() -> Topology:
    devs = jax.devices()
    kind = devs[0].device_kind
    gb, gbps = CHIP_TABLE.get(kind, CHIP_TABLE.get("cpu"))
    for k, v in CHIP_TABLE.items():
        if kind.startswith(k):
            gb, gbps = v
            break
    return Topology(len(devs), kind, gb, gbps)


def make_mesh(tp: int = 1, ep: int = 1, dp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * sp * tp * ep
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, sp, ep, tp)
    return Mesh(arr, ("dp", "sp", "ep", "tp"))


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join a multi-host run (each host sees only its local chips until the
    distributed runtime connects them). No-op when already initialized or
    when env auto-detection applies (GKE/Borg set everything up). The
    reference has no multi-host story at all (SURVEY.md §2.3)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def make_multihost_mesh(tp: int = 1, ep: int = 1, dp_dcn: int = 1) -> Mesh:
    """Hybrid mesh: tp/ep ride ICI inside each slice, dp crosses slices over
    DCN. Collective-light axes (dp carries no per-layer collectives, see
    calm_tpu/parallel/plan.py) are the only ones placed on DCN, following
    the scaling-book recipe."""
    from jax.experimental import mesh_utils
    devs = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, ep, tp), dcn_mesh_shape=(dp_dcn, 1, 1),
        devices=jax.devices())
    return Mesh(devs, ("dp", "ep", "tp"))


def health_check(mesh: Mesh | None = None, timeout_s: float = 60.0) -> dict:
    """Fail-fast slice health probe at startup (SURVEY.md §5: the reference
    aborts on first error; a multi-host engine must detect a sick slice
    BEFORE loading 100 GB of weights).

    Runs a psum across every device of the mesh and checks the arithmetic;
    returns a small report dict, raises RuntimeError on mismatch/hang. The
    probe runs in a watchdog thread: a sick ICI link that blocks the
    collective forever raises within ``timeout_s`` instead of hanging the
    caller (the daemon thread is abandoned — the point of the check is to
    abort the process before loading 100 GB of weights).
    """
    import threading
    import time as _time

    devices = (list(mesh.devices.flat) if mesh is not None
               else jax.devices())
    n = len(devices)
    t0 = _time.perf_counter()
    result: dict = {}

    def probe_fn():
        try:
            probe = Mesh(np.asarray(devices).reshape(n), ("all",))
            ones = jax.device_put(
                np.ones((n, 8), np.float32),
                jax.sharding.NamedSharding(probe,
                                           jax.sharding.PartitionSpec("all")))

            def allsum(x):
                return jax.lax.psum(x, "all")

            fn = jax.jit(jax.shard_map(
                allsum, mesh=probe,
                in_specs=jax.sharding.PartitionSpec("all"),
                out_specs=jax.sharding.PartitionSpec("all")))
            result["out"] = np.asarray(fn(ones))
        except Exception as e:  # noqa: BLE001 — wrap with diagnostics
            result["err"] = e

    t = threading.Thread(target=probe_fn, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise RuntimeError(
            f"slice health check HUNG (> {timeout_s:.0f}s) across {n} "
            f"devices ({[d.device_kind for d in devices[:4]]}...) — "
            "collective never completed; suspect a sick ICI link or a "
            "missing process in the mesh")
    if "err" in result:
        raise RuntimeError(
            f"slice health check FAILED across {n} devices "
            f"({[d.device_kind for d in devices[:4]]}...): {result['err']}"
        ) from result["err"]
    out = result["out"]
    dt = _time.perf_counter() - t0
    if not np.allclose(out, float(n)):
        raise RuntimeError(
            f"slice health check WRONG RESULT: psum over {n} devices "
            f"returned {out.ravel()[:4]}, expected {n}")
    return {"devices": n, "kinds": sorted({d.device_kind for d in devices}),
            "psum_seconds": dt}
