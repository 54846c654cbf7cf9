"""Parallelism: sharding plans, mesh helpers, shard_map wrappers.

calm_tpu.model imports ShardingPlan from here, and sharding.py imports the
model — so only plan/mesh are eager; sharding loads lazily on attribute
access to break the cycle.
"""

from calm_tpu.parallel.mesh import Topology, detect_topology, make_mesh  # noqa: F401
from calm_tpu.parallel.plan import NO_SHARDING, ShardingPlan  # noqa: F401

_LAZY = ("weight_pspecs", "cache_pspecs", "shard_weights", "shard_cache",
         "sharded_decode_step", "sharded_decode_scan", "sharded_prefill",
         "sharded_prefill_slot",
         "sharded_prefill_sp")
_LAZY_PIPE = ("sharded_decode_step_pp", "make_pp_mesh")


def __getattr__(name):
    if name in _LAZY:
        from calm_tpu.parallel import sharding
        return getattr(sharding, name)
    if name in _LAZY_PIPE:
        from calm_tpu.parallel import pipeline
        return getattr(pipeline, name)
    raise AttributeError(name)
