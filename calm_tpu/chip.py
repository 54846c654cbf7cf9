"""Per-chip capability + tuning table.

The reference hardcodes nothing per-GPU — it queries device properties at
startup (src/infer.cu:79-85) and derives everything else. The TPU build
needs a little more: the measured kernel-tuning optima (weight-tile bytes,
attention block caps, fusion HBM budget) were found on v5e and must not be
silently applied to chips with different HBM/VMEM geometry. This module is
the one place those constants live:

- ``CHIP_TABLE``: nominal HBM capacity/bandwidth per device kind (the TPU
  analogue of the reference's GPU table in tools/sol.ipynb).
- ``tuning()``: lazily detected per-chip kernel tuning. v5e carries the
  values measured in docs/PERF_NOTES.md; other chips get bandwidth-scaled
  extrapolations (bigger DMA tiles on faster HBM keep per-grid-step time
  above the fixed Mosaic step overhead) that should be re-measured when
  hardware is available. CPU (the test mesh) reuses the v5e entry so
  interpret-mode tests exercise the production code paths.
- The fusion HBM budget prefers the backend's OWN ``memory_stats`` report
  over the nominal table, so pre-reserved framework memory is respected.
"""

from __future__ import annotations

import dataclasses
import functools

# per-chip nominal (HBM GiB, HBM GB/s); keys match jax device_kind prefixes
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

_V5E_BW = 819.0
_MIB = 1 << 20


@dataclasses.dataclass(frozen=True)
class ChipTuning:
    device_kind: str
    hbm_gb: float            # nominal capacity
    hbm_gbps: float          # nominal bandwidth
    hbm_budget: int          # usable bytes for weights + fused copies
    qmm_tile_bytes: int      # per-grid-step weight-tile DMA target
    attn_block_bytes: int    # fused (KVH, bs, hd) attention block cap
    vmem_limit_bytes: int    # Mosaic scoped-VMEM cap for the big kernels
    moe_scratch_bytes: int   # MoE column-split scratch budget


def _match_chip(kind: str) -> tuple[float, float]:
    if kind in CHIP_TABLE:
        return CHIP_TABLE[kind]
    # longest-prefix match so "TPU v5 lite" wins over "TPU v5"
    best = None
    for k, v in CHIP_TABLE.items():
        if kind.startswith(k) and (best is None or len(k) > len(best[0])):
            best = (k, v)
    return best[1] if best else CHIP_TABLE["cpu"]


def _scaled_tile(base: int, bw_ratio: float, cap: int) -> int:
    """Scale a measured v5e DMA-tile target with HBM bandwidth (same
    per-grid-step time on faster chips), MiB-rounded, capped so two
    double-buffered blocks still fit VMEM."""
    t = int(base * bw_ratio)
    return max(base, min(cap, (t // _MIB) * _MIB))


@functools.lru_cache(maxsize=None)
def _tuning_for(kind: str, bytes_limit: int | None) -> ChipTuning:
    gb, gbps = _match_chip(kind)
    is_tpu = kind.lower().startswith("tpu")
    ratio = (gbps / _V5E_BW) if is_tpu else 1.0

    # fusion budget: what's left of HBM after the runtime's own reserve.
    # Prefer the backend's live bytes_limit (respects pre-reserved memory);
    # fall back to nominal capacity. The slack fraction covers compiler
    # scratch + infeed/outfeed buffers and is calibrated so the 16 GiB v5e
    # lands at its empirically safe 14.5 GB working budget.
    cap = bytes_limit if bytes_limit else int(gb * (1 << 30))
    budget = int(cap * 0.845)
    if not is_tpu:
        budget = 14_500_000_000  # CPU test mesh mimics v5e decisions

    # v5e-measured optima (docs/PERF_NOTES.md): 7 MiB qmm tiles, 8 MiB
    # attention blocks, 100 MiB scoped VMEM (all these chips carry 128 MiB
    # physical VMEM), 24 MiB MoE scratch.
    return ChipTuning(
        device_kind=kind,
        hbm_gb=gb,
        hbm_gbps=gbps,
        hbm_budget=max(budget, 1_000_000_000),
        qmm_tile_bytes=_scaled_tile(7 * _MIB, ratio, 16 * _MIB),
        attn_block_bytes=_scaled_tile(8 * _MIB, ratio, 16 * _MIB),
        vmem_limit_bytes=100 * _MIB,
        moe_scratch_bytes=24 * _MIB,
    )


def tuning() -> ChipTuning:
    """Tuning for the default backend's first device (cached per kind)."""
    import jax

    dev = jax.devices()[0]
    bytes_limit = None
    try:
        stats = dev.memory_stats()
        if stats:
            bytes_limit = int(stats.get("bytes_limit", 0)) or None
    except Exception:  # backend without memory_stats (CPU)
        bytes_limit = None
    return _tuning_for(dev.device_kind, bytes_limit)
