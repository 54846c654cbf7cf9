"""Bandwidth accounting, roofline model, and trace capture.

TPU counterpart of the reference's three profiling mechanisms (SURVEY.md §5):

- the per-stage analytic bytes model that the CUDA backend attaches to every
  kernel launch as PROF_TOKEN (src/infer.cu:22,683-719) becomes
  :func:`stage_bytes` — the expected HBM traffic of one decode step, per
  stage, derived from the config;
- the speed-of-light roofline (tools/sol.ipynb):
  latency >= max(bytes / HBM_bw, flops / peak_flops) per step, evaluated
  against the chip table in calm_tpu/parallel/mesh.py;
- `jax.profiler` traces replace the CUPTI injection library: :func:`trace`
  wraps a block and writes a TensorBoard-loadable trace.

The achieved-vs-SoL report printed by :func:`roofline_report` is the
framework's always-on perf gate, like the reference perf line
(src/run.c:249-253).
"""

from __future__ import annotations

import contextlib
import dataclasses

from calm_tpu.config import ModelConfig
from calm_tpu.parallel.mesh import Topology, detect_topology
from calm_tpu.quant import dtype_bits


def stage_bytes(cfg: ModelConfig, kv_bits: int = 16, pos: int = 0,
                tied_output: bool = False) -> dict:
    """Expected HBM bytes read by one single-token decode step, per stage.

    Mirrors the reference's per-stage bandwidth table (src/infer.cu:683-719):
    weights at packed width, KV reads at the current length, activations
    ignored (VMEM-resident).
    """
    wb = dtype_bits(cfg.dtype) / 8
    D, Hd, Q, KV = cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim
    L = cfg.n_layers
    kv_len = min(pos + 1, cfg.seq_len)
    kv_row = KV * kv_bits // 8

    s = {}
    s["embed"] = D * wb  # one row
    s["attn_norms"] = L * 2 * D * 4
    s["wqkv"] = L * (Q + 2 * KV) * D * wb
    s["kv_store"] = L * 2 * kv_row
    s["attn_read_kv"] = L * 2 * kv_row * kv_len
    s["wo"] = L * D * Q * wb
    if cfg.n_experts:
        s["moegate"] = L * cfg.n_experts * D * wb
        s["ffn"] = L * cfg.n_experts_ac * 3 * Hd * D * wb
    else:
        s["ffn"] = L * 3 * Hd * D * wb
    s["final_norm"] = D * 4
    s["lm_head"] = cfg.vocab_size * D * wb
    return s


def step_bytes(cfg: ModelConfig, kv_bits: int = 16, pos: int = 0) -> int:
    return int(sum(stage_bytes(cfg, kv_bits, pos).values()))


def step_flops(cfg: ModelConfig, pos: int = 0) -> int:
    """MAC-dominated flop count of one decode token (2 flops per MAC)."""
    D, Hd, Q, KV = cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim
    L = cfg.n_layers
    kv_len = min(pos + 1, cfg.seq_len)
    per_layer = (Q + 2 * KV) * D + D * Q  # qkv + wo
    per_layer += 2 * Q * kv_len           # scores + mix (per q elem over kv)
    ffn = 3 * Hd * D * (cfg.n_experts_ac if cfg.n_experts else 1)
    return 2 * (L * (per_layer + ffn) + cfg.vocab_size * D)


@dataclasses.dataclass
class Roofline:
    sol_ms_per_token: float
    bound: str               # "bandwidth" | "compute"
    bytes_per_token: int
    flops_per_token: int
    topo: Topology

    def achieved(self, ms_per_token: float) -> dict:
        gbs = self.bytes_per_token / 1e9 / (ms_per_token / 1000)
        return {
            "ms_per_token": ms_per_token,
            "tok_s": 1000.0 / ms_per_token,
            "achieved_gb_s": gbs,
            "pct_sol_bandwidth": 100.0 * gbs / self.topo.hbm_gbps_per_chip,
            "pct_sol_latency": 100.0 * self.sol_ms_per_token / ms_per_token,
        }


# peak bf16 MXU flops per chip (dense), same sources as the HBM table
CHIP_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
    "cpu": 1e12,
}


def roofline(cfg: ModelConfig, kv_bits: int = 16, pos: int = 0,
             topo: Topology | None = None) -> Roofline:
    topo = topo or detect_topology()
    peak_flops = CHIP_FLOPS.get(topo.device_kind, 1e12)
    for k, v in CHIP_FLOPS.items():
        if topo.device_kind.startswith(k):
            peak_flops = v
            break
    b = step_bytes(cfg, kv_bits, pos)
    f = step_flops(cfg, pos)
    t_bw = b / (topo.hbm_gbps_per_chip * 1e9)
    t_fl = f / peak_flops
    return Roofline(sol_ms_per_token=max(t_bw, t_fl) * 1000,
                    bound="bandwidth" if t_bw >= t_fl else "compute",
                    bytes_per_token=b, flops_per_token=f, topo=topo)


def roofline_report(cfg: ModelConfig, ms_per_token: float, kv_bits: int = 16,
                    pos: int = 0, topo: Topology | None = None) -> str:
    r = roofline(cfg, kv_bits, pos, topo)
    a = r.achieved(ms_per_token)
    stages = stage_bytes(cfg, kv_bits, pos)
    total = sum(stages.values())
    lines = [
        f"# roofline: {r.topo.device_kind}, {r.bound}-bound, "
        f"SoL {r.sol_ms_per_token:.2f} ms/tok "
        f"({r.bytes_per_token / 1e9:.2f} GB/tok, {r.flops_per_token / 1e9:.1f} GFLOP/tok)",
        f"# achieved: {a['ms_per_token']:.2f} ms/tok ({a['tok_s']:.1f} tok/s), "
        f"{a['achieved_gb_s']:.0f} GB/s = {a['pct_sol_bandwidth']:.1f}% of HBM SoL",
    ]
    for name, b in sorted(stages.items(), key=lambda kv: -kv[1]):
        sol_us = b / (r.topo.hbm_gbps_per_chip * 1e9) * 1e6
        lines.append(f"#   {name:<14} {b / 1e6:8.2f} MB/tok  "
                     f"SoL {sol_us:7.1f} us  ({100 * b / total:4.1f}%)")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(path: str = "/tmp/calm_tpu_trace"):
    """Capture a jax.profiler trace around a block (TensorBoard-loadable);
    replaces the reference's CUPTI injection profiler (tools/cudaprof.cu)."""
    import jax
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class OpStat:
    """Aggregated per-op timing from a captured trace (one row of the
    cudaprof-style table, tools/cudaprof.cu:162-213: count / mean / stddev /
    total / share)."""

    name: str
    count: int = 0
    total_us: float = 0.0
    bytes: int = 0    # summed bytes_accessed from the event args (the
                      # compiler's own estimate; pallas kernels carry their
                      # cost_estimate through) — drives the achieved-GB/s
                      # column without analytic guesswork
    flops: int = 0    # summed "flops" from the event args (MXU column)
    transc: int = 0   # summed "transcendentals" (exp/erf — VPU column)
    _m2: float = 0.0  # sum of squared durations (for the ±std column)

    @property
    def mean_us(self) -> float:
        return self.total_us / max(self.count, 1)

    @property
    def std_us(self) -> float:
        if self.count < 2:
            return 0.0
        var = self._m2 / self.count - self.mean_us ** 2
        return max(var, 0.0) ** 0.5


def parse_trace(trace_dir: str) -> list[OpStat]:
    """Parse a jax.profiler trace directory into per-op aggregates.

    Reads the Chrome/Perfetto ``*.trace.json(.gz)`` files the profiler
    writes under ``plugins/profile/<run>/`` and aggregates complete ('X')
    events on device tracks by name. This automates the attribution the
    reference gets from its CUPTI injection table — no TensorBoard needed.
    """
    import glob
    import gzip
    import json
    import os

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json*"),
                  recursive=True))
    stats: dict[str, OpStat] = {}
    for fn in files:
        opener = gzip.open if fn.endswith(".gz") else open
        with opener(fn, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        # device process ids: metadata names mentioning TPU/device (the CPU
        # backend labels its executor threads differently per version —
        # fall back to "every pid" if no device pid is found)
        dev_pids = set()
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = str(ev.get("args", {}).get("name", "")).lower()
                if ("tpu" in nm or "device" in nm or "/device" in nm
                        or "xla" in nm):
                    dev_pids.add(ev.get("pid"))
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            if dev_pids and ev.get("pid") not in dev_pids:
                continue
            name = ev.get("name", "?")
            st = stats.get(name)
            if st is None:
                st = stats[name] = OpStat(name)
            dur = float(ev["dur"])  # us
            st.count += 1
            st.total_us += dur
            st._m2 += dur * dur
            args = ev.get("args", {})
            for field, key in (("bytes", "bytes_accessed"),
                               ("flops", "flops"),
                               ("transc", "transcendentals")):
                try:
                    setattr(st, field,
                            getattr(st, field) + int(args.get(key, 0)))
                except (TypeError, ValueError):
                    pass
    return sorted(stats.values(), key=lambda s: -s.total_us)


# peak VPU element-op rates (ops/s per chip): 8 sublanes x 128 lanes x
# 4 ALUs x clock, clock inferred from the MXU peak (CHIP_FLOPS /
# (n_mxu * 128*128*2)). Rough diagnostic peaks — good to ~10-20%, which is
# enough to name the limiting unit (the cudaprof.cu:102-114 analogue of
# the SM-occupancy limiter).
CHIP_VPU_OPS = {
    "TPU v4": 4.3e12,
    "TPU v5 lite": 6.1e12,
    "TPU v5e": 6.1e12,
    "TPU v5": 7.2e12,
    "TPU v5p": 7.2e12,
    "TPU v6 lite": 14e12,
    "TPU v6e": 14e12,
    "cpu": 1e11,
}

# VPU element ops charged per byte streamed, by stage tag. These are the
# IN-KERNEL dequant/decode costs the flops field can't see (it counts MAC
# flops only): gf4 spends ~5 integer ops per 4-bit value (shift, mask,
# sub, scale decode, fma feed — docs/PERF_NOTES.md "gf4 plane-dot") =
# ~10 ops/byte of packed weights. exp() is charged separately via the
# transcendentals field at ~8 VPU ops each.
_VPU_DECODE_OPS_PER_BYTE = {"gf4": 10.0}
_OPS_PER_TRANSCENDENTAL = 8.0

# kernel-name -> (stage label, vpu decode class). Explicit ``__<stage>``
# tags (see pallas_qmm._qmm_jit) win; these base names cover the kernels
# whose name IS the stage already.
_KERNEL_STAGES = {
    "_qmm": ("gf4 matvec", "gf4"),
    "_gf4_ffn": ("gf4 fused ffn", "gf4"),
    "_gf4_offn": ("gf4 wo+ffn", "gf4"),
    "_gf4_moe_ffn": ("gf4 moe ffn", "gf4"),
    "_qmm_moe_dense": ("moe expert matvec", "gf4"),
    "_decode_attention": ("decode attention", None),
    "_prefill_attention": ("prefill attention", None),
}


def _op_stage(name: str):
    """(stage label, vpu decode class) for a trace op name. Stage tags ride
    the kernel NAME (``_qmm__wqkv.18`` -> ``wqkv``) — explicit labels, not
    fragment guessing."""
    base = name.split(".")[0]
    if "__" in base:
        root, tag = base.rsplit("__", 1)
        _, decode = _KERNEL_STAGES.get(root, (None, None))
        return tag, decode
    if base in _KERNEL_STAGES:
        return _KERNEL_STAGES[base]
    return None, None


def trace_table(trace_dir: str, cfg: ModelConfig | None = None,
                steps: int = 1, kv_bits: int = 16, pos: int = 0,
                top: int = 16, topo: Topology | None = None) -> str:
    """Format the measured per-op table (the cudaprof.cu:162-213 report):
    count, mean ± std, total time, share, achieved GB/s from each event's
    own bytes_accessed, and HBM / MXU / VPU utilization percentages with
    the limiting unit named per row (cudaprof's SM-occupancy analogue).

    MXU%% comes from each op's own flops estimate vs the chip peak; VPU%%
    charges the per-byte dequant cost of tagged quantized kernels plus
    ~8 ops per transcendental — so a gf4 row directly shows whether the
    decode ALU or the HBM stream is the bound."""
    stats = parse_trace(trace_dir)
    if not stats:
        return "# trace: no device events found"
    total = sum(s.total_us for s in stats)
    del cfg, kv_bits, pos  # kept for API stability; bytes come from the trace
    topo = topo or detect_topology()
    hbm_peak = topo.hbm_gbps_per_chip * 1e9
    mxu_peak = CHIP_FLOPS.get(topo.device_kind, 1e12)
    vpu_peak = CHIP_VPU_OPS.get(topo.device_kind, 1e11)
    for k in CHIP_FLOPS:
        if topo.device_kind.startswith(k):
            mxu_peak = CHIP_FLOPS[k]
            vpu_peak = CHIP_VPU_OPS[k]
            break
    lines = [f"# measured per-op table ({trace_dir}; device total "
             f"{total / 1000:.2f} ms over {steps} step(s))"]
    lines.append(f"# {'op':<40} {'calls':>6} {'mean us':>8} {'±std':>6} "
                 f"{'total ms':>8} {'share':>6} {'GB/s':>5} {'HBM%':>5} "
                 f"{'MXU%':>5} {'VPU%':>5}  bound")
    for s in stats[:top]:
        sec = s.total_us / 1e6
        big = s.total_us and s.bytes / max(s.count, 1) >= 1e6
        # only attribute ops that actually move memory (control-flow
        # wrappers carry token-sized bytes_accessed)
        stage, decode = _op_stage(s.name) if big else (None, None)
        gbs = s.bytes / 1e9 / sec if big else 0.0
        hbm = 100.0 * s.bytes / sec / hbm_peak if big else 0.0
        mxu = 100.0 * s.flops / sec / mxu_peak if big else 0.0
        vpu_ops = _OPS_PER_TRANSCENDENTAL * s.transc
        if decode:
            vpu_ops += _VPU_DECODE_OPS_PER_BYTE[decode] * s.bytes
        vpu = 100.0 * vpu_ops / sec / vpu_peak if big else 0.0
        tail = ""
        if big:
            units = {"hbm": hbm, "mxu": mxu, "vpu": vpu}
            bound = max(units, key=units.get)
            tail = (f"{gbs:5.0f} {hbm:5.1f} {mxu:5.1f} {vpu:5.1f}  {bound}"
                    + (f" ({stage})" if stage else ""))
        nm = s.name if len(s.name) <= 40 else s.name[:37] + "..."
        lines.append(f"# {nm:<40} {s.count:>6} {s.mean_us:>8.1f} "
                     f"{s.std_us:>6.1f} {s.total_us / 1000:>8.2f} "
                     f"{100 * s.total_us / total:>5.1f}% {tail}")
    return "\n".join(lines)
