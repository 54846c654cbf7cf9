"""Worker process for the 2-process jax.distributed serving test.

Each process owns 2 of the 4 continuous-batching slots (dp=2 over the
process axis x tp=2 within each process), admits its OWN requests, and
samples only its local logits rows — the multi-host continuous-batching
path (BASELINE north star; the reference is single-sequence single-GPU).

Usage: multihost_serve_worker.py <pid> <nproc> <port> <model.calm> [mode]
mode "device": on-device sampling — token ids cross to each host instead
of logits rows. mode "paged": dp-sharded PAGED serving — no mesh at all;
each process runs one independent PagedDecoder per local device
(serve.PagedGroup) over its own slot range; the dp axis is the process
boundary.
"""

import os
import sys

pid, nproc, port, model = (int(sys.argv[1]), int(sys.argv[2]),
                           sys.argv[3], sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else ""
device_sampling = mode == "device"

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from calm_tpu.parallel import ShardingPlan  # noqa: E402
from calm_tpu.serve import Server  # noqa: E402

devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))

if mode == "paged":
    local = [d for d in devs if d.process_index == pid]
    srv = Server(model, batch=4, kv_dtype="fp16", page_rows=16,
                 dp_devices=local, prefix_cache_tokens=2048)
else:
    arr = np.asarray(devs).reshape(nproc, 2)  # dp rows == process rows
    for i, row in enumerate(arr):
        assert all(d.process_index == i for d in row), \
            "dp axis must be per-process"
    mesh = Mesh(arr, ("dp", "tp"))
    srv = Server(model, batch=4, mesh=mesh,
                 plan=ShardingPlan(dp="dp", tp="tp"),
                 device_sampling=device_sampling)

prompts = {0: ["hello world", "pack my box"], 1: ["the quick brown"]}[pid]
reqs = [srv.submit(p, max_tokens=8, temperature=0.0) for p in prompts]
srv.run_until_drained(max_ticks=100)
assert all(r.done for r in reqs), [r.done for r in reqs]
for p, r in zip(prompts, reqs):
    print(f"RESULT\t{pid}\t{p}\t{r.text!r}", flush=True)
