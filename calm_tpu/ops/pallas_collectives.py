"""Hand-scheduled ring collectives on Pallas async remote DMAs.

The XLA collectives (``psum`` / ``rs_ag`` in parallel/plan.py) are the
production tp/ep close — XLA's latency-hiding scheduler overlaps them with
adjacent compute. This module is the EXPLICIT alternative the survey calls
out (SURVEY.md §5): a reduce-scatter + all-gather ring written directly on
inter-chip RDMA (`pltpu.make_async_remote_copy`), where the overlap of the
per-chunk remote copy with the local reduction is scheduled by hand inside
one kernel instead of trusted to the compiler. The reference has nothing
comparable (its NCCL calls are opaque); this is the TPU-native analogue of
writing a custom NCCL ring.

Status: correctness-complete and exercised on the multi-device Pallas TPU
INTERPRETER (tests/test_parallel.py) with race detection on — the simulator
executes the real remote-DMA/semaphore protocol across shard_map devices.
One physical chip in this environment, so no ICI measurement yet; the
kernel is hardware-ready (barrier + double-buffered slots + ack protocol,
see _ring_kernel) and tools/sol.py --scaling carries the analytic model
until a slice exists.

Ring protocol (both phases share one index walk):
  step s in [0, 2(n-1)):   send chunk (my - s) mod n  ->  right neighbor
                           recv chunk (my - s - 1) mod n  from left
  s < n-1  (reduce-scatter): o[recv] += incoming   (partial-sum ring)
  s >= n-1 (all-gather):     o[recv]  = incoming   (broadcast ring)
After n-1 reduce steps each device owns the fully-reduced chunk
(my+1) mod n; the same walk then circulates the owned chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ring_kernel(my_ref, x_ref, o_ref, comm_ref, send_sem, recv_sem,
                 ack_sem, *, n: int):
    """One-call all-reduce over an (n, E) chunk view.

    Synchronization:
    - entry barrier (both neighbors) so no RDMA lands in a kernel that
      has not allocated its scratch yet;
    - per-step ``rdma.wait()`` = my send completed AND the incoming copy
      into ``comm[slot]`` completed (the SPMD symmetric step targets the
      same slot everywhere);
    - double-buffered slots + an ACK regular semaphore: the consumer
      signals the sender after reading ``comm[slot]``, the sender waits
      for that ack before REUSING the slot two steps later — without it a
      fast left neighbor could overwrite a slot this device has not read
      (the race the interpreter's detect_races mode would flag).
    """
    my = my_ref[0]
    right = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my + n - 1, n)

    barrier = pltpu.get_barrier_semaphore()
    for nb in (left, right):
        pltpu.semaphore_signal(barrier, inc=1, device_id=nb,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    o_ref[:] = x_ref[:]

    def step(s, carry):
        slot = jax.lax.rem(s, 2)
        send_c = jax.lax.rem(my + 2 * n - s, n)        # (my - s) mod n
        recv_c = jax.lax.rem(my + 2 * n - s - 1, n)

        @pl.when(s >= 2)
        def _():
            # the slot we are about to fill on the RIGHT neighbor was
            # last used at step s-2: wait for its consumption ack
            pltpu.semaphore_wait(ack_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=o_ref.at[send_c],
            dst_ref=comm_ref.at[slot],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma.start()
        rdma.wait()

        data = comm_ref[slot]

        @pl.when(s < n - 1)
        def _():
            o_ref[recv_c] = o_ref[recv_c] + data       # reduce-scatter

        @pl.when(s >= n - 1)
        def _():
            o_ref[recv_c] = data                       # all-gather

        pltpu.semaphore_signal(ack_sem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        return carry

    jax.lax.fori_loop(0, 2 * (n - 1), step, 0)
    # two acks stay in flight at the end (steps 2(n-1)-2 and -1 were never
    # waited on); drain so every semaphore exits at zero
    pltpu.semaphore_wait(ack_sem, 2)


def ring_all_reduce(x: jax.Array, axis_name: str, n_devices: int,
                    interpret=False, collective_id: int = 7) -> jax.Array:
    """All-reduce ``x`` over a 1-D ``shard_map`` mesh axis with an explicit
    RDMA ring (reduce-scatter + all-gather in ONE pallas call).

    Call INSIDE shard_map over a 1-D ring axis; returns the full sum on
    every shard. Off-hardware, pass ``interpret=pltpu.InterpretParams(...)``
    — the multi-device TPU simulator, which executes remote DMAs and
    semaphores across shard_map devices (``detect_races=True`` runs the
    protocol under its race detector; the plain bool interpreter does NOT
    implement remote DMA). Composed meshes: the ring's LOGICAL device ids
    index the mesh axis — run it over the fastest-varying axis or a 1-D
    mesh (the tested configuration).
    """
    if n_devices == 1:
        return x
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    shape, dtype = x.shape, x.dtype
    total = 1
    for s in shape:
        total *= s
    chunk = -(-total // n_devices)
    chunk = -(-chunk // LANES) * LANES                 # lane-aligned chunks
    flat = jnp.zeros((n_devices * chunk,), dtype).at[:total].set(
        x.reshape(-1))
    xv = flat.reshape(n_devices, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((n_devices, chunk), lambda i, m: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_devices, chunk), lambda i, m: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk), dtype),             # double-buffer
            pltpu.SemaphoreType.DMA((2,)),             # send per slot
            pltpu.SemaphoreType.DMA((2,)),             # recv per slot
            pltpu.SemaphoreType.REGULAR,               # consumption acks
        ])
    out = pl.pallas_call(
        functools.partial(_ring_kernel, n=n_devices),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_devices, chunk), dtype),
        compiler_params=pltpu.CompilerParams(
            collective_id=collective_id, has_side_effects=True),
        interpret=interpret,
    )(my[None], xv)
    return out.reshape(-1)[:total].reshape(shape)
