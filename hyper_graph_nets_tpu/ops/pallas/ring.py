"""Pallas ring all-reduce over a mesh axis (the explicit halo-exchange path).

The GSPMD/shard_map aggregation path (core.segment_ops.collective_aggregate)
lets XLA lower ``psum``/``pmax``/``pmin`` to its own ICI collectives.  This
module is the hand-scheduled equivalent the SURVEY (§7.8) calls for: a
bi-buffer ring built from ``pltpu.make_async_remote_copy`` — each device
forwards the chunk it received (every original contribution visits every
device exactly once) and folds it into its accumulator with a per-segment
combine (sum / max / min), so one ring pass carries all of a pna
aggregation's partials.

On TPU hardware the RDMA rides ICI; on the CPU test mesh the kernel runs in
Pallas interpret mode (tests/test_ring.py validates against psum/pmax/pmin).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_COMBINE = {
    "sum": lambda a, b: a + b,
    "max": jnp.maximum,
    "min": jnp.minimum,
}


def ring_all_reduce_segments(
    x: Array,
    segments: Sequence[Tuple[int, int, str]],
    axis_name: str,
    interpret: bool | None = None,
    mesh_axes=(),
) -> Array:
    """All-reduce ``x`` over ``axis_name`` with per-row-segment combine ops.

    ``x``: the device-local partial, shape [R, C]; must be identical-shape on
    every device of the axis.  ``segments``: static (row_lo, row_hi, op)
    triples covering rows, op in {sum, max, min}.  Must be called inside
    ``shard_map`` over a mesh containing ``axis_name``.  On a multi-axis
    mesh, pass ``mesh_axes`` = static ((name, size), ...) in mesh order so
    the ring's logical device ids keep the other axes' coordinates fixed.
    Returns the combined array (identical on every device).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if interpret is True:
        # the TPU-interpret machinery (not the legacy interpreter): emulates
        # remote DMA across devices and lowers cleanly inside larger jits
        interpret = pltpu.InterpretParams()
    for lo, hi, op in segments:
        if op not in _COMBINE:
            raise ValueError(f"unknown combine op {op!r}")

    def kernel(in_ref, out_ref, comm, send_sem, recv_sem, credit):
        from hyper_graph_nets_tpu.ops.pallas.fused_overlap import (
            _mesh_neighbors,
        )

        n = jax.lax.axis_size(axis_name)
        # logical ids are linearized mesh ids: on multi-axis meshes the
        # ring must keep the other axes' coordinates fixed (mesh_axes)
        left, right = _mesh_neighbors(axis_name, mesh_axes)
        out_ref[:] = in_ref[:]
        comm[0] = in_ref[:]

        # neighbor barrier before any RDMA: without it a device can DMA into
        # its right neighbor's comm scratch before that neighbor's kernel has
        # even launched (its VMEM may still belong to a previous computation).
        # Standard collective-Pallas pattern: signal both neighbors on the
        # global barrier semaphore, wait for both their signals.
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 2)

        def body(step, _):
            send_slot = jax.lax.rem(step, 2)
            recv_slot = jax.lax.rem(step + 1, 2)

            # flow control: two buffers alone do NOT prevent a fast left
            # neighbor from running 2 steps ahead and overwriting our
            # comm[recv_slot] before we forwarded it (observed as corrupt
            # laps under load in interpret mode — a real schedule race, not
            # emulation noise).  Before writing the right neighbor's
            # comm[recv_slot] we must hold its credit saying that slot was
            # forwarded; the first write of each slot (steps 0 and 1 -> the
            # pre-ring barrier) needs none.
            @pl.when(step > 0)
            def _acquire():
                pltpu.semaphore_wait(credit.at[recv_slot], 1)

            rdma = pltpu.make_async_remote_copy(
                src_ref=comm.at[send_slot],
                dst_ref=comm.at[recv_slot],
                send_sem=send_sem.at[send_slot],
                recv_sem=recv_sem.at[recv_slot],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait()

            # our comm[send_slot] is forwarded (send_sem waited above):
            # grant the left neighbor its credit to rewrite that slot at
            # its step+2.  Skip the last grants nobody will consume so all
            # semaphores drain to zero at kernel exit.
            @pl.when(step < n - 2)
            def _grant():
                pltpu.semaphore_signal(
                    credit.at[send_slot], inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

            for lo, hi, op in segments:
                out_ref[lo:hi, :] = _COMBINE[op](
                    out_ref[lo:hi, :], comm[recv_slot][lo:hi, :]
                )
            return _

        jax.lax.fori_loop(0, n - 1, body, None)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + x.shape, x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),  # per-slot flow-control credits
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            collective_id=0, has_side_effects=True
        ),
    )(x)


def ring_psum(x: Array, axis_name: str, interpret: bool | None = None) -> Array:
    """Plain ring all-reduce-sum (2-D ``x``)."""
    return ring_all_reduce_segments(
        x, [(0, x.shape[0], "sum")], axis_name, interpret
    )
