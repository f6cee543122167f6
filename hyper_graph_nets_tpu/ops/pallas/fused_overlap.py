"""Compute-overlapped halo exchange: fused MP-block kernel + banded RDMA ring.

The separate-pass halo paths (fused_edge_block_collective's psum/pmax/pmin,
or ops/pallas/ring.py's RDMA ring) expose the full all-reduce latency after
the local compute finishes.  This kernel is the SURVEY §2 / §7.8
"compute-overlapped boundary exchange": node rows are split into NB static
row BANDS, and because edges are receiver-sorted, band b's local pna
partials are final after a statically known chunk (its *completion chunk*).
The kernel runs the chunked compute grid and, the moment a band completes,
STARTS its contribution onto a double-buffered
``pltpu.make_async_remote_copy`` ring — the DMA flies while later chunks
compute (compute chunk k while chunk k-1's partials are in flight).  Each
subsequent grid step folds one arrived hop and forwards it, so at any time
at most one outstanding DMA per band overlaps one chunk of compute.

Safety protocol (per band, slots double-buffered):
- one neighbor barrier before any RDMA (grid step 0);
- hop s (s=1..n-1) is waited with the same descriptor that started it, so
  the wait covers BOTH my forward-read of the previous slot and the
  arrival of the new one;
- a slot is handed back to the LEFT neighbor with an explicit
  ``free`` credit (regular semaphore, remote signal) only after this
  device has folded it and its forward-read completed — the sender WAITS
  that credit before the next send into the slot, so no RDMA can land in
  a buffer that is still being read (the race interpret mode cannot see).

The ring schedule (``BandPlan.ov_sched``) is built on the host as the MAX
over shards of each band's completion chunk, so every device runs the same
schedule and the semaphore graph stays acyclic.  Validated in interpret
mode on the virtual CPU mesh (tests/test_overlap.py); on hardware the RDMA
rides ICI.

Replaces (tpu-natively) the reference's single-process aggregation — the
reference has no distributed path at all (src/migration/graphnet.py does
dense one-process scatter); this is new capability, cited for parity
bookkeeping only.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyper_graph_nets_tpu.ops.pallas.fused_block import (
    _BIG,
    BandPlan,
    _edge_weights,
    _fwd_kernel,
    _pad_to_plan,
    _round_up,
    plan_node_rows,
)

Array = jax.Array


def band_dims(plan: BandPlan, num_nodes: int, n_bands: int) -> Tuple[int, int]:
    """(NB, RB): final band count and rows per band (8-aligned).

    Deterministic fixpoint so the host schedule builder and the kernel
    wrapper (which only sees the final NB via ``ov_sched.shape[1]``)
    derive the SAME RB from (Nr, NB).
    """
    nr = plan_node_rows(plan, num_nodes)
    nb = max(1, min(n_bands, nr))
    while True:
        rb = _round_up(-(-nr // nb), 8)
        nb2 = max(1, -(-nr // rb))
        if nb2 == nb:
            return nb, rb
        nb = nb2


def build_overlap_schedule(
    shard_plans: List[BandPlan],
    num_nodes: int,
    num_shards: int,
    n_bands: int = 4,
) -> Array:
    """Host: per-band ring start schedule, [1, NB] int32.

    ``shard_plans``: the per-shard plans (identical forced dims) that
    build_sharded_band_plans stacks.  Band b's completion chunk on shard s
    is the last non-empty chunk whose receiver window [r_lo, r_lo+WR)
    intersects rows [b*RB, (b+1)*RB); the schedule is the max over shards
    (every device starts band b's ring at the same grid step, so the
    semaphore ordering is uniform).
    """
    p0 = shard_plans[0]
    nb, rb = band_dims(p0, num_nodes, n_bands)
    C = p0.C
    done = np.zeros((num_shards, nb), np.int64)
    for s, p in enumerate(shard_plans):
        r_lo = np.asarray(p.r_lo)[0]  # [C]
        nonempty = np.asarray(p.m_col).reshape(C, -1).any(axis=1)  # [C]
        for c in range(C):
            if not nonempty[c]:
                continue
            b_lo = int(r_lo[c]) // rb
            b_hi = min((int(r_lo[c]) + p.WR - 1) // rb, nb - 1)
            done[s, b_lo : b_hi + 1] = np.maximum(
                done[s, b_lo : b_hi + 1], c
            )
    sched = done.max(axis=0)
    sched = np.maximum.accumulate(sched)  # receiver-sorted => nondecreasing
    sched = np.clip(sched, 0, C - 1)
    return jnp.asarray(sched, jnp.int32).reshape(1, nb)


def chunk_roundrobin_permutation(
    n_edges_padded: int, num_shards: int, chunk: int
) -> np.ndarray:
    """Edge permutation that makes the overlap schedule actually overlap.

    Contiguous receiver-sorted sharding gives shard s receivers
    ~[s/S, (s+1)/S) of the row space — shard s's LAST chunks still write
    band ~s, so the max-over-shards schedule degenerates to "start
    everything after the last chunk" (zero overlap).  Round-robin by
    chunk (shard s takes global chunks s, s+S, s+2S, ...) keeps every
    shard walking the WHOLE receiver range in the same order: band b
    completes on every shard at local chunk ~(b+1)C/NB, so the uniform
    schedule starts early bands' rings while later chunks compute.
    Receivers stay sorted within each shard (global chunks are taken in
    increasing order) and prefix-validity is preserved per shard.
    """
    if n_edges_padded % (chunk * num_shards):
        raise ValueError(
            f"padded edge count {n_edges_padded} must divide into "
            f"chunk*num_shards = {chunk * num_shards}"
        )
    n_chunks = n_edges_padded // chunk
    order = np.concatenate(
        [np.arange(s, n_chunks, num_shards) for s in range(num_shards)]
    )
    return (
        order[:, None] * chunk + np.arange(chunk)[None, :]
    ).reshape(-1)


def _mesh_neighbors(axis_name: str, mesh_axes) -> Tuple:
    """(left, right) LOGICAL device ids of the ring neighbors.

    ``mesh_axes``: static ((name, size), ...) in mesh order.  Needed on
    multi-axis meshes: Pallas LOGICAL ids are the linearized mesh ids, so
    a ring over one axis must keep the other axes' coordinates fixed.
    With an empty ``mesh_axes`` (1-D mesh), the axis index IS the id.
    """
    n = jax.lax.axis_size(axis_name)
    g = jax.lax.axis_index(axis_name)
    if not mesh_axes:
        return jax.lax.rem(g + n - 1, n), jax.lax.rem(g + 1, n)
    strides = {}
    stride = 1
    for name, size in reversed(list(mesh_axes)):
        strides[name] = stride
        stride *= size
    gid = sum(
        jax.lax.axis_index(name) * strides[name] for name, _ in mesh_axes
    )
    sg = strides[axis_name]
    right = gid + (jax.lax.rem(g + 1, n) - g) * sg
    left = gid + (jax.lax.rem(g + n - 1, n) - g) * sg
    return left, right


def _overlap_kernel(
    sched_ref,  # SMEM (1, NB) int32: per-band ring start grid step
    ws_ref,  # SMEM (SB, C): per-subchunk sender-window starts
    rlo_ref,  # SMEM (1, C)
    e_ref,
    sp_ref,
    rp_ref,
    sndT_ref,
    rcvT_ref,
    rcvrow_ref,
    mT_ref,
    we_ref,
    w2_ref,
    w3_ref,
    b1_ref,
    b2_ref,
    b3_ref,
    lns_ref,
    lnb_ref,
    e2_ref,
    agg_ref,  # out (1, NB*RB, 4L) f32 — local partials, folded in place
    comm,  # VMEM (NB, 2, RB, 4L) f32 double-buffered ring slots
    send_sem,  # DMA (NB, 2)
    recv_sem,  # DMA (NB, 2)
    free_sem,  # REGULAR (NB, 2): "my slot x is writable" credits from right
    *,
    L: int,
    W: int,
    WR: int,
    C: int,
    G: int,
    NB: int,
    RB: int,
    scan_steps: int,
    cdt,
    axis_name: str,
    n: int,
    mesh_axes,
):
    c = pl.program_id(1)

    @pl.when(c < C)
    def _compute():
        _fwd_kernel(
            ws_ref, rlo_ref, e_ref, sp_ref, rp_ref, sndT_ref, rcvT_ref,
            rcvrow_ref, mT_ref, we_ref, w2_ref, w3_ref, b1_ref, b2_ref,
            b3_ref, lns_ref, lnb_ref, e2_ref, agg_ref,
            L=L, W=W, WR=WR, C=C, scan_steps=scan_steps, cdt=cdt,
            finalize=False,
        )

    if n > 1:
        left, right = _mesh_neighbors(axis_name, mesh_axes)

        # one barrier per BATCH ROW (c == 0 fires at every program_id(0)):
        # besides the launch-ordering role, for rows >= 1 it is the
        # correctness fence that stops a fast device's row-r hop-1 RDMA
        # from landing in a neighbor's comm slot the neighbor is still
        # reading in row r-1 (a device only signals row r's barrier after
        # its row r-1 ring fully drained, by grid order)
        @pl.when(c == 0)
        def _barrier():
            # no RDMA before both neighbors' kernels have launched
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

        for b in range(NB):  # static unroll; per-band buffers + semaphores
            s = c - sched_ref[0, b]
            lo = b * RB

            def rdma(src_slot, dst_slot, b=b):
                return pltpu.make_async_remote_copy(
                    src_ref=comm.at[b, src_slot],
                    dst_ref=comm.at[b, dst_slot],
                    send_sem=send_sem.at[b, src_slot],
                    recv_sem=recv_sem.at[b, dst_slot],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

            @pl.when(s == 0)
            def _start(b=b, lo=lo, rdma=rdma):
                # band complete locally: snapshot + put hop 1 in flight;
                # compute of later chunks proceeds while it rides the ring
                comm[b, 0] = agg_ref[0, pl.ds(lo, RB), :]
                rdma(0, 1).start()

            @pl.when((s >= 1) & (s <= n - 1))
            def _fold(b=b, lo=lo, s=s, rdma=rdma):
                slot = jax.lax.rem(s, 2)
                prev = jax.lax.rem(s + 1, 2)  # == (s-1) % 2
                # same descriptor that started at step s-1: waits my
                # forward-read of `prev` AND the hop-s arrival into `slot`
                rdma(prev, slot).wait()
                blk = comm[b, slot]
                cur = agg_ref[0, pl.ds(lo, RB), :]
                agg_ref[0, pl.ds(lo, RB), :] = jnp.concatenate(
                    [
                        cur[:, : 2 * L] + blk[:, : 2 * L],
                        jnp.maximum(
                            cur[:, 2 * L : 3 * L], blk[:, 2 * L : 3 * L]
                        ),
                        jnp.minimum(cur[:, 3 * L :], blk[:, 3 * L :]),
                    ],
                    axis=-1,
                )

                @pl.when(s <= n - 2)
                def _forward(b=b, slot=slot, prev=prev, rdma=rdma):
                    # hand `prev` back to the left neighbor, acquire the
                    # right neighbor's matching credit, forward hop s+1
                    pltpu.semaphore_signal(
                        free_sem.at[b, prev], inc=1, device_id=left,
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
                    pltpu.semaphore_wait(free_sem.at[b, prev], 1)
                    rdma(slot, prev).start()

    @pl.when(c == G - 1)
    def _finalize():
        su = agg_ref[:, :, :L]
        cnt = agg_ref[:, :, L : 2 * L]
        mx = agg_ref[:, :, 2 * L : 3 * L]
        mn = agg_ref[:, :, 3 * L :]
        agg_ref[:, :, L : 2 * L] = su / jnp.maximum(cnt, 1.0)
        agg_ref[:, :, 2 * L : 3 * L] = jnp.where(mx <= -_BIG / 2, 0.0, mx)
        agg_ref[:, :, 3 * L :] = jnp.where(mn >= _BIG / 2, 0.0, mn)


def fused_edge_block_collective_overlap(
    e: Array,  # [E_local, L] local edge shard (receiver-sorted slice)
    sp: Array,  # [N, L] node parts, replicated
    rp: Array,
    weights: dict,
    plan: BandPlan,  # LOCAL plan view (inside shard_map), ov_sched set
    num_nodes: int,
    axis_name: str,
    interpret: Optional[bool] = None,
    mesh_axes=(),
) -> Tuple[Array, Array]:
    """One kernel: local fused compute + compute-overlapped banded ring.

    Drop-in for :func:`fused_edge_block_collective` when the stacked plan
    carries ``ov_sched`` (build_sharded_band_plans(..., overlap_bands=NB)).
    Forward-only, matching the explicit halo path's contract
    (parallel/halo.py).  ``mesh_axes`` — static ((name, size), ...) in
    mesh order — is REQUIRED on multi-axis meshes so the ring's logical
    device ids keep the other axes' coordinates fixed
    (nn/blocks.GNNConfig.halo_mesh_axes plumbs it).
    """
    e2, agg = _overlap_fwd_call(
        e[None], sp[None], rp[None], weights, plan, num_nodes, axis_name,
        interpret, mesh_axes,
    )
    E = e.shape[-2]
    return e2[0, :E], agg[0, :num_nodes]


def _overlap_fwd_call(
    e3: Array,  # [B, E_local, L]
    sp3: Array,  # [B, N, L]
    rp3: Array,
    weights: dict,
    plan: BandPlan,
    num_nodes: int,
    axis_name: str,
    interpret: Optional[bool] = None,
    mesh_axes=(),
) -> Tuple[Array, Array]:
    """Batched core: grid (B, G); each batch row runs its own ring pass,
    fenced by the per-row neighbor barrier.  Returns padded
    ([B, E_pad, L], [B, NB*RB, 4L]) with agg FINALIZED."""
    if plan.ov_sched is None:
        raise ValueError(
            "overlap halo needs a plan built with overlap_bands "
            "(build_sharded_band_plans(..., overlap_bands=...))"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True:
        # TPU-interpret machinery (emulates remote DMA + semaphores).
        # Emulator quirk: a ring over EVERY virtual device of the process
        # can stall (cross-grid-step semaphore waits starve the emulator's
        # scheduler); keep >= 1 spare virtual device on CPU test meshes —
        # e.g. an 8-device ring needs
        # --xla_force_host_platform_device_count=16.  Hardware rings have
        # no such constraint (DMAs progress independently of the core).
        interpret = pltpu.InterpretParams()
    n = jax.lax.axis_size(axis_name)
    B, _, L = e3.shape
    NB = plan.ov_sched.shape[1]
    _, RB = band_dims(plan, num_nodes, NB)
    nr_pad = NB * RB
    weights = _edge_weights(weights)
    e_pad, sp_pad, rp_pad = _pad_to_plan(e3, sp3, rp3, plan, num_nodes)
    extra = nr_pad - sp_pad.shape[1]
    if extra:
        sp_pad = jnp.pad(sp_pad, ((0, 0), (0, extra), (0, 0)))
        rp_pad = jnp.pad(rp_pad, ((0, 0), (0, extra), (0, 0)))
    T, C, W, WR = plan.T, plan.C, plan.W, plan.WR
    E_pad = C * T
    G = C if n == 1 else C + n
    cdt = e_pad.dtype
    kernel = functools.partial(
        _overlap_kernel,
        L=L, W=W, WR=WR, C=C, G=G, NB=NB, RB=RB,
        scan_steps=plan.scan_steps, cdt=cdt,
        axis_name=axis_name, n=n, mesh_axes=tuple(mesh_axes),
    )
    row = lambda a: a.reshape(1, -1)
    cc = lambda c: jnp.minimum(c, C - 1)  # clamp drain steps in index maps
    e2, agg = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, E_pad, L), e_pad.dtype),
            jax.ShapeDtypeStruct((B, nr_pad, 4 * L), jnp.float32),
        ),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, NB), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (plan.SB, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, C), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, L), lambda b, c: (b, cc(c), 0)),
            pl.BlockSpec((1, nr_pad, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, nr_pad, L), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (cc(c), 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (cc(c), 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, c: (cc(c), 0, 0)),
            pl.BlockSpec((1, T, 1), lambda b, c: (cc(c), 0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((L, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, L), lambda b, c: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, T, L), lambda b, c: (b, cc(c), 0)),
            pl.BlockSpec((1, nr_pad, 4 * L), lambda b, c: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((NB, 2, RB, 4 * L), jnp.float32),
            pltpu.SemaphoreType.DMA((NB, 2)),
            pltpu.SemaphoreType.DMA((NB, 2)),
            pltpu.SemaphoreType.REGULAR((NB, 2)),
        ],
        interpret=interpret,
        # collective_id only with a ring: Mosaic rejects it when the kernel
        # uses no barrier semaphore (the n == 1 degenerate path)
        compiler_params=pltpu.CompilerParams(
            collective_id=1 if n > 1 else None, has_side_effects=True
        ),
    )(
        plan.ov_sched,
        plan.w_s,
        plan.r_lo,
        e_pad,
        sp_pad,
        rp_pad,
        plan.snd_col,
        plan.rcv_col,
        plan.rcv_row,
        plan.m_col,
        weights["we"],
        weights["w2"],
        weights["w3"],
        row(weights["b1"]),
        row(weights["b2"]),
        row(weights["b3"]),
        row(weights["lns"]),
        row(weights["lnb"]),
    )
    return e2, agg
