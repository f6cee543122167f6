"""Pallas TPU kernel: receiver-sorted pna aggregation without scatters.

The pna edge->node aggregation (sum, mean, max, min in the reference's
order, reference src/migration/graphnet.py:52-64) is the framework's SpMM.
XLA lowers it to scatter-adds (the TPU slow path; measured +94 ms/step at
bench shapes) or a ``[N, d_max, L]`` gather (``segment_ops.gather_aggregate``,
+34 ms/step).  This kernel exploits the fact that :mod:`core.mesh` sorts
edges by receiver: partitioned into 128-node blocks, each node block owns a
*contiguous* edge range, so aggregation becomes

- a segmented Hillis-Steele scan over each 128-edge chunk (receiver
  equality delimits segments; ``ceil(log2(seg_max))`` roll steps on the
  VPU) producing per-segment sum/max/min at each segment's last edge, then
- a last-edge one-hot selection matmul ``[128, T] @ [T, 3L]`` on the MXU —
  zero scatters, zero gathers.

Edge chunks are loaded at 128-aligned offsets; rows belonging to other node
blocks are annihilated by the one-hot (equality against this block's row
window), so alignment costs no correctness.  Masked (padded) edges must sit
at the receiver-sorted tail; the wrapper remaps them to a virtual receiver
``n_pad`` so the array stays sorted and no node block ever selects them.

Mosaic cannot index the lane dimension at a dynamic offset, so per-chunk
receiver/mask columns ``[T, 1]`` are *selected by matmul*: the chunk-
transposed layout ``[T, n_chunks]`` times a one-hot column ``[n_chunks, 1]``
(standard-form MM, MXU-legal at any offset).

The backward routes node cotangents back to edges with the *transposed*
one-hot matmul (again MXU, scatter-free), mirroring
``segment_ops.pna_gather``'s gather-only VJP semantics (max/min cotangents
flow to every tied argmax edge).  The mean term's degree division happens
outside the kernel (elementwise, XLA-fused into the cotangent pack).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NB = 128  # node block (one-hot rows; MXU tile)
T = 128  # edge chunk (one-hot cols; MXU tile)
_BIG = 1e30
HIGHEST = jax.lax.Precision.HIGHEST
# wrapper falls back to XLA when the edge block would exceed this VMEM share
MAX_EDGE_BLOCK_BYTES = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scan_steps(seg_max: int) -> int:
    steps = 0
    while (1 << steps) < min(seg_max, T):
        steps += 1
    return steps


def _select_cols(zT_ref, bi, ncb_pad):
    """[T, 1] column ``bi`` of a [T, ncb_pad] f32 ref, via one-hot matmul.

    Mosaic requires lane-dim offsets provably 128-aligned; a one-hot
    column-select matmul works at any dynamic offset and is one MXU pass.
    HIGHEST precision: receiver ids exceed bf16's 8-bit mantissa.
    """
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (ncb_pad, 1), 0) == bi
    ).astype(jnp.float32)
    return jnp.dot(
        zT_ref[...], sel, preferred_element_type=jnp.float32,
        precision=HIGHEST,
    )


def _fwd_kernel(
    es_ref,  # SMEM (1, n_blocks+1) int32: per-node-block edge range starts
    d_ref,  # VMEM (1, E_pad, L): edge features (one batch row)
    rrow_ref,  # VMEM (1, E_pad) int32: receivers, row layout
    rT_ref,  # VMEM (T, ncb_pad) f32: receivers, chunk-transposed layout
    mT_ref,  # VMEM (T, ncb_pad) f32: mask, chunk-transposed layout
    out_ref,  # VMEM (1, NB, 4L)
    *,
    L: int,
    scan_steps: int,
    ncb_pad: int,
):
    j = pl.program_id(1)
    base = j * NB

    s = es_ref[0, j]
    e = es_ref[0, j + 1]
    s_al = (s // T) * T
    n_chunks = jnp.where(e > s, (e - s_al + T - 1) // T, 0)

    niota = jax.lax.broadcasted_iota(jnp.int32, (NB, T), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    riota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

    def chunk(c, carry):
        acc_s, acc_c, acc_mx, acc_mn = carry
        off = pl.multiple_of(s_al + c * T, T)
        bi = off // T
        d = d_ref[0, pl.ds(off, T), :].astype(jnp.float32)  # [T, L]
        rrow = rrow_ref[:, pl.ds(off, T)]  # [1, T]
        rcol = _select_cols(rT_ref, bi, ncb_pad)  # [T, 1] f32
        mcol = _select_cols(mT_ref, bi, ncb_pad)  # [T, 1] f32

        # one-hot of this block's rows; other blocks' rows and the padded
        # tail (receiver n_pad) fall outside [0, NB) and match nothing.
        oh = (niota == (rrow - base)).astype(jnp.float32)  # [NB, T]

        valid = mcol > 0.0
        dw = d * mcol  # mask-weighted data for sum
        cw = mcol  # mask-weighted ones for counts
        dmx = jnp.where(valid, d, -_BIG)
        dmn = jnp.where(valid, d, _BIG)

        # segmented inclusive scans along the chunk: receiver equality is
        # the segment indicator (edges of one receiver are contiguous).
        k = 1
        for _ in range(scan_steps):
            same = (rcol == pltpu.roll(rcol, k, axis=0)) & (riota >= k)
            dw = jnp.where(same, dw + pltpu.roll(dw, k, axis=0), dw)
            cw = jnp.where(same, cw + pltpu.roll(cw, k, axis=0), cw)
            dmx = jnp.where(
                same, jnp.maximum(dmx, pltpu.roll(dmx, k, axis=0)), dmx
            )
            dmn = jnp.where(
                same, jnp.minimum(dmn, pltpu.roll(dmn, k, axis=0)), dmn
            )
            k *= 2

        # the last edge of each within-chunk segment holds the full
        # chunk-partial aggregate; segments spanning chunks combine in acc.
        nxt = pltpu.roll(rrow, T - 1, axis=1)  # rrow shifted by -1
        is_last = ((rrow != nxt) | (ciota == T - 1)).astype(jnp.float32)
        ohl = oh * is_last  # [NB, T]; <=1 nonzero per row

        # HIGHEST: one-hot rows select single f32 values — bf16 MXU passes
        # would truncate the aggregates (default TPU precision is bf16).
        sel = jnp.dot(
            ohl,
            jnp.concatenate([dw, dmx, dmn], axis=-1),
            preferred_element_type=jnp.float32,
            precision=HIGHEST,
        )  # [NB, 3L]
        cnt = jnp.dot(
            ohl, cw, preferred_element_type=jnp.float32, precision=HIGHEST
        )  # [NB, 1]
        pres = jnp.sum(ohl, axis=1, keepdims=True) > 0.0  # [NB, 1]

        acc_s = acc_s + sel[:, :L]
        acc_c = acc_c + jnp.broadcast_to(cnt, (NB, L))
        acc_mx = jnp.where(
            pres, jnp.maximum(acc_mx, sel[:, L : 2 * L]), acc_mx
        )
        acc_mn = jnp.where(
            pres, jnp.minimum(acc_mn, sel[:, 2 * L :]), acc_mn
        )
        return acc_s, acc_c, acc_mx, acc_mn

    init = (
        jnp.zeros((NB, L), jnp.float32),
        jnp.zeros((NB, L), jnp.float32),
        jnp.full((NB, L), -_BIG, jnp.float32),
        jnp.full((NB, L), _BIG, jnp.float32),
    )
    sums, cnt, mx, mn = jax.lax.fori_loop(0, n_chunks, chunk, init)

    dt = out_ref.dtype
    out_ref[0, :, :L] = sums.astype(dt)
    out_ref[0, :, L : 2 * L] = (sums / jnp.maximum(cnt, 1.0)).astype(dt)
    out_ref[0, :, 2 * L : 3 * L] = jnp.where(mx <= -_BIG / 2, 0.0, mx).astype(dt)
    out_ref[0, :, 3 * L :] = jnp.where(mn >= _BIG / 2, 0.0, mn).astype(dt)


def _bwd_kernel(
    es_ref,  # SMEM (1, n_blocks+1) int32
    d_ref,  # VMEM (1, E_pad, L): forward edge features (for argmax ties)
    rT_ref,  # VMEM (T, ncb_pad) f32
    mT_ref,  # VMEM (T, ncb_pad) f32
    rhs_ref,  # VMEM (1, NB, 5L): [g_sum + g_mean/deg | mx | g_max | mn | g_min]
    ge_ref,  # VMEM (1, E_pad, L) out: edge cotangents
    *,
    L: int,
    ncb_pad: int,
):
    j = pl.program_id(1)
    base = j * NB

    s = es_ref[0, j]
    e = es_ref[0, j + 1]
    s_al = (s // T) * T
    n_chunks = jnp.where(e > s, (e - s_al + T - 1) // T, 0)

    rhs = rhs_ref[0].astype(jnp.float32)  # [NB, 5L]
    tiota = jax.lax.broadcasted_iota(jnp.int32, (T, NB), 1)
    riota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

    def chunk(c, _):
        off = pl.multiple_of(s_al + c * T, T)
        bi = off // T
        rcol = _select_cols(rT_ref, bi, ncb_pad)  # [T, 1] f32
        mcol = _select_cols(mT_ref, bi, ncb_pad)  # [T, 1] f32
        ohT = (tiota == (rcol.astype(jnp.int32) - base)).astype(
            jnp.float32
        )  # [T, NB]
        got = jnp.dot(
            ohT, rhs, preferred_element_type=jnp.float32, precision=HIGHEST
        )  # [T, 5L]
        d = d_ref[0, pl.ds(off, T), :].astype(jnp.float32)
        ge = got[:, :L]
        ge = ge + jnp.where(d == got[:, L : 2 * L], got[:, 2 * L : 3 * L], 0.0)
        ge = ge + jnp.where(d == got[:, 3 * L : 4 * L], got[:, 4 * L :], 0.0)
        ge = ge * mcol
        # aligned chunks at block boundaries are shared with the neighboring
        # node block: read-modify-write only this block's rows (the TPU grid
        # is sequential, so the RMW is race-free).
        row = off + riota
        keep = (row >= s) & (row < e)
        prev = ge_ref[0, pl.ds(off, T), :]
        ge_ref[0, pl.ds(off, T), :] = jnp.where(
            keep, ge.astype(ge_ref.dtype), prev
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _prepare(receivers: Array, mask: Optional[Array], num_nodes: int):
    """Remap padded receivers past the node space and build both layouts."""
    E = receivers.shape[0]
    n_blocks = _round_up(max(num_nodes, 1), NB) // NB
    n_pad = n_blocks * NB
    E_pad = _round_up(E, T) + T
    if mask is None:
        m = jnp.ones((E,), jnp.float32)
        r = receivers.astype(jnp.int32)
    else:
        m = mask.astype(jnp.float32)
        # padded tail edges (mask 0, receiver pinned to row 0 by
        # core.mesh.pad_edges) must sort past every real receiver
        r = jnp.where(m > 0, receivers.astype(jnp.int32), n_pad)
    r_full = jnp.concatenate([r, jnp.full((E_pad - E,), n_pad, jnp.int32)])
    m_full = jnp.concatenate([m, jnp.zeros((E_pad - E,), jnp.float32)])
    block_starts = jnp.arange(n_blocks + 1, dtype=jnp.int32) * NB
    e_start = jnp.searchsorted(r_full, block_starts, side="left").astype(jnp.int32)
    ncb = E_pad // T
    ncb_pad = _round_up(ncb, 128)
    rrow = r_full.reshape(1, E_pad)
    # chunk-transposed layouts, f32 (ids < 2^24: exact), lane-padded so the
    # one-hot column-select matmul has a 128-multiple contraction dim
    rT = jnp.pad(
        r_full.reshape(ncb, T).T.astype(jnp.float32),
        ((0, 0), (0, ncb_pad - ncb)),
    )
    mT = jnp.pad(m_full.reshape(ncb, T).T, ((0, 0), (0, ncb_pad - ncb)))
    return rrow, rT, mT, e_start.reshape(1, n_blocks + 1), n_blocks, E_pad, ncb_pad


def _pna_sorted_fwd_call(
    data3: Array,  # [B, E, L]
    rrow: Array,
    rT: Array,
    mT: Array,
    e_start: Array,
    n_blocks: int,
    E_pad: int,
    ncb_pad: int,
    seg_max: int,
    interpret: bool,
) -> Array:
    B, E, L = data3.shape
    d_pad = jnp.pad(data3, ((0, 0), (0, E_pad - E), (0, 0)))
    grid = (B, n_blocks)
    kernel = functools.partial(
        _fwd_kernel, L=L, scan_steps=_scan_steps(seg_max), ncb_pad=ncb_pad
    )
    nb1 = n_blocks + 1
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_blocks * NB, 4 * L), data3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, nb1), lambda b, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, E_pad, L), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, E_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (T, ncb_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (T, ncb_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, NB, 4 * L), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(e_start, d_pad, rrow, rT, mT)
    return out


def _pna_sorted_bwd_call(
    rhs_pack: Array,  # [B, n_pad, 5L]
    data3: Array,  # [B, E, L]
    rrow: Array,
    rT: Array,
    mT: Array,
    e_start: Array,
    n_blocks: int,
    E_pad: int,
    ncb_pad: int,
    interpret: bool,
) -> Array:
    B, E, L = data3.shape
    d_pad = jnp.pad(data3, ((0, 0), (0, E_pad - E), (0, 0)))
    kernel = functools.partial(_bwd_kernel, L=L, ncb_pad=ncb_pad)
    nb1 = n_blocks + 1
    ge = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, E_pad, L), data3.dtype),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, nb1), lambda b, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, E_pad, L), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (T, ncb_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (T, ncb_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, NB, 5 * L), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, E_pad, L), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(e_start, d_pad, rT, mT, rhs_pack)
    # rows remapped past the node space (masked / padded edges) are covered
    # by no node block: the kernel never writes them, so the memory is
    # uninitialized — zero them here (where, not *: NaN * 0 == NaN).
    covered = (rrow[0, :E] < n_blocks * NB)[None, :, None]
    return jnp.where(covered, ge[:, :E, :], 0.0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def pna_sorted(
    data: Array,
    receivers: Array,
    mask: Optional[Array],
    num_nodes: int,
    seg_max: int = 32,
    interpret: Optional[bool] = None,
) -> Array:
    """pna aggregation (sum|mean|max|min concat) for receiver-sorted edges.

    ``data``: [E, L] or [B, E, L] (topology shared across the batch);
    ``receivers``: [E] int32, non-decreasing over valid edges with masked
    edges at the tail; ``mask``: [E] float 1/0 or None.  Returns
    [..., num_nodes, 4L], identical to ``segment_ops.aggregate(..., 'pna')``.
    ``seg_max`` bounds the largest receiver degree (checked by the caller;
    wrong bounds give wrong maxima).
    """
    out, _ = _pna_sorted_fwd(data, receivers, mask, num_nodes, seg_max, interpret)
    return out


def _pna_sorted_fwd(data, receivers, mask, num_nodes, seg_max, interpret):
    if interpret is None:  # Mosaic on TPU, interpreter elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
    squeeze = data.ndim == 2
    data3 = data[None] if squeeze else data
    rrow, rT, mT, e_start, n_blocks, E_pad, ncb_pad = _prepare(
        receivers, mask, num_nodes
    )
    raw = _pna_sorted_fwd_call(
        data3, rrow, rT, mT, e_start, n_blocks, E_pad, ncb_pad, seg_max,
        interpret,
    )
    out = raw[:, :num_nodes, :]
    if squeeze:
        out = out[0]
    res = (data3, raw, rrow, rT, mT, e_start, receivers)
    return out, res


def _pna_sorted_bwd(num_nodes, seg_max, interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data3, raw, rrow, rT, mT, e_start, receivers = res
    B, E, L = data3.shape
    n_blocks = raw.shape[1] // NB
    E_pad = rrow.shape[1]
    ncb_pad = rT.shape[1]
    squeeze = g.ndim == 2
    g3 = g[None] if squeeze else g
    n_pad = n_blocks * NB
    g_pad = jnp.pad(g3, ((0, 0), (0, n_pad - num_nodes), (0, 0)))
    # per-node valid degree (count semantics of the forward) — elementwise
    # preprocessing fused by XLA, so the kernel needs no degree input
    m_row = (rrow[0, :E] < n_pad).astype(jnp.float32)
    deg = jax.ops.segment_sum(
        m_row, jnp.minimum(rrow[0, :E], n_pad - 1), n_pad
    )
    inv_deg = (1.0 / jnp.maximum(deg, 1.0))[None, :, None]
    g1 = g_pad[:, :, :L] + g_pad[:, :, L : 2 * L] * inv_deg
    rhs_pack = jnp.concatenate(
        [
            g1,
            raw[:, :, 2 * L : 3 * L],  # mx (for argmax tie routing)
            g_pad[:, :, 2 * L : 3 * L],  # g_max
            raw[:, :, 3 * L :],  # mn
            g_pad[:, :, 3 * L :],  # g_min
        ],
        axis=-1,
    )
    ge = _pna_sorted_bwd_call(
        rhs_pack, data3, rrow, rT, mT, e_start, n_blocks, E_pad, ncb_pad,
        interpret,
    )
    if squeeze:
        ge = ge[0]
    return (ge, None, None)


pna_sorted.defvjp(_pna_sorted_fwd, _pna_sorted_bwd)
