"""Masked segment aggregation primitives — the SpMM of this framework.

Replaces the reference's torch_scatter-based ``unsorted_segment_operation``
(reference src/util.py:92-134) with XLA segment ops.  All ops are
mask-aware (padded edges contribute nothing) and accept the
``indices_are_sorted`` hint — topology built by :mod:`core.mesh` is sorted by
receiver, letting XLA emit the fast sorted-segment path on TPU.

Empty-segment convention: sum/mean give 0; max/min also give 0 (matching the
reference where latents are post-ReLU/LayerNorm and empty segments never
reach a real node's update in the supported architectures).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e30
_POS_INF = 1e30


def segment_sum(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = False,
) -> Array:
    if mask is not None:
        data = data * mask[..., None]
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = False,
) -> Array:
    totals = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    ones = jnp.ones(data.shape[:-1], dtype=data.dtype)
    if mask is not None:
        ones = ones * mask
    counts = jax.ops.segment_sum(
        ones, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return totals / jnp.maximum(counts, 1.0)[..., None]


def segment_max(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = False,
) -> Array:
    if mask is not None:
        data = jnp.where(mask[..., None] > 0, data, _NEG_INF)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


def segment_min(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = False,
) -> Array:
    if mask is not None:
        data = jnp.where(mask[..., None] > 0, data, _POS_INF)
    out = jax.ops.segment_min(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return jnp.where(out >= _POS_INF / 2, 0.0, out)


def segment_std(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = False,
) -> Array:
    """Per-segment standard deviation (reference supports 'std', src/util.py:128)."""
    mean = segment_mean(data, segment_ids, num_segments, mask, indices_are_sorted)
    sq = segment_mean(data * data, segment_ids, num_segments, mask, indices_are_sorted)
    return jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))


_OPS = {
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
    "std": segment_std,
}

PNA_OPS: Sequence[str] = ("sum", "mean", "max", "min")


def unsorted_segment_operation(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    operation: str,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = False,
) -> Array:
    """Named-dispatch parity shim for reference src/util.py:92-134."""
    if operation not in _OPS:
        raise ValueError(f"invalid segment operation {operation!r}")
    return _OPS[operation](data, segment_ids, num_segments, mask, indices_are_sorted)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pna_gather(data: Array, gather_idx: Array, gather_valid: Array,
               receivers: Array, edge_mask: Array) -> Array:
    """pna aggregation over a static neighbor matrix with a gather-only VJP.

    Forward equals ``gather_aggregate(..., 'pna')``.  The hand-written
    backward routes node cotangents to edges with *gathers* indexed by
    ``receivers`` (sum/mean: direct; max/min: equality-masked) instead of
    the transposed scatter XLA AD would emit — measurably faster on TPU,
    where scatter is the slow path.  ``edge_mask`` zeroes cotangents of
    padded edges (all-ones when none).
    """
    return gather_aggregate(data, gather_idx, gather_valid, "pna")


def _pna_gather_fwd(data, gather_idx, gather_valid, receivers, edge_mask):
    out = gather_aggregate(data, gather_idx, gather_valid, "pna")
    deg = jnp.maximum(jnp.sum(gather_valid, axis=-1), 1.0)
    return out, (data, receivers, edge_mask, out, deg)


def _pna_gather_bwd(res, g):
    data, receivers, edge_mask, out, deg = res
    F = data.shape[-1]
    g_sum = g[..., :F]
    g_mean = g[..., F : 2 * F]
    g_max = g[..., 2 * F : 3 * F]
    g_min = g[..., 3 * F :]
    mx = out[..., 2 * F : 3 * F]
    mn = out[..., 3 * F :]

    take = lambda x: jnp.take(x, receivers, axis=-2)
    inv_deg = (1.0 / deg)[..., None]
    g_edge = take(g_sum) + take(g_mean * inv_deg)
    g_edge = g_edge + jnp.where(data == take(mx), take(g_max), 0.0)
    g_edge = g_edge + jnp.where(data == take(mn), take(g_min), 0.0)
    g_edge = g_edge * edge_mask[..., None]
    return (g_edge.astype(data.dtype), None, None, None, None)


pna_gather.defvjp(_pna_gather_fwd, _pna_gather_bwd)


@jax.custom_vjp
def gather_rows(x: Array, idx: Array, inv_idx: Array, inv_valid: Array) -> Array:
    """``jnp.take(x, idx, axis=-2)`` with a gather-only backward.

    XLA AD would emit a transposed scatter-add (the TPU slow path) for the
    cotangent of a row gather.  With the static inverse incidence
    ``inv_idx``/``inv_valid`` ([rows, d_max] from receivers_to_gather(idx)),
    the backward becomes: for every source row, gather its occurrence
    positions in ``idx`` and sum — pure gathers, no scatter.
    """
    return jnp.take(x, idx, axis=-2)


def _gather_rows_fwd(x, idx, inv_idx, inv_valid):
    return jnp.take(x, idx, axis=-2), (inv_idx, inv_valid)


def _gather_rows_bwd(res, g):
    inv_idx, inv_valid = res
    n, d = inv_idx.shape
    gg = jnp.take(g, inv_idx.reshape(-1), axis=-2)
    gg = gg.reshape(g.shape[:-2] + (n, d, g.shape[-1]))
    gx = jnp.sum(gg * inv_valid.astype(g.dtype)[..., None], axis=-2)
    return (gx, None, None, None)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def aggregate(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    aggregation: str,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = False,
) -> Array:
    """Aggregate edge features to receiver nodes.

    ``aggregation='pna'`` concatenates (sum, mean, max, min) in the
    reference's order (reference src/migration/graphnet.py:52-64); any other
    name selects the single segment op.
    """
    if aggregation == "pna":
        parts = [
            _OPS[op](data, segment_ids, num_segments, mask, indices_are_sorted)
            for op in PNA_OPS
        ]
        return jnp.concatenate(parts, axis=-1)
    return unsorted_segment_operation(
        data, segment_ids, num_segments, aggregation, mask, indices_are_sorted
    )


def collective_aggregate(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    aggregation: str,
    mask: Optional[Array] = None,
    axis_name: str = "graph",
    ring: bool = False,
    mesh_axes=(),
) -> Array:
    """Edge-parallel aggregation under shard_map: local partials + collectives.

    Each device holds an edge shard and the full node row space; partial
    sums combine with ``psum``, max/min with ``pmax``/``pmin`` — the explicit
    halo-exchange pattern (SURVEY.md §7.8) whose collectives ride the ICI
    mesh axis.  Equivalent to the global masked segment ops.

    ``ring=True`` replaces XLA's collectives with ONE Pallas RDMA ring pass
    (ops.pallas.ring): all of pna's partials (sum / counts / max / min)
    travel together, combined per segment in the kernel.
    """
    if ring:
        return _collective_aggregate_ring(
            data, segment_ids, num_segments, aggregation, mask, axis_name,
            mesh_axes,
        )
    if mask is not None:
        data_sum = data * mask[..., None]
    else:
        data_sum = data
    total = jax.lax.psum(
        jax.ops.segment_sum(data_sum, segment_ids, num_segments), axis_name
    )
    if aggregation == "sum":
        return total
    ones = jnp.ones(data.shape[:-1], dtype=data.dtype)
    if mask is not None:
        ones = ones * mask
    counts = jax.lax.psum(
        jax.ops.segment_sum(ones, segment_ids, num_segments), axis_name
    )[..., None]
    mean = total / jnp.maximum(counts, 1.0)
    if aggregation == "mean":
        return mean

    d = data if mask is None else jnp.where(mask[..., None] > 0, data, _NEG_INF)
    mx = jax.lax.pmax(
        jax.ops.segment_max(d, segment_ids, num_segments), axis_name
    )
    mx = jnp.where(mx <= _NEG_INF / 2, 0.0, mx)
    if aggregation == "max":
        return mx
    d = data if mask is None else jnp.where(mask[..., None] > 0, data, _POS_INF)
    mn = jax.lax.pmin(
        jax.ops.segment_min(d, segment_ids, num_segments), axis_name
    )
    mn = jnp.where(mn >= _POS_INF / 2, 0.0, mn)
    if aggregation == "min":
        return mn
    if aggregation == "pna":
        return jnp.concatenate([total, mean, mx, mn], axis=-1)
    raise ValueError(f"invalid collective aggregation {aggregation!r}")


def _collective_aggregate_ring(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    aggregation: str,
    mask: Optional[Array],
    axis_name: str,
    mesh_axes=(),
) -> Array:
    """Ring-RDMA variant: local partials stacked into one payload, a single
    ring pass combines them (sum rows with add, max/min rows with max/min),
    then the finished aggregates are assembled locally.  ``mesh_axes``
    (static ((name, size), ...)) is required on multi-axis meshes."""
    from hyper_graph_nets_tpu.ops.pallas.ring import ring_all_reduce_segments

    if data.ndim != 2:
        raise ValueError("ring aggregation supports unbatched [E, F] data only")
    F = data.shape[-1]
    n = num_segments
    data_sum = data if mask is None else data * mask[..., None]
    total = jax.ops.segment_sum(data_sum, segment_ids, n)
    if aggregation == "sum":
        out = ring_all_reduce_segments(
            total.astype(jnp.float32), [(0, n, "sum")], axis_name,
            mesh_axes=mesh_axes,
        )
        return out.astype(data.dtype)

    ones = jnp.ones(data.shape[:-1], dtype=jnp.float32)
    if mask is not None:
        ones = ones * mask
    counts = jax.ops.segment_sum(ones, segment_ids, n)[..., None]
    counts = jnp.broadcast_to(counts, (n, F))

    d_mx = data if mask is None else jnp.where(mask[..., None] > 0, data, _NEG_INF)
    mx = jax.ops.segment_max(d_mx, segment_ids, n)
    d_mn = data if mask is None else jnp.where(mask[..., None] > 0, data, _POS_INF)
    mn = jax.ops.segment_min(d_mn, segment_ids, n)

    payload = jnp.concatenate(
        [total, counts, mx, mn], axis=0
    ).astype(jnp.float32)
    segments = [(0, n, "sum"), (n, 2 * n, "sum"), (2 * n, 3 * n, "max"), (3 * n, 4 * n, "min")]
    combined = ring_all_reduce_segments(
        payload, segments, axis_name, mesh_axes=mesh_axes
    )
    total = combined[:n]
    counts = combined[n : 2 * n]
    mx = jnp.where(combined[2 * n : 3 * n] <= _NEG_INF / 2, 0.0, combined[2 * n : 3 * n])
    mn = jnp.where(combined[3 * n :] >= _POS_INF / 2, 0.0, combined[3 * n :])
    mean = total / jnp.maximum(counts, 1.0)
    if aggregation == "mean":
        return mean.astype(data.dtype)
    if aggregation == "max":
        return mx.astype(data.dtype)
    if aggregation == "min":
        return mn.astype(data.dtype)
    if aggregation == "pna":
        return jnp.concatenate([total, mean, mx, mn], axis=-1).astype(data.dtype)
    raise ValueError(f"invalid collective aggregation {aggregation!r}")


def gather_aggregate(
    data: Array,
    gather_idx: Array,
    gather_valid: Array,
    aggregation: str,
) -> Array:
    """Gather-based aggregation over a static [N, d_max] neighbor-edge matrix.

    One gather pass feeds all pna reductions (sum, mean, max, min in
    reference order) — the TPU-fast path for static topology; see
    core.mesh.receivers_to_gather.  Exactly equivalent to the masked segment
    ops (empty segments -> 0).
    """
    n, d = gather_idx.shape
    g = jnp.take(data, gather_idx.reshape(-1), axis=-2)
    g = g.reshape(data.shape[:-2] + (n, d, data.shape[-1]))
    valid = gather_valid[..., None]
    total = jnp.sum(g * valid, axis=-2)
    if aggregation == "sum":
        return total
    deg = jnp.sum(gather_valid, axis=-1)[..., None]
    safe_deg = jnp.maximum(deg, 1.0)
    if aggregation == "mean":
        return total / safe_deg
    mx = jnp.max(jnp.where(valid > 0, g, _NEG_INF), axis=-2)
    mx = jnp.where(mx <= _NEG_INF / 2, 0.0, mx)
    if aggregation == "max":
        return mx
    mn = jnp.min(jnp.where(valid > 0, g, _POS_INF), axis=-2)
    mn = jnp.where(mn >= _POS_INF / 2, 0.0, mn)
    if aggregation == "min":
        return mn
    if aggregation == "pna":
        return jnp.concatenate([total, total / safe_deg, mx, mn], axis=-1)
    if aggregation == "std":
        mean = total / safe_deg
        sq = jnp.sum(g * g * valid, axis=-2) / safe_deg
        return jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))
    raise ValueError(f"invalid aggregation {aggregation!r}")
