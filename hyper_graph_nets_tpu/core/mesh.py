"""Host-side mesh topology utilities.

Topology extraction runs on host (numpy) once per trajectory — the resulting
int32 index arrays are static inputs to the jitted compute path.  Parity with
reference src/util.py:50-89 (``triangles_to_edges`` incl. the quad-cell
``deform=True`` variant), with one TPU-native addition: edges are returned
sorted by receiver so downstream segment aggregations can use
``indices_are_sorted=True`` and Pallas CSR kernels get contiguous per-node
edge ranges.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class MeshEdges(NamedTuple):
    senders: np.ndarray  # [E] int32, two-way (both directions)
    receivers: np.ndarray  # [E] int32
    unique_senders: np.ndarray  # [E/2] one-way (max endpoint)
    unique_receivers: np.ndarray  # [E/2] (min endpoint)


def cells_to_edges(cells: np.ndarray, deform: bool = False) -> MeshEdges:
    """Derive unique bidirectional edges from triangle (or quad) cells.

    Mirrors the reference behavior exactly: perimeter segments are collected,
    canonicalized to (max, min), deduplicated, and both directions emitted
    (reference src/util.py:50-89).  Output directed edges are additionally
    sorted by (receiver, sender) for TPU-friendly segment aggregation; this
    is a pure reordering and does not change any aggregate result.
    """
    cells = np.asarray(cells)
    if cells.ndim != 2:
        raise ValueError(f"cells must be [C, 3|4], got {cells.shape}")
    if deform or cells.shape[1] == 4:
        segs = np.concatenate(
            [cells[:, 0:2], cells[:, 1:3], cells[:, 2:4], cells[:, [3, 0]]], axis=0
        )
    else:
        segs = np.concatenate(
            [cells[:, 0:2], cells[:, 1:3], cells[:, [2, 0]]], axis=0
        )
    lo = segs.min(axis=1)
    hi = segs.max(axis=1)
    packed = np.unique(np.stack([hi, lo], axis=1), axis=0)
    uniq_snd = packed[:, 0].astype(np.int32)
    uniq_rcv = packed[:, 1].astype(np.int32)

    senders = np.concatenate([uniq_snd, uniq_rcv])
    receivers = np.concatenate([uniq_rcv, uniq_snd])
    order = np.lexsort((senders, receivers))
    return MeshEdges(
        senders=senders[order].astype(np.int32),
        receivers=receivers[order].astype(np.int32),
        unique_senders=uniq_snd,
        unique_receivers=uniq_rcv,
    )


def receivers_to_gather(
    receivers: np.ndarray,
    num_nodes: int,
    mask: np.ndarray | None = None,
    min_degree: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Build a dense [N, d_max] edge-index matrix for gather-based aggregation.

    TPU-native replacement for scatter-based segment ops on *static*
    topology: row n lists the edge ids whose receiver is n (padded with 0,
    valid=0).  Aggregation then becomes one gather + fused reductions —
    measured ~3x faster than four scatter passes for pna on TPU v5e.
    """
    receivers = np.asarray(receivers)
    # native C fast path (hyper_graph_nets_tpu/native.py) when compiled
    from hyper_graph_nets_tpu import native

    out = native.csr_from_receivers(receivers, num_nodes, mask, min_degree)
    if out is not None:
        return out

    valid_edges = np.ones(len(receivers), bool) if mask is None else mask > 0
    counts = np.bincount(receivers[valid_edges], minlength=num_nodes)
    d_max = max(int(counts.max(initial=0)), 1)
    if min_degree is not None:
        d_max = max(d_max, min_degree)
    idx = np.zeros((num_nodes, d_max), np.int32)
    valid = np.zeros((num_nodes, d_max), np.float32)
    cursor = np.zeros(num_nodes, np.int32)
    for e in np.nonzero(valid_edges)[0]:
        r = receivers[e]
        idx[r, cursor[r]] = e
        valid[r, cursor[r]] = 1.0
        cursor[r] += 1
    return idx, valid


def pad_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    target: int,
    pad_index: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad edge index arrays to a static size; returns (snd, rcv, mask).

    Padded entries point at ``pad_index`` (a valid row) so gathers stay in
    bounds; the float mask zeroes their contribution in aggregations.
    """
    n = len(senders)
    if n > target:
        raise ValueError(f"edge count {n} exceeds static capacity {target}")
    pad = target - n
    snd = np.concatenate([senders, np.full(pad, pad_index, np.int32)]).astype(np.int32)
    rcv = np.concatenate([receivers, np.full(pad, pad_index, np.int32)]).astype(np.int32)
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return snd, rcv, mask


def mesh_fingerprint(cells, num_nodes: int) -> tuple:
    """Content digest of a mesh's connectivity, for host-side caches.

    Hashes ALL cell bytes (shape included): weak fingerprints (a few cells
    + shape) can collide between meshes from a shared generator template
    and silently reuse the wrong cached topology/permutation.
    """
    import hashlib

    import numpy as _np

    cells = _np.ascontiguousarray(cells)
    h = hashlib.blake2b(cells.tobytes(), digest_size=12)
    h.update(repr(cells.shape).encode())
    return (h.hexdigest(), int(num_nodes))
