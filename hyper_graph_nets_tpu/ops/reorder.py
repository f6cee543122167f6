"""Host-side mesh reordering for bandwidth reduction (RCM).

The fused Pallas MP-block kernel (ops/pallas/fused_block) gathers node
windows per receiver-sorted edge chunk; its window size — and hence its
VMEM footprint and FLOP overhead — is the *bandwidth* of the mesh's node
numbering.  Grid meshes (flag, cylinder crops) are naturally banded;
general unstructured meshes from the DeepMind datasets are not, so we
relabel nodes with reverse Cuthill-McKee before building the band plan.

This runs once per trajectory on the host (numpy/scipy), like the other
static-topology preprocessing in models/base.build_topology.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def rcm_order(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int
) -> np.ndarray:
    """Reverse Cuthill-McKee permutation for the given edge list.

    Returns ``perm`` with ``perm[new_id] = old_id``; apply with
    ``new_nodes = nodes[perm]`` and relabel indices via ``inverse_perm``.
    Isolated nodes keep a stable position at the end of their component
    ordering (scipy visits every node).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    snd = np.asarray(senders, np.int64)
    rcv = np.asarray(receivers, np.int64)
    data = np.ones(len(snd), np.int8)
    adj = coo_matrix((data, (snd, rcv)), shape=(num_nodes, num_nodes)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=False))
    return perm.astype(np.int64)


def inverse_perm(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return inv


def bandwidth(
    senders: np.ndarray, receivers: np.ndarray
) -> int:
    """Max |sender - receiver| over the edge list (numbering bandwidth)."""
    if len(senders) == 0:
        return 0
    return int(
        np.max(np.abs(np.asarray(senders, np.int64) - np.asarray(receivers, np.int64)))
    )


def reorder_trajectory(
    trajectory: Dict[str, np.ndarray],
    perm: np.ndarray,
    node_axis: int = 1,
) -> Dict[str, np.ndarray]:
    """Apply a node permutation to a trajectory dict (host, numpy).

    Node-indexed arrays ([T, N, ...]) are gathered along ``node_axis``;
    ``cells`` entries are *relabelled* (values are node ids, not rows).
    Arrays whose node dimension doesn't match N pass through unchanged
    (e.g. scalar context features).
    """
    inv = inverse_perm(perm)
    n = len(perm)
    out = {}
    for key, val in trajectory.items():
        if key == "cells":
            out[key] = inv[np.asarray(val, np.int64)].astype(val.dtype)
        elif val.ndim > node_axis and val.shape[node_axis] == n:
            out[key] = np.take(val, perm, axis=node_axis)
        else:
            out[key] = val
    return out
