"""Ricci (SDRF) graph balancer: stochastic discrete Ricci flow rewiring.

Parity with reference src/graph_balancer/ricci.py:14-306 — the repo's only
native-kernel component (Numba CUDA).  TPU-native decomposition:

- the O(N^3) balanced-Forman curvature sweep splits into two {0,1} count
  matmuls on the MXU plus two (max, *) semiring matmuls in a Pallas kernel
  (ops/pallas/maxprod.py) — replacing ``_balanced_forman_curvature``
  (reference ricci.py:146-189);
- ``post_delta`` (reference ricci.py:191-271) vectorizes over the candidate
  grid x neighbor dimension as one jitted program, with candidate lists
  padded to powers of two so the 150-iteration SDRF loop reuses a handful of
  executables;
- the sequential SDRF decision loop (argmin edge, softmax improvement
  sampling, optional high-curvature removal — reference ricci.py:46-135)
  stays on host, driving the device kernels.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.ops.pallas.maxprod import maxprod, maxprod_reference

Array = jax.Array


def _maxprod_dispatch(x, y):
    if jax.default_backend() == "tpu":
        return maxprod(x, y)
    return maxprod_reference(x, y)


@jax.jit
def balanced_forman_curvature(A: Array) -> Array:
    """C[i,j] for every existing edge; 0 elsewhere (reference :146-189)."""
    A = A.astype(jnp.float32)
    n = A.shape[0]
    A2 = jnp.dot(A, A, preferred_element_type=jnp.float32)
    d = jnp.sum(A, axis=1)  # undirected: d_in == d_out
    d_max = jnp.maximum(d[:, None], d[None, :])
    d_min = jnp.minimum(d[:, None], d[None, :])

    B = jnp.maximum(A2 - A, 0.0)  # common-neighbor excess
    P = (B > 0).astype(jnp.float32)
    sharp = jnp.dot(P, A, preferred_element_type=jnp.float32) + jnp.dot(
        A, P, preferred_element_type=jnp.float32
    )
    lam = jnp.maximum(_maxprod_dispatch(B, A), _maxprod_dispatch(A, B))

    safe_dmax = jnp.maximum(d_max, 1.0)
    safe_dmin = jnp.maximum(d_min, 1.0)
    base = (
        2.0 / safe_dmax
        + 2.0 / safe_dmin
        - 2.0
        + (2.0 / safe_dmax + 1.0 / safe_dmin) * A2 * A
    )
    C = base + jnp.where(lam > 0, sharp / (safe_dmax * jnp.maximum(lam, 1e-30)), 0.0)
    C = jnp.where((A > 0) & (d_max * d_min > 0), C, 0.0)
    return C


@functools.partial(jax.jit, static_argnames=())
def balanced_forman_post_delta(
    A: Array,
    A2: Array,
    x: Array,
    y: Array,
    i_nbrs: Array,  # [ni] padded with -1
    j_nbrs: Array,  # [nj] padded with -1
) -> Array:
    """Curvature deltas for candidate edges (i, j) (reference :191-271).

    Vectorized over the [ni, nj, N] grid; padded candidates return -1000.
    """
    A = A.astype(jnp.float32)
    n = A.shape[0]
    d_in_x = jnp.sum(A[:, x])
    d_out_y = jnp.sum(A[y, :])
    Axy = A[x, y]

    i_valid = i_nbrs >= 0
    j_valid = j_nbrs >= 0
    i = jnp.where(i_valid, i_nbrs, 0)
    j = jnp.where(j_valid, j_nbrs, 0)

    ii = i[:, None]  # [ni, 1]
    jj = j[None, :]  # [1, nj]
    invalid = (ii == jj) | (A[ii, jj] != 0) | ~i_valid[:, None] | ~j_valid[None, :]

    # degree adjustment: if j == x: d_in_x += 1 elif i == y: d_out_y += 1
    dx = d_in_x + (jj == x).astype(jnp.float32)
    dy = jnp.where(
        (jj == x), d_out_y, d_out_y + ((ii == y) & (jj != x)).astype(jnp.float32)
    )
    dmax = jnp.maximum(dx, dy)
    dmin = jnp.minimum(dx, dy)

    # triangle adjustment (same elif chain as the reference)
    cond1 = (x == ii) & (A[jj, y] != 0)
    cond2 = (y == jj) & (A[x, ii] != 0) & ~cond1
    A2xy = A2[x, y] + jnp.where(cond1, A[jj, y], 0.0) + jnp.where(cond2, A[x, ii], 0.0)

    # four-cycle terms over z (broadcast [ni, nj, N])
    z = jnp.arange(n)
    zi = z[None, None, :]
    i3 = ii[:, :, None]
    j3 = jj[:, :, None]
    A_z_y = A[:, y][None, None, :] + ((zi == i3) & (j3 == y)).astype(jnp.float32)
    A_x_z = A[x, :][None, None, :] + ((x == i3) & (zi == j3)).astype(jnp.float32)
    A2_z_y = (
        A2[:, y][None, None, :]
        + jnp.where((zi == i3) & (A[j3, y] != 0), A[j3, y], 0.0)
        + jnp.where((j3 == y) & (A[zi, i3] != 0), A[zi, i3], 0.0)
    )
    A2_x_z = (
        A2[x, :][None, None, :]
        + jnp.where((x == i3) & (A[j3, zi] != 0), A[j3, zi], 0.0)
        + jnp.where((zi == j3) & (A[x, i3] != 0), A[x, i3], 0.0)
    )

    tmp1 = A_z_y * (A2_x_z - A_x_z) * Axy
    tmp2 = A_x_z * (A2_z_y - A_z_y) * Axy
    sharp = jnp.sum((tmp1 > 0).astype(jnp.float32), axis=-1) + jnp.sum(
        (tmp2 > 0).astype(jnp.float32), axis=-1
    )
    lam = jnp.maximum(jnp.max(tmp1, axis=-1), jnp.max(tmp2, axis=-1))
    lam = jnp.maximum(lam, 0.0)

    safe_dmax = jnp.maximum(dmax, 1.0)
    safe_dmin = jnp.maximum(dmin, 1.0)
    D = (
        2.0 / safe_dmax
        + 2.0 / safe_dmin
        - 2.0
        + (2.0 / safe_dmax + 1.0 / safe_dmin) * A2xy * Axy
    )
    D = D + jnp.where(lam > 0, sharp / (safe_dmax * jnp.maximum(lam, 1e-30)), 0.0)
    D = jnp.where(dx * dy == 0, 0.0, D)
    return jnp.where(invalid, -1000.0, D)


def _softmax(a: np.ndarray, tau: float) -> np.ndarray:
    e = np.exp((a - a.max()) * tau)
    return e / e.sum()


def _pad_pow2(lst, fill=-1):
    n = max(len(lst), 1)
    p = 1
    while p < n:
        p *= 2
    return np.asarray(list(lst) + [fill] * (p - len(lst)), np.int32)


def sdrf(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    loops: int = 10,
    remove_edges: bool = False,
    removal_bound: float = 0.5,
    tau: float = 1.0,
    seed: int = 0,
) -> Tuple[Dict[str, list], Optional[Dict[str, list]]]:
    """Stochastic Discrete Ricci Flow (reference ricci.py:46-135).

    Returns ({'senders', 'receivers'} added, removed or None) — both
    directions per undirected rewiring, like the reference.
    """
    rng = np.random.RandomState(seed)
    A_host = np.zeros((num_nodes, num_nodes), np.float32)
    A_host[senders, receivers] = 1.0
    A_host[receivers, senders] = 1.0
    np.fill_diagonal(A_host, 0.0)
    nbrs = [set(np.nonzero(A_host[i])[0].tolist()) for i in range(num_nodes)]
    A = jnp.asarray(A_host)

    added = {"senders": [], "receivers": []}
    removed = {"senders": [], "receivers": []}

    @jax.jit
    def _curvature_extrema(A):
        """Device-side reduction: only scalars cross the host boundary."""
        C = balanced_forman_curvature(A)
        return C, jnp.argmin(C), jnp.argmax(C)

    for _ in range(loops):
        can_add = True
        C, ix_min_dev, ix_max_dev = _curvature_extrema(A)
        ix_min = int(ix_min_dev)
        x, y = ix_min // num_nodes, ix_min % num_nodes

        x_nbrs = sorted(nbrs[x]) + [x]
        y_nbrs = sorted(nbrs[y]) + [y]
        candidates = [
            (i, j)
            for i in x_nbrs
            for j in y_nbrs
            if i != j and j not in nbrs[i]
        ]
        if candidates:
            A2 = jnp.dot(A, A, preferred_element_type=jnp.float32)
            D = balanced_forman_post_delta(
                A,
                A2,
                jnp.int32(x),
                jnp.int32(y),
                jnp.asarray(_pad_pow2(x_nbrs)),
                jnp.asarray(_pad_pow2(y_nbrs)),
            )
            D_host = np.asarray(D)
            c_xy = float(C[x, y])
            improvements = np.array(
                [
                    D_host[x_nbrs.index(i), y_nbrs.index(j)] - c_xy
                    for (i, j) in candidates
                ]
            )
            k, l = candidates[rng.choice(len(candidates), p=_softmax(improvements, tau))]
            nbrs[k].add(l)
            nbrs[l].add(k)
            added["senders"].extend([k, l])
            added["receivers"].extend([l, k])
            A = A.at[k, l].set(1.0).at[l, k].set(1.0)
        else:
            can_add = False
            if not remove_edges:
                break

        if remove_edges:
            ix_max = int(ix_max_dev)
            xr, yr = ix_max // num_nodes, ix_max % num_nodes
            if float(C[xr, yr]) > removal_bound and yr in nbrs[xr]:
                nbrs[xr].discard(yr)
                nbrs[yr].discard(xr)
                removed["senders"].extend([xr, yr])
                removed["receivers"].extend([yr, xr])
                A = A.at[xr, yr].set(0.0).at[yr, xr].set(0.0)
            else:
                if not can_add:
                    break

    return added, (removed if remove_edges else None)


class Ricci:
    """SDRF balancer algorithm (reference Ricci class, ricci.py:14-31)."""

    def __init__(self, params: dict):
        bal = params["model"]["graph_balancer"]
        ricci_cfg = bal.get("ricci", {})
        self.loops = ricci_cfg.get("loops", 150)
        self.tau = ricci_cfg.get("tau", 150)
        self.remove_edges = bal.get("remove_edges", True)

    def run(self, topo) -> Tuple[Dict[str, list], Optional[Dict[str, list]]]:
        return sdrf(
            topo.senders,
            topo.receivers,
            topo.num_nodes,
            loops=self.loops,
            remove_edges=self.remove_edges,
            tau=self.tau,
        )
