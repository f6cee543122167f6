"""Pallas TPU kernel: (max, *) semiring matmul for Ricci curvature.

The balanced-Forman curvature needs ``lambda[i,j] = max_k X[i,k] * Y[k,j]``
— a matmul over the (max, *) semiring, which the MXU cannot do.  The
reference computes it inside Numba CUDA kernels (reference
src/graph_balancer/ricci.py:146-271, the repo's only native-kernel code);
this is the TPU-native equivalent: a tiled Pallas kernel that streams
128x128 tiles through VMEM and max-accumulates on the VPU.

The companion *count* terms (sharp_ij) are ordinary {0,1} matmuls and run on
the MXU in plain XLA (see balancer.ricci.balanced_forman_curvature).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


_SUB = 8  # rank-_SUB outer-product chunk per VPU max-accumulate step


def _maxprod_kernel(x_ref, y_ref, out_ref):
    """out[i,j] = max_k x[i,k] * y[k,j] for one (i,j) tile, looping k tiles.

    The inner rank-1 max-accumulates use *static* slices (the TPU Pallas
    lowering has no dynamic_slice on values), grouped in chunks of _SUB
    broadcast products reduced with jnp.max to keep VPU ops wide.
    """
    k_tiles = x_ref.shape[1] // TILE

    def body(kt, acc):
        x = x_ref[:, pl.ds(kt * TILE, TILE)]  # [TILE, TILE]
        y = y_ref[pl.ds(kt * TILE, TILE), :]  # [TILE, TILE]
        for k0 in range(0, TILE, _SUB):  # static unroll over sub-chunks
            # [TILE, _SUB, TILE] broadcast product, max over the k axis
            # (reshape instead of None-indexing: Pallas TPU gather rules)
            xs = x[:, k0 : k0 + _SUB].reshape(TILE, _SUB, 1)
            ys = y[k0 : k0 + _SUB, :].reshape(1, _SUB, TILE)
            acc = jnp.maximum(acc, jnp.max(xs * ys, axis=1))
        return acc

    acc0 = jnp.full((TILE, TILE), -jnp.inf, jnp.float32)
    out_ref[:, :] = jax.lax.fori_loop(0, k_tiles, body, acc0)


def _pad(x, mult):
    n, m = x.shape
    pn = (-n) % mult
    pm = (-m) % mult
    if pn or pm:
        x = jnp.pad(x, ((0, pn), (0, pm)))
    return x


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxprod(x: jax.Array, y: jax.Array, interpret: bool = False) -> jax.Array:
    """(max, *) semiring matmul: out[i,j] = max_k x[i,k] * y[k,j].

    Inputs must be non-negative (true for adjacency/common-neighbor counts);
    padding with zeros then cannot spuriously win the max except where the
    true max is <= 0, which matches the reference's 'TMP > 0' guard.
    """
    n, k = x.shape
    k2, m = y.shape
    assert k == k2, (x.shape, y.shape)
    xp = _pad(x.astype(jnp.float32), TILE)
    yp = _pad(y.astype(jnp.float32), TILE)
    np_, kp = xp.shape
    mp = yp.shape[1]

    out = pl.pallas_call(
        _maxprod_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid=(np_ // TILE, mp // TILE),
        in_specs=[
            pl.BlockSpec((TILE, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, yp)
    out = jnp.maximum(out, 0.0)  # empty-k / padded columns -> 0 like TMP>0 guard
    return out[:n, :m]


def maxprod_reference(x: jax.Array, y: jax.Array, block: int = 8) -> jax.Array:
    """XLA fallback (scan over row blocks); used on CPU and in tests."""
    n = x.shape[0]
    pn = (-n) % block
    xp = jnp.pad(x.astype(jnp.float32), ((0, pn), (0, 0)))

    def body(_, rows):
        # rows: [block, K]; out: [block, M]
        return None, jnp.max(rows[:, :, None] * y[None, :, :], axis=1)

    _, out = jax.lax.scan(body, None, xp.reshape(-1, block, x.shape[1]))
    out = out.reshape(-1, y.shape[1])[:n]
    return jnp.maximum(out, 0.0)
