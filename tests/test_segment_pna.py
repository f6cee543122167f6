"""Parity tests for the Pallas receiver-sorted pna kernel.

Runs the kernel in interpreter mode on the CPU test mesh; the Mosaic path
is exercised on hardware by bench.py (--agg sorted).  Oracle:
``segment_ops.aggregate(..., 'pna')`` — the framework's reference
aggregation, itself golden-tested against the torch reference
(src/migration/graphnet.py:52-64).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyper_graph_nets_tpu.core import segment_ops
from hyper_graph_nets_tpu.ops.pallas.segment_pna import pna_sorted


def _case(seed, N, E_valid, E, L, B=None):
    rng = np.random.default_rng(seed)
    recv_v = np.sort(rng.integers(0, N, size=E_valid)).astype(np.int32)
    deg = np.bincount(recv_v, minlength=N)
    seg_max = max(int(deg.max()), 1)
    recv = np.concatenate([recv_v, np.zeros(E - E_valid, np.int32)])
    mask = np.concatenate(
        [np.ones(E_valid, np.float32), np.zeros(E - E_valid, np.float32)]
    )
    shape = (E, L) if B is None else (B, E, L)
    data = rng.normal(size=shape).astype(np.float32)
    return jnp.asarray(data), jnp.asarray(recv), jnp.asarray(mask), seg_max


def _oracle(data, recv, mask, N):
    f = lambda d: segment_ops.aggregate(d, recv, N, "pna", mask=mask)
    return f(data) if data.ndim == 2 else jax.vmap(f)(data)


@pytest.mark.parametrize(
    "N,E_valid,E,L",
    [
        (200, 650, 704, 8),  # zero-degree nodes, non-128-multiple N
        (128, 500, 512, 16),  # exact block boundary
        (37, 120, 128, 8),  # single partial block
    ],
)
def test_forward_parity(N, E_valid, E, L):
    data, recv, mask, seg_max = _case(0, N, E_valid, E, L)
    ref = _oracle(data, recv, mask, N)
    out = pna_sorted(data, recv, mask, N, seg_max, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_batched():
    data, recv, mask, seg_max = _case(1, 150, 520, 576, 8, B=3)
    ref = _oracle(data, recv, mask, 150)
    out = pna_sorted(data, recv, mask, 150, seg_max, True)
    assert out.shape == (3, 150, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_no_mask():
    data, recv, _, seg_max = _case(2, 100, 384, 384, 8)
    ref = _oracle(data, recv, None, 100)
    out = pna_sorted(data, recv, None, 100, seg_max, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradient_parity():
    data, recv, mask, seg_max = _case(3, 200, 650, 704, 8)
    rng = np.random.default_rng(33)
    g = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))
    gr = jax.grad(lambda d: jnp.vdot(_oracle(d, recv, mask, 200), g))(data)
    gn = jax.grad(
        lambda d: jnp.vdot(pna_sorted(d, recv, mask, 200, seg_max, True), g)
    )(data)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gr), atol=1e-5)


def test_gradient_masked_edges_zero():
    data, recv, mask, seg_max = _case(4, 64, 200, 256, 8)
    gn = jax.grad(
        lambda d: jnp.sum(pna_sorted(d, recv, mask, 64, seg_max, True))
    )(data)
    assert np.all(np.asarray(gn)[200:] == 0.0)


def test_vmap_parity():
    data, recv, mask, seg_max = _case(5, 150, 520, 576, 8, B=3)
    rB = jnp.tile(recv[None], (3, 1))
    mB = jnp.tile(mask[None], (3, 1))
    ref = _oracle(data, recv, mask, 150)
    out = jax.vmap(
        lambda d, r, m: pna_sorted(d, r, m, 150, seg_max, True)
    )(data, rB, mB)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    rng = np.random.default_rng(55)
    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    gr = jax.grad(lambda d: jnp.vdot(_oracle(d, recv, mask, 150), g))(data)
    gn = jax.grad(
        lambda d: jnp.vdot(
            jax.vmap(lambda x, r, m: pna_sorted(x, r, m, 150, seg_max, True))(
                d, rB, mB
            ),
            g,
        )
    )(data)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gr), atol=1e-5)


def test_block_dispatch_matches_xla_path():
    """agg_vjp='sorted' reproduces the default path's loss and gradients
    on a real flag model graph (same init, same batch, same noise key)."""
    from hyper_graph_nets_tpu.training.trainer import (
        Trainer,
        frames_to_batches,
    )
    from tests.test_models import flag_setup

    losses = {}
    for agg_vjp in ("xla", "sorted"):
        params, traj, model, topo = flag_setup()
        params["model"]["agg_vjp"] = agg_vjp
        model = type(model)(params)
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo)
        key = jax.random.PRNGKey(1)
        vals = []
        for frames in frames_to_batches(traj, 6):
            key, k = jax.random.split(key)
            ts, loss = step(ts, frames, k)
            vals.append(float(loss))
        losses[agg_vjp] = vals
    np.testing.assert_allclose(
        losses["sorted"], losses["xla"], rtol=2e-4, atol=1e-6
    )
