"""Parity tests for the fused Pallas MP-block edge kernel.

``ops.pallas.fused_block`` fuses gather -> edge MLP -> LayerNorm -> pna
into one VMEM-resident pass (fwd) plus a remat backward kernel.  Oracle:
the framework's own unfused math (``nn.mlp`` semantics + the golden-tested
``segment_ops.aggregate``), which is itself parity-tested against the torch
reference (src/migration/graphnet.py:22-64).

Runs in interpreter mode on the CPU test mesh; the Mosaic path is
exercised on hardware by bench.py / tools/bench_fused_block.py.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyper_graph_nets_tpu.core import segment_ops
from hyper_graph_nets_tpu.ops.pallas.fused_block import (
    build_band_plan,
    fused_edge_block,
)


def _banded_case(seed, N, E_valid, E, L, band=8, B=None):
    """Receiver-sorted edge set with senders within +-band of the receiver."""
    rng = np.random.default_rng(seed)
    recv_v = np.sort(rng.integers(0, N, size=E_valid)).astype(np.int32)
    off = rng.integers(-band, band + 1, size=E_valid)
    snd_v = np.clip(recv_v + off, 0, N - 1).astype(np.int32)
    snd = np.concatenate([snd_v, np.zeros(E - E_valid, np.int32)])
    recv = np.concatenate([recv_v, np.zeros(E - E_valid, np.int32)])
    mask = np.concatenate(
        [np.ones(E_valid, np.float32), np.zeros(E - E_valid, np.float32)]
    )
    shape = (E, L) if B is None else (B, E, L)
    e = rng.normal(size=shape).astype(np.float32)
    nshape = (N, L) if B is None else (B, N, L)
    sp = rng.normal(size=nshape).astype(np.float32)
    rp = rng.normal(size=nshape).astype(np.float32)
    wk = {
        "we": rng.normal(size=(L, L)).astype(np.float32) * 0.3,
        "w2": rng.normal(size=(L, L)).astype(np.float32) * 0.3,
        "w3": rng.normal(size=(L, L)).astype(np.float32) * 0.3,
        "b1": rng.normal(size=(L,)).astype(np.float32) * 0.1,
        "b2": rng.normal(size=(L,)).astype(np.float32) * 0.1,
        "b3": rng.normal(size=(L,)).astype(np.float32) * 0.1,
        "lns": (1.0 + 0.1 * rng.normal(size=(L,))).astype(np.float32),
        "lnb": (0.1 * rng.normal(size=(L,))).astype(np.float32),
    }
    jt = jax.tree_util.tree_map(jnp.asarray, (e, sp, rp, wk))
    plan = build_band_plan(snd, recv, N, num_valid=E_valid, chunk=128)
    return (*jt, jnp.asarray(snd), jnp.asarray(recv), jnp.asarray(mask), plan)


def _oracle(e, sp, rp, wk, snd, rcv, mask, N):
    """Unfused reference: factored edge MLP + LN residual + pna aggregate."""

    def one(e, sp, rp):
        h = e @ wk["we"] + sp[snd] + rp[rcv] + wk["b1"]
        z2 = jax.nn.relu(h) @ wk["w2"] + wk["b2"]
        z3 = jax.nn.relu(z2) @ wk["w3"] + wk["b3"]
        mu = jnp.mean(z3, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z3 - mu), axis=-1, keepdims=True)
        xhat = (z3 - mu) * jax.lax.rsqrt(var + 1e-5)
        e2 = e + xhat * wk["lns"] + wk["lnb"]
        agg = segment_ops.aggregate(e2, rcv, N, "pna", mask=mask)
        return e2, agg

    if e.ndim == 3:
        return jax.vmap(one)(e, sp, rp)
    return one(e, sp, rp)


@pytest.mark.parametrize(
    "N,E_valid,E,L",
    [
        (64, 220, 256, 8),  # partial final chunk of padding
        (48, 256, 256, 16),  # no padding, exact chunk boundary
        (100, 300, 384, 8),  # zero-degree nodes
    ],
)
def test_forward_parity(N, E_valid, E, L):
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(0, N, E_valid, E, L)
    ref_e2, ref_agg = _oracle(e, sp, rp, wk, snd, rcv, mask, N)
    e2, agg = fused_edge_block(e, sp, rp, wk, plan, N)
    m = np.asarray(mask)[:, None]
    np.testing.assert_allclose(
        np.asarray(e2) * m, np.asarray(ref_e2) * m, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ref_agg), atol=2e-5)


def test_forward_batched():
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(
        1, 60, 230, 256, 8, B=2
    )
    ref_e2, ref_agg = _oracle(e, sp, rp, wk, snd, rcv, mask, 60)
    e2, agg = fused_edge_block(e, sp, rp, wk, plan, 60)
    assert e2.shape == (2, 256, 8) and agg.shape == (2, 60, 32)
    m = np.asarray(mask)[None, :, None]
    np.testing.assert_allclose(
        np.asarray(e2) * m, np.asarray(ref_e2) * m, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ref_agg), atol=2e-5)


def test_gradient_parity():
    N, E_valid, E, L = 64, 220, 256, 8
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(5, N, E_valid, E, L)
    rng = np.random.default_rng(7)
    ge2 = jnp.asarray(
        rng.normal(size=(E, L)).astype(np.float32)
    ) * mask[:, None]
    gagg = jnp.asarray(rng.normal(size=(N, 4 * L)).astype(np.float32))

    def loss_ref(e, sp, rp, wk):
        e2, agg = _oracle(e, sp, rp, wk, snd, rcv, mask, N)
        return jnp.vdot(e2 * mask[:, None], ge2) + jnp.vdot(agg, gagg)

    def loss_fused(e, sp, rp, wk):
        e2, agg = fused_edge_block(e, sp, rp, wk, plan, N)
        return jnp.vdot(e2 * mask[:, None], ge2) + jnp.vdot(agg, gagg)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(e, sp, rp, wk)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(e, sp, rp, wk)
    # edge cotangents only meaningful on valid rows (padded rows are dead)
    np.testing.assert_allclose(
        np.asarray(gf[0]) * np.asarray(mask)[:, None],
        np.asarray(gr[0]) * np.asarray(mask)[:, None],
        atol=3e-4,
    )
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]), atol=3e-4)
    for k in gr[3]:
        np.testing.assert_allclose(
            np.asarray(gf[3][k]), np.asarray(gr[3][k]), atol=3e-3, rtol=1e-4,
            err_msg=f"weight grad {k}",
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_stream_backward_matches_remat(dtype):
    """fused_bwd='stream' (remat-free backward fed by forward-saved
    a1/a2/mu/isg streams) must match the default remat backward: the
    streams are the forward's own post-cast values, so the stream
    kernel's z3/xhat/e2v reconstruction reproduces the forward exactly —
    de/dh/dz2/dz3/dsp/drp are bit-identical (verified elementwise when
    this test was written); only the bias/LN column-sum reductions may
    drift by reassociation ulps across the two separately compiled
    programs, hence the near-zero tolerance rather than array_equal.
    Parametrized over bf16, the production compute dtype, where the
    bit-exactness argument (a1>0 iff h>0 post-cast, saved-cdt streams
    reproducing the tie compare at tie_tol=0) actually bites."""
    N, E_valid, E, L = 64, 220, 256, 8
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(11, N, E_valid, E, L)
    e, sp, rp = e.astype(dtype), sp.astype(dtype), rp.astype(dtype)
    rng = np.random.default_rng(13)
    ge2 = jnp.asarray(
        rng.normal(size=(E, L)).astype(np.float32)
    ) * mask[:, None]
    gagg = jnp.asarray(rng.normal(size=(N, 4 * L)).astype(np.float32))

    def loss(e, sp, rp, wk, bwd):
        e2, agg = fused_edge_block(e, sp, rp, wk, plan, N, bwd=bwd)
        return jnp.vdot(
            e2.astype(jnp.float32) * mask[:, None], ge2
        ) + jnp.vdot(agg, gagg)

    gr = jax.grad(loss, argnums=(0, 1, 2, 3))(e, sp, rp, wk, "remat")
    gs = jax.grad(loss, argnums=(0, 1, 2, 3))(e, sp, rp, wk, "stream")
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gs)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6 * max(
            1.0, float(np.abs(a).max())
        ))


def test_invalid_bwd_mode_raises():
    """A typo'd fused_bwd must raise, not silently select remat."""
    N, E_valid, E, L = 64, 220, 256, 8
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(11, N, E_valid, E, L)
    with pytest.raises(ValueError, match="remat.*stream"):
        fused_edge_block(e, sp, rp, wk, plan, N, bwd="Stream")


def test_stream_backward_batched_pb_pad():
    """Stream mode through the batched path with pb that does NOT divide
    the batch (B=3, pb=2, pb_bwd=2): exercises the _pb_pad recursion of
    both the stream-saving forward and _bwd_stream_call."""
    N, E_valid, E, L = 60, 230, 256, 8
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(
        17, N, E_valid, E, L, B=3
    )
    rng = np.random.default_rng(19)
    ge2 = jnp.asarray(
        rng.normal(size=(3, E, L)).astype(np.float32)
    ) * mask[None, :, None]
    gagg = jnp.asarray(rng.normal(size=(3, N, 4 * L)).astype(np.float32))

    def loss(e, sp, rp, wk, bwd, pb, pb_bwd):
        e2, agg = fused_edge_block(
            e, sp, rp, wk, plan, N, pb=pb, pb_bwd=pb_bwd, bwd=bwd
        )
        return jnp.vdot(e2 * mask[None, :, None], ge2) + jnp.vdot(agg, gagg)

    gr = jax.grad(loss, argnums=(0, 1, 2, 3))(e, sp, rp, wk, "remat", 1, 1)
    gs = jax.grad(loss, argnums=(0, 1, 2, 3))(e, sp, rp, wk, "stream", 2, 2)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gs)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6 * max(
            1.0, float(np.abs(a).max())
        ))


class TestHybridParity:
    """fused_edge_block_hybrid (XLA forward + Pallas backward) matches the
    oracle in both passes."""

    def _case(self, seed=11, N=64, E_valid=220, E=256, L=8):
        from hyper_graph_nets_tpu.core.mesh import receivers_to_gather

        e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(
            seed, N, E_valid, E, L
        )
        gidx, gvalid = receivers_to_gather(
            np.asarray(rcv), N, mask=np.asarray(mask)
        )
        return e, sp, rp, wk, snd, rcv, mask, plan, jnp.asarray(gidx), jnp.asarray(gvalid)

    def test_forward(self):
        from hyper_graph_nets_tpu.ops.pallas.fused_block import (
            fused_edge_block_hybrid,
        )

        e, sp, rp, wk, snd, rcv, mask, plan, gidx, gvalid = self._case()
        ref_e2, ref_agg = _oracle(e, sp, rp, wk, snd, rcv, mask, 64)
        e2, agg = fused_edge_block_hybrid(
            e, sp, rp, wk, plan, 64, snd, rcv, gidx, gvalid
        )
        m = np.asarray(mask)[:, None]
        np.testing.assert_allclose(
            np.asarray(e2) * m, np.asarray(ref_e2) * m, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(agg), np.asarray(ref_agg), atol=2e-5
        )

    def test_gradients(self):
        from hyper_graph_nets_tpu.ops.pallas.fused_block import (
            fused_edge_block_hybrid,
        )

        e, sp, rp, wk, snd, rcv, mask, plan, gidx, gvalid = self._case(seed=12)
        rng = np.random.default_rng(13)
        ge2 = jnp.asarray(
            rng.normal(size=e.shape).astype(np.float32)
        ) * mask[:, None]
        gagg = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))

        def loss_ref(e, sp, rp, wk):
            e2, agg = _oracle(e, sp, rp, wk, snd, rcv, mask, 64)
            return jnp.vdot(e2 * mask[:, None], ge2) + jnp.vdot(agg, gagg)

        def loss_hyb(e, sp, rp, wk):
            e2, agg = fused_edge_block_hybrid(
                e, sp, rp, wk, plan, 64, snd, rcv, gidx, gvalid
            )
            return jnp.vdot(e2 * mask[:, None], ge2) + jnp.vdot(agg, gagg)

        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(e, sp, rp, wk)
        gh = jax.grad(loss_hyb, argnums=(0, 1, 2, 3))(e, sp, rp, wk)
        m = np.asarray(mask)[:, None]
        np.testing.assert_allclose(
            np.asarray(gh[0]) * m, np.asarray(gr[0]) * m, atol=3e-4
        )
        np.testing.assert_allclose(np.asarray(gh[1]), np.asarray(gr[1]), atol=3e-4)
        np.testing.assert_allclose(np.asarray(gh[2]), np.asarray(gr[2]), atol=3e-4)
        for k in gr[3]:
            np.testing.assert_allclose(
                np.asarray(gh[3][k]), np.asarray(gr[3][k]), atol=3e-3,
                rtol=1e-4, err_msg=f"weight grad {k}",
            )

    def test_bf16_gradients_route(self):
        """Under bf16 compute the hybrid backward still routes max/min
        gradients (tie tolerance 2^-8 covers XLA-vs-kernel bf16 rounding
        mismatches); grads stay close to the f32 oracle at bf16 accuracy."""
        from hyper_graph_nets_tpu.ops.pallas.fused_block import (
            fused_edge_block_hybrid,
        )

        e, sp, rp, wk, snd, rcv, mask, plan, gidx, gvalid = self._case(seed=21)
        bf = jnp.bfloat16
        eb, spb, rpb = e.astype(bf), sp.astype(bf), rp.astype(bf)
        gagg = jnp.asarray(
            np.random.default_rng(22).normal(size=(64, 32)).astype(np.float32)
        )

        def loss_h(e1, sp1, rp1):
            _, agg = fused_edge_block_hybrid(
                e1, sp1, rp1, wk, plan, 64, snd, rcv, gidx, gvalid
            )
            return jnp.vdot(agg.astype(jnp.float32), gagg)

        def loss_ref(e1, sp1, rp1):
            _, agg = _oracle(
                e1.astype(jnp.float32), sp1.astype(jnp.float32),
                rp1.astype(jnp.float32), wk, snd, rcv, mask, 64,
            )
            return jnp.vdot(agg, gagg)

        gh = jax.grad(loss_h, argnums=(0, 1, 2))(eb, spb, rpb)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(e, sp, rp)
        for h, r in zip(gh, gr):
            h32 = np.asarray(h, np.float32)
            r32 = np.asarray(r)
            assert np.isfinite(h32).all()
            # max-grad must not be dropped wholesale: overall correlation
            # with the f32 oracle stays high at bf16 resolution
            denom = np.linalg.norm(r32) * np.linalg.norm(h32) + 1e-9
            corr = float((h32 * r32).sum() / denom)
            assert corr > 0.98, corr

    def test_vmap_batched(self):
        from hyper_graph_nets_tpu.ops.pallas.fused_block import (
            fused_edge_block_hybrid,
        )

        e, sp, rp, wk, snd, rcv, mask, plan, gidx, gvalid = self._case(seed=14)
        eb = jnp.stack([e, e * 0.5])
        spb = jnp.stack([sp, sp * 2.0])
        rpb = jnp.stack([rp, rp * 0.3])

        def one(e1, sp1, rp1):
            e2, agg = fused_edge_block_hybrid(
                e1, sp1, rp1, wk, plan, 64, snd, rcv, gidx, gvalid
            )
            return jnp.sum(e2 * mask[:, None]) + jnp.sum(agg)

        vals = jax.vmap(one)(eb, spb, rpb)
        refs = jnp.stack(
            [
                jnp.sum(
                    _oracle(a, b, c, wk, snd, rcv, mask, 64)[0] * mask[:, None]
                )
                + jnp.sum(_oracle(a, b, c, wk, snd, rcv, mask, 64)[1])
                for a, b, c in zip(eb, spb, rpb)
            ]
        )
        np.testing.assert_allclose(np.asarray(vals), np.asarray(refs), rtol=1e-4)
        # gradient under vmap (exercises the Pallas bwd batching rule)
        g = jax.grad(lambda ee: jnp.sum(jax.vmap(one)(ee, spb, rpb)))(eb)
        assert np.isfinite(np.asarray(g)).all()


class TestFusedTrainStepParity:
    """model.agg_vjp='fused' (fused Pallas MP-block) produces the same
    training step as the XLA path — loss and updated params close (the
    fused kernel reorders the pna reductions, so bit-exactness isn't
    expected, only numerical closeness).

    Max/min tie handling differs by convention: XLA's reduce-max backward
    splits the gradient evenly among exact ties, torch_scatter routes it
    to one argmax, and the Pallas kernel shares it among near-winners
    (relative tolerance 1e-5) — all valid subgradients.  On a uniform
    grid mesh a handful of weight entries (<0.1%) see the difference
    after an optimizer step, hence the few-element tolerance below."""

    def _run(self, vjp, fused_fwd="kernel"):
        from hyper_graph_nets_tpu.data import synthetic
        from hyper_graph_nets_tpu.data.preprocessing import add_targets
        from hyper_graph_nets_tpu.models.flag import FlagModel
        from hyper_graph_nets_tpu.training.trainer import Trainer

        params = {
            "task": {"dataset": "flag_minimal"},
            "model": {
                "field": "world_pos", "history": True, "size": 3,
                "noise": 0.003, "gamma": 0.9, "aggregation": "pna",
                "learning_rate": 1e-3, "message_passing_steps": 2,
                "agg_vjp": vjp, "fused_fwd": fused_fwd,
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=10, nx=6, ny=6), "world_pos", True
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        if vjp == "fused":
            assert topo.band_plan is not None, "grid mesh should be banded"
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}
        ts, loss = step(ts, frames, jax.random.PRNGKey(1))
        return float(loss), ts

    def test_ignored_knobs_warn_on_hybrid_branch(self):
        """fused_bwd='stream' combined with fused_fwd='xla' selects the
        hybrid branch, which ignores the backward knob — a warning must
        surface it (nn/blocks.py dispatch)."""
        from hyper_graph_nets_tpu.data import synthetic
        from hyper_graph_nets_tpu.data.preprocessing import add_targets
        from hyper_graph_nets_tpu.models.flag import FlagModel
        from hyper_graph_nets_tpu.training.trainer import Trainer

        params = {
            "task": {"dataset": "flag_minimal"},
            "model": {
                "field": "world_pos", "history": True, "size": 3,
                "noise": 0.003, "gamma": 0.9, "aggregation": "pna",
                "learning_rate": 1e-3, "message_passing_steps": 1,
                "agg_vjp": "fused", "fused_fwd": "xla",
                "fused_bwd": "stream",
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=10, nx=6, ny=6),
            "world_pos", True,
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo)
        frames = {
            k: jnp.asarray(v[:2]) for k, v in traj.items() if k != "cells"
        }
        with pytest.warns(UserWarning, match="ignore"):
            ts, loss = step(ts, frames, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))

    def test_loss_and_params_match(self):
        l1, t1 = self._run("xla")
        l2, t2 = self._run("fused")
        assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
        total = mismatched = 0
        for a, b in zip(
            jax.tree.leaves(t1.model.params), jax.tree.leaves(t2.model.params)
        ):
            a, b = np.asarray(a), np.asarray(b)
            # max-tie subgradient convention may touch a few elements
            # (see class docstring)
            assert np.max(np.abs(a - b)) < 5e-3
            mismatched += int(np.sum(np.abs(a - b) > 1e-3 * (np.abs(b) + 0.1)))
            total += a.size
        assert mismatched / total < 1e-3, f"{mismatched}/{total}"

    def test_hybrid_fwd_matches_xla(self):
        """model.fused_fwd='xla' (XLA forward + Pallas backward) also
        reproduces the XLA training step."""
        l1, t1 = self._run("xla")
        l2, t2 = self._run("fused", fused_fwd="xla")
        assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
        for a, b in zip(
            jax.tree.leaves(t1.model.params), jax.tree.leaves(t2.model.params)
        ):
            assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) < 5e-3


class TestFusedHierarchicalParity:
    """The fused kernel inside the hierarchical (HGN) block's mesh sub-step
    matches the unfused path — cluster-tier edge sets stay unfused (no band
    plan), mesh_edges goes through the fused update+aggregate."""

    def _run(self, vjp, connector="hyper", fused_tiers=False):
        from hyper_graph_nets_tpu.data import synthetic
        from hyper_graph_nets_tpu.data.preprocessing import add_targets
        from hyper_graph_nets_tpu.models.flag import FlagModel
        from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp
        from hyper_graph_nets_tpu.training.trainer import Trainer

        params = {
            "task": {"dataset": "flag_minimal"},
            "model": {
                "field": "world_pos", "history": True, "size": 3,
                "noise": 0.0, "gamma": 0.9, "aggregation": "pna",
                "learning_rate": 1e-3, "message_passing_steps": 2,
                "agg_vjp": vjp,
                "rmp": {
                    "num_clusters": 4, "hyper_noise": 0.0,
                    "hyper_node_features": True, "frequency": 1,
                    "clustering": "spectral", "connector": connector,
                    "fully_connect": False,
                    "fused_tiers": fused_tiers,
                    "intra_cluster_sampling": {
                        "enabled": False, "alpha": 0.1, "spotter_threshold": 0
                    },
                },
                "graph_balancer": {"algorithm": "none"},
            },
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=10, nx=7, ny=7), "world_pos", True
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        if vjp == "fused":
            assert topo.band_plan is not None
        rmp = get_rmp(params)
        frame0 = {k: v[0] for k, v in traj.items()}
        static = rmp.prepare(model, frame0, topo)
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo, expansion=rmp)
        frames = {k: jnp.asarray(v[:3]) for k, v in traj.items() if k != "cells"}
        ts, loss = step(ts, frames, jax.random.PRNGKey(1), static)
        return float(loss), ts

    @pytest.mark.parametrize("fused_tiers", [False, True])
    def test_loss_and_params_match(self, fused_tiers):
        l1, t1 = self._run("xla")
        l2, t2 = self._run("fused", fused_tiers=fused_tiers)
        assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
        leaves1 = jax.tree.leaves(t1.model.params)
        leaves2 = jax.tree.leaves(t2.model.params)
        total = mismatched = 0
        for a, b in zip(leaves1, leaves2):
            a, b = np.asarray(a), np.asarray(b)
            # a handful of elements may differ through the max-tie
            # subgradient convention (see class docstring); bounded overall
            assert np.max(np.abs(a - b)) < 5e-3
            mismatched += int(np.sum(np.abs(a - b) > 1e-3 * (np.abs(b) + 0.1)))
            total += a.size
        assert mismatched / total < 1e-3, f"{mismatched}/{total}"

    def test_multiscale_fused_matches_xla(self):
        """MultiScaleGraphNet (two mesh sub-steps per block, 3 cross
        rounds) also routes its mesh edge set through the fused kernel
        with unchanged results."""
        l1, t1 = self._run("xla", connector="multiscale")
        l2, t2 = self._run("fused", connector="multiscale")
        assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
        for a, b in zip(
            jax.tree.leaves(t1.model.params), jax.tree.leaves(t2.model.params)
        ):
            assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) < 5e-3


def test_band_plan_rejects_wide_window():
    rng = np.random.default_rng(3)
    rcv = np.sort(rng.integers(0, 4096, size=512)).astype(np.int32)
    snd = rng.permutation(4096)[:512].astype(np.int32)  # unbanded senders
    with pytest.raises(ValueError, match="max_window"):
        build_band_plan(snd, rcv, 4096, chunk=512, max_window=1024)


@pytest.mark.parametrize("seed,N,E_valid,E,chunk", [
    (31, 64, 220, 256, 128),
    (32, 200, 700, 768, 256),
    (33, 50, 120, 256, 128),  # heavy padding tail
])
def test_band_plan_invariants(seed, N, E_valid, E, chunk):
    """Structural invariants every plan must satisfy: window-local ids
    reconstruct the global edge list, sentinels mark exactly the padded
    tail, and static dims are tile-aligned."""
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(
        seed, N, E_valid, E, 8, B=None
    )
    # _banded_case builds with chunk=128; rebuild at the requested chunk
    plan = build_band_plan(
        np.asarray(snd), np.asarray(rcv), N, num_valid=E_valid, chunk=chunk
    )
    C, T, W, WR, SB = plan.C, plan.T, plan.W, plan.WR, plan.SB
    Ts = T // SB
    assert W % 128 == 0 and WR % 128 == 0 and T == chunk
    # w_s is [SB, C]: subchunk j of chunk c at [j, c]
    w_s = np.asarray(plan.w_s)
    assert w_s.shape == (SB, C)
    r_lo = np.asarray(plan.r_lo)[0]
    snd_col = np.asarray(plan.snd_col).reshape(C * T)
    rcv_col = np.asarray(plan.rcv_col).reshape(C * T)
    snd_row = np.asarray(plan.snd_row)
    assert snd_row.shape == (C, SB, Ts)
    np.testing.assert_array_equal(snd_row.reshape(C * T), snd_col)
    m = np.asarray(plan.m_col).reshape(C * T)
    # mask marks exactly the valid prefix
    assert m.sum() == E_valid and (m[:E_valid] == 1).all()
    for i in range(C * T):
        c = i // T
        j = (i % T) // Ts  # sender subchunk
        if m[i]:
            assert w_s[j, c] + snd_col[i] == int(np.asarray(snd)[i])
            assert r_lo[c] + rcv_col[i] == int(np.asarray(rcv)[i])
            assert snd_col[i] < W and rcv_col[i] < WR
        else:
            # sentinels select no window row
            assert snd_col[i] == W and rcv_col[i] == WR
    # every window stays inside the padded node-row count
    from hyper_graph_nets_tpu.ops.pallas.fused_block import plan_node_rows

    Nr = plan_node_rows(plan, N)
    assert int(w_s.max()) + W <= Nr and int(r_lo.max()) + WR <= Nr


def test_band_plan_rejects_unsorted():
    rcv = np.array([3, 1, 2], np.int32)
    snd = np.array([0, 1, 2], np.int32)
    with pytest.raises(ValueError, match="sorted"):
        build_band_plan(snd, rcv, 8, chunk=128)


@pytest.mark.parametrize("pb", [2, 3])
def test_grid_amortized_pb_matches_pb1(pb):
    """fused_pb > 1 (several batch elements per grid step) reproduces the
    pb=1 values and gradients, direct-batched and via the custom-vmap
    wrapper (fused_edge_block_batchable) that collapses an outer vmap
    into the kernel's batch grid dimension."""
    from hyper_graph_nets_tpu.ops.pallas.fused_block import (
        fused_edge_block_batchable,
    )

    N, E_valid, E, L, B = 64, 150, 256, 128, 5
    e, sp, rp, wk, snd, rcv, mask, plan = _banded_case(
        3, N, E_valid, E, L, B=B
    )

    def loss(wk, e, sp, rp, pb_):
        e2, agg = fused_edge_block(
            e, sp, rp, wk, plan, N, interpret=True, pb=pb_
        )
        return jnp.sum(jnp.sin(e2)) + jnp.sum(jnp.cos(agg)), (e2, agg)

    (l1, (e2_1, agg_1)), g1 = jax.value_and_grad(
        loss, has_aux=True, argnums=(0, 1, 2, 3)
    )(wk, e, sp, rp, 1)
    (l2, (e2_2, agg_2)), g2 = jax.value_and_grad(
        loss, has_aux=True, argnums=(0, 1, 2, 3)
    )(wk, e, sp, rp, pb)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e2_1), np.asarray(e2_2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(agg_1), np.asarray(agg_2), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # pb changes f32 accumulation order in the weight-grad reductions
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-4
        )

    def vloss(wk, e, sp, rp):
        def per(e1, sp1, rp1):
            e2, agg = fused_edge_block_batchable(
                e1, sp1, rp1, wk, plan, N, interpret=True, pb=pb
            )
            return jnp.sum(jnp.sin(e2)) + jnp.sum(jnp.cos(agg))

        return jnp.sum(jax.vmap(per)(e, sp, rp))

    lv, gv = jax.value_and_grad(vloss, argnums=(0, 1, 2, 3))(wk, e, sp, rp)
    np.testing.assert_allclose(float(lv), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gv), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-4
        )


@pytest.mark.parametrize("chunk,exp_sb", [(256, 2), (512, 4)])
def test_sender_subwindows_shrink_W_and_match(chunk, exp_sb):
    """Per-subchunk sender windows (BandPlan.SB > 1) halve W on banded
    meshes and stay exact vs the oracle in both passes."""
    N, E_valid, L = 445, 2000, 8
    E = ((E_valid + chunk - 1) // chunk) * chunk
    e, sp, rp, wk, snd, rcv, mask, _ = _banded_case(
        9, N, E_valid, E, L, band=40
    )
    snd_n, rcv_n = np.asarray(snd), np.asarray(rcv)
    auto = build_band_plan(snd_n, rcv_n, N, num_valid=E_valid, chunk=chunk)
    one = build_band_plan(
        snd_n, rcv_n, N, num_valid=E_valid, chunk=chunk, sb=1
    )
    assert auto.SB == exp_sb and auto.w_s.shape == (exp_sb, auto.C)
    assert auto.W < one.W, (auto.W, one.W)

    ref_e2, ref_agg = _oracle(e, sp, rp, wk, snd, rcv, mask, N)
    rng = np.random.default_rng(13)
    ge2 = jnp.asarray(rng.normal(size=(E, L)).astype(np.float32)) * mask[:, None]
    gagg = jnp.asarray(rng.normal(size=(N, 4 * L)).astype(np.float32))

    for plan in (auto, one):
        e2, agg = fused_edge_block(e, sp, rp, wk, plan, N)
        m = np.asarray(mask)[:, None]
        np.testing.assert_allclose(
            np.asarray(e2) * m, np.asarray(ref_e2) * m, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(agg), np.asarray(ref_agg), atol=2e-5
        )

    def loss(kind, e, sp, rp, wk):
        if kind == "oracle":
            e2, agg = _oracle(e, sp, rp, wk, snd, rcv, mask, N)
        else:
            e2, agg = fused_edge_block(e, sp, rp, wk, auto, N)
        return jnp.vdot(e2 * mask[:, None], ge2) + jnp.vdot(agg, gagg)

    gr = jax.grad(functools.partial(loss, "oracle"), argnums=(0, 1, 2, 3))(
        e, sp, rp, wk
    )
    gf = jax.grad(functools.partial(loss, "fused"), argnums=(0, 1, 2, 3))(
        e, sp, rp, wk
    )
    m = np.asarray(mask)[:, None]
    np.testing.assert_allclose(
        np.asarray(gf[0]) * m, np.asarray(gr[0]) * m, atol=3e-4
    )
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]), atol=3e-4)
    for k in gr[3]:
        np.testing.assert_allclose(
            np.asarray(gf[3][k]), np.asarray(gr[3][k]), atol=3e-3, rtol=1e-4,
            err_msg=f"weight grad {k}",
        )
