"""Tests for the gather-only custom-VJP pna aggregation primitive."""
import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.core.mesh import receivers_to_gather
from hyper_graph_nets_tpu.core.segment_ops import gather_aggregate, pna_gather


class TestPnaGatherVJP:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.E, self.N, self.F = 40, 12, 5
        self.rcv = np.sort(rng.randint(0, self.N, self.E)).astype(np.int32)
        gidx, gval = receivers_to_gather(self.rcv, self.N)
        self.gidx, self.gval = jnp.asarray(gidx), jnp.asarray(gval)
        self.data = jnp.asarray(rng.randn(self.E, self.F).astype(np.float32))
        self.mask = jnp.ones(self.E)

    def test_forward_matches_reference(self):
        a = pna_gather(self.data, self.gidx, self.gval, jnp.asarray(self.rcv), self.mask)
        b = gather_aggregate(self.data, self.gidx, self.gval, "pna")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_gradient_matches_autodiff(self):
        f1 = lambda d: jnp.sum(
            jnp.sin(pna_gather(d, self.gidx, self.gval, jnp.asarray(self.rcv), self.mask))
        )
        f2 = lambda d: jnp.sum(jnp.sin(gather_aggregate(d, self.gidx, self.gval, "pna")))
        g1 = jax.grad(f1)(self.data)
        g2 = jax.grad(f2)(self.data)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)

    def test_masked_edges_get_zero_cotangent(self):
        mask = self.mask.at[3:7].set(0.0)
        gval = np.asarray(self.gval) * (
            1 - np.isin(np.asarray(self.gidx), [3, 4, 5, 6]) * (np.asarray(self.gval) > 0)
        )
        g = jax.grad(
            lambda d: jnp.sum(
                jnp.sin(
                    pna_gather(
                        d, self.gidx, jnp.asarray(gval, jnp.float32),
                        jnp.asarray(self.rcv), mask,
                    )
                )
            )
        )(self.data)
        assert float(jnp.abs(g[3:7]).max()) == 0.0

    def test_vmap(self):
        data = jnp.stack([self.data, self.data * 2])
        out = jax.vmap(
            lambda d: pna_gather(d, self.gidx, self.gval, jnp.asarray(self.rcv), self.mask)
        )(data)
        ref = jax.vmap(lambda d: gather_aggregate(d, self.gidx, self.gval, "pna"))(data)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


class TestGatherRowsVJP:
    """gather_rows: row gather with a gather-only backward (no scatter)."""

    def setup_method(self):
        rng = np.random.RandomState(1)
        self.N, self.E, self.F = 15, 50, 4
        self.idx = rng.randint(0, self.N, self.E).astype(np.int32)
        inv_idx, inv_val = receivers_to_gather(self.idx, self.N)
        self.inv_idx, self.inv_val = jnp.asarray(inv_idx), jnp.asarray(inv_val)
        self.x = jnp.asarray(rng.randn(self.N, self.F).astype(np.float32))

    def test_forward_is_take(self):
        from hyper_graph_nets_tpu.core.segment_ops import gather_rows

        out = gather_rows(self.x, jnp.asarray(self.idx), self.inv_idx, self.inv_val)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(self.x)[self.idx]
        )

    def test_gradient_matches_autodiff(self):
        from hyper_graph_nets_tpu.core.segment_ops import gather_rows

        idx = jnp.asarray(self.idx)
        f1 = lambda x: jnp.sum(jnp.cos(gather_rows(x, idx, self.inv_idx, self.inv_val)))
        f2 = lambda x: jnp.sum(jnp.cos(jnp.take(x, idx, axis=-2)))
        np.testing.assert_allclose(
            np.asarray(jax.grad(f1)(self.x)),
            np.asarray(jax.grad(f2)(self.x)),
            rtol=1e-5,
            atol=1e-6,
        )


class TestAggVjpTrainStepParity:
    """model.agg_vjp='gather' (scatter-free backward) produces the same
    training step as the XLA-AD path — loss and updated params bit-close."""

    def _run(self, vjp):
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
                "agg_vjp": vjp,
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=10, nx=6, ny=6), "world_pos", True
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}
        ts, loss = step(ts, frames, jax.random.PRNGKey(1))
        return float(loss), ts

    def test_loss_and_params_match(self):
        l1, t1 = self._run("xla")
        l2, t2 = self._run("gather")
        assert abs(l1 - l2) < 1e-6
        for a, b in zip(
            jax.tree.leaves(t1.model.params), jax.tree.leaves(t2.model.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
