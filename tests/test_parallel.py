"""Multi-device tests on the virtual 8-device CPU mesh.

Validates the north-star property (SURVEY.md §7.8): the edge-partitioned /
data-parallel step produces the same results as the single-device step
(modulo fp reduction order).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.parallel import sharding
from hyper_graph_nets_tpu.training.trainer import Trainer

PARAMS = {
    "task": {"dataset": "flag_minimal"},
    "model": {
        "field": "world_pos",
        "history": True,
        "size": 3,
        "noise": 0.003,
        "gamma": 0.9,
        "aggregation": "pna",
        "learning_rate": 1e-3,
        "message_passing_steps": 2,
        "rmp": {"clustering": "none", "connector": "none"},
        "graph_balancer": {"algorithm": "none"},
    },
}


@pytest.fixture()
def setup():
    # function-scoped: the single-device train step donates tstate buffers
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=12, nx=6, ny=6), "world_pos", True
    )
    model = FlagModel(PARAMS)
    topo = model.topology_from_trajectory(traj)
    trainer = Trainer(model, PARAMS)
    tstate = trainer.init_train_state(jax.random.PRNGKey(0))
    return traj, model, topo, trainer, tstate


class TestSharding:
    def test_mesh_construction(self):
        mesh = sharding.make_mesh(data=2, graph=4)
        assert mesh.shape == {"data": 2, "graph": 4}

    def test_shard_topology_pads_and_masks(self, setup):
        traj, model, topo, trainer, tstate = setup
        mesh = sharding.make_mesh(data=2, graph=4)
        st = sharding.shard_topology(topo, mesh)
        assert len(st.senders) % 4 == 0
        n_valid = int(np.asarray(st.mask).sum())
        assert n_valid == len(topo.senders)
        # padded receivers keep sortedness
        assert (np.diff(np.asarray(st.receivers)) >= 0).all()

    def test_sharded_forward_matches_single_device(self, setup):
        traj, model, topo, trainer, tstate = setup
        mesh = sharding.make_mesh(data=2, graph=4)
        st = sharding.shard_topology(topo, mesh)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items()}

        fwd = sharding.make_sharded_forward(model, st, mesh)
        mstate = sharding.replicate(tstate.model, mesh)
        sharded = np.asarray(fwd(mstate, sharding.shard_frames(frames, mesh)))

        graph, _, _ = model.make_graph(tstate.model, topo, frames, False)
        from hyper_graph_nets_tpu.training.trainer import batched_forward

        single = np.asarray(batched_forward(model, tstate.model.params, graph))
        np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-5)

    def test_spmd_train_step_matches_single_device(self, setup):
        traj, model, topo, trainer, tstate = setup
        mesh = sharding.make_mesh(data=2, graph=4)
        st = sharding.shard_topology(topo, mesh)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items()}
        key = jax.random.PRNGKey(7)

        # deep-copy: device_put may alias buffers, and both steps donate arg 0
        replicated = sharding.replicate(jax.tree.map(jnp.copy, tstate), mesh)
        step_spmd = sharding.make_spmd_train_step(trainer, st, mesh)
        ts2, loss2 = step_spmd(replicated, sharding.shard_frames(frames, mesh), key)

        step_single = trainer.make_train_step(topo)
        ts1, loss1 = step_single(tstate, frames, key)
        assert abs(float(loss1) - float(loss2)) < 1e-4
        # parameters after one step agree
        p1 = jax.tree.leaves(ts1.model.params)
        p2 = jax.tree.leaves(ts2.model.params)
        for a, b in zip(p1, p2):
            # Adam normalizes by sqrt(second moment), so near-zero-gradient
            # elements amplify fp reduction-order noise substantially;
            # correctness is pinned by the loss equality + forward parity test
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-3
            )

    def test_halo_forward_matches_single_device(self, setup):
        """Explicit shard_map halo-exchange forward == plain forward."""
        from hyper_graph_nets_tpu.parallel import halo

        traj, model, topo, trainer, tstate = setup
        mesh = sharding.make_mesh(data=1, graph=8)
        stopo = sharding.shard_topology(topo, mesh)
        frame = {k: jnp.asarray(v[0]) for k, v in traj.items() if k != "cells"}
        graph, _, _ = model.make_graph(tstate.model, stopo, frame, False, batched=False)
        fwd = halo.make_halo_forward(model, mesh)
        out_halo = np.asarray(fwd(tstate.model.params, graph))

        graph_u, _, _ = model.make_graph(tstate.model, topo, frame, False, batched=False)
        out_ref = np.asarray(model.forward(tstate.model, graph_u))
        np.testing.assert_allclose(out_halo, out_ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("data,graph", [(1, 8), (2, 4)])
    def test_halo_forward_fused_kernel(self, data, graph):
        """The fused Pallas MP-block kernel composes with the shard_map
        halo forward: per-shard band plans + psum/pmax/pmin partials
        reproduce the single-device forward (edge shards over 'graph';
        a populated 'data' axis must replicate transparently)."""
        from hyper_graph_nets_tpu.parallel import halo

        params = {
            **PARAMS,
            "model": {**PARAMS["model"], "agg_vjp": "fused"},
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=6, ny=6),
            "world_pos", True,
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        assert topo.band_plan is not None
        trainer = Trainer(model, params)
        tstate = trainer.init_train_state(jax.random.PRNGKey(0))

        mesh = sharding.make_mesh(data=data, graph=graph)
        stopo = sharding.shard_topology(topo, mesh, band_plans=True)
        assert stopo.band_plan is not None
        frame = {k: jnp.asarray(v[0]) for k, v in traj.items() if k != "cells"}
        graph, _, _ = model.make_graph(
            tstate.model, stopo, frame, False, batched=False
        )
        assert graph.edge_sets["mesh_edges"].band_plan is not None
        fwd = halo.make_halo_forward(model, mesh)
        out_halo = np.asarray(fwd(tstate.model.params, graph))

        graph_u, _, _ = model.make_graph(
            tstate.model, topo, frame, False, batched=False
        )
        out_ref = np.asarray(model.forward(tstate.model, graph_u))
        np.testing.assert_allclose(out_halo, out_ref, rtol=1e-4, atol=2e-5)

    @pytest.mark.parametrize("data,graph", [(2, 4), (1, 8)])
    def test_spmd_train_step_fused_matches_single_device(self, data, graph):
        """The fused Pallas MP-block kernel on the sharded TRAINING path
        (SURVEY.md §7.8): with agg_vjp=fused and a stacked band plan, the
        GSPMD train step runs both kernels inside a custom-VJP shard_map
        region and must reproduce the single-device fused step's loss and
        post-step parameters."""
        params = {
            **PARAMS,
            "model": {**PARAMS["model"], "agg_vjp": "fused"},
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=6, ny=6),
            "world_pos", True,
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        assert topo.band_plan is not None
        trainer = Trainer(model, params)
        tstate = trainer.init_train_state(jax.random.PRNGKey(0))

        mesh = sharding.make_mesh(data=data, graph=graph)
        st = sharding.shard_topology(topo, mesh)
        assert st.band_plan is not None  # stacked plan built by default
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items()}
        key = jax.random.PRNGKey(7)

        replicated = sharding.replicate(jax.tree.map(jnp.copy, tstate), mesh)
        step_spmd = sharding.make_spmd_train_step(trainer, st, mesh)
        ts2, loss2 = step_spmd(
            replicated, sharding.shard_frames(frames, mesh), key
        )

        step_single = trainer.make_train_step(topo)
        ts1, loss1 = step_single(tstate, frames, key)
        assert abs(float(loss1) - float(loss2)) < 1e-4
        for a, b in zip(
            jax.tree.leaves(ts1.model.params), jax.tree.leaves(ts2.model.params)
        ):
            # same tolerance rationale as the unfused spmd test above
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-3
            )

    def test_data_only_mesh(self, setup):
        traj, model, topo, trainer, tstate = setup
        mesh = sharding.make_mesh(data=8, graph=1)
        st = sharding.shard_topology(topo, mesh)
        frames = {k: jnp.asarray(v[:8]) for k, v in traj.items()}
        step = sharding.make_spmd_train_step(trainer, st, mesh)
        ts, loss = step(
            sharding.replicate(tstate, mesh),
            sharding.shard_frames(frames, mesh),
            jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(loss))


HGN_PARAMS = {
    "task": {"dataset": "flag_minimal"},
    "model": {
        "field": "world_pos",
        "history": True,
        "size": 3,
        "noise": 0.003,
        "gamma": 0.9,
        "aggregation": "pna",
        "learning_rate": 1e-3,
        "message_passing_steps": 2,
        "rmp": {
            "clustering": "kmeans",
            "connector": "hyper",
            "num_clusters": 4,
            "hyper_noise": 0.0,
            "hyper_node_features": True,
            "frequency": 1,
            "fully_connect": False,
            "intra_cluster_sampling": {
                "enabled": False,
                "alpha": 0.1,
                "spotter_threshold": 0,
            },
        },
        "graph_balancer": {"algorithm": "none"},
    },
}


class TestShardedFlagship:
    """Multi-device coverage of the flagship HyperGraphNets architecture:
    hyper tier (N+K row space), 4 edge sets, RMP static incidence under the
    ('data','graph') mesh (VERDICT r1 item 3)."""

    def _hgn_setup(self):
        from hyper_graph_nets_tpu.training.expansion import build_expansion

        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=6, ny=6), "world_pos", True
        )
        model = FlagModel(HGN_PARAMS)
        topo = model.topology_from_trajectory(traj)
        trainer = Trainer(model, HGN_PARAMS)
        tstate = trainer.init_train_state(jax.random.PRNGKey(0))
        expansion = build_expansion(model, HGN_PARAMS)
        return traj, model, topo, trainer, tstate, expansion

    def test_sharded_hgn_forward_matches_single_device(self):
        traj, model, topo, trainer, tstate, expansion = self._hgn_setup()
        mesh = sharding.make_mesh(data=2, graph=4)
        st = sharding.shard_topology(topo, mesh)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}
        frame0 = {k: v[0] for k, v in traj.items()}
        expansion.prepare(model, frame0, topo)
        static = expansion.static

        # Warm the normalizers with one train step: at init their std floor
        # (1e-8) scales eval features by 1e8, amplifying partitioned
        # reduction-order noise into apparent divergence.
        warm = trainer.make_train_step(topo, expansion=expansion)
        tstate, _ = warm(tstate, frames, jax.random.PRNGKey(11), static)

        fwd = sharding.make_sharded_forward(model, st, mesh, expansion=expansion)
        mstate = sharding.replicate(tstate.model, mesh)
        got = np.asarray(fwd(mstate, sharding.shard_frames(frames, mesh), static))

        graph, _, _ = model.make_graph(tstate.model, topo, frames, False)
        graph, _ = expansion.expand(
            tstate.model, graph, frames, model, is_training=False, static=static
        )
        from hyper_graph_nets_tpu.training.trainer import batched_forward

        want = np.asarray(batched_forward(model, tstate.model.params, graph))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_sharded_hgn_train_step_runs_and_matches_loss(self):
        traj, model, topo, trainer, tstate, expansion = self._hgn_setup()
        mesh = sharding.make_mesh(data=2, graph=4)
        st = sharding.shard_topology(topo, mesh)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}
        frame0 = {k: v[0] for k, v in traj.items()}
        expansion.prepare(model, frame0, topo)
        static = expansion.static
        key = jax.random.PRNGKey(7)

        replicated = sharding.replicate(jax.tree.map(jnp.copy, tstate), mesh)
        step_spmd = sharding.make_spmd_train_step(trainer, st, mesh, expansion=expansion)
        ts2, loss2 = step_spmd(
            replicated, sharding.shard_frames(frames, mesh), key, static
        )

        step_single = trainer.make_train_step(topo, expansion=expansion)
        ts1, loss1 = step_single(tstate, frames, key, static)
        assert np.isfinite(float(loss2))
        assert abs(float(loss1) - float(loss2)) < 1e-4


class TestShardedPlate:
    """Sharded plate step: two edge sets with per-frame dynamic world-edge
    topology (batched senders/receivers) under the ('data','graph') mesh."""

    def _plate_setup(self):
        from hyper_graph_nets_tpu.models.plate import PlateModel

        params = {
            "task": {"dataset": "deforming_plate"},
            "model": {
                "field": "world_pos",
                "history": False,
                "size": 3,
                "noise": 0.003,
                "gamma": 1.0,
                "aggregation": "pna",
                "learning_rate": 1e-3,
                "message_passing_steps": 2,
                "max_world_edges": 64,
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
        }
        traj = add_targets(
            synthetic.plate_trajectory(num_steps=12, nx=5, ny=5),
            "world_pos",
            history=False,
        )
        model = PlateModel(params)
        topo = model.topology_from_trajectory(traj)
        trainer = Trainer(model, params)
        tstate = trainer.init_train_state(jax.random.PRNGKey(0))
        return traj, model, topo, trainer, tstate

    def test_sharded_plate_forward_matches_single_device(self):
        traj, model, topo, trainer, tstate = self._plate_setup()
        mesh = sharding.make_mesh(data=2, graph=4)
        st = sharding.shard_topology(topo, mesh)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}

        fwd = sharding.make_sharded_forward(model, st, mesh)
        mstate = sharding.replicate(tstate.model, mesh)
        got = np.asarray(fwd(mstate, sharding.shard_frames(frames, mesh)))

        graph, _, _ = model.make_graph(tstate.model, topo, frames, False)
        from hyper_graph_nets_tpu.training.trainer import batched_forward

        want = np.asarray(batched_forward(model, tstate.model.params, graph))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_sharded_plate_train_step_matches_loss(self):
        traj, model, topo, trainer, tstate = self._plate_setup()
        mesh = sharding.make_mesh(data=2, graph=4)
        st = sharding.shard_topology(topo, mesh)
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}
        key = jax.random.PRNGKey(5)

        replicated = sharding.replicate(jax.tree.map(jnp.copy, tstate), mesh)
        step_spmd = sharding.make_spmd_train_step(trainer, st, mesh)
        ts2, loss2 = step_spmd(replicated, sharding.shard_frames(frames, mesh), key)

        step_single = trainer.make_train_step(topo)
        ts1, loss1 = step_single(tstate, frames, key)
        assert np.isfinite(float(loss2))
        assert abs(float(loss1) - float(loss2)) < 1e-4
