"""Cross-trajectory bucketing tests: padded == unpadded on real nodes."""
import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.bucketing import (
    PAD_NODE_TYPE,
    pad_topology,
    pad_trajectory,
    trajectory_capacity,
)
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp
from hyper_graph_nets_tpu.training.simulator import MeshSimulator
from hyper_graph_nets_tpu.training.trainer import Trainer, batched_forward

PARAMS = {
    "task": {"dataset": "flag_minimal", "batch_size": 4, "n_timesteps": 8},
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


def two_sizes():
    t1 = add_targets(synthetic.flag_trajectory(num_steps=10, nx=4, ny=4), "world_pos", True)
    t2 = add_targets(synthetic.flag_trajectory(num_steps=10, nx=6, ny=5), "world_pos", True)
    return t1, t2


class TestBucketing:
    def test_capacity_and_padding(self):
        t1, t2 = two_sizes()
        n, e = trajectory_capacity([t1, t2])
        assert n == 30
        padded = pad_trajectory(t1, n)
        assert padded["world_pos"].shape[1] == 30
        assert (padded["node_type"][:, 16:, 0] == PAD_NODE_TYPE).all()
        # original data untouched
        np.testing.assert_array_equal(padded["world_pos"][:, :16], t1["world_pos"])
        assert padded["cells"].shape == t1["cells"].shape  # cells not padded

    def test_padded_forward_matches_unpadded_on_real_nodes(self):
        t1, t2 = two_sizes()
        n, e = trajectory_capacity([t1, t2])
        model = FlagModel(PARAMS)
        state = model.init_state(jax.random.PRNGKey(0))

        topo_u = model.topology_from_trajectory(t1)
        frames_u = {k: jnp.asarray(v[:3]) for k, v in t1.items() if k != "cells"}
        graph_u, _, _ = model.make_graph(state, topo_u, frames_u, False)
        out_u = np.asarray(batched_forward(model, state.params, graph_u))

        padded = pad_trajectory(t1, n)
        topo_p = pad_topology(model, padded, n, e)
        frames_p = {k: jnp.asarray(v[:3]) for k, v in padded.items() if k != "cells"}
        graph_p, _, _ = model.make_graph(state, topo_p, frames_p, False)
        out_p = np.asarray(batched_forward(model, state.params, graph_p))

        np.testing.assert_allclose(out_p[:, :16], out_u, rtol=2e-4, atol=1e-5)

    def test_padded_normalizer_stats_match(self):
        t1, t2 = two_sizes()
        n, e = trajectory_capacity([t1, t2])
        model = FlagModel(PARAMS)
        state = model.init_state(jax.random.PRNGKey(0))
        frames_u = {k: jnp.asarray(v[:3]) for k, v in t1.items() if k != "cells"}
        topo_u = model.topology_from_trajectory(t1)
        _, _, s_u = model.make_graph(state, topo_u, frames_u, True)

        padded = pad_trajectory(t1, n)
        topo_p = pad_topology(model, padded, n, e)
        frames_p = {k: jnp.asarray(v[:3]) for k, v in padded.items() if k != "cells"}
        _, _, s_p = model.make_graph(state, topo_p, frames_p, True)
        for name in ("node", "mesh_edge", "node_dynamic"):
            np.testing.assert_allclose(
                np.asarray(s_u.normalizers[name].acc_sum),
                np.asarray(s_p.normalizers[name].acc_sum),
                rtol=1e-5,
                atol=1e-6,
            )
            assert float(s_u.normalizers[name].acc_count) == float(
                s_p.normalizers[name].acc_count
            )

    def test_mixed_size_training_via_simulator(self):
        t1, t2 = two_sizes()
        sim = MeshSimulator(PARAMS, out_dir="/tmp/bucketing_test_out")
        ts = sim.initialize()
        n, e = trajectory_capacity([t1, t2])
        sim.set_capacity(n, e)
        ts, l1 = sim.fit_trajectory(ts, t1)
        ts, l2 = sim.fit_trajectory(ts, t2)
        assert np.isfinite(l1).all() and np.isfinite(l2).all()
        # both trajectories shared one compiled step
        assert len(sim._step_cache) == 1

    def test_mixed_size_training_fused(self):
        """Bucketed variable-size trajectories train on the fused Pallas
        path: pad_topology rebuilds the band plan at padded capacity with
        the padded edge tail masked out."""
        from hyper_graph_nets_tpu.models.base import Topology

        params = {
            **PARAMS,
            "model": {**PARAMS["model"], "agg_vjp": "fused"},
        }
        t1, t2 = two_sizes()
        sim = MeshSimulator(params, out_dir="/tmp/bucketing_fused_out")
        ts = sim.initialize()
        n, e = trajectory_capacity([t1, t2])
        sim.set_capacity(n, e)
        ts, l1 = sim.fit_trajectory(ts, t1)
        ts, l2 = sim.fit_trajectory(ts, t2)
        assert np.isfinite(l1).all() and np.isfinite(l2).all()
        plans = [
            topo.band_plan
            for topo in sim._topo_cache.values()
            if isinstance(topo, Topology)
        ]
        assert plans and all(p is not None for p in plans)

    def test_bucketed_step_uses_each_trajectorys_connectivity(self):
        """The shared compiled step must consume each trajectory's OWN
        topology (passed as a traced argument), not the first trajectory's
        baked constants: the simulator's loss on trajectory 2 must match a
        dedicated step compiled for trajectory 2's mesh."""
        t1, t2 = two_sizes()
        n, e = trajectory_capacity([t1, t2])
        sim = MeshSimulator(PARAMS, out_dir="/tmp/bucketing_conn_out")
        ts0 = sim.initialize()
        sim.set_capacity(n, e)

        # drive the shared-step path on t1 first so its compile happens
        # against t1's arrays, then evaluate t2 through the SAME cache entry
        topo1 = sim._topology(t1)
        topo2 = sim._topology(t2)
        step_t1 = sim._train_step_fn(topo1, t1)
        step_t2 = sim._train_step_fn(topo2, t2)
        assert len(sim._step_cache) == 1  # one compiled program for both

        key = jax.random.PRNGKey(7)
        frames2 = {
            k: jnp.asarray(pad_trajectory(t2, n)[k][:4])
            for k in t2 if k != "cells"
        }
        # fresh copies per call: train steps donate their tstate buffers
        fresh = lambda: jax.tree.map(jnp.array, ts0)
        # oracle: a dedicated baked-topology step for t2's mesh
        oracle = sim.trainer.make_train_step(topo2)
        _, loss_oracle = oracle(fresh(), frames2, key)
        _, loss_shared, _ = step_t2(fresh(), frames2, key)
        np.testing.assert_allclose(
            float(loss_shared), float(loss_oracle), rtol=1e-5
        )
        # and it must NOT equal t1-connectivity output (different mesh)
        _, loss_wrong, _ = step_t1(fresh(), frames2, key)
        assert abs(float(loss_wrong) - float(loss_oracle)) > 1e-6

    def test_mesh_cache_distinguishes_prefix_identical_meshes(self):
        """Two meshes with identical shape and identical leading cells must
        not collide in the simulator's topology cache (keys hash the FULL
        cell array — core.mesh.mesh_fingerprint)."""
        t1, _ = two_sizes()
        t2 = {k: np.copy(v) for k, v in t1.items()}
        # change connectivity far from the front: swap two late cells'
        # orientation (valid triangles, same shape, same first 8 cells)
        t2["cells"][:, -1] = t2["cells"][:, -1][:, [1, 0, 2]]
        sim = MeshSimulator(PARAMS, out_dir="/tmp/bucketing_key_out")
        k1 = sim._mesh_key("topo", t1)
        k2 = sim._mesh_key("topo", t2)
        assert k1 != k2
        # both meshes get their own cache entry (no silent reuse)
        sim._topology(t1)
        sim._topology(t2)
        assert len(sim._topo_cache) == 2
        # same leading cells would have collided under the old
        # (shape, cells[:8].sum(), n) fingerprint
        assert np.array_equal(t1["cells"][0][:8], t2["cells"][0][:8])

    def test_rmp_excludes_padded_nodes(self):
        t1, t2 = two_sizes()
        n, e = trajectory_capacity([t1, t2])
        params = {
            **PARAMS,
            "model": {
                **PARAMS["model"],
                "rmp": {
                    "clustering": "kmeans",
                    "connector": "hyper",
                    "num_clusters": 3,
                    "hyper_noise": 0.005,
                    "hyper_node_features": True,
                    "frequency": 1,
                    "fully_connect": False,
                    "intra_cluster_sampling": {
                        "enabled": False,
                        "alpha": 0.1,
                        "spotter_threshold": 0,
                    },
                },
            },
        }
        model = FlagModel(params)
        padded = pad_trajectory(t1, n)
        topo = pad_topology(model, padded, n, e)
        rmp = get_rmp(params)
        static = rmp.prepare(model, {k: v[0] for k, v in padded.items()}, topo)
        assert static.member_mask[16:].sum() == 0  # padded nodes in no cluster
        assert static.member_mask[:16].sum() == 16


def test_bucket_plan_dims_pins_one_signature():
    """With agg_vjp=fused, bucket_plan_dims pins (chunk, sb, W, WR, steps,
    nr) so every trajectory in the bucket yields band plans with IDENTICAL
    array shapes — one compiled train-step signature per bucket."""
    from hyper_graph_nets_tpu.data.bucketing import bucket_plan_dims
    from hyper_graph_nets_tpu.models.get_model import get_model

    params = {
        "task": dict(PARAMS["task"]),
        "model": {**PARAMS["model"], "agg_vjp": "fused"},
    }
    t1, t2 = two_sizes()
    t3 = add_targets(
        synthetic.flag_trajectory(num_steps=10, nx=7, ny=7), "world_pos", True
    )
    trajs = [t1, t2, t3]
    model = FlagModel(params)
    n_cap, e_cap = trajectory_capacity(trajs)
    dims = bucket_plan_dims(model, trajs, n_cap, e_cap)
    assert isinstance(dims, dict)

    shapes = []
    for t in trajs:
        topo = pad_topology(model, t, n_cap, e_cap, plan_dims=dims)
        assert topo.band_plan is not None
        shapes.append(
            jax.tree.map(lambda a: a.shape, topo.band_plan._asdict())
        )
    assert shapes[0] == shapes[1] == shapes[2]

    # "off" sentinel: every topology drops its plan (again one signature)
    for t in trajs:
        topo = pad_topology(model, t, n_cap, e_cap, plan_dims="off")
        assert topo.band_plan is None

    # a model off the fused path gets None (no pinning needed)
    params_unfused = {"task": dict(PARAMS["task"]), "model": dict(PARAMS["model"])}
    assert bucket_plan_dims(FlagModel(params_unfused), trajs, n_cap, e_cap) is None


class TestBucketedPlate:
    """The real deforming_plate dataset has per-trajectory node counts, so
    plate + bucketing IS the real-data scenario: pad_topology attaches the
    model's obstacle aux at a bucket-stable capacity (pad_topology_aux), so
    the obstacle-restricted [O, N] radius query runs on the bucketed path
    too.  Padded nodes are PAD_NODE_TYPE (never NORMAL/OBSTACLE), so they
    can neither send nor receive world edges."""

    def test_mixed_size_plate_training(self):
        from hyper_graph_nets_tpu.models.plate import PlateModel  # noqa: F401

        params = {
            "task": {"dataset": "deforming_plate", "batch_size": 4,
                     "n_timesteps": 8},
            "model": {
                **PARAMS["model"],
                "field": "world_pos",
                "history": False,
                "max_world_edges": 64,
            },
        }
        t1 = add_targets(
            synthetic.plate_trajectory(num_steps=10, nx=5, ny=5),
            "world_pos", False,
        )
        t2 = add_targets(
            synthetic.plate_trajectory(num_steps=10, nx=6, ny=5),
            "world_pos", False,
        )
        sim = MeshSimulator(params, out_dir="/tmp/bucketing_plate_out")
        ts = sim.initialize()
        n, e = trajectory_capacity([t1, t2])
        sim.set_capacity(n, e)
        ts, l1 = sim.fit_trajectory(ts, t1)
        ts, l2 = sim.fit_trajectory(ts, t2)
        assert np.isfinite(l1).all() and np.isfinite(l2).all()
        assert len(sim._step_cache) == 1  # one shared compiled step
        # the padded world query found the real contact edges: recompute
        # the last-frame hit count on the padded trajectory directly
        model = sim.model
        tp = pad_trajectory(t2, n)
        frame = {k: jnp.asarray(v[-1]) for k, v in tp.items() if k != "cells"}
        topo = sim._topology(tp)
        assert topo.aux is not None and "obstacle_idx" in topo.aux
        ws, wr, wm, _ = model._world_edges(
            frame["world_pos"], frame["node_type"],
            jnp.asarray(topo.senders), jnp.asarray(topo.receivers),
            obstacle_idx=jnp.asarray(topo.aux["obstacle_idx"]),
            obstacle_valid=jnp.asarray(topo.aux["obstacle_valid"]),
        )
        nt = np.asarray(tp["node_type"][-1][:, 0])
        valid = np.asarray(wm) > 0
        assert valid.sum() >= 1  # contact data produces edges here
        assert (nt[np.asarray(ws)[valid]] == 1).all()  # OBSTACLE senders
        assert (nt[np.asarray(wr)[valid]] == 0).all()  # NORMAL receivers

    def test_bucketed_auto_world_capacity(self):
        """max_world_edges: auto on the bucketed path: per-trajectory
        capacity floored at the bucket max (one shared signature for the
        typical bucket)."""
        from hyper_graph_nets_tpu.models.plate import PlateModel

        params = {
            "task": {"dataset": "deforming_plate", "batch_size": 4,
                     "n_timesteps": 8},
            "model": {
                **PARAMS["model"],
                "field": "world_pos",
                "history": False,
                "max_world_edges": "auto",
            },
        }
        t1 = add_targets(
            synthetic.plate_trajectory(num_steps=10, nx=5, ny=5),
            "world_pos", False,
        )
        t2 = add_targets(
            synthetic.plate_trajectory(num_steps=10, nx=6, ny=5),
            "world_pos", False,
        )
        model = PlateModel(params)
        extras = model.bucket_topology_extras([t1, t2])
        assert extras["world_floor"] >= 64
        assert extras["obstacle_cap"] >= 9
        sim = MeshSimulator(params, out_dir="/tmp/bucketing_autocap_out")
        ts = sim.initialize()
        n, e = trajectory_capacity([t1, t2])
        sim.set_capacity(n, e, topo_extras=extras)
        topo1, topo2 = sim._topology(pad_trajectory(t1, n)), sim._topology(
            pad_trajectory(t2, n)
        )
        assert topo1.world_cap == extras["world_floor"]
        assert topo2.world_cap == extras["world_floor"]
        assert topo1.aux["obstacle_idx"].shape == topo2.aux[
            "obstacle_idx"
        ].shape
        ts, l1 = sim.fit_trajectory(ts, t1)
        ts, l2 = sim.fit_trajectory(ts, t2)
        assert np.isfinite(l1).all() and np.isfinite(l2).all()
        assert len(sim._step_cache) == 1  # one shared compiled step
