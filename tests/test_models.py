"""Integration tests for the system models (flag / cylinder / plate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyper_graph_nets_tpu.core.graph import NodeType
from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.cylinder import CylinderModel
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.models.plate import PlateModel
from hyper_graph_nets_tpu.training.trainer import Trainer, frames_to_batches

BASE_MODEL = {
    "noise": 0.003,
    "gamma": 0.9,
    "aggregation": "pna",
    "learning_rate": 1e-3,
    "message_passing_steps": 2,
    "rmp": {"clustering": "none", "connector": "none"},
    "graph_balancer": {"algorithm": "none"},
}


def flag_setup(num_steps=14, nx=5, ny=5):
    params = {
        "task": {"dataset": "flag_minimal"},
        "model": {
            **BASE_MODEL,
            "field": "world_pos",
            "history": True,
            "size": 3,
        },
    }
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=num_steps, nx=nx, ny=ny),
        "world_pos",
        history=True,
    )
    model = FlagModel(params)
    topo = model.build_topology(traj["cells"][0])
    return params, traj, model, topo


class TestFlagModel:
    def test_training_reduces_loss(self):
        params, traj, model, topo = flag_setup()
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo)
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(10):
            for frames in frames_to_batches(traj, 6):
                key, k = jax.random.split(key)
                ts, loss = step(ts, frames, k)
                losses.append(float(loss))
        assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.7

    def test_batched_forward_matches_single_frame(self):
        params, traj, model, topo = flag_setup()
        state = model.init_state(jax.random.PRNGKey(0))
        frames = {k: jnp.asarray(v[:3]) for k, v in traj.items()}
        graph_b, _, _ = model.make_graph(state, topo, frames, False)
        from hyper_graph_nets_tpu.training.trainer import batched_forward

        out_b = batched_forward(model, state.params, graph_b)
        for i in range(3):
            frame = {k: v[i] for k, v in frames.items()}
            graph, _, _ = model.make_graph(state, topo, frame, False, batched=False)
            out = model.forward(state, graph)
            np.testing.assert_allclose(
                np.asarray(out_b[i]), np.asarray(out), rtol=2e-4, atol=2e-5
            )

    def test_integrator_second_order(self):
        params, traj, model, topo = flag_setup()
        state = model.init_state(jax.random.PRNGKey(0))
        frames = {k: jnp.asarray(v[:2]) for k, v in traj.items()}
        zero_out = jnp.zeros(frames["world_pos"].shape)
        # zero *normalized* output de-normalizes to the running mean (0 at init)
        pred = model.update(state, frames, zero_out)
        want = 2 * frames["world_pos"] - frames["prev|world_pos"]
        np.testing.assert_allclose(np.asarray(pred), np.asarray(want), atol=1e-5)

    def test_rollout_boundary_nodes_fixed(self):
        params, traj, model, topo = flag_setup()
        state = model.init_state(jax.random.PRNGKey(0))
        ops, mse = model.rollout(state, topo, traj, num_steps=5)
        pinned = np.asarray(traj["node_type"][0][:, 0]) != NodeType.NORMAL
        pred = np.asarray(ops["pred_pos"])
        for t in range(5):
            np.testing.assert_allclose(
                pred[t][pinned], np.asarray(traj["world_pos"][0])[pinned], atol=1e-6
            )
        assert mse.shape == (5,)

    def test_normalizers_accumulate_only_in_training(self):
        params, traj, model, topo = flag_setup()
        state = model.init_state(jax.random.PRNGKey(0))
        frames = {k: jnp.asarray(v[:2]) for k, v in traj.items()}
        _, _, s_eval = model.make_graph(state, topo, frames, is_training=False)
        assert float(s_eval.normalizers["node"].acc_count) == 0.0
        # node_dynamic always accumulates (reference flag.py:116 quirk)
        assert float(s_eval.normalizers["node_dynamic"].acc_count) > 0.0
        _, _, s_train = model.make_graph(state, topo, frames, is_training=True)
        assert float(s_train.normalizers["node"].acc_count) > 0.0


class TestCylinderModel:
    def setup_method(self):
        self.params = {
            "task": {"dataset": "cylinder_flow"},
            "model": {
                **BASE_MODEL,
                "field": "velocity",
                "history": False,
                "size": 3,
            },
        }
        self.traj = add_targets(
            synthetic.cylinder_trajectory(num_steps=12, nx=7, ny=5),
            "velocity",
            history=False,
        )
        self.model = CylinderModel(self.params)
        self.topo = self.model.topology_from_trajectory(self.traj)

    def test_node_type_compaction(self):
        nt = jnp.array([[0], [4], [5], [6], [0]], jnp.int32)
        codes = np.asarray(CylinderModel.compact_node_type(nt))
        np.testing.assert_array_equal(codes, [0, 1, 2, 3, 0])

    def test_update_splits_velocity_and_pressure(self):
        state = self.model.init_state(jax.random.PRNGKey(0))
        frames = {k: jnp.asarray(v[:2]) for k, v in self.traj.items()}
        out = jnp.zeros((2, frames["velocity"].shape[1], 3))
        vel, pressure = self.model.update(state, frames, out)
        assert vel.shape[-1] == 2 and pressure.shape[-1] == 1
        np.testing.assert_allclose(
            np.asarray(vel), np.asarray(frames["velocity"]), atol=1e-6
        )

    def test_train_and_rollout(self):
        trainer = Trainer(self.model, self.params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(self.topo)
        key = jax.random.PRNGKey(1)
        for frames in frames_to_batches(self.traj, 5):
            key, k = jax.random.split(key)
            ts, loss = step(ts, frames, k)
        assert np.isfinite(float(loss))
        ops, mse = self.model.rollout(ts.model, self.topo, self.traj, num_steps=6)
        assert ops["pred_pressure"].shape[0] == 6
        assert np.isfinite(np.asarray(mse)).all()


class TestPlateModel:
    def setup_method(self):
        self.params = {
            "task": {"dataset": "deforming_plate"},
            "model": {
                **BASE_MODEL,
                "field": "world_pos",
                "history": False,
                "size": 3,
                "max_world_edges": 64,
            },
        }
        self.traj = add_targets(
            synthetic.plate_trajectory(num_steps=12, nx=5, ny=5),
            "world_pos",
            history=False,
        )
        self.model = PlateModel(self.params)
        self.topo = self.model.topology_from_trajectory(self.traj)

    def test_world_edges_constraints(self):
        frame = {k: jnp.asarray(v[0]) for k, v in self.traj.items()}
        # force proximity: move one obstacle node near a normal node
        wp = np.asarray(frame["world_pos"]).copy()
        nt = np.asarray(frame["node_type"])
        obs = np.where(nt[:, 0] == NodeType.OBSTACLE)[0]
        nrm = np.where(nt[:, 0] == NodeType.NORMAL)[0]
        wp[obs[0]] = wp[nrm[0]] + 0.01
        ws, wr, wm, _ = self.model._world_edges(
            jnp.asarray(wp),
            frame["node_type"],
            jnp.asarray(self.topo.senders),
            jnp.asarray(self.topo.receivers),
        )
        ws, wr, wm = np.asarray(ws), np.asarray(wr), np.asarray(wm)
        valid = wm > 0
        assert valid.sum() >= 1
        # senders obstacle-only, receivers normal-only
        assert set(nt[ws[valid], 0]) <= {int(NodeType.OBSTACLE)}
        assert set(nt[wr[valid], 0]) <= {int(NodeType.NORMAL)}
        # radius constraint
        d = np.linalg.norm(wp[ws[valid]] - wp[wr[valid]], axis=1)
        assert (d < 0.03).all()
        # no duplicates of mesh edges
        mesh_pairs = set(zip(self.topo.senders.tolist(), self.topo.receivers.tolist()))
        assert not (set(zip(ws[valid].tolist(), wr[valid].tolist())) & mesh_pairs)
        # sorted by receiver among valid entries
        assert (np.diff(wr[valid]) >= 0).all()

    def test_train_and_rollout(self):
        trainer = Trainer(self.model, self.params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(self.topo)
        key = jax.random.PRNGKey(1)
        for frames in frames_to_batches(self.traj, 5):
            key, k = jax.random.split(key)
            ts, loss = step(ts, frames, k)
        assert np.isfinite(float(loss))
        ops, mse = self.model.rollout(ts.model, self.topo, self.traj, num_steps=6)
        # obstacle nodes track ground-truth targets during rollout
        pred = np.asarray(ops["pred_pos"])
        tgt = np.asarray(self.traj["target|world_pos"][:6])
        obs = np.asarray(self.traj["node_type"][0][:, 0]) == NodeType.OBSTACLE
        np.testing.assert_allclose(pred[:, obs], tgt[:, obs], atol=1e-6)

    def test_obstacle_restricted_query_matches_dense(self):
        """The [O, N] obstacle-row query equals the dense [N, N] query."""
        frame = {k: jnp.asarray(v[0]) for k, v in self.traj.items()}
        wp = np.asarray(frame["world_pos"]).copy()
        nt = np.asarray(frame["node_type"])
        obs = np.where(nt[:, 0] == NodeType.OBSTACLE)[0]
        nrm = np.where(nt[:, 0] == NodeType.NORMAL)[0]
        wp[obs[0]] = wp[nrm[0]] + 0.01
        wp[obs[1]] = wp[nrm[3]] + 0.02
        args = (
            jnp.asarray(wp),
            frame["node_type"],
            jnp.asarray(self.topo.senders),
            jnp.asarray(self.topo.receivers),
        )
        ws_d, wr_d, wm_d, _ = self.model._world_edges(*args)
        aux = self.topo.aux
        ws_r, wr_r, wm_r, _ = self.model._world_edges(
            *args,
            obstacle_idx=jnp.asarray(aux["obstacle_idx"]),
            obstacle_valid=jnp.asarray(aux["obstacle_valid"]),
        )
        dense = set(
            zip(np.asarray(ws_d)[np.asarray(wm_d) > 0].tolist(),
                np.asarray(wr_d)[np.asarray(wm_d) > 0].tolist())
        )
        restricted = set(
            zip(np.asarray(ws_r)[np.asarray(wm_r) > 0].tolist(),
                np.asarray(wr_r)[np.asarray(wm_r) > 0].tolist())
        )
        assert dense == restricted and len(dense) >= 1

    def test_generator_produces_contact(self):
        """The synthetic plate data has REAL contact frames (the obstacle
        descends inside world-edge radius), so the world-edge path the
        reference exercises on deforming_plate (plate.py:85-110) is live
        at every resolution."""
        for nx, T in ((5, 12), (12, 30)):
            traj = synthetic.plate_trajectory(num_steps=T, nx=nx, ny=nx)
            nt = traj["node_type"][0][:, 0]
            obs = nt == NodeType.OBSTACLE
            nrm = nt == NodeType.NORMAL
            w = traj["world_pos"]
            d2 = np.sum(
                (w[-1][obs][:, None] - w[-1][nrm][None]) ** 2, axis=-1
            )
            assert (d2 < 0.03**2).sum() > 0, f"no contact at nx={nx}"

    def test_auto_world_capacity(self):
        """max_world_edges: auto sizes the static capacity per trajectory
        (2x max contact, pow2, >=64) and selects the SAME valid edge set
        as a generous fixed capacity."""
        params = {
            "task": {"dataset": "deforming_plate"},
            "model": {**self.params["model"], "max_world_edges": "auto"},
        }
        model = PlateModel(params)
        topo = model.topology_from_trajectory(self.traj)
        cap = topo.world_cap
        assert cap >= 64 and (cap & (cap - 1)) == 0  # pow2
        frame = {k: jnp.asarray(v[-1]) for k, v in self.traj.items()}
        kw = dict(
            obstacle_idx=jnp.asarray(topo.aux["obstacle_idx"]),
            obstacle_valid=jnp.asarray(topo.aux["obstacle_valid"]),
        )
        args = (
            frame["world_pos"],
            frame["node_type"],
            jnp.asarray(topo.senders),
            jnp.asarray(topo.receivers),
        )
        ws_a, wr_a, wm_a, _ = model._world_edges(*args, world_cap=cap, **kw)
        ws_f, wr_f, wm_f, _ = model._world_edges(*args, world_cap=1024, **kw)
        to_set = lambda ws, wr, wm: set(
            zip(np.asarray(ws)[np.asarray(wm) > 0].tolist(),
                np.asarray(wr)[np.asarray(wm) > 0].tolist())
        )
        assert to_set(ws_a, wr_a, wm_a) == to_set(ws_f, wr_f, wm_f)
        assert len(to_set(ws_a, wr_a, wm_a)) >= 1
        # cap honors the data bound: 2x max hits fits
        cnt = len(to_set(ws_f, wr_f, wm_f))
        assert cap >= min(2 * cnt, 64)
        # end-to-end: a train step + rollout run under the auto capacity
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo)
        key = jax.random.PRNGKey(1)
        for frames in frames_to_batches(self.traj, 5):
            key, k = jax.random.split(key)
            ts, loss = step(ts, frames, k)
        assert np.isfinite(float(loss))
        _, mse = model.rollout(ts.model, topo, self.traj, num_steps=6)
        assert np.isfinite(np.asarray(mse)).all()


class TestNStepChunking:
    """Chunked n-step evaluation (base._n_step_chunked) is exact: any chunk
    size gives the same result as one full-width vmap, including the padded
    final chunk."""

    def test_chunked_matches_full_width(self):
        params, traj, model, topo = flag_setup(num_steps=30)
        state = model.init_state(jax.random.PRNGKey(0))
        results = {}
        for chunk in (1000, 8, 5):  # 1000 -> single chunk of all windows
            params["model"]["n_step_chunk"] = chunk
            model._fn_cache.clear()
            mean, last = model.n_step_computation(
                state, topo, traj, n_step=5
            )
            results[chunk] = (float(mean), float(last))
        full = results[1000]
        for chunk in (8, 5):
            np.testing.assert_allclose(results[chunk][0], full[0], rtol=1e-6)
            np.testing.assert_allclose(results[chunk][1], full[1], rtol=1e-6)

    def test_chunk_size_bounds_compiled_width(self):
        """The compiled program width is the chunk size, not the window count
        (the memory guarantee for real trajectory lengths)."""
        params, traj, model, topo = flag_setup(num_steps=30)
        params["model"]["n_step_chunk"] = 4
        state = model.init_state(jax.random.PRNGKey(0))
        model._fn_cache.clear()
        model.n_step_computation(state, topo, traj, n_step=5)
        keys = [k for k in model._fn_cache if k[0] == "n_step"]
        assert len(keys) == 1
        assert keys[0][4] == 4  # chunk, not num_windows


def test_auto_world_cap_no_same_mesh_aliasing():
    """Two trajectories with the SAME mesh but different motion must not
    share a cached topology under max_world_edges: auto — the capacity is
    a function of the motion (mesh_fingerprint alone hashes cells only)."""
    from hyper_graph_nets_tpu.training.simulator import MeshSimulator

    params = {
        "task": {"dataset": "deforming_plate", "batch_size": 4,
                 "n_timesteps": 8},
        "model": {
            **BASE_MODEL,
            "field": "world_pos",
            "history": False,
            "size": 3,
            "max_world_edges": "auto",
        },
    }
    t_light = add_targets(
        synthetic.plate_trajectory(num_steps=10, nx=5, ny=5),
        "world_pos", False,
    )
    # same mesh, heavy contact: every obstacle node parked on the NORMAL
    # cluster in one frame (81 hits -> capacity 256, vs 64 for the light
    # trajectory)
    t_heavy = {k: v.copy() for k, v in t_light.items()}
    nt = t_heavy["node_type"][0][:, 0]
    rng = np.random.RandomState(0)
    for key in ("world_pos", "target|world_pos"):
        t_heavy[key] = t_heavy[key].copy()
        # cluster all NORMAL and OBSTACLE nodes into one 0.01 ball in the
        # last frame: 9 x 9 = 81 hits -> capacity 256
        close = (nt == NodeType.NORMAL) | (nt == NodeType.OBSTACLE)
        t_heavy[key][-1, close] = 0.005 * rng.rand(int(close.sum()), 3)
    sim = MeshSimulator(params, out_dir="/tmp/world_cap_alias_out")
    topo_heavy = sim._topology(t_heavy)
    topo_light = sim._topology(t_light)
    assert topo_light.world_cap == 64  # light contact -> floor capacity
    assert topo_heavy.world_cap > 64  # heavy contact -> larger capacity
    assert len(sim._topo_cache) == 2  # distinct cache entries
    # and two same-capacity trajectories SHARE one entry (key is the
    # derived capacity, not a motion digest)
    t_light2 = add_targets(
        synthetic.plate_trajectory(num_steps=10, nx=5, ny=5, seed=1),
        "world_pos", False,
    )
    assert sim._topology(t_light2).world_cap == 64
    assert len(sim._topo_cache) == 2


def _heavy_contact_plate_traj(num_steps=12, nx=5, ny=5):
    """Synthetic plate trajectory with all NORMAL+OBSTACLE nodes clustered
    inside one world-edge radius in EVERY frame (including frame 0, so a
    rollout's initial state already has the contact) — every NORMAL node is
    a radius-query hit of every obstacle node (heavy contact)."""
    traj = add_targets(
        synthetic.plate_trajectory(num_steps=num_steps, nx=nx, ny=ny),
        "world_pos", False,
    )
    traj = {k: v.copy() for k, v in traj.items()}
    nt = traj["node_type"][0][:, 0]
    close = (nt == NodeType.NORMAL) | (nt == NodeType.OBSTACLE)
    rng = np.random.RandomState(0)
    ball = 0.005 * rng.rand(int(close.sum()), 3)
    for key in ("world_pos", "target|world_pos"):
        traj[key][:, close] = ball
    return traj


def test_rollout_warns_on_world_capacity_truncation():
    """Radius-query hits dropped by the world-edge capacity during rollout
    raise a host-side warning with the dropped count, and the count lands
    in model.eval_metrics (the reference's dynamic query is uncapped,
    plate.py:85-110 — truncation is a deviation and must be visible)."""
    import warnings

    params = {
        "task": {"dataset": "deforming_plate"},
        "model": {
            **BASE_MODEL,
            "field": "world_pos",
            "history": False,
            "size": 3,
            "max_world_edges": 1,  # heavy contact must overflow this
        },
    }
    traj = _heavy_contact_plate_traj()
    model = PlateModel(params)
    topo = model.topology_from_trajectory(traj)
    state = model.init_state(jax.random.PRNGKey(0))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        model.rollout(state, topo, traj, num_steps=12)
    assert any("world-edge capacity" in str(x.message) for x in w)
    assert model.pop_eval_metrics()["world_edge_truncated"] > 0
    # generous capacity: nothing dropped, no warning, zero counter
    params2 = {**params, "model": {**params["model"], "max_world_edges": 256}}
    model2 = PlateModel(params2)
    topo2 = model2.topology_from_trajectory(traj)
    state2 = model2.init_state(jax.random.PRNGKey(0))
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        model2.rollout(state2, topo2, traj, num_steps=12)
    assert not any("world-edge capacity" in str(x.message) for x in w2)
    assert model2.pop_eval_metrics()["world_edge_truncated"] == 0
    # a single hit exactly filling capacity 1 drops nothing -> no warning
    # (the pre-round-5 full-mask heuristic would false-positive here)
    traj_light = add_targets(
        synthetic.plate_trajectory(num_steps=12, nx=5, ny=5),
        "world_pos", False,
    )
    model3 = PlateModel(params)
    topo3 = model3.topology_from_trajectory(traj_light)
    state3 = model3.init_state(jax.random.PRNGKey(0))
    with warnings.catch_warnings(record=True) as w3:
        warnings.simplefilter("always")
        model3.rollout(state3, topo3, traj_light, num_steps=12)
    assert not any("world-edge capacity" in str(x.message) for x in w3)


def test_world_cap_truncation_visible_in_training_and_eval(tmp_path):
    """VERDICT r4 #6: the truncation COUNT threads through the jitted train
    step, one-step validation, n-step eval, and the training JSONL — not
    just rollout."""
    import json

    from hyper_graph_nets_tpu.training.simulator import MeshSimulator

    params = {
        "task": {
            "dataset": "deforming_plate", "batch_size": 4, "n_timesteps": 8,
        },
        "model": {
            **BASE_MODEL,
            "field": "world_pos",
            "history": False,
            "size": 3,
            "max_world_edges": 2,  # heavy contact overflows this
        },
    }
    traj = _heavy_contact_plate_traj()
    model = PlateModel(params)
    topo = model.topology_from_trajectory(traj)
    trainer = Trainer(model, params)
    ts = trainer.init_train_state(jax.random.PRNGKey(0))
    # step-level: metrics ride out of jit with the loss
    step = trainer.make_train_step(topo, with_metrics=True)
    frames = {k: jnp.asarray(v[4:8]) for k, v in traj.items() if k != "cells"}
    ts, loss, metrics = step(ts, frames, jax.random.PRNGKey(1))
    assert int(metrics["world_edge_truncated"]) > 0
    val = trainer.make_validation_step(topo, with_metrics=True)
    vloss, verr, vmetrics = val(ts.model, frames)
    assert int(vmetrics["world_edge_truncated"]) > 0
    # simulator-level: the counter lands in the metrics JSONL
    sim = MeshSimulator(params, out_dir=str(tmp_path))
    tstate = sim.initialize()
    tstate, _ = sim.fit_trajectory(tstate, traj)
    one = sim.one_step_evaluator(tstate, [traj])
    assert one["world_edge_truncated"] > 0
    nstep = sim.n_step_evaluator(tstate, [traj], n_step=3)
    assert nstep["world_edge_truncated"] > 0
    sim.logger.close()
    jsonl = [
        json.loads(line)
        for p in tmp_path.glob("*.metrics.jsonl")
        for line in open(p)
    ]
    logged = [r for r in jsonl if "world_edge_truncated" in r]
    assert logged and any(r["world_edge_truncated"] > 0 for r in logged)
