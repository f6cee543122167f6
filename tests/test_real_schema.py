"""Real-dataset schema fixture: the DeepMind meta.json contract end-to-end.

The real DeepMind TFRecords cannot be downloaded in this environment (zero
egress — download.sh fails on DNS), so this fixture reproduces their EXACT
on-disk contract locally: a meta.json with ``-1`` (varying) node dims, the
real key set / dtypes / static-vs-dynamic types for flag_simple
(reference src/data/preprocessing.py:30-56), and trajectories whose node
counts differ per record.  When egress exists, pointing the data dir at the
downloaded files is a config change, not a code change — this test pins
that.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.data import synthetic, tfrecord
from hyper_graph_nets_tpu.data.bucketing import trajectory_capacity
from hyper_graph_nets_tpu.data.loader import get_data
from hyper_graph_nets_tpu.training.simulator import MeshSimulator

T = 12  # trajectory_length (real flag_simple: 400; small here for speed)


def _deepmind_meta():
    """Byte-for-byte structure of the real flag_simple meta.json: varying
    node dims are ``-1``, static features store one frame, the dynamic
    field's leading dim is trajectory_length."""
    return {
        "simulator": "flag",
        "dt": 0.02,
        "collision_radius": None,
        "trajectory_length": T,
        "features": {
            "cells": {"type": "static", "shape": [1, -1, 3], "dtype": "int32"},
            "node_type": {
                "type": "static", "shape": [1, -1, 1], "dtype": "int32",
            },
            "mesh_pos": {
                "type": "static", "shape": [1, -1, 2], "dtype": "float32",
            },
            "world_pos": {
                "type": "dynamic", "shape": [T, -1, 3], "dtype": "float32",
            },
        },
        "field_names": ["cells", "node_type", "mesh_pos", "world_pos"],
    }


def _write_fixture(root):
    """Variable-node-count trajectories under the real directory layout."""
    in_dir = os.path.join(root, "flag_simple", "input")
    os.makedirs(in_dir, exist_ok=True)
    # different mesh sizes per trajectory — the real flag_simple property
    # (~1579 nodes varying per trajectory)
    sizes = [(6, 6), (7, 5), (5, 7)]
    trajs = [
        synthetic.flag_trajectory(num_steps=T, nx=nx, ny=ny, seed=i)
        for i, (nx, ny) in enumerate(sizes)
    ]
    for split, subset in (
        ("train", trajs), ("valid", trajs[:1]), ("test", trajs[1:2])
    ):
        tfrecord.write_trajectories(
            os.path.join(in_dir, f"{split}.tfrecord"), subset
        )
    with open(os.path.join(in_dir, "meta.json"), "w") as fp:
        json.dump(_deepmind_meta(), fp)
    return trajs


PARAMS = {
    "task": {"dataset": "flag_simple", "batch_size": 4, "n_timesteps": 8},
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


class TestRealSchema:
    def test_varying_node_counts_decode(self, tmp_path):
        """-1 node dims in meta.json decode per-record node counts."""
        trajs = _write_fixture(tmp_path)
        loader = get_data(PARAMS, split="train", data_dir=str(tmp_path))
        loaded = loader.take(3)
        assert [t["world_pos"].shape[1] for t in loaded] == [36, 35, 35]
        for raw, got in zip(trajs, loaded):
            # dynamic field decodes exactly (modulo the add_targets window:
            # cur = f[1:-1], prev = f[:-2], target = f[2:]);
            # static features tile over trajectory_length
            np.testing.assert_array_equal(got["world_pos"], raw["world_pos"][1:-1])
            np.testing.assert_array_equal(got["prev|world_pos"], raw["world_pos"][:-2])
            np.testing.assert_array_equal(got["target|world_pos"], raw["world_pos"][2:])
            np.testing.assert_array_equal(got["cells"][0], raw["cells"][0])
            np.testing.assert_array_equal(got["cells"][-1], raw["cells"][0])
            assert got["cells"].shape[0] == T - 2
            assert got["node_type"].dtype == np.int32
            assert got["world_pos"].dtype == np.float32
            # history/target windows attached (model.field)
            assert "prev|world_pos" in got and "target|world_pos" in got

    def test_loader_bucketing_train_step_pipeline(self, tmp_path):
        """Full pipeline over the real schema: loader -> capacity ->
        bucketed training across differing meshes with ONE compiled step."""
        _write_fixture(tmp_path)
        loader = get_data(PARAMS, split="train", data_dir=str(tmp_path))
        trajs = loader.take(3)
        n_cap, e_cap = trajectory_capacity(trajs)
        assert n_cap == 36

        sim = MeshSimulator(PARAMS, out_dir=str(tmp_path / "out"))
        ts = sim.initialize()
        sim.set_capacity(n_cap, e_cap)
        for traj in trajs:
            ts, losses = sim.fit_trajectory(ts, traj)
            assert np.isfinite(losses).all()
        # same padded signature -> one compiled program for all three meshes
        assert len(sim._step_cache) == 1
        val = sim.one_step_evaluator(ts, loader.take(2), logging=False)
        assert np.isfinite(val["validation_loss"])

    def test_fused_path_on_varying_meshes(self, tmp_path):
        """The shipped fused config trains over the fixture (band plans are
        rebuilt at padded capacity; RCM reorder handles general meshes),
        and the task-style pinned plan dims keep it at ONE compiled step."""
        from hyper_graph_nets_tpu.data.bucketing import bucket_plan_dims

        _write_fixture(tmp_path)
        params = {**PARAMS, "model": {**PARAMS["model"], "agg_vjp": "fused"}}
        loader = get_data(params, split="train", data_dir=str(tmp_path))
        trajs = loader.take(2)
        n_cap, e_cap = trajectory_capacity(trajs)
        sim = MeshSimulator(params, out_dir=str(tmp_path / "out_fused"))
        ts = sim.initialize()
        # mirror training.task._setup_bucketing: plan dims computed on the
        # REORDERED trajectories (RCM changes the windows the plans see)
        dims = bucket_plan_dims(
            sim.model, [sim._maybe_reorder(t) for t in trajs], n_cap, e_cap
        )
        sim.set_capacity(n_cap, e_cap, plan_dims=dims)
        for traj in trajs:
            ts, losses = sim.fit_trajectory(ts, traj)
            assert np.isfinite(losses).all()
        assert len(sim._step_cache) == 1, "bucketed fused step recompiled"
