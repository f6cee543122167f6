"""Segmented rollouts with mid-rollout reclustering (rmp frequency > 1)."""
import copy

import jax
import numpy as np

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.training.simulator import MeshSimulator

BASE = {
    "task": {"dataset": "flag_minimal", "batch_size": 4, "n_timesteps": 10},
    "model": {
        "field": "world_pos",
        "history": True,
        "size": 3,
        "noise": 0.003,
        "gamma": 0.9,
        "aggregation": "pna",
        "learning_rate": 1e-3,
        "message_passing_steps": 1,
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
        "graph_balancer": {"algorithm": "none"},
    },
    "random_seed": 0,
}


def make(freq):
    params = copy.deepcopy(BASE)
    params["model"]["rmp"]["frequency"] = freq
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=12, nx=5, ny=5), "world_pos", True
    )
    sim = MeshSimulator(params, out_dir=f"/tmp/segrollout_{freq}")
    ts = sim.initialize()
    return sim, ts, traj


class TestSegmentedRollout:
    def test_freq2_matches_freq1_when_clusters_stable(self):
        """kmeans clusters on static mesh coordinates, so reclustering
        mid-rollout yields identical clusters — the segmented rollout must
        then exactly reproduce the single-scan rollout (carry chaining)."""
        sim1, ts1, traj = make(1)
        r1 = sim1.rollout_evaluator(
            ts1, [traj], n_rollouts=1, num_steps=10, logging=False, save=False
        )
        sim2, ts2, _ = make(2)
        # same init params (same seed/config)
        r2 = sim2.rollout_evaluator(
            ts2, [traj], n_rollouts=1, num_steps=10, logging=False, save=False
        )
        p1 = r1["rollouts"][0]["pred_pos"]
        p2 = r2["rollouts"][0]["pred_pos"]
        assert p1.shape == p2.shape == (10,) + p1.shape[1:]
        np.testing.assert_allclose(p2, p1, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            r2["mse_curve"], r1["mse_curve"], rtol=1e-5, atol=1e-8
        )

    def test_freq3_runs_and_is_finite(self):
        sim, ts, traj = make(3)
        r = sim.rollout_evaluator(
            ts, [traj], n_rollouts=1, num_steps=9, logging=False, save=False
        )
        assert r["rollouts"][0]["pred_pos"].shape[0] == 9
        assert np.isfinite(r["mse_curve"]).all()
