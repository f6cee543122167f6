"""Expansion reset cadence tests (reference expand_graph reset logic)."""
import math

import jax
import numpy as np

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.base import reset_due
from hyper_graph_nets_tpu.training.simulator import MeshSimulator


def reference_resets(num_steps, frequency):
    """Transcription of reference flag.py:130-141 reset cadence."""
    return [
        i for i in range(num_steps) if i % math.ceil(num_steps / frequency) == 0
    ]


class TestResetCadence:
    def test_reset_due_matches_reference(self):
        for num_steps in (10, 399, 320):
            for freq in (1, 2, 4, 10):
                ours = [i for i in range(num_steps) if reset_due(i, num_steps, freq)]
                assert ours == reference_resets(num_steps, freq), (num_steps, freq)

    def test_frequency_one_clusters_once_per_trajectory(self):
        params = {
            "task": {"dataset": "flag_minimal", "batch_size": 3, "n_timesteps": 9},
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
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=4, ny=4), "world_pos", True
        )
        sim = MeshSimulator(params, out_dir="/tmp/cadence_test_out")
        ts = sim.initialize()

        calls = []
        orig = sim.expansion.members[0].prepare

        def counting_prepare(model, frame, topo):
            cached = sim.expansion.members[0]._static is not None
            out = orig(model, frame, topo)
            calls.append("cached" if cached else "cluster")
            return out

        sim.expansion.members[0].prepare = counting_prepare
        ts, _ = sim.fit_trajectory(ts, traj)
        # 9 steps / batch 3 = 3 batches; frequency 1 -> recluster only at
        # the first batch, cache hits afterwards
        assert calls[0] == "cluster"
        assert all(c == "cached" for c in calls[1:])
        # a second trajectory reclusters again (reset at step 0)
        calls.clear()
        ts, _ = sim.fit_trajectory(ts, traj)
        assert calls[0] == "cluster"

    def test_higher_frequency_reclusters_mid_trajectory(self):
        params = {
            "task": {"dataset": "flag_minimal", "batch_size": 3, "n_timesteps": 9},
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
                    "frequency": 3,
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
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=4, ny=4), "world_pos", True
        )
        sim = MeshSimulator(params, out_dir="/tmp/cadence_test_out2")
        ts = sim.initialize()
        calls = []
        orig = sim.expansion.members[0].prepare

        def counting_prepare(model, frame, topo):
            cached = sim.expansion.members[0]._static is not None
            out = orig(model, frame, topo)
            calls.append("cached" if cached else "cluster")
            return out

        sim.expansion.members[0].prepare = counting_prepare
        ts, _ = sim.fit_trajectory(ts, traj)
        # frequency 3 over 9 steps -> resets at 0, 3, 6: every batch reclusters
        assert calls == ["cluster", "cluster", "cluster"]


class TestExpansionCacheKeys:
    """Model fn-cache keys must not alias across different expansion configs
    (the reference hazard: id() of a collected object can be reused)."""

    def _build(self, num_clusters):
        from hyper_graph_nets_tpu.models.flag import FlagModel
        from hyper_graph_nets_tpu.training.expansion import build_expansion

        params = {
            "task": {"dataset": "flag_minimal"},
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
                    "num_clusters": num_clusters,
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
        model = FlagModel(params)
        return model, build_expansion(model, params)

    def test_different_configs_never_alias(self):
        from hyper_graph_nets_tpu.models.base import SystemModel

        model, exp_a = self._build(num_clusters=3)
        key_a = SystemModel._expansion_key(exp_a)
        del exp_a  # simulate GC between trajectories
        _, exp_b = self._build(num_clusters=4)
        key_b = SystemModel._expansion_key(exp_b)
        assert key_a != key_b

    def test_same_config_shares_compiled_fns(self):
        from hyper_graph_nets_tpu.models.base import SystemModel

        _, exp_a = self._build(num_clusters=3)
        _, exp_b = self._build(num_clusters=3)
        assert SystemModel._expansion_key(exp_a) == SystemModel._expansion_key(exp_b)

    def test_raw_member_key_holds_reference(self):
        """A fingerprint-less expansion keys on the object itself (kept alive
        by the cache), never on a reusable id."""
        from hyper_graph_nets_tpu.models.base import SystemModel
        from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp

        model, _ = self._build(num_clusters=3)
        rmp = get_rmp(model.params)
        assert SystemModel._expansion_key(rmp) is rmp
        assert SystemModel._expansion_key(None) is None
