"""Tests for auxiliary subsystems: factories, multihost, profiling, recorder."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.parallel import multihost, sharding
from hyper_graph_nets_tpu.training.get_algorithm import get_algorithm
from hyper_graph_nets_tpu.utils.profiling import ThroughputMeter
from hyper_graph_nets_tpu.utils.recorder import Recorder, register_logger, AbstractLogger

CONFIG = {
    "params": {
        "task": {"task": "mesh", "dataset": "flag_minimal", "batch_size": 2},
        "model": {
            "field": "world_pos",
            "history": True,
            "size": 3,
            "noise": 0.003,
            "gamma": 0.9,
            "aggregation": "pna",
            "learning_rate": 1e-3,
            "message_passing_steps": 1,
            "rmp": {"clustering": "none", "connector": "none"},
            "graph_balancer": {"algorithm": "none"},
        },
        "random_seed": 0,
    }
}


class TestGetAlgorithm:
    def test_factory(self, tmp_path):
        algo = get_algorithm(CONFIG, out_dir=str(tmp_path))
        ts = algo.initialize()
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=6, nx=4, ny=4), "world_pos", True
        )
        ts, losses = algo.fit_trajectory(ts, traj)
        assert losses and np.isfinite(losses).all()

    def test_lr_schedule(self, tmp_path):
        import copy

        cfg = copy.deepcopy(CONFIG)
        cfg["params"]["model"]["lr_decay_steps"] = 100
        algo = get_algorithm(cfg, out_dir=str(tmp_path))
        ts = algo.initialize()
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=6, nx=4, ny=4), "world_pos", True
        )
        ts, losses = algo.fit_trajectory(ts, traj)
        assert np.isfinite(losses).all()


class TestMultihost:
    def test_pod_mesh_single_process(self):
        mesh = multihost.make_pod_mesh(graph_per_host=4)
        assert mesh.shape["graph"] == 4
        assert mesh.shape["data"] * 4 == 8

    def test_host_local_batch(self):
        mesh = multihost.make_pod_mesh(graph_per_host=4)
        frames = {"x": np.ones((4, 3, 2), np.float32)}
        out = multihost.host_local_batch_to_global(frames, mesh)
        assert out["x"].shape == (4, 3, 2)

    def test_trajectory_round_robin(self):
        idx = list(multihost.host_trajectory_indices(10))
        assert idx == list(range(10))  # single process gets everything


class TestProfiling:
    def test_throughput_meter(self):
        meter = ThroughputMeter(edges_per_step=100)
        assert meter.tick() is None
        out = meter.tick()
        assert out is not None and out["edges_per_s"] > 0


class TestRecorder:
    def test_dispatch_and_plugins(self, tmp_path):
        events = []

        class Probe(AbstractLogger):
            def __init__(self, out_dir):
                pass

            def log(self, record):
                events.append(record)

        register_logger("probe", Probe)
        rec = Recorder(str(tmp_path), config={"a": 1}, loggers=["scalars", "probe"])
        rec.record({"loss": 1.5})
        rec.finalize()
        assert events and events[0]["loss"] == 1.5
        assert os.path.exists(tmp_path / "scalars.jsonl")
        assert os.path.exists(tmp_path / "config.json")


class TestInitializeConfig:
    """cw2-style config processor parity (reference util/InitializeConfig.py)."""

    def _cfg(self):
        return {
            "name": "job1",
            "_experiment_name": "exp",
            "iterations": 7,
            "params": {
                "_rep_log_path": "/tmp/rep0",
                "random_seeds": {"numpy": "default", "pytorch": "tied"},
                "model": {"log_batch_size": 4, "lr": 2.0, "log_eps": -40},
            },
        }

    def test_recording_structure_and_seeds(self):
        from hyper_graph_nets_tpu.utils.config import initialize_config

        out = initialize_config(self._cfg(), repetition=3)
        rs = out["_recording_structure"]
        assert rs["_groupname"] == "exp"
        assert rs["_runname"] == "exp_3"
        assert rs["_recording_dir"] == "/tmp/rep0"
        assert rs["_job_name"] == "job1"
        assert out["iterations"] == 7
        # 'default' -> repetition; 'tied' -> numpy's resolved seed
        assert out["random_seeds"] == {"numpy": 3, "pytorch": 3}

    def test_log_key_expansion_and_int_coercion(self):
        from hyper_graph_nets_tpu.utils.config import initialize_config

        out = initialize_config(self._cfg(), repetition=0)
        model = out["model"]
        assert model["batch_size"] == 16  # 2**4
        assert model["eps"] == 0  # < -30 rounds to 0
        assert model["lr"] == 2 and isinstance(model["lr"], int)

    def test_reserved_keys_rejected(self):
        import pytest

        from hyper_graph_nets_tpu.utils.config import initialize_config

        cfg = self._cfg()
        cfg["params"]["_recording_structure"] = {}
        with pytest.raises(ValueError):
            initialize_config(cfg)
        cfg = self._cfg()
        cfg["params"]["iterations"] = 1
        with pytest.raises(ValueError):
            initialize_config(cfg)
