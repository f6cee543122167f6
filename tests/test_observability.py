"""Observability surface: W&B passthrough, artifact manifest, cluster PNGs.

VERDICT r1 item 9: the wandb passthrough code path had never executed
(package absent) and rollout pickles had no Artifact-manifest parity
(reference MeshSimulator.py:452-457).  These tests exercise the passthrough
against a recording fake wandb module and pin the local artifact contract.
"""
import json
import os
import sys
import types

import numpy as np
import pytest

from hyper_graph_nets_tpu.utils.metrics import MetricsLogger


class FakeArtifact:
    def __init__(self, name, type=None):
        self.name = name
        self.type = type
        self.files = []

    def add_file(self, path):
        self.files.append(path)


def make_fake_wandb(record):
    mod = types.ModuleType("wandb")

    class Run:
        id = "fake-run-123"

    def init(**kw):
        record.append(("init", kw))
        return Run()

    def log(metrics, commit=True):
        record.append(("log", metrics, commit))

    def log_artifact(art):
        record.append(("artifact", art.name, art.type, list(art.files)))

    mod.init = init
    mod.log = log
    mod.log_artifact = log_artifact
    mod.Artifact = FakeArtifact
    mod.finish = lambda: record.append(("finish",))
    return mod


@pytest.fixture()
def fake_wandb(monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "wandb", make_fake_wandb(record))
    return record


class TestWandbPassthrough:
    CFG = {"logging": {"wandb_mode": "online"}, "task": {"dataset": "x"}}

    def test_init_log_and_artifact_flow(self, tmp_path, fake_wandb):
        logger = MetricsLogger(str(tmp_path), self.CFG)
        logger.log({"loss": 1.5})
        art = tmp_path / "blob.bin"
        art.write_bytes(b"hello world")
        logger.log_artifact("rollouts", str(art), kind="dataset")
        logger.close()

        kinds = [r[0] for r in fake_wandb]
        assert kinds == ["init", "log", "artifact", "finish"]
        init_kw = fake_wandb[0][1]
        assert init_kw["mode"] == "online" and init_kw["resume"] == "allow"
        assert fake_wandb[1][1] == {"loss": 1.5}
        assert fake_wandb[2][1:3] == ("rollouts", "dataset")

    def test_run_id_persisted_and_reused_on_resume(self, tmp_path, fake_wandb):
        MetricsLogger(str(tmp_path), self.CFG).close()
        id_file = tmp_path / ".wandb_run_id"
        assert id_file.read_text() == "fake-run-123"
        MetricsLogger(str(tmp_path), self.CFG).close()
        second_init = [r for r in fake_wandb if r[0] == "init"][1][1]
        # crash-resume: same run id handed back (reference MeshSimulator.py:88-105)
        assert second_init["id"] == "fake-run-123"

    def test_off_mode_never_touches_wandb(self, tmp_path, fake_wandb):
        logger = MetricsLogger(str(tmp_path), {"logging": {"wandb_mode": "off"}})
        logger.log({"a": 1.0})
        logger.close()
        assert fake_wandb == []


class TestArtifactManifest:
    def test_manifest_entry_schema(self, tmp_path):
        logger = MetricsLogger(str(tmp_path), None)
        blob = tmp_path / "rollouts.pkl"
        blob.write_bytes(b"x" * 1000)
        manifest = logger.log_artifact("rollouts", str(blob))
        entries = [json.loads(l) for l in open(manifest)]
        assert len(entries) == 1
        e = entries[0]
        assert e["name"] == "rollouts"
        assert e["bytes"] == 1000
        assert len(e["sha256"]) == 16
        assert os.path.isabs(e["path"])

    def test_save_rollouts_records_artifact(self, tmp_path):
        from hyper_graph_nets_tpu.training.simulator import MeshSimulator

        params = {
            "task": {"dataset": "flag_minimal", "batch_size": 2},
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
        }
        sim = MeshSimulator(params, out_dir=str(tmp_path))
        sim.initialize()
        sim.save_rollouts([{"pred_pos": np.zeros((2, 3, 3))}])
        manifest = tmp_path / "artifacts.jsonl"
        entries = [json.loads(l) for l in open(manifest)]
        assert entries and entries[0]["name"] == "rollouts"
        assert entries[0]["path"].endswith("rollouts.pkl")


class TestClusterVisualization:
    def test_visualize_clusters_writes_png(self, tmp_path):
        import jax

        from hyper_graph_nets_tpu.data import synthetic
        from hyper_graph_nets_tpu.data.preprocessing import add_targets
        from hyper_graph_nets_tpu.training.simulator import MeshSimulator

        params = {
            "task": {"dataset": "flag_minimal", "batch_size": 4},
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
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=8, nx=4, ny=4), "world_pos", True
        )
        sim = MeshSimulator(params, out_dir=str(tmp_path))
        ts = sim.initialize()
        # before any clustering: no-op
        assert sim.visualize_clusters(str(tmp_path / "early.png")) is None
        ts, _ = sim.fit_trajectory(ts, traj)
        out = sim.visualize_clusters(str(tmp_path / "cluster_epoch0.png"))
        assert out is not None and os.path.exists(out)
        entries = [json.loads(l) for l in open(tmp_path / "artifacts.jsonl")]
        assert any(e["name"] == "cluster_viz" for e in entries)
