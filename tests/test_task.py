"""Task-layer tests: end-to-end epoch loop, checkpoint resume, evaluators."""
import os

import jax
import numpy as np
import pytest
import yaml

from hyper_graph_nets_tpu.training import checkpoint
from hyper_graph_nets_tpu.training.task import MeshTask, get_task
from hyper_graph_nets_tpu.utils.config import read_yaml


def minimal_config(tmp_path=None, **model_overrides):
    cfg = read_yaml("minimal")
    params = cfg["params"]
    params["task"]["epochs"] = 1
    params["task"]["n_timesteps"] = 6
    params["task"]["batch_size"] = 3
    params["task"]["synthetic"] = {
        "trajectories": 1,
        "num_steps": 8,
        "nx": 4,
        "ny": 4,
    }
    params["task"]["test"]["n_steps"] = 3
    params["model"]["message_passing_steps"] = 1
    params["model"]["rmp"]["clustering"] = "none"
    params["model"]["rmp"]["connector"] = "none"
    params["model"].update(model_overrides)
    return cfg


class TestMeshTask:
    def test_full_epoch_loop_and_artifacts(self, tmp_path):
        cfg = minimal_config()
        task = MeshTask(cfg, data_dir=str(tmp_path))
        task.run_iterations()
        scalars = task.get_scalars()
        for key in (
            "test_loss",
            "test_position_error",
            "test_rollout_loss",
            "test_n_step_loss",
        ):
            assert np.isfinite(scalars[key]), key
        out = task.out_dir
        names = os.listdir(out)
        assert any(n.endswith(".pkl") and n.startswith("model_") for n in names)
        assert any(n.endswith(".gif") for n in names)
        assert "one_step_eval.csv" in names
        assert "rollouts.pkl" in names
        assert any(n.endswith(".metrics.jsonl") for n in names)

    def test_checkpoint_resume(self, tmp_path):
        cfg = minimal_config()
        task = MeshTask(cfg, data_dir=str(tmp_path))
        task.run_iterations()
        step_after = int(task.tstate.step)
        # a fresh task resumes at epoch 1 and does no more training
        task2 = MeshTask(cfg, data_dir=str(tmp_path))
        assert task2.start_epoch == 1
        assert int(task2.tstate.step) == step_after
        task2.run_iterations()  # no epochs left
        assert int(task2.tstate.step) == step_after

    def test_retrain_ignores_checkpoints(self, tmp_path):
        cfg = minimal_config()
        task = MeshTask(cfg, data_dir=str(tmp_path))
        task.run_iterations()
        cfg["params"]["retrain"] = True
        task2 = MeshTask(cfg, data_dir=str(tmp_path))
        assert task2.start_epoch == 0

    def test_get_task_factory(self, tmp_path):
        cfg = minimal_config()
        task = get_task(cfg, data_dir=str(tmp_path))
        assert isinstance(task, MeshTask)


class TestCheckpoint:
    def test_roundtrip_preserves_state(self, tmp_path):
        cfg = minimal_config()
        from hyper_graph_nets_tpu.training.simulator import MeshSimulator

        sim = MeshSimulator(cfg, out_dir=str(tmp_path / "out"))
        ts = sim.initialize()
        path = checkpoint.save(str(tmp_path / "out"), cfg, ts, epoch=3)
        loaded, epoch, _ = checkpoint.load(path)
        assert epoch == 3
        orig = jax.tree.leaves(ts)
        back = jax.tree.leaves(loaded)
        assert len(orig) == len(back)
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orbax_backend_roundtrip(self, tmp_path):
        cfg = minimal_config()
        cfg["params"]["logging"]["checkpoint_backend"] = "orbax"
        from hyper_graph_nets_tpu.training.simulator import MeshSimulator

        sim = MeshSimulator(cfg, out_dir=str(tmp_path / "out"))
        ts = sim.initialize()
        path = checkpoint.save(str(tmp_path / "out"), cfg, ts, epoch=2)
        assert __import__("os").path.isdir(path)  # orbax = directory format
        loaded, epoch, _ = checkpoint.load(path, template=ts)
        assert epoch == 2
        for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # latest() finds orbax checkpoints too
        found = checkpoint.latest(str(tmp_path / "out"), cfg)
        assert found is not None and found[1] == 2

    def test_latest_picks_newest(self, tmp_path):
        cfg = minimal_config()
        from hyper_graph_nets_tpu.training.simulator import MeshSimulator

        sim = MeshSimulator(cfg, out_dir=str(tmp_path / "out"))
        ts = sim.initialize()
        checkpoint.save(str(tmp_path / "out"), cfg, ts, epoch=1)
        checkpoint.save(str(tmp_path / "out"), cfg, ts, epoch=4)
        found = checkpoint.latest(str(tmp_path / "out"), cfg)
        assert found is not None and found[1] == 4

    def test_different_hyperparams_do_not_collide(self, tmp_path):
        cfg = minimal_config()
        name1 = checkpoint.checkpoint_name(cfg, 0)
        cfg2 = minimal_config(message_passing_steps=7)
        name2 = checkpoint.checkpoint_name(cfg2, 0)
        assert name1 != name2


class TestConfigs:
    @pytest.mark.parametrize(
        "name",
        ["minimal", "flag", "cylinder", "plate", "plateCluster", "hyper", "baseline"],
    )
    def test_all_configs_parse_and_build_models(self, name):
        cfg = read_yaml(name)
        assert cfg["name"] == "DEFAULT"
        from hyper_graph_nets_tpu.models.get_model import get_model

        model = get_model(cfg)
        assert model.gnn_config.message_passing_steps >= 1
