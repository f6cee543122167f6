"""Tests for the serving API (hyper_graph_nets_tpu/serving.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.serving import Predictor


def _config(quant=None):
    cfg = {
        "task": {"dataset": "flag_minimal", "batch_size": 4},
        "model": {
            "field": "world_pos", "history": True, "size": 3,
            "noise": 0.003, "gamma": 0.9, "aggregation": "pna",
            "learning_rate": 1e-3, "message_passing_steps": 2,
            "rmp": {"clustering": "none", "connector": "none"},
            "graph_balancer": {"algorithm": "none"},
        },
    }
    if quant:
        cfg["model"]["inference_quant"] = quant
    return cfg


def _train_and_checkpoint(tmp_path, cfg):
    from hyper_graph_nets_tpu.models.get_model import get_model
    from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp
    from hyper_graph_nets_tpu.training import checkpoint as ckpt
    from hyper_graph_nets_tpu.training.trainer import Trainer

    traj = add_targets(
        synthetic.flag_trajectory(num_steps=10, nx=6, ny=6), "world_pos", True
    )
    model = get_model(cfg)
    topo = model.topology_from_trajectory(traj)
    trainer = Trainer(model, cfg)
    ts = trainer.init_train_state(jax.random.PRNGKey(0))
    rmp = get_rmp(cfg)
    frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}
    if rmp is None:
        step = trainer.make_train_step(topo)
        ts, _ = step(ts, frames, jax.random.PRNGKey(1))
    else:
        static = rmp.prepare(model, {k: v[0] for k, v in traj.items()}, topo)
        step = trainer.make_train_step(topo, expansion=rmp)
        ts, _ = step(ts, frames, jax.random.PRNGKey(1), static)
    path = ckpt.save(str(tmp_path), cfg, ts, epoch=1)
    return traj, ts, path


class TestPredictor:
    def test_rollout_matches_model(self, tmp_path):
        cfg = _config()
        traj, ts, _ = _train_and_checkpoint(tmp_path, cfg)
        p = Predictor.from_config(cfg, checkpoint=str(tmp_path))
        out = p.rollout(traj, num_steps=5)
        assert "pred_pos" in out and out["mse"].shape == (5,)
        assert np.isfinite(out["mse"]).all()

        # direct model rollout from the restored state must agree exactly
        from hyper_graph_nets_tpu.models.get_model import get_model

        model = get_model(cfg)
        topo = model.topology_from_trajectory(traj)
        ops, mse = model.rollout(ts.model, topo, traj, num_steps=5)
        np.testing.assert_allclose(
            out["mse"], np.asarray(mse), rtol=1e-5, atol=1e-7
        )

    def test_checkpoint_restore_changes_predictions(self, tmp_path):
        """The restored (trained) state differs from a fresh init."""
        cfg = _config()
        traj, _, _ = _train_and_checkpoint(tmp_path, cfg)
        p_ckpt = Predictor.from_config(cfg, checkpoint=str(tmp_path))
        p_init = Predictor(cfg)
        a = p_ckpt.one_step(traj)
        b = p_init.one_step(traj)
        assert a.shape == b.shape == traj["world_pos"].shape
        assert not np.allclose(a, b)

    def test_one_step_prediction_scale(self, tmp_path):
        """Next-state predictions stay near the current state (physics
        updates are small per frame)."""
        cfg = _config()
        traj, _, _ = _train_and_checkpoint(tmp_path, cfg)
        p = Predictor.from_config(cfg, checkpoint=str(tmp_path))
        pred = p.one_step(traj)
        delta = np.abs(pred - traj["world_pos"]).max()
        assert np.isfinite(pred).all() and delta < 1.0

    def test_quantized_predictor(self, tmp_path):
        cfg = _config()
        traj, _, _ = _train_and_checkpoint(tmp_path, cfg)
        p = Predictor.from_config(
            cfg, checkpoint=str(tmp_path), quantize="int8"
        )
        leaf0 = p.state.params["encoder"]["node_model"]["layers"][0]
        assert leaf0["w_q"].dtype == jnp.int8
        out = p.rollout(traj, num_steps=4)
        assert np.isfinite(out["mse"]).all()

    def test_rmp_predictor_rollout(self, tmp_path):
        """Predictor drives the HGN path: expansion prepared per
        trajectory, hyper tier + remote edges in the compiled rollout."""
        cfg = _config()
        cfg["model"]["rmp"] = {
            "num_clusters": 4, "hyper_noise": 0.0,
            "hyper_node_features": True, "frequency": 1,
            "clustering": "spectral", "connector": "hyper",
            "fully_connect": False,
            "intra_cluster_sampling": {
                "enabled": False, "alpha": 0.1, "spotter_threshold": 0
            },
        }
        traj, _, _ = _train_and_checkpoint(tmp_path, cfg)
        p = Predictor.from_config(cfg, checkpoint=str(tmp_path))
        assert p.expansion is not None
        out = p.rollout(traj, num_steps=4)
        assert np.isfinite(out["mse"]).all()
        preds = p.one_step(traj)
        assert preds.shape == traj["world_pos"].shape
        assert np.isfinite(preds).all()

    def test_missing_checkpoint_raises(self, tmp_path):
        import pytest

        with pytest.raises(FileNotFoundError):
            Predictor.from_config(_config(), checkpoint=str(tmp_path / "empty"))

    def test_quantize_does_not_mutate_caller_config(self):
        cfg = _config()
        Predictor(cfg, quantize="int8")
        assert "inference_quant" not in cfg["model"]

    def test_one_step_distinguishes_equal_shape_meshes(self):
        """Two meshes with identical node/edge counts but different
        connectivity must not share a compiled one_step program (the jit
        cache is keyed on mesh content, not shapes).

        Node-permutation equivariance is the oracle: relabeling the mesh
        nodes must permute the predictions.  With a shape-keyed cache the
        second call silently reuses the first mesh's baked topology and the
        equivariance check fails.
        """
        cfg = _config()
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=6, nx=6, ny=6),
            "world_pos", True,
        )
        n = traj["node_type"].shape[1]
        rng = np.random.default_rng(0)
        q = rng.permutation(n)          # new node j <- old node q[j]
        inv = np.argsort(q)
        traj2 = {
            k: (inv[v] if k == "cells" else v[:, q])
            for k, v in traj.items()
        }
        p = Predictor(cfg)
        pred = p.one_step(traj)
        pred2 = p.one_step(traj2)
        np.testing.assert_allclose(pred2, pred[:, q], rtol=2e-4, atol=2e-5)
