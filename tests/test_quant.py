"""Tests for int8 (W8A8) quantized inference (nn/quant.py).

Training stays float; rollouts may run every dense layer as int8 x int8 ->
int32 on the MXU via ``model.inference_quant: int8``.  Quantization error
is bounded per layer and the end-to-end rollout must stay close to the
float rollout.
"""
import numpy as np
import jax
import jax.numpy as jnp

from hyper_graph_nets_tpu.nn import quant
from hyper_graph_nets_tpu.nn.mlp import mlp_apply, mlp_init


def test_weight_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    w_q, scale = quant.quantize_weight(w)
    assert w_q.dtype == jnp.int8
    err = np.abs(np.asarray(w_q, np.float32) * np.asarray(scale) - np.asarray(w))
    # symmetric per-channel int8: error bounded by half a quantization step
    assert err.max() <= float(np.asarray(scale).max()) * 0.5 + 1e-7


def test_stacked_weight_quantization():
    """Processor weights are stacked [num_blocks, in, out]; scales are per
    block and per channel, so scan slicing works unchanged."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
    w_q, scale = quant.quantize_weight(w)
    assert w_q.shape == (3, 16, 8) and scale.shape == (3, 8)
    for b in range(3):
        wb_q, sb = quant.quantize_weight(w[b])
        np.testing.assert_array_equal(np.asarray(w_q[b]), np.asarray(wb_q))
        np.testing.assert_allclose(np.asarray(scale[b]), np.asarray(sb))


def test_dense_int8_close_to_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(40, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.2
    w_q, scale = quant.quantize_weight(w)
    y = quant.dense_int8(x, w_q, scale)
    ref = x @ w
    rel = float(
        jnp.linalg.norm(y - ref) / jnp.maximum(jnp.linalg.norm(ref), 1e-6)
    )
    assert rel < 0.02, rel


def test_quantized_mlp_apply():
    key = jax.random.PRNGKey(3)
    params = mlp_init(key, 12, [32, 32, 8])
    qparams = quant.quantize_network(params)
    assert "w_q" in qparams["layers"][0] and "w" not in qparams["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(4), (20, 12))
    y = mlp_apply(params, x)
    yq = mlp_apply(qparams, x)
    rel = float(
        jnp.linalg.norm(yq - y) / jnp.maximum(jnp.linalg.norm(y), 1e-6)
    )
    assert rel < 0.1, rel


def _flag_setup(quantized):
    from hyper_graph_nets_tpu.data import synthetic
    from hyper_graph_nets_tpu.data.preprocessing import add_targets
    from hyper_graph_nets_tpu.models.flag import FlagModel
    from hyper_graph_nets_tpu.training.trainer import Trainer

    params = {
        "task": {"dataset": "flag_minimal"},
        "model": {
            "field": "world_pos", "history": True, "size": 3,
            "noise": 0.003, "gamma": 0.9, "aggregation": "pna",
            "learning_rate": 1e-3, "message_passing_steps": 2,
            "rmp": {"clustering": "none", "connector": "none"},
            "graph_balancer": {"algorithm": "none"},
        },
    }
    if quantized:
        params["model"]["inference_quant"] = "int8"
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=12, nx=6, ny=6), "world_pos", True
    )
    model = FlagModel(params)
    topo = model.topology_from_trajectory(traj)
    trainer = Trainer(model, params)
    ts = trainer.init_train_state(jax.random.PRNGKey(0))
    # accumulate normalizer stats with a couple of train steps so the
    # rollout normalizations are non-degenerate
    step = trainer.make_train_step(topo)
    frames = {k: jnp.asarray(v[:4]) for k, v in traj.items() if k != "cells"}
    ts, _ = step(ts, frames, jax.random.PRNGKey(1))
    return model, topo, traj, ts


def test_quantized_rollout_close_to_float():
    model, topo, traj, ts = _flag_setup(quantized=False)
    ops, mse = model.rollout(ts.model, topo, traj, num_steps=6)
    qmodel, qtopo, qtraj, qts = _flag_setup(quantized=True)
    state_q = qmodel.inference_state(qts.model)
    # quantized params: every dense is int8
    leaf0 = state_q.params["encoder"]["node_model"]["layers"][0]
    assert leaf0["w_q"].dtype == jnp.int8
    qops, qmse = qmodel.rollout(state_q, qtopo, qtraj, num_steps=6)
    a, b = np.asarray(mse), np.asarray(qmse)
    assert np.isfinite(b).all()
    # same order of magnitude: rollouts compound error, so only a loose
    # bound is meaningful here
    assert b.mean() < max(10 * a.mean(), 1e-3), (a.mean(), b.mean())


def test_inference_state_noop_without_config():
    model, topo, traj, ts = _flag_setup(quantized=False)
    st = model.inference_state(ts.model)
    assert st is ts.model
