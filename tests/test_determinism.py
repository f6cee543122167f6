"""Determinism: identical seeds produce identical training trajectories."""
import jax
import numpy as np

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.training.trainer import Trainer, frames_to_batches

PARAMS = {
    "task": {"dataset": "flag_minimal"},
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


def run_once(seed):
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=12, nx=5, ny=5), "world_pos", True
    )
    model = FlagModel(PARAMS)
    topo = model.topology_from_trajectory(traj)
    trainer = Trainer(model, PARAMS)
    ts = trainer.init_train_state(jax.random.PRNGKey(seed))
    step = trainer.make_train_step(topo)
    key = jax.random.PRNGKey(seed + 1)
    losses = []
    for _ in range(3):
        for frames in frames_to_batches(traj, 5):
            key, k = jax.random.split(key)
            ts, loss = step(ts, frames, k)
            losses.append(float(loss))
    return losses, ts


class TestDeterminism:
    def test_same_seed_same_losses(self):
        l1, ts1 = run_once(0)
        l2, ts2 = run_once(0)
        assert l1 == l2
        for a, b in zip(jax.tree.leaves(ts1.model.params),
                        jax.tree.leaves(ts2.model.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_different_seed_differs(self):
        l1, _ = run_once(0)
        l2, _ = run_once(7)
        assert l1 != l2
