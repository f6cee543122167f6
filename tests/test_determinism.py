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


class TestShuffledFit:
    """fit_trajectory shuffles batch order (reference MeshSimulator.py:138)
    with a seeded RNG and fetches losses once per trajectory."""

    def _simulator(self, seed, tmp_path):
        from hyper_graph_nets_tpu.training.simulator import MeshSimulator

        params = {
            **PARAMS,
            "task": {**PARAMS["task"], "batch_size": 3, "n_timesteps": 12},
            "random_seed": seed,
        }
        return MeshSimulator(params, out_dir=str(tmp_path))

    def test_seeded_shuffle_is_deterministic(self, tmp_path):
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=5, ny=5), "world_pos", True
        )
        results = []
        for rep in range(2):
            sim = self._simulator(0, tmp_path / str(rep))
            ts = sim.initialize()
            ts, losses = sim.fit_trajectory(ts, traj)
            results.append((losses, ts))
        assert results[0][0] == results[1][0]
        for a, b in zip(
            jax.tree.leaves(results[0][1].model.params),
            jax.tree.leaves(results[1][1].model.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shuffle_visits_batches_in_seeded_order(self, tmp_path):
        """Observed batch sizes follow the seeded permutation of the temporal
        job list (10 usable frames / batch 3 -> sizes [3,3,3,1] permuted)."""
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=5, ny=5), "world_pos", True
        )
        for seed in (0, 3):
            sim = self._simulator(seed, tmp_path / f"s{seed}")
            sim.time_steps = 11
            seen = []
            orig = sim._train_step_fn

            def spy(topo, *args, _orig=orig, _seen=seen):
                fn = _orig(topo, *args)

                def wrapped(ts, frames, key, *rest):
                    _seen.append(int(np.asarray(frames["world_pos"]).shape[0]))
                    return fn(ts, frames, key, *rest)

                return wrapped

            sim._train_step_fn = spy
            ts = sim.initialize()
            sim.fit_trajectory(ts, traj)

            temporal = [3, 3, 3, 1]
            expected = list(temporal)
            np.random.RandomState(seed).shuffle(expected)
            assert seen == expected, (seed, seen, expected)


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
