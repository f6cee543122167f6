"""Tests for host-side RCM mesh reordering (ops/reorder).

The fused Pallas MP-block kernel needs a banded node numbering; general
unstructured meshes get one via reverse Cuthill-McKee relabelling — a pure
renumbering that must leave the physics (losses, rollouts) unchanged.
"""
import numpy as np
import jax
import jax.numpy as jnp

from hyper_graph_nets_tpu.core.mesh import cells_to_edges
from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.ops import reorder


def _scrambled_flag(seed=0, num_steps=8, nx=7, ny=7):
    """A grid-mesh flag trajectory with its node numbering shuffled."""
    traj = synthetic.flag_trajectory(num_steps=num_steps, nx=nx, ny=ny)
    n = traj["node_type"].shape[1]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.int64)  # perm[new] = old
    return reorder.reorder_trajectory(traj, perm), traj, perm


def test_rcm_reduces_bandwidth():
    scrambled, _, _ = _scrambled_flag()
    cells = scrambled["cells"][0]
    n = scrambled["node_type"].shape[1]
    e0 = cells_to_edges(cells)
    bw0 = reorder.bandwidth(e0.senders, e0.receivers)
    perm = reorder.rcm_order(e0.senders, e0.receivers, n)
    fixed = reorder.reorder_trajectory(scrambled, perm)
    e1 = cells_to_edges(fixed["cells"][0])
    bw1 = reorder.bandwidth(e1.senders, e1.receivers)
    assert bw1 < bw0 / 2
    assert bw1 <= 16  # grid mesh: RCM recovers a narrow band


def test_reorder_roundtrip_is_permutation():
    scrambled, original, perm = _scrambled_flag()
    # applying the inverse permutation restores the original trajectory
    restored = reorder.reorder_trajectory(
        scrambled, reorder.inverse_perm(perm)
    )
    for k in original:
        if k == "cells":
            np.testing.assert_array_equal(restored[k], original[k])
        else:
            np.testing.assert_allclose(restored[k], original[k])


def test_reorder_preserves_edge_geometry():
    """Edge length multiset is invariant under relabelling."""
    scrambled, original, _ = _scrambled_flag()
    def lengths(traj):
        e = cells_to_edges(traj["cells"][0])
        pos = traj["world_pos"][0]
        d = np.linalg.norm(pos[e.senders] - pos[e.receivers], axis=-1)
        return np.sort(d)
    np.testing.assert_allclose(lengths(scrambled), lengths(original), atol=1e-6)


def test_simulator_auto_reorder_enables_fused(tmp_path):
    """A scrambled mesh trains on the fused path via the simulator's
    auto-RCM hook, with the same loss as the unfused path on the
    unscrambled mesh (pure renumbering => identical physics)."""
    from hyper_graph_nets_tpu.models.flag import FlagModel
    from hyper_graph_nets_tpu.training.trainer import Trainer

    def run(traj, vjp):
        params = {
            "task": {"dataset": "flag_minimal"},
            "model": {
                "field": "world_pos", "history": True, "size": 3,
                "noise": 0.0, "gamma": 0.9, "aggregation": "pna",
                "learning_rate": 1e-3, "message_passing_steps": 2,
                "agg_vjp": vjp,
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
        }
        model = FlagModel(params)
        # simulator-level reorder hook (without building a full task)
        from hyper_graph_nets_tpu.training.simulator import MeshSimulator

        sim = MeshSimulator.__new__(MeshSimulator)
        sim.model = model
        sim._topo_cache = {}
        prepared = MeshSimulator._maybe_reorder(sim, traj)
        topo = model.topology_from_trajectory(prepared)
        if vjp == "fused":
            assert topo.band_plan is not None, "auto-RCM should enable fused"
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo)
        frames = {
            k: jnp.asarray(v[:4]) for k, v in prepared.items() if k != "cells"
        }
        _, loss = step(ts, frames, jax.random.PRNGKey(1))
        return float(loss)

    scrambled, original, _ = _scrambled_flag()
    scrambled = add_targets(scrambled, "world_pos", True)
    original = add_targets(original, "world_pos", True)
    l_fused = run(scrambled, "fused")
    l_ref = run(original, "xla")
    assert abs(l_fused - l_ref) < 1e-4 * max(1.0, abs(l_ref))
