"""Tests for the graph balancer (Ricci SDRF + random) and its kernels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyper_graph_nets_tpu.balancer.base import get_balancer
from hyper_graph_nets_tpu.balancer.ricci import (
    balanced_forman_curvature,
    balanced_forman_post_delta,
    sdrf,
)
from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.ops.pallas.maxprod import maxprod, maxprod_reference
from hyper_graph_nets_tpu.training.expansion import build_expansion
from hyper_graph_nets_tpu.training.trainer import Trainer, frames_to_batches


def _curvature_dense_reference(A):
    """Direct loop transcription of the balanced-Forman formula."""
    n = A.shape[0]
    A2 = A @ A
    d_in = A.sum(0)
    d_out = A.sum(1)
    C = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if A[i, j] == 0:
                continue
            d_max = max(d_in[i], d_out[j])
            d_min = min(d_in[i], d_out[j])
            if d_max * d_min == 0:
                continue
            sharp, lam = 0, 0.0
            for k in range(n):
                tmp = A[k, j] * (A2[i, k] - A[i, k]) * A[i, j]
                if tmp > 0:
                    sharp += 1
                    lam = max(lam, tmp)
                tmp = A[i, k] * (A2[k, j] - A[k, j]) * A[i, j]
                if tmp > 0:
                    sharp += 1
                    lam = max(lam, tmp)
            C[i, j] = (
                2 / d_max + 2 / d_min - 2 + (2 / d_max + 1 / d_min) * A2[i, j] * A[i, j]
            )
            if lam > 0:
                C[i, j] += sharp / (d_max * lam)
    return C


def _random_adjacency(n, p, seed):
    rng = np.random.RandomState(seed)
    A = (rng.rand(n, n) < p).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    return A


class TestCurvature:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_dense_reference(self, seed):
        A = _random_adjacency(24, 0.2, seed)
        got = np.asarray(balanced_forman_curvature(jnp.asarray(A)))
        want = _curvature_dense_reference(A.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_maxprod_kernel_matches_fallback(self):
        rng = np.random.RandomState(0)
        x = np.abs(rng.rand(50, 70)).astype(np.float32)
        y = np.abs(rng.rand(70, 30)).astype(np.float32)
        want = np.asarray(maxprod_reference(jnp.asarray(x), jnp.asarray(y)))
        dense = np.max(x[:, :, None] * y[None, :, :], axis=1)
        np.testing.assert_allclose(want, np.maximum(dense, 0), rtol=1e-5)
        # the Pallas kernel itself (interpreter mode off-TPU)
        got = np.asarray(maxprod(jnp.asarray(x), jnp.asarray(y), interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    @staticmethod
    def _post_delta_dense(A, x, y, i_nbrs, j_nbrs):
        """Direct loop transcription of the post-delta formula."""
        n = A.shape[0]
        A2 = A @ A
        D = np.zeros((len(i_nbrs), len(j_nbrs)))
        for I, i in enumerate(i_nbrs):
            for J, j in enumerate(j_nbrs):
                if i == j or A[i, j] != 0:
                    D[I, J] = -1000
                    continue
                d_in_x = A[:, x].sum()
                d_out_y = A[y].sum()
                if j == x:
                    d_in_x += 1
                elif i == y:
                    d_out_y += 1
                if d_in_x * d_out_y == 0:
                    D[I, J] = 0
                    continue
                d_max, d_min = max(d_in_x, d_out_y), min(d_in_x, d_out_y)
                A2_x_y = A2[x, y]
                if x == i and A[j, y] != 0:
                    A2_x_y += A[j, y]
                elif y == j and A[x, i] != 0:
                    A2_x_y += A[x, i]
                sharp, lam = 0, 0.0
                for z in range(n):
                    A_z_y = A[z, y] + (1 if (z == i and y == j) else 0)
                    A_x_z = A[x, z] + (1 if (x == i and z == j) else 0)
                    A2_z_y = A2[z, y]
                    A2_x_z = A2[x, z]
                    if z == i and A[j, y] != 0:
                        A2_z_y += A[j, y]
                    if x == i and A[j, z] != 0:
                        A2_x_z += A[j, z]
                    if y == j and A[z, i] != 0:
                        A2_z_y += A[z, i]
                    if z == j and A[x, i] != 0:
                        A2_x_z += A[x, i]
                    tmp = A_z_y * (A2_x_z - A_x_z) * A[x, y]
                    if tmp > 0:
                        sharp += 1
                        lam = max(lam, tmp)
                    tmp = A_x_z * (A2_z_y - A_z_y) * A[x, y]
                    if tmp > 0:
                        sharp += 1
                        lam = max(lam, tmp)
                D[I, J] = (
                    2 / d_max
                    + 2 / d_min
                    - 2
                    + (2 / d_max + 1 / d_min) * A2_x_y * A[x, y]
                )
                if lam > 0:
                    D[I, J] += sharp / (d_max * lam)
        return D

    @pytest.mark.parametrize("seed", [0, 1])
    def test_post_delta_matches_dense_reference(self, seed):
        A = _random_adjacency(16, 0.25, seed).astype(np.float64)
        # pick an existing edge and its neighborhoods
        xs, ys = np.nonzero(A)
        x, y = int(xs[0]), int(ys[0])
        i_nbrs = sorted(np.nonzero(A[x])[0].tolist()) + [x]
        j_nbrs = sorted(np.nonzero(A[:, y])[0].tolist()) + [y]
        want = self._post_delta_dense(A, x, y, i_nbrs, j_nbrs)
        got = np.asarray(
            balanced_forman_post_delta(
                jnp.asarray(A.astype(np.float32)),
                jnp.asarray((A @ A).astype(np.float32)),
                jnp.int32(x),
                jnp.int32(y),
                jnp.asarray(i_nbrs, np.int32),
                jnp.asarray(j_nbrs, np.int32),
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_sdrf_adds_valid_edges(self):
        # two star hubs joined by a bridge -> bridge is negatively curved
        # (over-squashing bottleneck), so SDRF adds support edges around it
        und = (
            [(0, 1)]
            + [(0, k) for k in range(2, 6)]
            + [(1, k) for k in range(6, 10)]
        )
        snd = np.asarray([e[0] for e in und] + [e[1] for e in und])
        rcv = np.asarray([e[1] for e in und] + [e[0] for e in und])
        existing = set(zip(snd.tolist(), rcv.tolist()))
        added, removed = sdrf(snd, rcv, 10, loops=3, remove_edges=False, tau=30)
        assert len(added["senders"]) >= 2
        assert len(added["senders"]) % 2 == 0  # both directions
        pairs = set(zip(added["senders"], added["receivers"]))
        for s, r in pairs:
            assert (r, s) in pairs
            assert (s, r) not in existing  # only new edges


class TestBalancerIntegration:
    def make(self, algorithm):
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
                "message_passing_steps": 2,
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {
                    "algorithm": algorithm,
                    "frequency": 1,
                    "remove_edges": True,
                    "ricci": {"loops": 3, "tau": 20},
                    "random": {"edge_amount": 8},
                },
            },
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=10, nx=6, ny=6), "world_pos", True
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        return params, traj, model, topo

    @pytest.mark.parametrize("algorithm", ["random", "ricci"])
    def test_train_with_balancer(self, algorithm):
        params, traj, model, topo = self.make(algorithm)
        assert "balance" in model.gnn_config.edge_sets
        exp = build_expansion(model, params)
        static = exp.prepare(model, {k: v[0] for k, v in traj.items()}, topo)
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo, expansion=exp)
        frames = next(frames_to_batches(traj, 4))
        ts, loss = step(ts, frames, jax.random.PRNGKey(1), static)
        assert np.isfinite(float(loss))

    def test_removed_edges_are_masked(self):
        params, traj, model, topo = self.make("random")
        exp = build_expansion(model, params)
        static = exp.prepare(model, {k: v[0] for k, v in traj.items()}, topo)
        bstat = static[0]
        state = model.init_state(jax.random.PRNGKey(0))
        frames = {k: jnp.asarray(v[:2]) for k, v in traj.items()}
        graph, _, state = model.make_graph(state, topo, frames, False)
        graph, _ = exp.expand(state, graph, frames, model, False, static=static)
        mesh = graph.edge_sets["mesh_edges"]
        removed = np.asarray(bstat.mesh_keep) == 0
        if removed.any():
            assert (np.asarray(mesh.mask)[:, removed] == 0).all()
        assert "balance" in graph.edge_sets

    def test_cache_until_reset(self):
        params, traj, model, topo = self.make("random")
        exp = build_expansion(model, params)
        frame0 = {k: v[0] for k, v in traj.items()}
        s1 = exp.prepare(model, frame0, topo)
        s2 = exp.prepare(model, frame0, topo)
        assert s1[0] is s2[0]  # cached
        exp.reset(0, 10)  # step 0 with frequency 1 -> reset due
        s3 = exp.prepare(model, frame0, topo)
        assert s3[0] is not s1[0]
