"""Tests for the condensed-tree HDBSCAN implementation."""
import numpy as np
import pytest
from sklearn.cluster import HDBSCAN as SKHDBSCAN
from sklearn.datasets import make_blobs, make_moons
from sklearn.metrics import adjusted_rand_score

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.rmp.clustering import HDBSCANClustering
from hyper_graph_nets_tpu.rmp.hdbscan_tree import hdbscan_fit


class TestHDBSCANTree:
    def test_well_separated_blobs_match_sklearn(self):
        X, y = make_blobs(n_samples=300, centers=4, cluster_std=0.5, random_state=0)
        ours = hdbscan_fit(X, min_cluster_size=10, min_samples=5)
        sk = SKHDBSCAN(min_cluster_size=10, min_samples=5).fit(X)
        assert adjusted_rand_score(sk.labels_, ours.labels) == 1.0
        assert ours.labels.max() + 1 == 4

    def test_noise_detection_matches_sklearn(self):
        rng = np.random.RandomState(2)
        Xb, _ = make_blobs(n_samples=250, centers=3, cluster_std=0.4, random_state=2)
        X = np.vstack([Xb, rng.uniform(-12, 12, (50, 2))])
        ours = hdbscan_fit(X, min_cluster_size=12, min_samples=5)
        sk = SKHDBSCAN(min_cluster_size=12, min_samples=5).fit(X)
        assert adjusted_rand_score(sk.labels_, ours.labels) > 0.99
        assert (ours.labels < 0).sum() == (sk.labels_ < 0).sum()

    def test_nonconvex_moons(self):
        X, _ = make_moons(n_samples=300, noise=0.08, random_state=1)
        ours = hdbscan_fit(X, min_cluster_size=15, min_samples=5)
        sk = SKHDBSCAN(min_cluster_size=15, min_samples=5).fit(X)
        assert adjusted_rand_score(sk.labels_, ours.labels) > 0.95

    def test_probabilities_in_unit_interval(self):
        X, _ = make_blobs(n_samples=200, centers=3, random_state=3)
        ours = hdbscan_fit(X, min_cluster_size=10, min_samples=5)
        assert (ours.probabilities >= 0).all() and (ours.probabilities <= 1).all()
        # clustered points have positive membership probability
        assert (ours.probabilities[ours.labels >= 0] > 0).all()

    def test_exemplars_belong_to_their_cluster(self):
        X, _ = make_blobs(n_samples=200, centers=3, cluster_std=0.5, random_state=4)
        ours = hdbscan_fit(X, min_cluster_size=10, min_samples=5)
        for label, ex in enumerate(ours.exemplars):
            assert len(ex) >= 1
            assert all(ours.labels[p] == label for p in ex)
        # exemplars are high-density points: above-median probability
        for label, ex in enumerate(ours.exemplars):
            members = np.nonzero(ours.labels == label)[0]
            med = np.median(ours.probabilities[members])
            assert np.mean(ours.probabilities[ex]) >= med

    def test_max_cluster_size_cap(self):
        X, _ = make_blobs(n_samples=240, centers=3, cluster_std=0.4, random_state=5)
        ours = hdbscan_fit(X, min_cluster_size=10, min_samples=5, max_cluster_size=60)
        sizes = np.bincount(ours.labels[ours.labels >= 0])
        assert (sizes <= 60).all()

    def test_tiny_input_degenerates_to_one_cluster(self):
        X = np.random.RandomState(0).randn(5, 2)
        ours = hdbscan_fit(X, min_cluster_size=5)
        assert (ours.labels == 0).all()


class TestHDBSCANInRMP:
    def test_flag_pipeline_with_sampling(self):
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=6, nx=8, ny=8), "world_pos", True
        )
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
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
        }
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        host = model.host_graph({k: v[0] for k, v in traj.items()}, topo)
        algo = HDBSCANClustering(
            sampling=True,
            max_cluster_size=50,
            min_cluster_size=5,
            min_samples=2,
            spotter_threshold=0.5,
            alpha=0.5,
        )
        result = algo.run(host)
        assert result.num_clusters >= 1
        assert len(result.clusters) == result.num_clusters
        total = sum(len(c) for c in result.clusters)
        # spotters may put a boundary node in two clusters (reference
        # behavior: cross-cluster edge endpoints join both sides)
        assert 0 < total <= 2 * topo.num_nodes
        assert all(len(np.unique(c)) == len(c) for c in result.clusters)


class TestMembershipVectors:
    """all_points_membership_vectors equivalent (distance x condensed-tree
    outlier components; reference hdbscan.py:90-100)."""

    def _blobs(self, seed=0):
        rng = np.random.RandomState(seed)
        a = rng.randn(40, 2) * 0.25 + [0, 0]
        b = rng.randn(40, 2) * 0.25 + [6, 0]
        c = rng.randn(40, 2) * 0.25 + [3, 5]
        return np.concatenate([a, b, c])

    def test_rows_normalized_and_own_cluster_dominates(self):
        from hyper_graph_nets_tpu.rmp.hdbscan_tree import (
            hdbscan_fit,
            membership_vectors,
        )

        X = self._blobs()
        res = hdbscan_fit(X, min_cluster_size=10, min_samples=3)
        assert len(res.selected) == 3
        m = membership_vectors(res, X)
        assert m.shape == (len(X), 3)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, rtol=1e-6)
        # clustered points: top membership == own label for well-separated blobs
        clustered = res.labels >= 0
        agree = (np.argmax(m[clustered], axis=1) == res.labels[clustered]).mean()
        assert agree > 0.95

    def test_boundary_points_have_flatter_membership(self):
        from hyper_graph_nets_tpu.rmp.hdbscan_tree import (
            hdbscan_fit,
            membership_vectors,
        )

        rng = np.random.RandomState(1)
        a = rng.randn(50, 2) * 0.3 + [0, 0]
        b = rng.randn(50, 2) * 0.3 + [3, 0]
        mid = np.array([[1.5, 0.0]])  # point exactly between the clusters
        X = np.concatenate([a, b, mid])
        res = hdbscan_fit(X, min_cluster_size=10, min_samples=3)
        if len(res.selected) < 2:  # merged -> nothing to assert
            return
        m = membership_vectors(res, X)
        gap = np.abs(m[:, 0] - m[:, 1])
        # the midpoint's gap is smaller than the typical core point's
        assert gap[-1] < np.median(gap[:-1])

    def test_spotters_sit_on_cluster_boundaries(self):
        from hyper_graph_nets_tpu.rmp.clustering import HDBSCANClustering, HostGraph

        rng = np.random.RandomState(2)
        a = rng.randn(60, 3) * 0.3 + [0, 0, 0]
        b = rng.randn(60, 3) * 0.3 + [4, 0, 0]
        X = np.concatenate([a, b]).astype(np.float32)
        host = HostGraph(
            target_feature=X,
            mesh_features=X[:, :2],
            senders=np.zeros(1, np.int32),
            receivers=np.zeros(1, np.int32),
            edge_features=np.zeros((1, 8), np.float32),
            node_dynamic=np.linalg.norm(X, axis=1),
            obstacle_mask=None,
            world_dim=3,
        )
        algo = HDBSCANClustering(
            sampling=True, max_cluster_size=200, min_cluster_size=10,
            min_samples=3, spotter_threshold=0.3, alpha=0.2,
        )
        res = algo.run(host)
        if res.num_clusters < 2:
            return
        spotters = algo._soft_spotter(
            host, algo._fit(host)
        )
        flat = [i for s in spotters for i in s]
        if flat:
            # spotters are closer to the opposite cluster than non-spotters
            centers = np.stack([X[res.labels == k].mean(axis=0) for k in range(2)])
            other = lambda i: centers[1 - res.labels[i]] if res.labels[i] >= 0 else centers[0]
            d_spot = np.mean([np.linalg.norm(X[i] - other(i)) for i in flat])
            rest = [i for i in range(len(X)) if i not in set(flat) and res.labels[i] >= 0]
            d_rest = np.mean([np.linalg.norm(X[i] - other(i)) for i in rest])
            assert d_spot <= d_rest
