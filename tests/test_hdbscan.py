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
