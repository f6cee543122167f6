"""Clustering algorithms for remote message passing (host-side).

Parity with reference src/rmp/ (SURVEY.md §F):
- SpectralClustering on a precomputed mesh-edge affinity matrix with
  cluster_qr label assignment  (spectral_clustering.py:10-63)
- KMeans on standardized mesh coordinates  (k_means_clustering.py:12-33)
- GaussianMixture on standardized world coordinates  (gaussian_mixture.py:9-30)
- RandomClustering baseline  (random_clustering.py:11-39)
- HDBSCAN (variable cluster count, soft-membership spotters, exemplars)
  (hdbscan.py:13-105) — implemented on sklearn.cluster.HDBSCAN with
  distance-based soft memberships (the hdbscan pip package is not available)
- empty-cluster repair, cross-cluster neighbor derivation, and the
  intra-cluster sampling pipeline (spotter / exemplars / highest-dynamics
  with alpha-subsampling)  (abstract_clustering_algorithm.py:13-229)

Clustering runs on host numpy at recluster boundaries only (cache cadence,
reference flag.py:130-141); its output is compiled into the jitted step as
static incidence arrays (see rmp.connector).
"""
from __future__ import annotations

import math
import random as pyrandom
from typing import Dict, List, NamedTuple, Optional

import numpy as np


class HostGraph(NamedTuple):
    """Host-side (numpy) snapshot of a frame's graph for clustering."""

    target_feature: np.ndarray  # [N, Dw] world stream
    mesh_features: np.ndarray  # [N, Dm]
    senders: np.ndarray  # [E] mesh edges
    receivers: np.ndarray  # [E]
    edge_features: np.ndarray  # [E, F] unnormalized mesh edge features
    node_dynamic: Optional[np.ndarray] = None  # [N]
    obstacle_mask: Optional[np.ndarray] = None  # [N] bool
    world_dim: int = 3


class Clustering(NamedTuple):
    """Result: labels per node (-1 = unclustered) + sampled member lists."""

    labels: np.ndarray  # [N] int
    clusters: List[np.ndarray]  # per-cluster member indices (possibly sampled)
    neighbors: List[tuple]  # cross-cluster adjacency pairs (a, b)
    num_clusters: int


def _labels_to_indices(labels: List[int]) -> List[np.ndarray]:
    """Group nodes by label, skipping negatives (reference :104-122)."""
    k = max(labels) + 1 if len(labels) else 0
    out = [[] for _ in range(k)]
    for i, l in enumerate(labels):
        if l >= 0:
            out[l].append(i)
    return [np.asarray(x, np.int64) for x in out]


def _empty_cluster_handling(labels: List[int], num_clusters: int, rng) -> List[int]:
    """Reassign a random member into each empty cluster (reference :93-102)."""
    result = [[] for _ in range(num_clusters)]
    for i, l in enumerate(labels):
        result[l].append(i)
    for c in range(num_clusters):
        if not result[c]:
            donor = rng.choice([x for x in range(num_clusters) if result[x]])
            labels[rng.choice(result[donor])] = c
    return labels


def get_neighbors(graph: HostGraph, labels: np.ndarray) -> List[tuple]:
    """Cross-cluster adjacency from mesh edges (reference :124-145)."""
    snd_l = labels[graph.senders]
    rcv_l = labels[graph.receivers]
    cross = snd_l != rcv_l
    pairs = set()
    for a, b in zip(snd_l[cross], rcv_l[cross]):
        if a >= 0 and b >= 0:
            pairs.add(tuple(sorted((int(a), int(b)))))
    return sorted(pairs)


class ClusteringAlgorithm:
    """Template for the run() pipeline (reference :59-85)."""

    def __init__(
        self,
        num_clusters: int = 10,
        sampling: bool = False,
        alpha: float = 0.5,
        threshold: int = 0,
        seed: int = 0,
    ):
        self.num_clusters = num_clusters
        self.sampling = sampling
        self.alpha = alpha
        self.threshold = threshold
        self._rng = pyrandom.Random(seed)

    # subclasses implement
    def _cluster(self, graph: HostGraph) -> np.ndarray:
        raise NotImplementedError

    def run(self, graph: HostGraph) -> Clustering:
        labels = list(int(x) for x in self._cluster(graph))
        labels = _empty_cluster_handling(labels, self.num_clusters, self._rng)
        labels = np.asarray(labels)
        neighbors = get_neighbors(graph, labels)

        if not self.sampling:
            clusters = _labels_to_indices(list(labels))
        else:
            spotter = self.spotter(graph, labels)
            exemplars = self.exemplars(labels, spotter)
            top_k = self.highest_dynamics(graph, labels)
            clusters = [
                np.asarray(sorted(set(s) | set(e) | set(t)), np.int64)
                for s, e, t in zip(spotter, exemplars, top_k)
            ]
        return Clustering(
            labels=labels,
            clusters=clusters,
            neighbors=neighbors,
            num_clusters=self.num_clusters,
        )

    # -- intra-cluster sampling (reference :148-228) -----------------------
    def spotter(self, graph: HostGraph, labels: np.ndarray) -> List[List[int]]:
        """Boundary nodes on cross-cluster edges, >= threshold occurrences."""
        snd_l = labels[graph.senders]
        rcv_l = labels[graph.receivers]
        cross = np.nonzero(snd_l != rcv_l)[0]
        buckets: List[List[int]] = [[] for _ in range(self.num_clusters)]
        for e in cross:
            buckets[snd_l[e]].append(int(graph.senders[e]))
            buckets[rcv_l[e]].append(int(graph.receivers[e]))
        out = []
        for b in buckets:
            out.append([x for x in set(b) if b.count(x) >= self.threshold])
        return self._reduce_samples(out, shuffle=True)

    def exemplars(self, labels: np.ndarray, spotter: List[List[int]]) -> List[List[int]]:
        """Random non-spotter members per cluster (reference :184-195)."""
        out: List[List[int]] = [[] for _ in range(self.num_clusters)]
        spotset = [set(s) for s in spotter]
        for i, l in enumerate(labels):
            if l >= 0 and i not in spotset[l]:
                out[l].append(i)
        return self._reduce_samples(out, shuffle=True)

    def highest_dynamics(self, graph: HostGraph, labels: np.ndarray) -> List[List[int]]:
        """Top-alpha nodes by node_dynamic per cluster (reference :205-219)."""
        out: List[List[int]] = [[] for _ in range(self.num_clusters)]
        for i, l in enumerate(labels):
            if l >= 0:
                out[l].append(i)
        if graph.node_dynamic is None:
            return self._reduce_samples(out, shuffle=False)
        dyn = np.asarray(graph.node_dynamic).reshape(-1)
        out = [sorted(b, key=lambda x: -dyn[x]) for b in out]
        return self._reduce_samples(out, shuffle=False)

    def _reduce_samples(self, result: List[List[int]], shuffle: bool) -> List[List[int]]:
        """alpha-subsample each bucket (reference :221-228)."""
        for i in range(len(result)):
            if shuffle:
                self._rng.shuffle(result[i])
            threshold = max(int(self.alpha * 100), int(len(result[i]) * self.alpha))
            threshold = min(len(result[i]), threshold)
            result[i] = result[i][:threshold]
        return result


class RandomClustering(ClusteringAlgorithm):
    """Uniform random labels; alpha-subsampling override (reference
    random_clustering.py:11-39)."""

    def __init__(self, num_clusters, sampling, alpha, threshold, seed: int = 0):
        super().__init__(num_clusters, sampling, alpha, threshold, seed)
        self._np_rng = np.random.RandomState(seed)

    def _cluster(self, graph: HostGraph) -> np.ndarray:
        n = graph.target_feature.shape[0]
        return (self._np_rng.rand(n) * self.num_clusters).astype(int)

    def run(self, graph: HostGraph) -> Clustering:
        labels = list(int(x) for x in self._cluster(graph))
        labels = _empty_cluster_handling(labels, self.num_clusters, self._rng)
        labels = np.asarray(labels)
        clusters = _labels_to_indices(list(labels))
        if self.sampling:
            sampled = []
            for c in clusters:
                perm = self._np_rng.permutation(len(c))
                sampled.append(c[perm[: int(len(c) * self.alpha) + 1]])
            clusters = sampled
        return Clustering(
            labels=labels,
            clusters=clusters,
            neighbors=get_neighbors(graph, labels),
            num_clusters=self.num_clusters,
        )


class KMeansClustering(ClusteringAlgorithm):
    """KMeans on standardized mesh xy (reference k_means_clustering.py:12-33)."""

    def _cluster(self, graph: HostGraph) -> np.ndarray:
        from sklearn.cluster import KMeans
        from sklearn.preprocessing import StandardScaler

        X = StandardScaler().fit_transform(graph.mesh_features[:, :2])
        return KMeans(n_clusters=self.num_clusters, random_state=0, n_init=10).fit(X).labels_


class GaussianMixtureClustering(ClusteringAlgorithm):
    """GMM on standardized world stream (reference gaussian_mixture.py:9-30)."""

    def _cluster(self, graph: HostGraph) -> np.ndarray:
        from sklearn.mixture import GaussianMixture
        from sklearn.preprocessing import StandardScaler

        X = StandardScaler().fit_transform(graph.target_feature)
        gm = GaussianMixture(
            n_components=self.num_clusters, random_state=0, init_params="k-means++"
        ).fit(X)
        return gm.predict(X)


class SpectralClustering(ClusteringAlgorithm):
    """Spectral clustering on the mesh-edge affinity matrix.

    Affinity = 1/sqrt(|rel_world|^2 + |rel_mesh|^2) per directed mesh edge
    (norm features at columns world_dim and -1 of the unnormalized edge
    features), inf -> max+1 — parity with reference
    spectral_clustering.py:36-63; ``assign_labels='cluster_qr'``, seed 0.
    """

    def _cluster(self, graph: HostGraph) -> np.ndarray:
        import sklearn.cluster

        # sparse affinity: identical math to the reference's dense matrix
        # (absent pairs are explicit zeros there, implicit zeros here;
        # labels verified identical, ARI 1.0) but the eigensolver then
        # does O(E) matvecs instead of O(N^2) — measured 0.63 s -> 0.05 s
        # per recluster at 1.6k nodes (flag_simple scale), which is the
        # difference between host clustering eating ~50% of a
        # trajectory's wall clock and it being negligible.
        X = self.compute_affinity_sparse(graph)
        sc = sklearn.cluster.SpectralClustering(
            n_clusters=self.num_clusters,
            random_state=0,
            affinity="precomputed",
            assign_labels="cluster_qr",
        )
        return sc.fit(X).labels_

    @staticmethod
    def _affinity_weights(graph: HostGraph):
        wnorm = graph.edge_features[:, graph.world_dim]
        mnorm = graph.edge_features[:, -1]
        with np.errstate(divide="ignore"):
            w = 1.0 / np.sqrt(wnorm**2 + mnorm**2)
        finite = np.isfinite(w)
        if (~finite).any():
            w[~finite] = w[finite].max(initial=0.0) + 1
        return w, finite

    @classmethod
    def compute_affinity_sparse(cls, graph: HostGraph):
        from scipy.sparse import coo_matrix

        n = graph.target_feature.shape[0]
        w, finite = cls._affinity_weights(graph)
        snd = np.asarray(graph.senders, np.int64)
        rcv = np.asarray(graph.receivers, np.int64)
        # duplicate (s, r) pairs: coo would SUM them on conversion while
        # the dense form writes finite entries first, then the infinite
        # substitutes — so any infinite duplicate wins, else the last
        # write.  Dedup with the same precedence (cells_to_edges never
        # emits duplicates, but HostGraph doesn't enforce that).
        key = snd * n + rcv
        if len(np.unique(key)) != len(key):
            order = np.lexsort((np.arange(len(key)), ~finite, key))
            ks = key[order]
            keep = order[np.r_[ks[1:] != ks[:-1], True]]
            snd, rcv, w = snd[keep], rcv[keep], w[keep]
        return coo_matrix((w, (snd, rcv)), shape=(n, n)).tocsr()

    @classmethod
    def compute_affinity(cls, graph: HostGraph) -> np.ndarray:
        """Dense form (reference spectral_clustering.py:36-63 parity and
        tests); the runtime path uses :meth:`compute_affinity_sparse`."""
        n = graph.target_feature.shape[0]
        aff = np.zeros((n, n), float)
        w, finite = cls._affinity_weights(graph)
        # reference write order: finite entries first, substitutes second
        aff[graph.senders[finite], graph.receivers[finite]] = w[finite]
        aff[graph.senders[~finite], graph.receivers[~finite]] = w[~finite]
        return aff


class HDBSCANClustering(ClusteringAlgorithm):
    """HDBSCAN with variable cluster count (reference hdbscan.py:13-105).

    Uses the in-repo condensed-tree implementation
    (rmp/hdbscan_tree.py — validated against sklearn.cluster.HDBSCAN):
    exemplars are the leaf-cluster points at maximal lambda, exactly the
    reference's condensed-tree walk (reference hdbscan.py:73-88); spotters
    use exemplar-distance membership vectors with the reference's
    top-two-probability-gap metric (reference hdbscan.py:90-100).
    """

    def __init__(
        self,
        sampling: bool,
        max_cluster_size: int,
        min_cluster_size: int,
        min_samples: int,
        spotter_threshold: float,
        alpha: float = 0.5,
        seed: int = 0,
    ):
        super().__init__(10, sampling, alpha, 0, seed)
        self.max_cluster_size = max_cluster_size
        self.min_cluster_size = min_cluster_size
        self.min_samples = min_samples
        self.spotter_threshold = spotter_threshold

    def _standardize(self, graph: HostGraph) -> np.ndarray:
        from sklearn.preprocessing import StandardScaler

        return StandardScaler().fit_transform(graph.target_feature)

    def _cluster(self, graph: HostGraph) -> np.ndarray:
        return self._fit(graph).labels

    def _fit(self, graph: HostGraph):
        from hyper_graph_nets_tpu.rmp.hdbscan_tree import hdbscan_fit

        return hdbscan_fit(
            self._standardize(graph),
            min_cluster_size=self.min_cluster_size,
            min_samples=self.min_samples,
            max_cluster_size=self.max_cluster_size,
        )

    def run(self, graph: HostGraph) -> Clustering:
        result = self._fit(graph)
        labels = np.asarray(result.labels)
        self.num_clusters = int(labels.max()) + 1 if (labels >= 0).any() else 0
        if self.num_clusters == 0:
            # degenerate: everything noise -> single cluster of all nodes
            labels = np.zeros(len(labels), int)
            self.num_clusters = 1
            result = result._replace(exemplars=[list(range(len(labels)))])
        neighbors = get_neighbors(graph, labels)
        if not self.sampling:
            clusters = _labels_to_indices(list(labels))
        else:
            spotter = self._soft_spotter(graph, result)
            exemplars = [list(e) for e in result.exemplars]
            top_k = self.highest_dynamics(graph, labels)
            clusters = [
                np.asarray(sorted(set(s) | set(e) | set(t)), np.int64)
                for s, e, t in zip(spotter, exemplars, top_k)
            ]
        return Clustering(
            labels=labels,
            clusters=clusters,
            neighbors=neighbors,
            num_clusters=self.num_clusters,
        )

    def _soft_spotter(self, graph: HostGraph, result) -> List[List[int]]:
        """Boundary metric 1 - (p1-p2)/(p1+p2) on full soft memberships
        (distance x condensed-tree outlier components — the equivalent of
        hdbscan's all_points_membership_vectors; reference hdbscan.py:90-100).
        Spotters join the cluster of their TOP membership, like the
        reference's ``indices[spotter_candidates[x][1]].append(x)``."""
        out: List[List[int]] = [[] for _ in range(self.num_clusters)]
        if self.num_clusters < 2:
            return out
        from hyper_graph_nets_tpu.rmp.hdbscan_tree import membership_vectors

        probs = membership_vectors(result, self._standardize(graph))
        if probs.shape[1] < 2:
            return out
        order = np.argsort(-probs, axis=1)
        rows = np.arange(len(probs))
        p1 = probs[rows, order[:, 0]]
        p2 = probs[rows, order[:, 1]]
        metric = 1.0 - (p1 - p2) / np.maximum(p1 + p2, 1e-12)
        for i in np.nonzero(metric > self.spotter_threshold)[0]:
            out[order[i, 0]].append(int(i))
        return out


def get_clustering_algorithm(name: str, rmp_config: dict) -> Optional[ClusteringAlgorithm]:
    """Factory (reference get_rmp.py:29-78 parity)."""
    name = name.lower()
    if name == "none":
        return None
    num_clusters = rmp_config.get("num_clusters", 10)
    ics = rmp_config.get("intra_cluster_sampling", {})
    sampling = ics.get("enabled", False)
    alpha = ics.get("alpha", 0.5)
    threshold = ics.get("spotter_threshold", 0)
    if name == "random":
        return RandomClustering(num_clusters, sampling, alpha, threshold)
    if name in ("kmeans", "k-means"):
        return KMeansClustering(num_clusters, sampling, alpha, threshold)
    if name == "gmm":
        return GaussianMixtureClustering(num_clusters, sampling, alpha, threshold)
    if name == "spectral":
        return SpectralClustering(num_clusters, sampling, alpha, threshold)
    if name == "hdbscan":
        h = rmp_config.get("hdbscan", {})
        return HDBSCANClustering(
            sampling,
            h.get("max_cluster_size", 50),
            h.get("min_cluster_size", 20),
            h.get("min_samples", 1),
            h.get("spotter_threshold", 0.9),
            alpha=alpha,
        )
    raise NotImplementedError(f"unknown clustering algorithm {name!r}")
