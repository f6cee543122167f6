"""Tests for remote message passing: clustering, connector, expansion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.models.plate import PlateModel
from hyper_graph_nets_tpu.rmp import clustering as rmp_clustering
from hyper_graph_nets_tpu.rmp.connector import build_static
from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp
from hyper_graph_nets_tpu.training.trainer import Trainer, frames_to_batches

RMP_BASE = {
    "num_clusters": 4,
    "hyper_noise": 0.005,
    "hyper_node_features": True,
    "frequency": 1,
    "fully_connect": False,
    "intra_cluster_sampling": {"enabled": False, "alpha": 0.1, "spotter_threshold": 0},
    "hdbscan": {
        "max_cluster_size": 50,
        "min_cluster_size": 5,
        "min_samples": 1,
        "spotter_threshold": 0.9,
    },
}


def make_params(connector="hyper", clustering="kmeans", sampling=False):
    rmp = {**RMP_BASE, "clustering": clustering, "connector": connector}
    if sampling:
        rmp["intra_cluster_sampling"] = {
            "enabled": True,
            "alpha": 0.5,
            "spotter_threshold": 0,
        }
    return {
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
            "rmp": rmp,
            "graph_balancer": {"algorithm": "none"},
        },
    }


def flag_fixture(connector="hyper", clustering="kmeans", sampling=False):
    params = make_params(connector, clustering, sampling)
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=14, nx=6, ny=6), "world_pos", True
    )
    model = FlagModel(params)
    topo = model.topology_from_trajectory(traj)
    rmp = get_rmp(params)
    frame0 = {k: v[0] for k, v in traj.items()}
    static = rmp.prepare(model, frame0, topo)
    return params, traj, model, topo, rmp, static


class TestClusteringAlgorithms:
    def host_graph(self):
        params = make_params()
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=6, nx=6, ny=6), "world_pos", True
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        return model.host_graph({k: v[0] for k, v in traj.items()}, topo)

    @pytest.mark.parametrize("name", ["kmeans", "gmm", "spectral", "random"])
    def test_fixed_k_algorithms(self, name):
        host = self.host_graph()
        algo = rmp_clustering.get_clustering_algorithm(name, RMP_BASE)
        result = algo.run(host)
        n = host.target_feature.shape[0]
        assert result.labels.shape == (n,)
        assert result.num_clusters == 4
        # every cluster non-empty (empty-cluster repair)
        for c in range(4):
            assert (result.labels == c).sum() > 0
        # full membership without sampling
        assert sum(len(c) for c in result.clusters) == n

    def test_hdbscan_variable_k(self):
        host = self.host_graph()
        algo = rmp_clustering.get_clustering_algorithm("hdbscan", RMP_BASE)
        result = algo.run(host)
        assert result.num_clusters >= 1
        assert len(result.clusters) == result.num_clusters

    def test_neighbors_are_cross_cluster_mesh_adjacent(self):
        host = self.host_graph()
        algo = rmp_clustering.get_clustering_algorithm("kmeans", RMP_BASE)
        result = algo.run(host)
        labels = result.labels
        for a, b in result.neighbors:
            assert a != b
            # some mesh edge connects clusters a and b
            snd_l, rcv_l = labels[host.senders], labels[host.receivers]
            assert (((snd_l == a) & (rcv_l == b)) | ((snd_l == b) & (rcv_l == a))).any()

    def test_sampling_reduces_membership(self):
        host = self.host_graph()
        full = rmp_clustering.KMeansClustering(4, False, 0.5, 0).run(host)
        sampled = rmp_clustering.KMeansClustering(4, True, 0.1, 0).run(host)
        assert sum(len(c) for c in sampled.clusters) <= sum(
            len(c) for c in full.clusters
        )


class TestBuildStatic:
    def test_incidence_consistency(self):
        _, _, model, topo, rmp, static = flag_fixture()
        n = topo.num_nodes
        K = static.assign_mean.shape[0]
        # assignment rows are normalized means over members
        np.testing.assert_allclose(
            static.assign_mean.sum(axis=1), np.ones(K), atol=1e-5
        )
        # up edges: member -> its own hyper node, receiver-sorted
        valid = static.up_mask > 0
        assert (
            static.up_receivers[valid]
            == n + static.labels[static.up_senders[valid]]
        ).all()
        assert (np.diff(static.up_receivers) >= 0).all()
        # down edges are the reverse
        assert (static.down_receivers == np.arange(n)).all()
        assert (static.down_senders == n + static.labels).all()
        # inter edges live in hyper row space
        iv = static.inter_mask > 0
        assert (static.inter_senders[iv] >= n).all()
        assert (static.inter_receivers[iv] >= n).all()

    def test_fully_connect(self):
        params, traj, model, topo, _, _ = flag_fixture()
        host = model.host_graph({k: v[0] for k, v in traj.items()}, topo)
        clustering = rmp_clustering.KMeansClustering(4, False, 0.5, 0).run(host)
        static = build_static(clustering, topo.num_nodes, fully_connect=True)
        assert int(static.inter_mask.sum()) == 4 * 3


class TestExpansion:
    def test_hyper_graph_structure(self):
        _, traj, model, topo, rmp, static = flag_fixture()
        state = model.init_state(jax.random.PRNGKey(0))
        frames = {k: jnp.asarray(v[:3]) for k, v in traj.items()}
        graph, _, state = model.make_graph(state, topo, frames, False)
        graph, state = rmp.expand(state, graph, frames, model, False, static=static)
        K = static.assign_mean.shape[0]
        assert graph.hyper_features.shape == (3, K, model.hyper_in_dim())
        for name in (
            "intra_cluster_to_cluster",
            "intra_cluster_to_mesh",
            "inter_cluster",
        ):
            assert name in graph.edge_sets
            es = graph.edge_sets[name]
            assert es.features.shape[-1] == 7  # world(3)+1 ++ mesh(2)+1
        # mesh gather matrix extended to N+K rows
        assert graph.edge_sets["mesh_edges"].gather_idx.shape[0] == topo.num_nodes + K

    def test_cluster_mean_geometry(self):
        _, traj, model, topo, rmp, static = flag_fixture()
        coords = np.concatenate(
            [traj["world_pos"][0], traj["mesh_pos"][0]], axis=1
        )
        means = static.assign_mean @ coords
        labels = static.labels
        # every up-edge feature should be coord - mean[label] (+norms)
        state = model.init_state(jax.random.PRNGKey(0))
        frame = {k: jnp.asarray(v[0]) for k, v in traj.items()}
        graph, _, state = model.make_graph(state, topo, frame, False, batched=False)
        # accumulate intra stats once (training) so we can invert exactly
        graph, state = rmp.expand(state, graph, frame, model, True, static=static)
        up = graph.edge_sets["intra_cluster_to_cluster"]
        from hyper_graph_nets_tpu.core import normalizer as norm_mod

        feats = np.asarray(
            norm_mod.inverse(state.normalizers["intra_edge"], up.features)
        )
        i = int(np.nonzero(np.asarray(static.up_mask))[0][0])
        node = static.up_senders[i]
        diff = coords[node] - means[labels[node]]
        want = np.concatenate(
            [diff[:3], [np.linalg.norm(diff[:3])], diff[3:], [np.linalg.norm(diff[3:])]]
        )
        np.testing.assert_allclose(feats[i], want, rtol=1e-4, atol=1e-5)

    def test_training_with_rmp_reduces_loss(self):
        params, traj, model, topo, rmp, static = flag_fixture()
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo, expansion=rmp)
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(8):
            for frames in frames_to_batches(traj, 6):
                key, k = jax.random.split(key)
                ts, loss = step(ts, frames, k, static)
                losses.append(float(loss))
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    @pytest.mark.parametrize("connector", ["hetero", "multiscale", "multi"])
    def test_architecture_variants_train(self, connector):
        params, traj, model, topo, rmp, static = flag_fixture(connector=connector)
        trainer = Trainer(model, params)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(topo, expansion=rmp)
        frames = next(frames_to_batches(traj, 4))
        ts, loss = step(ts, frames, jax.random.PRNGKey(2), static)
        assert np.isfinite(float(loss))

    def test_rollout_with_rmp(self):
        params, traj, model, topo, rmp, static = flag_fixture()
        state = model.init_state(jax.random.PRNGKey(0))
        ops, mse = model.rollout(state, topo, traj, num_steps=4, expansion=rmp)
        assert mse.shape == (4,) and np.isfinite(np.asarray(mse)).all()

    def test_reclustering_same_shapes(self):
        """Recluster must not change array shapes (no recompilation)."""
        params, traj, model, topo, rmp, static = flag_fixture()
        shapes1 = jax.tree.map(lambda x: np.shape(x), static._asdict())
        rmp.reset_clusters()
        frame_late = {k: v[5] for k, v in traj.items()}
        static2 = rmp.prepare(model, frame_late, topo)
        shapes2 = jax.tree.map(lambda x: np.shape(x), static2._asdict())
        assert shapes1 == shapes2

    @pytest.mark.parametrize("clustering", ["kmeans", "spectral"])
    def test_cylinder_rmp_supported(self, clustering):
        """Cylinder + RMP works here (the reference's _get_subgraph raises
        for non-flag/plate model types — abstract_connector.py:95-100, and
        its SpectralClustering hardcodes 3D edge features and crashes on
        the 2D cylinder — spectral_clustering.py:47; our connector and
        affinity split at the true world_dim)."""
        from hyper_graph_nets_tpu.models.cylinder import CylinderModel

        crmp = {**RMP_BASE, "clustering": clustering, "connector": "hyper"}
        cp = {
            "task": {"dataset": "cylinder_flow"},
            "model": {
                "field": "velocity",
                "history": False,
                "size": 3,
                "noise": 0.003,
                "gamma": 0.9,
                "aggregation": "pna",
                "learning_rate": 1e-3,
                "message_passing_steps": 2,
                "rmp": crmp,
                "graph_balancer": {"algorithm": "none"},
            },
        }
        ctraj = add_targets(
            synthetic.cylinder_trajectory(num_steps=10, nx=7, ny=5),
            "velocity",
            history=False,
        )
        cm = CylinderModel(cp)
        ctopo = cm.topology_from_trajectory(ctraj)
        crm = get_rmp(cp)
        static = crm.prepare(cm, {k: v[0] for k, v in ctraj.items()}, ctopo)
        trainer = Trainer(cm, cp)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(ctopo, expansion=crm)
        frames = next(frames_to_batches(ctraj, 4))
        ts, loss = step(ts, frames, jax.random.PRNGKey(1), static)
        assert np.isfinite(float(loss))
        # connector features: vel(2)+norm ++ mesh(2)+norm = 6
        assert dict(cm.edge_in_dims())["inter_cluster"] == 6

    def test_plate_obstacles_excluded(self):
        prmp = {**RMP_BASE, "clustering": "kmeans", "connector": "hyper"}
        pp = {
            "task": {"dataset": "deforming_plate"},
            "model": {
                "field": "world_pos",
                "history": False,
                "size": 3,
                "noise": 0.003,
                "gamma": 0.9,
                "aggregation": "pna",
                "learning_rate": 1e-3,
                "message_passing_steps": 2,
                "max_world_edges": 64,
                "rmp": prmp,
                "graph_balancer": {"algorithm": "none"},
            },
        }
        ptraj = add_targets(
            synthetic.plate_trajectory(num_steps=8, nx=5, ny=5), "world_pos", False
        )
        pm = PlateModel(pp)
        ptopo = pm.topology_from_trajectory(ptraj)
        prm = get_rmp(pp)
        static = prm.prepare(pm, {k: v[0] for k, v in ptraj.items()}, ptopo)
        obstacle = np.asarray(ptraj["node_type"][0][:, 0]) == 1
        assert static.member_mask[obstacle].sum() == 0
        assert static.member_mask[~obstacle].sum() > 0


class TestInterClusterWorld:
    """World-aware inter-cluster edges (reference hierarchical_connector.py:
    145-187, config rmp.inter_cluster_world) — closes F10."""

    def _params(self):
        prmp = {
            **RMP_BASE,
            "clustering": "kmeans",
            "connector": "hyper",
            "num_clusters": 4,
            "inter_cluster_world": True,
        }
        return {
            "task": {"dataset": "deforming_plate"},
            "model": {
                "field": "world_pos",
                "history": False,
                "size": 3,
                "noise": 0.003,
                "gamma": 0.9,
                "aggregation": "pna",
                "learning_rate": 1e-3,
                "message_passing_steps": 2,
                "max_world_edges": 64,
                "rmp": prmp,
                "graph_balancer": {"algorithm": "none"},
            },
        }

    def _colliding_traj(self):
        """Plate trajectory with the obstacle pressed into the plate so the
        radius query produces world edges from frame 0."""
        traj = synthetic.plate_trajectory(num_steps=8, nx=5, ny=5)
        nt = traj["node_type"][0][:, 0]
        obstacle = np.nonzero(nt == 1)[0]
        normal = np.nonzero(nt == 0)[0]
        wp = traj["world_pos"].copy()
        # park each obstacle node right next to a normal node
        for t in range(wp.shape[0]):
            wp[t, obstacle] = wp[t, normal[: len(obstacle)]] + 0.01
        traj["world_pos"] = wp
        return add_targets(traj, "world_pos", False)

    def test_colliding_clusters_get_world_inter_edges(self):
        pp = self._params()
        ptraj = self._colliding_traj()
        pm = PlateModel(pp)
        ptopo = pm.topology_from_trajectory(ptraj)
        prm = get_rmp(pp)
        frame0 = {k: v[0] for k, v in ptraj.items()}
        static = prm.prepare(pm, frame0, ptopo)

        assert static.inter_world_senders is not None
        valid = np.asarray(static.inter_world_mask) > 0
        assert valid.sum() >= 2  # at least one colliding pair, both ways
        N = ptopo.num_nodes
        snd = np.asarray(static.inter_world_senders)[valid]
        rcv = np.asarray(static.inter_world_receivers)[valid]
        assert (snd >= N).all() and (rcv >= N).all()  # hyper row space
        assert (snd != rcv).all()

        # device expand produces the edge set with width-4 features
        state = pm.init_state(jax.random.PRNGKey(0))
        graph, _, _ = pm.make_graph(
            state, ptopo, {k: jnp.asarray(v) for k, v in frame0.items()},
            False, batched=False,
        )
        graph, _ = prm.expand(state, graph, frame0, pm, is_training=False, static=static)
        es = graph.edge_sets["inter_cluster_world"]
        assert es.features.shape[-1] == 4
        assert float(jnp.sum(es.mask)) == valid.sum()

    def test_no_collision_keeps_masked_empty_set(self):
        pp = self._params()
        ptraj = add_targets(
            synthetic.plate_trajectory(num_steps=8, nx=5, ny=5), "world_pos", False
        )
        pm = PlateModel(pp)
        ptopo = pm.topology_from_trajectory(ptraj)
        prm = get_rmp(pp)
        # frame 0: obstacle still far above the plate -> no world edges
        static = prm.prepare(pm, {k: v[0] for k, v in ptraj.items()}, ptopo)
        assert static.inter_world_senders is not None
        assert np.asarray(static.inter_world_mask).sum() == 0

    def test_trains_end_to_end_with_world_inter_edges(self):
        from hyper_graph_nets_tpu.training.expansion import build_expansion
        from hyper_graph_nets_tpu.training.trainer import Trainer

        pp = self._params()
        ptraj = self._colliding_traj()
        pm = PlateModel(pp)
        ptopo = pm.topology_from_trajectory(ptraj)
        trainer = Trainer(pm, pp)
        ts = trainer.init_train_state(jax.random.PRNGKey(0))
        expansion = build_expansion(pm, pp)
        expansion.prepare(pm, {k: v[0] for k, v in ptraj.items()}, ptopo)
        step = trainer.make_train_step(ptopo, expansion=expansion)
        frames = {k: jnp.asarray(v[:3]) for k, v in ptraj.items() if k != "cells"}
        ts, loss = step(ts, frames, jax.random.PRNGKey(1), expansion.static)
        assert np.isfinite(float(loss))


def test_spectral_sparse_affinity_matches_dense():
    """The runtime sparse-affinity spectral path labels identically to the
    reference's dense-matrix form (absent pairs are explicit zeros there,
    implicit zeros here)."""
    import sklearn.cluster
    from sklearn.metrics import adjusted_rand_score

    from hyper_graph_nets_tpu.rmp.clustering import (
        HostGraph,
        SpectralClustering,
    )

    rng = np.random.default_rng(3)
    for n, k in ((120, 6), (300, 8)):
        pos = rng.normal(size=(n, 3))
        snd = rng.integers(0, n, size=4 * n)
        rcv = (snd + rng.integers(1, 5, size=4 * n)) % n
        # bidirectional, deduplicated like cells_to_edges output
        pairs = np.unique(
            np.stack([np.minimum(snd, rcv), np.maximum(snd, rcv)], 1), axis=0
        )
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        snd = np.concatenate([pairs[:, 0], pairs[:, 1]])
        rcv = np.concatenate([pairs[:, 1], pairs[:, 0]])
        rel = pos[snd] - pos[rcv]
        ef = np.concatenate(
            [rel, np.linalg.norm(rel, axis=1, keepdims=True)] * 2, axis=-1
        )
        g = HostGraph(
            target_feature=pos, mesh_features=pos[:, :2], senders=snd,
            receivers=rcv, edge_features=ef, world_dim=3,
        )
        dense = SpectralClustering.compute_affinity(g)
        sparse = SpectralClustering.compute_affinity_sparse(g)
        np.testing.assert_allclose(sparse.toarray(), dense)
        kw = dict(
            n_clusters=k, random_state=0, affinity="precomputed",
            assign_labels="cluster_qr",
        )
        ld = sklearn.cluster.SpectralClustering(**kw).fit(dense).labels_
        ls = sklearn.cluster.SpectralClustering(**kw).fit(sparse).labels_
        assert adjusted_rand_score(ld, ls) == 1.0


def test_try_band_plan_upgrades_to_512_when_windows_small():
    """Without the raised scoped-VMEM env var, try_band_plan still picks
    512-edge chunks when the subwindow plan keeps W=WR=128 (measured to
    fit the default 16 MB limit), and stays at the safe default when
    windows are wide."""
    from hyper_graph_nets_tpu.data import synthetic
    from hyper_graph_nets_tpu.core.mesh import cells_to_edges
    from hyper_graph_nets_tpu.models.base import try_band_plan
    from hyper_graph_nets_tpu.ops.pallas.fused_block import default_chunk

    assert default_chunk() == 256  # test env never raises the VMEM limit

    traj = synthetic.flag_trajectory(num_steps=3, nx=40, ny=40)
    cells = np.asarray(traj["cells"])
    cells = cells[0] if cells.ndim == 3 else cells
    me = cells_to_edges(cells)
    p = try_band_plan(me.senders, me.receivers, 1600)
    assert p is not None and p.T == 512 and p.W == 128 and p.WR == 128

    # wide sender spans: stays at the env-gated default chunk
    rng = np.random.default_rng(0)
    n, e = 4096, 4096
    rcv = np.sort(rng.integers(0, n, size=e)).astype(np.int64)
    snd = rng.integers(0, n, size=e).astype(np.int64)
    p2 = try_band_plan(snd, rcv, n)
    assert p2 is None or p2.T == 256
