"""Remote message passing facade: cluster cache + graph expansion.

Parity with reference src/rmp/remote_message_passing.py:11-150 and
get_rmp.py:19-97.  The facade owns the clustering algorithm + connector,
caches the clustering between resets (reference :56-80), and exposes the
``expand``/``expand_batched`` interface the trainer, evaluators and rollout
loops call.

TPU split: ``prepare(model, frame, topo)`` runs the HOST clustering stage at
recluster boundaries and device_puts the static incidence; ``expand*`` are
pure jit-safe functions over those arrays.  Static shapes are padded to
powers of two where data-dependent (max cluster size), so reclustering
reuses the same compiled executable almost always.

Obstacle removal for plate (reference :82-137): obstacle nodes are excluded
from clustering (labels -1, membership 0) rather than slicing a contiguous
block — equivalent incidence, no reindexing.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.rmp.clustering import (
    Clustering,
    HostGraph,
    get_clustering_algorithm,
)
from hyper_graph_nets_tpu.rmp.connector import (
    RMPStatic,
    build_static,
    get_connector,
)

Array = jax.Array


def _round_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pad_gather_cols(gather, target: int):
    gidx, gval = np.asarray(gather[0]), np.asarray(gather[1])
    pad = target - gidx.shape[1]
    if pad <= 0:
        return gidx, gval
    return (
        np.pad(gidx, ((0, 0), (0, pad))),
        np.pad(gval, ((0, 0), (0, pad))),
    )


class RemoteMessagePassing:
    """Cluster-once-per-reset remote message passing."""

    def __init__(self, clustering_algorithm, connector):
        self._clustering = clustering_algorithm
        self._connector = connector
        self._static: Optional[RMPStatic] = None
        self._last_clustering: Optional[Clustering] = None

    @property
    def connector(self):
        return self._connector

    @property
    def static(self):
        """Current cached static incidence (None before prepare)."""
        return self._static

    def initialize(self) -> list:
        return self._connector.initialize()

    def reset_clusters(self) -> None:
        """Force reclustering on the next prepare (reference :139-144)."""
        self._static = None

    # ------------------------------------------------------------------
    def prepare(self, model, frame: Dict[str, np.ndarray], topo) -> RMPStatic:
        """HOST: (re)cluster on ``frame`` if the cache is empty."""
        if self._static is not None:
            return self._static
        host = model.host_graph(frame, topo)
        if host.obstacle_mask is not None and host.obstacle_mask.any():
            clustering = self._cluster_without_obstacles(host)
        else:
            clustering = self._clustering.run(host)
        self._last_clustering = clustering
        # kept for cluster visualization (visualize_cluster / task loop)
        self.last_coordinates = np.asarray(host.target_feature)
        inter_mode = getattr(self._connector, "inter_mode", "neighbors")
        centers = None
        if inter_mode == "delaunay":
            centers = np.stack(
                [
                    host.mesh_features[c].mean(axis=0)
                    if len(c)
                    else np.zeros(host.mesh_features.shape[1])
                    for c in clustering.clusters
                ]
            )
        inter_world = getattr(self._connector, "inter_world", False)
        world_labels = None
        if inter_world:
            receivers = model.world_edge_receiver_nodes(frame, topo)
            if receivers is not None and len(receivers):
                world_labels = np.asarray(clustering.labels)[
                    np.asarray(receivers, np.int64)
                ]
        static = build_static(
            clustering,
            topo.num_nodes,
            fully_connect=self._connector.fully_connect,
            inter_mode=inter_mode,
            cluster_centers=centers,
            inter_world=inter_world,
            world_collide_labels=world_labels,
        )
        static = self._pad_static(static)
        self._static = self._attach_band_plans(static, model, topo.num_nodes)
        return self._static

    def _cluster_without_obstacles(self, host: HostGraph) -> Clustering:
        keep = ~np.asarray(host.obstacle_mask)
        idx = np.nonzero(keep)[0]
        remap = -np.ones(len(keep), np.int64)
        remap[idx] = np.arange(len(idx))
        emask = keep[host.senders] & keep[host.receivers]
        sub = HostGraph(
            target_feature=host.target_feature[idx],
            mesh_features=host.mesh_features[idx],
            senders=remap[host.senders[emask]].astype(np.int32),
            receivers=remap[host.receivers[emask]].astype(np.int32),
            edge_features=host.edge_features[emask],
            node_dynamic=None
            if host.node_dynamic is None
            else host.node_dynamic[idx],
            obstacle_mask=None,
            world_dim=host.world_dim,
        )
        clustering = self._clustering.run(sub)
        labels = -np.ones(len(keep), int)
        labels[idx] = clustering.labels
        clusters = [idx[c] for c in clustering.clusters]
        return Clustering(
            labels=labels,
            clusters=clusters,
            neighbors=clustering.neighbors,
            num_clusters=clustering.num_clusters,
        )

    @staticmethod
    def _pad_static(static: RMPStatic) -> RMPStatic:
        """Pad data-dependent dims to powers of two for compile-cache reuse.

        Both the per-cluster degree dims AND the cluster count K pad (HDBSCAN
        produces variable K per recluster — reference hdbscan.py:44).  Padded
        clusters have zero assignment rows, mask-0 incidence, and no down
        edges, so they are inert in the network.
        """
        K = static.assign_mean.shape[0]
        Kp = _round_pow2(K)
        n = static.labels.shape[0]
        pad_k = Kp - K

        def pad_rows(x):
            return np.pad(np.asarray(x), ((0, pad_k),) + ((0, 0),) * (np.ndim(x) - 1))

        # up/down receivers reference hyper rows n+label: row space grows to
        # n+Kp, so gather matrices need Kp - K extra rows
        def pad_gather_rows(gather):
            gidx, gval = np.asarray(gather[0]), np.asarray(gather[1])
            return (
                np.pad(gidx, ((0, pad_k), (0, 0))),
                np.pad(gval, ((0, pad_k), (0, 0))),
            )

        if pad_k:
            # re-pad inter edge capacity to the padded-K convention
            static = static._replace(
                assign_mean=pad_rows(static.assign_mean),
                sizes=pad_rows(static.sizes),
                member_idx=pad_rows(static.member_idx),
                member_valid=pad_rows(static.member_valid),
                up_gather=pad_gather_rows(static.up_gather),
                down_gather=pad_gather_rows(static.down_gather),
                inter_gather=pad_gather_rows(static.inter_gather),
            )
            P_target = Kp * (Kp - 1)
            p = static.inter_senders.shape[0]
            if p < P_target:
                pad_p = P_target - p
                static = static._replace(
                    inter_senders=np.pad(static.inter_senders, (0, pad_p)),
                    inter_receivers=np.pad(static.inter_receivers, (0, pad_p)),
                    inter_mask=np.pad(static.inter_mask, (0, pad_p)),
                    inter_gather=(
                        static.inter_gather[0],
                        static.inter_gather[1],
                    ),
                )
                if static.inter_world_senders is not None:
                    static = static._replace(
                        inter_world_senders=np.pad(
                            static.inter_world_senders, (0, pad_p)
                        ),
                        inter_world_receivers=np.pad(
                            static.inter_world_receivers, (0, pad_p)
                        ),
                        inter_world_mask=np.pad(static.inter_world_mask, (0, pad_p)),
                    )

        d_up = _round_pow2(static.up_gather[0].shape[1])
        d_down = _round_pow2(static.down_gather[0].shape[1])
        d_inter = _round_pow2(static.inter_gather[0].shape[1])
        m_max = _round_pow2(static.member_idx.shape[1])
        return static._replace(
            up_gather=_pad_gather_cols(static.up_gather, d_up),
            down_gather=_pad_gather_cols(static.down_gather, d_down),
            inter_gather=_pad_gather_cols(static.inter_gather, d_inter),
            member_idx=np.pad(
                static.member_idx,
                ((0, 0), (0, m_max - static.member_idx.shape[1])),
            ),
            member_valid=np.pad(
                static.member_valid,
                ((0, 0), (0, m_max - static.member_valid.shape[1])),
            ),
        )

    @staticmethod
    def _attach_band_plans(static: RMPStatic, model, num_nodes: int) -> RMPStatic:
        """Banded-window plans for the cluster-tier edge sets.

        With ``agg_vjp: fused``, the hierarchical block's up/cross/down
        sub-steps run the same fused Pallas kernel as the mesh tier (the
        cluster-tier structure is trivially banded: every node connects to
        exactly one cluster).  Plan dims are forced to deterministic
        functions of (N, K_padded, chunk) wherever they depend on the
        cluster assignment, so reclustering swaps plan VALUES without
        changing shapes — the compiled step is reused across reclusters.
        Reference target: src/migration/hypergraphnet.py:26-54 (the 7
        sequential sub-steps this accelerates).
        """
        if model.params["model"].get("agg_vjp") != "fused":
            return static
        # Default OFF: measured on TPU v5e, running the cluster tiers
        # through the fused kernel COSTS ~2 ms/step on HGN plate (47.7 vs
        # 45.5 ms) — the K~16 one-hot window FLOPs outweigh the fusion win
        # (ROADMAP 5b).  The mesh/world sets keep the fused path; the
        # density-gated masked-scatter aggregation handles the tiers.
        if not model.params["model"].get("rmp", {}).get("fused_tiers", False):
            return static
        from hyper_graph_nets_tpu.ops.pallas.fused_block import (
            _round_up as ru,
            build_band_plan,
            default_chunk,
        )

        chunk = model.params["model"].get("fused_chunk") or default_chunk()
        N = int(num_nodes)
        Kp = int(static.assign_mean.shape[0])
        rows = N + Kp
        clog2 = lambda n: max(int(n) - 1, 1).bit_length()

        def plan(snd, rcv, mask, w_bound, wr_bound, steps_bound):
            snd, rcv = np.asarray(snd), np.asarray(rcv)
            m = np.asarray(mask)
            ev = int(m.sum())
            # valid edges must form a receiver-sorted prefix
            if ev and (m[:ev].min() <= 0 or np.any(np.diff(rcv[:ev]) < 0)):
                return None
            if max(w_bound, wr_bound, 128) > 2048:
                return None  # window over the kernel limit; stay unfused
            try:
                # sb pinned to 1: plan shapes must stay functions of
                # (N, K_padded, chunk) across reclusters, and cluster-tier
                # sender spans are window-bound-dominated anyway
                p0 = build_band_plan(
                    snd, rcv, rows, num_valid=ev, chunk=chunk, sb=1
                )
                force = (
                    max(p0.W, w_bound),
                    max(p0.WR, wr_bound),
                    max(p0.scan_steps, steps_bound),
                    max(
                        p0.nr_tag.shape[0],
                        ((rows - 1) // 16) * 16 + max(p0.W, w_bound),
                        ((rows - 1) // 8) * 8 + max(p0.WR, wr_bound),
                    ),
                    1,
                )
                return build_band_plan(
                    snd, rcv, rows, num_valid=ev, chunk=chunk, force_dims=force
                )
            except ValueError:
                return None

        # up: senders are arbitrary node ids (span <= N, varies with the
        # clustering); receivers span <= Kp per chunk; segments can fill a
        # chunk (one big cluster)
        up_plan = plan(
            static.up_senders, static.up_receivers, static.up_mask,
            w_bound=ru(N + 16, 128), wr_bound=ru(Kp + 8, 128),
            steps_bound=clog2(chunk),
        )
        # down: senders are hyper rows (span <= Kp); receivers are the fixed
        # ascending member order (stable per mesh); one edge per receiver
        down_plan = plan(
            static.down_senders, static.down_receivers, static.down_mask,
            w_bound=ru(Kp + 16, 128), wr_bound=0, steps_bound=0,
        )
        # inter: both ends in the hyper rows
        kb = ru(Kp + 16, 128)
        inter_plan = plan(
            static.inter_senders, static.inter_receivers, static.inter_mask,
            w_bound=kb, wr_bound=kb, steps_bound=clog2(min(Kp, chunk)),
        )
        iw_plan = None
        if static.inter_world_senders is not None:
            iw_plan = plan(
                static.inter_world_senders, static.inter_world_receivers,
                static.inter_world_mask,
                w_bound=kb, wr_bound=kb, steps_bound=clog2(min(Kp, chunk)),
            )
        return static._replace(
            up_plan=up_plan, down_plan=down_plan, inter_plan=inter_plan,
            inter_world_plan=iw_plan,
        )

    # ------------------------------------------------------------------
    def expand(
        self,
        state,
        graph,
        frames,
        model,
        is_training: bool,
        key: Optional[Array] = None,
        static: Optional[RMPStatic] = None,
    ):
        """Add hyper tier + remote edges (single frame or batched)."""
        static = static if static is not None else self._static
        if static is None:
            raise RuntimeError("RemoteMessagePassing.prepare() must run first")
        target, mesh = model.geometry(frames)
        return self._connector.expand(
            state, graph, static, target, mesh, model, is_training, key
        )

    expand_batched = expand

    def visualize_cluster(self, coordinates: np.ndarray, out_path: Optional[str] = None):
        """3-D scatter of cluster assignments (reference :146-150 logs to
        wandb Object3D; here: matplotlib PNG when a path is given, else the
        colored point array)."""
        if self._last_clustering is None:
            return None
        labels = np.asarray(self._last_clustering.labels)
        if out_path is not None:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig = plt.figure(figsize=(6, 5))
            ax = fig.add_subplot(111, projection="3d")
            pts = np.asarray(coordinates)
            if pts.shape[1] == 2:
                pts = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=labels, cmap="tab20", s=4)
            fig.savefig(out_path, dpi=80)
            plt.close(fig)
            return out_path
        return labels


def get_rmp(config: dict) -> Optional[RemoteMessagePassing]:
    """Build (clustering, connector) from config (reference get_rmp.py:19-26)."""
    params = config.get("params", config)
    rmp_cfg = params["model"].get("rmp", {})
    clustering_name = rmp_cfg.get("clustering", "none")
    connector_name = rmp_cfg.get("connector", "none")
    clustering = get_clustering_algorithm(clustering_name, rmp_cfg)
    connector = get_connector(connector_name, rmp_cfg)
    if clustering is None or connector is None:
        return None
    return RemoteMessagePassing(clustering, connector)
