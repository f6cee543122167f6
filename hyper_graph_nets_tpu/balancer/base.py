"""Graph balancer facade: cached edge additions/removals + device featurizer.

Parity with reference src/graph_balancer/abstract_graph_balancer.py:9-100 and
graph_balancer.py:5-24: the algorithm (Ricci SDRF / random) runs once per
reset cadence and its result is cached; every step then (a) appends a
'balance' edge set whose features go through the *mesh-edge* normalizer
(reference :48-63) and (b) masks out removed mesh edges (reference :65-81 —
NB the reference re-normalizes already-normalized surviving features there, a
double-normalization bug we do not reproduce; we zero the removed edges'
contribution instead).

TPU split mirrors rmp/: ``prepare`` (host, per reset) returns a
:class:`BalancerStatic` array pytree passed into the jitted step;
``expand`` is the pure device stage.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph
from hyper_graph_nets_tpu.core.mesh import receivers_to_gather

Array = jax.Array


class BalancerStatic(NamedTuple):
    """Static balance-edge incidence + mesh-edge keep mask (array pytree)."""

    bal_senders: np.ndarray  # [Eb] int32, receiver-sorted
    bal_receivers: np.ndarray  # [Eb]
    bal_mask: np.ndarray  # [Eb] f32
    bal_gather_idx: np.ndarray  # [N, d]
    bal_gather_valid: np.ndarray  # [N, d]
    mesh_keep: np.ndarray  # [E] f32, 0 for removed mesh edges


def _round_pow2(n: int) -> int:
    p = 1
    while p < max(n, 1):
        p *= 2
    return p


class GraphBalancer:
    """Caches one balancing until reset (reference graph_balancer.py:5-24)."""

    def __init__(self, algorithm, capacity: Optional[int] = None):
        self._algorithm = algorithm
        self._static: Optional[BalancerStatic] = None
        self._capacity = capacity

    def reset_balancer(self) -> None:
        self._static = None

    @property
    def static(self):
        """Current cached static incidence (None before prepare)."""
        return self._static

    # ------------------------------------------------------------------
    def prepare(self, model, frame: Dict[str, np.ndarray], topo) -> BalancerStatic:
        if self._static is not None:
            return self._static
        added, removed = self._algorithm.run(topo)

        n_added = len(added["senders"])
        cap = self._capacity or _round_pow2(n_added)
        cap = max(cap, 1)
        take = min(n_added, cap)
        snd = np.zeros(cap, np.int32)
        rcv = np.zeros(cap, np.int32)
        mask = np.zeros(cap, np.float32)
        snd[:take] = added["senders"][:take]
        rcv[:take] = added["receivers"][:take]
        mask[:take] = 1.0
        order = np.argsort(rcv + (1 - mask) * topo.num_nodes, kind="stable")
        snd, rcv, mask = snd[order], rcv[order], mask[order]
        gidx, gval = receivers_to_gather(rcv, topo.num_nodes, mask=mask)
        d = _round_pow2(gidx.shape[1])
        gidx = np.pad(gidx, ((0, 0), (0, d - gidx.shape[1])))
        gval = np.pad(gval, ((0, 0), (0, d - gval.shape[1])))

        keep = np.ones(len(topo.senders), np.float32)
        if removed is not None and len(removed["senders"]):
            removed_set = set(zip(removed["senders"], removed["receivers"]))
            for i, (s, r) in enumerate(zip(topo.senders, topo.receivers)):
                if (int(s), int(r)) in removed_set or (int(r), int(s)) in removed_set:
                    keep[i] = 0.0

        self._static = BalancerStatic(
            bal_senders=snd,
            bal_receivers=rcv,
            bal_mask=mask,
            bal_gather_idx=gidx,
            bal_gather_valid=gval,
            mesh_keep=keep,
        )
        return self._static

    # ------------------------------------------------------------------
    def expand(
        self,
        state,
        graph: Graph,
        frames,
        model,
        is_training: bool,
        key: Optional[Array] = None,
        static: Optional[BalancerStatic] = None,
    ):
        """Device stage: append 'balance' edge set, mask removed mesh edges."""
        static = static if static is not None else self._static
        if static is None:
            raise RuntimeError("GraphBalancer.prepare() must run first")

        snd = jnp.asarray(static.bal_senders)
        rcv = jnp.asarray(static.bal_receivers)
        feats_raw = model.mesh_edge_features(frames, snd, rcv)
        bmask = jnp.broadcast_to(
            jnp.asarray(static.bal_mask), feats_raw.shape[:-1]
        )
        # balance features go through the mesh-edge normalizer
        # (reference abstract_graph_balancer.py:60-62)
        feats, state = model._normalize(
            state, "mesh_edge", feats_raw, accumulate=is_training, mask=bmask
        )
        edge_sets = dict(graph.edge_sets)
        edge_sets["balance"] = EdgeSet(
            features=feats * bmask[..., None],
            senders=snd,
            receivers=rcv,
            mask=bmask,
            gather_idx=jnp.asarray(static.bal_gather_idx),
            gather_valid=jnp.asarray(static.bal_gather_valid),
        )

        keep = jnp.asarray(static.mesh_keep)
        mesh = edge_sets["mesh_edges"]
        new_mask = keep if mesh.mask is None else mesh.mask * keep
        gv = mesh.gather_valid
        if gv is not None:
            gv = gv * jnp.take(keep, mesh.gather_idx)
        edge_sets["mesh_edges"] = mesh.replace(
            mask=jnp.broadcast_to(new_mask, mesh.features.shape[:-1]),
            gather_valid=gv,
        )
        return graph.replace(edge_sets=edge_sets), state


class RandomGraphBalancer:
    """Adds (and removes) random node pairs (reference random_balancing.py:8-36)."""

    def __init__(self, params: dict):
        bal = params["model"]["graph_balancer"]
        self.edge_amount = bal.get("random", {}).get("edge_amount", 100)
        self.remove_edges = bal.get("remove_edges", True)
        self._rng = np.random.RandomState(0)

    def run(self, topo) -> Tuple[Dict[str, list], Optional[Dict[str, list]]]:
        n = topo.num_nodes
        pairs = self._rng.choice(n, size=(self.edge_amount, 2), replace=False if n >= 2 * self.edge_amount else True)
        added = {
            "senders": pairs[:, 0].tolist(),
            "receivers": pairs[:, 1].tolist(),
        }
        if not self.remove_edges:
            return added, None
        rem = self._rng.choice(n, size=(self.edge_amount, 2), replace=False if n >= 2 * self.edge_amount else True)
        removed = {"senders": rem[:, 0].tolist(), "receivers": rem[:, 1].tolist()}
        return added, removed


def get_balancer(config: dict) -> Optional[GraphBalancer]:
    """Factory (reference get_graph_balancer.py:12-27 parity)."""
    params = config.get("params", config)
    bal = params["model"].get("graph_balancer", {})
    name = bal.get("algorithm", "none")
    if name == "none":
        return None
    if name == "ricci":
        from hyper_graph_nets_tpu.balancer.ricci import Ricci

        loops = bal.get("ricci", {}).get("loops", 150)
        return GraphBalancer(Ricci(params), capacity=_round_pow2(2 * loops))
    if name == "random":
        amount = bal.get("random", {}).get("edge_amount", 100)
        return GraphBalancer(RandomGraphBalancer(params), capacity=_round_pow2(amount))
    raise NotImplementedError(f"unknown balancer {name!r}")
