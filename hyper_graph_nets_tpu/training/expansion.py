"""Graph expansion composition: balancer + remote message passing.

Mirrors the reference ``expand_graph`` (src/model/flag.py:130-141): the
balancer runs first, then RMP, each with its own cache-reset cadence.  The
composite presents the single-expansion interface the trainer, evaluators,
and rollout loops consume; its static payload is the tuple of member statics
and travels through jit as one pytree argument.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from hyper_graph_nets_tpu.models.base import reset_due

Array = jax.Array


def _freeze(obj):
    """Canonical hashable form of a (nested) config value."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


class CompositeExpansion:
    """Ordered expansions with per-member reset cadence.

    ``fingerprint`` is a stable hashable key derived from the building
    config — models key their compiled-fn caches on it instead of
    ``id(expansion)`` (an id of a collected object can be reused, silently
    aliasing a function compiled for a different expansion config).
    """

    def __init__(
        self, members: Sequence, frequencies: Sequence[int], fingerprint=None
    ):
        assert len(members) == len(frequencies)
        self.members = list(members)
        self.frequencies = list(frequencies)
        self.fingerprint = fingerprint or (
            tuple(type(m).__name__ for m in members),
            tuple(frequencies),
        )

    def reset(self, step: int, num_steps: int) -> None:
        """Apply each member's reset cadence (reference flag.py:130-141)."""
        for member, freq in zip(self.members, self.frequencies):
            if reset_due(step, num_steps, freq):
                if hasattr(member, "reset_clusters"):
                    member.reset_clusters()
                if hasattr(member, "reset_balancer"):
                    member.reset_balancer()

    def prepare(self, model, frame: Dict[str, np.ndarray], topo) -> Tuple:
        return tuple(m.prepare(model, frame, topo) for m in self.members)

    @property
    def static(self) -> Tuple:
        """Current member statics (for passing into cached jitted fns)."""
        return tuple(m._static for m in self.members)

    def expand(
        self,
        state,
        graph,
        frames,
        model,
        is_training: bool,
        key: Optional[Array] = None,
        static: Optional[Tuple] = None,
    ):
        statics = static if static is not None else (None,) * len(self.members)
        for member, member_static in zip(self.members, statics):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            graph, state = member.expand(
                state, graph, frames, model,
                is_training=is_training, key=sub, static=member_static,
            )
        return graph, state

    expand_batched = expand


def build_expansion(model, config: dict):
    """Build the configured (balancer, rmp) expansion, or None.

    Order matches the reference: balancer first, then RMP.
    """
    from hyper_graph_nets_tpu.balancer.base import get_balancer
    from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp

    members = []
    freqs = []
    balancer = get_balancer(config)
    if balancer is not None:
        members.append(balancer)
        freqs.append(model.balance_frequency)
    rmp = get_rmp(config)
    if rmp is not None:
        members.append(rmp)
        freqs.append(model.rmp_frequency)
    if not members:
        return None
    model_cfg = config.get("params", config).get("model", config.get("model", {}))
    fingerprint = (
        _freeze(model_cfg.get("rmp", {})),
        _freeze(model_cfg.get("graph_balancer", {})),
        tuple(freqs),
    )
    return CompositeExpansion(members, freqs, fingerprint=fingerprint)
