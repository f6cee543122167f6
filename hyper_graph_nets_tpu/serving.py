"""Serving API: compiled low-latency inference for trained models.

The reference has no deployment surface (training scripts only); this
module is the production path for running a trained simulator: load a
checkpoint once, compile once, then predict with no Python/framework
overhead in the loop.

- :class:`Predictor` owns the model, the restored ``ModelState`` and the
  remote-message-passing expansion; its :meth:`rollout` and
  :meth:`one_step` reuse the models' jit-cached scan/vmap programs, so
  repeated calls with same-shaped meshes never recompile.
- ``model.inference_quant: int8`` (or ``Predictor(..., quantize="int8")``)
  serves W8A8 quantized weights (nn/quant.py).
- The fused Pallas MP-block kernel (``model.agg_vjp: fused``) is the
  fastest configuration for batch-1 rollout latency as well
  (BENCHMARKS.md "Inference / rollout").

Example::

    from hyper_graph_nets_tpu.serving import Predictor
    p = Predictor.from_config("flag_demo", checkpoint="data/flag/output")
    result = p.rollout(trajectory)          # dict with pred_pos + mse
    preds = p.one_step(frames)              # [B, N, D] next-state fields
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class Predictor:
    """Compiled inference wrapper around a trained system model."""

    def __init__(
        self,
        config: dict,
        state: Optional[Any] = None,
        quantize: Optional[str] = None,
    ):
        import copy

        from hyper_graph_nets_tpu.models.get_model import get_model
        from hyper_graph_nets_tpu.training.expansion import build_expansion

        # own the config: the quantize override below (and any model-side
        # defaulting) must not mutate the caller's dict
        config = copy.deepcopy(config)
        self.config = config
        self.params = config.get("params", config)
        self.model = get_model(config)
        if state is None:
            state = self.model.init_state(jax.random.PRNGKey(0))
        if quantize is not None:
            self.model.params["model"]["inference_quant"] = quantize
        self.state = self.model.inference_state(state)
        # the expansion wrapper (reset cadence + static incidence), None
        # when no remote message passing is configured
        self.expansion = build_expansion(self.model, config)
        self._topo_cache: Dict[Tuple, Any] = {}

    # -- construction ------------------------------------------------------
    @classmethod
    def from_config(
        cls,
        config_or_name,
        checkpoint: Optional[str] = None,
        quantize: Optional[str] = None,
    ) -> "Predictor":
        """Build from a config (name under configs/ or dict), optionally
        restoring the latest checkpoint from ``checkpoint`` (a directory,
        or a direct checkpoint path)."""
        import os

        from hyper_graph_nets_tpu.training import checkpoint as ckpt
        from hyper_graph_nets_tpu.utils.config import read_yaml

        config = (
            read_yaml(config_or_name)
            if isinstance(config_or_name, str)
            else config_or_name
        )
        state = None
        if checkpoint is not None:
            path = checkpoint
            if os.path.isdir(path):
                found = ckpt.latest(path, config)
                if found is None:
                    raise FileNotFoundError(
                        f"no checkpoint matching this config under {path}"
                    )
                path = found[0]
            tstate, _, _ = ckpt.load(path)
            state = tstate.model
        return cls(config, state=state, quantize=quantize)

    # -- topology ----------------------------------------------------------
    def _topology(self, trajectory: Dict[str, np.ndarray]):
        from hyper_graph_nets_tpu.core.mesh import mesh_fingerprint

        key = mesh_fingerprint(
            trajectory["cells"][0], trajectory["node_type"].shape[1]
        ) + self.model.topology_content_key(trajectory)
        if key not in self._topo_cache:
            self._topo_cache[key] = self.model.topology_from_trajectory(
                trajectory
            )
        return self._topo_cache[key]

    def _prepare_expansion(self, trajectory, topo):
        if self.expansion is None:
            return None
        self.expansion.reset(0, trajectory["cells"].shape[0])
        frame0 = {k: v[0] for k, v in trajectory.items()}
        self.expansion.prepare(self.model, frame0, topo)
        return self.expansion

    # -- inference ---------------------------------------------------------
    def rollout(
        self,
        trajectory: Dict[str, np.ndarray],
        num_steps: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Recursive rollout from the trajectory's first frame.

        Returns the model's rollout ops dict (``pred_pos`` /
        ``pred_velocity``, ground truth, mesh) plus ``mse`` per step.
        Compiled once per (mesh shape, num_steps); subsequent calls reuse
        the cached program.
        """
        topo = self._topology(trajectory)
        expansion = self._prepare_expansion(trajectory, topo)
        ops, mse = self.model.rollout(
            self.state, topo, trajectory, num_steps=num_steps,
            expansion=expansion,
        )
        out = {k: np.asarray(v) for k, v in ops.items()}
        out["mse"] = np.asarray(mse)
        return out

    def one_step(self, trajectory: Dict[str, np.ndarray]) -> np.ndarray:
        """Single-step next-state predictions for every frame (batched).

        Runs graph build -> network forward -> integrator update under one
        jit; returns the predicted next value of the model's field
        (positions for flag/plate, velocities for cylinder) per frame.
        """
        from hyper_graph_nets_tpu.core.mesh import mesh_fingerprint

        topo = self._topology(trajectory)
        expansion = self._prepare_expansion(trajectory, topo)
        static = expansion.static if expansion is not None else None
        # topo (and the expansion wrapper) are baked into the closure below,
        # so the cache key must identify the mesh by CONTENT: two meshes with
        # equal node/edge counts (same-resolution grids, bucketed data) must
        # not reuse each other's compiled topology
        mesh_key = mesh_fingerprint(
            trajectory["cells"][0], trajectory["node_type"].shape[1]
        ) + self.model.topology_content_key(trajectory)
        exp_key = expansion.fingerprint if expansion is not None else None
        key = ("serve_one_step", mesh_key, exp_key)
        model = self.model

        def build():
            from hyper_graph_nets_tpu.training.trainer import batched_forward

            def fn(state, frames, static):
                graph, _, _ = model.make_graph(state, topo, frames, False)
                if expansion is not None:
                    graph, _ = expansion.expand(
                        state, graph, frames, model,
                        is_training=False, static=static,
                    )
                out = batched_forward(model, state.params, graph)
                frame_axes = {k: 0 for k in frames}
                return jax.vmap(
                    lambda f, o: model.update(state, f, o),
                    in_axes=(frame_axes, 0),
                )(frames, out)

            return fn

        fn = model._cached_jit(key, build)
        frames = {
            k: jnp.asarray(v) for k, v in trajectory.items() if k != "cells"
        }
        return np.asarray(fn(self.state, frames, static))
