"""Training driver: jitted train/eval steps over vmap-batched frames.

Re-design of reference src/algorithms/MeshSimulator.py:29-509.  The
reference's per-trajectory flow (fetch_data -> block-diagonal _get_batched ->
python batch loop with backward/step) becomes: one jitted ``train_step``
taking a [B, N, ...] frame batch, building the batched graph via vmapped
featurizers, running the vmapped network, and applying the optax update —
all fused into a single XLA program.

Training noise (reference src/data/preprocessing.py:84-98) is drawn on
device from a JAX PRNG key: Gaussian noise on the dynamic field at NORMAL
nodes, with ``(1 - gamma)`` target compensation.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from hyper_graph_nets_tpu.core.graph import Graph, NodeType, graph_batch_axes
from hyper_graph_nets_tpu.models.base import ModelState, SystemModel, Topology

Array = jax.Array


@struct.dataclass
class TrainState:
    model: ModelState
    opt_state: Any
    step: Array  # int32 scalar


def add_noise(
    frames: Dict[str, Array],
    field: str,
    scale: float,
    gamma: float,
    key: Array,
) -> Dict[str, Array]:
    """Inject training noise on NORMAL nodes with target compensation."""
    x = frames[field]
    noise = scale * jax.random.normal(key, x.shape, x.dtype)
    mask = jnp.equal(frames["node_type"][..., 0], NodeType.NORMAL)[..., None]
    noise = jnp.where(mask, noise, 0.0)
    out = dict(frames)
    out[field] = x + noise
    out["target|" + field] = frames["target|" + field] + (1.0 - gamma) * noise
    return out


def graph_metrics(aux: Dict[str, Array]) -> Dict[str, Array]:
    """Model counters from ``make_graph`` aux, summed over the batch.

    Static structure per model (key presence decided at trace time): plate
    exposes ``world_truncated`` — radius-query hits dropped by the static
    world-edge capacity (deviation from the reference's uncapped dynamic
    query, plate.py:85-110); other models contribute nothing.
    """
    metrics = {}
    if "world_truncated" in aux:
        metrics["world_edge_truncated"] = jnp.sum(aux["world_truncated"])
    return metrics


def batched_forward(model: SystemModel, params: Any, graph: Graph) -> Array:
    """vmap the network over the batch axis (topology shared)."""
    from hyper_graph_nets_tpu.nn.meshgraphnet import network_apply

    cfg = model.gnn_config
    axes = graph_batch_axes(graph)
    return jax.vmap(lambda g: network_apply(params, g, cfg), in_axes=(axes,))(graph)


class Trainer:
    """Owns the optimizer and jitted step builders for one model."""

    def __init__(self, model: SystemModel, config: dict):
        self.model = model
        params = config.get("params", config)
        model_cfg = params["model"]
        lr = model_cfg.get("learning_rate", 1e-4)
        # Optional exponential decay after `scheduler_epoch` epochs (the
        # reference carries the config key, configs/minimal.yaml:31; the
        # MeshGraphNets paper decays lr 1e-4 -> 1e-6).  Enabled by setting
        # model.lr_decay_steps; plain Adam otherwise (reference
        # MeshSimulator.py:110 uses constant lr).
        decay_steps = model_cfg.get("lr_decay_steps")
        if decay_steps:
            schedule = optax.exponential_decay(
                init_value=lr,
                transition_steps=decay_steps,
                decay_rate=model_cfg.get("lr_decay_rate", 0.01),
                end_value=model_cfg.get("lr_min", 1e-6),
            )
            self.optimizer = optax.adam(schedule)
        else:
            self.optimizer = optax.adam(lr)
        self._train_step_cache: Dict[Any, Callable] = {}
        self._val_step_cache: Dict[Any, Callable] = {}

    def init_train_state(self, key: Array) -> TrainState:
        mstate = self.model.init_state(key)
        return TrainState(
            model=mstate,
            opt_state=self.optimizer.init(mstate.params),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def make_train_step(
        self, topo: Topology, expansion=None, topo_arg: bool = False,
        with_metrics: bool = False,
    ) -> Callable:
        """Build a jitted train step for a given static topology.

        With an ``expansion`` (remote message passing), the step takes an
        extra ``rmp_static`` argument — the array pytree from
        ``expansion.prepare(...)`` — so reclustering swaps data without
        recompiling (shapes are padding-stabilized).

        With ``topo_arg=True`` the step takes a trailing ``topo_arrays``
        argument (``Topology.arrays()``): the topology's data rides through
        jit as traced inputs while ``topo`` only supplies the static template
        (num_nodes, field None-ness).  One compiled step then serves every
        same-signature mesh — required for cross-trajectory bucketing, where
        padded meshes share shapes but differ in connectivity.

        With ``with_metrics=True`` the step returns ``(state, loss,
        metrics)`` where ``metrics`` is a (possibly empty) dict of model
        counters — currently plate's ``world_edge_truncated``, the number of
        radius-query hits dropped by the static world-edge capacity in the
        batch (the torch reference's dynamic query never truncates,
        plate.py:85-110, so silent truncation must be observable in
        training, not just rollout).
        """
        model = self.model

        def loss_fn(params, normalizers, frames, rmp_static, ekey, topo_t):
            mstate = ModelState(params=params, normalizers=normalizers)
            graph, aux, mstate = model.make_graph(mstate, topo_t, frames, True)
            if expansion is not None:
                graph, mstate = expansion.expand(
                    mstate, graph, frames, model,
                    is_training=True, key=ekey, static=rmp_static,
                )
            target, mstate = model.get_target(mstate, frames, is_training=True)
            out = batched_forward(model, mstate.params, graph)
            mask = model.loss_mask(frames["node_type"]).astype(out.dtype)[..., None]
            se = jnp.square(target - out) * mask
            loss = jnp.sum(se) / (jnp.sum(mask) * out.shape[-1])
            return loss, (mstate.normalizers, graph_metrics(aux))

        def _step(tstate: TrainState, frames, key, rmp_static, topo_t):
            key, nkey, ekey = jax.random.split(key, 3)
            if model.noise_scale is not None:
                frames = add_noise(
                    frames, model.field, model.noise_scale, model.noise_gamma, nkey
                )
            (loss, (normalizers, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(
                tstate.model.params, tstate.model.normalizers, frames, rmp_static,
                ekey, topo_t,
            )
            updates, opt_state = self.optimizer.update(
                grads, tstate.opt_state, tstate.model.params
            )
            params = optax.apply_updates(tstate.model.params, updates)
            new_state = TrainState(
                model=ModelState(params=params, normalizers=normalizers),
                opt_state=opt_state,
                step=tstate.step + 1,
            )
            if with_metrics:
                return new_state, loss, metrics
            return new_state, loss

        if topo_arg:
            if expansion is None:

                @functools.partial(jax.jit, donate_argnums=(0,))
                def train_step(tstate, frames, key, topo_arrays):
                    return _step(
                        tstate, frames, key, None, topo.rebuild(topo_arrays)
                    )

            else:

                @functools.partial(jax.jit, donate_argnums=(0,))
                def train_step(tstate, frames, key, rmp_static, topo_arrays):
                    return _step(
                        tstate, frames, key, rmp_static,
                        topo.rebuild(topo_arrays),
                    )

        elif expansion is None:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(tstate, frames, key):
                return _step(tstate, frames, key, None, topo)

        else:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(tstate, frames, key, rmp_static):
                return _step(tstate, frames, key, rmp_static, topo)

        return train_step

    def make_validation_step(
        self, topo: Topology, expansion=None, topo_arg: bool = False,
        with_metrics: bool = False,
    ) -> Callable:
        """One-step evaluation: (normalized loss, de-normalized error).

        Parity with reference validation_step (src/model/flag.py:157-168):
        no noise, no normalizer accumulation.  ``topo_arg`` and
        ``with_metrics`` (appends a metrics dict to the return) as in
        :meth:`make_train_step`.
        """
        model = self.model

        def _val(mstate: ModelState, frames, rmp_static, topo_t):
            graph, aux, _ = model.make_graph(mstate, topo_t, frames, False)
            if expansion is not None:
                graph, _ = expansion.expand(
                    mstate, graph, frames, model,
                    is_training=False, static=rmp_static,
                )
            target, _ = model.get_target(mstate, frames, is_training=False)
            out = batched_forward(model, mstate.params, graph)
            mask = model.loss_mask(frames["node_type"]).astype(out.dtype)[..., None]
            denom = jnp.sum(mask) * out.shape[-1]
            loss = jnp.sum(jnp.square(target - out) * mask) / denom
            prediction = model.update(mstate, frames, out)
            if isinstance(prediction, tuple):
                prediction = prediction[0]
            tkey = "target|" + model.field
            diff = frames[tkey] - prediction
            m2 = model.loss_mask(frames["node_type"]).astype(diff.dtype)[..., None]
            pos_error = jnp.sum(jnp.square(diff) * m2) / (
                jnp.sum(m2) * diff.shape[-1]
            )
            if with_metrics:
                return loss, pos_error, graph_metrics(aux)
            return loss, pos_error

        if topo_arg:
            if expansion is None:

                @jax.jit
                def val_step(mstate, frames, topo_arrays):
                    return _val(mstate, frames, None, topo.rebuild(topo_arrays))

            else:

                @jax.jit
                def val_step(mstate, frames, rmp_static, topo_arrays):
                    return _val(
                        mstate, frames, rmp_static, topo.rebuild(topo_arrays)
                    )

        elif expansion is None:

            @jax.jit
            def val_step(mstate, frames):
                return _val(mstate, frames, None, topo)

        else:

            @jax.jit
            def val_step(mstate, frames, rmp_static):
                return _val(mstate, frames, rmp_static, topo)

        return val_step


def frames_to_batches(
    trajectory: Dict[str, np.ndarray], batch_size: int, num_steps: Optional[int] = None
):
    """Split a [T, ...] trajectory dict into [B, ...] frame batches.

    Mirrors the reference's within-trajectory mini-batching
    (MeshSimulator.py:158-234) minus the block-diagonal concat: frames of one
    trajectory share topology, so stacking on a batch axis is equivalent.
    A short final batch is dropped only if smaller than batch_size (the
    reference pads implicitly by smaller final batches; we keep them too by
    emitting the remainder as its own batch).
    """
    T = min(
        trajectory[next(iter(trajectory))].shape[0],
        num_steps if num_steps is not None else 10**9,
    )
    for start in range(0, T, batch_size):
        end = min(start + batch_size, T)
        # cells stay on host (topology is pre-extracted; shapes vary per mesh)
        yield {
            k: jnp.asarray(v[start:end])
            for k, v in trajectory.items()
            if k != "cells"
        }
