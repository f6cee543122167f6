"""MeshSimulator: the training/evaluation driver (algorithm layer).

Parity with reference src/algorithms/MeshSimulator.py:29-509, re-shaped for
TPU execution:

- ``fit_trajectory``: the reference's fetch_data -> block-diagonal batch ->
  python train loop becomes: cache static topology, run the expansion reset
  cadence at batch granularity, and call one jitted train step per frame
  batch (vmap batching — frames of a trajectory share topology).
- evaluators: ``one_step_evaluator`` (validation loss + de-normalized error,
  reference :262-332), ``rollout_evaluator`` (scan rollouts + per-step MSE
  curves + pickled rollouts, reference :334-390, 495-509),
  ``n_step_evaluator`` (vmapped sliding windows, reference :392-436).
- per-instance timing + losses go to the metrics logger (reference wandb
  calls :151-156).

Compiled executables are cached per (topology shape, batch size); meshes of
identical shape across trajectories reuse them.
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.models.base import ModelState, Topology, reset_due
from hyper_graph_nets_tpu.models.get_model import get_model
from hyper_graph_nets_tpu.training.expansion import build_expansion
from hyper_graph_nets_tpu.training.trainer import (
    TrainState,
    Trainer,
    frames_to_batches,
)
from hyper_graph_nets_tpu.utils.config import get_from_nested_dict
from hyper_graph_nets_tpu.utils.metrics import MetricsLogger


class MeshSimulator:
    def __init__(self, config: dict, out_dir: Optional[str] = None):
        self.config = config
        params = config.get("params", config)
        self.params = params
        self.model = get_model(config)
        self.trainer = Trainer(self.model, config)
        self.expansion = build_expansion(self.model, config)
        self.batch_size = get_from_nested_dict(
            params, ["task", "batch_size"], default_return=1
        )
        self.time_steps = get_from_nested_dict(
            params, ["task", "n_timesteps"], default_return=None
        )
        self.out_dir = out_dir or "output"
        os.makedirs(self.out_dir, exist_ok=True)
        self.logger: Optional[MetricsLogger] = None
        self._topo_cache: Dict[Tuple, Topology] = {}
        self._step_cache: Dict[Tuple, Any] = {}
        self._val_cache: Dict[Tuple, Any] = {}
        self._key = jax.random.PRNGKey(params.get("random_seed", 0))
        # within-trajectory batch-order shuffle (reference MeshSimulator.py:138
        # random.shuffle(batches)); seeded for reproducibility
        self._shuffle_rng = np.random.RandomState(params.get("random_seed", 0))
        # cross-trajectory bucketing capacity (data/bucketing.py); None until
        # set_capacity is called for variable-size datasets
        self.capacity: Optional[Tuple[int, int]] = None
        self._plan_dims: Optional[object] = None
        self._topo_extras: Optional[dict] = None

    def set_capacity(
        self, num_nodes: int, num_edges: int,
        plan_dims: Optional[object] = None,
        topo_extras: Optional[dict] = None,
    ) -> None:
        """Enable bucketing: all trajectories pad to one static shape.

        ``plan_dims`` (data/bucketing.bucket_plan_dims): pinned band-plan
        static dims so every bucketed mesh compiles to one step
        signature; None keeps per-trajectory auto plans.  ``topo_extras``
        (model.bucket_topology_extras): bucket-stable dims for
        model-specific topology aux (plate obstacle/world capacities)."""
        self.capacity = (num_nodes, num_edges)
        self._plan_dims = plan_dims
        self._topo_extras = topo_extras

    def _prepare(self, trajectory: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        trajectory = self._maybe_reorder(trajectory)
        if self.capacity is None:
            return trajectory
        from hyper_graph_nets_tpu.data.bucketing import pad_trajectory

        return pad_trajectory(trajectory, self.capacity[0])

    def _maybe_reorder(
        self, trajectory: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """RCM-relabel unstructured meshes for the fused Pallas kernel.

        The fused MP-block path (model.agg_vjp = 'fused') needs a banded
        node numbering (ops/pallas/fused_block).  Grid meshes are banded
        natively; the DeepMind unstructured meshes are not, so when the
        natural ordering fails the band-plan build we relabel nodes with
        reverse Cuthill-McKee (ops/reorder) — a pure renumbering, exactly
        loss/physics-equivalent.  The permutation is cached per mesh.
        """
        if self.model.params["model"].get("agg_vjp") != "fused":
            return trajectory
        from hyper_graph_nets_tpu.core.mesh import cells_to_edges
        from hyper_graph_nets_tpu.ops import reorder
        from hyper_graph_nets_tpu.ops.pallas.fused_block import check_banded

        cells = np.asarray(trajectory["cells"][0])
        n = int(trajectory["node_type"].shape[1])
        key = self._mesh_key("rcm", trajectory)
        if key not in self._topo_cache:
            edges = cells_to_edges(cells)  # 4-col (quad) cells imply deform
            if check_banded(edges.senders, edges.receivers):
                self._topo_cache[key] = None  # already banded
            else:
                self._topo_cache[key] = reorder.rcm_order(
                    edges.senders, edges.receivers, n
                )
        perm = self._topo_cache[key]
        if perm is None:
            return trajectory
        return reorder.reorder_trajectory(trajectory, perm)

    # ------------------------------------------------------------------
    def initialize(self, logger: Optional[MetricsLogger] = None) -> TrainState:
        self.logger = logger or MetricsLogger(self.out_dir, self.config)
        self._key, k = jax.random.split(self._key)
        return self.trainer.init_train_state(k)

    def _mesh_key(self, tag: str, trajectory: Dict[str, np.ndarray]) -> Tuple:
        """Cache key from the full mesh content (core.mesh.mesh_fingerprint)
        plus any model-declared trajectory content the topology depends on
        (plate ``max_world_edges: auto``: same-mesh trajectories with
        different motion carry different world-edge capacities).  The "rcm"
        tag skips the extra content — the permutation depends on
        connectivity only."""
        from hyper_graph_nets_tpu.core.mesh import mesh_fingerprint

        key = (tag,) + mesh_fingerprint(
            trajectory["cells"][0], trajectory["node_type"].shape[1]
        )
        if tag != "rcm":
            key += self.model.topology_content_key(trajectory)
        return key

    def _topology(self, trajectory: Dict[str, np.ndarray]) -> Topology:
        key = self._mesh_key("topo", trajectory)
        if key not in self._topo_cache:
            if self.capacity is not None:
                from hyper_graph_nets_tpu.data.bucketing import pad_topology

                self._topo_cache[key] = pad_topology(
                    self.model, trajectory, *self.capacity,
                    plan_dims=self._plan_dims,
                    topo_extras=self._topo_extras,
                )
            else:
                self._topo_cache[key] = self.model.topology_from_trajectory(
                    trajectory
                )
        return self._topo_cache[key]

    def _train_step_fn(self, topo: Topology, trajectory: Dict[str, np.ndarray]):
        """Compiled train step, correct per trajectory.

        Bucketed path (capacity set): meshes pad to identical shapes but
        differ in connectivity, so the topology rides through jit as a
        traced ``topo_arrays`` argument — ONE compiled step per static
        signature serves every trajectory with its own connectivity (a
        shape-keyed baked-topology cache would silently train trajectory 2+
        against trajectory 1's mesh).

        Unbucketed path: topology is baked as a compile-time constant (XLA
        constant-folds the gather indices) and the cache keys on the full
        mesh CONTENT, never shapes.
        """
        if self.capacity is not None:
            # upload once per trajectory; repeated step calls reuse the
            # committed device arrays instead of re-transferring numpy
            arrays = jax.tree.map(jnp.asarray, topo.arrays())
            key = ("train_arg", topo.static_signature())
            if key not in self._step_cache:
                self._step_cache[key] = self.trainer.make_train_step(
                    topo, expansion=self.expansion, topo_arg=True,
                    with_metrics=True,
                )
            step = self._step_cache[key]
            if self.expansion is not None:
                return lambda ts, frames, k, static: step(
                    ts, frames, k, static, arrays
                )
            return lambda ts, frames, k: step(ts, frames, k, arrays)
        key = self._mesh_key("train", trajectory)
        if key not in self._step_cache:
            self._step_cache[key] = self.trainer.make_train_step(
                topo, expansion=self.expansion, with_metrics=True
            )
        return self._step_cache[key]

    def _val_step_fn(self, topo: Topology, trajectory: Dict[str, np.ndarray]):
        if self.capacity is not None:
            arrays = jax.tree.map(jnp.asarray, topo.arrays())
            key = ("val_arg", topo.static_signature())
            if key not in self._val_cache:
                self._val_cache[key] = self.trainer.make_validation_step(
                    topo, expansion=self.expansion, topo_arg=True,
                    with_metrics=True,
                )
            val = self._val_cache[key]
            if self.expansion is not None:
                return lambda ms, frames, static: val(ms, frames, static, arrays)
            return lambda ms, frames: val(ms, frames, arrays)
        key = self._mesh_key("val", trajectory)
        if key not in self._val_cache:
            self._val_cache[key] = self.trainer.make_validation_step(
                topo, expansion=self.expansion, with_metrics=True
            )
        return self._val_cache[key]

    # ------------------------------------------------------------------
    def fit_trajectory(
        self,
        tstate: TrainState,
        trajectory: Dict[str, np.ndarray],
        epoch: int = 0,
    ) -> Tuple[TrainState, List[float]]:
        """Train over one trajectory in frame batches (reference :113-156).

        Batches are prepared in temporal order (the expansion reset cadence is
        a function of the frame index, reference flag.py:130-141) and then the
        *batch order* is shuffled, matching the reference's
        ``random.shuffle(batches)`` after ``fetch_data`` (MeshSimulator.py:138).

        Losses stay on device for the whole trajectory; one transfer at the
        end fetches them all, so the host never serializes against the chip
        between batches.  "training time per instance" is therefore dispatch
        time, not device time — the per-trajectory wall time (measured after a
        block_until_ready) is the accurate throughput signal.
        """
        trajectory = self._prepare(trajectory)
        topo = self._topology(trajectory)
        step = self._train_step_fn(topo, trajectory)
        T = trajectory["cells"].shape[0]
        num_steps = min(T, self.time_steps or T)
        start_traj = time.time()

        # temporal-order pass: expansion cadence + per-batch static structures
        jobs: List[Tuple[int, int, Any]] = []
        for start in range(0, num_steps, self.batch_size):
            end = min(start + self.batch_size, num_steps)
            static = None
            if self.expansion is not None:
                for i in range(start, end):
                    if any(
                        reset_due(i, num_steps, f) for f in self.expansion.frequencies
                    ):
                        self.expansion.reset(i, num_steps)
                        break
                frame0 = {k: v[start] for k, v in trajectory.items()}
                static = self.expansion.prepare(self.model, frame0, topo)
            jobs.append((start, end, static))
        self._shuffle_rng.shuffle(jobs)

        device_losses: List[Any] = []
        device_metrics: List[Any] = []
        dispatch_times: List[float] = []
        for start, end, static in jobs:
            # cells never reach the device (topology is pre-extracted); with
            # bucketing their per-trajectory shapes would defeat jit caching
            frames = {
                k: jnp.asarray(v[start:end])
                for k, v in trajectory.items()
                if k != "cells"
            }
            self._key, k = jax.random.split(self._key)
            t0 = time.time()
            if static is not None:
                tstate, loss, metrics = step(tstate, frames, k, static)
            else:
                tstate, loss, metrics = step(tstate, frames, k)
            device_losses.append(loss)
            device_metrics.append(metrics)
            dispatch_times.append(time.time() - t0)

        if device_losses:
            jax.block_until_ready(device_losses[-1])
        losses = [float(l) for l in device_losses]
        # per-trajectory sums of the model's step counters (e.g. plate
        # world-edge capacity truncation — must be visible in TRAINING, where
        # noise can push contact past the data-derived capacity)
        metric_sums: Dict[str, float] = {}
        for m in device_metrics:
            for name, v in m.items():
                metric_sums[name] = metric_sums.get(name, 0.0) + float(v)
        if self.logger:
            for loss, dt in zip(losses, dispatch_times):
                self.logger.log(
                    {"loss": loss, "training time per instance": dt}
                )
            elapsed = time.time() - start_traj
            num_edges = len(topo.senders)
            valid_edges = (
                float(np.sum(topo.mask)) if topo.mask is not None else num_edges
            )
            self.logger.log(
                {
                    "training time per trajectory": elapsed,
                    "loss per trajectory": float(np.mean(losses)) if losses else 0.0,
                    # the BASELINE throughput metric (edges consumed per sec);
                    # _valid excludes bucketing padding (honest accounting)
                    "edges_per_s": num_steps * num_edges / max(elapsed, 1e-9),
                    "edges_per_s_valid": num_steps * valid_edges
                    / max(elapsed, 1e-9),
                    **metric_sums,
                },
                commit=False,
            )
        return tstate, losses

    # ------------------------------------------------------------------
    def one_step_evaluator(
        self,
        tstate: TrainState,
        trajectories: Iterable[Dict[str, np.ndarray]],
        n_trajectories: Optional[int] = None,
        logging: bool = True,
    ) -> Dict[str, float]:
        """Validation loss + de-normalized error (reference :262-332)."""
        losses: List[float] = []
        errors: List[float] = []
        metric_sums: Dict[str, float] = {}
        for idx, traj in enumerate(trajectories):
            if n_trajectories is not None and idx >= n_trajectories:
                break
            traj = self._prepare(traj)
            topo = self._topology(traj)
            val = self._val_step_fn(topo, traj)
            static = None
            if self.expansion is not None:
                self.expansion.reset(0, traj["cells"].shape[0])
                frame0 = {k: v[0] for k, v in traj.items()}
                static = self.expansion.prepare(self.model, frame0, topo)
            for frames in frames_to_batches(traj, self.batch_size, self.time_steps):
                if static is not None:
                    loss, err, metrics = val(tstate.model, frames, static)
                else:
                    loss, err, metrics = val(tstate.model, frames)
                losses.append(float(loss))
                errors.append(float(err))
                for name, v in metrics.items():
                    metric_sums[name] = metric_sums.get(name, 0.0) + float(v)
        result = {
            "validation_loss": float(np.mean(losses)) if losses else float("nan"),
            "position_error": float(np.mean(errors)) if errors else float("nan"),
            **metric_sums,
        }
        if logging and self.logger:
            self.logger.log(result, commit=False)
            self.logger.log_histogram("validation_loss_hist", losses)
            self.logger.log_table(
                "one_step_eval",
                list(zip(range(len(losses)), losses, errors)),
                ["instance", "loss", "position_error"],
            )
        return result

    def rollout_evaluator(
        self,
        tstate: TrainState,
        trajectories: Iterable[Dict[str, np.ndarray]],
        n_rollouts: Optional[int] = None,
        num_steps: Optional[int] = None,
        logging: bool = True,
        save: bool = True,
    ) -> Dict[str, Any]:
        """Recursive rollouts + per-step MSE (reference :334-390)."""
        # honor model.inference_quant (int8 W8A8 rollouts, nn/quant.py)
        tstate = tstate.replace(model=self.model.inference_state(tstate.model))
        all_mse: List[np.ndarray] = []
        rollouts: List[Dict[str, np.ndarray]] = []
        for idx, traj in enumerate(trajectories):
            if n_rollouts is not None and idx >= n_rollouts:
                break
            traj = self._prepare(traj)
            topo = self._topology(traj)
            freqs = self.expansion.frequencies if self.expansion else []
            if any(f > 1 for f in freqs):
                ops, mse = self._segmented_rollout(tstate, traj, topo, num_steps)
            else:
                if self.expansion is not None:
                    self.expansion.reset(0, traj["cells"].shape[0])
                    frame0 = {k: v[0] for k, v in traj.items()}
                    self.expansion.prepare(self.model, frame0, topo)
                ops, mse = self.model.rollout(
                    tstate.model, topo, traj, num_steps=num_steps,
                    expansion=self.expansion,
                )
            all_mse.append(np.asarray(mse))
            rollouts.append({k: np.asarray(v) for k, v in ops.items()})
        mean_curve = np.mean(np.stack(all_mse), axis=0) if all_mse else np.zeros(0)
        eval_metrics = self.model.pop_eval_metrics()
        result = {
            "rollout_loss": float(mean_curve.mean()) if len(mean_curve) else float("nan"),
            "rollout_loss_last": float(mean_curve[-1]) if len(mean_curve) else float("nan"),
            "rollouts": rollouts,
            "mse_curve": mean_curve,
            **eval_metrics,
        }
        if save:
            self.save_rollouts(rollouts)
        if logging and self.logger:
            self.logger.log(
                {"rollout_loss": result["rollout_loss"], **eval_metrics},
                commit=False,
            )
            self.logger.log_table(
                "rollout_losses",
                list(enumerate(mean_curve.tolist())),
                ["step", "mse"],
            )
        return result

    def _segmented_rollout(self, tstate, traj, topo, num_steps):
        """Rollout with mid-rollout reclustering (expansion frequency > 1).

        The reference reclusters during rollouts at the reset cadence using
        the *predicted* state (reference flag.py:229-246 with reset in
        expand_graph).  The scan splits at reset boundaries; between
        segments the carried predicted state goes to host, the expansion
        reclusters on it, and the next segment resumes from the carry.
        """
        T = traj["cells"].shape[0]
        T = T if num_steps is None else min(num_steps, T)
        boundaries = sorted(
            {
                i
                for f in self.expansion.frequencies
                for i in range(T)
                if reset_due(i, T, f)
            }
        ) or [0]
        preds, mses = [], []
        carry = None
        ops = None
        for bi, s0 in enumerate(boundaries):
            s1 = boundaries[bi + 1] if bi + 1 < len(boundaries) else T
            sub = {k: v[s0:s1] for k, v in traj.items()}
            # recluster on the current (predicted) state
            frame0 = {k: np.asarray(v[0]) for k, v in sub.items()}
            if carry is not None:
                frame0.update(
                    {
                        k: np.asarray(v)
                        for k, v in self.model.carry_to_frame(carry).items()
                    }
                )
            self.expansion.reset(s0, T)
            self.expansion.prepare(self.model, frame0, topo)
            ops, mse, carry = self.model.rollout(
                tstate.model, topo, sub, num_steps=s1 - s0,
                expansion=self.expansion, start_carry=carry, return_carry=True,
            )
            preds.append(
                np.asarray(ops["pred_pos" if "pred_pos" in ops else "pred_velocity"])
            )
            mses.append(np.asarray(mse))
        pred = np.concatenate(preds, axis=0)
        ops = dict(ops)
        ops["pred_pos" if "pred_pos" in ops else "pred_velocity"] = pred
        ops["mesh_pos"] = traj["mesh_pos"]
        ops["faces"] = traj["cells"]
        gt_key = "gt_pos" if "gt_pos" in ops else "gt_velocity"
        ops[gt_key] = traj["world_pos" if gt_key == "gt_pos" else "velocity"][:T]
        return ops, np.concatenate(mses)

    def n_step_evaluator(
        self,
        tstate: TrainState,
        trajectories: Iterable[Dict[str, np.ndarray]],
        n_step: int = 60,
        n_trajectories: Optional[int] = None,
        num_timesteps: Optional[int] = None,
        logging: bool = True,
    ) -> Dict[str, float]:
        """Sliding n-step losses (reference :392-436), vmapped windows."""
        tstate = tstate.replace(model=self.model.inference_state(tstate.model))
        means: List[float] = []
        lasts: List[float] = []
        for idx, traj in enumerate(trajectories):
            if n_trajectories is not None and idx >= n_trajectories:
                break
            traj = self._prepare(traj)
            topo = self._topology(traj)
            if self.expansion is not None:
                self.expansion.reset(0, traj["cells"].shape[0])
                frame0 = {k: v[0] for k, v in traj.items()}
                self.expansion.prepare(self.model, frame0, topo)
            T = traj["cells"].shape[0]
            nt = min(num_timesteps or T, T)
            n = min(n_step, nt - 1)
            mean, last = self.model.n_step_computation(
                tstate.model, topo, traj, n_step=n, num_timesteps=nt,
                expansion=self.expansion,
            )
            means.append(float(mean))
            lasts.append(float(last))
        result = {
            "n_step_loss": float(np.mean(means)) if means else float("nan"),
            "n_step_last_loss": float(np.mean(lasts)) if lasts else float("nan"),
            **self.model.pop_eval_metrics(),
        }
        if logging and self.logger:
            self.logger.log(result, commit=False)
        return result

    # ------------------------------------------------------------------
    def save_rollouts(self, rollouts: List[Dict[str, np.ndarray]]) -> str:
        """Pickle rollout trajectories (reference :495-509) and record them
        in the artifact manifest (reference wandb.Artifact, :452-457)."""
        path = os.path.join(self.out_dir, "rollouts.pkl")
        with open(path, "wb") as f:
            pickle.dump(rollouts, f)
        if self.logger:
            self.logger.log_artifact("rollouts", path, kind="dataset")
        return path

    def visualize_clusters(self, out_path: str) -> Optional[str]:
        """Render the current cluster assignment of each RMP member to PNG.

        Parity with the reference's per-trajectory cluster visualization
        (reference remote_message_passing.py:146-150 wandb Object3D;
        abstract_clustering_algorithm.py:87-91) as a local artifact.
        Returns the path of the first rendered image, or None when no RMP
        member has clustered yet.
        """
        if self.expansion is None:
            return None
        first = None
        for member in self.expansion.members:
            viz = getattr(member, "visualize_cluster", None)
            coords = getattr(member, "last_coordinates", None)
            if viz is None or coords is None:
                continue
            out = viz(coords, out_path=out_path)
            if out and self.logger:
                self.logger.log_artifact("cluster_viz", out, kind="image")
            first = first or out
        return first
