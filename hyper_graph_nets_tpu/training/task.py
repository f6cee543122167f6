"""MeshTask: the experiment loop (task layer).

Parity with reference src/tasks/MeshTask.py:26-393 + AbstractTask.py:12-69 +
get_task.py:11-17: per-epoch fit -> one-step eval -> rollout eval -> n-step
eval -> rollout GIF -> checkpoint -> epoch log; checkpoint resume from the
newest matching file; final ``get_scalars`` evaluation on the test split.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from hyper_graph_nets_tpu.data.loader import get_data, get_directories
from hyper_graph_nets_tpu.training import checkpoint
from hyper_graph_nets_tpu.training.simulator import MeshSimulator
from hyper_graph_nets_tpu.utils.config import get_from_nested_dict
from hyper_graph_nets_tpu.utils.metrics import MetricsLogger
from hyper_graph_nets_tpu.utils.viz import animate_rollout


class AbstractTask:
    def __init__(self, config: dict):
        self.config = config

    def run_iterations(self):
        raise NotImplementedError

    def get_scalars(self) -> Dict[str, float]:
        raise NotImplementedError


class MeshTask(AbstractTask):
    def __init__(self, config: dict, data_dir: Optional[str] = None):
        super().__init__(config)
        params = config.get("params", config)
        self.params = params
        task = params["task"]
        self.dataset = task["dataset"]
        self.epochs = task.get("epochs", 1)
        self.trajectories = task.get("trajectories", 1)
        self.n_timesteps = task.get("n_timesteps")
        self.test_cfg = task.get("test", {})
        self.valid_cfg = task.get("validation", {})
        self.rollout_split = task.get("rollout_split", "valid")
        _, out_dir = get_directories(self.dataset, data_dir)
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._data_dir = data_dir

        self.simulator = MeshSimulator(config, out_dir=out_dir)
        self.logger = MetricsLogger(out_dir, config)
        self.tstate = self.simulator.initialize(self.logger)
        self.start_epoch = 0
        self._setup_bucketing()

        # resume from newest checkpoint unless retrain (reference MeshTask.py:71-87)
        if not params.get("retrain", False):
            found = checkpoint.latest(out_dir, config)
            if found is not None:
                path, epoch = found
                self.tstate, epoch, _ = checkpoint.load(
                    path, template=self.tstate
                )
                self.start_epoch = epoch
                self.logger.log({"resumed_from_epoch": epoch}, commit=False)

    def _setup_bucketing(self) -> None:
        """Enable cross-trajectory padding when mesh sizes vary (bucketing.py).

        Scans the splits once (bounded by the configured trajectory counts)
        and caches the capacity next to the dataset.
        """
        import json

        from hyper_graph_nets_tpu.core.mesh import cells_to_edges
        from hyper_graph_nets_tpu.data.loader import get_directories

        in_dir, _ = get_directories(self.dataset, self._data_dir)
        cache = os.path.join(in_dir, "capacity.json")
        limits = {
            "train": self.trajectories,
            "valid": max(
                self.valid_cfg.get("trajectories", 1),
                self.valid_cfg.get("rollouts", 1),
            ),
            "test": max(
                self.test_cfg.get("trajectories", 1),
                self.test_cfg.get("rollouts", 1),
            ),
        }
        if os.path.exists(cache):
            with open(cache) as f:
                info = json.load(f)
        else:
            sizes = set()
            max_nodes = max_edges = 0
            for split, limit in limits.items():
                for i, traj in enumerate(
                    get_data(self.config, split, data_dir=self._data_dir)
                ):
                    if i >= limit:
                        break
                    n = traj["node_type"].shape[1]
                    sizes.add(n)
                    max_nodes = max(max_nodes, n)
                    cells = np.asarray(traj["cells"][0])
                    e = len(cells_to_edges(cells, deform=cells.shape[-1] == 4).senders)
                    max_edges = max(max_edges, e)
            info = {
                "variable": len(sizes) > 1,
                "max_nodes": max_nodes,
                "max_edges": max_edges,
            }
            try:
                with open(cache, "w") as f:
                    json.dump(info, f)
            except OSError:
                pass
        if info.get("variable"):
            # Scan with the simulator's own reorder (RCM relabeling changes
            # the windows the plans see).  Bounded by the same trajectory
            # limits as the capacity scan — a mesh outside the scanned set
            # with wider windows/capacities just costs one extra compile,
            # not a wrong result.
            scanned = []
            for split, limit in limits.items():
                for i, traj in enumerate(
                    get_data(self.config, split, data_dir=self._data_dir)
                ):
                    if i >= limit:
                        break
                    scanned.append(self.simulator._maybe_reorder(traj))
            plan_dims = None
            if self.config["model"].get("agg_vjp") == "fused":
                # pin one band-plan signature for the whole bucket so the
                # compiled step is reused across meshes (bucket_plan_dims)
                from hyper_graph_nets_tpu.data.bucketing import (
                    bucket_plan_dims,
                )

                plan_dims = bucket_plan_dims(
                    self.simulator.model, scanned,
                    info["max_nodes"], info["max_edges"],
                )
            self.simulator.set_capacity(
                info["max_nodes"], info["max_edges"], plan_dims=plan_dims,
                topo_extras=self.simulator.model.bucket_topology_extras(
                    scanned
                ),
            )

    def _train_data(self):
        return get_data(self.config, "train", data_dir=self._data_dir)

    def _valid_data(self):
        return get_data(self.config, "valid", data_dir=self._data_dir)

    def _test_data(self):
        return get_data(self.config, "test", data_dir=self._data_dir)

    def run_iterations(self) -> None:
        """Epoch loop (reference MeshTask.py:90-112)."""
        for epoch in range(self.start_epoch, self.epochs):
            t0 = time.time()
            for idx, traj in enumerate(self._train_data()):
                if idx >= self.trajectories:
                    break
                self.tstate, _ = self.simulator.fit_trajectory(
                    self.tstate, traj, epoch=epoch
                )

            self.simulator.one_step_evaluator(
                self.tstate,
                self._valid_data(),
                n_trajectories=self.valid_cfg.get("trajectories", 1),
            )
            rollout = self.simulator.rollout_evaluator(
                self.tstate,
                self._valid_data(),
                n_rollouts=self.valid_cfg.get("rollouts", 1),
                num_steps=self.n_timesteps,
            )
            self.simulator.n_step_evaluator(
                self.tstate,
                self._valid_data(),
                n_step=self.test_cfg.get("n_steps", 60),
                n_trajectories=self.test_cfg.get("n_step_rollouts", 1),
                num_timesteps=self.n_timesteps,
            )
            self.select_plotting(rollout, epoch)
            # cluster-assignment snapshot per epoch (reference logs 3D point
            # clouds per trajectory, abstract_clustering_algorithm.py:87-91)
            self.simulator.visualize_clusters(
                os.path.join(self.out_dir, f"cluster_epoch{epoch}.png")
            )
            checkpoint.save(self.out_dir, self.config, self.tstate, epoch + 1)
            self.logger.log({"epoch": epoch, "epoch_time": time.time() - t0})

    def select_plotting(self, rollout_result: Dict, epoch: int) -> Optional[str]:
        """Rollout GIFs per dataset family (reference MeshTask.py:131-149);
        renders up to ``validation.n_viz`` rollouts."""
        rollouts = rollout_result.get("rollouts", [])
        if not rollouts:
            return None
        n_viz = self.valid_cfg.get("n_viz", 1)
        first = None
        for i, ops in enumerate(rollouts[: max(1, n_viz)]):
            suffix = f"_{i}" if i else ""
            path = os.path.join(self.out_dir, f"rollout_epoch{epoch}{suffix}.gif")
            key = "pred_pos" if "pred_pos" in ops else "pred_velocity"
            out = animate_rollout(
                ops, self.simulator.model.model_type, path,
                stride=max(1, len(ops[key]) // 20),
            )
            if out:
                # GIF upload parity (reference MeshTask.py:107 wandb Video)
                self.logger.log_artifact(f"rollout_gif_epoch{epoch}", out, kind="image")
            first = first or out
        return first

    def get_scalars(self) -> Dict[str, float]:
        """Final test-split evaluation (reference MeshTask.py:114-129)."""
        one_step = self.simulator.one_step_evaluator(
            self.tstate,
            self._test_data(),
            n_trajectories=self.test_cfg.get("trajectories", 1),
            logging=False,
        )
        rollout = self.simulator.rollout_evaluator(
            self.tstate,
            self._test_data(),
            n_rollouts=self.test_cfg.get("rollouts", 1),
            num_steps=self.n_timesteps,
            logging=False,
            save=False,
        )
        n_step = self.simulator.n_step_evaluator(
            self.tstate,
            self._test_data(),
            n_step=self.test_cfg.get("n_steps", 60),
            n_trajectories=self.test_cfg.get("n_step_rollouts", 1),
            num_timesteps=self.n_timesteps,
            logging=False,
        )
        scalars = {
            "test_loss": one_step["validation_loss"],
            "test_position_error": one_step["position_error"],
            "test_rollout_loss": rollout["rollout_loss"],
            "test_n_step_loss": n_step["n_step_loss"],
        }
        # world-edge capacity truncation across all test evals (plate only;
        # nonzero = the static capacity dropped radius-query hits somewhere,
        # a deviation from the reference's uncapped dynamic query)
        trunc = sum(
            r.get("world_edge_truncated", 0) for r in (one_step, rollout, n_step)
        )
        if any("world_edge_truncated" in r for r in (one_step, rollout, n_step)):
            scalars["test_world_edge_truncated"] = float(trunc)
        return scalars


def get_task(config: dict, data_dir: Optional[str] = None) -> AbstractTask:
    """Task factory (reference get_task.py:11-17)."""
    params = config.get("params", config)
    name = get_from_nested_dict(params, ["task", "task"], default_return="mesh")
    if name == "mesh":
        return MeshTask(config, data_dir=data_dir)
    raise NotImplementedError(f"unknown task {name!r}")
