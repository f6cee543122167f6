"""CylinderModel: Eulerian fluid dynamics (cylinder_flow dataset).

Parity with reference src/model/cylinder.py:17-245:
- node-type compaction 4->1, 5->2, 6->3 before one-hot(4)  (cylinder.py:70-75)
- node features: velocity(2) ++ one-hot(4)  -> node normalizer size 6
- mesh-edge features: [rel_mesh, |rel_mesh|] -> size 3  (cylinder.py:82-87)
- output: (delta velocity(2), pressure(1)); update: vel += dv  (cylinder.py:156-165)
- target: [target_vel - vel, pressure]; pressure target is the *current*
  frame's pressure, a reference quirk preserved (cylinder.py:167-173)
- loss mask: NORMAL or OUTFLOW  (cylinder.py:128-133)
- rollout keeps the predicted pressure trajectory  (cylinder.py:175-231)
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.core import normalizer as norm
from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph, NodeType
from hyper_graph_nets_tpu.models.base import (
    ModelState,
    SystemModel,
    Topology,
    norm_feature,
)

Array = jax.Array


class CylinderModel(SystemModel):
    model_type = "cylinder"
    world_dim = 2  # velocity field
    mesh_dim = 2

    def geometry(self, frames):
        return frames["velocity"], frames["mesh_pos"]

    def carry_to_frame(self, carry):
        return {"velocity": carry[0], "pressure": carry[1]}

    def mesh_edge_features(self, frames, senders: Array, receivers: Array) -> Array:
        mesh = frames["mesh_pos"]
        rel = jnp.take(mesh, senders, axis=-2) - jnp.take(mesh, receivers, axis=-2)
        return norm_feature(rel)

    def node_in_dim(self) -> int:
        return 2 + 4  # velocity ++ compacted one-hot

    def edge_in_dims(self) -> Tuple[Tuple[str, int], ...]:
        if self.architecture == "multi":
            raise NotImplementedError(
                "multigraph connector needs matching mesh/remote edge dims; "
                "cylinder mesh edges are 3-dim vs 7-dim remote features "
                "(unsupported in the reference as well)"
            )
        dims = [("mesh_edges", self.mesh_dim + 1)]
        if self.use_balancer:
            dims.append(("balance", self.mesh_dim + 1))
        if self.use_rmp and self.architecture != "multi":
            # connector features: world(2)+norm ++ mesh(2)+norm
            rmp_dim = self.world_dim + 1 + self.mesh_dim + 1
            for name in (
                "intra_cluster_to_cluster",
                "intra_cluster_to_mesh",
                "inter_cluster",
            ):
                dims.append((name, rmp_dim))
        return tuple(dims)

    def normalizer_schema(self) -> Dict[str, int]:
        schema = {
            "output": self.output_size,
            "node": self.node_in_dim(),
            "node_dynamic": 1,
            "mesh_edge": self.mesh_dim + 1,
        }
        if self.use_rmp:
            rmp_dim = self.world_dim + 1 + self.mesh_dim + 1
            schema["intra_edge"] = rmp_dim
            schema["inter_edge"] = rmp_dim
            schema["hyper_node"] = 3
        return schema

    @staticmethod
    def compact_node_type(node_type: Array) -> Array:
        codes = node_type[..., 0].astype(jnp.int32)
        codes = jnp.where(codes == 4, 1, codes)
        codes = jnp.where(codes == 5, 2, codes)
        codes = jnp.where(codes == 6, 3, codes)
        return codes

    def frame_features(
        self, senders: Array, receivers: Array, frame: Dict[str, Array]
    ) -> Dict[str, Array]:
        velocity = frame["velocity"]
        mesh_pos = frame["mesh_pos"]
        codes = self.compact_node_type(frame["node_type"])
        node_features = jnp.concatenate(
            [velocity, jax.nn.one_hot(codes, 4, dtype=velocity.dtype)], axis=-1
        )
        rel_mesh = jnp.take(mesh_pos, senders, 0) - jnp.take(mesh_pos, receivers, 0)
        return {
            "node_features": node_features,
            "mesh_edge_features": norm_feature(rel_mesh),
        }

    def make_graph(
        self,
        state: ModelState,
        topo: Topology,
        frames: Dict[str, Array],
        is_training: bool,
        batched: bool = True,
    ) -> Tuple[Graph, Dict[str, Array], ModelState]:
        senders = jnp.asarray(topo.senders)
        receivers = jnp.asarray(topo.receivers)
        feat_fn = functools.partial(self.frame_features, senders, receivers)
        raw = jax.vmap(feat_fn)(frames) if batched else feat_fn(frames)

        node_valid = (frames["node_type"][..., 0] >= 0).astype(jnp.float32)
        node_feats, state = self._normalize(
            state, "node", raw["node_features"], accumulate=is_training,
            mask=node_valid,
        )
        batch_emask = (
            None if topo.mask is None else topo.ones_mask(raw["mesh_edge_features"])
        )
        edge_feats, state = self._normalize(
            state,
            "mesh_edge",
            raw["mesh_edge_features"],
            accumulate=is_training,
            mask=batch_emask,
        )
        gi = None if topo.gather_idx is None else jnp.asarray(topo.gather_idx)
        gv = None if topo.gather_valid is None else jnp.asarray(topo.gather_valid)
        graph = Graph(
            node_features=node_feats,
            edge_sets={
                "mesh_edges": EdgeSet(
                    features=edge_feats,
                    senders=senders,
                    receivers=receivers,
                    mask=batch_emask,
                    gather_idx=gi,
                    gather_valid=gv,
                    snd_gather_idx=(
                        None
                        if topo.snd_gather_idx is None
                        else jnp.asarray(topo.snd_gather_idx)
                    ),
                    snd_gather_valid=(
                        None
                        if topo.snd_gather_valid is None
                        else jnp.asarray(topo.snd_gather_valid)
                    ),
                    band_plan=topo.band_plan,
                )
            },
        )
        return graph, {"mesh_edge_features_raw": raw["mesh_edge_features"]}, state

    def loss_mask(self, node_type: Array) -> Array:
        codes = node_type[..., 0]
        return jnp.logical_or(
            jnp.equal(codes, NodeType.NORMAL), jnp.equal(codes, NodeType.OUTFLOW)
        )

    def get_target(
        self, state: ModelState, frames: Dict[str, Array], is_training: bool = True
    ) -> Tuple[Array, ModelState]:
        dv = frames["target|velocity"] - frames["velocity"]
        target = jnp.concatenate([dv, frames["pressure"]], axis=-1)
        return self._normalize(state, "output", target, accumulate=is_training)

    def update(
        self, state: ModelState, frames: Dict[str, Array], net_out: Array
    ) -> Tuple[Array, Array]:
        out = norm.inverse(state.normalizers["output"], net_out)
        dv, pressure = out[..., :2], out[..., 2:]
        return frames["velocity"] + dv, pressure

    def rollout(
        self,
        state: ModelState,
        topo: Topology,
        trajectory: Dict[str, np.ndarray],
        num_steps: Optional[int] = None,
        expansion=None,
        start_carry=None,
        return_carry: bool = False,
    ) -> Tuple[Dict[str, Array], Array]:
        T = trajectory["cells"].shape[0]
        num_steps = T if num_steps is None else min(num_steps, T)
        static = expansion.static if expansion is not None else None
        cache_key = (
            "rollout",
            topo.senders.shape,
            topo.num_nodes,
            num_steps,
            self._expansion_key(expansion),
            self._static_shapes(static),
        )

        def build():
            def core(state, init, gt, static):
                mask = self.loss_mask(init["node_type"])[:, None]
                static_frame = {
                    "mesh_pos": init["mesh_pos"],
                    "node_type": init["node_type"],
                }

                def step(carry, _):
                    velocity, pressure = carry
                    frame = {
                        **static_frame, "velocity": velocity, "pressure": pressure
                    }
                    graph, _, _ = self.make_graph(
                        state, topo, frame, False, batched=False
                    )
                    if expansion is not None:
                        graph, _ = expansion.expand(
                            state, graph, frame, self,
                            is_training=False, static=static,
                        )
                    pred_v, pred_p = self.update(
                        state, frame, self.forward(state, graph)
                    )
                    next_v = jnp.where(mask, pred_v, velocity)
                    return (next_v, pred_p), (next_v, pred_p)

                carry = (init["velocity"], init["pressure"])
                carry, (pred_v, pred_p) = jax.lax.scan(
                    step, carry, None, length=num_steps
                )
                mse = jnp.mean(jnp.square(gt - pred_v), axis=(-2, -1))
                return pred_v, pred_p, mse, carry

            return core

        fn = self._cached_jit(cache_key, build)
        init = {
            k: jnp.asarray(v[0]) for k, v in trajectory.items() if k != "cells"
        }
        if start_carry is not None:
            init = {
                **init,
                "velocity": start_carry[0],
                "pressure": start_carry[1],
            }
        gt = jnp.asarray(trajectory["velocity"][:num_steps])
        pred_v, pred_p, mse, carry = fn(state, init, gt, static)
        traj_ops = {
            "faces": trajectory["cells"],
            "mesh_pos": trajectory["mesh_pos"],
            "gt_velocity": trajectory["velocity"],
            "gt_pressure": trajectory["pressure"],
            "pred_velocity": pred_v,
            "pred_pressure": pred_p,
        }
        if return_carry:
            return traj_ops, mse, carry
        return traj_ops, mse

    def n_step_computation(
        self,
        state: ModelState,
        topo: Topology,
        trajectory: Dict[str, np.ndarray],
        n_step: int,
        num_timesteps: Optional[int] = None,
        expansion=None,
    ) -> Tuple[Array, Array]:
        T = trajectory["cells"].shape[0] if num_timesteps is None else num_timesteps
        starts = np.arange(T - n_step)
        chunk = self.n_step_chunk_size(len(starts))
        static = expansion.static if expansion is not None else None
        cache_key = (
            "n_step",
            topo.senders.shape,
            topo.num_nodes,
            n_step,
            chunk,
            self._expansion_key(expansion),
            self._static_shapes(static),
        )

        def build():
            def core(state, static_frame, v0, p0, gt, static):
                mask = self.loss_mask(static_frame["node_type"])[:, None]

                def one_window(velocity, pressure, gt_win):
                    def step(carry, _):
                        v, p = carry
                        frame = {**static_frame, "velocity": v, "pressure": p}
                        graph, _, _ = self.make_graph(
                            state, topo, frame, False, batched=False
                        )
                        if expansion is not None:
                            graph, _ = expansion.expand(
                                state, graph, frame, self,
                                is_training=False, static=static,
                            )
                        pred_v, pred_p = self.update(
                            state, frame, self.forward(state, graph)
                        )
                        next_v = jnp.where(mask, pred_v, v)
                        return (next_v, pred_p), next_v

                    _, pred = jax.lax.scan(
                        step, (velocity, pressure), None, length=n_step + 1
                    )
                    return jnp.mean(jnp.square(gt_win - pred), axis=(-2, -1))

                return jax.vmap(one_window)(v0, p0, gt)  # [chunk, n+1]

            return core

        fn = self._cached_jit(cache_key, build)
        static_frame = {
            "mesh_pos": jnp.asarray(trajectory["mesh_pos"][0]),
            "node_type": jnp.asarray(trajectory["node_type"][0]),
        }

        def chunk_inputs(idx):
            v0 = jnp.asarray(trajectory["velocity"][idx])
            p0 = jnp.asarray(trajectory["pressure"][idx])
            gt = jnp.asarray(
                np.stack([trajectory["velocity"][s : s + n_step + 1] for s in idx])
            )
            return state, static_frame, v0, p0, gt, static

        return self._n_step_chunked(fn, starts, chunk_inputs, chunk)
