"""FlagModel: cloth simulation with 2nd-order integration.

Parity with reference src/model/flag.py:17-260:
- node features: velocity (world_pos - prev|world_pos) ++ one-hot(type != NORMAL)  (flag.py:65-74)
- mesh-edge features: [rel_world, |rel_world|, rel_mesh, |rel_mesh|]  (flag.py:81-92)
- node_dynamic: normalized (max - min) of incident |rel_world| per receiver (flag.py:101-116);
  NB the reference always accumulates this normalizer (no is_training gate) — preserved.
- output: acceleration; integration ``pos = 2*cur + acc - prev``  (flag.py:170-181)
- loss mask: NORMAL nodes  (flag.py:146-154)

TPU-native: per-frame featurization is a pure function vmapped over the
batch; normalizer accumulation happens once per batch at the [B*N] level
(equivalent to the reference's block-diagonal batch, MeshSimulator.py:158-234);
rollout is a ``lax.scan`` with static topology.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.core import normalizer as norm
from hyper_graph_nets_tpu.core import segment_ops
from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph, NodeType
from hyper_graph_nets_tpu.models.base import (
    ModelState,
    SystemModel,
    Topology,
    norm_feature,
)

Array = jax.Array


def _opt_arr(x):
    return None if x is None else jnp.asarray(x)


class FlagModel(SystemModel):
    model_type = "flag"
    world_dim = 3
    mesh_dim = 2

    def geometry(self, frames):
        return frames["world_pos"], frames["mesh_pos"]

    def carry_to_frame(self, carry):
        """Rollout carry -> frame fields (segmented rollouts)."""
        return {"prev|world_pos": carry[0], "world_pos": carry[1]}

    def mesh_edge_features(self, frames, senders: Array, receivers: Array) -> Array:
        """Mesh-edge featurization for arbitrary (snd, rcv) pairs (balancer)."""
        world, mesh = self.geometry(frames)
        rel_w = jnp.take(world, senders, axis=-2) - jnp.take(world, receivers, axis=-2)
        rel_m = jnp.take(mesh, senders, axis=-2) - jnp.take(mesh, receivers, axis=-2)
        from hyper_graph_nets_tpu.models.base import norm_feature

        return jnp.concatenate([norm_feature(rel_w), norm_feature(rel_m)], axis=-1)

    def node_in_dim(self) -> int:
        base = self.world_dim + 2  # velocity ++ one-hot(2)
        return base + 2 if self.architecture == "multi" else base

    def edge_in_dims(self) -> Tuple[Tuple[str, int], ...]:
        mesh_edge_dim = self.world_dim + 1 + self.mesh_dim + 1
        if self.architecture == "multi":
            # remote edge sets folded into mesh_edges with 4 one-hot tags
            return (("mesh_edges", mesh_edge_dim + 4),)
        dims = [("mesh_edges", mesh_edge_dim)]
        if self.use_balancer:
            dims.append(("balance", mesh_edge_dim))
        if self.use_rmp:
            # connector edge features: world(3)+norm ++ mesh(2)+norm = 7
            for name in (
                "intra_cluster_to_cluster",
                "intra_cluster_to_mesh",
                "inter_cluster",
            ):
                dims.append((name, mesh_edge_dim))
        return tuple(dims)

    def normalizer_schema(self) -> Dict[str, int]:
        mesh_edge_dim = self.world_dim + 1 + self.mesh_dim + 1
        schema = {
            "output": self.output_size,
            "node": self.world_dim + 2,  # raw dim (multi tier tags added later)
            "node_dynamic": 1,
            "mesh_edge": mesh_edge_dim,
        }
        if self.use_rmp:
            schema["intra_edge"] = mesh_edge_dim
            schema["inter_edge"] = mesh_edge_dim
            schema["hyper_node"] = 3
        return schema

    # ------------------------------------------------------------------
    def frame_features(
        self,
        senders: Array,
        receivers: Array,
        frame: Dict[str, Array],
        edge_mask: Optional[Array] = None,
        gather_idx: Optional[Array] = None,
        gather_valid: Optional[Array] = None,
    ) -> Dict[str, Array]:
        """Raw (unnormalized) per-frame features; pure, vmappable."""
        world_pos = frame["world_pos"]
        prev_world_pos = frame["prev|world_pos"]
        mesh_pos = frame["mesh_pos"]
        node_type = frame["node_type"]
        num_nodes = world_pos.shape[0]

        velocity = world_pos - prev_world_pos
        type_flag = jnp.not_equal(node_type[:, 0], 0).astype(jnp.int32)
        node_features = jnp.concatenate(
            [velocity, jax.nn.one_hot(type_flag, 2, dtype=world_pos.dtype)], axis=-1
        )

        rel_world = jnp.take(world_pos, senders, 0) - jnp.take(world_pos, receivers, 0)
        rel_mesh = jnp.take(mesh_pos, senders, 0) - jnp.take(mesh_pos, receivers, 0)
        edge_features = jnp.concatenate(
            [norm_feature(rel_world), norm_feature(rel_mesh)], axis=-1
        )

        speed = jnp.sqrt(jnp.sum(rel_world * rel_world, axis=-1, keepdims=True))
        if gather_idx is not None:
            dyn_max = segment_ops.gather_aggregate(
                speed, gather_idx, gather_valid, "max"
            )
            dyn_min = segment_ops.gather_aggregate(
                speed, gather_idx, gather_valid, "min"
            )
        else:
            dyn_max = segment_ops.segment_max(
                speed, receivers, num_nodes, mask=edge_mask
            )
            dyn_min = segment_ops.segment_min(
                speed, receivers, num_nodes, mask=edge_mask
            )
        return {
            "node_features": node_features,
            "mesh_edge_features": edge_features,
            "node_dynamic": dyn_max - dyn_min,
        }

    def make_graph(
        self,
        state: ModelState,
        topo: Topology,
        frames: Dict[str, Array],
        is_training: bool,
        batched: bool = True,
    ) -> Tuple[Graph, Dict[str, Array], ModelState]:
        """Build the (batched) input graph; returns (graph, raw aux, state).

        ``frames`` arrays have shape [B, N, ...] when ``batched`` else [N, ...].
        """
        senders = jnp.asarray(topo.senders)
        receivers = jnp.asarray(topo.receivers)
        emask = topo.edge_mask()
        feat_fn = functools.partial(
            self.frame_features,
            senders,
            receivers,
            edge_mask=emask,
            gather_idx=_opt_arr(topo.gather_idx),
            gather_valid=_opt_arr(topo.gather_valid),
        )
        raw = (
            jax.vmap(lambda f: feat_fn(f))(frames) if batched else feat_fn(frames)
        )

        # padded (bucketed) nodes carry node_type < 0 and are excluded from
        # normalizer statistics (data/bucketing.py convention)
        node_valid = (frames["node_type"][..., 0] >= 0).astype(jnp.float32)
        node_feats, state = self._normalize(
            state, "node", raw["node_features"], accumulate=is_training,
            mask=node_valid,
        )
        batch_emask = (
            None if emask is None else topo.ones_mask(raw["mesh_edge_features"])
        )
        edge_feats, state = self._normalize(
            state,
            "mesh_edge",
            raw["mesh_edge_features"],
            accumulate=is_training,
            mask=batch_emask,
        )
        # reference quirk: node_dynamic normalizer always accumulates (flag.py:116)
        node_dyn, state = self._normalize(
            state, "node_dynamic", raw["node_dynamic"], accumulate=True,
            mask=node_valid,
        )

        graph = Graph(
            node_features=node_feats,
            edge_sets={
                "mesh_edges": EdgeSet(
                    features=edge_feats,
                    senders=senders,
                    receivers=receivers,
                    mask=batch_emask,
                    gather_idx=_opt_arr(topo.gather_idx),
                    gather_valid=_opt_arr(topo.gather_valid),
                    snd_gather_idx=_opt_arr(topo.snd_gather_idx),
                    snd_gather_valid=_opt_arr(topo.snd_gather_valid),
                    band_plan=topo.band_plan,
                )
            },
        )
        aux = {
            "node_dynamic": node_dyn,
            "mesh_edge_features_raw": raw["mesh_edge_features"],
        }
        return graph, aux, state

    # ------------------------------------------------------------------
    def get_target(
        self, state: ModelState, frames: Dict[str, Array], is_training: bool = True
    ) -> Tuple[Array, ModelState]:
        """Normalized target acceleration (flag.py:183-191)."""
        cur = frames["world_pos"]
        prev = frames["prev|world_pos"]
        target = frames["target|world_pos"]
        target_acceleration = target - 2 * cur + prev
        return self._normalize(
            state, "output", target_acceleration, accumulate=is_training
        )

    def update(self, state: ModelState, frames: Dict[str, Array], net_out: Array) -> Array:
        """Integrate: pos = 2*cur + acc - prev (flag.py:170-181)."""
        acceleration = norm.inverse(state.normalizers["output"], net_out)
        return 2 * frames["world_pos"] + acceleration - frames["prev|world_pos"]

    # ------------------------------------------------------------------
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
        """Recursive rollout via lax.scan (reference flag.py:194-246).

        ``start_carry``/``return_carry`` support segmented rollouts with
        mid-rollout reclustering (simulator.rollout_evaluator at
        rmp frequency > 1): the carry is (prev_pos, cur_pos).

        Returns (traj_ops, per-step MSE). Boundary (non-NORMAL) nodes hold
        their positions, matching ``torch.where(mask, pred, cur)``.
        """
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
                node_type = init["node_type"]
                mask = jnp.equal(node_type[:, 0], NodeType.NORMAL)[:, None]
                static_frame = {
                    "mesh_pos": init["mesh_pos"],
                    "node_type": node_type,
                }

                def step(carry, _):
                    prev_pos, cur_pos = carry
                    frame = {
                        **static_frame,
                        "world_pos": cur_pos,
                        "prev|world_pos": prev_pos,
                    }
                    graph, _, _ = self.make_graph(
                        state, topo, frame, False, batched=False
                    )
                    if expansion is not None:
                        graph, _ = expansion.expand(
                            state, graph, frame, self,
                            is_training=False, static=static,
                        )
                    prediction = self.update(
                        state, frame, self.forward(state, graph)
                    )
                    next_pos = jnp.where(mask, prediction, cur_pos)
                    return (cur_pos, next_pos), cur_pos

                carry = (init["prev|world_pos"], init["world_pos"])
                carry, pred = jax.lax.scan(step, carry, None, length=num_steps)
                mse = jnp.mean(jnp.square(gt - pred), axis=(-2, -1))
                return pred, mse, carry

            return core

        fn = self._cached_jit(cache_key, build)
        init = {
            k: jnp.asarray(v[0]) for k, v in trajectory.items() if k != "cells"
        }
        if start_carry is not None:
            init = {
                **init,
                "prev|world_pos": start_carry[0],
                "world_pos": start_carry[1],
            }
        gt = jnp.asarray(trajectory["world_pos"][:num_steps])
        pred, mse, carry = fn(state, init, gt, static)
        traj_ops = {
            "faces": trajectory["cells"],
            "mesh_pos": trajectory["mesh_pos"],
            "gt_pos": trajectory["world_pos"],
            "pred_pos": pred,
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
        """Sliding-window n-step losses (reference flag.py:249-260).

        TPU-native: windows rollout in parallel under vmap, in bounded
        chunks (base._n_step_chunked) so real trajectory lengths
        (T=399, n=60 -> 339 windows) fit memory and compile time.
        """
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
            def core(state, static_frame_in, prev0, cur0, gt, static):
                node_type = static_frame_in["node_type"]
                mask = jnp.equal(node_type[:, 0], NodeType.NORMAL)[:, None]

                def one_window(prev_pos, cur_pos, gt_win):
                    def step(carry, _):
                        prev_p, cur_p = carry
                        frame = {
                            **static_frame_in,
                            "world_pos": cur_p,
                            "prev|world_pos": prev_p,
                        }
                        graph, _, _ = self.make_graph(
                            state, topo, frame, False, batched=False
                        )
                        if expansion is not None:
                            graph, _ = expansion.expand(
                                state, graph, frame, self,
                                is_training=False, static=static,
                            )
                        prediction = self.update(
                            state, frame, self.forward(state, graph)
                        )
                        next_pos = jnp.where(mask, prediction, cur_p)
                        return (cur_p, next_pos), cur_p

                    _, pred = jax.lax.scan(
                        step, (prev_pos, cur_pos), None, length=n_step + 1
                    )
                    return jnp.mean(jnp.square(gt_win - pred), axis=(-2, -1))

                return jax.vmap(one_window)(prev0, cur0, gt)  # [chunk, n+1]

            return core

        fn = self._cached_jit(cache_key, build)
        static_frame = {
            "mesh_pos": jnp.asarray(trajectory["mesh_pos"][0]),
            "node_type": jnp.asarray(trajectory["node_type"][0]),
        }

        def chunk_inputs(idx):
            prev0 = jnp.asarray(trajectory["prev|world_pos"][idx])
            cur0 = jnp.asarray(trajectory["world_pos"][idx])
            gt = jnp.asarray(
                np.stack([trajectory["world_pos"][s : s + n_step + 1] for s in idx])
            )  # [chunk, n+1, N, 3]
            return state, static_frame, prev0, cur0, gt, static

        return self._n_step_chunked(fn, starts, chunk_inputs, chunk)
