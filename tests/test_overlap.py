"""Compute-overlapped halo exchange (ops/pallas/fused_overlap.py).

Interpret-mode validation on the virtual CPU mesh: the single kernel that
fuses the chunked compute grid with the banded double-buffered RDMA ring
must reproduce the separate-pass collective exactly, and its host-built
schedule must actually start bands BEFORE the local compute grid finishes
(that is the overlap).  NB: rings over every virtual device of the process
can stall in the emulator (fused_overlap.py docstring), so meshes here
always leave spare devices; real-TPU rings have no such constraint.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hyper_graph_nets_tpu.ops.pallas.fused_block import (
    band_plan_specs,
    build_sharded_band_plans,
    fused_edge_block_collective,
)
from hyper_graph_nets_tpu.ops.pallas.fused_overlap import (
    band_dims,
    build_overlap_schedule,
    fused_edge_block_collective_overlap,
)


def _problem(S, E_per=64, N=96, L=128, seed=0, chunk=32, bands=4):
    rng = np.random.RandomState(seed)
    E = E_per * S
    rcv = np.sort(rng.randint(0, N, E))
    snd = np.clip(rcv + rng.randint(-8, 9, E), 0, N - 1)
    ev = E - 8
    rcv[ev:] = N - 1
    snd[ev:] = N - 1
    plan = build_sharded_band_plans(
        snd, rcv, N, S, num_valid=ev, chunk=chunk, overlap_bands=bands
    )
    e = rng.randn(E, L).astype(np.float32)
    sp = rng.randn(N, L).astype(np.float32)
    rp = rng.randn(N, L).astype(np.float32)
    w = {k: (rng.randn(L, L) * 0.1).astype(np.float32) for k in ("we", "w2", "w3")}
    w.update(
        {k: (rng.randn(L) * 0.1).astype(np.float32) for k in ("b1", "b2", "b3", "lnb")}
    )
    w["lns"] = (rng.randn(L) * 0.1 + 1).astype(np.float32)
    return plan, e, sp, rp, w, N


def _run(fn, mesh, plan, e, sp, rp, w, N, mesh_axes=()):
    specs = band_plan_specs(P, plan)

    def body(e_l, sp_l, rp_l, w_l, p_l):
        kw = {"mesh_axes": mesh_axes} if mesh_axes else {}
        return fn(e_l, sp_l, rp_l, w_l, p_l, N, "graph", **kw)

    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("graph"), P(), P(), P(), specs),
        out_specs=(P("graph"), P()),
        check_vma=False,
    )
    e2, agg = jax.jit(sm)(e, sp, rp, w, plan)
    return np.asarray(e2), np.asarray(agg)


class TestOverlapKernel:
    @pytest.mark.parametrize("S", [2, 3, 4, 6])
    def test_matches_separate_pass_collective(self, S):
        """One-kernel overlap == separate-pass psum/pmax/pmin, exactly."""
        plan, e, sp, rp, w, N = _problem(S)
        mesh = Mesh(np.asarray(jax.devices()[:S]), ("graph",))
        e2_ref, agg_ref = _run(
            fused_edge_block_collective, mesh, plan, e, sp, rp, w, N
        )
        e2_ov, agg_ov = _run(
            fused_edge_block_collective_overlap, mesh, plan, e, sp, rp, w, N
        )
        np.testing.assert_array_equal(e2_ov, e2_ref)
        np.testing.assert_allclose(agg_ov, agg_ref, rtol=1e-6, atol=1e-6)

    def test_2d_mesh_ring_stays_on_graph_axis(self):
        """(2, 3) mesh: each data row runs its own ring; the logical
        device-id math (mesh_axes) must keep the data coordinate fixed."""
        S = 3
        plan, e, sp, rp, w, N = _problem(S)
        mesh = Mesh(
            np.asarray(jax.devices()[: 2 * S]).reshape(2, S),
            ("data", "graph"),
        )
        ma = tuple((a, mesh.shape[a]) for a in mesh.axis_names)
        e2_ref, agg_ref = _run(
            fused_edge_block_collective, mesh, plan, e, sp, rp, w, N
        )
        e2_ov, agg_ov = _run(
            fused_edge_block_collective_overlap, mesh, plan, e, sp, rp, w, N,
            mesh_axes=ma,
        )
        np.testing.assert_array_equal(e2_ov, e2_ref)
        np.testing.assert_allclose(agg_ov, agg_ref, rtol=1e-6, atol=1e-6)

    def test_schedule_overlaps_compute(self):
        """The point of the kernel: with the chunk-round-robin edge layout
        (every shard walks the whole receiver range), early bands' ring
        transfers start while later chunks are still computing
        (sched[0] well below C-1)."""
        from hyper_graph_nets_tpu.ops.pallas.fused_overlap import (
            chunk_roundrobin_permutation,
        )

        S, chunk = 4, 64
        rng = np.random.RandomState(0)
        N, E = 1024, 4 * 1024
        rcv = np.sort(rng.randint(0, N, E))
        snd = np.clip(rcv + rng.randint(-8, 9, E), 0, N - 1)
        ev = E - 100
        rcv[ev:] = N - 1
        snd[ev:] = N - 1
        mask = np.zeros(E, np.float32)
        mask[:ev] = 1.0
        perm = chunk_roundrobin_permutation(E, S, chunk)
        snd, rcv, mask = snd[perm], rcv[perm], mask[perm]
        snv = mask.reshape(S, -1).sum(axis=1).astype(np.int64).tolist()
        plan = build_sharded_band_plans(
            snd, rcv, N, S, num_valid=ev, chunk=chunk,
            overlap_bands=4, shard_num_valid=snv,
        )
        sched = np.asarray(plan.ov_sched)[0]
        C_local = plan.snd_col.shape[0] // S
        assert sched.shape[0] >= 2
        # real overlap: the first band's ring starts in the first half of
        # the compute grid; bands complete progressively
        assert sched[0] < C_local // 2, (sched, C_local)
        assert (np.diff(sched) >= 0).all()
        assert sched[-1] <= C_local - 1

    def test_schedule_is_max_over_shards(self):
        """Every device must run the same schedule (acyclic semaphores)."""
        S = 4
        rng = np.random.RandomState(1)
        N, E = 64, 256
        rcv = np.sort(rng.randint(0, N, E))
        snd = np.clip(rcv + rng.randint(-4, 5, E), 0, N - 1)
        from hyper_graph_nets_tpu.ops.pallas.fused_block import build_band_plan

        per = E // S
        first = [
            build_band_plan(
                snd[i * per : (i + 1) * per],
                rcv[i * per : (i + 1) * per],
                N,
                chunk=32,
            )
            for i in range(S)
        ]
        dims = (
            max(p.W for p in first),
            max(p.WR for p in first),
            max(p.scan_steps for p in first),
            max(p.nr_tag.shape[0] for p in first),
        )
        plans = [
            build_band_plan(
                snd[i * per : (i + 1) * per],
                rcv[i * per : (i + 1) * per],
                N,
                chunk=32,
                force_dims=dims,
            )
            for i in range(S)
        ]
        sched = np.asarray(build_overlap_schedule(plans, N, S, n_bands=4))[0]
        nb, rb = band_dims(plans[0], N, 4)
        assert sched.shape[0] == nb
        # recompute a per-shard completion bound and check sched dominates
        for p in plans:
            r_lo = np.asarray(p.r_lo)[0]
            nonempty = np.asarray(p.m_col).reshape(p.C, -1).any(axis=1)
            for c in range(p.C):
                if not nonempty[c]:
                    continue
                b_lo = int(r_lo[c]) // rb
                b_hi = min((int(r_lo[c]) + p.WR - 1) // rb, nb - 1)
                assert (sched[b_lo : b_hi + 1] >= c).all()


class TestOverlapTraining:
    @pytest.mark.parametrize("data,graph", [(2, 3), (1, 6)])
    def test_spmd_train_step_overlap_matches_single_device(self, data, graph):
        """The compute-overlapped kernel on the sharded TRAINING path: with
        overlap_bands the GSPMD train step's forward runs the one-kernel
        compute+ring (chunk-round-robin edge shards), the backward stays
        the remat kernel + explicit psums — loss and post-step params must
        match the single-device fused step."""
        from hyper_graph_nets_tpu.data import synthetic
        from hyper_graph_nets_tpu.data.preprocessing import add_targets
        from hyper_graph_nets_tpu.models.flag import FlagModel
        from hyper_graph_nets_tpu.parallel import sharding
        from hyper_graph_nets_tpu.training.trainer import Trainer

        params = {
            "task": {"dataset": "flag_simple", "batch_size": 4},
            "model": {
                "field": "world_pos",
                "history": True,
                "size": 3,
                "noise": 0.003,
                "gamma": 0.1,
                "aggregation": "pna",
                "learning_rate": 1e-4,
                "message_passing_steps": 2,
                "agg_vjp": "fused",
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
            "random_seed": 0,
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=12, nx=6, ny=6),
            "world_pos", True,
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        assert topo.band_plan is not None
        trainer = Trainer(model, params)
        tstate = trainer.init_train_state(jax.random.PRNGKey(0))

        mesh = sharding.make_mesh(data=data, graph=graph)
        st = sharding.shard_topology(topo, mesh, overlap_bands=4)
        assert st.band_plan.ov_sched is not None
        frames = {k: jnp.asarray(v[:4]) for k, v in traj.items()}
        key = jax.random.PRNGKey(7)

        replicated = sharding.replicate(jax.tree.map(jnp.copy, tstate), mesh)
        step_spmd = sharding.make_spmd_train_step(trainer, st, mesh)
        ts2, loss2 = step_spmd(
            replicated, sharding.shard_frames(frames, mesh), key
        )

        step_single = trainer.make_train_step(topo)
        ts1, loss1 = step_single(tstate, frames, key)
        assert abs(float(loss1) - float(loss2)) < 1e-4
        for a, b in zip(
            jax.tree.leaves(ts1.model.params),
            jax.tree.leaves(ts2.model.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-3
            )


class TestOverlapHaloForward:
    def test_halo_forward_overlap_matches_single_device(self):
        """make_halo_forward(overlap=True) through a full FlagModel forward
        == the unsharded single-device forward."""
        from hyper_graph_nets_tpu.data import synthetic
        from hyper_graph_nets_tpu.data.preprocessing import add_targets
        from hyper_graph_nets_tpu.models.flag import FlagModel
        from hyper_graph_nets_tpu.parallel import halo, sharding
        from hyper_graph_nets_tpu.training.trainer import Trainer

        params = {
            "task": {"dataset": "flag_simple", "batch_size": 1},
            "model": {
                "field": "world_pos",
                "history": True,
                "size": 3,
                "noise": 0.003,
                "gamma": 0.1,
                "aggregation": "pna",
                "learning_rate": 1e-4,
                "message_passing_steps": 2,
                "agg_vjp": "fused",
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
            "random_seed": 0,
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=8, nx=6, ny=6),
            "world_pos", True,
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        assert topo.band_plan is not None
        trainer = Trainer(model, params)
        tstate = trainer.init_train_state(jax.random.PRNGKey(0))

        mesh = sharding.make_mesh(data=1, graph=4)
        stopo = sharding.shard_topology(
            topo, mesh, band_plans=True, overlap_bands=4
        )
        assert stopo.band_plan.ov_sched is not None
        frame = {k: jnp.asarray(v[0]) for k, v in traj.items() if k != "cells"}
        graph, _, _ = model.make_graph(
            tstate.model, stopo, frame, False, batched=False
        )
        fwd = halo.make_halo_forward(model, mesh, overlap=True)
        out_ov = np.asarray(fwd(tstate.model.params, graph))

        graph_u, _, _ = model.make_graph(
            tstate.model, topo, frame, False, batched=False
        )
        out_ref = np.asarray(model.forward(tstate.model, graph_u))
        np.testing.assert_allclose(out_ov, out_ref, rtol=1e-4, atol=2e-5)
