"""Pallas RDMA ring all-reduce (ops/pallas/ring.py) on the CPU test mesh.

The kernel runs in Pallas interpret mode here (remote DMA emulated across
the 8 virtual devices); on TPU slices the same kernel lowers to ICI RDMA.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from hyper_graph_nets_tpu.ops.pallas.ring import (
    ring_all_reduce_segments,
    ring_psum,
)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("graph",))


@pytest.fixture(autouse=True)
def _reset_interpret_state():
    """The TPU-interpret machinery keeps global device state (semaphores,
    vector clocks); reset between tests so rings of different sizes do not
    observe each other."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.reset_tpu_interpret_mode_state()
    jax.clear_caches()
    yield


def _assert_close_with_retry(compute, want, rtol, atol):
    """Pallas interpret mode emulates the RDMA semaphores with host
    threads; under CPU load (full-suite runs beside other processes) a
    rare scheduling race can corrupt one lap.  Retry once after a FULL
    interpret-state reset (a corrupted semaphore/vector-clock state would
    otherwise poison the second attempt too) — a deterministic kernel bug
    fails both attempts; the real-TPU path has no such emulation."""
    from jax.experimental.pallas import tpu as pltpu

    for attempt in range(2):
        got = np.asarray(compute())
        if np.allclose(got, want, rtol=rtol, atol=atol):
            break
        pltpu.reset_tpu_interpret_mode_state()
        jax.clear_caches()
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


class TestRingAllReduce:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_ring_psum_matches_psum(self, n_dev):
        mesh = _mesh(n_dev)
        x = jnp.asarray(
            np.random.RandomState(0).randn(n_dev * 4, 16).astype(np.float32)
        )

        ring = jax.shard_map(
            lambda v: ring_psum(v, "graph"),
            mesh=mesh, in_specs=P("graph"), out_specs=P("graph"),
            check_vma=False,
        )
        ref = jax.shard_map(
            lambda v: jax.lax.psum(v, "graph"),
            mesh=mesh, in_specs=P("graph"), out_specs=P("graph"),
            check_vma=False,
        )
        want = np.asarray(jax.jit(ref)(x))
        _assert_close_with_retry(
            lambda: jax.jit(ring)(x), want, rtol=1e-5, atol=1e-6
        )

    def test_segmented_combine_ops(self):
        """One ring pass with per-segment sum/max/min == three collectives."""
        mesh = _mesh(4)
        R, C = 6, 8
        x = jnp.asarray(np.random.RandomState(1).randn(4 * 3 * R, C).astype(np.float32))
        segments = [(0, R, "sum"), (R, 2 * R, "max"), (2 * R, 3 * R, "min")]

        def ring(v):
            return ring_all_reduce_segments(v, segments, "graph")

        def ref(v):
            return jnp.concatenate(
                [
                    jax.lax.psum(v[:R], "graph"),
                    jax.lax.pmax(v[R : 2 * R], "graph"),
                    jax.lax.pmin(v[2 * R :], "graph"),
                ],
                axis=0,
            )

        run = lambda f: np.asarray(
            jax.jit(
                jax.shard_map(
                    f, mesh=mesh, in_specs=P("graph"), out_specs=P("graph"),
                    check_vma=False,
                )
            )(x)
        )
        _assert_close_with_retry(
            lambda: run(ring), run(ref), rtol=1e-5, atol=1e-6
        )


class TestRingHaloForward:
    def test_ring_halo_forward_matches_single_device(self):
        """Full network forward with ring-combined aggregations == plain."""
        from hyper_graph_nets_tpu.data import synthetic
        from hyper_graph_nets_tpu.data.preprocessing import add_targets
        from hyper_graph_nets_tpu.models.flag import FlagModel
        from hyper_graph_nets_tpu.parallel import halo, sharding
        from hyper_graph_nets_tpu.training.trainer import Trainer

        params = {
            "task": {"dataset": "flag_minimal"},
            "model": {
                "field": "world_pos", "history": True, "size": 3,
                "noise": 0.003, "gamma": 0.9, "aggregation": "pna",
                "learning_rate": 1e-3, "message_passing_steps": 2,
                "rmp": {"clustering": "none", "connector": "none"},
                "graph_balancer": {"algorithm": "none"},
            },
        }
        traj = add_targets(
            synthetic.flag_trajectory(num_steps=8, nx=6, ny=6), "world_pos", True
        )
        model = FlagModel(params)
        topo = model.topology_from_trajectory(traj)
        tstate = Trainer(model, params).init_train_state(jax.random.PRNGKey(0))
        mesh = sharding.make_mesh(data=1, graph=4)
        stopo = sharding.shard_topology(topo, mesh)
        frame = {k: jnp.asarray(v[0]) for k, v in traj.items() if k != "cells"}
        graph, _, _ = model.make_graph(tstate.model, stopo, frame, False, batched=False)

        fwd = halo.make_halo_forward(model, mesh, ring=True)

        graph_u, _, _ = model.make_graph(tstate.model, topo, frame, False, batched=False)
        out_ref = np.asarray(model.forward(tstate.model, graph_u))
        _assert_close_with_retry(
            lambda: fwd(tstate.model.params, graph), out_ref,
            rtol=1e-4, atol=1e-5,
        )
