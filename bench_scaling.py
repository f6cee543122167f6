"""Scaling-efficiency harness: edges/s across device-mesh sizes.

BASELINE.json asks for edges/s scaling efficiency at 1 chip / 1 host /
N hosts.  This harness measures the SPMD train step over every mesh size the
current process can build (1, 2, 4, ... devices; data x graph splits) and
prints one JSON line per configuration plus an efficiency summary relative
to 1 device.

On the single-chip CI environment it degrades to the 1-device row; on a
multi-chip host or pod slice (launch/tpu_pod_train.sh) it produces the full
curve.  Efficiency = (edges/s at N devices) / (N * edges/s at 1 device).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

MP_STEPS = 15
GRID = 40
BATCH_PER_DEVICE = 8


def measure(mesh_data: int, mesh_graph: int) -> dict:
    from hyper_graph_nets_tpu.data import synthetic
    from hyper_graph_nets_tpu.data.preprocessing import add_targets
    from hyper_graph_nets_tpu.models.flag import FlagModel
    from hyper_graph_nets_tpu.parallel import sharding
    from hyper_graph_nets_tpu.training.trainer import Trainer

    params = {
        "task": {"dataset": "flag_simple"},
        "model": {
            "field": "world_pos",
            "history": True,
            "size": 3,
            "noise": 0.003,
            "gamma": 0.9,
            "aggregation": "pna",
            "learning_rate": 1e-4,
            "message_passing_steps": MP_STEPS,
            "compute_dtype": "bfloat16",
            "scan_unroll": MP_STEPS,
            "rmp": {"clustering": "none", "connector": "none"},
            "graph_balancer": {"algorithm": "none"},
        },
    }
    batch = BATCH_PER_DEVICE * mesh_data
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=batch + 3, nx=GRID, ny=GRID),
        "world_pos",
        history=True,
    )
    model = FlagModel(params)
    topo = model.topology_from_trajectory(traj)
    trainer = Trainer(model, params)
    tstate = trainer.init_train_state(jax.random.PRNGKey(0))

    mesh = sharding.make_mesh(data=mesh_data, graph=mesh_graph)
    sharded_topo = sharding.shard_topology(topo, mesh)
    step = sharding.make_spmd_train_step(trainer, sharded_topo, mesh)
    tstate = sharding.replicate(tstate, mesh)
    frames = sharding.shard_frames(
        {k: jnp.asarray(v[:batch]) for k, v in traj.items() if k != "cells"}, mesh
    )

    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        tstate, loss = step(tstate, frames, k)
    float(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        tstate, loss = step(tstate, frames, k)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    num_edges = len(np.asarray(sharded_topo.senders))
    return {
        "devices": mesh_data * mesh_graph,
        "mesh": f"{mesh_data}x{mesh_graph}",
        "batch": batch,
        "ms_per_step": round(dt * 1e3, 1),
        "edges_per_s": round(batch * num_edges / dt, 1),
    }


def main():
    n = len(jax.devices())
    configs = [(1, 1)]
    d = 2
    while d <= n:
        configs.append((d // 2 if d > 2 else 1, 2 if d == 2 else d // (d // 2)))
        d *= 2
    # canonical splits: pure-data and balanced data x graph
    seen = set()
    rows = []
    for data in (1, 2, 4, 8):
        for graph in (1, 2, 4, 8):
            nd = data * graph
            if nd > n or nd in seen and (data, graph) != (1, 1):
                continue
            if nd != 1 and nd not in (2, 4, 8, 16, 32):
                continue
            try:
                rows.append(measure(data, graph))
                seen.add(nd)
            except Exception as e:
                rows.append(
                    {"devices": nd, "mesh": f"{data}x{graph}", "error": str(e)[:120]}
                )
    base = next((r for r in rows if r.get("devices") == 1 and "edges_per_s" in r), None)
    for r in rows:
        # make single-chip runs unmistakable downstream: this row is NOT a
        # multi-chip scaling result unless devices_attached > 1
        r["devices_attached"] = n
        if base and "edges_per_s" in r:
            r["scaling_efficiency"] = round(
                r["edges_per_s"] / (r["devices"] * base["edges_per_s"]), 3
            )
        print(json.dumps(r))


if __name__ == "__main__":
    main()
