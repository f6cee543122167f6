"""Benchmark: training throughput (edges/s/chip) at flag_simple scale.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Setup mirrors BASELINE.json's north-star metric: MeshGraphNets with 15
message-passing layers on a flag_simple-scale cloth mesh (40x40 grid ->
1600 nodes, ~9.3k directed mesh edges), batch of frames per optimizer step
as in configs/flag.yaml (batch 21).  ``edges/s`` counts directed mesh edges
consumed per *training* step (forward + backward + optimizer):
    edges/s = batch * num_edges * steps_per_second.

``vs_baseline``: ratio against the PyTorch reference re-run on this host's
CPU (the only hardware here that can run the reference stack — BASELINE.md
notes the reference publishes no throughput numbers and its hardware is
unspecified).  The torch baseline is an independent re-implementation of the
reference's hot path (gather -> LazyMLP-equivalent -> scatter pna, reference
src/migration/graphnet.py:22-70) with identical tensor shapes and layer
counts; measured once and cached in .bench_cache.json.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# raise the compiler's scoped-VMEM limit before TPU init so the fused
# MP-block kernel can use 512-edge chunks (ops/pallas/fused_block
# .default_chunk) — measured ~5% faster than the 256-chunk fallback
os.environ.setdefault(
    "LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=32768"
)

MP_STEPS = 15
BATCH = 21
GRID = 40  # 40x40 = 1600 nodes, flag_simple scale
LATENT = 128
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json")


def _jax_throughput() -> dict:
    import jax
    import jax.numpy as jnp

    from hyper_graph_nets_tpu.data import synthetic
    from hyper_graph_nets_tpu.data.preprocessing import add_targets
    from hyper_graph_nets_tpu.models.flag import FlagModel
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
            "scan_unroll": MP_STEPS,  # full unroll: XLA fuses across blocks
            # fused Pallas MP-block kernel: gather+MLP+LN+pna in one VMEM
            # pass, fwd and bwd (ops/pallas/fused_block) — 104 -> 74 ms/step
            "agg_vjp": "fused",
            "rmp": {"clustering": "none", "connector": "none"},
            "graph_balancer": {"algorithm": "none"},
        },
    }
    traj = add_targets(
        synthetic.flag_trajectory(num_steps=BATCH + 3, nx=GRID, ny=GRID),
        "world_pos",
        history=True,
    )
    model = FlagModel(params)
    topo = model.build_topology(traj["cells"][0])
    trainer = Trainer(model, params)
    tstate = trainer.init_train_state(jax.random.PRNGKey(0))
    step = trainer.make_train_step(topo)
    frames = {k: jnp.asarray(v[:BATCH]) for k, v in traj.items()}
    key = jax.random.PRNGKey(1)

    # warmup / compile (value fetch forces a full device sync; plain
    # block_until_ready can return early on the experimental axon platform)
    for _ in range(3):
        key, k = jax.random.split(key)
        tstate, loss = step(tstate, frames, k)
    float(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        tstate, loss = step(tstate, frames, k)
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    num_edges = len(topo.senders)
    return {
        "steps_per_s": 1.0 / dt,
        "num_edges": num_edges,
        "edges_per_s": BATCH * num_edges / dt,
        "device": str(jax.devices()[0]),
        "final_loss": float(loss),
    }


def _torch_reference_throughput(num_edges_hint: int) -> float:
    """Reference-equivalent PyTorch MGN train step on CPU (edges/s).

    Independent implementation of the reference compute pattern:
    per-MP-step unshared edge/node MLPs, index_select gather, scatter-based
    pna aggregation, residuals, Adam — same shapes as the JAX benchmark.
    """
    import torch

    torch.manual_seed(0)
    n = GRID * GRID

    from hyper_graph_nets_tpu.data import synthetic
    from hyper_graph_nets_tpu.core.mesh import cells_to_edges

    traj = synthetic.flag_trajectory(num_steps=3, nx=GRID, ny=GRID)
    edges = cells_to_edges(traj["cells"][0])
    snd = torch.from_numpy(edges.senders.astype(np.int64))
    rcv = torch.from_numpy(edges.receivers.astype(np.int64))
    E = len(edges.senders)

    def mlp(in_dim, out_dim, ln=True):
        layers = [
            torch.nn.Linear(in_dim, LATENT),
            torch.nn.ReLU(),
            torch.nn.Linear(LATENT, LATENT),
            torch.nn.ReLU(),
            torch.nn.Linear(LATENT, out_dim),
        ]
        if ln:
            layers.append(torch.nn.LayerNorm(out_dim))
        return torch.nn.Sequential(*layers)

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.edge_mlp = mlp(3 * LATENT, LATENT)
            self.node_mlp = mlp(5 * LATENT, LATENT)

        def forward(self, nodes, edge_feats):
            ef = torch.cat(
                [nodes.index_select(0, snd), nodes.index_select(0, rcv), edge_feats],
                dim=-1,
            )
            edge_feats = edge_feats + self.edge_mlp(ef)
            aggs = []
            zeros = torch.zeros(n, LATENT)
            aggs.append(zeros.index_add(0, rcv, edge_feats))  # sum
            cnt = torch.zeros(n, 1).index_add(0, rcv, torch.ones(E, 1))
            aggs.append(aggs[0] / cnt.clamp(min=1))  # mean
            big = torch.full((n, LATENT), -1e30)
            aggs.append(big.index_reduce(0, rcv, edge_feats, "amax", include_self=True))
            small = torch.full((n, LATENT), 1e30)
            aggs.append(
                small.index_reduce(0, rcv, edge_feats, "amin", include_self=True)
            )
            nodes = nodes + self.node_mlp(torch.cat([nodes] + aggs, dim=-1))
            return nodes, edge_feats

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.node_enc = mlp(5, LATENT)
            self.edge_enc = mlp(7, LATENT)
            self.blocks = torch.nn.ModuleList([Block() for _ in range(MP_STEPS)])
            self.dec = mlp(LATENT, 3, ln=False)

        def forward(self, node_in, edge_in):
            nodes = self.node_enc(node_in)
            ef = self.edge_enc(edge_in)
            for b in self.blocks:
                nodes, ef = b(nodes, ef)
            return self.dec(nodes)

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    node_in = torch.randn(BATCH * n, 5)
    edge_in = torch.randn(BATCH * E, 7)
    # block-diagonal batch exactly like the reference (MeshSimulator.py:158-234)
    snd = torch.cat([snd + i * n for i in range(BATCH)])
    rcv = torch.cat([rcv + i * n for i in range(BATCH)])
    E, n_single = BATCH * E, n
    n = BATCH * n
    target = torch.randn(BATCH * n_single, 3)

    def step():
        opt.zero_grad()
        out = net(node_in, edge_in)
        loss = torch.nn.functional.mse_loss(out, target)
        loss.backward()
        opt.step()

    step()  # warmup
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return E / dt  # already batch-inclusive


def _hgn_plate_throughput() -> dict:
    """Secondary metric: HyperGraphNets deforming_plate training throughput.

    BASELINE.json's stated target is HGN deforming_plate training at >=5x
    edges/s/chip vs the reference: plate-scale quad mesh (~1.3k nodes) with
    in-jit world edges, spectral clustering + hierarchical connector, 5 MP
    steps (configs/plateCluster.yaml semantics).
    """
    import jax
    import jax.numpy as jnp

    from hyper_graph_nets_tpu.data import synthetic
    from hyper_graph_nets_tpu.data.preprocessing import add_targets
    from hyper_graph_nets_tpu.models.plate import PlateModel
    from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp
    from hyper_graph_nets_tpu.training.trainer import Trainer

    batch, mp = 16, 5
    params = {
        "task": {"dataset": "deforming_plate"},
        "model": {
            "field": "world_pos",
            "history": False,
            "size": 3,
            "noise": 0.003,
            "gamma": 0.9,
            "aggregation": "pna",
            "learning_rate": 1e-4,
            "message_passing_steps": mp,
            "compute_dtype": "bfloat16",
            "scan_unroll": mp,
            "max_world_edges": 1024,
            "agg_vjp": "fused",  # fused Pallas kernel on the mesh edge set
            "rmp": {
                "clustering": "spectral",
                "connector": "hyper",
                "num_clusters": 16,
                "hyper_noise": 0.005,
                "hyper_node_features": True,
                "frequency": 1,
                "fully_connect": False,
                "intra_cluster_sampling": {
                    "enabled": False, "alpha": 0.1, "spotter_threshold": 0,
                },
            },
            "graph_balancer": {"algorithm": "none"},
        },
    }
    traj = add_targets(
        synthetic.plate_trajectory(num_steps=batch + 2, nx=36, ny=36),
        "world_pos",
        history=False,
    )
    model = PlateModel(params)
    topo = model.topology_from_trajectory(traj)
    rmp = get_rmp(params)
    static = rmp.prepare(model, {k: v[0] for k, v in traj.items()}, topo)
    trainer = Trainer(model, params)
    tstate = trainer.init_train_state(jax.random.PRNGKey(0))
    step = trainer.make_train_step(topo, expansion=rmp)
    frames = {k: jnp.asarray(v[:batch]) for k, v in traj.items() if k != "cells"}
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        tstate, loss = step(tstate, frames, k, static)
    float(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        tstate, loss = step(tstate, frames, k, static)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    # count mesh + world + remote edges consumed per step
    num_edges = (
        len(topo.senders)
        + params["model"]["max_world_edges"]
        + len(static.up_senders)
        + len(static.down_senders)
        + len(static.inter_senders)
    )
    return {
        "hgn_plate_ms_per_step": round(dt * 1e3, 1),
        "hgn_plate_edges_per_s": round(batch * num_edges / dt, 1),
    }


def _wait_for_device(max_tries: int = 10, sleep_s: float = 60.0) -> None:
    """Block until the TPU backend initializes (the tunnel has transient
    outages).  Probes in a subprocess — a failed in-process init can stick
    in the JAX backend cache — and gives the real run a clean process
    state.  Gives up (and lets the real init raise) after ~10 minutes.
    """
    import subprocess
    import sys

    probe = "import jax; jax.devices()"
    for i in range(max_tries):
        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", probe],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                    timeout=180,
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:
            ok = False  # init hung — tunnel down
        if ok:
            return
        if i < max_tries - 1:
            time.sleep(sleep_s)


def main():
    _wait_for_device()
    result = _jax_throughput()
    try:
        hgn = _hgn_plate_throughput()
    except Exception:
        hgn = {}

    baseline = None
    if os.path.exists(CACHE):
        try:
            with open(CACHE) as f:
                baseline = json.load(f).get("torch_cpu_edges_per_s")
        except Exception:
            baseline = None
    if not baseline:
        try:
            baseline = _torch_reference_throughput(result["num_edges"])
            with open(CACHE, "w") as f:
                json.dump({"torch_cpu_edges_per_s": baseline}, f)
        except Exception:
            baseline = None

    out = {
        "metric": "flag_simple MGN-15MP train edges/s/chip",
        "value": round(result["edges_per_s"], 1),
        "unit": "edges/s",
        "vs_baseline": round(result["edges_per_s"] / baseline, 2) if baseline else None,
        "steps_per_s": round(result["steps_per_s"], 3),
        "batch": BATCH,
        "num_edges": result["num_edges"],
        "device": result["device"],
        "baseline_torch_cpu_edges_per_s": round(baseline, 1) if baseline else None,
        **hgn,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
