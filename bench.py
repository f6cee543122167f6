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
counts; measured once and cached in BENCH_LAST_GOOD.json.

Outage hardening (the TPU tunnel has transient multi-minute outages):
  * On startup the committed last-good result (BENCH_LAST_GOOD.json) is
    printed IMMEDIATELY with ``"stale": true`` — if everything after that
    hangs or dies, the driver still parses a result line.
  * A hard overall deadline (BENCH_DEADLINE_S, default 480s) bounds every
    phase; the device probe gets at most 3 tries.
  * The MGN headline is printed as soon as it is measured, before the HGN
    phase starts; the final line repeats it with the HGN numbers attached.
  * A fused-kernel compile failure falls back to chunk=256, then to
    ``agg_vjp: gather``, rather than dying.
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
# persistent compilation cache: the axon remote-compile helper takes
# 100-200 s per fused-kernel executable through the tunnel; caching
# compiles on disk makes repeat bench runs (the driver re-runs this
# script on unchanged code) skip them entirely (measured 14.6 s -> 0.3 s
# on a probe jit).  Harmless when cold.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

MP_STEPS = 15
BATCH = 21
GRID = 40  # 40x40 = 1600 nodes, flag_simple scale
LATENT = 128
_HERE = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD = os.path.join(_HERE, "BENCH_LAST_GOOD.json")
_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "480"))


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _load_last_good() -> dict | None:
    try:
        with open(LAST_GOOD) as f:
            return json.load(f)
    except Exception:
        return None


def _jax_throughput(model_overrides: dict | None = None) -> dict:
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
            **(model_overrides or {}),
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
        "path": params["model"]["agg_vjp"],
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
            # per-trajectory static capacity from the data (2x max contact
            # count, pow2): the shipped plateCluster.yaml semantics
            "max_world_edges": "auto",
            "agg_vjp": "fused",  # fused Pallas kernel on the mesh edge set
            # forward grid amortization: 34.3 -> 33.3 ms measured (the
            # packed scan shares the per-chunk work across the 2 batch
            # elements; grads bit-identical — ROADMAP 5c round-5)
            "fused_pb": 2,
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
    # padded-capacity edge count: mesh + world-edge cap + pow2-padded
    # remote edge rows — what the program actually processes per step
    world_cap = int(topo.world_cap or 1024)
    num_edges = (
        len(topo.senders)
        + world_cap
        + len(static.up_senders)
        + len(static.down_senders)
        + len(static.inter_senders)
    )
    # VALID edge count (honest accounting): mesh edges are exact; world
    # edges counted from the in-jit radius query's mask (mean over the
    # batch); remote edges from the incidence masks (padding excluded)
    frame_batch = {k: v for k, v in frames.items()}
    raw = jax.jit(
        lambda f: jax.vmap(
            lambda g: jnp.sum(
                model.frame_features(
                    jnp.asarray(topo.senders), jnp.asarray(topo.receivers), g,
                    obstacle_idx=jnp.asarray(topo.aux["obstacle_idx"]),
                    obstacle_valid=jnp.asarray(topo.aux["obstacle_valid"]),
                )["world_mask"]
            )
        )(f)
    )(frame_batch)
    world_valid = float(np.mean(np.asarray(raw)))
    valid_edges = (
        len(topo.senders)
        + world_valid
        + float(np.sum(static.up_mask))
        + float(np.sum(static.down_mask))
        + float(np.sum(static.inter_mask))
    )
    return {
        "hgn_plate_ms_per_step": round(dt * 1e3, 1),
        "hgn_plate_edges_per_s": round(batch * num_edges / dt, 1),
        "hgn_plate_valid_edges_per_s": round(batch * valid_edges / dt, 1),
        "hgn_plate_valid_edges": round(valid_edges, 1),
        "hgn_plate_padded_edges": num_edges,
    }


def _wait_for_device(max_tries: int = 3, sleep_s: float = 20.0) -> bool:
    """Probe (at most ``max_tries`` times, bounded by the overall deadline)
    until the TPU backend initializes — the tunnel has transient outages.
    Probes in a subprocess: a failed in-process init can stick in the JAX
    backend cache.  Returns False instead of blocking the driver's budget.
    """
    import subprocess
    import sys

    probe = "import jax; jax.devices()"
    for i in range(max_tries):
        budget = _remaining() - 60.0  # leave time to emit the stale line
        if budget <= 5:
            return False
        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", probe],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                    timeout=min(120, budget),
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:
            ok = False  # init hung — tunnel down
        if ok:
            return True
        if i < max_tries - 1 and _remaining() > sleep_s + 65:
            time.sleep(sleep_s)
    return False


def main():
    last_good = _load_last_good()
    if last_good:
        # outage insurance: a parseable result line exists from second zero
        _emit({**last_good, "stale": True})

    if not _wait_for_device():
        _emit(
            {
                **(last_good or {"metric": "flag_simple MGN-15MP train edges/s/chip",
                                 "value": None, "unit": "edges/s",
                                 "vs_baseline": None}),
                "stale": True,
                "error": "TPU backend unavailable (tunnel outage); "
                "stale last-good numbers above" if last_good
                else "TPU backend unavailable and no last-good cache",
            }
        )
        return

    # Changed-metric-first ordering (round-4 verdict #2): when the MGN
    # headline already has a cached number, measure the HGN plate phase
    # FIRST so a deadline hit mid-MGN still leaves a fresh hgn_plate_*
    # measurement in the parsed line.  Per-phase provenance rides on
    # ``mgn_fresh``/``hgn_fresh``; ``stale`` means "no phase in this line
    # was measured this run".
    hgn: dict = {}

    def _run_hgn_phase() -> None:
        nonlocal hgn
        if hgn or _remaining() <= 90:
            return
        try:
            hgn = _hgn_plate_throughput()
        except Exception as e:  # noqa: BLE001
            print(f"# HGN phase failed: {e!r}", flush=True)

    if (last_good or {}).get("value"):
        _run_hgn_phase()
        if hgn:
            _emit({**last_good, **hgn, "stale": False,
                   "mgn_fresh": False, "hgn_fresh": True})

    # MGN phase with compile-failure fallbacks: fused/512 -> fused/256 -> gather
    result = None
    for overrides in ({}, {"fused_chunk": 256}, {"agg_vjp": "gather"}):
        try:
            result = _jax_throughput(overrides)
            break
        except Exception as e:  # noqa: BLE001 — report, try next tier
            print(f"# MGN phase failed with {overrides}: {e!r}", flush=True)
    if result is None:
        _emit(
            {
                **(last_good or {}),
                **hgn,
                "stale": not hgn,
                "mgn_fresh": False,
                "hgn_fresh": bool(hgn),
                "error": "all MGN fallback tiers failed",
            }
        )
        if hgn and last_good:
            try:
                with open(LAST_GOOD, "w") as f:
                    json.dump({**last_good, **hgn}, f, indent=1)
                    f.write("\n")
            except Exception:
                pass
        return

    baseline = (last_good or {}).get("baseline_torch_cpu_edges_per_s")
    if not baseline and _remaining() > 120:
        try:
            baseline = _torch_reference_throughput(result["num_edges"])
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
        "path": result["path"],
        "baseline_torch_cpu_edges_per_s": round(baseline, 1) if baseline else None,
        "stale": False,
        "mgn_fresh": True,
    }
    _emit(out)  # headline lands before the HGN phase can hang

    _run_hgn_phase()
    if hgn:
        out = {**out, **hgn, "hgn_fresh": True}
        _emit(out)

    try:
        with open(LAST_GOOD, "w") as f:
            json.dump(
                {k: v for k, v in out.items()
                 if k not in ("stale", "mgn_fresh", "hgn_fresh")},
                f, indent=1,
            )
            f.write("\n")
    except Exception:
        pass


if __name__ == "__main__":
    main()
