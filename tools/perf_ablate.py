"""Perf ablation harness for the 15MP flag_simple bench step (TPU).

Times the full train step and its ablated variants to locate where the
104 ms goes, and captures a jax.profiler trace artifact into
profiles/.  Run on the TPU: python tools/perf_ablate.py [trace]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 512-edge fused chunks need the raised scoped-VMEM limit (see bench.py)
os.environ.setdefault(
    "LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=32768"
)

import jax
import jax.numpy as jnp

from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.training.trainer import Trainer, batched_forward

MP_STEPS = 15
BATCH = 21
GRID = 40


def setup(**model_overrides):
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
            "agg_vjp": "fused",  # the shipped default (ops/pallas/fused_block)
            "rmp": {"clustering": "none", "connector": "none"},
            "graph_balancer": {"algorithm": "none"},
            **model_overrides,
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
    frames = {k: jnp.asarray(v[:BATCH]) for k, v in traj.items()}
    return params, traj, model, topo, trainer, tstate, frames


def timeit(fn, *args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[0]) if hasattr(x, "shape") and x.ndim else x,
                 jax.tree.leaves(out)[:1])
    # force full sync via value fetch (axon block_until_ready returns early)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    do_trace = len(sys.argv) > 1 and sys.argv[1] == "trace"
    results = {}

    # --- full train step (the bench number) -------------------------------
    params, traj, model, topo, trainer, tstate, frames = setup()
    step = trainer.make_train_step(topo)
    key = jax.random.PRNGKey(1)

    def full(ts):
        ts, loss = step(ts, frames, key)
        return ts

    # train step donates tstate; re-feed output
    for _ in range(3):
        tstate = full(tstate)
    float(tstate.step)
    t0 = time.perf_counter()
    for _ in range(10):
        tstate = full(tstate)
    float(tstate.step)
    results["full_train_step"] = (time.perf_counter() - t0) / 10 * 1000

    # --- forward only -----------------------------------------------------
    mstate = tstate.model

    @jax.jit
    def fwd(mstate, frames):
        graph, _, _ = model.make_graph(mstate, topo, frames, False)
        return batched_forward(model, mstate.params, graph)

    results["forward_only"] = timeit(fwd, mstate, frames)

    # --- forward + backward (no Adam/normalizers) -------------------------
    @jax.jit
    def fwd_bwd(mstate, frames):
        def loss_fn(p):
            graph, _, _ = model.make_graph(mstate, topo, frames, False)
            out = batched_forward(model, p, graph)
            return jnp.sum(out * out)

        l, g = jax.value_and_grad(loss_fn)(mstate.params)
        # consume grads so the backward isn't dead-code-eliminated
        return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    results["forward_backward"] = timeit(fwd_bwd, mstate, frames)

    # --- graph build only (featurizers + normalizers) ---------------------
    @jax.jit
    def build_only(mstate, frames):
        graph, _, _ = model.make_graph(mstate, topo, frames, False)
        return graph.node_features

    results["graph_build_only"] = timeit(build_only, mstate, frames)

    # --- aggregation variants: scatter vs gather --------------------------
    # agg_vjp=xla (not fused): stripping the gather matrix must actually
    # select the masked-scatter path, not the band-plan kernel
    p2, _, m2, topo2, tr2, ts2, fr2 = setup(agg_vjp="xla")
    topo_nog = topo2._replace(gather_idx=None, gather_valid=None)
    step2 = tr2.make_train_step(topo_nog)

    def full2(ts):
        ts, loss = step2(ts, fr2, key)
        return ts

    for _ in range(3):
        ts2 = full2(ts2)
    float(ts2.step)
    t0 = time.perf_counter()
    for _ in range(10):
        ts2 = full2(ts2)
    float(ts2.step)
    results["full_step_scatter_agg"] = (time.perf_counter() - t0) / 10 * 1000

    # --- sum-only aggregation (pna -> sum) --------------------------------
    p3, _, m3, topo3, tr3, ts3, fr3 = setup(aggregation="sum")
    step3 = tr3.make_train_step(topo3)

    def full3(ts):
        ts, loss = step3(ts, fr3, key)
        return ts

    for _ in range(3):
        ts3 = full3(ts3)
    float(ts3.step)
    t0 = time.perf_counter()
    for _ in range(10):
        ts3 = full3(ts3)
    float(ts3.step)
    results["full_step_sum_agg"] = (time.perf_counter() - t0) / 10 * 1000

    # --- f32 stream -------------------------------------------------------
    p4, _, m4, topo4, tr4, ts4, fr4 = setup(compute_dtype=None)
    step4 = tr4.make_train_step(topo4)

    def full4(ts):
        ts, loss = step4(ts, fr4, key)
        return ts

    for _ in range(3):
        ts4 = full4(ts4)
    float(ts4.step)
    t0 = time.perf_counter()
    for _ in range(10):
        ts4 = full4(ts4)
    float(ts4.step)
    results["full_step_f32"] = (time.perf_counter() - t0) / 10 * 1000

    for k, v in results.items():
        print(f"{k:28s} {v:8.1f} ms")

    # FLOP model: per MP step per edge-set-row
    E = len(topo.senders)
    N = topo.num_nodes
    L = 128
    rows_e = BATCH * E
    rows_n = BATCH * N
    # edge MLP: factored first layer (nodes: 2L x L and L x... ) + tail L x L
    flops_edge = rows_n * (L * 2 * L * 2) + rows_e * (L * L * 2) * 1 + rows_e * (L * L * 2)
    # node MLP: (1+4)L x L + L x L
    flops_node = rows_n * (5 * L * L * 2 + L * L * 2)
    flops_fwd = MP_STEPS * (flops_edge + flops_node)
    flops_train = flops_fwd * 3  # fwd + bwd(2x)
    print(f"\nmodel FLOPs/step (train, approx): {flops_train/1e9:.1f} GFLOP")
    print(f"achieved: {flops_train/ (results['full_train_step']/1e3) / 1e12:.1f} TFLOP/s")

    if do_trace:
        os.makedirs(os.path.join(REPO, "profiles"), exist_ok=True)
        trace_dir = os.path.join(REPO, "profiles", "bench15mp")
        with jax.profiler.trace(trace_dir):
            tstate = full(tstate)
            float(tstate.step)
        print("trace written to", trace_dir)


if __name__ == "__main__":
    main()
