"""Decompose one MP-block's fwd+bwd cost at bench shapes (TPU).

Times proxy chains of increasing fidelity (pure matmuls -> +LN -> +gathers
-> +pna aggregation) over 15 stacked blocks to locate the backward's excess
over the matmul floor (BENCHMARKS.md round-2 ablation follow-up).

Run: python tools/perf_probe_block.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

B, N, E, L, MP = 21, 1600, 9282, 128, 15
CD = jnp.bfloat16


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1000


def ln(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(x.dtype)


def dense(x, w):
    return jnp.dot(x.astype(CD), w.astype(CD), preferred_element_type=CD)


def make_params(key, with_ln=True):
    ks = jax.random.split(key, MP * 8)
    blocks = []
    i = 0
    for _ in range(MP):
        blk = {
            # edge MLP factored first layer: e-part, s-part, r-part + hidden + out
            "we": jax.random.normal(ks[i], (L, L)) * 0.05,
            "ws": jax.random.normal(ks[i + 1], (L, L)) * 0.05,
            "wr": jax.random.normal(ks[i + 2], (L, L)) * 0.05,
            "we2": jax.random.normal(ks[i + 3], (L, L)) * 0.05,
            # node MLP: input latent + 4*latent pna -> hidden -> out
            "wn1": jax.random.normal(ks[i + 4], (5 * L, L)) * 0.05,
            "wn2": jax.random.normal(ks[i + 5], (L, L)) * 0.05,
        }
        if with_ln:
            blk["lne"] = (jnp.ones((L,)), jnp.zeros((L,)))
            blk["lnn"] = (jnp.ones((L,)), jnp.zeros((L,)))
        blocks.append(blk)
        i += 8
    return blocks


def run(name, body, params, x_nodes, x_edges, snd, rcv):
    @jax.jit
    def fwd_bwd(params, xn, xe):
        def loss(p):
            n, e = xn, xe
            for blk in p:
                n, e = body(blk, n, e)
            return jnp.sum(n.astype(jnp.float32) ** 2) + jnp.sum(
                e.astype(jnp.float32) ** 2
            )

        l, g = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(t) for t in jax.tree.leaves(g))

    ms = timeit(fwd_bwd, params, x_nodes, x_edges)
    print(f"{name:42s} {ms:7.1f} ms")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    snd = jnp.asarray(rng.integers(0, N, E))
    rcv = jnp.asarray(np.sort(rng.integers(0, N, E)))
    xn = jax.random.normal(key, (B, N, L), CD)
    xe = jax.random.normal(key, (B, E, L), CD)
    pln = make_params(key, True)
    pnl = make_params(key, False)

    print(f"shapes: B={B} N={N} E={E} L={L} MP={MP}  dtype={CD.__name__}")

    # 1. matmul floor: same dot shapes/FLOPs, no gather/agg/LN
    def body_mm(blk, n, e):
        ep = dense(e, blk["we"])
        sp = dense(n, blk["ws"])
        rp = dense(n, blk["wr"])
        h = ep + sp[:, :E % N + (E - E % N) // N * 0 + 0 :, :] * 0  # placeholder
        return n, e

    # simpler honest floor: edge chain on [B,E,L], node chain on [B,N,5L]
    def body_floor(blk, n, e):
        ep = dense(e, blk["we"])
        sp = dense(n, blk["ws"])
        rp = dense(n, blk["wr"])
        e2 = e + dense(jax.nn.relu(ep), blk["we2"])
        agg = jnp.concatenate([n, n, n, n, n], -1)  # stand-in for pna concat
        n2 = n + dense(jax.nn.relu(dense(agg, blk["wn1"])), blk["wn2"])
        # consume sp/rp so their dots aren't DCE'd (add cheap reduction)
        return n2 + (jnp.sum(sp, 1, keepdims=True) + jnp.sum(rp, 1, keepdims=True)) * 0.0, e2

    run("floor: matmuls only", body_floor, pnl, xn, xe, snd, rcv)

    # 2. + LayerNorm (2 per block)
    def body_ln(blk, n, e):
        n2, e2 = body_floor(blk, n, e)
        return ln(n2, *blk["lnn"]), ln(e2, *blk["lne"])

    run("matmuls + 2xLN", body_ln, pln, xn, xe, snd, rcv)

    # 3. + gathers (sender/receiver takes), still fake aggregation
    def body_gather(blk, n, e):
        ep = dense(e, blk["we"])
        sp = dense(n, blk["ws"])
        rp = dense(n, blk["wr"])
        h = ep + jnp.take(sp, snd, axis=1) + jnp.take(rp, rcv, axis=1)
        e2 = e + dense(jax.nn.relu(h), blk["we2"])
        agg = jnp.concatenate([n, n, n, n, n], -1)
        n2 = n + dense(jax.nn.relu(dense(agg, blk["wn1"])), blk["wn2"])
        return ln(n2, *blk["lnn"]), ln(e2, *blk["lne"])

    run("matmuls + LN + snd/rcv gathers", body_gather, pln, xn, xe, snd, rcv)

    # 4. + real segment pna aggregation (scatter path)
    from hyper_graph_nets_tpu.core.segment_ops import aggregate

    def body_full(blk, n, e):
        ep = dense(e, blk["we"])
        sp = dense(n, blk["ws"])
        rp = dense(n, blk["wr"])
        h = ep + jnp.take(sp, snd, axis=1) + jnp.take(rp, rcv, axis=1)
        e2 = e + dense(jax.nn.relu(h), blk["we2"])
        agg = jax.vmap(lambda ee: aggregate(ee, rcv, N, "pna"))(e2)
        n2 = n + dense(jax.nn.relu(dense(jnp.concatenate([n, agg], -1), blk["wn1"])), blk["wn2"])
        return ln(n2, *blk["lnn"]), ln(e2, *blk["lne"])

    run("full block (scatter pna)", body_full, pln_with_ln := pln, xn, xe, snd, rcv)

    # 5. sum-only aggregation
    def body_sum(blk, n, e):
        ep = dense(e, blk["we"])
        sp = dense(n, blk["ws"])
        rp = dense(n, blk["wr"])
        h = ep + jnp.take(sp, snd, axis=1) + jnp.take(rp, rcv, axis=1)
        e2 = e + dense(jax.nn.relu(h), blk["we2"])
        s = jax.vmap(lambda ee: aggregate(ee, rcv, N, "sum"))(e2)
        agg = jnp.concatenate([s, s, s, s], -1)
        n2 = n + dense(jax.nn.relu(dense(jnp.concatenate([n, agg], -1), blk["wn1"])), blk["wn2"])
        return ln(n2, *blk["lnn"]), ln(e2, *blk["lne"])

    run("full block (scatter sum x4)", body_sum, pln, xn, xe, snd, rcv)


if __name__ == "__main__":
    main()
