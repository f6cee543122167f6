"""Fused Pallas MP-block kernel: TPU parity check + 15-block chain bench.

Compares the fused edge-half kernel (ops/pallas/fused_block) against the
unfused XLA chain (gather -> edge MLP -> LN -> pna aggregate, exactly the
nn/blocks math) at bench shapes: B=21, N=1600 (40x40 flag grid), E=9282,
L=128, MP=15, bf16 — the shapes behind BENCHMARKS.md's 104 ms/step.

Run on the TPU: python tools/bench_fused_block.py [--fwd-only]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from hyper_graph_nets_tpu.ops.pallas.fused_block import (
    build_band_plan,
    fused_edge_block,
)

B, NX, L, MP = 21, 40, 128, 15
CD = jnp.bfloat16


def grid_edges(nx: int):
    """Directed edge list of a triangulated nx*nx grid, receiver-sorted."""
    idx = np.arange(nx * nx).reshape(nx, nx)
    cells = []
    for i in range(nx - 1):
        for j in range(nx - 1):
            a, b, c, d = idx[i, j], idx[i, j + 1], idx[i + 1, j], idx[i + 1, j + 1]
            cells.append((a, b, c))
            cells.append((b, d, c))
    cells = np.asarray(cells)
    und = set()
    for tri in cells:
        for u, v in ((0, 1), (1, 2), (0, 2)):
            e = (min(tri[u], tri[v]), max(tri[u], tri[v]))
            und.add(e)
    und = np.asarray(sorted(und))
    snd = np.concatenate([und[:, 0], und[:, 1]])
    rcv = np.concatenate([und[:, 1], und[:, 0]])
    order = np.argsort(rcv, kind="stable")
    return snd[order].astype(np.int32), rcv[order].astype(np.int32)


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def make_block_params(key):
    ks = iter(jax.random.split(key, 18))
    g = lambda shape, s=0.08: jax.random.normal(next(ks), shape, jnp.float32) * s
    return {
        # edge half (fused-kernel layout)
        "ws": g((L, L)),
        "wr": g((L, L)),
        "we": g((L, L)),
        "w2": g((L, L)),
        "w3": g((L, L)),
        "b1": g((L,), 0.02),
        "b2": g((L,), 0.02),
        "b3": g((L,), 0.02),
        "lns": 1.0 + g((L,), 0.02),
        "lnb": g((L,), 0.02),
        # node half: x' = x + LN(relu(relu([x,agg]@Wn1+c1)@Wn2+c2)@Wn3+c3)
        "wn1": g((5 * L, L)),
        "wn2": g((L, L)),
        "wn3": g((L, L)),
        "c1": g((L,), 0.02),
        "c2": g((L,), 0.02),
        "c3": g((L,), 0.02),
        "nlns": 1.0 + g((L,), 0.02),
        "nlnb": g((L,), 0.02),
    }


def ln(x, s, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * s + b).astype(x.dtype)


def dot(x, w):
    return jnp.dot(x.astype(CD), w.astype(CD), preferred_element_type=CD)


def node_half(blk, x, agg):
    h = jnp.concatenate([x, agg.astype(CD)], -1)
    z = dot(h, blk["wn1"]) + blk["c1"].astype(CD)
    z = dot(jax.nn.relu(z), blk["wn2"]) + blk["c2"].astype(CD)
    z = dot(jax.nn.relu(z), blk["wn3"]) + blk["c3"].astype(CD)
    return x + ln(z, blk["nlns"], blk["nlnb"])


def edge_half_unfused(blk, x, e, snd, rcv, N):
    sp = dot(x, blk["ws"])
    rp = dot(x, blk["wr"])
    h = (
        dot(e, blk["we"])
        + jnp.take(sp, snd, axis=1)
        + jnp.take(rp, rcv, axis=1)
        + blk["b1"].astype(CD)
    )
    z = dot(jax.nn.relu(h), blk["w2"]) + blk["b2"].astype(CD)
    z = dot(jax.nn.relu(z), blk["w3"]) + blk["b3"].astype(CD)
    e2 = e + ln(z, blk["lns"], blk["lnb"])
    from hyper_graph_nets_tpu.core.segment_ops import aggregate

    agg = jax.vmap(lambda d: aggregate(d, rcv, N, "pna"))(e2)
    return e2, agg


def edge_half_fused(blk, x, e, plan, N):
    sp = dot(x, blk["ws"])
    rp = dot(x, blk["wr"])
    return fused_edge_block(e, sp, rp, blk, plan, N)


def main():
    fwd_only = "--fwd-only" in sys.argv
    snd, rcv = grid_edges(NX)
    N, E = NX * NX, snd.shape[0]
    print(f"backend={jax.default_backend()} B={B} N={N} E={E} L={L} MP={MP}")
    plan = build_band_plan(snd, rcv, N, chunk=256)
    print(f"plan: C={plan.C} W={plan.W} WR={plan.WR} steps={plan.scan_steps}")

    key = jax.random.PRNGKey(0)
    params = [make_block_params(k) for k in jax.random.split(key, MP)]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, L), CD)
    e = jax.random.normal(jax.random.PRNGKey(2), (B, E, L), CD)
    snd_j, rcv_j = jnp.asarray(snd), jnp.asarray(rcv)

    def chain(params, x, e, fused: bool):
        for blk in params:
            if fused:
                e, agg = edge_half_fused(blk, x, e, plan, N)
            else:
                e, agg = edge_half_unfused(blk, x, e, snd_j, rcv_j, N)
            x = node_half(blk, x, agg)
        return x, e

    @jax.jit
    def fwd_unfused(params, x, e):
        return chain(params, x, e, False)

    @jax.jit
    def fwd_fused(params, x, e):
        return chain(params, x, e, True)

    # --- numeric parity (bf16 accumulation differences bound the tol)
    xu, eu = fwd_unfused(params, x, e)
    xf, ef = fwd_fused(params, x, e)
    dx = float(jnp.max(jnp.abs(xu.astype(jnp.float32) - xf.astype(jnp.float32))))
    de = float(jnp.max(jnp.abs(eu.astype(jnp.float32) - ef.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(xu.astype(jnp.float32))))
    print(f"parity: max|dx|={dx:.4f} max|de|={de:.4f} (|x| scale {scale:.1f})")

    t_u = timeit(fwd_unfused, params, x, e)
    t_f = timeit(fwd_fused, params, x, e)
    print(f"fwd  {MP} blocks: unfused {t_u:.2f} ms   fused {t_f:.2f} ms   "
          f"({t_u / t_f:.2f}x)")

    if fwd_only:
        return

    def loss(params, x, e, fused):
        xo, eo = chain(params, x, e, fused)
        return jnp.sum(xo.astype(jnp.float32) ** 2) + jnp.sum(
            eo.astype(jnp.float32) ** 2
        )

    gu = jax.jit(jax.grad(lambda p: loss(p, x, e, False)))
    gf = jax.jit(jax.grad(lambda p: loss(p, x, e, True)))
    ggu, ggf = gu(params), gf(params)
    rel = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (1e-6 + jnp.max(jnp.abs(a.astype(jnp.float32))))
        ),
        ggu,
        ggf,
    )
    worst = max(jax.tree.leaves(rel))
    print(f"grad parity: worst rel max-err {worst:.4f}")

    t_gu = timeit(gu, params)
    t_gf = timeit(gf, params)
    print(f"fwd+bwd {MP} blocks: unfused {t_gu:.2f} ms   fused {t_gf:.2f} ms   "
          f"({t_gu / t_gf:.2f}x)")


if __name__ == "__main__":
    main()
