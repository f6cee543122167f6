"""Cheap-variant probes for the gather and LN costs found by
perf_probe_block.py (TPU).  Run: python tools/perf_probe_variants.py
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


def bench_chain(name, body, x, iters=10):
    @jax.jit
    def fwd_bwd(x):
        def loss(xx):
            h = xx
            for _ in range(MP * 2):  # 2 per block like snd+rcv or 2 LNs
                h = body(h)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(x)
        return l + jnp.sum(g)

    ms = timeit(fwd_bwd, x)
    print(f"{name:46s} {ms:7.1f} ms")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    snd = jnp.asarray(rng.integers(0, N, E))
    # flat indices for [B*N, L] layout
    flat_idx = jnp.asarray(
        (rng.integers(0, N, E)[None, :] + np.arange(B)[:, None] * N).reshape(-1)
    )
    xn = jax.random.normal(key, (B, N, L), CD)
    xn_flat = xn.reshape(B * N, L)

    print(f"gather variants: 30 gathers [B,N,L]->[B,E,L], fwd+bwd")

    # A. current: vmapped take over batch dim
    def g_take(h):
        e = jnp.take(h, snd, axis=1)
        # project back to [B,N,L] so the chain composes: cheap slice
        return h + jnp.sum(e, axis=1, keepdims=True) * 1e-6

    bench_chain("A: jnp.take axis=1 (current)", g_take, xn)

    # B. flat 2D take with precomputed batch-offset indices
    def g_flat(h):
        e = jnp.take(h, flat_idx, axis=0)
        return h + jnp.sum(
            e.reshape(B, E, L), axis=1
        ).reshape(B * N // N, N, L).reshape(B and (B, N, L))[0:1].reshape(1, N, L) * 0 + h * 0 + h + jnp.sum(e, axis=0, keepdims=True)[None, 0:1, :] * 1e-6 - h

    # simpler: keep flat layout end to end
    def g_flat2(h):
        e = jnp.take(h, flat_idx, axis=0)
        return h + jnp.zeros_like(h).at[0:1].set(jnp.sum(e, 0, keepdims=True) * 1e-6)

    bench_chain("B: flat [B*N,L] take axis=0", g_flat2, xn_flat)

    # C. take_along_axis variant
    idx3 = jnp.broadcast_to(snd[None, :, None], (B, E, 1))

    def g_tala(h):
        e = jnp.take_along_axis(h, idx3, axis=1)
        return h + jnp.sum(e, axis=1, keepdims=True) * 1e-6

    bench_chain("C: take_along_axis", g_tala, xn)

    print("\nLN variants: 30 LNs on [B,E,L], fwd+bwd")
    xe = jax.random.normal(key, (B, E, L), CD)
    scale = jnp.ones((L,), jnp.float32)
    bias = jnp.zeros((L,), jnp.float32)

    def ln_f32(h):
        x32 = h.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(h.dtype)

    bench_chain("LN f32 stats (current)", ln_f32, xe)

    def ln_bf16(h):
        mu = jnp.mean(h, -1, keepdims=True)
        var = jnp.mean(jnp.square(h - mu), -1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-5) * scale.astype(h.dtype) + bias.astype(h.dtype)

    bench_chain("LN bf16 stats", ln_bf16, xe)

    # E[x^2]-E[x]^2 single-pass form (one fewer elementwise pass)
    def ln_1pass(h):
        x32 = h.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        m2 = jnp.mean(jnp.square(x32), -1, keepdims=True)
        var = m2 - jnp.square(mu)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(h.dtype)

    bench_chain("LN one-pass E[x2]-E[x]^2", ln_1pass, xe)


if __name__ == "__main__":
    main()
