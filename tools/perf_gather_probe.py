"""Probe: can Mosaic lower a dynamic row gather, and does it beat the
one-hot matmul inside the fused MP-block kernel?

The fused kernel's dominant forward FLOPs are the banded one-hot gathers
([T, W] x [W, L] MXU matmuls, 2 per chunk) and the [WR, T] selection
matmul (ROADMAP 5c).  A Mosaic-native gather (jnp.take along sublanes)
would replace O(T*W*L) FLOPs with O(T*L) moves.  This probe times, on the
attached TPU, per variant:

  onehot   - iota==idx one-hot, dot(onehot, window)     (current kernel)
  take     - jnp.take(window, idx, axis=0) in-kernel
  xla      - jnp.take outside pallas (XLA's own gather)

Writes one JSON line per (T, W) config.  Run when the chip is idle.
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128


def _onehot_kernel(idx_ref, win_ref, out_ref, *, W):
    T = idx_ref.shape[0]
    idx = idx_ref[...].reshape(T, 1)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (T, W), 1) == idx).astype(
        win_ref.dtype
    )
    out_ref[...] = jnp.dot(
        oh, win_ref[...], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _take_kernel(idx_ref, win_ref, out_ref, *, W):
    del W
    out_ref[...] = jnp.take(win_ref[...], idx_ref[...], axis=0)


def _take_same_shape_kernel(idx_ref, win_ref, out_ref, *, W):
    # the only gather form this jax/Mosaic build's lowering rule accepts
    # (indices shaped like the INPUT): gather all W rows, use the first T.
    # Round-3 result: passes lowering but crashes the v5e remote-compile
    # helper (ROADMAP 5c) — keep probing on toolchain updates.
    T = out_ref.shape[0]
    idx = jnp.broadcast_to(idx_ref[...].reshape(W, 1), (W, L))
    out_ref[...] = jnp.take_along_axis(win_ref[...], idx, axis=0)[:T]


def _call(kernel, idx, win, W, reps):
    T = idx.shape[0]
    fn = pl.pallas_call(
        functools.partial(kernel, W=W),
        out_shape=jax.ShapeDtypeStruct((T, L), win.dtype),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def many(idx, win):
        def body(_, acc):
            return acc + fn(idx, win)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((T, L), win.dtype))

    return many


def main():
    rng = np.random.RandomState(0)
    reps = 100
    for T, W in [(512, 512), (512, 1024), (512, 2048)]:
        idx = jnp.asarray(rng.randint(0, W, T), jnp.int32)
        idx_full = jnp.concatenate(
            [idx, jnp.zeros(W - T, jnp.int32)]
        ) if W > T else idx[:W]
        win = jnp.asarray(rng.randn(W, L), jnp.bfloat16)
        rows = {}
        ref = None
        for name, kern in [
            ("onehot", _onehot_kernel),
            ("take", _take_kernel),
            ("take_same_shape", _take_same_shape_kernel),
        ]:
            try:
                use_idx = idx_full if name == "take_same_shape" else idx
                f = _call(kern, use_idx, win, W, reps)
                out = f(use_idx, win)
                out = np.asarray(out, np.float32)  # force sync
                t0 = time.time()
                out = np.asarray(f(use_idx, win), np.float32)
                dt = (time.time() - t0) / reps
                if ref is None:
                    ref = out
                    ok = True
                else:
                    ok = bool(np.allclose(out, ref, rtol=2e-2, atol=1e-2))
                rows[name] = {"us": dt * 1e6, "match": ok}
            except Exception as e:  # noqa: BLE001 - probing lowering support
                rows[name] = {"error": repr(e).splitlines()[0][:200]}

        @jax.jit
        def xla_many(idx, win):
            def body(_, acc):
                return acc + jnp.take(win, idx, axis=0)

            return jax.lax.fori_loop(
                0, reps, body, jnp.zeros((T, L), win.dtype)
            )

        out = np.asarray(xla_many(idx, win), np.float32)
        t0 = time.time()
        out = np.asarray(xla_many(idx, win), np.float32)
        rows["xla"] = {
            "us": (time.time() - t0) / reps * 1e6,
            "match": bool(np.allclose(out, ref, rtol=2e-2, atol=1e-2)),
        }
        print(json.dumps({"T": T, "W": W, **rows}), flush=True)


if __name__ == "__main__":
    main()
