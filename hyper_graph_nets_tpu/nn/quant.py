"""Int8 (W8A8) quantized inference for serving-scale rollouts.

ROADMAP item: quantized inference for production deployment.  The training
stack stays f32/bf16; for inference the MLP weights are quantized once to
per-output-channel symmetric int8 and activations are quantized dynamically
per row, so every dense layer runs as an int8 x int8 -> int32 matmul — the
TPU MXU's highest-throughput mode (2x bf16 peak on v5e).

Design:
- ``quantize_network`` walks the network param pytree (encoder / stacked
  processor blocks / decoder, reference src/migration/meshgraphnet.py:21-44
  structure) and replaces every MLP layer ``{"w", "b"}`` with
  ``{"w_q" int8, "wscale" f32[out], "b"}``.  Stacked processor weights
  ``[num_blocks, in, out]`` quantize per block and per channel; lax.scan
  slices them exactly like the float weights.
- ``nn.mlp.mlp_apply_tail`` and ``nn.blocks._update_edge_features``
  transparently dispatch on ``"w_q"``, so the same forward code serves both
  numerics — models need no changes beyond swapping the params pytree
  (``SystemModel.inference_state``).
- LayerNorm, normalizers, biases and the decoder output stay f32: the
  rollout integrator (2nd-order position updates) is precision-sensitive,
  the dense layers are not.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_weight(w: Array) -> tuple[Array, Array]:
    """Per-output-channel symmetric int8 quantization.

    ``w`` is ``[..., in, out]`` (leading dims = stacked processor blocks);
    returns ``(w_q int8, scale f32[..., out])`` with ``w ~= w_q * scale``.
    """
    amax = jnp.max(jnp.abs(w), axis=-2)  # [..., out]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(
        jnp.round(w / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def dense_int8(x: Array, w_q: Array, wscale: Array) -> Array:
    """Dynamic-activation int8 matmul: quantize ``x`` per row, dot in int8.

    ``y = (x_q @ w_q) * (ax * wscale)`` with int32 accumulation on the MXU.
    Output dtype follows ``x`` (bf16 stream stays bf16).
    """
    x32 = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0  # [..., 1]
    ax = jnp.where(ax > 0, ax, 1.0)
    x_q = jnp.clip(jnp.round(x32 / ax), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q,
        w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * ax * wscale).astype(x.dtype)


def quantize_mlp(params: dict) -> dict:
    """Quantize one MLP param dict ({"layers": [...], "ln"?: ...})."""
    layers = []
    for layer in params["layers"]:
        w_q, wscale = quantize_weight(layer["w"])
        layers.append({"w_q": w_q, "wscale": wscale, "b": layer["b"]})
    out = {"layers": layers}
    if "ln" in params:
        out["ln"] = params["ln"]
    return out


def quantize_network(params: Any) -> Any:
    """Recursively replace every MLP ({"layers": ...} dict) in a network
    param pytree with its int8-quantized counterpart."""
    if isinstance(params, dict):
        if "layers" in params:
            return quantize_mlp(params)
        return {k: quantize_network(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(quantize_network(v) for v in params)
    return params
