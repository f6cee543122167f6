"""MLP building block with explicit param pytrees.

Replaces the reference's ``LazyMLP`` + optional LayerNorm wrapper (reference
src/migration/meshgraphnet.py:53-60, 93-108).  Input sizes are computed
statically from the model schema instead of lazily inferred, so everything is
jit-compilable with static shapes.

Initialization matches torch.nn.Linear defaults (kaiming-uniform with
a=sqrt(5) for W — equivalent to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the
same bound for b) so activation distributions at init match the reference.

For TPU throughput the matmuls optionally run in bfloat16 with float32
accumulation (``compute_dtype``); parameters and outputs stay float32.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def mlp_init(
    key: Array,
    in_dim: int,
    widths: Sequence[int],
    layer_norm: bool = True,
) -> dict:
    """Initialize an MLP with ReLU between layers and optional final LayerNorm.

    ``widths`` follows the reference convention ``[latent]*num_layers + [out]``.
    """
    layers = []
    dim = in_dim
    for w in widths:
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(jnp.maximum(dim, 1)).astype(jnp.float32)
        layers.append(
            {
                "w": jax.random.uniform(k1, (dim, w), jnp.float32, -bound, bound),
                "b": jax.random.uniform(k2, (w,), jnp.float32, -bound, bound),
            }
        )
        dim = w
    params = {"layers": layers}
    if layer_norm:
        params["ln"] = {
            "scale": jnp.ones((widths[-1],), jnp.float32),
            "bias": jnp.zeros((widths[-1],), jnp.float32),
        }
    return params


def _dense(x: Array, w: Array, compute_dtype: Optional[jnp.dtype]) -> Array:
    """Matmul; with a compute dtype the activation stream stays low-precision
    (MXU still accumulates in f32 internally), halving HBM traffic."""
    if compute_dtype is not None:
        return jnp.dot(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            preferred_element_type=compute_dtype,
        )
    return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)


def _layer_norm(params: dict, x: Array) -> Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    x32 = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
    return (x32 * params["ln"]["scale"] + params["ln"]["bias"]).astype(dtype)


def mlp_apply_tail(
    params: dict,
    x: Array,
    compute_dtype: Optional[jnp.dtype] = None,
    from_layer: int = 0,
) -> Array:
    """Apply layers [from_layer:] (+ final LayerNorm).

    ``from_layer > 0`` supports callers that compute the first layer in a
    factored form (see blocks._update_edge_features); ``x`` must then already
    be the *pre-activation* output of layer ``from_layer - 1``.
    """
    layers = params["layers"]
    n = len(layers)
    if from_layer > 0:
        x = jax.nn.relu(x) if from_layer < n else x
    for i in range(from_layer, n):
        b = layers[i]["b"]
        if compute_dtype is not None:
            b = b.astype(compute_dtype)
        if "w_q" in layers[i]:
            # int8 inference path (nn.quant): weights pre-quantized per
            # channel, activations quantized dynamically per row
            from hyper_graph_nets_tpu.nn.quant import dense_int8

            x = dense_int8(x, layers[i]["w_q"], layers[i]["wscale"]) + b
        else:
            x = _dense(x, layers[i]["w"], compute_dtype) + b
        if i < n - 1:
            x = jax.nn.relu(x)
    if "ln" in params:
        x = _layer_norm(params, x)
    return x


def mlp_apply(
    params: dict,
    x: Array,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Array:
    """Apply the MLP. Matmuls accumulate in f32 regardless of compute dtype."""
    return mlp_apply_tail(params, x, compute_dtype, from_layer=0)
