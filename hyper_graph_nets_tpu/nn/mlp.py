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


def mlp_apply(
    params: dict,
    x: Array,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Array:
    """Apply the MLP. Matmuls accumulate in f32 regardless of compute dtype."""
    layers = params["layers"]
    n = len(layers)
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            x = jnp.dot(
                x.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) + b
        else:
            x = jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST) + b
        if i < n - 1:
            x = jax.nn.relu(x)
    if "ln" in params:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = x * params["ln"]["scale"] + params["ln"]["bias"]
    return x
