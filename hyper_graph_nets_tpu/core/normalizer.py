"""Online feature normalizer as pure functional state.

Parity with reference src/migration/normalizer.py:9-75: accumulates
count/sum/sum-of-squares up to ``max_accumulations`` calls, standardizes with
``(x - mean) / max(std, eps)``, and supports the inverse transform for
de-normalizing network outputs.  Unlike the reference's mutating nn.Module,
state is an explicit pytree threaded through jitted functions, so the same
code runs under jit/vmap/scan and checkpoints trivially.

Masking support is a TPU-native addition: padded rows (static-shape padding)
are excluded from the statistics.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class NormalizerState:
    acc_count: Array  # scalar f32 — number of accumulated rows
    num_accumulations: Array  # scalar f32 — number of accumulate() calls
    acc_sum: Array  # [F]
    acc_sum_squared: Array  # [F]
    max_accumulations: float = struct.field(pytree_node=False, default=10**6)
    std_epsilon: float = struct.field(pytree_node=False, default=1e-8)

    @property
    def size(self) -> int:
        return self.acc_sum.shape[-1]


def init(size: int, max_accumulations: float = 10**6, std_epsilon: float = 1e-8) -> NormalizerState:
    return NormalizerState(
        acc_count=jnp.zeros((), jnp.float32),
        num_accumulations=jnp.zeros((), jnp.float32),
        acc_sum=jnp.zeros((size,), jnp.float32),
        acc_sum_squared=jnp.zeros((size,), jnp.float32),
        max_accumulations=max_accumulations,
        std_epsilon=std_epsilon,
    )


def mean(state: NormalizerState) -> Array:
    safe_count = jnp.maximum(state.acc_count, 1.0)
    return state.acc_sum / safe_count


def std_with_epsilon(state: NormalizerState) -> Array:
    safe_count = jnp.maximum(state.acc_count, 1.0)
    var = jnp.abs(state.acc_sum_squared / safe_count - mean(state) ** 2)
    return jnp.maximum(jnp.sqrt(var), state.std_epsilon)


def accumulate(
    state: NormalizerState, data: Array, mask: Optional[Array] = None
) -> NormalizerState:
    """Fold a batch of rows into the running statistics.

    ``data`` may have any leading shape; all but the last axis are treated as
    rows.  ``mask`` (matching the leading shape) excludes padded rows.
    """
    flat = data.reshape(-1, data.shape[-1]).astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(-1, 1).astype(jnp.float32)
        flat = flat * m
        count = jnp.sum(m)
    else:
        count = jnp.asarray(flat.shape[0], jnp.float32)
    # Gate on the accumulation cap exactly like the reference (normalizer.py:45-47).
    do = (state.num_accumulations < state.max_accumulations).astype(jnp.float32)
    return state.replace(
        acc_count=state.acc_count + do * count,
        num_accumulations=state.num_accumulations + do,
        acc_sum=state.acc_sum + do * jnp.sum(flat, axis=0),
        acc_sum_squared=state.acc_sum_squared + do * jnp.sum(flat * flat, axis=0),
    )


def normalize(
    state: NormalizerState,
    data: Array,
    accumulate_stats: bool = False,
    mask: Optional[Array] = None,
) -> tuple[Array, NormalizerState]:
    """Standardize ``data``; optionally accumulate statistics first (training)."""
    if accumulate_stats:
        state = accumulate(state, data, mask)
    out = (data - mean(state)) / std_with_epsilon(state)
    return out, state


def inverse(state: NormalizerState, data: Array) -> Array:
    """De-normalize network outputs (reference normalizer.py:53-55)."""
    return data * std_with_epsilon(state) + mean(state)
