"""Multi-host (pod-slice) utilities.

On a TPU pod slice every host runs the same program (SPMD).  The recipe:

1. ``jax.distributed.initialize()`` (launch/tpu_pod_train.sh does this);
2. build a global mesh over all devices: data axis across hosts (DCN),
   graph axis across each host's chips (ICI) — so halo/aggregate
   collectives ride ICI and only gradient all-reduce crosses DCN;
3. each host loads its own shard of trajectories and assembles global
   arrays with ``jax.make_array_from_process_local_data``.

Single-process (process_count == 1) degrades to the plain local mesh, so
the same code path runs everywhere and is exercised by the test suite.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pod_mesh(graph_per_host: int = 0) -> Mesh:
    """('data', 'graph') mesh: data across hosts, graph within each host."""
    devices = np.asarray(jax.devices())
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    graph = graph_per_host or n_local
    data = (n_proc * n_local) // graph
    return Mesh(devices[: data * graph].reshape(data, graph), ("data", "graph"))


def host_local_batch_to_global(
    frames: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Assemble per-host frame batches into one global data-sharded batch.

    Each host passes its local ``[B_local, ...]`` arrays; the result is a
    global ``[B_local * num_data_shards, ...]`` array sharded over 'data'.
    """
    out = {}
    for key, val in frames.items():
        spec = P("data", *([None] * (np.ndim(val) - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            out[key] = jax.device_put(jnp.asarray(val), sharding)
        else:
            out[key] = jax.make_array_from_process_local_data(
                sharding, np.asarray(val)
            )
    return out


def host_trajectory_indices(num_trajectories: int) -> range:
    """Round-robin trajectory assignment for this host's data loader."""
    return range(jax.process_index(), num_trajectories, jax.process_count())
