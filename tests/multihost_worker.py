"""Worker for the 2-process jax.distributed CPU test (tests/test_multihost.py).

Each process simulates one pod host with 4 local CPU devices; together they
form the ('data', 'graph') pod mesh (data across hosts, graph within each
host — parallel/multihost.py).  Verifies:

- make_pod_mesh shape/layout,
- host_local_batch_to_global assembles per-host batches into one global
  data-sharded array whose jitted global reduction matches the full-batch
  value on every host,
- host_trajectory_indices round-robins disjointly,
- one SPMD train step on the pod mesh produces a finite, host-consistent loss.

Run: multihost_worker.py <process_id> <num_processes> <coordinator_port>
"""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyper_graph_nets_tpu.parallel import multihost, sharding

assert jax.process_count() == num_procs, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert len(jax.devices()) == 4 * num_procs

mesh = multihost.make_pod_mesh()
assert mesh.shape == {"data": num_procs, "graph": 4}, mesh.shape

# --- host-local -> global batch assembly ---------------------------------
B_local = 3
rng = np.random.RandomState(100 + proc_id)
local = {"x": rng.randn(B_local, 7, 2).astype(np.float32)}
global_batch = multihost.host_local_batch_to_global(local, mesh)
assert global_batch["x"].shape == (B_local * num_procs, 7, 2)

total = jax.jit(lambda x: jnp.sum(x))(global_batch["x"])
# every host knows every host's seed -> can compute the expected global sum
expected = sum(
    np.random.RandomState(100 + p).randn(B_local, 7, 2).astype(np.float32).sum()
    for p in range(num_procs)
)
assert abs(float(total) - float(expected)) < 1e-3, (float(total), expected)

# --- round-robin trajectory assignment -----------------------------------
mine = set(multihost.host_trajectory_indices(10))
assert mine == set(range(proc_id, 10, num_procs))

# --- one SPMD train step over the pod mesh -------------------------------
from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.training.trainer import Trainer

PARAMS = {
    "task": {"dataset": "flag_minimal"},
    "model": {
        "field": "world_pos",
        "history": True,
        "size": 3,
        "noise": 0.003,
        "gamma": 0.9,
        "aggregation": "pna",
        "learning_rate": 1e-3,
        "message_passing_steps": 1,
        "rmp": {"clustering": "none", "connector": "none"},
        "graph_balancer": {"algorithm": "none"},
    },
}
traj = add_targets(
    synthetic.flag_trajectory(num_steps=8, nx=5, ny=5), "world_pos", True
)
model = FlagModel(PARAMS)
topo = model.topology_from_trajectory(traj)
trainer = Trainer(model, PARAMS)
tstate = sharding.replicate(trainer.init_train_state(jax.random.PRNGKey(0)), mesh)
st = sharding.shard_topology(topo, mesh)
step = sharding.make_spmd_train_step(trainer, st, mesh)

# each host contributes its local slice of the global frame batch
local_frames = {
    k: np.asarray(v[proc_id * 2 : proc_id * 2 + 2])
    for k, v in traj.items()
    if k != "cells"
}
frames = multihost.host_local_batch_to_global(local_frames, mesh)
tstate, loss = step(tstate, frames, jax.random.PRNGKey(1))
loss = float(loss)
assert np.isfinite(loss), loss

print(f"MULTIHOST_OK proc={proc_id} loss={loss:.6f}", flush=True)
