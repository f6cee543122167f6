"""n=1 hardware compile/run check of the GSPMD fused train step (the
multi-chip code path, non-interpret Mosaic lowering on the real chip)."""
import os, sys
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=32768")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np, jax, jax.numpy as jnp
from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.models.flag import FlagModel
from hyper_graph_nets_tpu.training.trainer import Trainer
from hyper_graph_nets_tpu.parallel import sharding

PARAMS = {
    "task": {"dataset": "flag_simple"},
    "model": {
        "field": "world_pos", "history": True, "size": 3, "noise": 0.003,
        "gamma": 0.9, "aggregation": "pna", "learning_rate": 1e-4,
        "message_passing_steps": 2, "compute_dtype": "bfloat16",
        "scan_unroll": 2, "agg_vjp": "fused",
        "rmp": {"clustering": "none", "connector": "none"},
        "graph_balancer": {"algorithm": "none"},
    },
}
traj = add_targets(synthetic.flag_trajectory(num_steps=12, nx=12, ny=12), "world_pos", True)
model = FlagModel(PARAMS)
topo = model.topology_from_trajectory(traj)
assert topo.band_plan is not None
trainer = Trainer(model, PARAMS)
tstate = trainer.init_train_state(jax.random.PRNGKey(0))
mesh = sharding.make_mesh(data=1, graph=1)
st = sharding.shard_topology(topo, mesh)
frames = {k: jnp.asarray(v[:4]) for k, v in traj.items()}
key = jax.random.PRNGKey(7)
replicated = sharding.replicate(jax.tree.map(jnp.copy, tstate), mesh)
step_spmd = sharding.make_spmd_train_step(trainer, st, mesh)
ts2, loss2 = step_spmd(replicated, sharding.shard_frames(frames, mesh), key)
step_single = trainer.make_train_step(topo)
ts1, loss1 = step_single(tstate, frames, key)
print(f"backend={jax.default_backend()} spmd-n1 loss={float(loss2):.6f} single loss={float(loss1):.6f} |d|={abs(float(loss1)-float(loss2)):.2e}")
assert abs(float(loss1) - float(loss2)) < 1e-4
print("SPMD n=1 hardware check OK")
