"""TPU-native HyperGraphNets framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of CemOezcan/hyper-graph-nets for TPU: learned
mesh-based physics simulators (MeshGraphNets + remote-message-passing
HyperGraphNets) with jit/scan-compiled gather->MLP->segment-aggregate
pipelines, static padded shapes, and shard_map/GSPMD multi-chip scaling.

Top-level convenience API::

    from hyper_graph_nets_tpu import get_task, read_yaml
    task = get_task(read_yaml("minimal"))
    task.run_iterations()
    print(task.get_scalars())
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports keep `import hyper_graph_nets_tpu` light
    if name in ("get_task", "MeshTask"):
        from hyper_graph_nets_tpu.training import task as _task

        return getattr(_task, name)
    if name == "get_algorithm":
        from hyper_graph_nets_tpu.training.get_algorithm import get_algorithm

        return get_algorithm
    if name == "get_model":
        from hyper_graph_nets_tpu.models.get_model import get_model

        return get_model
    if name == "get_rmp":
        from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp

        return get_rmp
    if name == "get_balancer":
        from hyper_graph_nets_tpu.balancer.base import get_balancer

        return get_balancer
    if name == "get_data":
        from hyper_graph_nets_tpu.data.loader import get_data

        return get_data
    if name == "read_yaml":
        from hyper_graph_nets_tpu.utils.config import read_yaml

        return read_yaml
    if name == "Predictor":
        from hyper_graph_nets_tpu.serving import Predictor

        return Predictor
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_task",
    "MeshTask",
    "get_algorithm",
    "get_model",
    "get_rmp",
    "get_balancer",
    "get_data",
    "read_yaml",
    "Predictor",
]
