"""TPU-native HyperGraphNets framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of CemOezcan/hyper-graph-nets for TPU: learned
mesh-based physics simulators (MeshGraphNets + remote-message-passing
HyperGraphNets) with jit/scan-compiled gather->MLP->segment-aggregate
pipelines, static padded shapes, and shard_map-based multi-chip scaling.
"""

__version__ = "0.1.0"
