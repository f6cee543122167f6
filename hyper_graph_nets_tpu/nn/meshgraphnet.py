"""Encode-Process-Decode network facade.

Parity with reference src/migration/meshgraphnet.py:21-108 (MeshGraphNet),
encoder.py:9-47, processor.py:10-28, decoder.py:8-16.

TPU-native design: the processor's ``message_passing_steps`` blocks have
identical pytree structure (unshared weights, like the reference's
nn.Sequential), so their params are *stacked* on a leading axis and the
processor is a single ``lax.scan`` — one trace/compile of the block
regardless of depth.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hyper_graph_nets_tpu.core.graph import Graph
from hyper_graph_nets_tpu.nn.blocks import GNNConfig, block_apply, block_init
from hyper_graph_nets_tpu.nn.mlp import mlp_apply, mlp_init

Array = jax.Array


def network_init(key: Array, cfg: GNNConfig) -> dict:
    """Initialize encoder, stacked processor blocks, and decoder."""
    L = cfg.latent_size
    widths = cfg.mlp_widths(L)
    key, k_node, k_dec = jax.random.split(key, 3)

    encoder: dict = {"node_model": mlp_init(k_node, cfg.node_in_dim, widths)}
    encoder["edge_models"] = {}
    edge_dims = dict(cfg.edge_in_dims)
    for name in cfg.edge_sets:
        key, k = jax.random.split(key)
        encoder["edge_models"][name] = mlp_init(k, edge_dims[name], widths)
    if cfg.hyper_in_dim is not None and cfg.hierarchical:
        key, k = jax.random.split(key)
        encoder["hyper_node_model"] = mlp_init(k, cfg.hyper_in_dim, widths)
    elif cfg.hyper_in_dim is not None and cfg.hyper_in_dim != cfg.node_in_dim:
        # Non-hierarchical two-tier graphs (multigraph connector) share the
        # node encoder in the reference (encoder.py:31-36); that requires
        # equal dims — otherwise give the hyper tier its own encoder.
        key, k = jax.random.split(key)
        encoder["hyper_node_model"] = mlp_init(k, cfg.hyper_in_dim, widths)

    blocks = []
    for _ in range(cfg.message_passing_steps):
        key, k = jax.random.split(key)
        blocks.append(block_init(k, cfg))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    decoder = mlp_init(k_dec, L, cfg.mlp_widths(cfg.output_size), layer_norm=False)
    return {"encoder": encoder, "processor": stacked, "decoder": decoder}


def encoder_apply(params: dict, graph: Graph, cfg: GNNConfig) -> Graph:
    """Encode raw node/edge features into latents.

    Edge sets without a registered encoder MLP are silently dropped, matching
    the reference (encoder.py:38-45).
    """
    enc = params["encoder"]
    node_latents = mlp_apply(enc["node_model"], graph.node_features, cfg.cd)
    hyper_latents = None
    if graph.hyper_features is not None and graph.hyper_features.shape[-2] > 0:
        model = enc.get("hyper_node_model", enc["node_model"])
        hyper_latents = mlp_apply(model, graph.hyper_features, cfg.cd)

    new_sets = {}
    for name, es in graph.edge_sets.items():
        if name not in enc["edge_models"]:
            continue  # silently drop unregistered edge sets
        new_sets[name] = es.replace(
            features=mlp_apply(enc["edge_models"][name], es.features, cfg.cd)
        )
    return graph.replace(
        node_features=node_latents, hyper_features=hyper_latents, edge_sets=new_sets
    )


def processor_apply(params: dict, graph: Graph, cfg: GNNConfig) -> Graph:
    """Run the message-passing blocks via lax.scan over stacked params.

    (A python loop over static param slices at full unroll was measured
    identical to scan-with-unroll on TPU v5e — XLA already folds the
    per-iteration slices — so the single scan formulation is kept.)
    """

    def body(g, block_params):
        return block_apply(block_params, g, cfg), None

    if cfg.remat:
        body = jax.checkpoint(body)
    graph, _ = jax.lax.scan(
        body, graph, params["processor"], unroll=cfg.scan_unroll
    )
    return graph


def decoder_apply(params: dict, graph: Graph, cfg: GNNConfig) -> Array:
    out = mlp_apply(params["decoder"], graph.node_features, cfg.cd)
    return out.astype(jnp.float32)


def network_apply(params: dict, graph: Graph, cfg: GNNConfig) -> Array:
    """Full forward: encode -> process -> decode mesh-node outputs.

    Returns per-mesh-node outputs ``[N, output_size]`` (reference
    meshgraphnet.py:46-51 takes ``node_features[0]`` before decoding).
    """
    latent = encoder_apply(params, graph, cfg)
    latent = processor_apply(params, latent, cfg)
    return decoder_apply(params, latent, cfg)


def network_activations(params: dict, graph: Graph, cfg: GNNConfig) -> dict:
    """Forward pass capturing per-layer activations (parity/debug tool).

    Returns {'encoder': Graph, 'blocks': [node latents per MP step],
    'hyper_blocks': [...] or None, 'output': decoded}.  Supports the
    BASELINE requirement of per-layer activation comparison against the
    reference.
    """
    latent = encoder_apply(params, graph, cfg)
    enc = latent

    def body(g, block_params):
        g = block_apply(block_params, g, cfg)
        out = (g.node_features, g.hyper_features) if g.hyper_features is not None else (g.node_features,)
        return g, out

    latent, stacked = jax.lax.scan(body, latent, params["processor"])
    blocks = list(stacked[0])
    hyper_blocks = list(stacked[1]) if len(stacked) > 1 else None
    return {
        "encoder": enc,
        "blocks": blocks,
        "hyper_blocks": hyper_blocks,
        "output": decoder_apply(params, latent, cfg),
    }
