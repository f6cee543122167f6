"""Golden parity: our network vs a PyTorch transcription of the reference.

The torch side mirrors the reference architecture operation-for-operation
(gather -> concat -> MLP -> residual edge update, pna scatter aggregation ->
node MLP -> residual; reference src/migration/graphnet.py:22-70,
encoder.py:24-47, decoder.py:8-16).  Weights are copied from our param
pytrees, and activations must match allclose — validating that the
TPU-factored implementation (per-node first-layer contributions, gather
aggregation) is mathematically identical to the reference formulation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph
from hyper_graph_nets_tpu.core.mesh import cells_to_edges, receivers_to_gather
from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.nn.blocks import GNNConfig
from hyper_graph_nets_tpu.nn.meshgraphnet import network_apply, network_init

LATENT = 32
MP_STEPS = 3


def torch_mlp_from_params(p, layer_norm=True):
    layers = []
    for i, layer in enumerate(p["layers"]):
        lin = torch.nn.Linear(layer["w"].shape[0], layer["w"].shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(layer["w"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(layer["b"])))
        layers.append(lin)
        if i < len(p["layers"]) - 1:
            layers.append(torch.nn.ReLU())
    if layer_norm and "ln" in p:
        ln = torch.nn.LayerNorm(p["ln"]["scale"].shape[0])
        with torch.no_grad():
            ln.weight.copy_(torch.from_numpy(np.asarray(p["ln"]["scale"])))
            ln.bias.copy_(torch.from_numpy(np.asarray(p["ln"]["bias"])))
        layers.append(ln)
    return torch.nn.Sequential(*layers)


def scatter_pna(feats, rcv, n):
    """Reference pna aggregation order: sum, mean, max, min (graphnet.py:52-64)."""
    E, F = feats.shape
    s = torch.zeros(n, F).index_add(0, rcv, feats)
    cnt = torch.zeros(n, 1).index_add(0, rcv, torch.ones(E, 1))
    mean = s / cnt.clamp(min=1)
    mx = torch.full((n, F), -torch.inf).index_reduce(0, rcv, feats, "amax", include_self=True)
    mx = torch.where(torch.isinf(mx), torch.zeros_like(mx), mx)
    mn = torch.full((n, F), torch.inf).index_reduce(0, rcv, feats, "amin", include_self=True)
    mn = torch.where(torch.isinf(mn), torch.zeros_like(mn), mn)
    return torch.cat([s, mean, mx, mn], dim=-1)


def reference_torch_forward(params, node_in, edge_in, snd, rcv, cfg):
    """Faithful transcription of the reference Encode-Process-Decode."""
    node_in = torch.from_numpy(node_in)
    edge_in = torch.from_numpy(edge_in)
    snd = torch.from_numpy(snd.astype(np.int64))
    rcv = torch.from_numpy(rcv.astype(np.int64))
    n = node_in.shape[0]

    with torch.no_grad():
        enc_node = torch_mlp_from_params(params["encoder"]["node_model"])
        enc_edge = torch_mlp_from_params(
            params["encoder"]["edge_models"]["mesh_edges"]
        )
        nodes = enc_node(node_in)
        edges = enc_edge(edge_in)

        per_block = []
        for step in range(cfg.message_passing_steps):
            block = jax.tree.map(lambda x: np.asarray(x[step]), params["processor"])
            edge_mlp = torch_mlp_from_params(block["edge_models"]["mesh_edges"])
            node_mlp = torch_mlp_from_params(block["node_model_cross"])
            # edge update: concat(sender, receiver, edge) -> MLP -> residual
            ef = torch.cat(
                [nodes.index_select(0, snd), nodes.index_select(0, rcv), edges], dim=-1
            )
            edges = edges + edge_mlp(ef)
            # node update: concat(node, pna aggregates) -> MLP -> residual
            agg = scatter_pna(edges, rcv, n)
            nodes = nodes + node_mlp(torch.cat([nodes, agg], dim=-1))
            per_block.append(nodes.numpy().copy())

        dec = torch_mlp_from_params(params["decoder"], layer_norm=False)
        return dec(nodes).numpy(), per_block


@pytest.fixture(scope="module")
def setup():
    traj = synthetic.flag_trajectory(num_steps=3, nx=6, ny=6)
    edges = cells_to_edges(traj["cells"][0])
    n = 36
    rng = np.random.RandomState(0)
    node_in = rng.randn(n, 5).astype(np.float32)
    edge_in = rng.randn(len(edges.senders), 7).astype(np.float32)
    cfg = GNNConfig(
        output_size=3,
        node_in_dim=5,
        edge_in_dims=(("mesh_edges", 7),),
        latent_size=LATENT,
        num_layers=2,
        message_passing_steps=MP_STEPS,
        aggregation="pna",
        architecture="none",
    )
    params = network_init(jax.random.PRNGKey(0), cfg)
    return traj, edges, node_in, edge_in, cfg, params


class TestTorchParity:
    def _jax_forward(self, edges, node_in, edge_in, cfg, params, use_gather):
        gi = gv = None
        if use_gather:
            gidx, gvalid = receivers_to_gather(edges.receivers, 36)
            gi, gv = jnp.asarray(gidx), jnp.asarray(gvalid)
        graph = Graph(
            node_features=jnp.asarray(node_in),
            edge_sets={
                "mesh_edges": EdgeSet(
                    features=jnp.asarray(edge_in),
                    senders=jnp.asarray(edges.senders),
                    receivers=jnp.asarray(edges.receivers),
                    gather_idx=gi,
                    gather_valid=gv,
                )
            },
        )
        return np.asarray(network_apply(params, graph, cfg))

    @pytest.mark.parametrize("use_gather", [False, True])
    def test_full_forward_matches_reference_transcription(self, setup, use_gather):
        traj, edges, node_in, edge_in, cfg, params = setup
        got = self._jax_forward(edges, node_in, edge_in, cfg, params, use_gather)
        want, _ = reference_torch_forward(
            params, node_in, edge_in, edges.senders, edges.receivers, cfg
        )
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)

    def test_per_layer_activations_match(self, setup):
        """Per-MP-step node latents match the reference transcription
        (the BASELINE per-layer-activation requirement)."""
        from hyper_graph_nets_tpu.nn.meshgraphnet import network_activations

        traj, edges, node_in, edge_in, cfg, params = setup
        graph = Graph(
            node_features=jnp.asarray(node_in),
            edge_sets={
                "mesh_edges": EdgeSet(
                    features=jnp.asarray(edge_in),
                    senders=jnp.asarray(edges.senders),
                    receivers=jnp.asarray(edges.receivers),
                )
            },
        )
        acts = network_activations(params, graph, cfg)
        _, torch_blocks = reference_torch_forward(
            params, node_in, edge_in, edges.senders, edges.receivers, cfg
        )
        assert len(acts["blocks"]) == MP_STEPS
        for step in range(MP_STEPS):
            np.testing.assert_allclose(
                np.asarray(acts["blocks"][step]),
                torch_blocks[step],
                rtol=5e-4,
                atol=5e-5,
                err_msg=f"block {step}",
            )

    def test_gather_and_scatter_paths_agree(self, setup):
        traj, edges, node_in, edge_in, cfg, params = setup
        a = self._jax_forward(edges, node_in, edge_in, cfg, params, False)
        b = self._jax_forward(edges, node_in, edge_in, cfg, params, True)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
