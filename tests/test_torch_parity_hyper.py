"""Golden parity for the HyperGraphNet (hierarchical) architecture.

Torch side transcribes the reference's ordered sub-step sequence
(reference src/migration/hypergraphnet.py:21-54 + graphnet.py:86-124):
mesh edges -> mesh nodes -> up edges -> hyper nodes (up model) -> inter
edges -> hyper nodes (cross model) -> down edges -> mesh nodes (down model),
with node-feature mutations visible to later sub-steps and edge updates
always reading the block-input edge features.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph
from hyper_graph_nets_tpu.core.mesh import cells_to_edges
from hyper_graph_nets_tpu.data import synthetic
from hyper_graph_nets_tpu.nn.blocks import GNNConfig
from hyper_graph_nets_tpu.nn.meshgraphnet import network_apply, network_init
from tests.test_torch_parity import scatter_pna, torch_mlp_from_params

N, K, LATENT, MP = 36, 4, 32, 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    traj = synthetic.flag_trajectory(num_steps=3, nx=6, ny=6)
    mesh_edges = cells_to_edges(traj["cells"][0])

    labels = rng.randint(0, K, N)
    up_snd = np.arange(N, dtype=np.int32)
    up_rcv = (N + labels).astype(np.int32)
    order = np.argsort(up_rcv, kind="stable")
    up_snd, up_rcv = up_snd[order], up_rcv[order]
    down_snd, down_rcv = up_rcv.copy(), up_snd.copy()
    order = np.argsort(down_rcv, kind="stable")
    down_snd, down_rcv = down_snd[order], down_rcv[order]
    inter = np.asarray(
        [(N + a, N + b) for a in range(K) for b in range(K) if a != b], np.int32
    )
    inter_snd, inter_rcv = inter[:, 0], inter[:, 1]
    order = np.argsort(inter_rcv, kind="stable")
    inter_snd, inter_rcv = inter_snd[order], inter_rcv[order]

    feats = {
        "node": rng.randn(N, 5).astype(np.float32),
        "hyper": rng.randn(K, 8).astype(np.float32),
        "mesh_edges": rng.randn(len(mesh_edges.senders), 7).astype(np.float32),
        "intra_cluster_to_cluster": rng.randn(N, 7).astype(np.float32),
        "intra_cluster_to_mesh": rng.randn(N, 7).astype(np.float32),
        "inter_cluster": rng.randn(len(inter_snd), 7).astype(np.float32),
    }
    topo = {
        "mesh_edges": (mesh_edges.senders, mesh_edges.receivers),
        "intra_cluster_to_cluster": (up_snd, up_rcv),
        "intra_cluster_to_mesh": (down_snd, down_rcv),
        "inter_cluster": (inter_snd, inter_rcv),
    }
    cfg = GNNConfig(
        output_size=3,
        node_in_dim=5,
        edge_in_dims=(
            ("mesh_edges", 7),
            ("intra_cluster_to_cluster", 7),
            ("intra_cluster_to_mesh", 7),
            ("inter_cluster", 7),
        ),
        latent_size=LATENT,
        num_layers=2,
        message_passing_steps=MP,
        aggregation="pna",
        architecture="hyper",
        hyper_in_dim=8,
    )
    params = network_init(jax.random.PRNGKey(0), cfg)
    return feats, topo, cfg, params


def torch_hyper_forward(params, feats, topo, cfg):
    t = {k: torch.from_numpy(v) for k, v in feats.items()}
    idx = {
        k: (torch.from_numpy(s.astype(np.int64)), torch.from_numpy(r.astype(np.int64)))
        for k, (s, r) in topo.items()
    }
    total = N + K

    with torch.no_grad():
        enc = params["encoder"]
        nodes = torch_mlp_from_params(enc["node_model"])(t["node"])
        hyper = torch_mlp_from_params(enc["hyper_node_model"])(t["hyper"])
        edges = {
            name: torch_mlp_from_params(enc["edge_models"][name])(t[name])
            for name in idx
        }

        def upd_edges(block, name, cur_nodes, block_input_edges):
            s, r = idx[name]
            mlp = torch_mlp_from_params(block["edge_models"][name])
            ef = torch.cat(
                [cur_nodes.index_select(0, s), cur_nodes.index_select(0, r),
                 block_input_edges[name]],
                dim=-1,
            )
            return block_input_edges[name] + mlp(ef)

        def node_upd(model_params, names, all_nodes, new_edges, rows):
            agg = torch.cat(
                [scatter_pna(new_edges[n], idx[n][1], total) for n in names], dim=-1
            )
            feats_cat = torch.cat([all_nodes, agg], dim=-1)
            mlp = torch_mlp_from_params(model_params)
            return mlp(feats_cat[rows])

        for step in range(cfg.message_passing_steps):
            block = jax.tree.map(lambda x: np.asarray(x[step]), params["processor"])
            block_input = dict(edges)
            new_edges = {}
            # 1: mesh edges -> mesh nodes
            allv = torch.cat([nodes, hyper], dim=0)
            new_edges["mesh_edges"] = upd_edges(block, "mesh_edges", allv, block_input)
            nodes = nodes + node_upd(
                block["node_model_cross"], ["mesh_edges"], allv, new_edges,
                slice(0, N),
            )
            # 2: up edges -> hyper nodes
            allv = torch.cat([nodes, hyper], dim=0)
            new_edges["intra_cluster_to_cluster"] = upd_edges(
                block, "intra_cluster_to_cluster", allv, block_input
            )
            hyper = hyper + node_upd(
                block["hyper_node_model_up"], ["intra_cluster_to_cluster"], allv,
                new_edges, slice(N, total),
            )
            # 3: inter edges -> hyper nodes
            allv = torch.cat([nodes, hyper], dim=0)
            new_edges["inter_cluster"] = upd_edges(
                block, "inter_cluster", allv, block_input
            )
            hyper = hyper + node_upd(
                block["hyper_node_model_cross"], ["inter_cluster"], allv, new_edges,
                slice(N, total),
            )
            # 4: down edges -> mesh nodes
            allv = torch.cat([nodes, hyper], dim=0)
            new_edges["intra_cluster_to_mesh"] = upd_edges(
                block, "intra_cluster_to_mesh", allv, block_input
            )
            nodes = nodes + node_upd(
                block["node_model_down"], ["intra_cluster_to_mesh"], allv, new_edges,
                slice(0, N),
            )
            edges = new_edges

        dec = torch_mlp_from_params(params["decoder"], layer_norm=False)
        return dec(nodes).numpy()


class TestHyperParity:
    def test_hyper_forward_matches_reference_transcription(self, setup):
        feats, topo, cfg, params = setup
        graph = Graph(
            node_features=jnp.asarray(feats["node"]),
            hyper_features=jnp.asarray(feats["hyper"]),
            edge_sets={
                name: EdgeSet(
                    features=jnp.asarray(feats[name]),
                    senders=jnp.asarray(s),
                    receivers=jnp.asarray(r),
                )
                for name, (s, r) in topo.items()
            },
        )
        got = np.asarray(network_apply(params, graph, cfg))
        want = torch_hyper_forward(params, feats, topo, cfg)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
