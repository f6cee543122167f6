"""Every shipped config parses, builds its model, and wires the factories.

Guards the configs/ directory against schema drift (keys the code no
longer reads, values the factories reject) — the reference ships configs
that must stay loadable (reference configs/*.yaml)."""
import glob
import os

import pytest

from hyper_graph_nets_tpu.balancer.base import get_balancer
from hyper_graph_nets_tpu.models.get_model import get_model
from hyper_graph_nets_tpu.rmp.remote_message_passing import get_rmp
from hyper_graph_nets_tpu.utils.config import read_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(REPO, "configs", "*.yaml"))
)


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds(name):
    config = read_yaml(name)
    params = config.get("params", config)
    assert "task" in params and "model" in params, name
    model = get_model(config)
    cfg = model.gnn_config  # derives the full static schema
    assert cfg.message_passing_steps >= 1
    assert cfg.agg_vjp in ("xla", "gather", "sorted", "fused")
    get_rmp(params)  # None or a configured RMP
    get_balancer(params)


def test_all_configs_discovered():
    # the reference ships flag/cylinder/plate families; ours adds demos
    assert {"flag", "cylinder", "plate", "hyper", "plateCluster"} <= set(
        CONFIGS
    ), CONFIGS


def test_fused_requires_pna_warning():
    """agg_vjp='fused' with non-pna aggregation silently falls back to the
    unfused path (~1.5x slower); the model must warn at build time."""
    import warnings

    import pytest

    params = {
        "task": {"dataset": "flag_minimal"},
        "model": {
            "field": "world_pos", "history": True, "size": 3,
            "noise": 0.003, "gamma": 0.9, "aggregation": "sum",
            "learning_rate": 1e-3, "message_passing_steps": 2,
            "agg_vjp": "fused",
            "rmp": {"clustering": "none", "connector": "none"},
            "graph_balancer": {"algorithm": "none"},
        },
    }
    from hyper_graph_nets_tpu.models.flag import FlagModel

    with pytest.warns(UserWarning, match="aggregation='pna'"):
        FlagModel(params)
    # pna + fused is the supported combination: no warning
    params["model"]["aggregation"] = "pna"
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        FlagModel(params)
