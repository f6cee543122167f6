"""Model factory (reference src/model/get_model.py:13-22 parity)."""
from __future__ import annotations

from hyper_graph_nets_tpu.models.base import SystemModel
from hyper_graph_nets_tpu.utils.config import get_from_nested_dict


def get_model(config: dict) -> SystemModel:
    params = config.get("params", config)
    dataset = get_from_nested_dict(params, ["task", "dataset"], raise_error=True)
    if "flag" in dataset:
        from hyper_graph_nets_tpu.models.flag import FlagModel

        return FlagModel(params)
    if "cylinder" in dataset:
        from hyper_graph_nets_tpu.models.cylinder import CylinderModel

        return CylinderModel(params)
    if "plate" in dataset:
        from hyper_graph_nets_tpu.models.plate import PlateModel

        return PlateModel(params)
    raise NotImplementedError(f"unknown dataset {dataset!r}")
