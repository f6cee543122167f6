"""Load the actual PyTorch reference (/root/reference/src) for golden parity.

The reference depends on packages absent from this image (torch_scatter,
wandb, hdbscan, colorcet, numba).  This bridge installs minimal, behavior-
faithful shims into ``sys.modules`` *before* importing the reference so its
real model code (src/migration/*, src/model/*) runs unmodified on CPU torch.

The torch_scatter shim reproduces the library's semantics exactly as used by
reference src/util.py:92-134 (index tensor pre-broadcast to data shape,
empty segments produce 0), implemented with torch.scatter_add /
scatter_reduce.  wandb/hdbscan/colorcet stubs are import-only placeholders —
any parity path that would genuinely need them fails loudly instead of
silently diverging.
"""
from __future__ import annotations

import sys
import types

import torch

_REFERENCE_ROOT = "/root/reference"


def _make_torch_scatter() -> types.ModuleType:
    mod = types.ModuleType("torch_scatter")

    def _prep(src, index, dim, dim_size):
        if dim_size is None:
            dim_size = int(index.max().item()) + 1 if index.numel() else 0
        shape = list(src.shape)
        shape[dim] = dim_size
        if index.dim() == 1 and src.dim() > 1:
            index = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        return index, shape

    def scatter_add(src, index, dim=0, out=None, dim_size=None):
        index, shape = _prep(src, index, dim, dim_size)
        base = torch.zeros(shape, dtype=src.dtype) if out is None else out
        return base.scatter_add(dim, index, src)

    def scatter_mean(src, index, dim=0, out=None, dim_size=None):
        index, shape = _prep(src, index, dim, dim_size)
        s = torch.zeros(shape, dtype=src.dtype).scatter_add(dim, index, src)
        cnt = torch.zeros(shape, dtype=src.dtype).scatter_add(
            dim, index, torch.ones_like(src)
        )
        return s / cnt.clamp(min=1)

    def _scatter_extremum(src, index, dim, dim_size, reduce):
        index, shape = _prep(src, index, dim, dim_size)
        out = torch.zeros(shape, dtype=src.dtype)
        out.scatter_reduce_(dim, index, src, reduce=reduce, include_self=False)
        arg = torch.zeros(shape, dtype=torch.long)
        return out, arg

    def scatter_max(src, index, dim=0, out=None, dim_size=None):
        return _scatter_extremum(src, index, dim, dim_size, "amax")

    def scatter_min(src, index, dim=0, out=None, dim_size=None):
        return _scatter_extremum(src, index, dim, dim_size, "amin")

    def scatter_std(src, index, dim=0, out=None, dim_size=None, unbiased=True):
        index, shape = _prep(src, index, dim, dim_size)
        s = torch.zeros(shape, dtype=src.dtype).scatter_add(dim, index, src)
        cnt = torch.zeros(shape, dtype=src.dtype).scatter_add(
            dim, index, torch.ones_like(src)
        )
        mean = s / cnt.clamp(min=1)
        sq = torch.zeros(shape, dtype=src.dtype).scatter_add(dim, index, src * src)
        denom = (cnt - 1).clamp(min=1) if unbiased else cnt.clamp(min=1)
        var = (sq - cnt * mean * mean) / denom
        return var.clamp(min=0).sqrt()

    mod.scatter_add = scatter_add
    mod.scatter_mean = scatter_mean
    mod.scatter_max = scatter_max
    mod.scatter_min = scatter_min
    mod.scatter_std = scatter_std
    return mod


def _make_stub(name: str, attrs: dict | None = None) -> types.ModuleType:
    mod = types.ModuleType(name)

    def _fail(*a, _name=name, **k):
        raise RuntimeError(
            f"reference parity harness: stub module '{_name}' was called; "
            "this code path genuinely needs the real package"
        )

    def _getattr(attr, _name=name):
        if attr.startswith("__"):  # introspection (inspect, pickling) stays sane
            raise AttributeError(f"stub module {_name} has no attribute {attr}")
        return _fail

    mod.__getattr__ = _getattr  # type: ignore[assignment]
    for k, v in (attrs or {}).items():
        setattr(mod, k, v)
    return mod


def load_reference():
    """Import and return the reference ``src`` package (idempotent)."""
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _make_torch_scatter()
    if "wandb" not in sys.modules:
        wandb = _make_stub("wandb")
        wandb.log = lambda *a, **k: None
        wandb.init = lambda *a, **k: None
        wandb.run = None
        wandb.Histogram = lambda *a, **k: None
        wandb.Table = lambda *a, **k: None
        wandb.Object3D = lambda *a, **k: None
        sys.modules["wandb"] = wandb
    if "hdbscan" not in sys.modules:
        sys.modules["hdbscan"] = _make_stub("hdbscan")
    if "colorcet" not in sys.modules:
        cc = _make_stub("colorcet")
        cc.glasbey = ["#d60000", "#8c3bff", "#018700", "#00acc6", "#97ff00"] * 52
        sys.modules["colorcet"] = cc
    if "numba" not in sys.modules:
        numba = _make_stub("numba")
        cuda = _make_stub("numba.cuda")
        cuda.jit = lambda *a, **k: (lambda f: f)
        cuda.is_available = lambda: False
        numba.cuda = cuda
        sys.modules["numba"] = numba
        sys.modules["numba.cuda"] = cuda

    if _REFERENCE_ROOT not in sys.path:
        sys.path.append(_REFERENCE_ROOT)
    import src  # noqa: F401  (the reference package)

    return sys.modules["src"]


def torch_mlp_set_params(torch_mlp, jax_mlp_params):
    """Copy one of our MLP param dicts into a reference MLP module.

    ``torch_mlp`` is either ``LazyMLP`` or ``Sequential(LazyMLP, LayerNorm)``
    (reference src/migration/meshgraphnet.py:53-60, 93-108); lazy layers must
    already be materialized (run one forward first).
    """
    import numpy as np

    if isinstance(torch_mlp, torch.nn.Sequential) and not hasattr(torch_mlp, "layers"):
        lazy, ln = torch_mlp[0], torch_mlp[1]
    else:
        lazy, ln = torch_mlp, None
    linears = [m for m in lazy.layers if isinstance(m, torch.nn.Linear)]
    layers = jax_mlp_params["layers"]
    assert len(linears) == len(layers), (len(linears), len(layers))
    with torch.no_grad():
        for lin, lp in zip(linears, layers):
            lin.weight.copy_(torch.from_numpy(np.asarray(lp["w"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(lp["b"])))
        if ln is not None:
            ln.weight.copy_(torch.from_numpy(np.asarray(jax_mlp_params["ln"]["scale"])))
            ln.bias.copy_(torch.from_numpy(np.asarray(jax_mlp_params["ln"]["bias"])))
