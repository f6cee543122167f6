"""Shared CLI/protocol helpers for the controlled accuracy experiments.

Used by tools/control_{plate,flag,cylinder}.py.  Adds the two knobs the
round-2 review asked for (VERDICT.md "Next round" item 5):

- ``--seed N``: seed-variance runs.  Data stays FIXED (trajectory generator
  seeds are part of the protocol); the seed varies model init, training
  noise, and batch-shuffle order — each framework through its own native
  seeding convention (torch/np/random for the reference, ``random_seed``
  for ours).
- ``--shipped``: run "ours" with the numerics the shipped configs actually
  use (``compute_dtype: bfloat16`` + ``agg_vjp: fused``) on the default
  JAX backend (TPU when attached) instead of the f32 CPU control path.

Output naming: ``CONTROL_{system}_{run}_s{seed}[_shipped].json`` for
non-default cells; the legacy seed-0 f32 filenames are left untouched so
round-2 results stay comparable.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_cli(argv, run_names):
    p = argparse.ArgumentParser()
    p.add_argument(
        "runs",
        nargs="*",
        default=["all"],
        help=f"subset of {sorted(run_names)} or 'all'",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--shipped",
        action="store_true",
        help="ours: bfloat16 + fused Pallas kernel on the default backend",
    )
    args = p.parse_args(argv)
    names = (
        sorted(run_names) if args.runs in (["all"], []) else list(args.runs)
    )
    for n in names:
        if n not in run_names:
            p.error(f"unknown run {n!r}; choose from {sorted(run_names)}")
    return names, args.seed, args.shipped


def shipped_overrides(model_cfg: dict) -> dict:
    """The numerics the shipped configs use (configs/*.yaml)."""
    out = dict(model_cfg)
    out["compute_dtype"] = "bfloat16"
    out["agg_vjp"] = "fused"
    return out


def result_path(out_dir: str, system: str, run: str, seed: int,
                shipped: bool) -> str:
    legacy = "" if system == "plate" else f"{system}_"
    # large-mesh tier etc. set CONTROL_TAG so results never collide with
    # the default-protocol files
    extra = os.environ.get("CONTROL_TAG", "")
    if extra:
        extra = f"_{extra}"
    if seed == 0 and not shipped and not extra:
        return os.path.join(out_dir, f"CONTROL_{legacy}{run}.json")
    tag = f"_s{seed}" + ("_shipped" if shipped else "") + extra
    return os.path.join(out_dir, f"CONTROL_{legacy}{run}{tag}.json")


def control_main(system: str, runs: dict, out_dir: str, argv=None) -> None:
    """Shared main(): parse CLI, set the backend, execute, write JSONs.

    ``runs``: name -> fn(seed, shipped) returning the result dict.
    """
    import sys

    os.makedirs(out_dir, exist_ok=True)
    names, seed, shipped = parse_cli(
        sys.argv[1:] if argv is None else argv, set(runs)
    )
    if any(n.startswith("ours") for n in names) and not shipped:
        # f32 accuracy control, not a speed benchmark: run on CPU (must
        # happen before the backend initializes; --shipped keeps the
        # default backend so the fused bf16 TPU path is what executes)
        import jax

        jax.config.update("jax_platforms", "cpu")
    for name in names:
        print(f"== {system}:{name} seed={seed} shipped={shipped} ==",
              flush=True)
        t0 = time.time()
        result = runs[name](seed, shipped)
        result.update(
            run=name, system=system, seed=seed,
            shipped=bool(shipped and name.startswith("ours")),
        )
        path = result_path(out_dir, system, name, seed,
                           shipped and name.startswith("ours"))
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {path} ({time.time() - t0:.0f}s)", flush=True)
