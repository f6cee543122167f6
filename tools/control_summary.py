"""Aggregate controlled-accuracy results into mean +/- range tables.

Reads control_out/CONTROL_*.json (all seeds / numerics tiers) and prints
the markdown tables for BENCHMARKS.md "Controlled accuracy": per system
(plate / flag / cylinder) x run (ref/ours x mgn/hgn) x numerics
(f32-cpu control vs shipped bf16+fused TPU), with three metrics:

- final-epoch aligned rollout MSE (computed outside both frameworks)
- best (min over epochs) aligned rollout MSE
- last-3-epoch mean aligned rollout MSE (stability)
- 10-step loss (each framework's own n_step_last convention)

Usage: python tools/control_summary.py [--json]
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "control_out")

NAME_RE = re.compile(
    r"CONTROL_(?:(?P<sys>flag|cylinder)_)?(?P<run>(?:ref|ours)-(?:mgn|hgn))"
    r"(?:_s(?P<seed>\d+))?(?P<ship>_shipped)?(?:_(?P<tag>\w+))?\.json$"
)


def load_all():
    cells = defaultdict(list)  # (system, run, numerics, tag) -> [record]
    for path in sorted(glob.glob(os.path.join(OUT_DIR, "CONTROL_*.json"))):
        m = NAME_RE.search(os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            d = json.load(f)
        if d.get("unsupported"):
            continue
        system = m.group("sys") or "plate"
        run = m.group("run")
        seed = int(m.group("seed") or 0)
        numerics = "shipped" if m.group("ship") else "f32"
        tag = m.group("tag") or ""
        hist = d.get("history") or []
        if not hist:
            continue
        aligned = [h["rollout_mse_aligned"] for h in hist]
        cells[(system, run, numerics, tag)].append(
            {
                "seed": seed,
                "final": aligned[-1],
                "best": min(aligned),
                "last3": float(np.mean(aligned[-3:])),
                "n_step_last": d.get("n_step_last_loss"),
                "wall_s": d.get("total_wall_s"),
            }
        )
    return cells


def fmt(vals):
    vals = [v for v in vals if v is not None]
    if not vals:
        return "-"
    m = np.mean(vals)
    if len(vals) == 1:
        return f"{m:.2e}"
    return f"{m:.2e} ± {(max(vals) - min(vals)) / 2:.1e}"


def main():
    cells = load_all()
    if "--json" in sys.argv:
        out = {
            "|".join(k): v for k, v in sorted(cells.items())
        }
        print(json.dumps(out, indent=1, default=float))
        return
    for tag in sorted({k[3] for k in cells}):
        label = f" [{tag}]" if tag else ""
        for system in ("plate", "flag", "cylinder"):
            rows = [
                (run, numerics)
                for (s, run, numerics, t) in cells
                if s == system and t == tag
            ]
            if not rows:
                continue
            print(f"\n### {system}{label}")
            print("| run | numerics | seeds | final rollout | best rollout "
                  "| last-3 rollout | 10-step last |")
            print("|---|---|---|---|---|---|---|")
            for run in ("ref-mgn", "ref-hgn", "ours-mgn", "ours-hgn"):
                for numerics in ("f32", "shipped"):
                    rec = cells.get((system, run, numerics, tag))
                    if not rec:
                        continue
                    seeds = sorted(r["seed"] for r in rec)
                    print(
                        f"| {run} | {numerics} | {seeds} "
                        f"| {fmt([r['final'] for r in rec])} "
                        f"| {fmt([r['best'] for r in rec])} "
                        f"| {fmt([r['last3'] for r in rec])} "
                        f"| {fmt([r['n_step_last'] for r in rec])} |"
                    )


if __name__ == "__main__":
    main()
