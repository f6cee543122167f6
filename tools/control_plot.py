"""Render the round-5 multi-seed control curves PNG.

One panel per system (plate / flag / cylinder / plate-big): aligned rollout
MSE (log y) vs epoch; per run a mean line over seeds with a min-max seed
band.  Colors follow the entity (fixed categorical slots, validated default
palette from the dataviz reference; yellow's light-surface contrast caveat
is covered by direct labels + the tables in BENCHMARKS.md).

Usage: python tools/control_plot.py  -> control_out/control_r5_curves.png
"""
from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.control_summary import load_all  # noqa: E402

SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"
# fixed categorical slots — color follows the run identity everywhere
COLORS = {
    "ref-mgn": "#2a78d6",   # blue
    "ref-hgn": "#eb6834",   # orange
    "ours-mgn": "#1baf7a",  # aqua
    "ours-hgn": "#eda100",  # yellow
}
LABELS = {
    "ref-mgn": "torch ref MGN",
    "ref-hgn": "torch ref HGN",
    "ours-mgn": "ours MGN (bf16+fused)",
    "ours-hgn": "ours HGN (bf16+fused)",
}

PANELS = [
    ("plate", "", "plate contact (153 nodes, 10 ep)"),
    ("flag", "", "flag (144 nodes, 10 ep)"),
    ("cylinder", "", "cylinder (10 ep; ref-HGN crashes)"),
    ("plate", "big15", "plate LARGE contact (1105 nodes, 15 ep)"),
]


def curves_for(cells, system, tag):
    """run -> list of per-seed aligned-MSE curves (prefers shipped cells)."""
    import glob
    import json
    import re

    out = {}
    name_re = re.compile(
        r"CONTROL_(?:(?P<sys>flag|cylinder)_)?(?P<run>(?:ref|ours)-(?:mgn|hgn))"
        r"(?:_s(?P<seed>\d+))?(?P<ship>_shipped)?(?:_(?P<tag>\w+))?\.json$"
    )
    for path in sorted(glob.glob(os.path.join(REPO, "control_out", "CONTROL_*.json"))):
        m = name_re.search(os.path.basename(path))
        if not m:
            continue
        if (m.group("sys") or "plate") != system or (m.group("tag") or "") != tag:
            continue
        run = m.group("run")
        # ours: shipped numerics only (the headline cells); ref: f32
        if run.startswith("ours") and not m.group("ship"):
            continue
        with open(path) as f:
            d = json.load(f)
        if d.get("unsupported") or not d.get("history"):
            continue
        out.setdefault(run, []).append(
            [h["rollout_mse_aligned"] for h in d["history"]]
        )
    return out


def main():
    cells = load_all()
    fig, axes = plt.subplots(2, 2, figsize=(11, 7.2), facecolor=SURFACE)
    for ax, (system, tag, title) in zip(axes.flat, PANELS):
        ax.set_facecolor(SURFACE)
        runs = curves_for(cells, system, tag)
        ends = []
        for run in ("ref-mgn", "ref-hgn", "ours-mgn", "ours-hgn"):
            if run not in runs:
                continue
            arr = np.array(runs[run], dtype=float)  # [seeds, epochs]
            x = np.arange(arr.shape[1])
            mean = arr.mean(axis=0)
            c = COLORS[run]
            if arr.shape[0] > 1:
                ax.fill_between(
                    x, arr.min(axis=0), arr.max(axis=0),
                    color=c, alpha=0.14, linewidth=0,
                )
            ax.plot(x, mean, color=c, linewidth=2, label=LABELS[run])
            ends.append((float(mean[-1]), int(x[-1]), run, c))
        # direct labels at line ends, dodged vertically in log space so
        # labels never collide (relief rule for the low-contrast slots)
        ends.sort()
        if not ends:  # panel with no completed runs yet (partial re-runs)
            continue
        ys = [np.log10(e[0]) for e in ends]
        lo, hi = min(ys), max(ys)
        min_gap = max((hi - lo) * 0.12, 0.06)
        for i in range(1, len(ys)):
            ys[i] = max(ys[i], ys[i - 1] + min_gap)
        for (val, xe, run, c), ly in zip(ends, ys):
            ax.annotate(
                LABELS[run].split(" (")[0],
                (xe, 10 ** ly), xytext=(5, 0), textcoords="offset points",
                fontsize=7.5, color=c, va="center",
            )
        ax.set_yscale("log")
        ax.set_title(title, fontsize=10, color=TEXT, loc="left")
        ax.set_xlabel("epoch", fontsize=8.5, color=TEXT2)
        ax.set_ylabel("aligned rollout MSE", fontsize=8.5, color=TEXT2)
        ax.grid(True, which="major", color=GRID, linewidth=0.6)
        ax.tick_params(colors=TEXT2, labelsize=8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.margins(x=0.14)  # room for the direct labels
    handles, labels = axes.flat[0].get_legend_handles_labels()
    fig.legend(
        handles, labels, loc="lower center", ncol=4, frameon=False,
        fontsize=8.5, labelcolor=TEXT,
    )
    fig.suptitle(
        "Controlled accuracy, round 5 (contact data) — mean over seeds (band = min-max); "
        "ours = shipped bf16 + fused kernel on TPU",
        fontsize=11, color=TEXT, x=0.02, ha="left",
    )
    fig.tight_layout(rect=(0, 0.05, 1, 0.95))
    out = os.path.join(REPO, "control_out", "control_r5_curves.png")
    fig.savefig(out, dpi=140, facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    main()
