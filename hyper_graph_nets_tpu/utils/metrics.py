"""Observability: metrics logging with pluggable backends.

The reference logs everything to Weights & Biases inline (SURVEY.md §J1:
per-instance losses, eval tables/histograms, CSVs, GIFs, cluster clouds).
This module provides the same surface with local-first backends:

- JSONL event stream (one line per log call) — the machine-readable record;
- CSV writers for eval tables (reference MeshSimulator.py:304-310);
- optional W&B passthrough when the package is importable AND
  ``logging.wandb_mode != 'off'`` (parity with the reference's
  online/offline switch, configs/minimal.yaml:61-62).

All logging is fire-and-forget and never blocks the training loop.
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, out_dir: str, config: Optional[dict] = None, run_name: str = "run"):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._jsonl = open(os.path.join(out_dir, f"{run_name}.metrics.jsonl"), "a")
        self._step = 0
        self._wandb = None
        mode = "off"
        if config is not None:
            params = config.get("params", config)
            mode = params.get("logging", {}).get("wandb_mode", "off")
        if mode != "off":
            try:
                import wandb  # noqa: F401

                # crash-resume: persist the run id next to the metrics so a
                # restarted job continues the same W&B run (parity with the
                # reference's resume re-upload, MeshSimulator.py:88-105;
                # wandb's resume='allow' replays history server-side)
                id_path = os.path.join(out_dir, ".wandb_run_id")
                run_id = None
                if os.path.exists(id_path):
                    with open(id_path) as f:
                        run_id = f.read().strip() or None
                self._wandb = wandb
                run = self._wandb.init(
                    project="hyper-graph-nets-tpu", mode=mode, config=config,
                    reinit=False, id=run_id, resume="allow",
                )
                if run is not None and getattr(run, "id", None):
                    with open(id_path, "w") as f:
                        f.write(run.id)
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], commit: bool = True) -> None:
        record = {"_step": self._step, "_time": time.time()}
        record.update(
            {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        )
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(metrics, commit=commit)
            except Exception:
                pass
        if commit:
            self._step += 1

    def log_table(self, name: str, rows, header) -> str:
        """Write an eval table as CSV (reference MeshSimulator.py:304-310)."""
        path = os.path.join(self.out_dir, f"{name}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
        return path

    def log_artifact(self, name: str, path: str, kind: str = "dataset") -> str:
        """Record a produced file in the local artifact manifest.

        Local-first parity with the reference's wandb.Artifact uploads of
        rollout pickles (reference MeshSimulator.py:452-457): every artifact
        gets a manifest line in ``artifacts.jsonl`` (name, type, path, size,
        content digest, step) and, when the W&B passthrough is live, is also
        uploaded as a wandb Artifact.
        """
        import hashlib

        digest = hashlib.sha256()
        size = 0
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                digest.update(chunk)
                size += len(chunk)
        entry = {
            "name": name,
            "type": kind,
            "path": os.path.abspath(path),
            "bytes": size,
            "sha256": digest.hexdigest()[:16],
            "_step": self._step,
            "_time": time.time(),
        }
        manifest = os.path.join(self.out_dir, "artifacts.jsonl")
        with open(manifest, "a") as f:
            f.write(json.dumps(entry) + "\n")
        if self._wandb is not None:
            try:
                art = self._wandb.Artifact(name, type=kind)
                art.add_file(path)
                self._wandb.log_artifact(art)
            except Exception:
                pass
        return manifest

    def log_histogram(self, name: str, values, percentile_clip: float = 90.0) -> None:
        """Summary stats with 90th-percentile trimming (reference :317-325)."""
        import numpy as np

        values = np.asarray(values, dtype=float).ravel()
        if len(values) == 0:
            return
        clip = np.percentile(values, percentile_clip)
        trimmed = values[values <= clip]
        self.log(
            {
                f"{name}/mean": float(values.mean()),
                f"{name}/p50": float(np.percentile(values, 50)),
                f"{name}/p90": float(clip),
                f"{name}/trimmed_mean": float(trimmed.mean()) if len(trimmed) else 0.0,
            },
            commit=False,
        )

    def close(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
