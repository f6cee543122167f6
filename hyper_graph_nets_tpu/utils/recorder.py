"""Recorder: pluggable logger registry (reference recording/ parity).

The reference ships a vestigial ``recording/`` framework — a Recorder
dispatching to logger plugins (Config / Scalars / NetworkSummary /
Visualization / WAndB writers; reference recording/Recorder.py:8-52,
register_loggers.py:9-40) that the live path never calls.  This is the
working equivalent: a small plugin registry over the MetricsLogger backends,
so custom sinks can be registered per experiment.
"""
from __future__ import annotations

import json
import logging
import os
import resource
import time
from typing import Callable, Dict, List, Optional


class AbstractLogger:
    def log(self, record: Dict) -> None:
        raise NotImplementedError

    def finalize(self) -> None:
        pass


class ScalarsLogger(AbstractLogger):
    """Duration + peak-RSS alongside scalars (reference ScalarsLogger.py:85-98)."""

    def __init__(self, out_dir: str):
        self._path = os.path.join(out_dir, "scalars.jsonl")
        self._file = open(self._path, "a")
        self._start = time.time()

    def log(self, record: Dict) -> None:
        record = dict(record)
        record["duration_s"] = time.time() - self._start
        record["max_rss_kb"] = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        self._file.write(json.dumps(record, default=str) + "\n")
        self._file.flush()

    def finalize(self) -> None:
        self._file.close()


class ConfigLogger(AbstractLogger):
    """Dump the experiment config once (reference ConfigLogger)."""

    def __init__(self, out_dir: str, config: dict):
        path = os.path.join(out_dir, "config.json")
        with open(path, "w") as f:
            json.dump(config, f, indent=2, default=str)

    def log(self, record: Dict) -> None:
        pass


class PythonLogger(AbstractLogger):
    """out.log / err.log python-logging writers (reference register_loggers.py)."""

    def __init__(self, out_dir: str, name: str = "hgn"):
        self._logger = logging.getLogger(name)
        self._logger.setLevel(logging.INFO)
        if not self._logger.handlers:
            handler = logging.FileHandler(os.path.join(out_dir, "out.log"))
            handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            self._logger.addHandler(handler)

    def log(self, record: Dict) -> None:
        self._logger.info(json.dumps(record, default=str))


_REGISTRY: Dict[str, Callable[..., AbstractLogger]] = {
    "scalars": ScalarsLogger,
    "config": ConfigLogger,
    "python": PythonLogger,
}


def register_logger(name: str, factory: Callable[..., AbstractLogger]) -> None:
    _REGISTRY[name] = factory


class Recorder:
    """Dispatch records to all registered loggers (reference Recorder.py:8-52)."""

    def __init__(self, out_dir: str, config: Optional[dict] = None,
                 loggers: Optional[List[str]] = None):
        os.makedirs(out_dir, exist_ok=True)
        names = loggers or ["scalars", "python"]
        self._loggers: List[AbstractLogger] = []
        for name in names:
            factory = _REGISTRY[name]
            if name == "config":
                self._loggers.append(factory(out_dir, config or {}))
            else:
                self._loggers.append(factory(out_dir))
        if config is not None and "config" not in names:
            self._loggers.append(ConfigLogger(out_dir, config))

    def record(self, record: Dict) -> None:
        for logger in self._loggers:
            logger.log(record)

    def finalize(self) -> None:
        for logger in self._loggers:
            logger.finalize()
