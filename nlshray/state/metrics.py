"""Pluggable per-stage metrics sinks (SURVEY.md §2.10).

The reference exposes a 4-implementation logger duck type — ``run_name``
/ ``meta`` / ``log`` / ``args`` over Null / TensorboardX / CometML /
WandB backends (``/root/reference/nlsh/loggers.py:6-97``). This is the
engine's equivalent: a sink duck type with the same spirit (``meta`` for
run-level params, ``emit`` for per-stage metric events), backed by
sinks that exist in a no-network pipeline: null, stdout, JSONL file,
and a composite fan-out. Stage events carry (stage, metrics dict,
wall seconds) so a run's JSONL stream is the lineage-adjacent metrics
record next to the checkpoint manifests.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class NullSink:
    """Drop everything (loggers.py:6-24's NullLogger, minus the prints)."""

    run_name = "null"

    def meta(self, params: dict[str, Any]) -> None:
        pass

    def emit(self, stage: str, metrics: dict[str, Any], wall_sec: float = 0.0) -> None:
        pass


class StdoutSink:
    """Human-readable line per event."""

    run_name = "stdout"

    def meta(self, params: dict[str, Any]) -> None:
        print(f"[metrics] meta: {params}")

    def emit(self, stage: str, metrics: dict[str, Any], wall_sec: float = 0.0) -> None:
        print(f"[metrics] {stage} ({wall_sec:.3f}s): {metrics}")


class JsonlSink:
    """Append-only JSONL stream — one object per event, flushed per
    write so a killed run keeps everything emitted before the kill."""

    def __init__(self, path: str, run_name: str | None = None):
        self.path = path
        self.run_name = run_name or os.path.basename(path)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def _write(self, obj: dict[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(obj, sort_keys=True, default=str) + "\n")
            f.flush()

    def meta(self, params: dict[str, Any]) -> None:
        self._write({"event": "meta", "ts": time.time(), "params": params})

    def emit(self, stage: str, metrics: dict[str, Any], wall_sec: float = 0.0) -> None:
        self._write(
            {
                "event": "stage",
                "ts": time.time(),
                "stage": stage,
                "wall_sec": round(wall_sec, 4),
                "metrics": metrics,
            }
        )


class CompositeSink:
    """Fan one event out to several sinks."""

    def __init__(self, *sinks):
        self.sinks = list(sinks)
        self.run_name = "+".join(s.run_name for s in sinks) or "composite"

    def meta(self, params: dict[str, Any]) -> None:
        for s in self.sinks:
            s.meta(params)

    def emit(self, stage: str, metrics: dict[str, Any], wall_sec: float = 0.0) -> None:
        for s in self.sinks:
            s.emit(stage, metrics, wall_sec)
