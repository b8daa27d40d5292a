"""Checkpoint manifests: per-stage lineage + metrics for resume.

The reference's only persistence is a best-model checkpoint gated on
validation metrics (``/root/reference/nlsh/trainers/base.py:100-103``);
data stages always recompute. Here every pipeline stage writes its
output as a Parquet directory plus a ``manifest.json`` recording

* the stage name and config fingerprint (``DedupConfig.config_hash``),
* the input fingerprint (source files: name/size/mtime) or the upstream
  stages' manifest digests (lineage),
* row count, file list, wall time, and stage metrics.

A rerun skips any stage whose manifest matches the would-be inputs —
that is what 'resumable from checkpoint with per-partition lineage +
metrics' means for a batch pipeline (ray_guide 'Sources & sinks').
Writes are atomic: a stage directory appears only via final rename.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"


def fingerprint_paths(paths: list[str]) -> str:
    """Digest of the input files' identity (path, size, mtime)."""
    items = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                fp = os.path.join(p, f)
                st = os.stat(fp)
                items.append((fp, st.st_size, int(st.st_mtime)))
        else:
            st = os.stat(p)
            items.append((p, st.st_size, int(st.st_mtime)))
    blob = json.dumps(items).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


@dataclass
class StageManifest:
    stage: str
    config_hash: str
    input_fp: str                  # source fingerprint or upstream digests
    rows: int = 0
    files: list[str] = field(default_factory=list)
    wall_sec: float = 0.0
    metrics: dict[str, Any] = field(default_factory=dict)

    def digest(self) -> str:
        """Identity of this stage's OUTPUT for downstream lineage."""
        blob = json.dumps(
            {
                "stage": self.stage,
                "config_hash": self.config_hash,
                "input_fp": self.input_fp,
                "rows": self.rows,
                "files": self.files,
            },
            sort_keys=True,
        ).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def save(self, stage_dir: str) -> None:
        # beside (not inside) the data dir, so read_parquet(dir) sees
        # only parquet files
        with open(stage_dir + ".manifest.json", "w") as f:
            json.dump(asdict(self), f, indent=2)

    @classmethod
    def load(cls, stage_dir: str) -> "StageManifest | None":
        p = stage_dir + ".manifest.json"
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return cls(**json.load(f))
        except (json.JSONDecodeError, TypeError):
            return None


class StageRunner:
    """Run-or-skip executor for one checkpointed stage.

    ``sink``: optional metrics sink (``nlshray.state.metrics`` duck
    type) — every run/skip emits a (stage, metrics, wall_sec) event, the
    engine's analog of the reference's pluggable logger surface
    (``/root/reference/nlsh/loggers.py:6-97``)."""

    def __init__(self, out_root: str, config_hash: str, sink=None):
        self.out_root = out_root
        self.config_hash = config_hash
        if sink is None:
            from nlshray.state.metrics import NullSink

            sink = NullSink()
        self.sink = sink
        os.makedirs(out_root, exist_ok=True)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.out_root, stage)

    def is_fresh(self, stage: str, input_fp: str) -> StageManifest | None:
        """The existing manifest, iff it matches config + inputs and all
        its files still exist."""
        d = self.stage_dir(stage)
        m = StageManifest.load(d)
        if m is None or m.config_hash != self.config_hash or m.input_fp != input_fp:
            return None
        for f in m.files:
            if not os.path.exists(os.path.join(d, f)):
                return None
        return m

    def run(
        self,
        stage: str,
        input_fp: str,
        produce,                   # () -> (ray Dataset, metrics dict)
    ) -> tuple[str, StageManifest, bool]:
        """Returns (stage_dir, manifest, was_skipped)."""
        d = self.stage_dir(stage)
        m = self.is_fresh(stage, input_fp)
        if m is not None:
            self.sink.emit(stage, {"skipped": True, "rows": m.rows}, 0.0)
            return d, m, True
        t0 = time.perf_counter()
        ds, metrics = produce()
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        files = sorted(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        # row count from the written files' parquet footers — re-counting
        # the lazy dataset would re-execute the whole stage DAG
        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows for f in files
        )
        m = StageManifest(
            stage=stage,
            config_hash=self.config_hash,
            input_fp=input_fp,
            rows=rows,
            files=files,
            wall_sec=round(time.perf_counter() - t0, 3),
            metrics=metrics,
        )
        shutil.rmtree(d, ignore_errors=True)
        try:
            os.remove(d + ".manifest.json")
        except FileNotFoundError:
            pass
        os.rename(tmp, d)
        m.save(d)   # manifest lands last: its presence implies valid data
        self.sink.emit(
            stage, {"skipped": False, "rows": rows, **(metrics or {})}, m.wall_sec
        )
        return d, m, False
