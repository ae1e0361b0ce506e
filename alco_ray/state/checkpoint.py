"""Partition-level checkpointing — ALCO's ack-after-flush, upgraded.

The reference acks its AMQP batch only after the bulk insert flushes,
so a crash replays the un-acked batch (at-least-once; duplicate docids
absorbed by the RT index).  SURVEY.md §4 maps this to **exactly-once at
partition granularity**: input files are processed in deterministic
waves; each wave's output is staged, its metrics computed, its files
moved into the final tree, and only then is the wave recorded in the
manifest via an atomic rename.  A killed job resumes by (a) skipping
manifest-recorded waves, (b) deleting any files a half-committed wave
left behind (deterministic ``wave-<id>-`` filename prefix), then
(c) re-running pending waves.  Re-running a wave is idempotent.

Per-wave lineage + metrics recorded (BASELINE.json:14): input files,
rows, parse failures, routed counts per sink, output file count.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any


class CheckpointManifest:
    """Driver-side JSON manifest with atomic commit."""

    def __init__(self, out_root: str | Path):
        self.out_root = Path(out_root)
        self.path = self.out_root / "_checkpoint" / "manifest.json"
        self.waves: dict[str, dict[str, Any]] = {}
        if self.path.exists():
            self.waves = json.loads(self.path.read_text())

    def is_done(self, wave_id: str) -> bool:
        return self.waves.get(wave_id, {}).get("status") == "done"

    def commit(self, wave_id: str, *, input_files: list[str],
               metrics: dict[str, Any]) -> None:
        """Record a completed wave; atomic via write-temp + os.replace."""
        self.waves[wave_id] = {
            "status": "done",
            "input_files": input_files,
            "metrics": metrics,
        }
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(f".tmp.{os.getpid()}")
        tmp.write_text(json.dumps(self.waves, indent=1, default=str))
        os.replace(tmp, self.path)

    def total_metrics(self) -> dict[str, Any]:
        """Sum of per-wave metrics (must equal the single-process oracle
        bit-for-bit — the A2 check)."""
        rows = 0
        failures = 0
        routed: dict[str, int] = {}
        for w in self.waves.values():
            m = w.get("metrics", {})
            rows += m.get("rows", 0)
            failures += m.get("parse_failures", 0)
            for sink, n in m.get("routed_counts", {}).items():
                routed[sink] = routed.get(sink, 0) + n
        return {"rows": rows, "parse_failures": failures,
                "routed_counts": routed}


def make_waves(files: list[str], wave_size: int) -> list[tuple[str, list[str]]]:
    """Deterministic (wave_id, files) grouping: sorted input, fixed-size
    chunks.  The same input always yields the same waves, so resume
    after a kill lines up with the previous run."""
    files = sorted(files)
    out = []
    for i in range(0, len(files), wave_size):
        out.append((f"w{i // wave_size:05d}", files[i:i + wave_size]))
    return out


def cleanup_wave_outputs(out_root: str | Path, wave_id: str) -> int:
    """Delete files a half-committed wave left in the final tree (they
    carry the ``wave-<id>-`` prefix), making a re-run idempotent."""
    n = 0
    root = Path(out_root)
    if not root.exists():
        return 0
    for p in root.glob(f"sink=*/date=*/{wave_id}-*.parquet"):
        p.unlink()
        n += 1
    return n
