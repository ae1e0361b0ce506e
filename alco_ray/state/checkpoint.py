"""Partition-level checkpointing — ALCO's ack-after-flush, upgraded.

The reference acks its AMQP batch only after the bulk insert flushes,
so a crash replays the un-acked batch (at-least-once; duplicate docids
absorbed by the RT index).  SURVEY.md §4 maps this to **exactly-once at
partition granularity**, and — because ALCO is a *streaming* collector
whose single most common operation is "new shards arrived, run again" —
the manifest tracks **input files**, not positional wave numbers:

- a wave is a chunk of the *pending* (not-yet-processed) sorted file
  list, identified by a content hash of its file names, so wave
  identity is stable under corpus growth, wave-size changes and
  resume-after-crash regrouping;
- on every run, pending = corpus files minus the union of all
  committed waves' input files: appending shards re-processes ONLY the
  new files, and total metrics (summed over all committed waves) equal
  a fresh full run bit-for-bit;
- files a half-committed wave left in the final tree carry their wave
  id as a filename prefix; any prefix not present in the manifest is
  an orphan and is deleted before new waves run.

Per-wave lineage + metrics recorded (BASELINE.json:14): input files,
rows, parse failures, routed counts per sink, output file count.
"""

from __future__ import annotations

import hashlib
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

    def processed_files(self) -> set[str]:
        """Union of input files across all committed waves — the
        resume/append frontier."""
        out: set[str] = set()
        for w in self.waves.values():
            if w.get("status") == "done":
                out.update(w.get("input_files", ()))
        return out

    def file_sigs(self) -> dict[str, list]:
        """Recorded (size, mtime_ns) per committed input file — the
        rewritten-in-place detector.  Waves committed by older manifests
        (no ``input_sigs``) contribute nothing."""
        out: dict[str, list] = {}
        for w in self.waves.values():
            if w.get("status") == "done":
                out.update(w.get("input_sigs", {}))
        return out

    def commit(self, wave_id: str, *, input_files: list[str],
               metrics: dict[str, Any],
               input_sigs: dict[str, list] | None = None) -> None:
        """Record a completed wave; atomic via write-temp + os.replace.

        Each input file's (size, mtime_ns) is recorded so a resume can
        detect a shard REWRITTEN IN PLACE (same name, new content) —
        silently treating it as already-processed would leave stale
        committed output and aggregates.  Pass ``input_sigs`` captured
        BEFORE the wave read its files (run_flagship does): a shard
        modified mid-wave then carries its pre-read signature, so the
        next resume sees the mismatch instead of silently dropping the
        concurrent append.  Falls back to stat-at-commit if absent."""
        sigs = dict(input_sigs or {})
        for f in input_files:
            if f in sigs:
                continue
            try:
                st = os.stat(f)
                sigs[f] = [st.st_size, st.st_mtime_ns]
            except OSError:
                pass  # non-local / vanished source: no signature
        self.waves[wave_id] = {
            "status": "done",
            "input_files": input_files,
            "input_sigs": sigs,
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
    """Deterministic (wave_id, files) grouping of the PENDING file list:
    sorted input, fixed-size chunks, id = content hash of the chunk's
    file names.  The same chunk always yields the same id (idempotent
    re-runs); growing the corpus only appends new waves — committed
    waves keep their identity because they are keyed by what they
    processed, not by their position."""
    files = sorted(files)
    out = []
    for i in range(0, len(files), wave_size):
        chunk = files[i:i + wave_size]
        wid = "w" + hashlib.sha1("\n".join(chunk).encode()).hexdigest()[:12]
        out.append((wid, chunk))
    return out


def cleanup_uncommitted_outputs(out_root: str | Path,
                                committed: set[str]) -> int:
    """Delete final-tree files and metric partials whose wave-id prefix
    is not in the manifest (orphans of half-committed waves), making
    any re-run idempotent.  Returns the number of files removed."""
    n = 0
    root = Path(out_root)
    if not root.exists():
        return 0
    for p in root.glob("sink=*/date=*/w*.parquet"):
        if p.name.split("-", 1)[0] not in committed:
            p.unlink()
            n += 1
    for p in root.glob("_checkpoint/partials/*.parquet"):
        if p.stem not in committed:
            p.unlink()
            n += 1
    return n
