"""Sinks — routed, partitioned, resumable Parquet output (SURVEY.md S3).

ALCO's buffered bulk INSERT into per-logger per-day Sphinx RT shards
maps to ``sink=<logger>/date=<YYYY-MM-DD>/`` partitioned Parquet.
Buffering = Ray block granularity; fan-out = ``partition_cols`` on the
write (one file per (block x partition) — no extra shuffle, no
per-sink re-scan of the input).

Writes go to a staging directory first; :func:`promote_staging` then
moves every file into the final tree under a deterministic
``<wave_id>-`` filename prefix (atomic per-file ``os.replace``).
Combined with the checkpoint manifest this yields partition-level
exactly-once output (see alco_ray.state.checkpoint).
"""

from __future__ import annotations

import shutil
from pathlib import Path


def write_routed(ds, staging_dir: str | Path,
                 partition_cols: list[str] | None = None,
                 min_rows_per_file: int | None = None) -> None:
    """Streaming partitioned write of a routed dataset to staging."""
    kwargs = {}
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(str(staging_dir),
                     partition_cols=partition_cols or ["sink", "date"],
                     **kwargs)


def promote_staging(staging_dir: str | Path, out_root: str | Path,
                    wave_id: str) -> int:
    """Move staged files into the final partitioned tree.

    Each staged ``sink=S/date=D/<name>.parquet`` becomes
    ``out_root/sink=S/date=D/<wave_id>-<i>-<name>.parquet``.
    ``os.replace`` is atomic per file; a crash mid-promotion leaves a
    prefix of the files, which ``cleanup_wave_outputs`` removes before
    the wave re-runs.  Returns the number of files promoted.
    """
    import os

    staging = Path(staging_dir)
    root = Path(out_root)
    n = 0
    for f in sorted(staging.glob("sink=*/date=*/*.parquet")):
        rel = f.relative_to(staging)
        dest = root / rel.parent / f"{wave_id}-{n:05d}-{rel.name}"
        dest.parent.mkdir(parents=True, exist_ok=True)
        os.replace(f, dest)
        n += 1
    shutil.rmtree(staging, ignore_errors=True)
    return n
