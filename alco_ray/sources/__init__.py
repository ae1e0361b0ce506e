"""Sources — pruned Parquet readers (SURVEY.md §2.1 S1/S2).

The AMQP queue of the reference becomes Parquet shards consumed by Ray
Data's streaming executor (incremental, backpressured).  Readers always
take an explicit column list when the consumer doesn't need the full
schema — at 100 TB a read that loads all columns for a two-column
transform is a bug, not a style issue.
"""

from __future__ import annotations

from pathlib import Path

import ray.data


def transcript_files(input_dir: str | Path) -> list[str]:
    """Deterministic (sorted) shard list — the checkpoint partition unit."""
    return sorted(str(p) for p in Path(input_dir).glob("*.parquet")
                  if not p.name.startswith("_"))


def read_transcripts(paths: list[str] | str, columns: list[str] | None = None,
                     **kwargs) -> "ray.data.Dataset":
    if isinstance(paths, (str, Path)):
        paths = transcript_files(paths)
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def read_routed_output(out_root: str | Path, columns: list[str] | None = None,
                       ) -> "ray.data.Dataset":
    """Read back the partitioned sink tree (hive keys sink/date become
    columns again) — D2 union-of-shards."""
    files = sorted(str(p) for p in Path(out_root).glob("sink=*/date=*/*.parquet"))
    return ray.data.read_parquet(files, columns=columns)
