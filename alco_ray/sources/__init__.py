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


def suggest_num_blocks(paths: list[str], target_bytes: int = 32 << 20) -> int:
    """Input-split count that keeps blocks near ``target_bytes`` while
    still giving every CPU work on small corpora.

    Ray's default read parallelism (~200) shreds a small corpus into
    sub-MB blocks, and per-block overhead (task dispatch, one output
    file per block x partition) then dominates; at the other end, big
    corpora get max(bytes/target) splits regardless of CPU count.
    """
    import os

    import ray

    total = sum(os.path.getsize(p) for p in paths)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # 4 blocks per CPU: fine enough that the last scheduling wave can't
    # idle a third of the pool (12 blocks on 8 CPUs = 75% utilization),
    # coarse enough that per-task overhead stays negligible.
    return max(-(-total // target_bytes), min(len(paths), 4 * cpus), 1)


def read_transcripts(paths: list[str] | str, columns: list[str] | None = None,
                     **kwargs) -> "ray.data.Dataset":
    if isinstance(paths, (str, Path)):
        paths = transcript_files(paths)
    kwargs.setdefault("override_num_blocks", suggest_num_blocks(paths))
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def read_routed_output(out_root: str | Path, columns: list[str] | None = None,
                       ) -> "ray.data.Dataset":
    """Read back the partitioned sink tree (hive keys sink/date become
    columns again) — D2 union-of-shards."""
    files = sorted(str(p) for p in Path(out_root).glob("sink=*/date=*/*.parquet"))
    return ray.data.read_parquet(files, columns=columns,
                                 override_num_blocks=suggest_num_blocks(files))
