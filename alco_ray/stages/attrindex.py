"""Persisted numeric ATTRIBUTE index — the Sphinx attribute-filter
analog of the inverted text index (textindex.py): ALCO's search side
filters by numeric/time attributes (Sphinx attribute filters) next to
MATCH; this module gives range predicates the same build-once /
probe-pruned treatment.

Build: one map-side (min, max) fold sizes an equi-width bucket grid,
then every row lands in exactly one ``bucket=<i>/`` Parquet directory
(content-hashed filenames — idempotent retries; staged build + atomic
swap, the similarity.build_lsh_index protocol).  A range probe reads
ONLY the buckets overlapping [lo, hi) — at 100 TB the scan cost is
proportional to the selected value range, not the corpus — and applies
the exact vectorized predicate to the edge buckets.

Equi-width is the deliberate default: bucket ASSIGNMENT must be
reproducible from meta.json alone (a float ``(v - lo) / width`` floor),
so probes prune with arithmetic, no boundary table.  A heavily skewed
attribute wants quantile boundaries instead — build them with
aggregate.quantile_cont and store the edges in ``extra_meta``; the
probe path is unchanged (searchsorted over edges instead of the
floor).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def build_value_index(ds, index_dir: str | Path, *,
                      value_col: str = "value",
                      n_buckets: int = 64,
                      extra_meta: dict | None = None) -> None:
    """Build the persisted range index over ``ds`` (all columns are
    carried into the bucket files — the index IS the routed copy of
    the table, like the text index's docstore)."""
    from ..sinks import _make_block_writer
    from .aggregate import _count_min_max
    from .similarity import _swap_in_index, _sweep_stale_builds

    n, lo, hi = _count_min_max(ds, value_col)
    if n == 0:
        lo, hi = 0.0, 1.0
    width = (hi - lo) / n_buckets or 1.0

    d = Path(index_dir)
    _sweep_stale_builds(d)
    build = d.parent / f".{d.name}.building.{os.getpid()}"
    build.mkdir(parents=True, exist_ok=True)

    writer = _make_block_writer(str(build / "buckets"), ["bucket"])

    def assign(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        bk = np.clip(np.floor((v - lo) / width), 0,
                     n_buckets - 1).astype(np.int32)
        return b.append_column("bucket", pa.array(bk))

    (ds.map_batches(assign, batch_format="pyarrow")
       .map_batches(writer, batch_format="pyarrow").materialize())

    meta = {"kind": "value_range", "version": 1, "value_col": value_col,
            "n_buckets": n_buckets, "lo": lo, "width": width,
            **(extra_meta or {})}
    (build / "meta.json").write_text(json.dumps(meta))
    _swap_in_index(build, d)


def range_probe(index_dir: str | Path, lo: float, hi: float, *,
                columns: list[str] | None = None,
                stats_out: dict | None = None):
    """Rows with ``lo <= value < hi``, reading ONLY the overlapping
    bucket directories (pruned at the FILE level before any byte of
    data moves) then applying the exact predicate vectorized."""
    import ray.data

    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    vcol = meta["value_col"]
    b_lo = int(np.clip(np.floor((lo - meta["lo"]) / meta["width"]),
                       0, meta["n_buckets"] - 1))
    b_hi = int(np.clip(np.floor((np.nextafter(hi, -np.inf) - meta["lo"])
                                / meta["width"]),
                       0, meta["n_buckets"] - 1))
    files = sorted(str(p) for b in range(b_lo, b_hi + 1)
                   for p in (d / "buckets" / f"bucket={b}")
                   .glob("*.parquet"))
    if stats_out is not None:
        stats_out["bucket_range"] = (b_lo, b_hi)
        stats_out["files"] = files
    if not files:
        import pyarrow.parquet as pq_

        any_file = sorted((d / "buckets").rglob("*.parquet"))
        if any_file:
            schema = pq_.read_schema(str(any_file[0]))
            cols = columns or [c for c in schema.names if c != "bucket"]
            return pa.table({c: pa.array([], schema.field(c).type)
                             for c in cols})
        return pa.table({vcol: pa.array([], pa.float64())})

    if columns is None:
        # hive bucket=<i> dirs would resurface as a `bucket` column on
        # read; default to the data columns only
        import pyarrow.parquet as pq_

        columns = [c for c in pq_.read_schema(files[0]).names
                   if c != "bucket"]
    ds = ray.data.read_parquet(files, columns=columns)

    def exact(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b[vcol], pa.scalar(lo)),
                       pc.less(b[vcol], pa.scalar(hi)))
        return b.filter(keep)

    out = ds.map_batches(exact, batch_format="pyarrow")
    if out.count() == 0:
        # all-filtered surfaces as ZERO blocks -> a 0-column frame
        # downstream (ray 2.49 drops the schema); the count() runs over
        # the PRUNED read, so this guard is bucket-range-cheap
        import pyarrow.parquet as pq_

        schema = pq_.read_schema(files[0])
        # a pa.Table, NOT from_arrow(zero-row): ray 2.49 drops the
        # schema of a zero-row Dataset on to_pandas()
        return pa.table(
            {c: pa.array([], schema.field(c).type) for c in columns})
    return out


def update_value_index(delta_ds, index_dir: str | Path, *,
                       extra_meta: dict | None = None) -> None:
    """INCREMENTAL attribute-index update (the textindex
    update_text_index protocol applied to the value-range index):
    delta rows land in the live ``buckets/bucket=*/`` directories
    under the EXISTING bucket grid — lo/width are pinned by the index,
    so old and new segments stay probe-compatible — with content-
    hashed filenames (idempotent retries), then ``meta.json`` swaps
    atomically with the caller's new corpus signature as the commit
    point.  Values outside the original [lo, hi] clamp into the edge
    buckets (the probe's exact predicate keeps results right; a
    drifting value domain eventually wants a rebuild, which the
    signature gate forces anyway)."""
    from ..sinks import _make_block_writer

    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    if meta.get("kind") != "value_range":
        raise ValueError(f"{d} is not a value-range index")
    vcol = meta["value_col"]
    lo, width, nb = meta["lo"], meta["width"], meta["n_buckets"]

    writer = _make_block_writer(str(d / "buckets"), ["bucket"])

    def assign(b: pa.Table) -> pa.Table:
        v = b[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        bk = np.clip(np.floor((v - lo) / width), 0, nb - 1) \
            .astype(np.int32)
        return b.append_column("bucket", pa.array(bk))

    (delta_ds.map_batches(assign, batch_format="pyarrow")
        .map_batches(writer, batch_format="pyarrow").materialize())

    new_meta = {**meta, **(extra_meta or {})}
    tmp = d / "meta.json.tmp"
    tmp.write_text(json.dumps(new_meta))
    os.replace(tmp, d / "meta.json")


def compact_value_index(index_dir: str | Path,
                        target_bytes: int = 256 << 20) -> int:
    """Segment-merge for the incrementally-updated value index (one
    small file lands per update wave per touched bucket): rewrites
    each bucket directory via the sinks' convergent compactor.  Same
    operational contract as sink/text-index compaction."""
    from ..sinks import compact_partitions

    return compact_partitions(Path(index_dir), target_bytes,
                              pattern="buckets/bucket=*")
