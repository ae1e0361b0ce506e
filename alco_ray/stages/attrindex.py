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

Two bucket-grid modes, both reproducible from meta.json alone:
``boundaries="width"`` (default) is an equi-width grid — assignment is
a float floor, the right choice for roughly uniform attributes;
``boundaries="quantile"`` samples the value distribution once
(aggregate.quantile_cont) and stores the edge list, so a heavily
SKEWED attribute still yields near-equal bucket sizes — assignment
and pruning become one ``searchsorted`` over the edges.  Probes are
agnostic: they read whichever grid the meta carries.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_of_meta(v: np.ndarray, meta: dict) -> np.ndarray:
    """Bucket assignment from meta alone — the ONE shared rule for
    build, update and probe (grid drift between them would silently
    unprune results)."""
    nb = meta["n_buckets"]
    if "edges" in meta:
        return np.searchsorted(np.asarray(meta["edges"], np.float64),
                               v, side="right").astype(np.int32)
    return np.clip(np.floor((v - meta["lo"]) / meta["width"]),
                   0, nb - 1).astype(np.int32)


def build_value_index(ds, index_dir: str | Path, *,
                      value_col: str = "value",
                      n_buckets: int = 64,
                      boundaries: str = "width",
                      extra_meta: dict | None = None) -> None:
    """Build the persisted range index over ``ds`` (all columns are
    carried into the bucket files — the index IS the routed copy of
    the table, like the text index's docstore).  ``boundaries``:
    "width" (equi-width grid) or "quantile" (edges from the observed
    distribution — near-equal bucket sizes under skew)."""
    from ..sinks import _make_block_writer
    from .aggregate import _count_min_max, quantile_cont
    from .similarity import _swap_in_index, _sweep_stale_builds

    if boundaries == "quantile":
        ps = [i / n_buckets for i in range(1, n_buckets)]
        qt = quantile_cont(ds, value_col, ps)
        edges = sorted(set(qt["lo_value"].to_pylist())) \
            if qt.num_rows else []
        meta_grid = {"edges": edges,
                     "n_buckets": len(edges) + 1}
    elif boundaries == "width":
        n, lo, hi = _count_min_max(ds, value_col)
        if n == 0:
            lo, hi = 0.0, 1.0
        width = (hi - lo) / n_buckets or 1.0
        meta_grid = {"lo": lo, "width": width, "n_buckets": n_buckets}
    else:
        raise ValueError(f"boundaries must be 'width' or 'quantile', "
                         f"got {boundaries!r}")
    meta = {"kind": "value_range", "version": 1, "value_col": value_col,
            **meta_grid, **(extra_meta or {})}

    d = Path(index_dir)
    _sweep_stale_builds(d)
    build = d.parent / f".{d.name}.building.{os.getpid()}"
    build.mkdir(parents=True, exist_ok=True)

    writer = _make_block_writer(str(build / "buckets"), ["bucket"])

    def assign(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("bucket",
                               pa.array(_bucket_of_meta(v, meta)))

    (ds.map_batches(assign, batch_format="pyarrow")
       .map_batches(writer, batch_format="pyarrow").materialize())

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
    ends = _bucket_of_meta(
        np.array([lo, np.nextafter(hi, -np.inf)], np.float64), meta)
    b_lo, b_hi = int(ends[0]), int(ends[1])
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

    # materialize once: the count() guard below would otherwise
    # re-execute the (pruned) read when the consumer iterates
    out = ds.map_batches(exact, batch_format="pyarrow").materialize()
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

    writer = _make_block_writer(str(d / "buckets"), ["bucket"])

    def assign(b: pa.Table) -> pa.Table:
        v = b[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("bucket",
                               pa.array(_bucket_of_meta(v, meta)))

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
