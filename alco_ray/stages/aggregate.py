"""Aggregates — ALCO's count/interval queries (SURVEY.md §2.5).

A1 interval counts (logger/level/5-min bucket), A2 per-sink routed
counts + parse failures, A3 global distinct, A5 min/max ts per sink.
All exact (the reference has no sketches; BASELINE.json:14 demands
bit-for-bit equality): int64 counts, timestamp[us] buckets, UTC.

Scale note: every groupby here is preceded by an explicit **map-side
partial aggregate** inside ``map_batches`` (pa.Table.group_by per
block), so the all-to-all exchange moves one row per distinct key per
block — not one row per input row.  At 10^12 turns with ~10 sinks x 5
levels x bounded bucket count this makes the shuffle negligible.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Count, Max, Min, Sum


def _partial_counts(keys: list[str]):
    def body(batch: pa.Table) -> pa.Table:
        gb = batch.group_by(keys).aggregate([([], "count_all")])
        return gb.rename_columns(keys + ["cnt"])

    return body


def interval_counts(ds, keys: list[str] | None = None):
    """A1: count(*) per (sink, level, 5-min bucket) — partial per block,
    then a small hash-shuffle sum.  Column name ``cnt`` everywhere."""
    keys = keys or ["sink", "level", "bucket"]
    partial = ds.map_batches(_partial_counts(keys), batch_format="pyarrow")
    return partial.groupby(keys).aggregate(Sum("cnt", alias_name="cnt"))


def routed_counts(ds):
    """A2: rows per routed sink."""
    return interval_counts(ds, keys=["sink"])


def parse_failure_counts(ds):
    """A2: parse failures per sink (parse_ok == False)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        failed = batch.filter(pc.invert(batch["parse_ok"]))
        gb = failed.group_by(["sink"]).aggregate([([], "count_all")])
        return gb.rename_columns(["sink", "failures"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    return p.groupby("sink").aggregate(Sum("failures", alias_name="failures"))


def minmax_ts(ds, key: str = "sink", ts_col: str = "parsed_ts"):
    """A5: min/max event time per sink (shard bookkeeping).

    Partials carry int64 micros (Ray's Min/Max round-trips raw
    timestamps at second precision); cast back at the end."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key],
                      ts_col: pc.cast(batch[ts_col], pa.int64())})
        gb = t.group_by([key]).aggregate([(ts_col, "min"), (ts_col, "max")])
        return gb.rename_columns([key, "min_ts", "max_ts"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    merged = p.groupby(key).aggregate(Min("min_ts", alias_name="min_ts"),
                                      Max("max_ts", alias_name="max_ts"))

    def restore(b: pa.Table) -> pa.Table:
        for col in ("min_ts", "max_ts"):
            b = b.set_column(b.schema.get_field_index(col), col,
                             pc.cast(b[col], pa.timestamp("us")))
        return b

    return merged.map_batches(restore, batch_format="pyarrow")


def distinct_values(ds, col: str) -> pa.Table:
    """A3: sorted distinct values of a column (dict build / UI dropdown).

    Map-side ``pc.unique`` collapses each block to its distinct set
    before the shuffle; ``Dataset.unique`` returns a Python list (tiny
    by construction for filtered columns), re-wrapped as a Table."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[col])
        return pa.table({col: u.drop_null()})

    vals = ds.map_batches(partial, batch_format="pyarrow").unique(col)
    return pa.table({col: pa.array(sorted(v for v in vals if v is not None),
                                   pa.string())})
