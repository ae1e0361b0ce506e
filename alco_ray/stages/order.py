"""Stable ordering + skew handling (SURVEY.md §2.6 O1, §4).

The reference's contract is a per-logger total order by ``(ts, seq)``;
the graft's is stable ``(conv_id, turn_idx)`` order (BASELINE.json:15).

Two tools, picked by the consumer:

- :func:`stable_order` — global ``ds.sort(["conv_id", "turn_idx"])``.
  Ray Data's sort range-partitions on the composite key, so a hot
  conversation (Zipf head holding ~5% of all turns) is *split across
  range partitions* rather than landing on one reducer: the composite
  key is the skew handling.  Used for ordered sinks / ordered reads.

- salted per-conversation grouping — for per-conversation grouped
  computation (context windows, per-conv stats), ``groupby(conv_id)``
  would put a hot conversation in ONE group.  :func:`add_salt` appends
  ``salt = turn_idx % S`` (deterministic, uniform within every
  conversation — no hash needed) so decomposable per-conv aggregates
  run as ``groupby([conv_id, salt])`` partials merged by a second tiny
  ``groupby(conv_id)``; see :func:`per_conv_turn_stats` for the
  pattern (BASELINE.json:14 "salted repartitioning").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def stable_order(ds):
    """Global stable (conv_id, turn_idx) order — range-partition shuffle."""
    return ds.sort(["conv_id", "turn_idx"])


def add_salt(batch: pa.Table, salt_buckets: int = 16) -> pa.Table:
    """Deterministic intra-conversation salt column (turn_idx % S)."""
    salt = pc.cast(
        pc.bit_wise_and(batch["turn_idx"],
                        pa.scalar(salt_buckets - 1, pa.int32()))
        if (salt_buckets & (salt_buckets - 1)) == 0
        else pc.subtract(batch["turn_idx"],
                         pc.multiply(pc.divide(batch["turn_idx"], salt_buckets),
                                     salt_buckets)),
        pa.int32())
    return batch.append_column("salt", salt)


def per_conv_turn_stats(ds, salt_buckets: int = 16):
    """Per-conversation (n_turns, min_ts, max_ts) via salted two-phase
    aggregation: shuffle #1 on (conv_id, salt) bounds any reducer's
    share of a hot conversation to 1/S of it; shuffle #2 merges S tiny
    partials per conversation."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def prep(b: pa.Table) -> pa.Table:
        # Timestamps ride through the aggregate as int64 micros.
        # Measured on ray 2.49.2: groupby Min/Max over timestamp[us]
        # re-infers the unit from the VALUES — a block whose timestamps
        # are all second-aligned comes back timestamp[s] — so the
        # output schema is input-data-dependent without this cast.
        b = add_salt(b, salt_buckets)
        return b.set_column(b.schema.get_field_index("ts"), "ts",
                            pc.cast(b["ts"], pa.int64()))

    salted = ds.map_batches(prep, batch_format="pyarrow")
    partial = salted.groupby(["conv_id", "salt"]).aggregate(
        Count(alias_name="n_turns"),
        Min("ts", alias_name="min_ts"),
        Max("ts", alias_name="max_ts"),
    )
    merged = partial.groupby("conv_id").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Min("min_ts", alias_name="min_ts"),
        Max("max_ts", alias_name="max_ts"),
    )

    def restore(b: pa.Table) -> pa.Table:
        for col in ("min_ts", "max_ts"):
            b = b.set_column(b.schema.get_field_index(col), col,
                             pc.cast(b[col], pa.timestamp("us")))
        return b

    return merged.map_batches(restore, batch_format="pyarrow")


def top_k(ds, keys: list[str], k: int, descending=True):
    """A4 top-k without a global sort: per-block local top-k inside
    map_batches (whole-block batches), then a driver-side merge of the
    at most (num_blocks * k) survivor rows — Ray's distributed sort
    costs seconds of fixed shuffle latency to order what is by
    construction a tiny table.

    ``descending`` may be a bool or a per-key list (mixed-direction
    tie-breaks, e.g. newest-first with ascending id tie-break)."""
    import ray
    import ray.data

    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    order = [(key, "descending" if d else "ascending")
             for key, d in zip(keys, descending)]

    def local_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=order)
        return batch.take(idx.slice(0, k))

    pruned = ds.map_batches(local_top, batch_format="pyarrow", batch_size=None)
    parts = ray.get(pruned.to_arrow_refs())
    from .aggregate import concat_nonempty
    merged = concat_nonempty(parts)
    if merged.num_columns == 0:
        # All blocks fully filtered upstream (empty search result):
        # recover the schema if Ray still knows it, else return the
        # 0-row table as-is — either way 0 rows, not a
        # missing-sort-key crash.
        sch = ds.schema(fetch_if_missing=True)
        base = getattr(sch, "base_schema", None) if sch else None
        if base is None:
            return ray.data.from_arrow(merged)
        merged = base.empty_table()
    idx = pc.sort_indices(merged, sort_keys=order)
    return ray.data.from_arrow(merged.take(idx.slice(0, k)))
