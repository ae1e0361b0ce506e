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


def _partial_counts(keys: list[str]):
    def body(batch: pa.Table) -> pa.Table:
        gb = batch.group_by(keys).aggregate([([], "count_all")])
        return gb.rename_columns(keys + ["cnt"])

    return body


def concat_nonempty(parts: list[pa.Table]) -> pa.Table:
    """Concat block tables, tolerating Ray's schema-less empty blocks
    (a fully-filtered block can surface as a zero-column table that
    would fail ``pa.concat_tables`` schema unification)."""
    ts = [t for t in parts if t.num_rows]
    if ts:
        return pa.concat_tables(ts)
    with_schema = [t for t in parts if t.num_columns]
    return with_schema[0] if with_schema else pa.table({})


def fold_partials(partial_ds, keys: list[str], aggs: list[tuple[str, str]],
                  empty_schema: pa.Schema | None = None) -> pa.Table:
    """Collect per-block partial-aggregate tables and merge driver-side.

    Correct ONLY for bounded-key aggregates (sinks x levels x buckets,
    not e.g. user_id): each block's partial is at most |keys| rows, so
    the driver merges num_blocks x |keys| tiny rows — a distributed
    sort/hash shuffle for that is pure fixed overhead (measured: Ray's
    groupby costs seconds of latency regardless of data size, while
    this fold is milliseconds).  Unbounded-key aggregates must keep
    ``Dataset.groupby`` — see e_user_stats / per_conv_turn_stats.

    ``empty_schema``: PRE-aggregation schema to assume when the
    upstream produced no blocks at all (a fully-filtered input can
    surface zero partials, not zero-row partials); without it that
    case raises, because the key/agg types are unknowable here."""
    import ray

    parts = ray.get(partial_ds.to_arrow_refs())
    merged = concat_nonempty(parts)
    if merged.num_columns == 0 and empty_schema is not None:
        merged = empty_schema.empty_table()
    out_names = keys + [c for c, _ in aggs]
    out = (merged.group_by(keys).aggregate(aggs)
           .rename_columns(out_names)
           .sort_by([(k, "ascending") for k in keys]))
    return out


def interval_counts(ds, keys: list[str] | None = None):
    """A1: count(*) per (sink, level, 5-min bucket) — partial per block,
    driver-side merge (bounded keys).  Column name ``cnt`` everywhere."""
    import ray.data

    keys = keys or ["sink", "level", "bucket"]
    partial = ds.map_batches(_partial_counts(keys), batch_format="pyarrow")
    return ray.data.from_arrow(fold_partials(partial, keys, [("cnt", "sum")]))


def routed_counts(ds):
    """A2: rows per routed sink."""
    return interval_counts(ds, keys=["sink"])


def parse_failure_counts(ds):
    """A2: parse failures per sink (parse_ok == False)."""
    import pyarrow.compute as pc

    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        failed = batch.filter(pc.invert(batch["parse_ok"]))
        gb = failed.group_by(["sink"]).aggregate([([], "count_all")])
        return gb.rename_columns(["sink", "failures"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    return ray.data.from_arrow(
        fold_partials(p, ["sink"], [("failures", "sum")]))


def minmax_ts(ds, key: str = "sink", ts_col: str = "parsed_ts"):
    """A5: min/max event time per sink (shard bookkeeping).

    Partials carry int64 micros; cast back to timestamp at the end."""
    import pyarrow.compute as pc

    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key],
                      ts_col: pc.cast(batch[ts_col], pa.int64())})
        gb = t.group_by([key]).aggregate([(ts_col, "min"), (ts_col, "max")])
        return gb.rename_columns([key, "min_ts", "max_ts"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    merged = fold_partials(p, [key], [("min_ts", "min"), ("max_ts", "max")])
    for col in ("min_ts", "max_ts"):
        merged = merged.set_column(
            merged.schema.get_field_index(col), col,
            pc.cast(merged[col], pa.timestamp("us")))
    return ray.data.from_arrow(merged)


def distinct_values(ds, col: str) -> pa.Table:
    """A3: sorted distinct values of a column (dict build / UI dropdown).

    Map-side ``pc.unique`` collapses each block to its distinct set;
    the per-block sets are tiny by construction for filtered columns,
    so the final distinct-of-distincts is a driver-side fold."""
    import pyarrow.compute as pc

    import ray

    def partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[col])
        return pa.table({col: u.drop_null()})

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                      .to_arrow_refs())
    merged = concat_nonempty(parts)
    vals = pc.unique(merged[col].combine_chunks()).to_pylist()
    return pa.table({col: pa.array(sorted(v for v in vals if v is not None),
                                   pa.string())})


def quantile_disc(ds, value_col: str, q: float, by: str,
                  scale: int = 100):
    """Exact discrete quantile per bounded group (A-family extension):
    the element at 0-based sorted index ceil(q*n)-1 of the
    integer-scaled value (money in cents) — matching DuckDB's
    ``quantile_disc`` element choice, bit-for-bit because the domain
    is discrete.

    Shape: per-block (group, scaled-value) histogram partials, driver
    fold, cumulative pick.  Exactness without a distributed sort —
    valid whenever group count x distinct scaled values is bounded
    (prices/latencies are; free-floating doubles are not — those need
    the sort-based path or a sketch).  Returns Table(by, q_value)
    with q_value in scaled integer units."""
    import pyarrow.compute as pc

    import ray
    import ray.data

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(b[value_col], scale),
                             round_mode="half_towards_infinity"),
                    pa.int64())
        t = pa.table({by: b[by], "v": v})
        g = t.group_by([by, "v"]).aggregate([([], "count_all")])
        return g.rename_columns([by, "v", "n"])

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                    .to_arrow_refs())
    merged = concat_nonempty(parts)
    hist = (merged.group_by([by, "v"]).aggregate([("n", "sum")])
            .rename_columns([by, "v", "n"])
            .sort_by([(by, "ascending"), ("v", "ascending")])
            .to_pandas())
    import math

    out_k, out_v = [], []
    for key, g in hist.groupby(by, sort=True):
        n = int(g["n"].sum())
        target = max(1, math.ceil(q * n))  # 1-based rank
        cum = g["n"].cumsum()
        out_k.append(key)
        out_v.append(int(g.loc[cum >= target, "v"].iloc[0]))
    return pa.table({by: pa.array(out_k),
                     "q_value": pa.array(out_v, pa.int64())})


def pivot_counts(ds, key: str, col: str, values: list[str],
                 prefix: str = "n_"):
    """PIVOT / conditional aggregation: one output row per ``key``,
    one int64 count column per pivot value of ``col`` (the wide-format
    report shape — SQL's ``count(*) FILTER (WHERE col = v)`` per v).

    Shape: the pivot width is bounded (it is a SCHEMA, not data), so
    each block collapses to at most |distinct keys in block| rows of
    |values| counters map-side; the all-to-all exchange then moves
    partial counter rows, never events.  The key itself is UNBOUNDED
    (user_id), so the merge is a Ray hash ``groupby`` — not a driver
    fold (see :func:`fold_partials` for the bounded-key contract)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    names = [f"{prefix}{v}" for v in values]

    def partial(b: pa.Table) -> pa.Table:
        cols = {key: b[key]}
        for v, nm in zip(values, names):
            cols[nm] = pc.cast(pc.equal(b[col], v), pa.int64())
        t = pa.table(cols)
        g = t.group_by([key]).aggregate([(nm, "sum") for nm in names])
        return g.rename_columns([key] + names)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(key)
              .aggregate(*[Sum(nm, alias_name=nm) for nm in names]))


def rollup_sums(ds, keys: list[str], sum_cols: list[str],
                count_col: str = "n_rows") -> pa.Table:
    """GROUP BY ROLLUP(keys): the finest level PLUS every prefix
    subtotal level up to the grand total, rolled-up key columns null —
    SQL ``GROUP BY ROLLUP (...)`` semantics.

    Scale shape: the INPUT is scanned exactly once — per-block partials
    at the finest granularity, driver fold (bounded-key contract, same
    as :func:`fold_partials`) — and every coarser level is derived by
    re-aggregating the tiny finest TABLE driver-side.  At 100 TB the
    subtotal levels cost |finest| rows of arithmetic, not another pass
    over the data."""
    import pyarrow.compute as pc

    aggs = [(c, "sum") for c in sum_cols] + [(count_col, "sum")]
    out_names = keys + sum_cols + [count_col]

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(
            [(c, "sum") for c in sum_cols] + [([], "count_all")])
        return g.rename_columns(out_names)

    p = ds.map_batches(partial, batch_format="pyarrow")
    finest = fold_partials(p, keys, [(c, "sum") for c in sum_cols] +
                           [(count_col, "sum")])
    levels = [finest]
    for lvl in range(len(keys) - 1, -1, -1):
        kept = keys[:lvl]
        if kept:
            t = (finest.group_by(kept).aggregate(aggs)
                 .rename_columns(kept + sum_cols + [count_col]))
        else:
            t = pa.table({c: pa.array([int(pc.sum(finest[c]).as_py() or 0)],
                                      pa.int64())
                          for c in sum_cols + [count_col]})
        for k in keys[lvl:]:
            t = t.append_column(k, pa.nulls(t.num_rows,
                                            finest.schema.field(k).type))
        levels.append(t.select(out_names))
    return pa.concat_tables(levels).sort_by(
        [(k, "ascending") for k in keys])


def corr_moments(ds, x_col: str, y_col: str, by: str):
    """Distributed CORRELATION kernel: exact integer co-moments per
    bounded group — (n, Σx, Σy, Σxy, Σx², Σy²) — the sufficient
    statistics for Pearson r, covariance and OLS slope.  The merge of
    per-block partials IS the distributed algorithm (moment sums are
    associative+commutative); the final r = (nΣxy − ΣxΣy) /
    √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is O(groups) driver arithmetic
    (:func:`corr_from_moments`).

    Inputs must already be int64 (caller integerizes: cents, minutes
    offset — float sums are order-dependent under distribution and
    would break bit-for-bit equality).  Exact while n·max(x²) < 2⁶³:
    shift/scale x,y near zero (corr is affine-invariant), and at
    10¹²-row groups chunk partials through Python-int folds or switch
    to Welford-in-double (documented loss of bit-exactness)."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        x, y = b[x_col], b[y_col]
        import pyarrow.compute as pc

        t = pa.table({by: b[by], "sx": x, "sy": y,
                      "sxy": pc.multiply(x, y),
                      "sxx": pc.multiply(x, x),
                      "syy": pc.multiply(y, y)})
        g = t.group_by([by]).aggregate(
            [([], "count_all"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum"), ("syy", "sum")])
        return g.rename_columns([by, "n", "sx", "sy", "sxy", "sxx", "syy"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    return fold_partials(p, [by], [("n", "sum"), ("sx", "sum"),
                                   ("sy", "sum"), ("sxy", "sum"),
                                   ("sxx", "sum"), ("syy", "sum")])


def corr_from_moments(m: pa.Table) -> list[float | None]:
    """Pearson r per row of a :func:`corr_moments` table — exact
    Python-int numerator/denominator, one float division at the end.
    None where either variance is zero."""
    import math

    out = []
    for r in m.to_pylist():
        n, sx, sy = r["n"], r["sx"], r["sy"]
        num = n * r["sxy"] - sx * sy
        den2 = (n * r["sxx"] - sx * sx) * (n * r["syy"] - sy * sy)
        out.append(num / math.sqrt(den2) if den2 > 0 else None)
    return out


def mode_by(ds, value_col: str, by: str,
            out_cols: tuple[str, str] = ("mode_value", "mode_n")):
    """MODE per bounded group: most frequent ``value_col`` value, ties
    broken by smallest value (deterministic, unlike SQL ``mode()``'s
    unspecified tie).  Valid while |groups × distinct values| is
    bounded (level per sink, hour-of-day per type): per-block
    (group, value) count partials, driver fold, argmax per group.
    Unbounded value domains need the Ray-groupby two-stage instead."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by], "v": b[value_col]})
        g = t.group_by([by, "v"]).aggregate([([], "count_all")])
        return g.rename_columns([by, "v", "n"])

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                    .to_arrow_refs())
    hist = (concat_nonempty(parts).group_by([by, "v"])
            .aggregate([("n", "sum")])
            .rename_columns([by, "v", "n"])
            .sort_by([(by, "ascending"), ("n", "descending"),
                      ("v", "ascending")]))
    # first row per group of the (count desc, value asc) sort = the mode
    import pyarrow.compute as pc

    keys = hist[by]
    if hist.num_rows == 0:
        return pa.table({by: keys, out_cols[0]: hist["v"],
                         out_cols[1]: hist["n"]})
    prev = keys.slice(0, hist.num_rows - 1)
    first = pa.chunked_array([pa.array([True]),
                              pc.invert(pc.equal(keys.slice(1), prev))])
    picked = hist.filter(first)
    return pa.table({by: picked[by], out_cols[0]: picked["v"],
                     out_cols[1]: picked["n"]})


def distinct_count_by(ds, value_col: str, by: str,
                      out_col: str = "n_distinct"):
    """Exact COUNT(DISTINCT value) per group.  Per-block distinct
    (group, value) pairs map-side (collapses repeats where they are),
    driver-side distinct-of-distincts + count.  Valid while the global
    pair cardinality fits the driver (sinks × levels, types × bounded
    user sets); at unbounded cardinality use the Ray ``groupby(pair)``
    two-stage, or the HLL sketch (stages/sketch, e_approx_users) when
    ±2 % suffices."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({by: b[by], "v": b[value_col]})
        return t.group_by([by, "v"]).aggregate([]).rename_columns([by, "v"])

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                    .to_arrow_refs())
    pairs = (concat_nonempty(parts).group_by([by, "v"]).aggregate([])
             .rename_columns([by, "v"]))
    out = (pairs.group_by([by]).aggregate([([], "count_all")])
           .rename_columns([by, out_col])
           .sort_by([(by, "ascending")]))
    return out


def cube_sums(ds, keys: list[str], sum_cols: list[str],
              count_col: str = "n_rows") -> pa.Table:
    """GROUP BY CUBE(keys): every subset of the grouping keys (all 2^k
    grouping sets), absent keys null — the full cross-tab report.

    Same single-scan shape as :func:`rollup_sums`: finest-granularity
    partials per block + driver fold, then each of the 2^k−1 coarser
    grouping sets is re-aggregated from the tiny finest TABLE
    driver-side.  At 100 TB the cube costs one pass over the data plus
    (2^k−1)·|finest| rows of driver arithmetic — k is a report schema
    (2–3 keys), never data-sized."""
    from itertools import combinations

    import pyarrow.compute as pc

    aggs = [(c, "sum") for c in sum_cols] + [(count_col, "sum")]
    out_names = keys + sum_cols + [count_col]

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(
            [(c, "sum") for c in sum_cols] + [([], "count_all")])
        return g.rename_columns(out_names)

    p = ds.map_batches(partial, batch_format="pyarrow")
    finest = fold_partials(p, keys, [(c, "sum") for c in sum_cols] +
                           [(count_col, "sum")])
    levels = [finest]
    subsets = [list(s) for r in range(len(keys) - 1, -1, -1)
               for s in combinations(keys, r)]
    for kept in subsets:
        if kept:
            t = (finest.group_by(kept).aggregate(aggs)
                 .rename_columns(kept + sum_cols + [count_col]))
        else:
            t = pa.table({c: pa.array([int(pc.sum(finest[c]).as_py() or 0)],
                                      pa.int64())
                          for c in sum_cols + [count_col]})
        for k in keys:
            if k not in kept:
                t = t.append_column(k, pa.nulls(t.num_rows,
                                                finest.schema.field(k).type))
        levels.append(t.select(out_names))
    return pa.concat_tables(levels).sort_by(
        [(k, "ascending") for k in keys])


def quantiles_disc(ds, value_col: str, qs: list[float], by: str,
                   scale: int = 100,
                   out_prefix: str = "q") -> pa.Table:
    """Multi-quantile sibling of :func:`quantile_disc`: ALL requested
    discrete quantiles from ONE histogram pass (the scan cost is the
    histogram, not the pick), one column per q named
    ``{out_prefix}{q*100:g}``.  Same bounded-domain contract."""
    import math

    import pyarrow.compute as pc

    import ray

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(b[value_col], scale),
                             round_mode="half_towards_infinity"),
                    pa.int64())
        t = pa.table({by: b[by], "v": v})
        g = t.group_by([by, "v"]).aggregate([([], "count_all")])
        return g.rename_columns([by, "v", "n"])

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                    .to_arrow_refs())
    hist = (concat_nonempty(parts).group_by([by, "v"])
            .aggregate([("n", "sum")])
            .rename_columns([by, "v", "n"])
            .sort_by([(by, "ascending"), ("v", "ascending")])
            .to_pandas())
    names = [f"{out_prefix}{q * 100:g}" for q in qs]
    out_k = []
    out_q: dict[str, list[int]] = {nm: [] for nm in names}
    for key, g in hist.groupby(by, sort=True):
        n = int(g["n"].sum())
        cum = g["n"].cumsum()
        out_k.append(key)
        for q, nm in zip(qs, names):
            target = max(1, math.ceil(q * n))
            out_q[nm].append(int(g.loc[cum >= target, "v"].iloc[0]))
    cols = {by: pa.array(out_k)}
    cols.update({nm: pa.array(out_q[nm], pa.int64()) for nm in names})
    return pa.table(cols)


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_col: str = "variable", val_col: str = "value"):
    """UNPIVOT / melt (wide -> long reshape, the inverse of
    :func:`pivot_counts`): each input row becomes |value_cols| rows of
    (id_cols..., variable-name, value).  Pure per-batch restructuring
    — zero-copy column slices concatenated per variable, no shuffle,
    output streams at |value_cols| x input rows."""
    import pyarrow.compute as pc

    def body(b: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            cols = {c: b[c] for c in id_cols}
            cols[var_col] = pa.array([vc] * b.num_rows, pa.string())
            cols[val_col] = pc.cast(b[vc], pa.int64())
            parts.append(pa.table(cols))
        return concat_nonempty(parts) if parts else b.select(id_cols)

    return ds.map_batches(body, batch_format="pyarrow")
