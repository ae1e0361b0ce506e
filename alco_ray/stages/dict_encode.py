"""Dictionary build + enrich — ALCO's Redis value->id dictionaries.

SURVEY.md §2.4 J1 / §2.3 T1.  The reference keeps a Redis hash per
(logger, filtered column) mapping string value -> small int id, with a
per-process cache; ids are assigned by arrival order (INCR).  Here:

- **build** (:func:`build_dicts`): one distributed distinct pass per
  filtered column (`Dataset.unique`), then ids assigned by
  **sorted-distinct order** — deterministic and reproducible across
  partitionings, a documented deviation from Redis INCR arrival order
  (BASELINE.json:14 demands reproducible equality; arrival order is
  nondeterministic under parallelism).  Nulls get no id (stay null).
- **broadcast + probe** (:class:`DictEncoder`): the dict tables are put
  in the object store once (``ray.put``); each actor in the pool reads
  them ONCE in ``__init__`` and probes per batch with ``pc.index_in``
  (hash lookup, zero-copy).  No shuffle, no per-batch re-ship.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def build_dict_table(values: pa.Array | list) -> pa.Table:
    """Sorted-distinct value -> id table: (value:string, id:int32)."""
    arr = pa.array(values, pa.string()) if isinstance(values, list) else values
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    distinct = pc.unique(arr.drop_null())
    distinct = distinct.sort()
    ids = pa.array(range(len(distinct)), pa.int32())
    return pa.table({"value": distinct, "id": ids})


def build_dicts(ds, columns: list[str], out_dir: str | Path | None = None,
                ) -> dict[str, pa.Table]:
    """Distributed distinct per filtered column -> dict tables.

    ``ds.unique(col)`` is a shuffle, but over low-cardinality columns the
    map-side combine collapses each block to a handful of values first,
    so the exchange is tiny at any input scale.  When ``out_dir`` is
    given the tables are also persisted as Parquet artifacts — the
    "UI read side" analog of ALCO's Redis dicts (SURVEY.md §2.1 S4) and
    a cache so reruns skip the pass.
    """
    import ray

    dicts: dict[str, pa.Table] = {}
    missing: list[str] = []
    for col in columns:
        if out_dir is not None:
            p = Path(out_dir) / f"{col}.parquet"
            if p.exists():
                dicts[col] = pq.read_table(p)
                continue
        missing.append(col)
    if missing:
        # ONE pass for all missing columns: per-block distincts stacked
        # as (col, value) pairs, merged driver-side (tiny by
        # construction for filtered columns).
        def partial(batch: pa.Table) -> pa.Table:
            # Normalize exactly as the parse stage will before the
            # probe (trim, empty->null): a dict built on raw values
            # would miss every value that only appears dirty.
            from .parse import normalize_strings

            cols: list[pa.Array] = []
            vals: list[pa.Array] = []
            for c in missing:
                u = pc.unique(normalize_strings(batch[c]))
                u = u.drop_null()
                vals.append(pc.cast(u, pa.string()))
                cols.append(pa.array([c] * len(u), pa.string()))
            return pa.table({"col": pa.concat_arrays(cols),
                             "value": pa.concat_arrays(vals)})

        parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                          .to_arrow_refs())
        from .aggregate import concat_nonempty
        merged = concat_nonempty(parts)
        for col in missing:
            vals = merged.filter(pc.equal(merged["col"], col))["value"]
            dicts[col] = build_dict_table(vals.combine_chunks())
            if out_dir is not None:
                Path(out_dir).mkdir(parents=True, exist_ok=True)
                tmp = Path(out_dir) / f".{col}.parquet.tmp"
                pq.write_table(dicts[col], tmp)
                tmp.rename(Path(out_dir) / f"{col}.parquet")
    return dicts


def encode_with_dicts(batch: pa.Table, dicts: dict[str, pa.Table]) -> pa.Table:
    """Append ``<col>_id`` int32 per filtered column (null stays null)."""
    for col, table in dicts.items():
        if col not in batch.column_names:
            continue
        ids = pc.index_in(batch[col], value_set=table["value"].combine_chunks()
                          if isinstance(table["value"], pa.ChunkedArray)
                          else table["value"])
        batch = batch.append_column(f"{col}_id", pc.cast(ids, pa.int32()))
    return batch


class DictEncoder:
    """Actor-pool stage (T1): broadcast dict tables, probe per batch.

    Use as ``ds.map_batches(DictEncoder, fn_constructor_kwargs=
    {"dict_refs": refs}, batch_format="pyarrow", concurrency=N)``.
    ``dict_refs`` is ``{col: ray.ObjectRef}`` from one driver-side
    ``ray.put`` per dict — each actor fetches from the local object
    store once, in ``__init__``, not per batch.
    """

    def __init__(self, dict_refs: dict[str, object]):
        import ray

        self.dicts = {col: ray.get(ref) for col, ref in dict_refs.items()}
        # Pre-combine chunks once so per-batch index_in probes are flat.
        self.dicts = {
            col: t.combine_chunks() for col, t in self.dicts.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        return encode_with_dicts(batch, self.dicts)
