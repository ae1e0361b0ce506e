"""Pipeline stages: vectorized map_batches bodies and actor-pool classes."""

from __future__ import annotations

import pyarrow as pa


def enforce_schema(ds, fields: dict[str, "pa.DataType"]):
    """Append an Arrow-native cast stage pinning the output schema.

    Closes the pandas dtype-drift class (VERDICT r3 findings 1-3): a
    ``batch_format="pandas"`` kernel whose output contains nulls or
    null-unioned columns leaves blocks carrying pandas extension
    dtypes (``Int64``) or float64-upcast ids.  Those blocks hash
    differently from the DuckDB oracle's pandas round-trip even when
    every value is numerically identical.  Casting each block to an
    explicit Arrow schema makes the block Arrow-native (int64-with-
    nulls round-trips to pandas exactly like the oracle's nullable
    BIGINT) and silences Ray's "RefBundle with a different schema"
    warnings — their absence is the cheap regression signal.

    ``fields`` is ordered: it also pins column order.  Cast is
    ``safe`` (raises on lossy truncation), so a float64-upcast id
    column with a genuinely fractional value fails loudly instead of
    rounding.
    """
    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {name: t[name].cast(typ) for name, typ in fields.items()})

    return ds.map_batches(cast, batch_format="pyarrow")
