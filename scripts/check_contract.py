"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and compares against
``oracle_sql()`` via DuckDB: row count, column names, and
order-insensitive exact value equality.  Usage:

    python scripts/check_contract.py [sf_dir] [query ...]
    python scripts/check_contract.py --chunk 4 [sf_dir]

``--chunk N`` splits the registry into N FRESH SUBPROCESSES: ray 2.49's
core has twice crashed a >90-pipeline single session with a refcount
assertion (reference_count.cc:581, zero query failures — see
BASELINE.md), so full-registry sweeps should stay under that horizon
per process.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()  # ray Dataset


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") and str(df[c].dtype) != "datetime64[us]":
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) == "Int32":
            df[c] = df[c].astype("object").where(df[c].notna(), None)
        if str(df[c].dtype).startswith("int"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, got, want, strict: bool = True):
    import pandas as pd

    if strict:
        # Replicate the driver's hash sensitivity (round-3 escape):
        # the driver hashes the pandas round-trip of both sides, so a
        # pandas extension dtype (Int64) or a float64-upcast id column
        # hashes differently from the oracle's nullable-BIGINT round-
        # trip even when every value is numerically identical.  Demand
        # dtype equality BEFORE any normalization.
        gd = {c: str(got[c].dtype) for c in got.columns}
        wd = {c: str(want[c].dtype) for c in want.columns}
        drift = {c: (gd[c], wd[c]) for c in gd if c in wd and gd[c] != wd[c]}
        if drift:
            return f"dtype drift (engine vs oracle): {drift}"

    g, w = normalize(got), normalize(want)
    if list(g.columns) != list(w.columns):
        return f"columns differ: {list(g.columns)} vs {list(w.columns)}"
    if len(g) != len(w):
        return f"row count differs: {len(g)} vs {len(w)}"
    for c in g.columns:
        a, b = g[c], w[c]
        try:
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = int((~eq).idxmax())
                return (f"column {c} differs at sorted row {i}: "
                        f"{a.iloc[i]!r} vs {b.iloc[i]!r}")
        except Exception as e:  # dtype mismatch etc.
            return f"column {c} compare error: {e} ({a.dtype} vs {b.dtype})"
    return None


def _chunked_main(n_chunks: int) -> None:
    """Split the registry across fresh subprocesses (one Ray session
    each) and aggregate exit codes."""
    import re
    import subprocess

    src = (Path(__file__).resolve().parent.parent
           / "alco_ray" / "pipelines" / "queries.py").read_text()
    reg = src[src.index("REGISTRY = {"):]
    names = sorted(re.findall(r'^    "([a-z0-9_]+)":', reg, re.M))
    args = [a for a in sys.argv[1:] if a != "--chunk"]
    args.remove(str(n_chunks))
    sf = args[0] if args else "/root/testdata/sf0.01"
    per = -(-len(names) // n_chunks)
    failed = False
    for i in range(n_chunks):
        chunk = names[i * per:(i + 1) * per]
        if not chunk:
            continue
        r = subprocess.run([sys.executable, __file__, sf, *chunk])
        failed |= r.returncode != 0
    sys.exit(1 if failed else 0)


def main():
    import duckdb

    import ray

    if "--chunk" in sys.argv:
        _chunked_main(int(sys.argv[sys.argv.index("--chunk") + 1]))
        return

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append((name, f"engine raised: {type(e).__name__}: {e}"))
            print(f"FAIL {name}: engine raised {e}")
            continue
        dt_engine = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows, "
                  f"{dt_engine:.1f}s, no oracle)")
            continue
        t0 = time.time()
        try:
            # The driver always runs at sf0.01 (the t_* SQL hardcodes that
            # corpus path); for local runs at other scales, retarget it.
            sql = sqls[name].replace("sf0.01", Path(sf_dir).name)
            want = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"oracle raised: {e}"))
            print(f"FAIL {name}: oracle raised {e}")
            continue
        err = compare(name, got, want)
        if err:
            failures.append((name, err))
            print(f"FAIL {name}: {err}")
        else:
            print(f"ok   {name}: {len(got)} rows match "
                  f"(engine {dt_engine:.1f}s, oracle {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures / {len(qs)} queries")
    for name, err in failures:
        print(f"  {name}: {err}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
