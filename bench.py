#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <flagship sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "turns": T, "turns_per_sec": R}

``--scaling``: runs the flagship ingest twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same input and prints both
throughputs plus the N->4N scaling efficiency (BASELINE.json:2,14 —
the sandbox stand-in for the two-cluster-size criterion).

``--child --cpus N``: internal; one fresh-process flagship run.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline query subset: one per operator family (parse/aggregate,
# enrich-join, ordering, event routing, TPC-H agg-join, tokenize,
# dedup exact + minhash-LSH, quality, brute-force kNN).
BENCH_QUERIES = [
    "t_interval_counts", "t_enriched", "t_ordered_turns", "t_top_recent",
    "e_user_stats", "q1_pricing", "q_mktsegment",
    "d_token_stats", "d_quality", "d_dedup_exact", "d_minhash_lsh",
    "v_knn",
]


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _consume(result) -> int:
    """Force full execution; return the row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.num_rows
    if isinstance(result, pd.DataFrame):
        return len(result)
    return sum(b.num_rows
               for b in result.iter_batches(batch_format="pyarrow"))


def _corpus_turns(corpus: Path) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(p).num_rows
               for p in sorted(corpus.glob("*.parquet")))


def run_flagship_once(num_cpus: int, sf_dir: str) -> dict:
    """One fresh flagship ingest over the sf-matched transcript corpus."""
    _init_ray(num_cpus)
    from alco_ray import fixtures
    from alco_ray.pipelines.flagship import run_flagship

    corpus = fixtures.corpus_for_sf(sf_dir)
    turns = _corpus_turns(corpus)
    out = f"/tmp/alco_ray_bench_out_{num_cpus}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    summary = run_flagship(
        corpus, out, wave_size=64,
        encoder_concurrency=(2, max(4, num_cpus // 4)))
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return {"sec": dt, "turns": turns, "turns_per_sec": turns / dt,
            "rows": summary["rows"], "num_cpus": num_cpus}


def main() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    os.environ.setdefault("PYTHONPATH", str(Path(__file__).resolve().parent))

    if "--child" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(run_flagship_once(cpus, SF_DIR)))
        import ray

        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        env = dict(os.environ, PYTHONPATH=str(Path(__file__).resolve().parent))
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--child", "--cpus", str(cpus)],
                capture_output=True, text=True, env=env, timeout=3600)
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-2000:])
                raise SystemExit(f"child num_cpus={cpus} failed")
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        r8, r32 = results[8], results[32]
        eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / (32 / 8)
        print(json.dumps({
            "metric": "flagship ingest N->4N scaling (8 vs 32 CPUs, fresh processes)",
            "sf": Path(SF_DIR).name,
            "turns": r8["turns"],
            "throughput_8cpu_turns_per_sec": round(r8["turns_per_sec"], 1),
            "throughput_32cpu_turns_per_sec": round(r32["turns_per_sec"], 1),
            "sec_8cpu": round(r8["sec"], 2),
            "sec_32cpu": round(r32["sec"], 2),
            "scaling_efficiency": round(eff, 3),
        }))
        return

    # ---- default mode: flagship + headline queries, one Ray session ----
    _init_ray(CPUS)
    import ray

    from alco_ray import fixtures

    fixtures.corpus_for_sf(SF_DIR)  # materialize outside the timers

    flagship = run_flagship_once(CPUS, SF_DIR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        _consume(qs[name](SF_DIR))
        per_query[name] = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "metric": "flagship parse->enrich->route->aggregate wall time",
        "value": round(flagship["sec"], 3),
        "unit": "sec",
        "queries": per_query,
        "sf": Path(SF_DIR).name,
        "num_cpus": CPUS,
        "turns": flagship["turns"],
        "turns_per_sec": round(flagship["turns_per_sec"], 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
