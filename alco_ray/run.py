"""CLI entry point — the ``ray job submit`` target (SURVEY.md §3.4).

    ray job submit -- python -m alco_ray.run \
        --input /data/transcripts --out /data/routed --wave-size 64

Runs (or resumes) the flagship collector over a Parquet transcript
corpus and prints the summary metrics as one JSON line.  On a cluster,
``ray.init()`` with no address joins the running cluster the job was
submitted to; standalone it starts a local one.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="alco_ray.run",
        description="ALCO-class transcript ingest on Ray Data")
    ap.add_argument("--input", required=True,
                    help="directory of transcript Parquet shards")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--wave-size", type=int, default=64,
                    help="input shards per checkpointed wave")
    ap.add_argument("--no-aggregates", action="store_true",
                    help="skip the final interval-count merge")
    ap.add_argument("--dict-cache", default=None,
                    help="shared dictionary-artifact dir (reused across "
                         "runs over the same corpus; default "
                         "<out>/dicts)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored on a cluster)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    from .pipelines.flagship import run_flagship

    summary = run_flagship(args.input, args.out, wave_size=args.wave_size,
                           write_aggregates=not args.no_aggregates,
                           dict_cache=args.dict_cache)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
