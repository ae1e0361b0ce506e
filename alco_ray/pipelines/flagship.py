"""Flagship pipeline: collect -> parse -> enrich -> route -> sink -> aggregate.

The Ray-Data re-expression of ALCO's collector ingest loop
(SURVEY.md §3.1 -> §3.4):

  read_parquet(pending shards)                       # S1 source
    .map_batches(parse_batch)                        # P1-P5,P8 fused, zero-copy Arrow
    .map_batches(DictEncoder, concurrency=pool)      # T1 actor pool, broadcast dicts
    .map_batches(route_batch)                        # router: sink + date columns
    .write_parquet(staging, partition_cols=[sink,date])   # S3 buffered fan-out
  metrics from staged output -> promote -> manifest.commit  # ack-after-flush
  groupby(sink, level, bucket).count over routed output     # A1/A2 count queries

Scale properties: no full-input shuffle anywhere on the ingest path
(routing is a map + partitioned write); the only exchanges are the tiny
dict-build distincts and the map-side-combined aggregate; dictionaries
are broadcast once per actor, not per batch; waves bound the blast
radius of a failure and make output resumable (state/checkpoint.py).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..specs import LEVELS, UNKNOWN_LEVEL, PipelineConfig, default_transcript_config
from ..sources import read_transcripts, transcript_files
from ..sinks import promote_staging, write_routed
from ..stages.parse import make_parse_batch
from ..stages.dict_encode import DictEncoder, build_dict_table, build_dicts
from ..stages.route import make_route_batch
from ..state.checkpoint import CheckpointManifest, cleanup_wave_outputs, make_waves


def build_or_load_dicts(files: list[str], cfg: PipelineConfig,
                        cache_dir: str | Path) -> dict[str, pa.Table]:
    """J1 build: role/tool dicts from a column-pruned distinct pass over
    the corpus (cached as Parquet artifacts); the level dict is the
    static canonical set (the level vocabulary is config, not data)."""
    dicts: dict[str, pa.Table] = {}
    dynamic = [c for c in cfg.filtered_columns() if c != "level"]
    if dynamic:
        ds = read_transcripts(files, columns=dynamic)
        dicts.update(build_dicts(ds, dynamic, out_dir=cache_dir))
    if "level" in cfg.filtered_columns():
        dicts["level"] = build_dict_table(sorted([*LEVELS, UNKNOWN_LEVEL]))
    return dicts


def build_ingest(ds: "ray.data.Dataset", cfg: PipelineConfig,
                 dict_refs: dict[str, Any],
                 encoder_concurrency=(2, 8)) -> "ray.data.Dataset":
    """parse -> dict-encode -> route as a lazy Dataset plan."""
    # batch_size=None = whole zero-copy blocks.  The 1024-row default
    # would shred each ~32 MB block into hundreds of per-batch calls;
    # for the actor stage that is an RPC per 1024 rows and caps each
    # actor near ~300k rows/s regardless of how cheap the probe is.
    ds = ds.map_batches(make_parse_batch(cfg), batch_format="pyarrow",
                        batch_size=None)
    if dict_refs:
        ds = ds.map_batches(
            DictEncoder,
            fn_constructor_kwargs={"dict_refs": dict_refs},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=encoder_concurrency,
        )
    ds = ds.map_batches(make_route_batch(cfg), batch_format="pyarrow",
                        batch_size=None)
    return ds


_PARTIAL_KEYS = ["sink", "level", "bucket"]


def _wave_partials(routed: "ray.data.Dataset") -> pa.Table:
    """One combined per-wave partial aggregate from the (materialized)
    routed wave: (sink, level, bucket) -> (rows, failures).  Tiny by
    construction (bounded key cardinality), so it both carries the
    wave's lineage metrics AND serves as the mergeable partial for the
    final interval-count aggregate — neither a re-read of the staged
    files nor an end-of-job full re-read of the routed output exists."""
    import pyarrow.compute as pc

    ds = routed.select_columns(_PARTIAL_KEYS + ["parse_ok"])

    def partial(batch: pa.Table) -> pa.Table:
        fails = pc.cast(pc.invert(batch["parse_ok"]), pa.int64())
        t = pa.table({"sink": pc.cast(batch["sink"], pa.string()),
                      "level": batch["level"], "bucket": batch["bucket"],
                      "fail": fails})
        g = t.group_by(_PARTIAL_KEYS).aggregate(
            [([], "count_all"), ("fail", "sum")])
        return g.rename_columns(_PARTIAL_KEYS + ["rows", "failures"])

    # Per-block partials are bounded by key cardinality (sinks x levels
    # x buckets-touched), so the final combine is a driver-side merge of
    # tiny tables — a distributed shuffle here would be pure overhead.
    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow")
                      .to_arrow_refs())
    merged = pa.concat_tables(t for t in parts if t.num_rows)
    out = (merged.group_by(_PARTIAL_KEYS)
           .aggregate([("rows", "sum"), ("failures", "sum")])
           .rename_columns(_PARTIAL_KEYS + ["rows", "failures"]))
    return out.sort_by([(k, "ascending") for k in _PARTIAL_KEYS])


def _metrics_from_partials(partials: pa.Table) -> dict[str, Any]:
    t = partials.to_pandas()
    by_sink = t.groupby("sink")["rows"].sum()
    return {
        "rows": int(t["rows"].sum()),
        "parse_failures": int(t["failures"].sum()),
        "routed_counts": {str(s): int(r) for s, r in by_sink.items()},
    }


def run_flagship(input_dir: str | Path, out_root: str | Path,
                 cfg: PipelineConfig | None = None, *,
                 wave_size: int = 64,
                 encoder_concurrency=(2, 8),
                 write_aggregates: bool = True) -> dict[str, Any]:
    """Run (or resume) the flagship ingest over a transcript corpus.

    Returns a summary dict with total metrics; detailed per-wave lineage
    lives in ``<out_root>/_checkpoint/manifest.json``.
    """
    cfg = cfg or default_transcript_config()
    out_root = Path(out_root)
    files = transcript_files(input_dir)
    if not files:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")

    manifest = CheckpointManifest(out_root)
    waves = make_waves(files, wave_size)

    dicts = build_or_load_dicts(files, cfg, out_root / "dicts")
    dict_refs = {col: ray.put(t) for col, t in dicts.items()}

    partials_dir = out_root / "_checkpoint" / "partials"
    partials_dir.mkdir(parents=True, exist_ok=True)

    for wave_id, wave_files in waves:
        if manifest.is_done(wave_id):
            continue
        cleanup_wave_outputs(out_root, wave_id)
        staging = out_root / "_staging" / wave_id
        shutil.rmtree(staging, ignore_errors=True)

        ds = read_transcripts(wave_files)
        routed = build_ingest(ds, cfg, dict_refs, encoder_concurrency)
        # Materialize the wave in the object store: the ingest lineage
        # runs ONCE, then both consumers (staged write + partial
        # aggregate) read the same blocks zero-copy.  A wave is the
        # bounded unit (wave_size input shards), so peak footprint is
        # wave-sized, not corpus-sized; the store spills if needed.
        routed = routed.materialize()
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_write = max(1, min(cpus, routed.size_bytes() // (64 << 20) + 1))
        write_routed(routed, staging, num_tasks=n_write)

        partials = _wave_partials(routed)
        pq.write_table(partials, partials_dir / f"{wave_id}.parquet")
        promote_staging(staging, out_root, wave_id)
        manifest.commit(wave_id, input_files=wave_files,
                        metrics=_metrics_from_partials(partials))

    shutil.rmtree(out_root / "_staging", ignore_errors=True)

    summary = manifest.total_metrics()
    if write_aggregates:
        # A1/A2: exact interval counts = merge of the per-wave partials
        # (each already a (sink, level, bucket)->rows partial aggregate
        # of its wave's routed output) — no end-of-job re-read of the
        # full corpus.  Bounded key cardinality keeps this driver-side.
        merged = pa.concat_tables(
            pq.read_table(partials_dir / f"{wid}.parquet",
                          columns=_PARTIAL_KEYS + ["rows"])
            for wid, _ in waves)
        agg = (merged.group_by(_PARTIAL_KEYS).aggregate([("rows", "sum")])
               .rename_columns(_PARTIAL_KEYS + ["cnt"])
               .sort_by([(k, "ascending") for k in _PARTIAL_KEYS]))
        agg_dir = out_root / "aggregates" / "interval_counts"
        shutil.rmtree(agg_dir, ignore_errors=True)
        agg_dir.mkdir(parents=True, exist_ok=True)
        pq.write_table(agg, agg_dir / "part-00000.parquet")
        summary["aggregate_files"] = len(list(agg_dir.glob("*.parquet")))
    return summary
