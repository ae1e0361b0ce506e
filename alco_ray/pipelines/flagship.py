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

import ray
import ray.data

from ..specs import LEVELS, UNKNOWN_LEVEL, PipelineConfig, default_transcript_config
from ..sources import read_transcripts, transcript_files, read_routed_output
from ..sinks import promote_staging, write_routed
from ..stages.parse import make_parse_batch
from ..stages.dict_encode import DictEncoder, build_dict_table, build_dicts
from ..stages.route import make_route_batch
from ..stages.aggregate import interval_counts
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
    ds = ds.map_batches(make_parse_batch(cfg), batch_format="pyarrow")
    if dict_refs:
        ds = ds.map_batches(
            DictEncoder,
            fn_constructor_kwargs={"dict_refs": dict_refs},
            batch_format="pyarrow",
            concurrency=encoder_concurrency,
        )
    ds = ds.map_batches(make_route_batch(cfg), batch_format="pyarrow")
    return ds


def _wave_metrics(staging_dir: str | Path) -> dict[str, Any]:
    """Per-wave lineage metrics from the *staged output* (no recompute of
    the ingest lineage): rows, parse failures, routed counts per sink."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    staged = sorted(str(p) for p in
                    Path(staging_dir).glob("sink=*/date=*/*.parquet"))
    ds = ray.data.read_parquet(staged, columns=["sink", "parse_ok"])

    def partial(batch: pa.Table) -> pa.Table:
        fails = pc.cast(pc.invert(batch["parse_ok"]), pa.int64())
        t = pa.table({"sink": batch["sink"], "fail": fails})
        g = t.group_by(["sink"]).aggregate([([], "count_all"), ("fail", "sum")])
        return g.rename_columns(["sink", "rows", "failures"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("sink")
             .aggregate(Sum("rows", alias_name="rows"),
                        Sum("failures", alias_name="failures")))
    t = agg.to_pandas()  # tiny: one row per sink
    return {
        "rows": int(t["rows"].sum()),
        "parse_failures": int(t["failures"].sum()),
        "routed_counts": {str(s): int(r) for s, r in zip(t["sink"], t["rows"])},
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

    for wave_id, wave_files in waves:
        if manifest.is_done(wave_id):
            continue
        cleanup_wave_outputs(out_root, wave_id)
        staging = out_root / "_staging" / wave_id
        shutil.rmtree(staging, ignore_errors=True)

        ds = read_transcripts(wave_files)
        routed = build_ingest(ds, cfg, dict_refs, encoder_concurrency)
        write_routed(routed, staging)

        metrics = _wave_metrics(staging)
        promote_staging(staging, out_root, wave_id)
        manifest.commit(wave_id, input_files=wave_files, metrics=metrics)

    shutil.rmtree(out_root / "_staging", ignore_errors=True)

    summary = manifest.total_metrics()
    if write_aggregates:
        # A1/A2: exact interval counts recomputed from the routed output
        # (column-pruned read; map-side partial aggregation).
        out_ds = read_routed_output(out_root, columns=["sink", "level", "bucket"])
        agg = interval_counts(out_ds)
        agg_dir = out_root / "aggregates" / "interval_counts"
        shutil.rmtree(agg_dir, ignore_errors=True)
        agg.write_parquet(str(agg_dir))
        summary["aggregate_files"] = len(list(agg_dir.glob("*.parquet")))
    return summary
