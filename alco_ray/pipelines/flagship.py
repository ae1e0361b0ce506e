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

import json
import os
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
from ..stages.dict_encode import build_dict_table, build_dicts
from ..stages.route import make_route_batch
from ..state.checkpoint import (CheckpointManifest,
                                cleanup_uncommitted_outputs, make_waves)


#: Dictionary-encoded columns are the LOW-cardinality enum-ish ones
#: (role, tool): every dict is broadcast whole to every ingest actor
#: and grown via a driver-side set, so a high-cardinality column
#: (user text, ids) pointed at this path would silently build a
#: giant driver-resident dict.  Guarded: past this cap the build
#: RAISES naming the column instead of degrading.
MAX_DICT_CARDINALITY = 100_000


def build_or_load_dicts(files: list[str], cfg: PipelineConfig,
                        cache_dir: str | Path,
                        max_cardinality: int = MAX_DICT_CARDINALITY,
                        ) -> dict[str, pa.Table]:
    """J1 build: role/tool dicts from a column-pruned distinct pass,
    cached as Parquet artifacts and grown **insert-if-absent**.

    The cache tracks which corpus files it has already folded in
    (``_scanned.json``), so a re-run scans only NEW shards; values
    unseen by the cache are APPENDED with ids continuing after the
    existing max — ALCO's Redis insert-if-absent semantics — so ids
    already written into routed output never change when the corpus
    grows.  (First build = sorted distinct, the documented
    deterministic deviation from Redis arrival order; a vocab-stable
    appended corpus therefore yields byte-identical dicts to a fresh
    full build.)  The level dict is the static canonical set (the
    level vocabulary is config, not data).

    Concurrency contract: ONE writer per cache dir at a time (the
    checkpointed out_root default satisfies this; a shared
    ``dict_cache`` must not be grown by overlapping runs — per-file
    writes are atomic, but the grow step is read-modify-write)."""
    dicts: dict[str, pa.Table] = {}
    dynamic = [c for c in cfg.filtered_columns() if c != "level"]
    cache = Path(cache_dir)
    if dynamic:
        state_path = cache / "_scanned.json"
        scanned = set(json.loads(state_path.read_text())) \
            if state_path.exists() else set()
        for c in dynamic:
            p = cache / f"{c}.parquet"
            if p.exists():
                dicts[c] = pq.read_table(p)
        pending = [f for f in sorted(files) if f not in scanned]
        if pending:
            ds = read_transcripts(pending, columns=dynamic)
            fresh = build_dicts(ds, dynamic)
            cache.mkdir(parents=True, exist_ok=True)
            for c in dynamic:
                if c in dicts:
                    have = set(dicts[c]["value"].to_pylist())
                    new_vals = [v for v in fresh[c]["value"].to_pylist()
                                if v not in have]
                    if new_vals:
                        grown = pa.table({
                            "value": pa.array(
                                list(dicts[c]["value"].to_pylist())
                                + sorted(new_vals), pa.string()),
                            "id": pa.array(
                                range(len(have) + len(new_vals)), pa.int32()),
                        })
                        dicts[c] = grown
                else:
                    dicts[c] = fresh[c]
                if dicts[c].num_rows > max_cardinality:
                    raise ValueError(
                        f"dictionary column {c!r} has cardinality "
                        f"{dicts[c].num_rows} > max_cardinality="
                        f"{max_cardinality}: dictionary encoding is "
                        "for low-cardinality enum columns (the dict "
                        "is broadcast whole to every actor); exclude "
                        "this column or raise the cap explicitly")
                tmp = cache / f".{c}.parquet.tmp.{os.getpid()}"
                pq.write_table(dicts[c], tmp)
                os.replace(tmp, cache / f"{c}.parquet")
            scanned.update(pending)
            tmp = cache / f"._scanned.json.tmp.{os.getpid()}"
            tmp.write_text(json.dumps(sorted(scanned)))
            os.replace(tmp, state_path)
    if "level" in cfg.filtered_columns():
        dicts["level"] = build_dict_table(sorted([*LEVELS, UNKNOWN_LEVEL]))
    return dicts


class IngestWorker:
    """The collector, fused: parse -> dict-encode -> route (-> buffered
    sink insert) in ONE actor-pool stage (T1 semantics: broadcast dict
    tables fetched and pattern registry compiled once per actor in
    ``__init__``).

    This is ALCO's collector worker re-expressed: consume a batch,
    parse/enrich it, bulk-insert it into the routed per-logger per-day
    sink, and emit only the counters.  Fusing matters three ways: each
    batch makes one trip through one worker instead of several operator
    hops through the object store; the whole ingest CPU budget lives in
    a single actor pool (no static CPU split between pools that idles
    one of them at small cluster sizes); and when ``staging_dir`` is
    set, the heavy routed rows never enter the object store at all —
    the stage's dataset output is just the per-batch partial aggregate
    (sink, level, bucket -> rows, failures).

    Retried tasks are safe: sink filenames are content-hashed from the
    batch identity (see sinks._make_block_writer), so a replayed batch
    overwrites its own files and re-emits the same partial."""

    def __init__(self, cfg: PipelineConfig, dict_refs: dict[str, Any],
                 staging_dir: str | None = None,
                 partition_cols: tuple[str, ...] = ("sink", "date")):
        from ..sinks import _make_block_writer

        self.parse = make_parse_batch(cfg)
        self.route = make_route_batch(cfg)
        self.dicts = {c: ray.get(r).combine_chunks()
                      for c, r in dict_refs.items()}
        self.writer = (_make_block_writer(staging_dir, list(partition_cols))
                       if staging_dir else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.dict_encode import encode_with_dicts

        routed = self.route(encode_with_dicts(self.parse(batch), self.dicts))
        if self.writer is None:
            return routed
        self.writer(routed)
        return _partial_of(routed)


_PARTIAL_KEYS = ["sink", "level", "bucket"]


def _partial_of(routed: pa.Table) -> pa.Table:
    """Per-batch partial aggregate (sink, level, bucket) -> (rows,
    failures) — T3 counters, computed where the rows are."""
    import pyarrow.compute as pc

    fails = pc.cast(pc.invert(routed["parse_ok"]), pa.int64())
    t = pa.table({"sink": pc.cast(routed["sink"], pa.string()),
                  "level": routed["level"], "bucket": routed["bucket"],
                  "fail": fails})
    g = t.group_by(_PARTIAL_KEYS).aggregate(
        [([], "count_all"), ("fail", "sum")])
    return g.rename_columns(_PARTIAL_KEYS + ["rows", "failures"])


def _merge_partials(parts: list[pa.Table]) -> pa.Table:
    """Combine per-batch partials into the wave's partial aggregate.

    Per-batch partials are bounded by key cardinality (sinks x levels
    x buckets-touched), so the final combine is a driver-side merge of
    tiny tables — a distributed shuffle here would be pure overhead."""
    from ..stages.aggregate import concat_nonempty

    merged = concat_nonempty(parts)
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


def watch_flagship(input_dir: str | Path, out_root: str | Path,
                   cfg: PipelineConfig | None = None, *,
                   wave_size: int = 64,
                   poll_interval_s: float = 5.0,
                   max_idle_polls: int | None = None,
                   stop=None,
                   dict_cache: str | Path | None = None) -> dict[str, Any]:
    """The streaming-collector loop: poll ``input_dir`` for new shards
    and ingest each new frontier with :func:`run_flagship` (file-keyed
    incremental waves — only NEW files are processed; totals equal a
    fresh full run bit-for-bit, pinned by the resume tests).

    ALCO's collector blocks on an AMQP queue; the Parquet-shard analog
    is this poll loop.  ``stop`` (callable -> bool, checked once per
    poll) ends the loop for embedding/testing; ``max_idle_polls`` ends
    it after that many consecutive polls with no new work (None =
    run forever, the daemon mode).  An empty input dir is 'waiting for
    the first shard', not an error.  Returns the cumulative summary."""
    import time

    idle = 0
    while True:
        if stop is not None and stop():
            break
        manifest = CheckpointManifest(out_root)
        files = transcript_files(input_dir)
        pending = [f for f in files if f not in manifest.processed_files()]
        if pending:
            run_flagship(input_dir, out_root, cfg, wave_size=wave_size,
                         dict_cache=dict_cache)
            idle = 0
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                break
            time.sleep(poll_interval_s)
    return CheckpointManifest(out_root).total_metrics()


def run_flagship(input_dir: str | Path, out_root: str | Path,
                 cfg: PipelineConfig | None = None, *,
                 wave_size: int = 64,
                 encoder_concurrency=None,
                 write_aggregates: bool = True,
                 dict_cache: str | Path | None = None) -> dict[str, Any]:
    """Run (or resume) the flagship ingest over a transcript corpus.

    Returns a summary dict with total metrics; detailed per-wave lineage
    lives in ``<out_root>/_checkpoint/manifest.json``.

    ``wave_size`` trades resume granularity against fixed per-wave cost
    (actor-pool start, execution barrier, partial fold, promote —
    measured ~4-5 s per wave at 32 CPUs).  Size waves so each carries
    at least ~a minute of compute: at 10^12-turn scale that is tens of
    ~1 GB shards per wave and the overhead is percent-level; 1-file
    waves would be dominated by it.
    """
    cfg = cfg or default_transcript_config()
    out_root = Path(out_root)
    files = transcript_files(input_dir)
    if not files:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")

    manifest = CheckpointManifest(out_root)

    # Incremental / append-stable ingest: the manifest is keyed by the
    # FILES each committed wave processed, so a grown corpus resumes by
    # processing only the new shards — the streaming collector's most
    # common operation.  A *shrunk* corpus is ambiguous (totals would
    # silently include vanished data) and is rejected.
    processed = manifest.processed_files()
    gone = sorted(processed - set(files))
    if gone:
        raise ValueError(
            f"checkpoint at {out_root} records {len(gone)} processed "
            f"file(s) missing from the corpus (first: {gone[0]}); "
            "committed totals would silently include vanished data — "
            "use a fresh out_root for a shrunk/replaced corpus")
    # A shard rewritten IN PLACE (same name, new size/mtime) must not
    # be silently treated as already-processed: committed output and
    # aggregates would go stale.  Same contract as the shrunk-corpus
    # check; use a fresh out_root for a replaced corpus.
    recorded = manifest.file_sigs()
    for f in files:
        sig = recorded.get(f)
        if sig is not None:
            st = os.stat(f)
            if [st.st_size, st.st_mtime_ns] != sig:
                raise ValueError(
                    f"checkpoint at {out_root} recorded {f} with "
                    f"size/mtime {sig}, but the file on disk has "
                    f"[{st.st_size}, {st.st_mtime_ns}] — shard rewritten "
                    "in place; use a fresh out_root for a replaced corpus")
    pending = [f for f in files if f not in processed]
    # Signatures captured BEFORE any wave reads its files: a shard a
    # producer rewrites/appends WHILE a wave is reading it must carry
    # its pre-read signature in the manifest, so the next resume
    # detects the change instead of silently dropping the new rows.
    pending_sigs: dict[str, list] = {}
    for f in pending:
        try:
            st = os.stat(f)
            pending_sigs[f] = [st.st_size, st.st_mtime_ns]
        except OSError:
            pass
    waves = make_waves(pending, wave_size)
    # Orphans of half-committed waves (any wave-id prefix not in the
    # manifest) are deleted up front; content-hashed wave ids mean a
    # crashed run's regrouped pending files get fresh ids.
    cleanup_uncommitted_outputs(out_root, set(manifest.waves))

    partials_dir = out_root / "_checkpoint" / "partials"
    partials_dir.mkdir(parents=True, exist_ok=True)

    dict_refs = None
    if pending:
        # Insert-if-absent growth keyed by already-scanned shards: a
        # resume/append run scans only new files, and ids already
        # written into committed output never change.  ``dict_cache``
        # lets runs over the same corpus share the artifact (ALCO's
        # dictionaries live in Redis and are warm for every collector;
        # rebuilding them per job is fixed cost the reference never
        # pays).
        dicts = build_or_load_dicts(files, cfg,
                                    dict_cache or out_root / "dicts")
        dict_refs = {col: ray.put(t) for col, t in dicts.items()}

    for wave_id, wave_files in waves:
        if manifest.is_done(wave_id):
            continue
        staging = out_root / "_staging" / wave_id
        shutil.rmtree(staging, ignore_errors=True)

        ds = read_transcripts(wave_files)
        # ONE streaming pass: each IngestWorker batch is parsed,
        # enriched, routed, written to its sink files AND reduced to a
        # partial-count table inside the worker — the heavy rows never
        # transit the object store, there is no materialize barrier,
        # and the stage's output IS the wave's metric partials.
        n_rows = ds.count()  # Parquet metadata only, no read
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # Leave ~1/8 of CPUs (always >=1) outside the pool for the read
        # operator: a pool holding every CPU starves reads — and can
        # deadlock against its own next wave's actor startup while old
        # actors wind down.  (A 1/4 reserve measured strictly worse:
        # parquet reads are cheap relative to parse.)
        # ...and don't start more actors than the wave can feed (~50k
        # rows each): pool startup is the dominant cost of a small run.
        # (Measured at sf0.1/657k rows on 32 CPUs: 6 actors 7.9 s, 12
        # actors 7.3 s, 20 actors 7.3 s — feed-starved pools leave the
        # pipeline read-bound, oversized ones just pay startup.)
        n_act = encoder_concurrency or max(
            1, min(cpus - max(1, cpus // 8), max(1, n_rows // 50_000)))
        if isinstance(n_act, tuple):
            pool = n_act
        else:
            pool = (n_act, n_act)
        # ~2 batches per actor for tail balance, capped near ~64 MB of
        # input rows so worker heap stays bounded at any corpus size.
        rows_per_batch = max(1, min(-(-n_rows // (2 * pool[1])), 300_000))
        out = ds.map_batches(
            IngestWorker,
            fn_constructor_kwargs={"cfg": cfg, "dict_refs": dict_refs,
                                   "staging_dir": str(staging)},
            batch_format="pyarrow",
            batch_size=rows_per_batch,
            concurrency=pool,
        )
        partials = _merge_partials(ray.get(out.to_arrow_refs()))
        pq.write_table(partials, partials_dir / f"{wave_id}.parquet")
        promote_staging(staging, out_root, wave_id)
        manifest.commit(wave_id, input_files=wave_files,
                        metrics=_metrics_from_partials(partials),
                        input_sigs={f: pending_sigs[f] for f in wave_files
                                    if f in pending_sigs})

    shutil.rmtree(out_root / "_staging", ignore_errors=True)

    summary = manifest.total_metrics()
    if write_aggregates:
        # A1/A2: exact interval counts = merge of the per-wave partials
        # across ALL committed waves (including earlier runs' — an
        # append run re-merges old partials with the new ones, no
        # re-read of committed corpus data).  Bounded key cardinality
        # keeps this driver-side.
        merged = pa.concat_tables(
            pq.read_table(partials_dir / f"{wid}.parquet",
                          columns=_PARTIAL_KEYS + ["rows"])
            for wid in manifest.waves)
        agg = (merged.group_by(_PARTIAL_KEYS).aggregate([("rows", "sum")])
               .rename_columns(_PARTIAL_KEYS + ["cnt"])
               .sort_by([(k, "ascending") for k in _PARTIAL_KEYS]))
        agg_dir = out_root / "aggregates" / "interval_counts"
        shutil.rmtree(agg_dir, ignore_errors=True)
        agg_dir.mkdir(parents=True, exist_ok=True)
        pq.write_table(agg, agg_dir / "part-00000.parquet")
        summary["aggregate_files"] = len(list(agg_dir.glob("*.parquet")))
    return summary
