"""Persisted inverted full-text index + pruned grep probe.

The reference's entire read side is a persisted *searchable* index
(Sphinx RT MATCH over per-logger per-day shards; SURVEY.md §1.1
"Indexed row", §3.3 grep path).  ``t_grep`` answers that query by
re-scanning and re-parsing the corpus per call; this module is the
build-once / query-many analog, shaped like the persisted ANN indexes
in similarity.py:

- **Build** (:func:`build_text_index`): one parse pass over the corpus
  emits per-turn DISTINCT token postings ``(token, conv_id, turn_idx,
  parsed_ts, level)`` written as ``postings/bucket=<h>/`` partitioned
  Parquet (bucket = token-hash & mask — Sphinx's term dictionary), plus
  a ``docs/date=<d>/`` docstore carrying the text payload (Sphinx's
  attribute/row store, partitioned by day exactly like ALCO's
  per-day shards).  Staged ``.building.<pid>`` dir + atomic swap, meta
  sidecar with the bucket count and a caller corpus signature.
- **Probe** (:func:`grep_probe`): term -> ONE posting bucket directory
  (pruned read), vectorized level/time filters on posting attributes,
  top-k merge, then text fetched from ONLY the matched rows' date
  partitions.  Cost scales with the probed bucket + matched days, not
  the corpus.

Match semantics are Sphinx MATCH's: whole-token equality after the
shared tokenizer (``parse.tokenize``), not substring LIKE — the same
trade the reference makes.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .parse import tokenize
from .text import hash_tokens

POSTING_COLS = ["conv_id", "turn_idx", "parsed_ts", "level"]


def _bucket_of(tokens: np.ndarray, n_buckets: int) -> np.ndarray:
    return (hash_tokens(tokens) & np.uint64(n_buckets - 1)).astype(np.int32)


def posting_explode(batch: pa.Table, n_buckets: int,
                    text_col: str = "text") -> pa.Table:
    """One posting row per (turn, DISTINCT token) with the token's
    in-turn POSITIONS as a list column (format v2 — phrase search
    needs adjacency): vectorized tokenize -> per-row first-occurrence
    dedup (lexsort + adjacent-duplicate drop, positions gathered from
    the same sort) -> bucket id.  No per-row Python."""
    toks = tokenize(batch[text_col], batch.num_rows)
    flat = toks.values.to_numpy(zero_copy_only=False)
    offs = np.asarray(toks.offsets).astype(np.int64)
    rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                     np.diff(offs))
    if len(flat):
        pos_in_row = np.arange(len(flat), dtype=np.int64) - offs[rows]
        h = hash_tokens(flat)
        srt = np.lexsort((pos_in_row, h, rows))
        rs, hs = rows[srt], h[srt]
        first = np.ones(len(srt), dtype=bool)
        first[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
        keep = srt[first]
        starts = np.flatnonzero(first)
        plist = pa.ListArray.from_arrays(
            pa.array(np.append(starts, len(srt)).astype(np.int32)),
            pa.array(pos_in_row[srt].astype(np.int32)))
    else:
        keep = np.zeros(0, dtype=np.int64)
        plist = pa.array([], pa.list_(pa.int32()))
    kept_tokens = flat[keep]
    kept_rows = rows[keep]
    doclens = np.diff(offs)[kept_rows] if len(keep) \
        else np.zeros(0, np.int64)
    cols = {
        "bucket": pa.array(_bucket_of(kept_tokens, n_buckets)),
        "token": pa.array(kept_tokens, pa.string()),
        "positions": plist,
        # total token count of the owning turn (v3): BM25 length
        # normalization needs dl per candidate at score time, and
        # carrying it on the posting row (4 bytes) beats a corpus-
        # sized docstore join per query.
        "doclen": pa.array(doclens.astype(np.int32)),
    }
    for c in POSTING_COLS:
        cols[c] = batch[c].take(pa.array(kept_rows))
    return pa.table(cols)


def build_text_index(parsed_ds, index_dir: str | Path, *,
                     text_col: str = "text", n_buckets: int | None = None,
                     approx_rows: int | None = None,
                     extra_meta: dict | None = None) -> None:
    """Build the persisted index from a PARSED dataset (columns
    conv_id, turn_idx, parsed_ts, level, text).  Staged build + atomic
    swap (crash-safe, same protocol as similarity.build_lsh_index);
    ``extra_meta`` (e.g. a corpus signature) rides in meta.json for
    staleness checks."""
    from ..sinks import _make_block_writer
    from .similarity import _swap_in_index, _sweep_stale_builds
    from .window import suggest_key_partitions

    if n_buckets is None:
        # ~32 distinct tokens per turn estimated; bucket files bounded
        # at any corpus size, power of two for the mask.
        n = approx_rows if approx_rows is not None else parsed_ds.count()
        n_buckets = suggest_key_partitions(n * 32)

    d = Path(index_dir)
    _sweep_stale_builds(d)
    build = d.parent / f".{d.name}.building.{os.getpid()}"
    build.mkdir(parents=True, exist_ok=True)

    # One parse of the corpus feeds BOTH artifacts: without this, the
    # postings pass and the docstore pass would each re-execute the
    # upstream read+parse plan.
    parsed_ds = parsed_ds.materialize()

    post_writer = _make_block_writer(str(build / "postings"), ["bucket"])
    postings = parsed_ds.map_batches(
        lambda b: posting_explode(b, n_buckets, text_col),
        batch_format="pyarrow")
    postings.map_batches(post_writer, batch_format="pyarrow").materialize()

    doc_writer = _make_block_writer(str(build / "docs"), ["date"])

    def docstore(b: pa.Table) -> pa.Table:
        return pa.table({
            "date": pc.strftime(b["parsed_ts"], "%Y-%m-%d"),
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"],
            text_col: b[text_col],
        })

    parsed_ds.map_batches(docstore, batch_format="pyarrow") \
        .map_batches(doc_writer, batch_format="pyarrow").materialize()

    n_turns, total_tokens = _corpus_token_totals(parsed_ds, text_col)
    meta = {"kind": "text_inverted", "version": 3,
            "n_buckets": n_buckets,
            "n_turns": n_turns, "total_tokens": total_tokens,
            "text_col": text_col, **(extra_meta or {})}
    (build / "meta.json").write_text(json.dumps(meta))
    _swap_in_index(build, d)


def _corpus_token_totals(parsed_ds, text_col: str) -> tuple[int, int]:
    """(n_turns, total token count) of a parsed corpus — the BM25
    avgdl inputs, recorded in meta.json at build/update time so probes
    never re-scan.  One distributed pass emitting one row per block."""

    def totals(b: pa.Table) -> pa.Table:
        toks = tokenize(b[text_col], b.num_rows)
        t = pc.sum(pc.list_value_length(toks)).as_py() or 0
        return pa.table({"rows": pa.array([b.num_rows], pa.int64()),
                         "toks": pa.array([int(t)], pa.int64())})

    per_block = parsed_ds.map_batches(
        totals, batch_format="pyarrow").to_pandas()
    return int(per_block["rows"].sum()), int(per_block["toks"].sum())


def grep_probe(index_dir: str | Path, term: str, *, level: str | None = None,
               ts_min=None, ts_max=None, k: int = 20,
               cursor: tuple | None = None,
               stats_out: dict | None = None):
    """MATCH-style probe: rows whose tokenized text contains ``term``,
    optional level / [ts_min, ts_max) filters, newest-first top-k with
    (conv_id, turn_idx) tie-break.  Reads ONE posting bucket directory
    and only the matched rows' docstore day-partitions; ``stats_out``
    (if given) records the file lists actually read, for audit.

    ``cursor`` = (parsed_ts, conv_id, turn_idx) of the LAST row of the
    previous page enables KEYSET pagination (the offset-free cursor
    read SURVEY §2 O2 deferred): only rows strictly after the cursor
    in (ts DESC, conv ASC, turn ASC) order are candidates, so page N+1
    costs the same one-bucket probe as page 1 — no OFFSET scan, no
    server-side state."""
    import ray.data

    from .order import top_k

    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    term_l = term.lower()
    bucket = int(_bucket_of(np.array([term_l], dtype=object),
                            meta["n_buckets"])[0])
    pfiles = sorted(str(p) for p in
                    (d / "postings" / f"bucket={bucket}").glob("*.parquet"))
    if stats_out is not None:
        stats_out["posting_files"] = pfiles
        stats_out["doc_files"] = []
    text_col = meta["text_col"]
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "parsed_ts": pa.array([], pa.timestamp("us")),
                      text_col: pa.array([], pa.string())})
    if not pfiles:
        return ray.data.from_arrow(empty)

    def match(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["token"], term_l)
        if level is not None:
            keep = pc.and_(keep, pc.equal(b["level"], level))
        if ts_min is not None:
            keep = pc.and_(keep, pc.greater_equal(b["parsed_ts"],
                                                  pa.scalar(ts_min)))
        if ts_max is not None:
            keep = pc.and_(keep, pc.less(b["parsed_ts"],
                                         pa.scalar(ts_max)))
        if cursor is not None:
            c_ts, c_conv, c_turn = cursor
            ts, cv, tn = b["parsed_ts"], b["conv_id"], b["turn_idx"]
            after = pc.or_(
                pc.less(ts, pa.scalar(c_ts)),
                pc.and_(pc.equal(ts, pa.scalar(c_ts)), pc.or_(
                    pc.greater(cv, pa.scalar(c_conv)),
                    pc.and_(pc.equal(cv, pa.scalar(c_conv)),
                            pc.greater(tn, pa.scalar(
                                c_turn, type=b["turn_idx"].type))))))
            keep = pc.and_(keep, after)
        return b.filter(keep).select(["conv_id", "turn_idx", "parsed_ts"])

    hits = ray.data.read_parquet(pfiles) \
        .map_batches(match, batch_format="pyarrow", batch_size=None)
    topk = top_k(hits, ["parsed_ts", "conv_id", "turn_idx"], k,
                 descending=[True, False, False]).to_pandas()
    if not len(topk):
        return ray.data.from_arrow(empty)
    return _fetch_texts(d, text_col, topk, empty, stats_out)


def _fetch_texts(d: Path, text_col: str, topk, empty: pa.Table,
                 stats_out: dict | None):
    """Text fetch for a driver-side top-k frame: read only the matched
    rows' docstore day partitions (k rows -> a handful of days), join
    driver-side."""
    import ray
    import ray.data

    from .aggregate import concat_nonempty

    days = sorted(set(topk["parsed_ts"].dt.strftime("%Y-%m-%d")))
    dfiles = sorted(str(p) for day in days
                    for p in (d / "docs" / f"date={day}").glob("*.parquet"))
    if stats_out is not None:
        stats_out["doc_files"] = dfiles
    convs = pa.array(topk["conv_id"].unique())

    def fetch(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["conv_id"], value_set=convs)) \
            .select(["conv_id", "turn_idx", text_col])

    docs = ray.data.read_parquet(dfiles) \
        .map_batches(fetch, batch_format="pyarrow", batch_size=None)
    dt = concat_nonempty(ray.get(docs.to_arrow_refs()))
    out = topk.merge(dt.to_pandas(), on=["conv_id", "turn_idx"],
                     how="left")
    return ray.data.from_arrow(pa.Table.from_pandas(
        out, preserve_index=False).cast(empty.schema))


def match_all_probe(index_dir: str | Path, terms: list[str], *,
                    level: str | None = None, ts_min=None, ts_max=None,
                    k: int = 20, stats_out: dict | None = None):
    """Multi-term AND probe (Sphinx ``MATCH('a b')`` implicit-AND
    semantics): rows whose tokenized text contains EVERY term.  Reads
    one posting bucket directory PER DISTINCT TERM (still pruned — the
    untouched buckets never load), then intersects on (conv_id,
    turn_idx) with one key-hash partition pass: per partition a turn's
    distinct-term count equals ``len(terms)`` iff all terms hit.  The
    posting rows for the queried terms are the only thing that
    shuffles; top-k + docstore fetch as in :func:`grep_probe`."""
    import pandas as pd
    import ray.data

    from .order import top_k
    from .window import partition_by_key

    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    terms_l = sorted({t.lower() for t in terms})
    n_terms = len(terms_l)
    buckets = sorted({int(b) for b in _bucket_of(
        np.array(terms_l, dtype=object), meta["n_buckets"])})
    pfiles = sorted(str(p) for b in buckets
                    for p in (d / "postings" / f"bucket={b}")
                    .glob("*.parquet"))
    if stats_out is not None:
        stats_out["posting_files"] = pfiles
        stats_out["doc_files"] = []
    text_col = meta["text_col"]
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "parsed_ts": pa.array([], pa.timestamp("us")),
                      text_col: pa.array([], pa.string())})
    if not pfiles:
        return ray.data.from_arrow(empty)
    term_set = pa.array(terms_l, pa.string())

    def match(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["token"], value_set=term_set)
        if level is not None:
            keep = pc.and_(keep, pc.equal(b["level"], level))
        if ts_min is not None:
            keep = pc.and_(keep, pc.greater_equal(b["parsed_ts"],
                                                  pa.scalar(ts_min)))
        if ts_max is not None:
            keep = pc.and_(keep, pc.less(b["parsed_ts"],
                                         pa.scalar(ts_max)))
        return b.filter(keep).select(
            ["conv_id", "turn_idx", "parsed_ts", "token"])

    hits = ray.data.read_parquet(pfiles) \
        .map_batches(match, batch_format="pyarrow", batch_size=None)

    def intersect(g: "pd.DataFrame") -> pa.Table:
        # posting rows are (turn, token)-distinct by construction, so
        # the per-turn row count IS the distinct-term count.  Output
        # is an EXPLICITLY typed Arrow table: empty pandas frames with
        # object columns lose their schema in block conversion.
        cnt = g.groupby(["conv_id", "turn_idx"])["token"] \
            .transform("size")
        full = g.iloc[(cnt.to_numpy() == n_terms)
                      & (g["token"] == terms_l[0]).to_numpy()]
        return pa.table({
            "conv_id": pa.array(full["conv_id"].to_numpy(), pa.string()),
            "turn_idx": pa.array(
                full["turn_idx"].to_numpy().astype(np.int32)),
            "parsed_ts": pa.array(
                full["parsed_ts"].to_numpy().astype("datetime64[us]")),
        })

    import pyarrow.parquet as pq_

    approx = sum(pq_.read_metadata(f).num_rows for f in pfiles)
    inter = partition_by_key(hits, ["conv_id", "turn_idx"],
                             approx_rows=approx) \
        .groupby("part").map_groups(intersect, batch_format="pandas")
    topk = top_k(inter, ["parsed_ts", "conv_id", "turn_idx"], k,
                 descending=[True, False, False]).to_pandas()
    if not len(topk):
        return ray.data.from_arrow(empty)
    return _fetch_texts(d, text_col, topk, empty, stats_out)


def match_any_probe(index_dir: str | Path, terms: list[str], *,
                    level: str | None = None, ts_min=None, ts_max=None,
                    k: int = 20, stats_out: dict | None = None):
    """Multi-term OR probe (Sphinx ``MATCH('a | b')`` disjunction):
    rows whose tokenized text contains ANY of the terms.  Same pruned
    per-term bucket reads as :func:`match_all_probe`; instead of an
    intersection, one key-hash partition pass DEDUPLICATES turns that
    matched several terms (first row per (conv, turn) — posting rows
    per term are already turn-distinct), then top-k + docstore
    fetch."""
    import pandas as pd
    import ray.data

    from .order import top_k
    from .window import partition_by_key

    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    terms_l = sorted({t.lower() for t in terms})
    buckets = sorted({int(b) for b in _bucket_of(
        np.array(terms_l, dtype=object), meta["n_buckets"])})
    pfiles = sorted(str(p) for b in buckets
                    for p in (d / "postings" / f"bucket={b}")
                    .glob("*.parquet"))
    if stats_out is not None:
        stats_out["posting_files"] = pfiles
        stats_out["doc_files"] = []
    text_col = meta["text_col"]
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "parsed_ts": pa.array([], pa.timestamp("us")),
                      text_col: pa.array([], pa.string())})
    if not pfiles:
        return ray.data.from_arrow(empty)
    term_set = pa.array(terms_l, pa.string())

    def match(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["token"], value_set=term_set)
        if level is not None:
            keep = pc.and_(keep, pc.equal(b["level"], level))
        if ts_min is not None:
            keep = pc.and_(keep, pc.greater_equal(b["parsed_ts"],
                                                  pa.scalar(ts_min)))
        if ts_max is not None:
            keep = pc.and_(keep, pc.less(b["parsed_ts"],
                                         pa.scalar(ts_max)))
        return b.filter(keep).select(["conv_id", "turn_idx", "parsed_ts"])

    hits = ray.data.read_parquet(pfiles) \
        .map_batches(match, batch_format="pyarrow", batch_size=None)

    def dedupe(g: "pd.DataFrame") -> pa.Table:
        u = g.drop_duplicates(["conv_id", "turn_idx"])
        return pa.table({
            "conv_id": pa.array(u["conv_id"].to_numpy(), pa.string()),
            "turn_idx": pa.array(
                u["turn_idx"].to_numpy().astype(np.int32)),
            "parsed_ts": pa.array(
                u["parsed_ts"].to_numpy().astype("datetime64[us]")),
        })

    import pyarrow.parquet as pq_

    approx = sum(pq_.read_metadata(f).num_rows for f in pfiles)
    uniq = partition_by_key(hits, ["conv_id", "turn_idx"],
                            approx_rows=approx) \
        .groupby("part").map_groups(dedupe, batch_format="pandas")
    topk = top_k(uniq, ["parsed_ts", "conv_id", "turn_idx"], k,
                 descending=[True, False, False]).to_pandas()
    if not len(topk):
        return ray.data.from_arrow(empty)
    return _fetch_texts(d, text_col, topk, empty, stats_out)


def update_text_index(parsed_delta_ds, index_dir: str | Path, *,
                      extra_meta: dict | None = None) -> None:
    """INCREMENTAL index update (the Sphinx RT-segment analog): append
    a parsed DELTA corpus (new shards only) to a live index without
    rebuilding — the build-once index becomes build-once /
    append-per-wave, which is what a streaming collector needs.

    Protocol: delta postings and docstore rows are written INTO the
    live ``postings/bucket=*/`` and ``docs/date=*/`` directories with
    the sink writers' content-hashed filenames (a retried update
    overwrites its own files — idempotent, never duplicates), then
    ``meta.json`` is atomically replaced with the caller's new corpus
    signature.  The meta swap is the commit point: probes are gated on
    ``corpus_sig`` freshness by callers, so a crash between file
    writes and the meta swap leaves a stale-signed index that the next
    build/update makes consistent (same files rewritten, then
    committed).  The bucket count is pinned by the existing index —
    the token -> bucket mapping must stay stable across segments."""
    from ..sinks import _make_block_writer

    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    if meta.get("kind") != "text_inverted":
        raise ValueError(f"{d} is not a text index")
    n_buckets = meta["n_buckets"]
    text_col = meta["text_col"]

    parsed_delta_ds = parsed_delta_ds.materialize()
    post_writer = _make_block_writer(str(d / "postings"), ["bucket"])
    parsed_delta_ds.map_batches(
        lambda b: posting_explode(b, n_buckets, text_col),
        batch_format="pyarrow") \
        .map_batches(post_writer, batch_format="pyarrow").materialize()

    doc_writer = _make_block_writer(str(d / "docs"), ["date"])

    def docstore(b: pa.Table) -> pa.Table:
        return pa.table({
            "date": pc.strftime(b["parsed_ts"], "%Y-%m-%d"),
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"],
            text_col: b[text_col],
        })

    parsed_delta_ds.map_batches(docstore, batch_format="pyarrow") \
        .map_batches(doc_writer, batch_format="pyarrow").materialize()

    new_meta = {**meta, **(extra_meta or {})}
    if "total_tokens" in meta and \
            (extra_meta or {}).get("corpus_sig") != meta.get("corpus_sig"):
        # v3: keep the BM25 avgdl inputs exact.  Rides the existing
        # commit protocol: totals advance only when the corpus
        # signature does, so a crash before the meta swap re-adds
        # exactly once on retry, and a RE-APPLIED already-committed
        # delta (same sig — the content-hashed files just overwrite
        # themselves) adds nothing.
        d_rows, d_toks = _corpus_token_totals(parsed_delta_ds, text_col)
        new_meta["n_turns"] = meta["n_turns"] + d_rows
        new_meta["total_tokens"] = meta["total_tokens"] + d_toks
    tmp = d / "meta.json.tmp"
    tmp.write_text(json.dumps(new_meta))
    os.replace(tmp, d / "meta.json")


def compact_text_index(index_dir: str | Path,
                       target_bytes: int = 256 << 20) -> int:
    """Segment-merge for the incrementally-updated index (the Sphinx
    RT OPTIMIZE analog): after many :func:`update_text_index` waves a
    posting bucket holds one small file per wave; this rewrites each
    bucket / docstore-day directory into ~``target_bytes`` files via
    the sinks' convergent compactor (recorded-inputs recovery,
    content-hashed outputs, crash-safe re-runs).  Same operational
    contract as sink compaction: run when no probes race it.  Returns
    files removed."""
    from ..sinks import compact_partitions

    d = Path(index_dir)
    return (compact_partitions(d, target_bytes, pattern="postings/bucket=*")
            + compact_partitions(d, target_bytes, pattern="docs/date=*"))


def phrase_probe(index_dir: str | Path, phrase: list[str], *,
                 k: int = 20, stats_out: dict | None = None):
    """PHRASE search (Sphinx ``MATCH('"a b"')`` exact-adjacency
    semantics): turns where the terms appear CONSECUTIVELY in token
    order.  Same pruned per-term posting buckets as
    :func:`match_all_probe`; the intersection kernel rides the v2
    positional postings — each term's positions shift left by its
    phrase rank, and a turn matches iff some shifted position is
    shared by ALL ranks (per-(turn, position) distinct-rank count ==
    phrase length).  Repeated phrase terms are handled per rank."""
    import pandas as pd
    import ray.data

    from .order import top_k
    from .window import partition_by_key

    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    if meta.get("version", 1) < 2:
        raise ValueError("phrase_probe needs a v2 (positional) index — "
                         "rebuild with build_text_index")
    ranks = [t.lower() for t in phrase]
    n_ranks = len(ranks)
    buckets = sorted({int(b) for b in _bucket_of(
        np.array(sorted(set(ranks)), dtype=object), meta["n_buckets"])})
    pfiles = sorted(str(p) for b in buckets
                    for p in (d / "postings" / f"bucket={b}")
                    .glob("*.parquet"))
    if stats_out is not None:
        stats_out["posting_files"] = pfiles
        stats_out["doc_files"] = []
    text_col = meta["text_col"]
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "parsed_ts": pa.array([], pa.timestamp("us")),
                      text_col: pa.array([], pa.string())})
    if not pfiles:
        return ray.data.from_arrow(empty)
    term_set = pa.array(sorted(set(ranks)), pa.string())

    def match(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["token"], value_set=term_set)
        return b.filter(keep).select(
            ["conv_id", "turn_idx", "parsed_ts", "token", "positions"])

    hits = ray.data.read_parquet(pfiles) \
        .map_batches(match, batch_format="pyarrow", batch_size=None)

    def intersect(g: "pd.DataFrame") -> pa.Table:
        frames = []
        for r, term in enumerate(ranks):
            sel = g[g["token"] == term]
            if not len(sel):
                continue
            lens = sel["positions"].map(len).to_numpy()
            adj = np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in sel["positions"]]
            ) - r if lens.sum() else np.array([], np.int64)
            frames.append(pd.DataFrame({
                "conv_id": np.repeat(sel["conv_id"].to_numpy(), lens),
                "turn_idx": np.repeat(sel["turn_idx"].to_numpy(), lens),
                "parsed_ts": np.repeat(sel["parsed_ts"].to_numpy(), lens),
                "adj": adj, "rank": r}))
        if not frames:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "parsed_ts": pa.array([], pa.timestamp("us"))})
        df = pd.concat(frames, ignore_index=True)
        cnt = df.groupby(["conv_id", "turn_idx", "adj"])["rank"] \
            .transform("size")
        full = df.iloc[(cnt.to_numpy() == n_ranks)
                       & (df["rank"] == 0).to_numpy()] \
            .drop_duplicates(subset=["conv_id", "turn_idx"])
        return pa.table({
            "conv_id": pa.array(full["conv_id"].to_numpy(), pa.string()),
            "turn_idx": pa.array(
                full["turn_idx"].to_numpy().astype(np.int32)),
            "parsed_ts": pa.array(
                full["parsed_ts"].to_numpy().astype("datetime64[us]")),
        })

    import pyarrow.parquet as pq_

    approx = sum(pq_.read_metadata(f).num_rows for f in pfiles)
    inter = partition_by_key(hits, ["conv_id", "turn_idx"],
                             approx_rows=approx) \
        .groupby("part").map_groups(intersect, batch_format="pandas")
    topk = top_k(inter, ["parsed_ts", "conv_id", "turn_idx"], k,
                 descending=[True, False, False]).to_pandas()
    if not len(topk):
        return ray.data.from_arrow(empty)
    return _fetch_texts(d, text_col, topk, empty, stats_out)


def near_probe(index_dir: str | Path, term_a: str, term_b: str, *,
               max_dist: int = 2, k: int = 20,
               stats_out: dict | None = None):
    """PROXIMITY search (Sphinx ``MATCH('"a b"~N')`` NEAR semantics):
    turns where ``term_a`` and ``term_b`` occur within ``max_dist``
    token positions of each other (either order).  Same pruned
    per-term posting buckets as :func:`match_all_probe`; the kernel
    rides the v2 positional postings — per partition, every A-position
    checks only its two B-neighbors (one ``searchsorted`` into the
    gid-composite B-position array), which is exactly the min-distance
    test, fully vectorized.  Distances use in-turn token indices, so
    the 0- vs 1-based convention cancels against any SQL oracle."""
    import pandas as pd
    import ray.data

    from .order import top_k
    from .window import partition_by_key

    ta, tb = term_a.lower(), term_b.lower()
    if ta == tb:
        raise ValueError("near_probe: need two distinct terms")
    if max_dist < 1:
        raise ValueError("near_probe: max_dist must be >= 1")
    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    if meta.get("version", 1) < 2:
        raise ValueError("near_probe needs a v2 (positional) index — "
                         "rebuild with build_text_index")
    buckets = sorted({int(b) for b in _bucket_of(
        np.array(sorted({ta, tb}), dtype=object), meta["n_buckets"])})
    pfiles = sorted(str(p) for b in buckets
                    for p in (d / "postings" / f"bucket={b}")
                    .glob("*.parquet"))
    if stats_out is not None:
        stats_out["posting_files"] = pfiles
        stats_out["doc_files"] = []
    text_col = meta["text_col"]
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "parsed_ts": pa.array([], pa.timestamp("us")),
                      text_col: pa.array([], pa.string())})
    if not pfiles:
        return ray.data.from_arrow(empty)
    term_set = pa.array(sorted({ta, tb}), pa.string())

    def match(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["token"], value_set=term_set)
        return b.filter(keep).select(
            ["conv_id", "turn_idx", "parsed_ts", "token", "positions"])

    hits = ray.data.read_parquet(pfiles) \
        .map_batches(match, batch_format="pyarrow", batch_size=None)
    no_hit = pa.table({"conv_id": pa.array([], pa.string()),
                       "turn_idx": pa.array([], pa.int32()),
                       "parsed_ts": pa.array([], pa.timestamp("us"))})

    def nearest(g: "pd.DataFrame") -> pa.Table:
        both = g[g["token"].isin([ta, tb])].copy()
        if not len(both):
            return no_hit
        both["gid"] = both.groupby(["conv_id", "turn_idx"],
                                   sort=False).ngroup()
        lens = both["positions"].map(len).to_numpy()
        if not lens.sum():
            return no_hit
        flat = np.concatenate(
            [np.asarray(p, np.int64) for p in both["positions"]])
        gids = np.repeat(both["gid"].to_numpy(), lens)
        is_a = np.repeat((both["token"] == ta).to_numpy(), lens)
        big = np.int64(flat.max() + max_dist + 2)
        ag, ap = gids[is_a], flat[is_a]
        bg, bp = gids[~is_a], flat[~is_a]
        if not len(ag) or not len(bg):
            return no_hit
        order = np.argsort(bg * big + bp)
        bg, bp = bg[order], bp[order]
        kb = bg * big + bp
        idx = np.searchsorted(kb, ag * big + ap)
        ok = np.zeros(len(ag), bool)
        right = idx < len(kb)
        ok[right] = (bg[idx[right]] == ag[right]) \
            & (bp[idx[right]] - ap[right] <= max_dist)
        left = idx > 0
        li = idx - 1
        ok[left] |= (bg[li[left]] == ag[left]) \
            & (ap[left] - bp[li[left]] <= max_dist)
        hit_gids = np.unique(ag[ok])
        if not len(hit_gids):
            return no_hit
        rep = both.drop_duplicates("gid").set_index("gid").loc[hit_gids]
        return pa.table({
            "conv_id": pa.array(rep["conv_id"].to_numpy(), pa.string()),
            "turn_idx": pa.array(
                rep["turn_idx"].to_numpy().astype(np.int32)),
            "parsed_ts": pa.array(
                rep["parsed_ts"].to_numpy().astype("datetime64[us]")),
        })

    import pyarrow.parquet as pq_

    approx = sum(pq_.read_metadata(f).num_rows for f in pfiles)
    inter = partition_by_key(hits, ["conv_id", "turn_idx"],
                             approx_rows=approx) \
        .groupby("part").map_groups(nearest, batch_format="pandas")
    topk = top_k(inter, ["parsed_ts", "conv_id", "turn_idx"], k,
                 descending=[True, False, False]).to_pandas()
    if not len(topk):
        return ray.data.from_arrow(empty)
    return _fetch_texts(d, text_col, topk, empty, stats_out)


def ranked_probe(index_dir: str | Path, terms: list[str], n_docs: int,
                 *, k: int = 20, idf_scale: int = 1_000_000,
                 stats_out: dict | None = None):
    """RANKED retrieval (the Sphinx weighted-MATCH analog): top-``k``
    turns by a QUANTIZED-IDF weighted term frequency

        score(turn) = sum_t  tf_t(turn) * w_t
        w_t         = ((2*N - 2*df_t + 1) * idf_scale) // (2*df_t + 1)

    — the BM25 idf ((N - df + 0.5)/(df + 0.5)) as one exact integer
    ratio, so the ENTIRE score is integer arithmetic and an engine-
    independent oracle reproduces the ranking bit-for-bit (float
    ln-idf would differ in ulps).  tf and df come straight from the
    pruned posting buckets (tf = positions length, df = posting rows
    per term); ``n_docs`` is the corpus turn count (the docstore is
    date-partitioned, so the caller passes it — parquet-metadata
    cheap).  Ties break (conv_id, turn_idx) ascending."""
    import pandas as pd
    import ray.data

    from .order import top_k
    from .window import partition_by_key

    want = sorted({t.lower() for t in terms})
    if not want:
        raise ValueError("ranked_probe: need at least one term")
    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    if meta.get("version", 1) < 2:
        raise ValueError("ranked_probe needs a v2 (positional) index")
    buckets = sorted({int(b) for b in _bucket_of(
        np.array(want, dtype=object), meta["n_buckets"])})
    pfiles = sorted(str(p) for b in buckets
                    for p in (d / "postings" / f"bucket={b}")
                    .glob("*.parquet"))
    if stats_out is not None:
        stats_out["posting_files"] = pfiles
        stats_out["doc_files"] = []
    text_col = meta["text_col"]
    # column order matches the driver-side top-k frame (merge appends
    # the text column last) so _fetch_texts' schema cast lines up
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "score": pa.array([], pa.int64()),
                      "parsed_ts": pa.array([], pa.timestamp("us")),
                      text_col: pa.array([], pa.string())})
    if not pfiles:
        return ray.data.from_arrow(empty)
    term_set = pa.array(want, pa.string())

    def match(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["token"], value_set=term_set)
        f = b.filter(keep)
        tf = pc.list_value_length(f["positions"])
        return pa.table({"conv_id": f["conv_id"],
                         "turn_idx": f["turn_idx"],
                         "parsed_ts": f["parsed_ts"],
                         "token": f["token"],
                         "tf": pc.cast(tf, pa.int64())})

    hits = (ray.data.read_parquet(pfiles)
            .map_batches(match, batch_format="pyarrow",
                         batch_size=None).materialize())

    # df per term: bounded fold (|terms| keys)
    from .aggregate import fold_partials

    df_t = fold_partials(
        hits.map_batches(
            lambda b: (pa.table({"token": b["token"],
                                 "df": pa.array(
                                     np.ones(b.num_rows, np.int64))})
                       .group_by(["token"]).aggregate([("df", "sum")])
                       .rename_columns(["token", "df"])),
            batch_format="pyarrow"),
        ["token"], [("df", "sum")],
        empty_schema=pa.schema([("token", pa.string()),
                                ("df", pa.int64())]))
    weights = {r["token"]: ((2 * n_docs - 2 * int(r["df"]) + 1)
                            * idf_scale) // (2 * int(r["df"]) + 1)
               for r in df_t.to_pylist()}
    if not weights:
        return ray.data.from_arrow(empty)

    def score_partial(b: pa.Table) -> pa.Table:
        toks = b["token"].to_numpy(zero_copy_only=False)
        w = np.array([weights[t] for t in toks], np.int64) \
            if len(toks) else np.zeros(0, np.int64)
        s = b["tf"].to_numpy(zero_copy_only=False) * w
        t = pa.table({"conv_id": b["conv_id"],
                      "turn_idx": b["turn_idx"],
                      "parsed_ts": b["parsed_ts"],
                      "s": pa.array(s)})
        g = t.group_by(["conv_id", "turn_idx"]).aggregate(
            [("s", "sum"), ("parsed_ts", "min")])
        return g.rename_columns(["conv_id", "turn_idx", "score",
                                 "parsed_ts"])

    import pyarrow.parquet as pq_

    approx = sum(pq_.read_metadata(f).num_rows for f in pfiles)
    scored = partition_by_key(
        hits.map_batches(score_partial, batch_format="pyarrow"),
        ["conv_id", "turn_idx"], approx_rows=approx)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["conv_id", "turn_idx"], as_index=False)
               .agg(score=("score", "sum"), parsed_ts=("parsed_ts",
                                                       "min")))
        out["turn_idx"] = out["turn_idx"].astype(np.int32)
        out["score"] = out["score"].astype(np.int64)
        return out

    totals = scored.groupby("part").map_groups(fold,
                                               batch_format="pandas")
    topk = top_k(totals, ["score", "conv_id", "turn_idx"], k,
                 descending=[True, False, False]).to_pandas()
    if not len(topk):
        return ray.data.from_arrow(empty)
    return _fetch_texts(d, text_col, topk, empty, stats_out)


def ranked_bm25_probe(index_dir: str | Path, terms: list[str], *,
                      k: int = 20, idf_scale: int = 1_000_000,
                      tf_scale: int = 10_000,
                      stats_out: dict | None = None):
    """Full BM25 (k1 = 1.2, b = 0.75) top-``k`` retrieval, computed
    ENTIRELY in integer arithmetic so any engine reproduces the
    ranking bit-for-bit:

        score(turn) = sum_t  w_t * tfc_t(turn)
        w_t         = ((2*N - 2*df_t + 1) * idf_scale) // (2*df_t + 1)
        tfc_t       = (22 * tf * avgdl_q * tf_scale)
                      // (10*avgdl_q*tf + 3*avgdl_q + 9000*dl)
        avgdl_q     = (total_tokens * 1000) // N     (milli-tokens)

    — tfc is the BM25 term-frequency component tf*(k1+1) / (tf +
    k1*(1 - b + b*dl/avgdl)) with numerator and denominator both
    multiplied by ``10 * avgdl_q`` (k1 = 12/10, b = 3/4 exactly), then
    quantized at ``tf_scale``; w_t is the same exact-integer BM25 idf
    as :func:`ranked_probe`.  This is the length-normalized ranking
    :func:`ranked_probe` lacks (long turns stop winning on raw tf).

    Needs a v3 index: ``dl`` rides on every posting row (``doclen``)
    and N / total_tokens come from meta.json — both maintained by
    build AND incremental update, so no probe-time corpus pass.
    Overflow-safe in int64 for dl, avgdl <= ~10^5 tokens and
    N <= ~10^9 turns.  Ties break (conv_id, turn_idx) ascending."""
    import pandas as pd
    import ray.data

    from .order import top_k
    from .window import partition_by_key

    want = sorted({t.lower() for t in terms})
    if not want:
        raise ValueError("ranked_bm25_probe: need at least one term")
    d = Path(index_dir)
    meta = json.loads((d / "meta.json").read_text())
    if meta.get("version", 1) < 3:
        raise ValueError("ranked_bm25_probe needs a v3 index "
                         "(doclen postings + corpus token totals); "
                         "rebuild with build_text_index")
    n_docs = int(meta["n_turns"])
    avgdl_q = (int(meta["total_tokens"]) * 1000) // max(1, n_docs)
    buckets = sorted({int(b) for b in _bucket_of(
        np.array(want, dtype=object), meta["n_buckets"])})
    pfiles = sorted(str(p) for b in buckets
                    for p in (d / "postings" / f"bucket={b}")
                    .glob("*.parquet"))
    if stats_out is not None:
        stats_out["posting_files"] = pfiles
        stats_out["doc_files"] = []
    text_col = meta["text_col"]
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "score": pa.array([], pa.int64()),
                      "parsed_ts": pa.array([], pa.timestamp("us")),
                      text_col: pa.array([], pa.string())})
    if not pfiles:
        return ray.data.from_arrow(empty)
    term_set = pa.array(want, pa.string())

    def match(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b["token"], value_set=term_set))
        tf = pc.list_value_length(f["positions"])
        return pa.table({"conv_id": f["conv_id"],
                         "turn_idx": f["turn_idx"],
                         "parsed_ts": f["parsed_ts"],
                         "token": f["token"],
                         "tf": pc.cast(tf, pa.int64()),
                         "doclen": pc.cast(f["doclen"], pa.int64())})

    hits = (ray.data.read_parquet(pfiles)
            .map_batches(match, batch_format="pyarrow",
                         batch_size=None).materialize())

    from .aggregate import fold_partials

    df_t = fold_partials(
        hits.map_batches(
            lambda b: (pa.table({"token": b["token"],
                                 "df": pa.array(
                                     np.ones(b.num_rows, np.int64))})
                       .group_by(["token"]).aggregate([("df", "sum")])
                       .rename_columns(["token", "df"])),
            batch_format="pyarrow"),
        ["token"], [("df", "sum")],
        empty_schema=pa.schema([("token", pa.string()),
                                ("df", pa.int64())]))
    weights = {r["token"]: ((2 * n_docs - 2 * int(r["df"]) + 1)
                            * idf_scale) // (2 * int(r["df"]) + 1)
               for r in df_t.to_pylist()}
    if not weights:
        return ray.data.from_arrow(empty)

    def score_partial(b: pa.Table) -> pa.Table:
        toks = b["token"].to_numpy(zero_copy_only=False)
        w = np.array([weights[t] for t in toks], np.int64) \
            if len(toks) else np.zeros(0, np.int64)
        tf = b["tf"].to_numpy(zero_copy_only=False)
        dl = b["doclen"].to_numpy(zero_copy_only=False)
        den = 10 * avgdl_q * tf + 3 * avgdl_q + 9000 * dl
        tfc = (22 * tf * avgdl_q * tf_scale) // np.maximum(den, 1)
        t = pa.table({"conv_id": b["conv_id"],
                      "turn_idx": b["turn_idx"],
                      "parsed_ts": b["parsed_ts"],
                      "s": pa.array(w * tfc)})
        g = t.group_by(["conv_id", "turn_idx"]).aggregate(
            [("s", "sum"), ("parsed_ts", "min")])
        return g.rename_columns(["conv_id", "turn_idx", "score",
                                 "parsed_ts"])

    import pyarrow.parquet as pq_

    approx = sum(pq_.read_metadata(f).num_rows for f in pfiles)
    scored = partition_by_key(
        hits.map_batches(score_partial, batch_format="pyarrow"),
        ["conv_id", "turn_idx"], approx_rows=approx)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["conv_id", "turn_idx"], as_index=False)
               .agg(score=("score", "sum"), parsed_ts=("parsed_ts",
                                                       "min")))
        out["turn_idx"] = out["turn_idx"].astype(np.int32)
        out["score"] = out["score"].astype(np.int64)
        return out

    totals = scored.groupby("part").map_groups(fold,
                                               batch_format="pandas")
    topk = top_k(totals, ["score", "conv_id", "turn_idx"], k,
                 descending=[True, False, False]).to_pandas()
    if not len(topk):
        return ray.data.from_arrow(empty)
    return _fetch_texts(d, text_col, topk, empty, stats_out)


def bm25_docs_topk(ds, terms: list[str], *, k: int = 50,
                   id_col: str = "doc_id", text_col: str = "text",
                   idf_scale: int = 1_000_000, tf_scale: int = 10_000):
    """Index-free exact-integer BM25 top-``k`` over a document Dataset
    — the same integer law as :func:`ranked_bm25_probe` (k1 = 1.2,
    b = 0.75, identical w/tfc/avgdl quantization, ties (score desc,
    id asc)) computed directly from the corpus in TWO passes, for
    corpora that don't carry a persisted index:

    1. a stats pass whose per-block partial is ``2 + len(terms)``
       integers (doc count, token total, per-term df) folded on the
       driver — the combine-inside-map_batches shape, nothing
       data-sized moves;
    2. a pure scoring map: each document's tf/dl live entirely in its
       own row, so with (N, avgdl, w_t) broadcast the score needs NO
       shuffle at all — at 100 TB this leg is embarrassingly parallel
       and only ``blocks x k`` survivor rows reach the driver via
       :func:`order.top_k`.

    Returns an Arrow table ``(id_col, score, rank)`` with rank 1..k.
    Overflow bounds match ranked_bm25_probe (int64-safe to ~10^9 docs
    of ~10^5 tokens)."""
    import ray.data

    from .order import top_k

    want = sorted({t.lower() for t in terms})
    if not want:
        raise ValueError("bm25_docs_topk: need at least one term")

    def stats_partial(b: pa.Table) -> pa.Table:
        toks = tokenize(b[text_col], b.num_rows)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        row = {"n_docs": [b.num_rows],
               "total_tokens": [int(len(flat))]}
        for i, t in enumerate(want):
            row[f"df_{i}"] = [int(np.unique(parents[flat == t]).size)]
        return pa.table(row)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow",
                           batch_size=None).take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    total_tokens = sum(r["total_tokens"] for r in parts)
    dfs = [sum(r[f"df_{i}"] for r in parts) for i in range(len(want))]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    if n_docs == 0 or not any(dfs):
        return empty
    avgdl_q = (total_tokens * 1000) // n_docs
    ws = [((2 * n_docs - 2 * df + 1) * idf_scale) // (2 * df + 1)
          for df in dfs]

    def score_batch(b: pa.Table) -> pa.Table:
        toks = tokenize(b[text_col], b.num_rows)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        dl = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        score = np.zeros(b.num_rows, np.int64)
        for t, w in zip(want, ws):
            tf = np.bincount(parents[flat == t],
                             minlength=b.num_rows).astype(np.int64)
            den = 10 * avgdl_q * tf + 3 * avgdl_q + 9000 * dl
            score += w * ((22 * tf * avgdl_q * tf_scale)
                          // np.maximum(den, 1))
        keep = score > 0
        ids = b[id_col].combine_chunks() \
            if isinstance(b[id_col], pa.ChunkedArray) else b[id_col]
        return pa.table({id_col: ids.filter(pa.array(keep)),
                         "score": pa.array(score[keep])})

    scored = ds.map_batches(score_batch, batch_format="pyarrow",
                            batch_size=None)
    import ray

    from .aggregate import concat_nonempty

    topk = top_k(scored, ["score", id_col], k,
                 descending=[True, False])
    merged = concat_nonempty(ray.get(topk.to_arrow_refs()))
    if merged.num_columns == 0 or merged.num_rows == 0:
        return empty
    return merged.append_column(
        "rank", pa.array(np.arange(1, merged.num_rows + 1,
                                   dtype=np.int64)))
