"""End-to-end flagship: oracle equality, resume idempotence, grok."""

import glob
import json
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from alco_ray.functions.grok import compile_grok
from alco_ray.pipelines.flagship import run_flagship
from alco_ray.state.checkpoint import CheckpointManifest, make_waves


def _read_out(out_root):
    files = sorted(glob.glob(f"{out_root}/sink=*/date=*/*.parquet"))
    return pq.read_table(files)


@pytest.fixture(scope="module")
def flagship_out(t_small_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("flagship")
    summary = run_flagship(t_small_dir, out, wave_size=4)
    return out, summary


def test_summary_matches_oracle(flagship_out, t_small_oracle):
    _, summary = flagship_out
    assert summary["rows"] == len(t_small_oracle["parsed"])
    assert summary["parse_failures"] == t_small_oracle["parse_failures"]
    assert summary["routed_counts"] == t_small_oracle["routed_counts"]


def test_routed_row_sets_bit_for_bit(flagship_out, t_small_oracle):
    """Per-turn text equality under stable order (BASELINE.json:14,15)."""
    out, _ = flagship_out
    got = (_read_out(out).select(["conv_id", "turn_idx", "text", "level"])
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    want = (t_small_oracle["ordered"][["conv_id", "turn_idx", "text", "level"]]
            .reset_index(drop=True))
    assert got.equals(want)


def test_aggregate_artifact_matches_oracle(flagship_out, t_small_oracle):
    out, _ = flagship_out
    agg = pq.read_table(
        glob.glob(f"{out}/aggregates/interval_counts/*.parquet")).to_pandas()
    got = agg.sort_values(["sink", "level", "bucket"]).reset_index(drop=True)
    want = (t_small_oracle["interval_counts"]
            .sort_values(["sink", "level", "bucket"]).reset_index(drop=True))
    assert got["cnt"].astype(int).tolist() == want["cnt"].astype(int).tolist()
    assert got["bucket"].tolist() == want["bucket"].tolist()


def test_manifest_lineage(flagship_out, t_small_dir):
    out, _ = flagship_out
    manifest = json.loads((Path(out) / "_checkpoint" / "manifest.json").read_text())
    n_files = len(list(Path(t_small_dir).glob("*.parquet")))
    assert len(manifest) == -(-n_files // 4)
    for wave in manifest.values():
        assert wave["status"] == "done"
        assert wave["input_files"]
        assert set(wave["metrics"]) >= {"rows", "parse_failures", "routed_counts"}


def test_resume_idempotent(t_small_dir, flagship_out, tmp_path):
    """Kill after k waves -> resume -> identical output (SURVEY.md §5.3)."""
    ref_out, ref_summary = flagship_out
    out = tmp_path / "resume"

    calls = {"n": 0}
    import alco_ray.pipelines.flagship as fl
    orig = fl.promote_staging

    def exploding(*a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("simulated kill")
        calls["n"] += 1
        return orig(*a, **kw)

    fl.promote_staging = exploding
    try:
        with pytest.raises(RuntimeError):
            run_flagship(t_small_dir, out, wave_size=4)
    finally:
        fl.promote_staging = orig

    m = CheckpointManifest(out)
    assert 0 < len(m.waves) < len(make_waves([str(p) for p in Path(t_small_dir).glob('*.parquet')], 4))

    summary = run_flagship(t_small_dir, out, wave_size=4)  # resume
    assert summary["rows"] == ref_summary["rows"]
    assert summary["routed_counts"] == ref_summary["routed_counts"]
    got = _read_out(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _read_out(ref_out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["text"].equals(want["text"])
    assert len(got) == len(want)


def test_grok_compiler():
    pat = compile_grok(r"status=%{INT:status} ip=%{IP:ip}")
    import re

    m = re.search(pat, "x status=42 ip=10.0.0.1 y")
    assert m.group("status") == "42" and m.group("ip") == "10.0.0.1"
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")


def test_grok_in_pipeline_config(t_small_table):
    from alco_ray.specs import ColumnSpec, PipelineConfig, LoggerSpec
    from alco_ray.stages.parse import make_parse_batch

    cfg = PipelineConfig(
        columns=[ColumnSpec("req_id", source="regex",
                            pattern=r"req_id=%{INT:req_id}")],
        loggers=[LoggerSpec("all", ("system", "user", "assistant", "tool"))],
    )
    out = make_parse_batch(cfg)(t_small_table)
    vals = out["req_id"].to_pylist()
    import re
    for text, got in zip(t_small_table["text"].to_pylist()[:200], vals[:200]):
        m = re.search(r"req_id=(\d+)", text)
        assert got == (m.group(1) if m else None)


def test_partition_layout_invariance(t_small_table, flagship_out, tmp_path):
    """SURVEY §5.3 order-invariance: re-sharding the same rows into a
    different file layout (different count, interleaved assignment)
    must produce identical summary metrics and aggregates."""
    import json

    import pyarrow.parquet as pq

    from alco_ray.pipelines.flagship import run_flagship

    alt = tmp_path / "alt_corpus"
    alt.mkdir()
    n = t_small_table.num_rows
    for i in range(3):  # round-robin rows into 3 files (vs 8 contiguous)
        idx = list(range(i, n, 3))
        pq.write_table(t_small_table.take(idx), alt / f"p-{i}.parquet")

    out = tmp_path / "alt_out"
    summary = run_flagship(alt, out, wave_size=2)
    _, base_summary = flagship_out
    assert {k: summary[k] for k in ("rows", "parse_failures",
                                    "routed_counts")} == \
           {k: base_summary[k] for k in ("rows", "parse_failures",
                                         "routed_counts")}

    base_out, _ = flagship_out
    a = pq.read_table(out / "aggregates" / "interval_counts")
    b = pq.read_table(base_out / "aggregates" / "interval_counts")
    assert a.equals(b)


def test_resume_after_partial_promote(t_small_dir, flagship_out, tmp_path):
    """Crash mid-promote (some files moved into the final tree, no
    manifest commit) -> resume cleans the orphans and converges to the
    reference output."""
    import alco_ray.pipelines.flagship as fl

    ref_out, ref_summary = flagship_out
    out = tmp_path / "partial"

    orig = fl.promote_staging

    def half_promote(staging_dir, out_root, wave_id):
        # Move only half the staged files, then die: worst-case torn
        # promote.
        files = sorted(Path(staging_dir).glob("sink=*/date=*/*.parquet"))
        for i, f in enumerate(files[: max(1, len(files) // 2)]):
            rel = f.relative_to(staging_dir)
            dest = Path(out_root) / rel.parent / f"{wave_id}-{i:05d}-{rel.name}"
            dest.parent.mkdir(parents=True, exist_ok=True)
            f.rename(dest)
        raise RuntimeError("simulated crash mid-promote")

    fl.promote_staging = half_promote
    try:
        with pytest.raises(RuntimeError):
            run_flagship(t_small_dir, out, wave_size=4)
    finally:
        fl.promote_staging = orig

    # Orphan files with the wave prefix exist but nothing is committed.
    assert list(Path(out).glob("sink=*/date=*/w*.parquet"))
    assert len(CheckpointManifest(out).waves) == 0

    summary = run_flagship(t_small_dir, out, wave_size=4)  # resume
    assert summary["rows"] == ref_summary["rows"]
    assert summary["routed_counts"] == ref_summary["routed_counts"]
    got = _read_out(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _read_out(ref_out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["text"].equals(want["text"]) and len(got) == len(want)


def test_resume_tolerates_changed_wave_size(t_small_dir, tmp_path):
    """Waves are keyed by the files they processed, not by position:
    resuming with a different wave_size is a clean no-op."""
    out = tmp_path / "guard"
    run_flagship(t_small_dir, out, wave_size=4)
    s = run_flagship(t_small_dir, out, wave_size=2)
    assert s["rows"] == 1173


def test_resume_rejects_shrunk_corpus(t_small_dir, tmp_path):
    """A corpus missing files the manifest already committed is
    ambiguous (totals would include vanished data) -> hard error."""
    import shutil as sh

    corpus = tmp_path / "shrink_corpus"
    sh.copytree(t_small_dir, corpus)
    out = tmp_path / "shrink_out"
    run_flagship(corpus, out, wave_size=4)
    victim = sorted(corpus.glob("*.parquet"))[0]
    victim.unlink()
    with pytest.raises(ValueError, match="missing from the corpus"):
        run_flagship(corpus, out, wave_size=4)


def test_incremental_append_processes_only_new_files(t_small_dir, tmp_path):
    """The streaming-collector contract (SURVEY §2.9): append shards,
    re-run the same out_root -> only the new files are processed, and
    totals + aggregate artifact equal a fresh full run bit-for-bit."""
    import shutil as sh

    import alco_ray.pipelines.flagship as fl

    all_files = sorted(Path(t_small_dir).glob("*.parquet"))
    assert len(all_files) >= 4
    grow = tmp_path / "grow_corpus"
    grow.mkdir()
    for f in all_files[:-2]:
        sh.copy(f, grow / f.name)

    out = tmp_path / "grow_out"
    run_flagship(grow, out, wave_size=4)
    n_waves_before = len(CheckpointManifest(out).waves)

    # Append the last two shards; count how many waves actually run by
    # spying on promote_staging (one promote per executed wave).
    for f in all_files[-2:]:
        sh.copy(f, grow / f.name)
    executed = []
    orig = fl.promote_staging

    def spy(staging_dir, out_root, wave_id):
        executed.append(wave_id)
        return orig(staging_dir, out_root, wave_id)

    fl.promote_staging = spy
    try:
        summary = run_flagship(grow, out, wave_size=4)
    finally:
        fl.promote_staging = orig

    assert len(executed) == 1  # 2 new files, wave_size 4 -> one wave
    m = CheckpointManifest(out)
    assert len(m.waves) == n_waves_before + 1
    appended_names = {f.name for f in all_files[-2:]}
    new_wave = m.waves[executed[0]]
    assert {Path(p).name for p in new_wave["input_files"]} == appended_names

    # Bit-for-bit vs a fresh full run over the same (grown) corpus.
    fresh_out = tmp_path / "fresh_out"
    fresh = run_flagship(grow, fresh_out, wave_size=4)
    assert summary["rows"] == fresh["rows"]
    assert summary["parse_failures"] == fresh["parse_failures"]
    assert summary["routed_counts"] == fresh["routed_counts"]
    a = pq.read_table(out / "aggregates" / "interval_counts")
    b = pq.read_table(fresh_out / "aggregates" / "interval_counts")
    assert a.equals(b)
    got = _read_out(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _read_out(fresh_out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got.equals(want)


def test_resume_rejects_shard_rewritten_in_place(t_small_dir, tmp_path):
    """A committed shard rewritten in place (same name, new
    size/mtime) must raise at resume, not be silently treated as
    already-processed (stale output/aggregates)."""
    import shutil as sh

    import pyarrow.parquet as pq

    corpus = tmp_path / "rewrite_corpus"
    sh.copytree(t_small_dir, corpus)
    out = tmp_path / "rewrite_out"
    run_flagship(corpus, out, wave_size=4)
    victim = sorted(corpus.glob("*.parquet"))[0]
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), victim)
    with pytest.raises(ValueError, match="rewritten in place"):
        run_flagship(corpus, out, wave_size=4)


def test_watch_mode_appends_equal_fresh_run(t_small_dir, tmp_path):
    """watch_flagship: shards appended mid-'stream' are picked up by
    the poll loop, and the final totals + aggregate artifact equal a
    fresh full run over the complete corpus bit-for-bit."""
    import shutil as sh

    import pyarrow.parquet as pq

    from alco_ray.pipelines.flagship import watch_flagship

    shards = sorted(Path(t_small_dir).glob("*.parquet"))
    assert len(shards) >= 4
    live = tmp_path / "live_corpus"
    live.mkdir()
    for p in shards[: len(shards) // 2]:
        sh.copy(p, live / p.name)

    out = tmp_path / "watch_out"
    calls = {"n": 0}

    def stop() -> bool:
        calls["n"] += 1
        if calls["n"] == 2:  # first frontier ingested -> appends arrive
            for p in shards[len(shards) // 2:]:
                sh.copy(p, live / p.name)
            return False
        return calls["n"] > 2

    got = watch_flagship(live, out, wave_size=2, poll_interval_s=0,
                         stop=stop)

    out_fresh = tmp_path / "fresh_out"
    want = run_flagship(t_small_dir, out_fresh, wave_size=2)
    want.pop("aggregate_files", None)
    assert got == want
    a = pq.read_table(out / "aggregates" / "interval_counts")
    b = pq.read_table(out_fresh / "aggregates" / "interval_counts")
    assert a.equals(b)


def test_dict_build_rejects_high_cardinality_column(tmp_path):
    """The dictionary path is for enum-ish columns (dicts broadcast
    whole, grown driver-side): a high-cardinality column must fail
    loudly, naming the column, before anything is cached."""
    import pyarrow as pa

    from alco_ray.pipelines.flagship import build_or_load_dicts
    from alco_ray.specs import ColumnSpec, LoggerSpec, PipelineConfig

    n = 500
    t = pa.table({
        "conv_id": pa.array([f"c{i // 4}" for i in range(n)]),
        "turn_idx": pa.array([i % 4 for i in range(n)], pa.int32()),
        "role": pa.array(["user", "assistant"][i % 2] for i in range(n)),
        "text": pa.array([f"msg {i}" for i in range(n)]),
        "tool": pa.array([f"tool-{i}" for i in range(n)]),  # all distinct
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
    })
    shard = tmp_path / "corpus.parquet"
    pq.write_table(t, shard)
    cfg = PipelineConfig(
        columns=[ColumnSpec("role", filtered=True),
                 ColumnSpec("tool", filtered=True)],
        loggers=[LoggerSpec("all", ("user", "assistant"))],
    )
    cache = tmp_path / "dict_cache"
    with pytest.raises(ValueError, match="'tool'.*cardinality"):
        build_or_load_dicts([str(shard)], cfg, cache, max_cardinality=100)
    assert not (cache / "tool.parquet").exists()  # nothing poisoned
    # Under the cap the same corpus builds fine; role stays tiny.
    dicts = build_or_load_dicts([str(shard)], cfg, tmp_path / "cache2",
                                max_cardinality=1_000)
    assert dicts["role"].num_rows == 2
    assert dicts["tool"].num_rows == n
