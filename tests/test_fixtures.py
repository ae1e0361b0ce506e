"""Fixture generator invariants (FIXTURES.md §1)."""

import numpy as np
import pyarrow.compute as pc

from alco_ray import fixtures
from alco_ray.specs import TRANSCRIPT_SCHEMA


def test_schema_matches_input_hint(t_small_table):
    assert t_small_table.schema.equals(TRANSCRIPT_SCHEMA)


def test_deterministic():
    a = fixtures.generate_transcripts(50, 500, seed=42)
    b = fixtures.generate_transcripts(50, 500, seed=42)
    assert a.equals(b)
    c = fixtures.generate_transcripts(50, 500, seed=7)
    assert not a.equals(c)


def test_turn_idx_dense_and_ts_monotonic(t_small_table):
    df = t_small_table.to_pandas()
    for _, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert list(g["turn_idx"]) == list(range(len(g)))
        assert g["ts"].is_monotonic_increasing


def test_hot_conversations_exist(t_small_table):
    counts = t_small_table.to_pandas().groupby("conv_id").size()
    frac = counts.max() / counts.sum()
    assert frac > 0.03, "Zipf hot key missing — skew tests would be vacuous"


def test_parse_targets_embedded(t_small_table):
    text = t_small_table["text"]
    has_level = pc.sum(pc.cast(pc.match_substring(text, "level="), "int64")).as_py()
    no_level = t_small_table.num_rows - has_level
    malformed = pc.sum(pc.cast(
        pc.match_substring(text, "at=2024-13-99"), "int64")).as_py()
    assert has_level > 0 and no_level > 0 and malformed > 0


def test_multi_file_layout(t_small_dir):
    files = list(t_small_dir.glob("*.parquet"))
    assert len(files) >= 8


def test_tool_null_iff_not_tool_role(t_small_table):
    df = t_small_table.to_pandas()
    assert df.loc[df.role == "tool", "tool"].notna().all()
    assert df.loc[df.role != "tool", "tool"].isna().all()
