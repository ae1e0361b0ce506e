"""Stable ordering, salted per-conv stats, top-k, interval aggregates."""

import pandas as pd
import pyarrow as pa
import ray.data

from alco_ray.oracle import oracle_run_table
from alco_ray.specs import default_transcript_config
from alco_ray.stages.aggregate import distinct_values, interval_counts, minmax_ts, routed_counts
from alco_ray.stages.order import per_conv_turn_stats, stable_order, top_k
from alco_ray.stages.parse import make_parse_batch
from alco_ray.stages.route import make_route_batch


def _routed_ds(table):
    cfg = default_transcript_config()
    ds = ray.data.from_arrow(table).map_batches(
        make_parse_batch(cfg), batch_format="pyarrow").map_batches(
        make_route_batch(cfg), batch_format="pyarrow")
    return ds


def test_stable_order_per_turn_text_equality(t_small_table, t_small_oracle):
    """THE per-row invariant (BASELINE.json:15): per-turn text equality
    under stable (conv_id, turn_idx) order — bit-for-bit, incl. order."""
    shuffled = ray.data.from_arrow(t_small_table).random_shuffle(seed=7)
    got = stable_order(shuffled).to_pandas()
    want = t_small_oracle["ordered"]
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_per_conv_turn_stats_salted(t_small_table):
    got = per_conv_turn_stats(ray.data.from_arrow(t_small_table),
                              salt_buckets=8).to_pandas()
    got = got.sort_values("conv_id").reset_index(drop=True)
    df = t_small_table.to_pandas()
    want = df.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"), min_ts=("ts", "min"),
        max_ts=("ts", "max")).reset_index()
    pd.testing.assert_frame_equal(
        got[["conv_id", "n_turns", "min_ts", "max_ts"]].astype({"n_turns": "int64"}),
        want)


def test_top_k(t_small_table):
    ds = ray.data.from_arrow(t_small_table).repartition(6)
    got = top_k(ds, ["ts"], 10).to_pandas()
    want = (t_small_table.to_pandas().sort_values("ts", ascending=False)
            .head(10).reset_index(drop=True))
    assert got["ts"].tolist() == want["ts"].tolist()


def test_interval_counts_bit_for_bit(t_small_table, t_small_oracle):
    agg = interval_counts(_routed_ds(t_small_table)).to_pandas()
    got = agg.sort_values(["sink", "level", "bucket"]).reset_index(drop=True)
    want = (t_small_oracle["interval_counts"]
            .sort_values(["sink", "level", "bucket"]).reset_index(drop=True))
    assert got["sink"].tolist() == want["sink"].tolist()
    assert got["level"].tolist() == want["level"].tolist()
    assert got["bucket"].tolist() == want["bucket"].tolist()
    assert got["cnt"].astype("int64").tolist() == want["cnt"].astype("int64").tolist()


def test_routed_counts_match_oracle(t_small_table, t_small_oracle):
    got = routed_counts(_routed_ds(t_small_table)).to_pandas()
    got_map = dict(zip(got["sink"], got["cnt"].astype(int)))
    assert got_map == t_small_oracle["routed_counts"]


def test_minmax_ts(t_small_table):
    got = minmax_ts(_routed_ds(t_small_table)).to_pandas()
    odf = make_parse_batch(default_transcript_config())(t_small_table).to_pandas()
    cfg = default_transcript_config()
    odf["sink"] = odf["role"].map(cfg.route_table())
    want = odf.groupby("sink")["parsed_ts"].agg(["min", "max"])
    for _, row in got.iterrows():
        assert row["min_ts"] == want.loc[row["sink"], "min"]
        assert row["max_ts"] == want.loc[row["sink"], "max"]


def test_distinct_values(t_small_table):
    got = distinct_values(ray.data.from_arrow(t_small_table),
                          "role")["role"].to_pylist()
    assert got == ["assistant", "system", "tool", "user"]


def test_top_k_per_group(t_small_table):
    from alco_ray.stages.order import top_k_per_group

    got = top_k_per_group(
        ray.data.from_arrow(t_small_table).repartition(5),
        "conv_id", ["turn_idx"], 2, descending=True).to_pandas()
    df = t_small_table.to_pandas()
    want = (df.sort_values(["conv_id", "turn_idx"],
                           ascending=[True, False])
              .groupby("conv_id").head(2))
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    w = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert g[["conv_id", "turn_idx", "text"]].equals(
        w[["conv_id", "turn_idx", "text"]])
