"""Round-3d operators: correlation moments, mode, ntile, exact
distinct-count.

Each operator is compared against an independent brute force (numpy /
pandas) on a small randomized multi-block input — the driver's DuckDB
oracle pins the same semantics at sf0.01; these tests pin them at
commit time with adversarial layouts (tied mode counts, n % k != 0
tiles, zero-variance groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _table(seed: int = 11, n: int = 500):
    rng = np.random.RandomState(seed)
    return pa.table({
        "grp": pa.array(rng.choice(["a", "b", "c"], n)),
        "x": pa.array(rng.randint(0, 1000, n).astype(np.int64)),
        "y": pa.array(rng.randint(-200, 200, n).astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })


@pytest.fixture(scope="module")
def tbl():
    return _table()


def _ds(table, n_blocks: int = 6):
    import ray.data

    return ray.data.from_arrow(table).repartition(n_blocks)


def test_corr_moments_match_numpy(tbl):
    from alco_ray.stages.aggregate import corr_from_moments, corr_moments

    m = corr_moments(_ds(tbl), "x", "y", "grp")
    assert m.column_names == ["grp", "n", "sx", "sy", "sxy", "sxx", "syy"]
    rs = corr_from_moments(m)
    df = tbl.to_pandas()
    for row, r in zip(m.to_pylist(), rs):
        g = df[df["grp"] == row["grp"]]
        assert row["n"] == len(g)
        assert row["sx"] == g["x"].sum()
        assert row["sxy"] == (g["x"] * g["y"]).sum()
        want = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(r - want) < 1e-9


def test_corr_zero_variance_group():
    from alco_ray.stages.aggregate import corr_from_moments, corr_moments

    t = pa.table({"grp": ["z"] * 4,
                  "x": pa.array([5, 5, 5, 5], pa.int64()),
                  "y": pa.array([1, 2, 3, 4], pa.int64())})
    m = corr_moments(_ds(t, 2), "x", "y", "grp")
    assert corr_from_moments(m) == [None]


def test_mode_by_tiebreak_smallest():
    from alco_ray.stages.aggregate import mode_by

    # a: 7 twice, 3 twice (tie -> 3); b: unique mode 9
    t = pa.table({"grp": ["a", "a", "a", "a", "a", "b", "b", "b"],
                  "v": pa.array([7, 3, 7, 3, 1, 9, 9, 2], pa.int64())})
    out = mode_by(_ds(t, 3), "v", "grp").to_pydict()
    assert out["grp"] == ["a", "b"]
    assert out["mode_value"] == [3, 9]
    assert out["mode_n"] == [2, 2]


def test_mode_by_matches_pandas(tbl):
    from alco_ray.stages.aggregate import mode_by

    out = mode_by(_ds(tbl), "y", "grp").to_pandas()
    df = tbl.to_pandas()
    for _, r in out.iterrows():
        vc = df[df["grp"] == r["grp"]]["y"].value_counts()
        top = vc[vc == vc.max()]
        assert r["mode_n"] == vc.max()
        assert r["mode_value"] == min(top.index)


@pytest.mark.parametrize("n,k", [(10, 4), (12, 4), (3, 5), (100, 7)])
def test_ntile_sql_semantics(n, k):
    from alco_ray.stages.scan import ntile

    t = pa.table({"key": pa.array(np.random.RandomState(n).permutation(n)
                                  .astype(np.int64))})
    out = (ntile(_ds(t, min(4, n)), "key", k)
           .to_pandas().sort_values("key").reset_index(drop=True))
    # SQL NTILE: first n%k tiles have n//k+1 rows, rest n//k
    sizes = [n // k + 1] * (n % k) + [n // k] * (k - n % k)
    want = np.concatenate([[i + 1] * s for i, s in enumerate(sizes)])
    assert (out["tile"].to_numpy() == want[: n]).all()


def test_cube_sums_matches_duckdb(tbl):
    import duckdb

    from alco_ray.stages.aggregate import cube_sums

    got = (cube_sums(_ds(tbl), ["grp", "x"], ["y"])
           .to_pandas())
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    want = con.execute(
        "SELECT grp, x, CAST(sum(y) AS BIGINT) AS y, "
        "CAST(count(*) AS BIGINT) AS n_rows "
        "FROM t GROUP BY CUBE (grp, x)").df()
    key = ["grp", "x", "y", "n_rows"]
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_quantiles_disc_matches_single_q(tbl):
    from alco_ray.stages.aggregate import quantile_disc, quantiles_disc

    t = tbl.append_column(
        "fv", pa.array(tbl["y"].to_numpy(zero_copy_only=False) / 100.0))
    multi = quantiles_disc(_ds(t), "fv", [0.25, 0.5, 0.75], "grp",
                           out_prefix="p")
    for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
        single = quantile_disc(_ds(t), "fv", q, "grp")
        assert multi[col].to_pylist() == single["q_value"].to_pylist()


def test_grouped_dense_rank_matches_pandas(tbl):
    from alco_ray.stages.window import grouped_dense_rank

    got = (grouped_dense_rank(_ds(tbl), key_col="grp", val_col="y",
                              id_col="id", n_parts=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = tbl.to_pandas()
    want = (df.groupby("grp")["y"].rank(method="dense", ascending=False)
            .astype(np.int64))
    df = df.assign(drank=want).sort_values("id").reset_index(drop=True)
    assert len(got) == len(df)
    assert (got["drank"].to_numpy() == df["drank"].to_numpy()).all()


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_runtime_filter_semi_join_both_paths(tbl, limit):
    # limit=0 forces the hash-shuffle fallback; both paths must agree
    from alco_ray.stages.join import runtime_filter_semi_join

    left = tbl
    keys = pa.table({"k": pa.array([1, 3, 5, 7, 9] * 3, pa.int64())})
    got = (runtime_filter_semi_join(_ds(left), _ds(keys, 2), "x",
                                    right_on="k", broadcast_limit=limit)
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = left.to_pandas()
    want = (df[df["x"].isin([1, 3, 5, 7, 9])]
            .sort_values("id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()


def test_runtime_filter_semi_join_empty_keys(tbl):
    from alco_ray.stages.join import runtime_filter_semi_join

    keys = pa.table({"k": pa.array([], pa.int64())})
    got = runtime_filter_semi_join(_ds(tbl), _ds(keys, 1), "x",
                                   right_on="k")
    assert got.count() == 0


def test_contested_intervals_sweep():
    from alco_ray.stages.window import _contested_intervals

    # disjoint -> none
    assert _contested_intervals(["a", "m"], ["f", "z"]) == ([], [])
    # shared edge -> single-point interval
    assert _contested_intervals(["a", "f"], ["f", "z"]) == (["f"], ["f"])
    # nested + chained overlaps merge
    lo, hi = _contested_intervals([1, 2, 4, 10], [5, 6, 7, 12])
    assert (lo, hi) == ([2], [6])


def test_grouped_kernel_stitches_spanning_groups():
    # groups deliberately split across blocks: block boundaries land
    # mid-group, so the contested driver pass must reassemble them
    import ray.data

    from alco_ray.stages.window import rolling_count

    n = 300
    conv = np.repeat([f"c{i:03d}" for i in range(30)], 10)
    t = pa.table({
        "conv_id": pa.array(conv),
        "turn_idx": pa.array(np.tile(np.arange(10, dtype=np.int64), 30)),
        "level": pa.array(np.where(np.arange(n) % 7 == 0, "ERROR", "INFO")),
    })
    # 7 blocks of 43ish rows -> every block boundary splits a conv
    ds = ray.data.from_arrow(t).repartition(7)
    got = (rolling_count(ds, flag_col="level", flag_value="ERROR",
                         radius=2)
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    df = t.to_pandas()
    flag = (df["level"] == "ERROR").astype(int)
    want = (flag.groupby(df["conv_id"]).transform(
        lambda s: s.rolling(5, center=True, min_periods=1).sum())
        .astype(np.int64))
    assert len(got) == n
    assert (got["w_count"].to_numpy() ==
            want.to_numpy()).all()


def test_distinct_count_by_matches_pandas(tbl):
    from alco_ray.stages.aggregate import distinct_count_by

    out = distinct_count_by(_ds(tbl), "y", "grp").to_pandas()
    df = tbl.to_pandas()
    want = df.groupby("grp")["y"].nunique()
    assert dict(zip(out["grp"], out["n_distinct"])) == want.to_dict()
