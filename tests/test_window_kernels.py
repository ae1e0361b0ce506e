"""Property tests (hypothesis) for the segmented window kernels.

The Ray plumbing around these kernels is pinned by the DuckDB oracle
queries; these tests hammer the pure numpy kernels themselves with
randomized segment layouts, which is where off-by-one window clamping
and segment-reset bugs live.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from alco_ray.stages.window import _segment_bounds, _windowed_flag_sum

segments = st.lists(st.integers(min_value=1, max_value=15),
                    min_size=1, max_size=8)


def _layout(seg_lens, rng_seed):
    rng = np.random.RandomState(rng_seed)
    keys = np.repeat(np.arange(len(seg_lens)), seg_lens)
    flags = rng.randint(0, 2, size=len(keys)).astype(np.int64)
    return keys, flags


@given(seg_lens=segments, radius=st.integers(0, 4), seed=st.integers(0, 999))
@settings(max_examples=150, deadline=None)
def test_windowed_flag_sum_matches_bruteforce(seg_lens, radius, seed):
    keys, flags = _layout(seg_lens, seed)
    seg_start, seg_end, _ = _segment_bounds(keys)
    got = _windowed_flag_sum(flags, seg_start, seg_end, radius)
    for i in range(len(keys)):
        lo = max(i - radius, seg_start[i])
        hi = min(i + radius, seg_end[i] - 1)
        assert got[i] == flags[lo:hi + 1].sum()


@given(seg_lens=segments, seed=st.integers(0, 999))
@settings(max_examples=150, deadline=None)
def test_asof_offset_trick_matches_bruteforce(seg_lens, seed):
    keys, flags = _layout(seg_lens, seed)
    # idx values: arbitrary increasing-within-segment ints
    rng = np.random.RandomState(seed + 1)
    idx = np.concatenate([np.cumsum(rng.randint(1, 5, size=n))
                          for n in seg_lens]).astype(np.int64)
    _, _, seg_id = _segment_bounds(keys)
    OFF = np.int64(1) << 32
    val = np.where(flags.astype(bool), idx, np.int64(-1)) + seg_id * OFF
    got = np.maximum.accumulate(val) - seg_id * OFF
    # brute force: last flagged idx at-or-before, per segment
    last = {}
    for i in range(len(keys)):
        k = keys[i]
        if flags[i]:
            last[k] = idx[i]
        assert got[i] == last.get(k, -1)


@given(seg_lens=segments, gap=st.integers(1, 10), seed=st.integers(0, 999))
@settings(max_examples=150, deadline=None)
def test_session_cumsum_rebase_matches_bruteforce(seg_lens, gap, seed):
    keys, _ = _layout(seg_lens, seed)
    rng = np.random.RandomState(seed + 2)
    deltas = rng.randint(0, 15, size=len(keys)).astype(np.int64)
    ts = np.concatenate([np.cumsum(deltas[keys == k])
                         for k in range(len(seg_lens))])
    seg_start, _, _ = _segment_bounds(keys)
    n = len(keys)
    g = np.zeros(n, dtype=np.int64)
    if n > 1:
        d = ts[1:] - ts[:-1]
        pos = np.arange(1, n, dtype=np.int64)
        g[1:] = ((d > gap) & (pos != seg_start[1:])).astype(np.int64)
    c = np.cumsum(g)
    got = c - c[seg_start]
    # brute force per segment
    expect = np.zeros(n, dtype=np.int64)
    for k in range(len(seg_lens)):
        rows = np.flatnonzero(keys == k)
        sid = 0
        for j, r in enumerate(rows):
            if j > 0 and ts[r] - ts[rows[j - 1]] > gap:
                sid += 1
            expect[r] = sid
    assert np.array_equal(got, expect)


def test_adjacent_pairs_brute_force():
    """adjacent_pairs == Python brute force, at block layouts that
    split a conversation mid-stream (the boundary-stitch path) and
    with every non-pair shape present: user at conv end, user->tool,
    turn_idx gap, assistant->user reversed."""
    import pyarrow as pa
    import ray.data

    from alco_ray.stages import window

    rows = []
    # conv a: u->a pair, then a->u (no), then u at end (no)
    rows += [("a", 0, "user", "q1"), ("a", 1, "assistant", "r1"),
             ("a", 2, "user", "q2")]
    # conv b: u->tool (no), tool->a (no), u->a pair
    rows += [("b", 0, "user", "q3"), ("b", 1, "tool", "t1"),
             ("b", 2, "user", "q4"), ("b", 3, "assistant", "r4")]
    # conv c: turn_idx GAP between user and assistant -> no pair
    rows += [("c", 0, "user", "q5"), ("c", 2, "assistant", "r5")]
    # conv d: two pairs back to back
    rows += [("d", 0, "user", "q6"), ("d", 1, "assistant", "r6"),
             ("d", 2, "user", "q7"), ("d", 3, "assistant", "r7")]
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows])})

    want = set()
    by_conv = {}
    for cid, tidx, role, txt in rows:
        by_conv.setdefault(cid, []).append((tidx, role, txt))
    for cid, ts in by_conv.items():
        ts.sort()
        for (t0, r0, x0), (t1, r1, x1) in zip(ts, ts[1:]):
            if r0 == "user" and r1 == "assistant" and t1 == t0 + 1:
                want.add((cid, t0, x0, x1))

    for nblocks in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        got = {(r["conv_id"], r["turn_idx"], r["prompt"], r["response"])
               for r in window.adjacent_pairs(
                   ds, key_col="conv_id", order_col="turn_idx",
                   role_col="role", text_col="text",
                   from_role="user", to_role="assistant",
                   approx_rows=len(rows)).take_all()}
        assert got == want, nblocks


def test_debounce_matches_sequential_brute_force():
    """The vectorized-rounds debounce == the sequential greedy state
    machine, at several partitionings, with ties, long storms, and a
    key whose every event is kept."""
    import pyarrow as pa
    import ray.data

    from alco_ray.stages import window

    rows = []
    # key 1: storm — 10 events 1s apart, cooldown 5s
    rows += [(1, 1_000_000 * i, 100 + i) for i in range(10)]
    # key 2: all spaced >= cooldown -> all kept
    rows += [(2, 10_000_000 * i, 200 + i) for i in range(4)]
    # key 3: exact-boundary ties (two events same ts, then +cooldown)
    rows += [(3, 0, 300), (3, 0, 301), (3, 5_000_000, 302),
             (3, 9_999_999, 303), (3, 15_000_000, 304)]
    cool = 5_000_000

    want = set()
    by_k = {}
    for k, t, i in rows:
        by_k.setdefault(k, []).append((t, i))
    for k, evs in by_k.items():
        evs.sort()
        last = None
        for t, i in evs:
            if last is None or t >= last + cool:
                want.add(i)
                last = t

    tbl = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                    "t": pa.array([r[1] for r in rows], pa.int64()),
                    "i": pa.array([r[2] for r in rows], pa.int64())})
    for nblocks in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        got = {r["i"] for r in window.debounce(
            ds, key_cols="k", ts_col="t", id_col="i",
            cooldown=cool, n_parts=2,
            approx_rows=len(rows)).take_all()}
        assert got == want, nblocks
