"""Mergeable sketches — approximate distinct counting (HyperLogLog).

Exact per-group COUNT DISTINCT (the A3b shape) ships every distinct
(group, value) pair through a shuffle once; at 100 TB the pair stream
IS the cost.  A HyperLogLog register set is a fixed ``2^p`` bytes per
group regardless of input size, merges with an elementwise ``max``
(commutative, associative, idempotent — so the estimate is independent
of partitioning, batch order and task retries), and answers within
~``1.04 / sqrt(2^p)`` relative error.  The registers are the shuffle
payload; the values never leave their batch.

Shape here: per-batch register partials (one row per group seen in the
batch, registers as a fixed-size binary blob) -> driver-side
elementwise-max fold, which is exact for bounded group domains (the
routed-sink / event-type shape this package folds everywhere else).
For unbounded groups the same partials would feed ``partition_by_key``
+ a partition-local max — the blob column makes that a drop-in swap.

Determinism: value hashing is ``pandas.util.hash_array`` (SipHash,
fixed key), the same primitive the dedup family pins; no RNG anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 -> 0): 6-step binary
    search, no float round-trip (float64 log2 is off-by-one near
    power-of-two boundaries above 2^53)."""
    w = w.copy()
    bl = np.zeros(len(w), np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        t = w >> np.uint64(shift)
        gt = t > 0
        bl[gt] += shift
        w[gt] = t[gt]
    bl += (w > 0).astype(np.int64)
    return bl


def hll_partial(values: np.ndarray, group_codes: np.ndarray,
                n_groups: int, p: int) -> np.ndarray:
    """(n_groups, 2^p) uint8 register matrix from one batch.

    ``values`` is any dtype ``pandas.util.hash_array`` accepts;
    ``group_codes`` assigns each value to a group in [0, n_groups).
    One flat ``np.maximum.at`` across all groups — no per-group loop.
    """
    m = 1 << p
    regs = np.zeros(n_groups * m, np.uint8)
    if len(values):
        h = pd.util.hash_array(values, categorize=False)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)  # low 64-p payload bits, left-aligned
        # rho = leading zeros of payload + 1; all-zero payload -> 64-p+1
        rho = np.where(w > 0, 64 - _bit_length_u64(w) + 1, 64 - p + 1) \
            .astype(np.uint8)
        np.maximum.at(regs, group_codes.astype(np.int64) * m + idx, rho)
    return regs.reshape(n_groups, m)


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimate with the small-range (linear counting)
    correction; no large-range correction (unnecessary with a 64-bit
    hash)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return int(round(e))


def hll_distinct(ds, key_col: str, value_col: str, *,
                 p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT value) per key — bounded key domain
    (driver fold of per-batch register blobs; the fold state is
    n_keys x 2^p bytes, O(1) in the input)."""
    import ray

    from .aggregate import concat_nonempty

    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "regs": pa.array([], pa.binary())})
        keys = b[key_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys)
        vals = b[value_col].to_numpy(zero_copy_only=False)
        regs = hll_partial(vals, codes, len(uniq), p)
        return pa.table({
            key_col: pa.array(uniq.astype(object), pa.string()),
            "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
        })

    parts = concat_nonempty(ray.get(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()))
    folded: dict[str, np.ndarray] = {}
    if parts.num_rows:
        for key, blob in zip(parts[key_col].to_pylist(),
                             parts["regs"].to_pylist()):
            r = np.frombuffer(blob, np.uint8)
            prev = folded.get(key)
            folded[key] = r if prev is None else np.maximum(prev, r)
    keys = sorted(folded)
    return pa.table({
        key_col: pa.array(keys, pa.string()),
        "approx_distinct": pa.array(
            [hll_estimate(folded[k]) for k in keys], pa.int64()),
    })


# ---------------------------------------------------------------- Misra-Gries


def mg_summary(values: np.ndarray, counts: np.ndarray,
               k: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress exact (value, count) pairs to a Misra-Gries summary of
    at most ``k`` counters: subtract the (k+1)-th largest count from
    every counter and keep the positive ones.  Guarantee: any value
    with true count > (total seen)/(k+1) keeps a positive counter, and
    summaries MERGE by concat + re-compress (Agarwal et al., the
    mergeable-summaries result) — so the candidate set is independent
    of batch order and partitioning."""
    if len(values) <= k:
        return values, counts
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > kth
    return values[keep], counts[keep] - kth


def heavy_hitters(ds, col: str, *, k: int = 64,
                  divisor: int | None = None) -> pa.Table:
    """EXACT frequent-items via a two-pass Misra-Gries sketch:
    ``(value, cnt)`` for every value whose count exceeds
    ``total // divisor`` (``divisor`` defaults to ``k + 1``, the
    largest threshold the sketch guarantees).

    Pass 1 streams per-batch exact counts compressed to <= k MG
    counters (the shuffle payload is k rows per block, O(1) in the
    batch) and merges them driver-side — the merged candidate set
    provably contains every above-threshold value.  Pass 2 broadcasts
    the candidates (<= k values via ``ray.put``) and re-counts ONLY
    them exactly (bounded key domain -> per-batch partials + driver
    fold), so the reported counts are exact, not estimates.  Nothing
    unbounded ever reaches the driver."""
    import pyarrow.compute as pc

    import ray

    from .aggregate import concat_nonempty

    if divisor is None:
        divisor = k + 1
    if divisor > k + 1:
        raise ValueError(
            f"divisor {divisor} exceeds the MG guarantee k+1={k + 1}: "
            "items above total/divisor could be missed — raise k")

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"v": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vals = b[col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(vals)
        cnt = np.bincount(codes).astype(np.int64)
        v, c = mg_summary(uniq.astype(object), cnt, k)
        n = np.zeros(len(v), np.int64)
        if len(n):
            n[0] = b.num_rows
        elif b.num_rows:  # all counters cancelled: still carry total
            return pa.table({"v": pa.array([None], pa.string()),
                             "c": pa.array([0], pa.int64()),
                             "n": pa.array([b.num_rows], pa.int64())})
        return pa.table({"v": pa.array(v, pa.string()),
                         "c": pa.array(c, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    parts = concat_nonempty(ray.get(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()))
    if parts.num_rows == 0 or parts.num_columns == 0:
        return pa.table({col: pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    total = int(pc.sum(parts["n"]).as_py() or 0)
    live = parts.filter(pc.is_valid(parts["v"]))
    merged = (live.group_by(["v"]).aggregate([("c", "sum")])
              if live.num_rows else pa.table(
                  {"v": pa.array([], pa.string()),
                   "c_sum": pa.array([], pa.int64())}))
    cand_v, cand_c = mg_summary(
        np.asarray(merged["v"].to_pylist(), dtype=object),
        merged["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64),
        k)
    threshold = total // divisor
    if len(cand_v) == 0:
        return pa.table({col: pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    cand_set = pa.array(sorted(cand_v), pa.string())
    ref = ray.put(cand_set)

    def rescore(b: pa.Table) -> pa.Table:
        cands = ray.get(ref)
        vals = pc.cast(b[col], pa.string())
        hit = pa.table({"v": vals}).filter(pc.is_in(vals, value_set=cands))
        g = hit.group_by(["v"]).aggregate([([], "count_all")])
        return g.rename_columns(["v", "cnt"])

    exact = concat_nonempty(ray.get(
        ds.map_batches(rescore, batch_format="pyarrow").to_arrow_refs()))
    if exact.num_rows == 0 or exact.num_columns == 0:
        return pa.table({col: pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    folded = exact.group_by(["v"]).aggregate([("cnt", "sum")])
    keep = folded.filter(pc.greater(folded["cnt_sum"], threshold))
    out = keep.rename_columns([col, "cnt"])
    return out.take(pc.sort_indices(out, sort_keys=[(col, "ascending")]))


# -------------------------------------------------------------------- Bloom


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: pos_i = (h1 + i*h2)
    mod m.  ``h`` is uint64; h2 forced odd so the probe sequence walks
    the whole (power-of-two) table."""
    h = h.astype(np.uint64, copy=False)
    m = np.uint64(m_bits)
    h1 = h % m
    h2 = ((h >> np.uint64(32)) | np.uint64(1)) % m
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % m).astype(np.int64)


def bloom_words(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """uint64 word array (m_bits/64 words) with the k probe bits of
    every hash set — one vectorized ``bitwise_or.at``, no loop over
    values.  Mergeable by elementwise OR (commutative, associative,
    idempotent: partitioning/retry independent, like HLL registers)."""
    words = np.zeros(m_bits // 64, np.uint64)
    if len(hashes):
        pos = _bloom_positions(hashes, m_bits, k).ravel()
        np.bitwise_or.at(words, pos >> 6,
                         np.uint64(1) << (pos.astype(np.uint64)
                                          & np.uint64(63)))
    return words


def bloom_probe(hashes: np.ndarray, words: np.ndarray, m_bits: int,
                k: int) -> np.ndarray:
    """Bool mask: True where ALL k probe bits are set (possible
    member; false positives at the configured rate, NEVER false
    negatives)."""
    if len(hashes) == 0:
        return np.zeros(0, bool)
    pos = _bloom_positions(hashes, m_bits, k)
    bits = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) \
        & np.uint64(1)
    return bits.all(axis=1)


def bloom_from_dataset(ds, col: str, *, m_bits: int,
                       k: int = 6) -> np.ndarray:
    """Distributed Bloom build over an int64 hash column: per-batch
    word-array partials (a fixed ``m_bits/8`` bytes each, O(1) in the
    batch) OR-fold driver-side — the same mergeable-sketch shape as
    the HLL fold.  ``m_bits`` must be a power of two."""
    import ray

    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits {m_bits} must be a power of two")

    def partial(b: pa.Table) -> pa.Table:
        h = b[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"w": pa.array([bloom_words(h, m_bits, k)
                                        .tobytes()], pa.binary())})

    from .aggregate import concat_nonempty

    parts = concat_nonempty(ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=None).to_arrow_refs()))
    words = np.zeros(m_bits // 64, np.uint64)
    if parts.num_rows and parts.num_columns:
        for blob in parts["w"].to_pylist():
            words |= np.frombuffer(blob, np.uint64)
    return words


# --------------------------------------------- deterministic quantile sketch

def mrl_collapse(buf: np.ndarray):
    """One MRL collapse: sort, keep every other element starting at a
    FIXED offset (deterministic — the classic Munro-Paterson /
    Manku-Rajagopalan-Lindsay compaction; randomizing the offset gives
    KLL's tighter constants, but a fixed offset keeps the whole sketch
    reproducible run-to-run).  Odd-length buffers leave one element
    behind at the current level so total weight is EXACTLY preserved.
    Returns (promoted, leftover)."""
    s = np.sort(buf, kind="stable")
    if len(s) % 2:
        return s[1:][1::2], s[:1]
    return s[1::2], s[:0]


def mrl_build(values: np.ndarray, k: int = 256) -> list:
    """Level-array sketch of ``values``: entries at level i carry
    weight 2^i; any level holding >= 2k entries collapses into the
    next.  Deterministic rank error per level <= weight/2, so the
    total rank error is O(N log(N/k) / k) — the classic bound."""
    levels: list[np.ndarray] = [np.asarray(values, np.int64)]
    return _mrl_compact(levels, k)


def _mrl_compact(levels: list, k: int) -> list:
    i = 0
    while i < len(levels):
        while len(levels[i]) >= 2 * k:
            promoted, leftover = mrl_collapse(levels[i])
            levels[i] = leftover
            if i + 1 == len(levels):
                levels.append(np.zeros(0, np.int64))
            levels[i + 1] = np.concatenate([levels[i + 1], promoted])
        i += 1
    return levels


def mrl_merge(a: list, b: list, k: int = 256) -> list:
    """Merge two level-array sketches (same-level concat + re-collapse)
    — the mergeability that makes the sketch a per-block partial."""
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        av = a[i] if i < len(a) else np.zeros(0, np.int64)
        bv = b[i] if i < len(b) else np.zeros(0, np.int64)
        out.append(np.concatenate([av, bv]))
    return _mrl_compact(out, k)


def mrl_quantile(levels: list, q: float) -> int:
    """Weighted-rank quantile from a level-array sketch."""
    vals = np.concatenate([lv for lv in levels if len(lv)]) \
        if any(len(lv) for lv in levels) else np.zeros(0, np.int64)
    if not len(vals):
        raise ValueError("mrl_quantile: empty sketch")
    wts = np.concatenate([
        np.full(len(lv), 1 << i, np.int64)
        for i, lv in enumerate(levels) if len(lv)])
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    target = q * cum[-1]
    return int(vals[np.searchsorted(cum, target, side="left")])


def quantile_sketch(ds, col: str, *, k: int = 256,
                    qs: tuple = (0.01, 0.25, 0.5, 0.75, 0.99)):
    """APPROXIMATE quantiles via a mergeable deterministic MRL sketch —
    the sketch-family sibling of hll_distinct (distinct) and
    heavy_hitters (frequency): per-block ``mrl_build`` partials (a few
    KiB each regardless of block size), tree-merged driver-side, so at
    100 TB the exact sort/shuffle of e_value_quantiles is replaced by
    an O(blocks x k log(N/k)) fold.  Rank error is deterministic (no
    failure probability); the bound is pytest-pinned against the exact
    quantiles.  Returns a pa.Table (q, value)."""
    import pyarrow as pa
    import ray

    def partial(b: pa.Table) -> pa.Table:
        import io
        import pickle

        if b.num_rows == 0 or col not in b.schema.names:
            payload = pickle.dumps([])
        else:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
            payload = pickle.dumps([lv for lv in mrl_build(v, k)])
        return pa.table({"sk": pa.array([payload], pa.binary())})

    import pickle

    parts = ray.get(ds.map_batches(
        partial, batch_format="pyarrow").to_arrow_refs())
    sketches = []
    for p in parts:
        if p.num_rows == 0 or "sk" not in p.schema.names:
            continue
        for blob in p["sk"].to_pylist():
            lv = pickle.loads(blob)
            if any(len(x) for x in lv):
                sketches.append(lv)
    if not sketches:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    # fixed left-fold merge order (block order is deterministic for a
    # given input), so repeated runs produce identical sketches
    acc = sketches[0]
    for s in sketches[1:]:
        acc = mrl_merge(acc, s, k)
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "value": pa.array([mrl_quantile(acc, q) for q in qs],
                          pa.int64()),
    })


def quantile_sketch_grouped(ds, group_col: str, col: str, *, k: int = 256,
                            qs: tuple = (0.25, 0.5, 0.75)):
    """Per-GROUP approximate quantiles via the MRL sketch — grouped
    percentiles without the exact per-group sort/shuffle: each block
    emits one pickled {group: levels} dict (bounded: groups x k
    entries), the driver tree-merges per group.  Bounded-key doctrine
    (group domain is schema-scale, like interval_counts' sink x level).
    Returns a pa.Table (group, q, value) sorted by (group, q)."""
    import pickle

    import pyarrow as pa
    import ray

    def partial(b: pa.Table) -> pa.Table:
        by_group = {}
        if b.num_rows and col in b.schema.names:
            import pandas as pd  # noqa: F811

            g = pd.DataFrame({
                "g": b[group_col].to_pandas(),
                "v": b[col].to_numpy(zero_copy_only=False)
                .astype(np.int64)})
            for key, sub in g.groupby("g", sort=False):
                by_group[key] = mrl_build(sub["v"].to_numpy(), k)
        return pa.table({"sk": pa.array([pickle.dumps(by_group)],
                                        pa.binary())})

    parts = ray.get(ds.map_batches(
        partial, batch_format="pyarrow").to_arrow_refs())
    merged: dict = {}
    for p in parts:
        if p.num_rows == 0 or "sk" not in p.schema.names:
            continue
        for blob in p["sk"].to_pylist():
            for key, lv in pickle.loads(blob).items():
                merged[key] = mrl_merge(merged[key], lv, k) \
                    if key in merged else lv
    g_out, q_out, v_out = [], [], []
    for key in sorted(merged):
        for q in qs:
            g_out.append(key)
            q_out.append(q)
            v_out.append(mrl_quantile(merged[key], q))
    return pa.table({
        group_col: pa.array(g_out),
        "q": pa.array(q_out, pa.float64()),
        "value": pa.array(v_out, pa.int64()),
    })
