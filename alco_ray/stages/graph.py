"""Distributed connected components over an edge Dataset.

The near-dup APPLY step needs per-document cluster labels.
``dedup.dedup_apply`` (dedup.py:700) folds the edge list driver-side
behind a checked ``max_edges`` limit — the right call when near-dup
detection did its job and the edge list is tiny relative to the
corpus.  This module is the unbounded-scale sibling: min-label
propagation expressed entirely as hash-partitioned Ray Data stages,
so the driver never holds the edge list and every shuffle is O(|E|).

Shape per round (the classic BSP label-propagation loop, e.g.
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — re-expressed as Ray Data groupby kernels):

1. LOOKUP: edges keyed by ``src`` and the label table keyed by
   ``node`` share one key-hash partitioning (``window.partition_by_key``
   — THE package-wide partition primitive), so ``label[src]`` is a
   partition-local sorted numpy lookup; each edge emits its source
   label to ``dst``.  One all-to-all, volume |E| + |V|.
2. FOLD: candidate labels partition by receiving node;
   ``np.minimum.reduceat`` per partition computes the new label, and
   the old label rides along so the round reports exactly how many
   nodes strictly dropped.  One all-to-all, volume |E| + |V|.
3. JUMP (optional, default on): ``label <- label[label]`` via the
   same lookup kernel — pointer jumping, which turns diameter-bound
   convergence into O(log diameter) for chain-shaped components.

Convergence is exact, not heuristic: a relaxation round where no
label strictly drops means adjacent nodes agree everywhere, labels
are per-component constant, and (labels only ever being node ids
from the same component) each equals its component minimum.  The
label table is materialized per round — it is O(|V|) and the loop
needs a synchronization point anyway; the edge table is tagged and
partitioned ONCE and reused by every round's union.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .window import partition_by_key

_SENT = np.iinfo(np.int64).min  # rides the max-fold; any real label wins


def _segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return np.flatnonzero(change)


def _lookup_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """tag 0 = store rows (k=node, v=label); tag 1 = request rows
    (k=lookup key, v=requester payload).  Emits (k=payload,
    cand=store[k], old=sentinel) for requests and (k=node, cand=label,
    old=label) for store rows — PRE-FOLDED per destination key (the
    combiner step: shuffle volume to the fold stage is <= |V| rows per
    source partition instead of |E|)."""
    tag = g["tag"].to_numpy()
    store = tag == 0
    sk = g["k"].to_numpy()[store]
    sv = g["v"].to_numpy()[store]
    order = np.argsort(sk)
    sk, sv = sk[order], sv[order]
    rk = g["k"].to_numpy()[~store]
    rv = g["v"].to_numpy()[~store]
    # every request key is a node with a store row in THIS partition
    # (labels are node ids and both sides share the partitioning)
    hit = sv[np.searchsorted(sk, rk)]
    k = np.concatenate([rv, sk])
    cand = np.concatenate([hit, sv])
    old = np.concatenate([np.full(len(rv), _SENT, np.int64), sv])
    o2 = np.argsort(k, kind="stable")
    k, cand, old = k[o2], cand[o2], old[o2]
    starts = _segment_starts(k)
    return pd.DataFrame({
        "k": k[starts],
        "cand": np.minimum.reduceat(cand, starts),
        "old": np.maximum.reduceat(old, starts),
    })


def _fold_kernel(g: pd.DataFrame) -> pd.DataFrame:
    k = g["k"].to_numpy()
    cand = g["cand"].to_numpy()
    old = g["old"].to_numpy()
    order = np.argsort(k, kind="stable")
    k, cand, old = k[order], cand[order], old[order]
    starts = _segment_starts(k)
    return pd.DataFrame({
        "node": k[starts],
        "label": np.minimum.reduceat(cand, starts),
        "old": np.maximum.reduceat(old, starts),
    })


def _jump_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """Pointer jump: store rows (k=node, v=label) + request rows
    (k=label, v=node) -> (node, label[label])."""
    tag = g["tag"].to_numpy()
    store = tag == 0
    sk = g["k"].to_numpy()[store]
    sv = g["v"].to_numpy()[store]
    order = np.argsort(sk)
    sk, sv = sk[order], sv[order]
    rk = g["k"].to_numpy()[~store]
    rv = g["v"].to_numpy()[~store]
    return pd.DataFrame({"node": rv, "label": sv[np.searchsorted(sk, rk)]})


def _tagged(ds, tag: int, n_parts: int):
    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array(b["k"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)),
            "v": pa.array(b["v"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)),
            "tag": pa.array(np.full(b.num_rows, tag, np.int8)),
        })

    return partition_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), "k", n_parts)


def _empty_result():
    import ray

    return ray.data.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
        "component": pa.array([], pa.int64())}))


def connected_components(pairs, *, a_col: str = "doc_a",
                         b_col: str = "doc_b", pointer_jump: bool = True,
                         max_rounds: int = 64,
                         num_partitions: int | None = None):
    """(node, component) for every node in ``pairs``; component = the
    minimum node id reachable from it.  ``pairs`` is a Dataset of
    undirected edges; all propagation runs as hash-partitioned Ray
    stages (see module docstring), nothing edge-sized ever reaches
    the driver.  Raises if ``max_rounds`` relaxations don't converge
    (with pointer jumping that bounds component diameter at ~2^64)."""

    def both(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    # |E| from the PAIR dataset (metadata-cheap for table-backed and
    # materialized inputs) — the directed view is exactly twice it, so
    # the edge table needs only one execution (the materialize below).
    n_dir = 2 * pairs.count()
    if n_dir == 0:
        return _empty_result()
    directed = pairs.map_batches(both, batch_format="pyarrow")
    if num_partitions:
        n_parts = num_partitions
    else:
        # Data-proportional WITHOUT suggest_key_partitions' 64-part
        # floor: every round pays the fixed all-to-all latency per
        # partitioned stage, so a small pair graph must not fan out to
        # 64 groups (measured: the floor tripled wall time on a
        # 400-node graph).  Floor = cluster CPUs keeps big-graph
        # kernels parallel; cap matches suggest_key_partitions.
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        want = max(cpus, min(1 << 16, -(-n_dir // 250_000)))
        n_parts = 1 << (int(want) - 1).bit_length()
    edges = _tagged(directed, 1, n_parts).materialize()

    # Round 0 fused into init: label(u) = min(u, neighbors(u)) via one
    # fold over the directed edges alone (old = u itself).
    def init_prep(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table({"k": b["k"], "cand": b["v"],
                         "old": pa.array(k.astype(np.int64)),
                         "part": b["part"]})

    def init_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = _fold_kernel(g)
        return pd.DataFrame({
            "node": out["node"],
            "label": np.minimum(out["node"].to_numpy(),
                                out["label"].to_numpy())})

    labels = (edges.map_batches(init_prep, batch_format="pyarrow")
              .groupby("part").map_groups(init_fold, batch_format="pandas")
              .materialize())

    for rnd in range(max_rounds):
        store = labels.map_batches(
            lambda b: pa.table({"k": b["node"], "v": b["label"]}),
            batch_format="pyarrow")
        relaxed = (_tagged(store, 0, n_parts).union(edges)
                   .groupby("part").map_groups(_lookup_kernel,
                                               batch_format="pandas"))
        new_labels = (partition_by_key(
            relaxed.map_batches(
                lambda b: b.select(["k", "cand", "old"]),
                batch_format="pyarrow"), "k", n_parts)
            .groupby("part").map_groups(_fold_kernel,
                                        batch_format="pandas")
            .materialize())

        def changed_partial(b: pa.Table) -> pa.Table:
            lab = b["label"].to_numpy(zero_copy_only=False)
            old = b["old"].to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array(
                [int((lab < old).sum())], pa.int64())})

        changed = new_labels.map_batches(
            changed_partial, batch_format="pyarrow").sum("n")
        # lazy map over the materialized fold — no extra job unless a
        # pointer jump follows
        labels = new_labels.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["label"]}),
            batch_format="pyarrow")
        if not changed:
            break
        # Pointer jumping only once plain relaxation has run twice
        # without converging: shallow graphs (the near-dup norm) then
        # never pay the extra per-round shuffle, while chains still
        # get O(log diameter) once jumping kicks in.
        if pointer_jump and rnd >= 2:
            stor = labels.map_batches(
                lambda b: pa.table({"k": b["node"], "v": b["label"]}),
                batch_format="pyarrow")
            reqs = labels.map_batches(
                lambda b: pa.table({"k": b["label"], "v": b["node"]}),
                batch_format="pyarrow")
            labels = (_tagged(stor, 0, n_parts)
                      .union(_tagged(reqs, 1, n_parts))
                      .groupby("part").map_groups(_jump_kernel,
                                                  batch_format="pandas")
                      .materialize())
    else:
        raise ValueError(
            f"connected_components: no fixpoint after {max_rounds} "
            "rounds; raise max_rounds (or check for label cycles in a "
            "custom edge source)")

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["label"]}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PageRank — fixed-point INTEGER power iteration (SQL-replayable)
# ---------------------------------------------------------------------------

def _pr_empty():
    import ray

    return ray.data.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
        "rank_fp": pa.array([], pa.int64())}))


_PR_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _pr_hash(k: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic multiplicative partition hash: uint64 multiply is
    wrap-defined at any id magnitude (the sample.py lesson), the >>17
    mixes high bits into the modulus."""
    h = (k.astype(np.uint64) * _PR_GOLDEN) >> np.uint64(17)
    return (h % np.uint64(n_parts)).astype(np.int64)


def _pr_split_arrays(h: np.ndarray, arrays: list, n_parts: int) -> list:
    """Split ``arrays`` (parallel) into ``n_parts`` tuples by the
    partition vector ``h`` — one stable sort, then slice views."""
    order = np.argsort(h, kind="stable")
    hs = h[order]
    bounds = np.searchsorted(hs, np.arange(n_parts + 1))
    sa = [a[order] for a in arrays]
    return [tuple(a[bounds[p]:bounds[p + 1]] for a in sa)
            for p in range(n_parts)]


def _pr_split_block(t: pa.Table, src_col: str, dst_col: str,
                    symmetric: bool, n_parts: int):
    """Per input block: directed edges split by hash(src), plus the
    block's DEDUPED node candidates split by hash(node).  Returns a
    flat list of 2*n_parts values (edges first) for num_returns.
    Empty blocks can surface with a degenerate schema in ray 2.49
    (same quirk aggregate.concat_nonempty guards), hence the guard."""
    if t.num_rows == 0 or src_col not in t.schema.names:
        z = np.zeros(0, np.int64)
        return [(z, z)] * n_parts + [z] * n_parts
    a = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if symmetric:
        a, b = np.concatenate([a, b]), np.concatenate([b, a])
    edge_parts = _pr_split_arrays(_pr_hash(a, n_parts), [a, b], n_parts)
    # symmetric: every node appears as a source; directed: dangling
    # destinations need rank rows too, so take both endpoints
    cand = np.unique(a if symmetric else np.concatenate([a, b]))
    node_parts = _pr_split_arrays(_pr_hash(cand, n_parts), [cand], n_parts)
    return list(edge_parts) + [c[0] for c in node_parts]


def _pr_build_part(*chunks):
    """Assemble one partition: edges sorted by src with outdeg attached
    (partition-locally exact — hash(src) co-locates all of a source's
    out-edges), plus the partition's sorted node vector.  Returns
    (partition, node_count) for num_returns=2."""
    half = len(chunks) // 2
    sk = np.concatenate([c[0] for c in chunks[:half]]) if half else \
        np.zeros(0, np.int64)
    sv = np.concatenate([c[1] for c in chunks[:half]]) if half else \
        np.zeros(0, np.int64)
    order = np.argsort(sk, kind="stable")
    sk, sv = sk[order], sv[order]
    starts = _segment_starts(sk)
    counts = np.diff(np.append(starts, len(sk)))
    deg = np.repeat(counts, counts).astype(np.int64)
    nodes = np.unique(np.concatenate(list(chunks[half:]))) if half else \
        np.zeros(0, np.int64)
    return (sk, sv, deg, nodes), len(nodes)


def _pr_init_ranks(part, r0: int) -> np.ndarray:
    return np.full(len(part[3]), int(r0), np.int64)


def _pr_contrib(part, ranks: np.ndarray, n_parts: int):
    """One BSP superstep, send half: rank[src] // outdeg(src) per edge,
    PRE-FOLDED per destination (the combiner — at most |V_p| rows leave
    per partition, not |E_p|), then split by hash(dst).  Returns
    n_parts (dst, sum) pairs (the bare pair when n_parts == 1)."""
    sk, sv, deg, nodes = part
    if len(sk):
        contrib = ranks[np.searchsorted(nodes, sk)] // deg
        order = np.argsort(sv, kind="stable")
        dst, c = sv[order], contrib[order]
        starts = _segment_starts(dst)
        dk = dst[starts]
        dc = np.add.reduceat(c, starts)
    else:
        dk = dc = np.zeros(0, np.int64)
    parts = _pr_split_arrays(_pr_hash(dk, n_parts), [dk, dc], n_parts)
    return parts[0] if n_parts == 1 else parts


def _pr_fold(part, base: int, damping_pct: int, *partials) -> np.ndarray:
    """One BSP superstep, receive half: sum the per-destination partial
    contributions (int64 addition — exact in any arrival order) onto
    this partition's node vector, apply the damped recurrence.  Nodes
    with no in-edges get exactly ``base`` (the recurrence verbatim)."""
    nodes = part[3]
    s = np.zeros(len(nodes), np.int64)
    for dk, dc in partials:
        if len(dk):
            # dk is unique within one partial, so fancy-index add is exact
            s[np.searchsorted(nodes, dk)] += dc
    return int(base) + (int(damping_pct) * s) // 100


def _pr_emit(part, ranks: np.ndarray) -> pa.Table:
    return pa.table({"node": pa.array(part[3], pa.int64()),
                     "rank_fp": pa.array(ranks, pa.int64())})


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             symmetric: bool = True, iters: int = 5,
             damping_pct: int = 85, scale: int = 10 ** 12,
             num_partitions: int | None = None):
    """(node, rank_fp) PageRank over an int64-keyed edge Dataset,
    computed ENTIRELY in fixed-point integers so the result is exactly
    reproducible by any engine (the DuckDB oracle unrolls the same
    recurrence; float power iteration would differ in ulps by
    summation order):

        base           = ((100 - damping_pct) * (scale // n)) // 100
        rank_0(v)      = scale // n
        contrib_k(u)   = rank_k(u) // outdeg(u)
        rank_{k+1}(v)  = base + (damping_pct * sum_{u->v} contrib_k(u)) // 100

    with ``n`` = |nodes appearing in the edge set|.  ``symmetric=True``
    mirrors every edge (undirected graph: no dangling nodes by
    construction); with ``symmetric=False`` dangling-node mass is
    simply lost each round (the recurrence above, verbatim).

    Scale shape — raw-task BSP, the one place in this package where
    the Dataset API genuinely can't express the semantics cheaply: an
    iterative fixed point re-visits the SAME edge partitioning every
    round, and a Dataset ``groupby`` re-pays a full all-to-all
    materialization (fixed latency + block shuffle) per round — at
    sf0.1 the old Dataset loop spent 8.5 of 12.7 s on exactly that.
    Here the directed edge table is split ONCE by hash(src) into
    ``num_partitions`` object-store partitions (outdeg attached
    partition-locally; plasma keeps each partition node-local after
    the first fetch), and each iteration moves only rank-vector-sized
    data: a contrib wave (rank lookup is a partition-local sorted
    searchsorted; per-destination sums PRE-FOLDED before the split by
    hash(dst) — at most |V_p| rows leave a partition, never |E_p|)
    and a fold wave.  The driver holds only ObjectRefs; exchange
    volume is O(|V|) per iteration with P^2 small objects (P capped
    at 512 by default — beyond that partitions grow instead, keeping
    the object count bounded on a real cluster).
    Overflow-safe for scale <= 10**16: ranks sum to <= scale, so any
    partial contribution sum stays < 100 * scale << 2**63.
    """
    import ray

    if iters < 0 or not (0 <= damping_pct <= 100):
        raise ValueError("pagerank: need iters >= 0, 0 <= damping_pct <= 100")
    n_edges = edges.count()
    if n_edges == 0:
        return _pr_empty()
    n_dir = n_edges * (2 if symmetric else 1)
    if num_partitions:
        n_parts = int(num_partitions)
    else:
        # data-proportional, NO cpu floor: a raw-task wave over tiny
        # partitions is pure launch overhead, and big graphs hit the
        # 250k-rows-per-partition band on their own
        n_parts = max(1, min(512, -(-n_dir // 250_000)))

    split_task = ray.remote(_pr_split_block).options(
        num_returns=2 * n_parts)
    build_task = ray.remote(_pr_build_part).options(num_returns=2)
    init_task = ray.remote(_pr_init_ranks)
    contrib_task = ray.remote(_pr_contrib)
    fold_task = ray.remote(_pr_fold)
    emit_task = ray.remote(_pr_emit)

    splits = [split_task.remote(ref, src_col, dst_col, symmetric, n_parts)
              for ref in edges.to_arrow_refs()]
    parts, count_refs = [], []
    for p in range(n_parts):
        pref, cref = build_task.remote(
            *([s[p] for s in splits] + [s[n_parts + p] for s in splits]))
        parts.append(pref)
        count_refs.append(cref)
    n = int(sum(ray.get(count_refs)))
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100

    ranks = [init_task.remote(parts[p], r0) for p in range(n_parts)]
    for _ in range(iters):
        if n_parts == 1:
            outs = [[contrib_task.remote(parts[0], ranks[0], 1)]]
        else:
            outs = [contrib_task.options(num_returns=n_parts)
                    .remote(parts[p], ranks[p], n_parts)
                    for p in range(n_parts)]
        ranks = [fold_task.remote(parts[p], base, damping_pct,
                                  *[outs[q][p] for q in range(n_parts)])
                 for p in range(n_parts)]
    return ray.data.from_arrow_refs(
        [emit_task.remote(parts[p], ranks[p]) for p in range(n_parts)])
