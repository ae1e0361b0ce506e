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


def _pr_deg_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """Attach outdeg(src) to every directed edge, partition-locally
    exact because the edge table is keyed by src."""
    k = g["k"].to_numpy()
    v = g["v"].to_numpy()
    order = np.argsort(k, kind="stable")
    k, v = k[order], v[order]
    starts = _segment_starts(k)
    counts = np.diff(np.append(starts, len(k)))
    return pd.DataFrame({
        "k": k, "v": v,
        "deg": np.repeat(counts, counts).astype(np.int64),
        "tag": np.full(len(k), 1, np.int8),
        "part": g["part"].to_numpy()[order],
    })


def _pr_node_kernel(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"node": np.unique(g["k"].to_numpy())})


def _pr_contrib_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """store rows (tag 0: k=node, v=rank) + edge rows (tag 1: k=src,
    v=dst, deg=outdeg(src)) -> per-destination PRE-FOLDED integer
    contribution sums (the combiner: shuffle volume to the fold stage
    is <= |V| rows per source partition, not |E|).  Store rows also
    emit (node, 0) so in-degree-0 nodes keep a rank row."""
    tag = g["tag"].to_numpy()
    store = tag == 0
    sk = g["k"].to_numpy()[store]
    sv = g["v"].to_numpy()[store]
    order = np.argsort(sk)
    sk, sv = sk[order], sv[order]
    rk = g["k"].to_numpy()[~store]
    rv = g["v"].to_numpy()[~store]
    rdeg = g["deg"].to_numpy()[~store]
    contrib = (sv[np.searchsorted(sk, rk)] // rdeg) if len(rk) else \
        np.zeros(0, np.int64)
    k = np.concatenate([rv, sk])
    c = np.concatenate([contrib, np.zeros(len(sk), np.int64)])
    if len(k) == 0:
        return pd.DataFrame({"k": k.astype(np.int64),
                             "c": c.astype(np.int64)})
    o2 = np.argsort(k, kind="stable")
    k, c = k[o2], c[o2]
    starts = _segment_starts(k)
    return pd.DataFrame({"k": k[starts],
                         "c": np.add.reduceat(c, starts)})


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

    Scale shape: the edge table is hash-partitioned by src ONCE
    (outdeg attached partition-locally) and reused every iteration;
    each iteration is two bounded all-to-alls (rank lookup keyed by
    src with a per-partition combiner, then a fold keyed by dst) —
    the connected-components loop's machinery with (sum, //) in place
    of (min).  Nothing edge- or node-sized ever reaches the driver.
    Overflow-safe for scale <= 10**16: ranks sum to <= scale, so any
    partial contribution sum stays < 100 * scale << 2**63.
    """
    if iters < 0 or not (0 <= damping_pct <= 100):
        raise ValueError("pagerank: need iters >= 0, 0 <= damping_pct <= 100")

    def both(t: pa.Table) -> pa.Table:
        a = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if symmetric:
            a, b = np.concatenate([a, b]), np.concatenate([b, a])
        return pa.table({"k": pa.array(a), "v": pa.array(b)})

    n_edges = edges.count()
    if n_edges == 0:
        return _pr_empty()
    n_dir = n_edges * (2 if symmetric else 1)
    directed = edges.map_batches(both, batch_format="pyarrow")
    if num_partitions:
        n_parts = num_partitions
    else:
        # same sizing rationale as connected_components (graph.py:163)
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        want = max(cpus, min(1 << 16, -(-n_dir // 250_000)))
        n_parts = 1 << (int(want) - 1).bit_length()

    # identity map back to ARROW blocks: the per-iteration union with
    # the (arrow) store rows requires both sides in one block type
    edge_t = (partition_by_key(directed, "k", n_parts)
              .groupby("part").map_groups(_pr_deg_kernel,
                                          batch_format="pandas")
              .map_batches(lambda b: b, batch_format="pyarrow")
              .materialize())
    if symmetric:
        # mirrored edges: every node appears as a source, so the node
        # set is partition-local over the src-keyed edge table
        nodes = (edge_t.groupby("part").map_groups(_pr_node_kernel,
                                                   batch_format="pandas")
                 .materialize())
    else:
        # directed: destination-only (dangling) nodes never appear as
        # a source — derive the node set from BOTH endpoints so they
        # still get rank rows (outdeg 0 means they just never emit)
        def both_ends(b: pa.Table) -> pa.Table:
            return pa.table({"k": pa.array(np.concatenate(
                [b["k"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)]))})

        ends = directed.map_batches(both_ends, batch_format="pyarrow")
        nodes = (partition_by_key(ends, "k", n_parts)
                 .groupby("part").map_groups(_pr_node_kernel,
                                             batch_format="pandas")
                 .materialize())
    n = nodes.count()
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100

    ranks = nodes.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "rank_fp": pa.array(np.full(b.num_rows, r0, np.int64))}),
        batch_format="pyarrow")

    for _ in range(iters):
        store = partition_by_key(
            ranks.map_batches(
                lambda b: pa.table({
                    "k": b["node"], "v": b["rank_fp"],
                    "deg": pa.array(np.zeros(b.num_rows, np.int64)),
                    "tag": pa.array(np.zeros(b.num_rows, np.int8))}),
                batch_format="pyarrow"), "k", n_parts)
        contribs = (store.union(edge_t)
                    .groupby("part").map_groups(_pr_contrib_kernel,
                                                batch_format="pandas"))

        def fold(g: pd.DataFrame, _base=base, _d=damping_pct):
            k = g["k"].to_numpy()
            c = g["c"].to_numpy()
            order = np.argsort(k, kind="stable")
            k, c = k[order], c[order]
            starts = _segment_starts(k)
            s = np.add.reduceat(c, starts) if len(k) else \
                np.zeros(0, np.int64)
            return pd.DataFrame({"node": k[starts],
                                 "rank_fp": _base + (_d * s) // 100})

        ranks = (partition_by_key(contribs, "k", n_parts)
                 .groupby("part").map_groups(fold, batch_format="pandas")
                 .materialize())
    return ranks
