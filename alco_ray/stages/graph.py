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
