"""Worker-death resilience of the raw-task BSP waves.

graph.py (components/pagerank) and model.py (GD fit) run iterative
fixed points as raw ``ray.remote`` task waves, so they lean on Ray
CORE's task retry + lineage machinery rather than Ray Data's
per-operator retries.  These tests pin that contract: a worker
process dying mid-iteration (``os._exit`` inside a wave kernel — a
process crash, not a Python exception) must still yield the
oracle-exact fixed point via task retry.

Injection: the wave kernels are module globals resolved at
``ray.remote(...)`` wrap time, so a driver-side monkeypatch with a
CLOSURE (cloudpickle ships closures by value) reaches every worker.
A sentinel file consumed by an atomic rename makes exactly one task
attempt crash its worker.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from alco_ray.stages import graph, model


def _crash_once(fn, sentinel: str):
    """Wrap a wave kernel: the first task attempt (across all workers)
    to consume ``sentinel`` dies as a PROCESS; every other attempt —
    including the retry of the dead one — runs ``fn`` normally."""

    def wrapped(*args, **kwargs):
        try:
            os.rename(sentinel, sentinel + ".consumed")
        except OSError:
            pass
        else:
            os._exit(1)
        return fn(*args, **kwargs)

    return wrapped


def _edges(a, b):
    return ray.data.from_arrow(pa.table({
        "doc_a": pa.array(list(a), pa.int64()),
        "doc_b": pa.array(list(b), pa.int64())}))


def test_components_survive_worker_death(ray_session, tmp_path,
                                         monkeypatch):
    rng = np.random.RandomState(7)
    a = rng.randint(0, 200, 400)
    b = rng.randint(0, 200, 400)
    m = a != b
    a, b = a[m].tolist(), b[m].tolist()
    want = graph.connected_components(
        _edges(a, b), num_partitions=3).to_pandas()
    want = sorted(zip(want["node"], want["component"]))

    sentinel = str(tmp_path / "cc_crash")
    open(sentinel, "w").close()
    monkeypatch.setattr(graph, "_cc_send",
                        _crash_once(graph._cc_send, sentinel))
    got = graph.connected_components(
        _edges(a, b), num_partitions=3).to_pandas()
    assert os.path.exists(sentinel + ".consumed"), "crash never fired"
    assert sorted(zip(got["node"], got["component"])) == want


def test_pagerank_survives_worker_death(ray_session, tmp_path,
                                        monkeypatch):
    rng = np.random.RandomState(13)
    src = rng.randint(0, 150, 600).tolist()
    dst = rng.randint(0, 150, 600).tolist()
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    want = graph.pagerank(ds, iters=4, num_partitions=3).to_pandas()
    want = sorted(zip(want["node"], want["rank_fp"]))

    sentinel = str(tmp_path / "pr_crash")
    open(sentinel, "w").close()
    monkeypatch.setattr(graph, "_pr_contrib",
                        _crash_once(graph._pr_contrib, sentinel))
    ds2 = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    got = graph.pagerank(ds2, iters=4, num_partitions=3).to_pandas()
    assert os.path.exists(sentinel + ".consumed"), "crash never fired"
    assert sorted(zip(got["node"], got["rank_fp"])) == want


def test_gd_fit_survives_worker_death(ray_session, tmp_path,
                                      monkeypatch):
    rng = np.random.RandomState(3)
    n = 400
    x = {c: rng.randint(0, 1000, n).astype(np.int64)
         for c in ("f0", "f1", "f2")}
    y = ((x["f0"] + 2 * x["f1"] - x["f2"]) > 900).astype(np.int64)
    t = pa.table({**{c: pa.array(v) for c, v in x.items()},
                  "y": pa.array(y)})
    blocks = [t.slice(i, 100) for i in range(0, n, 100)]
    ds = ray.data.from_arrow(blocks)
    want = model.fit_linear_gd(ds, feat_cols=["f0", "f1", "f2"],
                               label_col="y", iters=6)

    sentinel = str(tmp_path / "gd_crash")
    open(sentinel, "w").close()
    monkeypatch.setattr(model, "_gd_block_partial",
                        _crash_once(model._gd_block_partial, sentinel))
    ds2 = ray.data.from_arrow(blocks)
    got = model.fit_linear_gd(ds2, feat_cols=["f0", "f1", "f2"],
                              label_col="y", iters=6)
    assert os.path.exists(sentinel + ".consumed"), "crash never fired"
    assert got == want


def test_kmeans_waves_survive_worker_death(ray_session, tmp_path,
                                           monkeypatch):
    """The PQ / IVF-PQ codebook fits ride the same raw-task wave
    doctrine (similarity.kmeans_fixed_point): a worker dying inside
    an assignment wave must still yield the oracle-exact fixed point
    via Ray core's task retry."""
    from alco_ray.stages import similarity

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    want = similarity.kmeans_fixed_point(ds, k=8, iters=2).to_pandas()
    want = sorted(zip(want["vec_id"], want["cluster"]))

    sentinel = str(tmp_path / "km_crash")
    open(sentinel, "w").close()
    monkeypatch.setattr(
        similarity, "_km_assign_block",
        _crash_once(similarity._km_assign_block, sentinel))
    ds2 = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    got = similarity.kmeans_fixed_point(ds2, k=8, iters=2).to_pandas()
    assert os.path.exists(sentinel + ".consumed"), "crash never fired"
    assert sorted(zip(got["vec_id"], got["cluster"])) == want
