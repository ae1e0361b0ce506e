"""Distributed connected components (stages/graph.py)."""
import numpy as np
import pyarrow as pa
import pytest

import ray


def _pairs(a, b):
    return ray.data.from_arrow(pa.table({
        "doc_a": pa.array(list(a), pa.int64()),
        "doc_b": pa.array(list(b), pa.int64())}))


def _union_find_components(a, b):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        parent[find(x)] = find(y)
    comp = {}
    for n in set(a) | set(b):
        r = find(n)
        comp[r] = min(comp.get(r, n), n)
    return {n: comp[find(n)] for n in set(a) | set(b)}


def test_components_chain_triangle_pair(ray_session):
    from alco_ray.stages.graph import connected_components

    a = list(range(19)) + [100, 101, 100] + [500]
    b = list(range(1, 20)) + [101, 102, 102] + [501]
    out = connected_components(_pairs(a, b)).to_pandas()
    comp = dict(zip(out["node"], out["component"]))
    assert all(comp[i] == 0 for i in range(20))
    assert comp[100] == comp[101] == comp[102] == 100
    assert comp[500] == comp[501] == 500
    assert len(comp) == 20 + 3 + 2


def test_components_random_graph_matches_union_find(ray_session):
    from alco_ray.stages.graph import connected_components

    rng = np.random.RandomState(11)
    a = rng.randint(0, 300, 500)
    b = rng.randint(0, 300, 500)
    m = a != b
    a, b = a[m].tolist(), b[m].tolist()
    out = connected_components(_pairs(a, b)).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == _union_find_components(a, b)


def test_components_empty(ray_session):
    from alco_ray.stages.graph import connected_components

    out = connected_components(_pairs([], []))
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "component"}


def test_components_partition_invariance(ray_session):
    """Same labels at any partition count (the kernel's exactness must
    not depend on how keys land)."""
    from alco_ray.stages.graph import connected_components

    a = [0, 1, 2, 10, 11, 7]
    b = [1, 2, 3, 11, 12, 8]
    want = _union_find_components(a, b)
    for np_ in (1, 2, 8):
        out = connected_components(_pairs(a, b),
                                   num_partitions=np_).to_pandas()
        assert dict(zip(out["node"], out["component"])) == want


def test_components_max_rounds_raises(ray_session):
    from alco_ray.stages.graph import connected_components

    a = list(range(63))
    b = list(range(1, 64))
    with pytest.raises(ValueError, match="max_rounds"):
        # a 64-chain cannot converge in one relaxation round
        connected_components(_pairs(a, b), max_rounds=1,
                             pointer_jump=False)
