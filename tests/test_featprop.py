"""feature_propagation — k-hop neighbor-mean smoothing.

Checks: (1) every hop matches a NumPy twin (sym-multiset mean with
keep-own for isolated vertices) on a graph with hubs, multi-edges,
self-loops and an isolated vertex; (2) dims truncation; (3) a vertex
with no neighbors is a fixed point at every hop."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.operators import feature_propagation
from tests.conftest import make_graph


def _numpy_featprop(edges, feats: np.ndarray, hops: int) -> np.ndarray:
    n, d = feats.shape
    sym = [(s, t) for s, t in edges] + [(t, s) for s, t in edges]
    x = feats.astype(np.float64)
    for _ in range(hops):
        acc = np.zeros((n, d))
        cnt = np.zeros(n)
        for s, t in sym:
            acc[t] += x[s]
            cnt[t] += 1
        nxt = x.copy()
        nz = cnt > 0
        nxt[nz] = acc[nz] / cnt[nz, None]
        x = nxt
    return x


def _run(spark, edges, feats, hops, dims=None):
    n, d = feats.shape
    g = make_graph(spark, np.array(edges), n)
    fdf = spark.createDataFrame(
        [(i, [float(v) for v in feats[i]]) for i in range(n)],
        "id long, vec array<double>",
    )
    out = feature_propagation(g, fdf, hops=hops, dims=dims).collect()
    g.unpersist()
    got = {}
    for r in out:
        got[(r["id"], r["dim"])] = r["x"]
    return got


def test_featprop_matches_numpy_each_hop(spark):
    rng = np.random.default_rng(3)
    # hub vertex 0, a multi-edge (1,2)x2, a self-loop (3,3), isolated 7
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (1, 2), (3, 3), (5, 6)]
    n, d = 8, 3
    feats = rng.normal(size=(n, d))
    for hops in (1, 2, 3):
        got = _run(spark, edges, feats, hops)
        want = _numpy_featprop(edges, feats, hops)
        for i in range(n):
            for j in range(d):
                assert got[(i, j)] == pytest.approx(want[i, j], rel=1e-12), (i, j, hops)


def test_featprop_isolated_fixed_point(spark):
    feats = np.arange(12, dtype=float).reshape(4, 3)
    got = _run(spark, [(0, 1), (1, 2)], feats, hops=3)
    for j in range(3):
        assert got[(3, j)] == feats[3, j]


def test_featprop_dims_truncation(spark):
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(5, 6))
    got = _run(spark, [(0, 1), (2, 3), (3, 4)], feats, hops=2, dims=2)
    assert {k[1] for k in got} == {0, 1}
    want = _numpy_featprop([(0, 1), (2, 3), (3, 4)], feats[:, :2], 2)
    for i in range(5):
        for j in range(2):
            assert got[(i, j)] == pytest.approx(want[i, j], rel=1e-12)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
