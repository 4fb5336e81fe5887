"""BFS / SSSP / SpMV vs oracles, plus the reference's validation invariants."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.graph import synthetic_weight
from linkgraph.operators import bfs, spmv, sssp
from linkgraph.oracles import bfs_oracle, spmv_oracle, sssp_oracle

from tests.conftest import SMALL_FIXTURES, make_graph


@pytest.mark.parametrize("name", sorted(SMALL_FIXTURES))
def test_bfs_levels(spark, name):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    root = int(edges[0, 0])
    got = {row["id"]: row["dist"] for row in bfs(g, root).collect()}
    want = bfs_oracle(edges, n, root)
    assert got == want, name
    g.unpersist()


@pytest.mark.parametrize("name", sorted(SMALL_FIXTURES))
def test_sssp_distances(spark, name):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    root = int(edges[0, 0])
    got = {row["id"]: row["dist"] for row in sssp(g, root).collect()}
    weights = (edges[:, 0] % 10 + edges[:, 1] % 10).astype(np.float64)
    want = sssp_oracle(edges, weights, n, root)
    assert got == want, name
    g.unpersist()


def test_sssp_fixpoint_invariant(spark):
    """The reference validator's relaxed-edge inequality
    (sssp_pushpull.c:57-68): dist[v] <= dist[u] + w for every edge from a
    reached u with reached v; and every out-neighbor of a reached vertex
    is reached."""
    from pyspark.sql import functions as F

    from tests.conftest import zipf_edges

    edges, n = zipf_edges()
    g = make_graph(spark, edges, n)
    dist = sssp(g, int(edges[0, 0]))
    e = g.edges.filter(F.col("src") != F.col("dst"))
    du = dist.select(F.col("id").alias("src"), F.col("dist").alias("du"))
    dv = dist.select(F.col("id").alias("dst"), F.col("dist").alias("dv"))
    joined = e.join(du, "src").join(dv, "dst", "left")
    assert joined.filter(F.col("dv").isNull()).count() == 0
    assert joined.filter(F.col("dv") > F.col("du") + F.col("weight")).count() == 0
    g.unpersist()


@pytest.mark.parametrize("name", sorted(SMALL_FIXTURES))
def test_spmv(spark, name):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    got = np.zeros(n)
    for row in spmv(g).collect():
        got[row["id"]] = row["y"]
    want = spmv_oracle(edges, n)
    assert np.allclose(got, want, atol=1e-9), name
    g.unpersist()
