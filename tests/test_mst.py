"""minimum_spanning_forest — Borůvka under the (weight, a, b) total order.

Checks: (1) the forest equals Kruskal-with-union-find under the same
total order (an INDEPENDENT algorithm — agreement pins uniqueness, not
just self-consistency) on graphs with ties, parallel edges, self-loops
and multiple components; (2) forest size is V − #components; (3) total
weight matches; (4) acyclicity + spanning via union-find replay."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.operators import minimum_spanning_forest
from tests.conftest import make_graph


def _kruskal(edges: list[tuple[int, int, float]], n: int) -> set[tuple[int, int, float]]:
    """Pure-Python Kruskal under (weight, a, b) over the collapsed simple
    view — the engine-independent twin."""
    simple: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        simple[(a, b)] = min(simple.get((a, b), float("inf")), w)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (a, b), w in sorted(simple.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest


def _weighted_graph(spark, edges, n):
    rows = [(int(s), int(d), float(w)) for s, d, w in edges]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    from linkgraph.graph import Graph

    return Graph.from_edges(spark, df, num_vertices=n, num_partitions=4)


def test_msf_matches_kruskal_with_ties(spark):
    # two components; duplicate weights everywhere (only (a,b) breaks
    # ties), a parallel edge with a SMALLER weight (must win), a self-loop
    e = [
        (0, 1, 2.0), (1, 2, 2.0), (2, 0, 2.0),     # triangle, all ties
        (1, 3, 1.0), (3, 4, 1.0), (4, 1, 3.0),
        (3, 1, 0.5),                                # parallel, cheaper
        (5, 5, 0.0),                                # self-loop, dropped
        (6, 7, 1.0), (7, 8, 1.0), (8, 6, 1.0),     # separate component
    ]
    n = 9
    g = _weighted_graph(spark, e, n)
    got = {(r["a"], r["b"], r["weight"]) for r in minimum_spanning_forest(g).collect()}
    want = _kruskal(e, n)
    assert got == want
    g.unpersist()


def test_msf_random_graph_structure(spark):
    rng = np.random.default_rng(7)
    n = 60
    e = [
        (int(a), int(b), float(w))
        for a, b, w in zip(
            rng.integers(0, n, 300), rng.integers(0, n, 300), rng.integers(1, 6, 300)
        )
    ]
    g = _weighted_graph(spark, e, n)
    rows = minimum_spanning_forest(g).collect()
    got = {(r["a"], r["b"], r["weight"]) for r in rows}
    want = _kruskal(e, n)
    assert got == want

    # structural replay: V − C rows, acyclic, connects exactly the
    # components of the input graph
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in sorted(got):
        ra, rb = find(a), find(b)
        assert ra != rb, "cycle in forest"
        parent[ra] = rb
    n_comp_forest = len({find(i) for i in range(n)})

    parent2 = list(range(n))

    def find2(x):
        while parent2[x] != x:
            parent2[x] = parent2[parent2[x]]
            x = parent2[x]
        return x

    for s, d, _ in e:
        if s != d:
            ra, rb = find2(s), find2(d)
            if ra != rb:
                parent2[ra] = rb
    n_comp_graph = len({find2(i) for i in range(n)})
    assert n_comp_forest == n_comp_graph
    assert len(got) == n - n_comp_forest
    g.unpersist()


def test_msf_empty_and_selfloop_only(spark):
    g = _weighted_graph(spark, [(0, 0, 1.0), (1, 1, 2.0)], 3)
    rows = minimum_spanning_forest(g).collect()
    assert rows == []
    g.unpersist()


def test_msf_synthetic_weight_default(spark):
    # the gate path: unweighted edges get the reference-parity synthetic
    # weight src%10 + dst%10 at Graph build time
    e = [(i, (i * 3 + 1) % 15) for i in range(30)]
    n = 30
    g = make_graph(spark, np.array(e), n)
    rows = minimum_spanning_forest(g).collect()
    weighted = [(s, d, float(s % 10 + d % 10)) for s, d in e]
    assert {(r["a"], r["b"], r["weight"]) for r in rows} == _kruskal(weighted, n)
    g.unpersist()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
