"""k-truss vs closed-form fixtures and a brute-force peeling replication."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import k_truss
from tests.conftest import chain_edges, make_graph, zipf_edges


def _truss_py(edges: np.ndarray, k: int) -> dict[tuple[int, int], int]:
    """Reference peeling: canonical simple edges, iteratively drop edges
    with in-subgraph support < k-2; return {edge: final support}."""
    alive = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in edges if a != b}

    def support(es: set[tuple[int, int]]) -> dict[tuple[int, int], int]:
        adj: dict[int, set[int]] = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in es}

    while True:
        sup = support(alive)
        nxt = {e for e in alive if sup[e] >= k - 2}
        if nxt == alive:
            return {e: sup[e] for e in alive}
        alive = nxt


def test_ktruss_clique_plus_tail(spark):
    # 5-clique: every edge has support 3 → survives k=4,5; chain tail peels
    cliq = [(i, j) for i in range(5) for j in range(5) if i < j]
    tail = [(4, 5), (5, 6), (6, 7)]
    edges = np.array(cliq + tail)
    g = make_graph(spark, edges, 8)
    got = {(r["a"], r["b"]): r["support"] for r in k_truss(g, k=4).collect()}
    assert got == {e: 3 for e in cliq}
    g.unpersist()


def test_ktruss_no_truss_is_empty(spark):
    edges, n = chain_edges(10)  # triangle-free
    g = make_graph(spark, edges, n)
    out = k_truss(g, k=3)
    assert out.count() == 0
    assert out.columns == ["a", "b", "support"]
    g.unpersist()


def test_ktruss_k2_keeps_all_canonical_edges(spark):
    edges, n = chain_edges(6)
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]): r["support"] for r in k_truss(g, k=2).collect()}
    assert got == {(i, i + 1): 0 for i in range(5)}
    g.unpersist()


@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_matches_bruteforce_peeling(spark, k):
    edges, n = zipf_edges(n=120, m=900)
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]): r["support"] for r in k_truss(g, k=k).collect()}
    assert got == _truss_py(edges, k)
    g.unpersist()


def test_ktruss_orientation_invariant(spark):
    edges, n = zipf_edges(n=80, m=500)
    g = make_graph(spark, edges, n)
    a = sorted(map(tuple, k_truss(g, k=4, degree_oriented=True).collect()))
    b = sorted(map(tuple, k_truss(g, k=4, degree_oriented=False).collect()))
    assert a == b
    g.unpersist()


def test_ktruss_incremental_identical_to_recount(spark):
    # the incremental-decrement default must be BYTE-identical to the
    # recount-every-round formulation (VERDICT r04 'Next round' #5),
    # including on a graph with a deep peel front (k=4 peels the
    # pendant-triangle fringe in several waves)
    edges, n = zipf_edges(n=150, m=1200)
    g = make_graph(spark, edges, n)
    inc = sorted(map(tuple, k_truss(g, k=4, incremental=True).collect()))
    rec = sorted(map(tuple, k_truss(g, k=4, incremental=False).collect()))
    assert inc == rec and len(inc) > 0
    g.unpersist()


def test_ktruss_incremental_multi_peeled_triangle(spark):
    # two triangles sharing edge (0,1): peeling both outer triangles'
    # edges in ONE round must decrement the shared edge exactly twice
    # (once per destroyed triangle) — the dedup-per-triangle subtlety
    edges = np.array([[0, 1], [0, 2], [1, 2], [0, 3], [1, 3]])
    g = make_graph(spark, edges, 4)
    got = {(r["a"], r["b"]): r["support"] for r in k_truss(g, k=4).collect()}
    assert got == _truss_py(edges, 4) == {}
    got3 = {(r["a"], r["b"]): r["support"] for r in k_truss(g, k=3).collect()}
    assert got3 == _truss_py(edges, 3)
    g.unpersist()


def _trussness_py(edges: np.ndarray) -> dict[tuple[int, int], int]:
    """Reference truss decomposition: trussness(e) = largest k with
    e ∈ k-truss, via brute-force peeling at each k."""
    canon = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in edges if a != b}
    t = {e: 2 for e in canon}
    k = 3
    while True:
        kept = _truss_py(edges, k)
        if not kept:
            return t
        for e in kept:
            t[e] = k
        k += 1


def test_trussness_clique_plus_tail(spark):
    from linkgraph.operators import trussness

    cliq = [(i, j) for i in range(5) for j in range(5) if i < j]
    tail = [(4, 5), (5, 6), (6, 7)]
    edges = np.array(cliq + tail)
    g = make_graph(spark, edges, 8)
    got = {(r["a"], r["b"]): r["trussness"] for r in trussness(g).collect()}
    want = {e: 5 for e in cliq}
    want.update({e: 2 for e in map(tuple, tail)})
    assert got == want == _trussness_py(edges)
    g.unpersist()


def test_trussness_matches_bruteforce_peeling(spark):
    from linkgraph.operators import trussness

    edges, n = zipf_edges(n=120, m=900)
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]): r["trussness"] for r in trussness(g).collect()}
    assert got == _trussness_py(edges)
    g.unpersist()


def test_trussness_consistent_with_ktruss(spark):
    # {e : trussness(e) ≥ 4} must be exactly the 4-truss edge set
    from linkgraph.operators import trussness

    edges, n = zipf_edges(n=150, m=1200)
    g = make_graph(spark, edges, n)
    tr = {(r["a"], r["b"]) for r in trussness(g).collect() if r["trussness"] >= 4}
    kt = {(r["a"], r["b"]) for r in k_truss(g, k=4).collect()}
    assert tr == kt and len(kt) > 0
    g.unpersist()


def test_trussness_triangle_free(spark):
    from linkgraph.operators import trussness

    edges, n = chain_edges(10)
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]): r["trussness"] for r in trussness(g).collect()}
    assert got == {(i, i + 1): 2 for i in range(9)}
    g.unpersist()
