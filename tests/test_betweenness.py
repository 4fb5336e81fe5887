"""Seeded Brandes betweenness vs a from-scratch Python replication."""

from __future__ import annotations

from collections import deque

import numpy as np
import pytest

from linkgraph.operators import betweenness
from tests.conftest import chain_edges, make_graph, zipf_edges


def _brandes_py(edges: np.ndarray, n: int, sources: list[int]) -> dict[int, float]:
    """Directed seeded Brandes (Brandes 2001, Alg. 1), endpoints excluded."""
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(int(s), []).append(int(d))
    bc = {v: 0.0 for v in range(n)}
    for s in sources:
        sigma = {s: 1.0}
        dist = {s: 0}
        preds: dict[int, list[int]] = {s: []}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] = sigma.get(v, 0.0) + sigma[u]
                    preds.setdefault(v, []).append(u)
        delta = {v: 0.0 for v in order}
        for v in reversed(order):
            for u in preds[v]:
                delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if v != s:
                bc[v] += delta[v]
    return bc


def test_betweenness_chain_closed_form(spark):
    # 0→1→2→3→4, source {0}: delta(3)=1, delta(2)=2, delta(1)=3
    edges, n = chain_edges(5)
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["betweenness"] for r in betweenness(g, sources=[0]).collect()}
    assert got == {0: 0.0, 1: 3.0, 2: 2.0, 3: 1.0, 4: 0.0}
    g.unpersist()


def test_betweenness_diamond_splits_paths(spark):
    # 0→{1,2}→3→4, source {0}: sigma(3)=sigma(4)=2 so
    # delta(3) = 2/2·(1+0) = 1; delta(1)=delta(2) = 1/2·(1+1) = 1
    edges = np.array([[0, 1], [0, 2], [1, 3], [2, 3], [3, 4]])
    g = make_graph(spark, edges, 5)
    got = {r["id"]: r["betweenness"] for r in betweenness(g, sources=[0]).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 1.0, 3: 1.0, 4: 0.0}
    g.unpersist()


@pytest.mark.parametrize("seeds", [[0], [0, 1, 2, 3, 4, 5, 6, 7]])
def test_betweenness_matches_brandes_replication(spark, seeds):
    edges, n = zipf_edges(n=150, m=900)
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["betweenness"] for r in betweenness(g, sources=seeds).collect()}
    want = _brandes_py(edges, n, seeds)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(round(want[v], 6), abs=1e-6), v
    g.unpersist()


def test_betweenness_isolated_seed_is_all_zero(spark):
    edges = np.array([[1, 2], [2, 3]])
    g = make_graph(spark, edges, 5)  # vertex 0 has no out-edges
    got = {r["id"]: r["betweenness"] for r in betweenness(g, sources=[0]).collect()}
    assert got == {v: 0.0 for v in range(5)}
    g.unpersist()


def _edge_brandes_py(
    edges: np.ndarray, n: int, sources: list[int]
) -> dict[tuple[int, int], float]:
    """Directed seeded edge betweenness (Brandes 2001 §4): a DAG edge u→v
    carries sigma(u)/sigma(v)·(1+delta(v)); non-DAG edges carry 0."""
    adj: dict[int, list[int]] = {}
    eb: dict[tuple[int, int], float] = {}
    for s, d in edges:
        adj.setdefault(int(s), []).append(int(d))
        eb[(int(s), int(d))] = 0.0
    for s in sources:
        sigma = {s: 1.0}
        dist = {s: 0}
        preds: dict[int, list[int]] = {s: []}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] = sigma.get(v, 0.0) + sigma[u]
                    preds.setdefault(v, []).append(u)
        delta = {v: 0.0 for v in order}
        for v in reversed(order):
            for u in preds[v]:
                c = sigma[u] / sigma[v] * (1.0 + delta[v])
                delta[u] += c
                eb[(u, v)] += c
    return eb


def test_edge_betweenness_chain_closed_form(spark):
    # 0→1→2→3→4, source {0}: edge (k,k+1) carries 4-k paths
    from linkgraph.operators import edge_betweenness

    edges, n = chain_edges(5)
    g = make_graph(spark, edges, n)
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness(g, sources=[0]).collect()
    }
    assert got == {(0, 1): 4.0, (1, 2): 3.0, (2, 3): 2.0, (3, 4): 1.0}
    g.unpersist()


@pytest.mark.parametrize("seeds", [[0], [0, 1, 2, 3, 4, 5, 6, 7]])
def test_edge_betweenness_matches_replication(spark, seeds):
    from linkgraph.operators import edge_betweenness

    edges, n = zipf_edges(n=150, m=900)
    g = make_graph(spark, edges, n)
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness(g, sources=seeds).collect()
    }
    want = _edge_brandes_py(edges, n, seeds)
    assert set(got) == set(want)
    for e in want:
        assert got[e] == pytest.approx(round(want[e], 6), abs=1e-6), e
    # vertex consistency: delta(v) = sum of v's outgoing DAG edge terms,
    # so vertex betweenness equals the out-edge sums for non-seeds
    vb = {r["id"]: r["betweenness"] for r in betweenness(g, sources=seeds).collect()}
    out_sum: dict[int, float] = {}
    for (u, v), c in want.items():
        out_sum[u] = out_sum.get(u, 0.0) + c
    for v in vb:
        if v not in seeds:
            assert vb[v] == pytest.approx(round(out_sum.get(v, 0.0), 6), abs=2e-6), v
    g.unpersist()
