"""Maximal independent set — structural invariants + greedy replication."""

from __future__ import annotations

import hashlib

import numpy as np

from linkgraph.operators import maximal_independent_set
from tests.conftest import chain_edges, make_graph, star_hub_edges, zipf_edges


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _greedy_mis_py(edges: np.ndarray, n: int, seed: int) -> set[int]:
    """Sequential greedy MIS in (md5 priority, id) order — the fixed-order
    Luby rounds compute exactly this set (Blelloch-Fineman-Shun 2012)."""
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    order = sorted(range(n), key=lambda v: (_md5_60(f"mis:{seed}:{v}"), v))
    mis: set[int] = set()
    dead: set[int] = set()
    for v in order:
        if v not in dead:
            mis.add(v)
            dead.add(v)
            dead |= adj[v]
    return mis


def test_mis_matches_sequential_greedy(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    got = {
        r["id"] for r in maximal_independent_set(g).collect() if r["in_mis"]
    }
    assert got == _greedy_mis_py(edges, n, seed=42)
    g.unpersist()


def test_mis_independent_and_maximal(spark):
    edges, n = zipf_edges(n=150, m=900)
    g = make_graph(spark, edges, n)
    rows = maximal_independent_set(g, seed=7).collect()
    mis = {r["id"] for r in rows if r["in_mis"]}
    assert len(rows) == n
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    for v in mis:  # independence
        assert not (adj[v] & mis), v
    for v in set(range(n)) - mis:  # maximality
        assert adj[v] & mis, v
    g.unpersist()


def test_mis_star_hub_takes_leaves_or_hub(spark):
    edges, n = star_hub_edges(33)
    g = make_graph(spark, edges, n)
    mis = {
        r["id"] for r in maximal_independent_set(g).collect() if r["in_mis"]
    }
    # a star's MIS is either {hub} or all the leaves
    assert mis == {0} or mis == set(range(1, n))
    g.unpersist()


def test_mis_isolated_vertices_always_in(spark):
    edges, _ = chain_edges(4)
    g = make_graph(spark, edges, 10)  # vertices 4..9 isolated
    got = {r["id"]: r["in_mis"] for r in maximal_independent_set(g).collect()}
    for v in range(4, 10):
        assert got[v] is True
