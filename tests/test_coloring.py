"""Graph coloring — validity invariants + structural fixtures."""

from __future__ import annotations

import numpy as np

from linkgraph.operators import graph_coloring
from tests.conftest import (
    bridge_edges,
    chain_edges,
    make_graph,
    star_hub_edges,
    two_cliques_edges,
    zipf_edges,
)


def _degrees(edges: np.ndarray, n: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    return {v: len(s) for v, s in adj.items()}


def _assert_proper(edges: np.ndarray, colors: dict[int, int]) -> None:
    for a, b in edges:
        if a != b:
            assert colors[int(a)] != colors[int(b)], f"edge ({a},{b}) monochromatic"


def test_coloring_proper_on_zipf(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    out = graph_coloring(g, seed=42).collect()
    colors = {r["id"]: r["color"] for r in out}
    assert len(colors) == n  # every vertex colored exactly once
    _assert_proper(edges, colors)
    # palette bound is PER VERTEX: the Johansson draw stays inside
    # {0..deg(v)}, giving the same Δ+1 worst case as greedy
    deg = _degrees(edges, n)
    for v, c in colors.items():
        assert 0 <= c <= deg[v], (v, c, deg[v])


def test_coloring_clique_uses_k_colors(spark):
    # a k-clique's palettes are {0..k-1} and all vertices are pairwise
    # adjacent, so a proper coloring uses EXACTLY the k colors 0..k-1
    edges, n = two_cliques_edges(k=8)
    g = make_graph(spark, edges, n)
    colors = {r["id"]: r["color"] for r in graph_coloring(g).collect()}
    _assert_proper(edges, colors)
    assert {colors[v] for v in range(8)} == set(range(8))
    assert {colors[v] for v in range(8, 16)} == set(range(8))


def test_coloring_chain_and_star_palettes(spark):
    # chain: middle vertices have deg 2 → colors ≤ 2; star leaves have
    # deg 1 → colors ≤ 1 (the hub may draw anywhere in {0..deg})
    for edges, n in (chain_edges(64), star_hub_edges(65)):
        g = make_graph(spark, edges, n)
        colors = {r["id"]: r["color"] for r in graph_coloring(g).collect()}
        _assert_proper(edges, colors)
        deg = _degrees(edges, n)
        for v, c in colors.items():
            assert c <= deg[v]


def test_coloring_deterministic_and_isolated(spark):
    # bridge fixture twice → identical coloring (hash draws, no RNG);
    # vertex ids outside any edge get color 0 (palette {0})
    edges, n = bridge_edges(k=4)
    g = make_graph(spark, edges, n + 3)  # 3 isolated vertices appended
    a = sorted((r["id"], r["color"]) for r in graph_coloring(g, seed=7).collect())
    b = sorted((r["id"], r["color"]) for r in graph_coloring(g, seed=7).collect())
    assert a == b
    colors = dict(a)
    for v in (n, n + 1, n + 2):
        assert colors[v] == 0
