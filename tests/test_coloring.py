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


def _assert_proper(edges: np.ndarray, colors: dict[int, int]) -> None:
    for a, b in edges:
        if a != b:
            assert colors[int(a)] != colors[int(b)], f"edge ({a},{b}) monochromatic"


def _max_degree(edges: np.ndarray, n: int) -> int:
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    return max((len(s) for s in adj.values()), default=0)


def test_coloring_proper_on_zipf(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    out = graph_coloring(g, seed=42).collect()
    colors = {r["id"]: r["color"] for r in out}
    assert len(colors) == n  # every vertex colored exactly once
    _assert_proper(edges, colors)
    # greedy/speculative bound: at most Δ+1 colors, densely numbered from 0
    used = sorted(set(colors.values()))
    assert used[0] == 0
    assert len(used) <= _max_degree(edges, n) + 1
    assert used == list(range(len(used)))  # mex keeps the palette dense


def test_coloring_clique_uses_k_colors(spark):
    # a k-clique needs exactly k colors — the tight case for the Δ+1 bound
    edges, n = two_cliques_edges(k=8)
    g = make_graph(spark, edges, n)
    colors = {r["id"]: r["color"] for r in graph_coloring(g).collect()}
    _assert_proper(edges, colors)
    assert len({colors[v] for v in range(8)}) == 8
    assert len({colors[v] for v in range(8, 16)}) == 8


def test_coloring_bipartite_structures(spark):
    # chain and star are bipartite: speculative coloring stays ≤ small
    # palettes (2 is optimal; conflict retries may add a shade, never Δ)
    for edges, n in (chain_edges(64), star_hub_edges(65)):
        g = make_graph(spark, edges, n)
        colors = {r["id"]: r["color"] for r in graph_coloring(g).collect()}
        _assert_proper(edges, colors)
        assert max(colors.values()) <= 2


def test_coloring_deterministic_and_isolated(spark):
    # bridge fixture twice → identical palette (hash priorities, no RNG);
    # vertex ids outside any edge get color 0
    edges, n = bridge_edges(k=4)
    g = make_graph(spark, edges, n + 3)  # 3 isolated vertices appended
    a = sorted((r["id"], r["color"]) for r in graph_coloring(g, seed=7).collect())
    b = sorted((r["id"], r["color"]) for r in graph_coloring(g, seed=7).collect())
    assert a == b
    colors = dict(a)
    for v in (n, n + 1, n + 2):
        assert colors[v] == 0
