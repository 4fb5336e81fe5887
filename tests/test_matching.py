"""Maximal matching — structural invariants + greedy replication."""

from __future__ import annotations

import hashlib

import numpy as np

from linkgraph.operators import maximal_matching
from tests.conftest import chain_edges, make_graph, star_hub_edges, zipf_edges


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _greedy_matching_py(
    edges: np.ndarray, seed: int
) -> set[tuple[int, int]]:
    canon = sorted(
        {(min(int(a), int(b)), max(int(a), int(b))) for a, b in edges if a != b},
        key=lambda e: (_md5_60(f"match:{seed}:{e[0]}:{e[1]}"), e),
    )
    used: set[int] = set()
    out: set[tuple[int, int]] = set()
    for a, b in canon:
        if a not in used and b not in used:
            out.add((a, b))
            used |= {a, b}
    return out


def test_matching_matches_sequential_greedy(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]) for r in maximal_matching(g).collect()}
    assert got == _greedy_matching_py(edges, seed=42)
    g.unpersist()


def test_matching_vertex_disjoint_and_maximal(spark):
    edges, n = zipf_edges(n=150, m=900)
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]) for r in maximal_matching(g, seed=9).collect()}
    used: list[int] = [v for e in got for v in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    canon = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in edges if a != b}
    us = set(used)
    for a, b in canon - got:  # maximal: every unmatched edge is blocked
        assert a in us or b in us, (a, b)
    g.unpersist()


def test_matching_star_picks_one_edge(spark):
    edges, n = star_hub_edges(17)
    g = make_graph(spark, edges, n)
    got = maximal_matching(g).collect()
    assert len(got) == 1  # every star edge shares the hub
    g.unpersist()


def test_matching_triangle_free_chain(spark):
    edges, n = chain_edges(6)  # path 0-1-2-3-4-5
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]) for r in maximal_matching(g).collect()}
    assert got == _greedy_matching_py(edges, seed=42)
    assert 2 <= len(got) <= 3
    g.unpersist()


def _greedy_weight_matching_py(edges: np.ndarray) -> set[tuple[int, int, int]]:
    canon = sorted(
        {(min(int(a), int(b)), max(int(a), int(b))) for a, b in edges if a != b},
        key=lambda e: (
            ((18 - (e[0] % 10 + e[1] % 10)) << 56)
            + (_md5_60(f"wmatch:{e[0]}:{e[1]}") >> 4),
            e,
        ),
    )
    used: set[int] = set()
    out: set[tuple[int, int, int]] = set()
    for a, b in canon:
        if a not in used and b not in used:
            out.add((a, b, a % 10 + b % 10))
            used |= {a, b}
    return out


def test_weight_matching_matches_sequential_greedy(spark):
    from linkgraph.operators import maximal_weight_matching

    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    got = {
        (r["a"], r["b"], r["weight"])
        for r in maximal_weight_matching(g).collect()
    }
    assert got == _greedy_weight_matching_py(edges)
    g.unpersist()


def test_weight_matching_vertex_disjoint_and_maximal(spark):
    from linkgraph.operators import maximal_weight_matching

    edges, n = zipf_edges(n=150, m=900)
    g = make_graph(spark, edges, n)
    got = {(r["a"], r["b"]) for r in maximal_weight_matching(g).collect()}
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    canon = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in edges if a != b}
    us = set(used)
    for a, b in canon - got:
        assert a in us or b in us, (a, b)
    g.unpersist()
