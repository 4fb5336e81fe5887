"""Densest subgraph — planted-clique recovery + peel invariants."""

from __future__ import annotations

import numpy as np

from linkgraph.operators import densest_subgraph
from tests.conftest import chain_edges, make_graph, two_cliques_edges, zipf_edges


def test_densest_recovers_planted_clique(spark):
    # chain (density ~1) + K10 clique (density 4.5): the peel's first
    # round drops the whole chain, the clique is the best level, and the
    # level after it is empty — exact 4.5, not just 2(1+ε)-approximate
    chain, n_chain = chain_edges(40)
    k = 10
    clique = np.array(
        [[100 + i, 100 + j] for i in range(k) for j in range(k) if i != j],
        dtype=np.int64,
    )
    edges = np.vstack([chain, clique])
    g = make_graph(spark, edges, 110)
    out = densest_subgraph(g).collect()
    assert {r["id"] for r in out} == {100 + i for i in range(k)}
    assert all(abs(r["density"] - 4.5) < 1e-9 for r in out)


def test_densest_uniform_graph_is_whole_graph(spark):
    # a clique peels to empty in one round past level 0, so the best
    # level is the clique itself with density (k-1)/2 per vertex
    edges, n = two_cliques_edges(k=8)
    g = make_graph(spark, edges, n)
    out = densest_subgraph(g).collect()
    assert len(out) == n
    assert all(abs(r["density"] - 3.5) < 1e-9 for r in out)


def test_densest_density_beats_half_optimum(spark):
    # Charikar guarantee: returned density ≥ ρ* / (2(1+ε)); the max
    # average degree of any subgraph is ≥ m/n (the whole graph), so
    # check against that lower bound of ρ*
    edges, n = zipf_edges(n=300, m=2400)
    g = make_graph(spark, edges, n)
    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    rho_whole = len(simple) / n
    out = densest_subgraph(g, eps_num=1, eps_den=10).collect()
    assert out, "nonempty graph must yield a nonempty densest level"
    got = out[0]["density"]
    assert got >= rho_whole / 2.2 - 1e-9
    # all rows carry the same level density
    assert len({r["density"] for r in out}) == 1
