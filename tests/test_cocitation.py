"""Round-5 link-analysis extensions vs NumPy / closed-form oracles:
SALSA (stochastic HITS) and co-citation / bibliographic coupling."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import (
    bibliographic_coupling,
    cocitation,
    eigenvector_centrality,
    salsa,
)
from tests.conftest import make_graph, zipf_edges


def _salsa_numpy(edges: np.ndarray, n: int, iterations: int = 5):
    """Dense twin of operators/hits.py::salsa — per-EDGE-ROW degree
    weights (multi-edges weighted by row multiplicity, like the engine's
    count(*) degrees), L1 norm after each half-step."""
    od = np.zeros(n)
    idg = np.zeros(n)
    for s, d in edges:
        od[s] += 1.0
        idg[d] += 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iterations):
        a = np.zeros(n)
        for s, d in edges:
            a[d] += h[s] / od[s]
        a = a / np.abs(a).sum()
        h = np.zeros(n)
        for s, d in edges:
            h[s] += a[d] / idg[d]
        h = h / np.abs(h).sum()
    return a, h


def test_salsa_matches_numpy_power_iteration(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    got = {r["id"]: (r["auth"], r["hub"]) for r in salsa(g, iterations=5).collect()}
    a, h = _salsa_numpy(edges, n)
    for v in range(n):
        assert got[v][0] == pytest.approx(a[v], abs=1e-9)
        assert got[v][1] == pytest.approx(h[v], abs=1e-9)
    g.unpersist()


def test_salsa_star_is_uniform_random_walk(spark):
    # leaves 1..8 all point at 0: SALSA's stochastic normalization gives
    # the stationary split auth(0)=1, hub(leaf)=1/8 from round 1 on —
    # unlike HITS there is no mass concentration beyond the walk's
    # stationary distribution (Lempel & Moran's point).
    edges = np.array([[i, 0] for i in range(1, 9)])
    g = make_graph(spark, edges, 9)
    got = {r["id"]: r for r in salsa(g, iterations=3).collect()}
    assert got[0]["auth"] == pytest.approx(1.0)
    assert got[0]["hub"] == pytest.approx(0.0)
    for leaf in range(1, 9):
        assert got[leaf]["auth"] == pytest.approx(0.0)
        assert got[leaf]["hub"] == pytest.approx(1.0 / 8.0)
    g.unpersist()


def test_eigenvector_matches_numpy_power_iteration(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["eig"] for r in eigenvector_centrality(g, iterations=10).collect()}
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1.0
    x = np.ones(n)
    for _ in range(10):
        x = A.T @ x
        x = x / np.linalg.norm(x)
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-9)
    g.unpersist()


def test_cocitation_counts_common_in_neighbors(spark):
    # w1→{a,b}, w2→{a,b}, w3→{a}: cocitation(a,b) = |{w1,w2}| = 2
    a, b, w1, w2, w3 = 0, 1, 2, 3, 4
    edges = np.array([[w1, a], [w1, b], [w2, a], [w2, b], [w3, a]])
    g = make_graph(spark, edges, 5)
    rows = cocitation(g, top_k=10, max_center_degree=None).collect()
    assert [(r["a"], r["b"], r["c"]) for r in rows] == [(a, b, 2)]
    g.unpersist()


def test_coupling_counts_common_out_neighbors(spark):
    # same fixture transposed through the operator: (w1,w2) share {a,b},
    # (w1,w3)/(w2,w3) share {a}
    a, b, w1, w2, w3 = 0, 1, 2, 3, 4
    edges = np.array([[w1, a], [w1, b], [w2, a], [w2, b], [w3, a]])
    g = make_graph(spark, edges, 5)
    rows = bibliographic_coupling(g, top_k=10, max_center_degree=None).collect()
    assert [(r["a"], r["b"], r["c"]) for r in rows] == [
        (w1, w2, 2),
        (w1, w3, 1),
        (w2, w3, 1),
    ]
    g.unpersist()


def test_cocitation_dedupes_multi_edges_and_drops_self_loops(spark):
    # duplicate w1→a rows and a self-loop must not inflate counts
    a, b, w1 = 0, 1, 2
    edges = np.array([[w1, a], [w1, a], [w1, b], [a, a]])
    g = make_graph(spark, edges, 3)
    rows = cocitation(g, top_k=10, max_center_degree=None).collect()
    assert [(r["a"], r["b"], r["c"]) for r in rows] == [(a, b, 1)]
    g.unpersist()


def test_cocitation_auto_cap_bounds_hub_wedges(spark):
    # The DEFAULT must be scale-safe (same policy as linkpred): against a
    # background of 199 out-degree-1 centers, the 200-out-degree hub sits
    # above the p99 center degree (1, floored to 64), so its C(200,2)
    # co-citation wedges are dropped by default and kept only under the
    # explicit uncapped (oracle-parity) call.
    hub = [[0, i] for i in range(1, 201)]
    small = [[300 + i, 600 + i] for i in range(199)]  # disjoint dsts: no pairs
    edges = np.array(hub + small)
    g = make_graph(spark, edges, 800)
    assert cocitation(g, top_k=100).count() == 0
    assert cocitation(g, top_k=100, max_center_degree=None).count() == 100
    # coupling's centers are the DESTINATIONS (in-degree 1 each) — the
    # hub is never a center, so no pair shares an out-neighbor at all.
    assert bibliographic_coupling(g, top_k=100).count() == 0
    g.unpersist()
