"""Katz centrality vs a dense NumPy twin of the truncated recurrence."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import katz
from tests.conftest import chain_edges, make_graph, zipf_edges


def _katz_numpy(
    edges: np.ndarray, n: int, iterations: int, alpha: float, beta: float
) -> np.ndarray:
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1.0
    x = np.full(n, beta)
    for _ in range(iterations):
        x = beta + alpha * (A.T @ x)
    return x


def test_katz_matches_numpy_recurrence(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["katz"] for r in katz(g, iterations=8, alpha=0.01).collect()}
    want = _katz_numpy(edges, n, iterations=8, alpha=0.01, beta=1.0)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    g.unpersist()


def test_katz_chain_closed_form(spark):
    # 0→1→2→3: x(v) after k≥depth rounds = Σ_{j≤depth(v)} α^j
    edges, n = chain_edges(4)
    g = make_graph(spark, edges, n)
    a = 0.5
    got = {r["id"]: r["katz"] for r in katz(g, iterations=8, alpha=a).collect()}
    for v in range(n):
        assert got[v] == pytest.approx(sum(a**j for j in range(v + 1)), abs=1e-12)
    g.unpersist()


def test_katz_zero_iterations_is_beta(spark):
    edges, n = chain_edges(3)
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["katz"] for r in katz(g, iterations=0, beta=2.5).collect()}
    assert got == {0: 2.5, 1: 2.5, 2: 2.5}
    g.unpersist()
