"""PageRank vs the NumPy oracle of the exact C recurrence (allclose 1e-6)."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import pagerank
from linkgraph.oracles import pagerank_oracle

from tests.conftest import SMALL_FIXTURES, make_graph


def _ranks_array(df, n):
    out = np.zeros(n)
    for row in df.collect():
        out[row["id"]] = row["rank"]
    return out


@pytest.mark.parametrize("name", sorted(SMALL_FIXTURES))
def test_pagerank_parity_10_iters(spark, name):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    got = _ranks_array(pagerank(g, iterations=10), n)
    want = pagerank_oracle(edges, n, iterations=10)
    assert np.allclose(got, want, atol=1e-6), name
    g.unpersist()


@pytest.mark.parametrize("unroll", [1, 4])
def test_pagerank_convergence_mode(spark, unroll):
    edges, n = SMALL_FIXTURES["bridge"]()
    g = make_graph(spark, edges, n)
    got = _ranks_array(pagerank(g, tol=1e-6, max_iterations=200, unroll=unroll), n)
    want = pagerank_oracle(edges, n, tol=1e-6, max_iterations=200, check_every=unroll)
    assert np.allclose(got, want, atol=1e-6)
    g.unpersist()


def test_pagerank_dangling_semantics(spark):
    """Dangling vertices contribute nothing (no redistribution) — star hub:
    vertex 0 has no out-edges; its mass vanishes, exactly as in the C code."""
    from tests.conftest import star_hub_edges

    edges, n = star_hub_edges(17)
    g = make_graph(spark, edges, n)
    got = _ranks_array(pagerank(g, iterations=10), n)
    want = pagerank_oracle(edges, n, iterations=10)
    assert np.allclose(got, want, atol=1e-12)
    # leaves receive only the teleport constant after iteration 1
    assert np.allclose(got[1:], (1 - 0.85) / n, atol=1e-12)
    g.unpersist()
