"""WCC: exact equality vs the fixpoint min-label oracle, plus the
reference's embedded validator invariants (wcc.c:138-182)."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import wcc
from linkgraph.operators.wcc import validate_wcc, wcc_large_small_star
from linkgraph.oracles import wcc_oracle

from tests.conftest import SMALL_FIXTURES, make_graph


def _comp_array(df, n):
    out = np.full(n, -1, dtype=np.int64)
    for row in df.collect():
        out[row["id"]] = row["comp"]
    return out


@pytest.mark.parametrize("name", sorted(SMALL_FIXTURES))
def test_wcc_exact(spark, name):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    got = _comp_array(wcc(g), n)
    want = wcc_oracle(edges, n)
    assert np.array_equal(got, want), name
    g.unpersist()


def test_wcc_validator_invariants(spark):
    from tests.conftest import two_cliques_edges

    edges, n = two_cliques_edges()
    g = make_graph(spark, edges, n)
    comp = wcc(g)
    stats = validate_wcc(g, comp)
    assert stats["violations"] == 0
    assert stats["n_components"] == 2
    assert stats["max_size"] == 8
    g.unpersist()


@pytest.mark.parametrize("name", ["chain", "bridge", "empty_vertex", "selfloop_multi"])
def test_wcc_large_small_star_matches(spark, name):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    got = _comp_array(wcc_large_small_star(g), n)
    want = wcc_oracle(edges, n)
    assert np.array_equal(got, want), name
    g.unpersist()
