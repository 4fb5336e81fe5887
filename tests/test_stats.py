"""Whole-graph statistics vs closed-form values on planted fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import degree_assortativity, reciprocity
from tests.conftest import chain_edges, make_graph, star_hub_edges


def test_reciprocity_closed_form(spark):
    # 3-cycle (no reciprocal pairs) + one mutual pair → 2 of 5 edges mutual
    edges = np.array([[0, 1], [1, 2], [2, 0], [3, 4], [4, 3]])
    g = make_graph(spark, edges, 5)
    got = reciprocity(g).collect()[0]["reciprocity"]
    assert got == pytest.approx(2 / 5)
    g.unpersist()


def test_reciprocity_chain_is_zero_and_symmetric_is_one(spark):
    edges, n = chain_edges(8)
    g = make_graph(spark, edges, n)
    assert reciprocity(g).collect()[0]["reciprocity"] == 0.0
    g.unpersist()
    sym = np.vstack([edges, edges[:, ::-1]])
    g2 = make_graph(spark, sym, n)
    assert reciprocity(g2).collect()[0]["reciprocity"] == 1.0
    g2.unpersist()


def test_assortativity_matches_numpy_corr(spark):
    edges, n = star_hub_edges(17)  # leaves → hub: src out-deg constant 1
    # add a few hub→leaf edges so sdeg varies and corr is defined
    extra = np.array([[0, 1], [0, 2], [0, 3]])
    edges = np.vstack([edges, extra])
    g = make_graph(spark, edges, n)
    got = degree_assortativity(g).collect()[0]["assortativity"]
    outd = np.bincount(edges[:, 0], minlength=n)
    ind = np.bincount(edges[:, 1], minlength=n)
    want = np.corrcoef(outd[edges[:, 0]], ind[edges[:, 1]])[0, 1]
    assert got == pytest.approx(round(float(want), 6), abs=1e-6)
    g.unpersist()
