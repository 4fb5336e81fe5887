"""Triangle counting: exact vs brute-force oracle, both orientations."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import triangle_count, triangles_per_vertex
from linkgraph.oracles import triangle_count_oracle, triangles_per_vertex_oracle

from tests.conftest import SMALL_FIXTURES, make_graph


@pytest.mark.parametrize("name", sorted(SMALL_FIXTURES))
@pytest.mark.parametrize("degree_oriented", [True, False])
def test_triangle_count_exact(spark, name, degree_oriented):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    got = triangle_count(g, degree_oriented=degree_oriented).collect()[0]["triangles"]
    want = triangle_count_oracle(edges, n)
    assert got == want, name
    g.unpersist()


def test_two_cliques_closed_form(spark):
    """K8 has C(8,3)=56 triangles; two disjoint cliques → 112."""
    from tests.conftest import two_cliques_edges

    edges, n = two_cliques_edges()
    g = make_graph(spark, edges, n)
    assert triangle_count(g).collect()[0]["triangles"] == 112
    g.unpersist()


def test_triangles_per_vertex(spark):
    from tests.conftest import bridge_edges

    edges, n = bridge_edges()
    g = make_graph(spark, edges, n)
    got = np.zeros(n, dtype=np.int64)
    for row in triangles_per_vertex(g).collect():
        got[row["id"]] = row["triangles"]
    want = triangles_per_vertex_oracle(edges, n)
    assert np.array_equal(got, want)
    g.unpersist()
