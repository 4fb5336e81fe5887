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


def test_triangle_estimate_full_rate_is_exact(spark):
    import numpy as np

    from linkgraph.operators.triangles import (
        triangle_count,
        triangle_count_estimate,
    )
    from tests.conftest import make_graph

    e = [(i % 16, (i * 7 + 3) % 16) for i in range(80)]
    g = make_graph(spark, np.array(e), 16)
    exact = triangle_count(g).collect()[0]["triangles"]
    row = triangle_count_estimate(g, rate=1.0).collect()[0]
    assert row["sampled_triangles"] == exact
    assert row["estimate"] == float(exact)
    g.unpersist()


def test_triangle_estimate_matches_python_sample(spark):
    """The sampled count equals a pure-Python count over the SAME
    hashlib-selected canonical edges — the estimator is deterministic,
    not statistical, for a fixed (rate, seed)."""
    import hashlib
    import itertools

    import numpy as np

    from linkgraph.operators.triangles import triangle_count_estimate
    from tests.conftest import make_graph

    e = [(i % 20, (i * 9 + 4) % 20) for i in range(120)]
    n, rate, seed = 20, 0.5, 7
    g = make_graph(spark, np.array(e), n)
    row = triangle_count_estimate(g, rate=rate, seed=seed).collect()[0]

    thr = int(rate * float(1 << 60))
    canon = {(min(a, b), max(a, b)) for a, b in e if a != b}
    kept = {
        (a, b)
        for a, b in canon
        if int(hashlib.md5(f"tsamp:{seed}:{a}:{b}".encode()).hexdigest()[:15], 16)
        < thr
    }
    want = sum(
        1
        for x, y, z in itertools.combinations(range(n), 3)
        if {(x, y), (x, z), (y, z)} <= kept
    )
    assert row["sampled_triangles"] == want
    assert row["estimate"] == pytest.approx(want / rate**3, abs=1e-6)
    g.unpersist()


def test_edge_embeddedness_planted(spark):
    import numpy as np

    from linkgraph.operators.triangles import edge_embeddedness
    from tests.conftest import make_graph

    # K4 plus a pendant edge 3-4: every K4 edge has embeddedness 2,
    # the pendant has 0 (a local bridge)
    e = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 4)]
    g = make_graph(spark, np.array(e), 5)
    got = {(r["a"], r["b"]): r["embeddedness"] for r in edge_embeddedness(g).collect()}
    assert got[(3, 4)] == 0
    for a in range(4):
        for b in range(a + 1, 4):
            assert got[(a, b)] == 2, (a, b)
    assert len(got) == 7
    g.unpersist()


def test_four_clique_count_planted(spark):
    import numpy as np

    from linkgraph.operators import four_clique_count
    from tests.conftest import make_graph

    # K5 on {0..4}: C(5,4) = 5 four-cliques; a disjoint triangle {5,6,7}
    # and a pendant edge contribute none
    e = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(5, 6), (5, 7), (6, 7), (7, 8)]
    )
    g = make_graph(spark, np.array(e), 9)
    for oriented in (True, False):
        assert (
            four_clique_count(g, degree_oriented=oriented).collect()[0]["cliques4"]
            == 5
        )
    g.unpersist()


def test_four_clique_count_triangle_free(spark):
    import numpy as np

    from linkgraph.operators import four_clique_count
    from tests.conftest import make_graph

    # C4 (a 4-cycle) has no triangles, hence no 4-cliques
    g = make_graph(spark, np.array([(0, 1), (1, 2), (2, 3), (0, 3)]), 4)
    assert four_clique_count(g).collect()[0]["cliques4"] == 0
    g.unpersist()
