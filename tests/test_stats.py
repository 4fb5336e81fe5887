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


def test_modularity_two_planted_cliques(spark):
    # two disjoint 4-cliques, labels = component: closed-form
    # Q = 1 - sum((d_c/2m)^2) = 1 - 2*(1/2)^2 = 0.5
    from linkgraph.operators import modularity

    cliq = lambda off: [[off + i, off + j] for i in range(4) for j in range(4) if i < j]
    edges = np.array(cliq(0) + cliq(4))
    g = make_graph(spark, edges, 8)
    labels = spark.createDataFrame(
        [(i, i // 4) for i in range(8)], "id long, label long"
    )
    got = modularity(g, labels).collect()[0]["modularity"]
    assert got == pytest.approx(0.5)
    g.unpersist()


def test_modularity_single_community_is_zero(spark):
    # everything in one community: intra/m = 1, (2m/2m)^2 = 1 → Q = 0
    from linkgraph.operators import modularity

    edges, n = chain_edges(10)
    g = make_graph(spark, edges, n)
    labels = spark.createDataFrame([(i, 0) for i in range(n)], "id long, label long")
    assert modularity(g, labels).collect()[0]["modularity"] == 0.0
    g.unpersist()


def test_modularity_random_labels_vs_numpy(spark):
    # arbitrary labeling on an arbitrary graph vs a direct numpy evaluation
    from linkgraph.operators import modularity

    rng = np.random.default_rng(11)
    raw = rng.integers(0, 30, size=(200, 2))
    g = make_graph(spark, raw, 30)
    lab = rng.integers(0, 4, size=30)
    labels = spark.createDataFrame(
        [(i, int(lab[i])) for i in range(30)], "id long, label long"
    )
    # canonical undirected simple edges
    canon = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    m = len(canon)
    intra = sum(1 for a, b in canon if lab[a] == lab[b])
    deg = np.zeros(30)
    for a, b in canon:
        deg[a] += 1
        deg[b] += 1
    dsum = np.array([deg[lab == c].sum() for c in range(4)])
    want = intra / m - float((dsum**2).sum()) / (4 * m * m)
    got = modularity(g, labels).collect()[0]["modularity"]
    assert got == pytest.approx(round(want, 6), abs=1e-6)
    g.unpersist()


def test_conductance_two_cliques_bridge(spark):
    """Closed form on bridge(k=8): two 8-cliques joined by one edge.
    Perfect partition: each community's cut = 1 (the bridge), vol =
    8·7 + 1 = 57, m = 57, 2m − vol = 57 → φ = 1/57 for both."""
    import numpy as np

    from linkgraph.operators import conductance
    from tests.conftest import bridge_edges, make_graph

    edges, n = bridge_edges(8)
    g = make_graph(spark, edges, n)
    labels = spark.createDataFrame(
        [(i, 0 if i < 8 else 1) for i in range(n)], "id long, label long"
    )
    got = {
        r["label"]: (r["vol"], r["cut"], r["conductance"])
        for r in conductance(g, labels).collect()
    }
    assert got == {0: (57, 1, round(1 / 57, 6)), 1: (57, 1, round(1 / 57, 6))}
    g.unpersist()


def test_conductance_isolated_community_is_zero(spark):
    from linkgraph.operators import conductance
    from tests.conftest import make_graph
    import numpy as np

    edges = np.array([[0, 1], [1, 2]])
    g = make_graph(spark, edges, 4)  # vertex 3 isolated
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 9)], "id long, label long"
    )
    got = {
        r["label"]: (r["vol"], r["cut"], r["conductance"])
        for r in conductance(g, labels).collect()
    }
    assert got[9] == (0, 0, 0.0)   # isolated: denom 0 → φ = 0
    assert got[0] == (4, 0, 0.0)   # whole graph in one community: no cut
    g.unpersist()


def test_diameter_lower_bound_path_graph(spark):
    # path 0-1-2-3-4 entered as directed edges one way: the symmetrized
    # sweep must still find ecc(0)=4, far=4, and the second sweep from 4
    # recovers the exact diameter 4
    import numpy as np

    from linkgraph.operators import diameter_lower_bound
    from tests.conftest import make_graph

    g = make_graph(spark, np.array([(i, i + 1) for i in range(4)]), 5)
    row = diameter_lower_bound(g, root=0).collect()[0]
    assert (row["root_id"], row["ecc_root"], row["far_id"]) == (0, 4, 4)
    assert (row["far2_id"], row["diameter_lb"]) == (0, 4)
    g.unpersist()


def test_diameter_lower_bound_star_from_center(spark):
    # star centered at 0: ecc(0)=1, but the double sweep from any leaf
    # finds the true diameter 2
    import numpy as np

    from linkgraph.operators import diameter_lower_bound
    from tests.conftest import make_graph

    g = make_graph(spark, np.array([(0, i) for i in range(1, 6)]), 6)
    row = diameter_lower_bound(g, root=0).collect()[0]
    assert row["ecc_root"] == 1
    assert row["far_id"] == 1  # (dist DESC, id ASC) argmax among leaves
    assert row["diameter_lb"] == 2
    g.unpersist()


def test_eccentricity_planted(spark):
    # directed path 0->1->2->3: ecc(0)=3, ecc(1)=2, ecc(2)=1, ecc(3)=0
    # (no out-edges — only the self pair); horizon cap clamps ecc(0) to 2
    import numpy as np

    from linkgraph.operators.anf import eccentricity
    from tests.conftest import make_graph

    g = make_graph(spark, np.array([(0, 1), (1, 2), (2, 3)]), 4)
    got = {r["id"]: r["ecc"] for r in eccentricity(g, max_h=8).collect()}
    assert got == {0: 3, 1: 2, 2: 1, 3: 0}
    capped = {r["id"]: r["ecc"] for r in eccentricity(g, max_h=2).collect()}
    assert capped == {0: 2, 1: 2, 2: 1, 3: 0}
    g.unpersist()


def test_community_graph_two_cliques_bridge(spark):
    # two 4-cliques + one bridge, labels = clique id → meta-graph has two
    # intra rows (6 edges each) and one cross row (the bridge)
    from linkgraph.operators import community_graph

    cliq = lambda off: [[off + i, off + j] for i in range(4) for j in range(4) if i < j]
    edges = np.array(cliq(0) + cliq(4) + [[0, 4]])
    g = make_graph(spark, edges, 8)
    labels = spark.createDataFrame(
        [(i, i // 4) for i in range(8)], "id long, label long"
    )
    got = {
        (r["c_a"], r["c_b"]): r["n_edges"]
        for r in community_graph(g, labels).collect()
    }
    assert got == {(0, 0): 6, (1, 1): 6, (0, 1): 1}
    g.unpersist()


def test_community_graph_ignores_multi_edges_and_direction(spark):
    # duplicate + reversed edges collapse in the canonical simple view
    from linkgraph.operators import community_graph

    edges = np.array([[0, 1], [1, 0], [0, 1], [1, 2]])
    g = make_graph(spark, edges, 3)
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20)], "id long, label long"
    )
    got = {
        (r["c_a"], r["c_b"]): r["n_edges"]
        for r in community_graph(g, labels).collect()
    }
    assert got == {(10, 10): 1, (10, 20): 1}
    g.unpersist()


def test_rich_club_clique_plus_leaves(spark):
    # 4-clique (deg >= 3) with 2 extra leaves hanging off vertex 0:
    # k=2 rich set = the clique (deg 3,3,3,5) → phi = 6/C(4,2) = 1.0
    from linkgraph.operators import rich_club

    cliq = [[i, j] for i in range(4) for j in range(4) if i < j]
    edges = np.array(cliq + [[0, 4], [0, 5]])
    g = make_graph(spark, edges, 6)
    row = rich_club(g, k=2).collect()[0]
    assert (row["k"], row["n_rich"], row["rich_club"]) == (2, 4, 1.0)
    # k above the max degree → empty rich set → 0.0 by convention
    row = rich_club(g, k=10).collect()[0]
    assert (row["n_rich"], row["rich_club"]) == (0, 0.0)
    g.unpersist()


def test_rich_club_matches_numpy(spark):
    from linkgraph.operators import rich_club
    from tests.conftest import zipf_edges

    edges, n = zipf_edges(n=200, m=1200, seed=7)
    g = make_graph(spark, edges, n)
    # numpy rebuild on the canonical simple view
    e = edges[edges[:, 0] != edges[:, 1]]
    canon = np.unique(np.sort(e, axis=1), axis=0)
    deg = np.bincount(canon.ravel(), minlength=n)
    for k in (2, 8, 32):
        rich = deg > k
        nr = int(rich.sum())
        ek = int((rich[canon[:, 0]] & rich[canon[:, 1]]).sum())
        want = round(2.0 * ek / (nr * (nr - 1.0)), 6) if nr >= 2 else 0.0
        row = rich_club(g, k=k).collect()[0]
        assert row["n_rich"] == nr
        assert row["rich_club"] == pytest.approx(want, abs=1e-9)
    g.unpersist()


def test_degree_powerlaw_matches_numpy_mle(spark):
    import numpy as np

    from linkgraph.operators import degree_powerlaw
    from tests.conftest import make_graph, zipf_edges

    edges, n = zipf_edges(n=400, m=3000)
    g = make_graph(spark, edges, n)
    row = degree_powerlaw(g, d_min=3).collect()[0]
    # distinct-neighbor undirected degree
    nb = {}
    for s, d in edges:
        if s == d:
            continue
        a, b = sorted((int(s), int(d)))
        nb.setdefault(a, set()).add(b)
        nb.setdefault(b, set()).add(a)
    degs = np.array([len(v) for v in nb.values()])
    tail = degs[degs >= 3]
    alpha = 1.0 + len(tail) / np.log(tail / 2.5).sum()
    assert row["alpha"] == pytest.approx(alpha, abs=1e-6)
    assert row["n_tail"] == len(tail)
    assert row["d_max"] == tail.max()
    assert row["d_min"] == 3
    g.unpersist()
