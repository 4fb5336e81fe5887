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


def test_personalized_pagerank_parity_numpy(spark):
    """PPR vs a NumPy oracle of the same recurrence: base = 0.15/|S| on the
    source set, init = base, no dangling redistribution."""
    from linkgraph.operators import personalized_pagerank

    edges, n = SMALL_FIXTURES["two_cliques"]()
    g = make_graph(spark, edges, n)
    sources = [0, 1]
    got = _ranks_array(personalized_pagerank(g, sources, iterations=10), n)

    base = np.zeros(n)
    base[sources] = 0.15 / len(sources)
    outdeg = np.bincount(edges[:, 0], minlength=n).astype(float)
    r = base.copy()
    for _ in range(10):
        contrib = np.zeros(n)
        w = np.where(outdeg[edges[:, 0]] > 0, r[edges[:, 0]] / outdeg[edges[:, 0]], 0.0)
        np.add.at(contrib, edges[:, 1], w)
        r = base + 0.85 * contrib
    assert np.allclose(got, r, atol=1e-9)
    # mass is zero outside the sources' reachable set
    assert got[sources[0]] > 0
    g.unpersist()


def test_personalized_pagerank_unreachable_mass_zero(spark):
    """On a chain, PPR from the LAST vertex gives zero to everything the
    source cannot reach (all predecessors)."""
    from linkgraph.operators import personalized_pagerank
    from tests.conftest import chain_edges

    edges, n = chain_edges(16)
    g = make_graph(spark, edges, n)
    got = _ranks_array(personalized_pagerank(g, [n - 1], iterations=10), n)
    assert got[n - 1] == pytest.approx(0.15)
    assert np.all(got[: n - 1] == 0.0)
    g.unpersist()


def test_weighted_pagerank_matches_numpy(spark):
    """Weighted parity recurrence vs a NumPy twin on a graph with zero
    weights, a W(u)=0 vertex, multi-edges, and a dangling vertex."""
    import numpy as np

    from linkgraph.graph import Graph
    from linkgraph.operators.pagerank import weighted_pagerank

    rows = [
        (0, 1, 3.0), (0, 2, 1.0),
        (1, 2, 2.0), (1, 2, 2.0),      # multi-edge: both contribute
        (2, 0, 0.0), (2, 3, 0.0),      # W(2) = 0 -> no outflow at all
        (3, 0, 5.0),
        # vertex 4 dangling (no out-edges)
        (0, 4, 1.0),
    ]
    n = 5
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = Graph.from_edges(spark, df, num_vertices=n, num_partitions=4)

    pr = np.full(n, 0.15)
    W = np.zeros(n)
    for s, d, w in rows:
        W[s] += w
    for _ in range(10):
        mass = np.zeros(n)
        for s, d, w in rows:
            if W[s] > 0:
                mass[d] += pr[s] * (w / W[s])
        pr = (1 - 0.85) / n + 0.85 * mass
    got = {r["id"]: r["rank"] for r in weighted_pagerank(g, iterations=10).collect()}
    for i in range(n):
        assert got[i] == pytest.approx(pr[i], rel=1e-12), i
    g.unpersist()


def test_weighted_pagerank_uniform_weights_equal_unweighted(spark):
    """w ≡ const must reproduce the unweighted parity kernel exactly."""
    import numpy as np

    from linkgraph.graph import Graph
    from linkgraph.operators.pagerank import weighted_pagerank

    e = [(i % 12, (i * 5 + 2) % 12) for i in range(40)]
    df = spark.createDataFrame(
        [(s, d, 2.5) for s, d in e], "src long, dst long, weight double"
    )
    g = Graph.from_edges(spark, df, num_vertices=12, num_partitions=4)
    gu = Graph.from_edges(
        spark,
        spark.createDataFrame(e, "src long, dst long"),
        num_vertices=12,
        num_partitions=4,
    )
    got_w = {r["id"]: r["rank"] for r in weighted_pagerank(g, iterations=10).collect()}
    got_u = {r["id"]: r["rank"] for r in pagerank(gu, iterations=10).collect()}
    for i in range(12):
        assert got_w[i] == pytest.approx(got_u[i], rel=1e-12)
    g.unpersist()
    gu.unpersist()


def test_spam_mass_separates_farm_from_trust_neighborhood(spark):
    """Planted spam farm: a 3-clique (5,6,7) linking only to itself holds
    rank unreachable from the trusted seed, so its relative spam mass ~1;
    the trusted seed's own neighborhood scores far lower."""
    from linkgraph.operators.pagerank import spam_mass

    # trusted hub 0 -> 1,2; 1,2 -> 0 (good core). farm: 5<->6<->7<->5.
    # 4 bridges good-core rank outward but gets none from the farm.
    edges = np.array(
        [(0, 1), (0, 2), (1, 0), (2, 0), (0, 4), (4, 3),
         (5, 6), (6, 7), (7, 5)],
        dtype=np.int64,
    )
    g = make_graph(spark, edges, 8)
    rows = {r["id"]: r for r in spam_mass(g, trusted=[0], iterations=20).collect()}
    assert set(rows) == set(range(8))
    for v in (5, 6, 7):  # no trust flows into the farm
        assert rows[v]["trust"] == 0.0
        assert rows[v]["spam_mass"] == pytest.approx(1.0)
    # vertices fed by the seed keep most of their rank trusted
    assert rows[1]["spam_mass"] < 0.35
    assert rows[4]["spam_mass"] < 0.35
    # the seed itself holds concentrated teleport: negative mass, kept
    assert rows[0]["spam_mass"] < 0.0
    g.unpersist()


def test_pagerank_warm_start_converges_faster_after_delta(spark):
    from tests.conftest import zipf_edges

    edges, n = zipf_edges(n=200, m=1500, seed=3)
    g = make_graph(spark, edges, n)
    cold_info: dict = {}
    base = pagerank(g, tol=1e-6, max_iterations=200, info=cold_info)
    base_rows = base.collect()
    g.unpersist()

    # delta graph: 1% extra edges appended deterministically
    extra = np.array(
        [[(7 * i) % n, (11 * i + 3) % n] for i in range(15)], dtype=np.int64
    )
    edges2 = np.vstack([edges, extra])
    g2 = make_graph(spark, edges2, n)
    warm_info: dict = {}
    warm = pagerank(
        g2,
        tol=1e-6,
        max_iterations=200,
        info=warm_info,
        init_state=spark.createDataFrame(base_rows),
    )
    cold2_info: dict = {}
    cold2 = pagerank(g2, tol=1e-6, max_iterations=200, info=cold2_info)
    # same fixpoint (init-independent), 2x tol for the two convergence paths
    got_w, got_c = _ranks_array(warm, n), _ranks_array(cold2, n)
    assert np.allclose(got_w, got_c, atol=2e-6)
    # the operational payoff: warm start needs strictly fewer rounds
    assert warm_info["iterations"] < cold2_info["iterations"], (
        warm_info,
        cold2_info,
    )
    g2.unpersist()


def test_pagerank_warm_start_new_vertices_get_init_rank(spark):
    # init_state covers only vertex 0; missing rows must start at
    # init_rank, and a stale row for a vertex outside the graph drops
    edges = np.array([[0, 1], [1, 0]])
    g = make_graph(spark, edges, 2)
    init = spark.createDataFrame(
        [(0, 0.5), (99, 9.9)], "id long, rank double"
    )
    one = pagerank(g, iterations=1, init_state=init).collect()
    got = {r["id"]: r["rank"] for r in one}
    assert set(got) == {0, 1}
    # after 1 round from (0.5, 0.15): rank(1) = 0.15/2*... teleport (1-d)/n
    # = 0.075 + 0.85*0.5 = 0.5 (deg(0)=1); rank(0) = 0.075 + 0.85*0.15
    assert got[1] == pytest.approx(0.075 + 0.85 * 0.5)
    assert got[0] == pytest.approx(0.075 + 0.85 * 0.15)
    g.unpersist()
