"""Round-4 centrality/link-pred extensions vs closed-form + NumPy oracles:
HITS, local clustering coefficient, Adamic-Adar, seeded harmonic
centrality (multi-source BFS)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from linkgraph.operators import (
    adamic_adar,
    closeness_centrality,
    effective_diameter,
    harmonic_centrality,
    hits,
    local_clustering,
    multi_source_bfs,
    neighborhood_function,
    neighborhood_function_exact,
)
from tests.conftest import chain_edges, make_graph, two_cliques_edges, zipf_edges


def _hits_numpy(edges: np.ndarray, n: int, iterations: int = 5):
    """Dense twin of operators/hits.py: auth from previous hub, hub from
    the NEW auth, L2 norm after each half-step."""
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iterations):
        a = A.T @ h
        a = a / np.linalg.norm(a)
        h = A @ a
        h = h / np.linalg.norm(h)
    return a, h


def test_hits_matches_numpy_power_iteration(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    got = {r["id"]: (r["auth"], r["hub"]) for r in hits(g, iterations=5).collect()}
    a, h = _hits_numpy(edges, n)
    for v in range(n):
        assert got[v][0] == pytest.approx(a[v], abs=1e-9)
        assert got[v][1] == pytest.approx(h[v], abs=1e-9)
    g.unpersist()


def test_hits_star_separates_hubs_from_authorities(spark):
    # leaves 1..8 all point at 0: leaves are pure hubs, 0 the pure authority
    edges = np.array([[i, 0] for i in range(1, 9)])
    g = make_graph(spark, edges, 9)
    got = {r["id"]: r for r in hits(g, iterations=3).collect()}
    assert got[0]["auth"] == pytest.approx(1.0)
    assert got[0]["hub"] == pytest.approx(0.0)
    for leaf in range(1, 9):
        assert got[leaf]["auth"] == pytest.approx(0.0)
        assert got[leaf]["hub"] == pytest.approx(1 / math.sqrt(8), abs=1e-12)
    g.unpersist()


def test_local_clustering_cliques_and_chain(spark):
    edges, n = two_cliques_edges(5)  # two 5-cliques: every lcc = 1
    g = make_graph(spark, edges, n)
    for r in local_clustering(g).collect():
        assert r["lcc"] == pytest.approx(1.0)
    g.unpersist()
    edges, n = chain_edges(10)  # no triangles anywhere
    g = make_graph(spark, edges, n)
    assert all(r["lcc"] == 0.0 for r in local_clustering(g).collect())
    g.unpersist()


def test_local_clustering_triangle_with_pendant(spark):
    # triangle 0-1-2 plus pendant 2-3: deg(2)=3, tri(2)=1 → 2/(3·2) = 1/3
    edges = np.array([[0, 1], [1, 2], [2, 0], [2, 3]])
    g = make_graph(spark, edges, 4)
    got = {r["id"]: r["lcc"] for r in local_clustering(g).collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(round(1 / 3, 6))
    assert got[3] == 0.0
    g.unpersist()


def test_adamic_adar_star_closed_form(spark):
    # star: center 0, leaves 1..4 — every leaf pair shares exactly {0},
    # deg(0)=4 → aa = 1/ln(4); adjacent (leaf, center) pairs are excluded
    edges = np.array([[0, i] for i in range(1, 5)])
    g = make_graph(spark, edges, 5)
    rows = adamic_adar(g, top_k=50).collect()
    assert len(rows) == 6  # C(4,2) leaf pairs
    for r in rows:
        assert r["cn"] == 1
        assert r["aa"] == pytest.approx(round(1 / math.log(4), 6))
        assert 1 <= r["a"] < r["b"] <= 4
    g.unpersist()


def test_adamic_adar_triangle_has_no_candidates(spark):
    # in a triangle every co-neighbor pair is already adjacent
    edges = np.array([[0, 1], [1, 2], [2, 0]])
    g = make_graph(spark, edges, 3)
    assert adamic_adar(g, top_k=10).count() == 0
    g.unpersist()


def test_adamic_adar_center_degree_cap_drops_hub_wedges(spark):
    # hub 0 joins leaves 1..9; separate path 10-11-12 contributes one pair
    edges = np.array([[0, i] for i in range(1, 10)] + [[10, 11], [11, 12]])
    g = make_graph(spark, edges, 13)
    capped = adamic_adar(g, top_k=100, max_center_degree=2).collect()
    assert [(r["a"], r["b"]) for r in capped] == [(10, 12)]
    assert capped[0]["aa"] == pytest.approx(round(1 / math.log(2), 6))
    g.unpersist()


def test_linkpred_auto_cap_bounds_hub_wedges(spark):
    # The DEFAULT must be scale-safe (VERDICT r04 'What's wrong' #3): a
    # 200-leaf star has p99 center degree 1 → auto cap = max(64, 1) = 64,
    # so the degree-200 hub is excluded as a wedge center and the default
    # call emits ZERO of its C(200,2) ≈ 20k wedge pairs; the explicit
    # uncapped call still produces them (oracle-parity configuration).
    from linkgraph.operators import jaccard_pairs

    n = 201
    edges = np.array([[0, i] for i in range(1, n)])
    g = make_graph(spark, edges, n)
    assert adamic_adar(g, top_k=100).count() == 0
    assert jaccard_pairs(g, top_k=100).count() == 0
    uncapped = adamic_adar(g, top_k=100, max_center_degree=None)
    assert uncapped.count() == 100  # top_k slice of the 19900 leaf pairs
    g.unpersist()


def test_linkpred_auto_cap_keeps_small_graphs_exact(spark):
    # below the 64-degree floor the auto default equals uncapped
    from linkgraph.operators import jaccard_pairs
    from tests.conftest import zipf_edges

    edges, n = zipf_edges(n=60, m=200)
    g = make_graph(spark, edges, n)
    auto = {(r["a"], r["b"]) for r in jaccard_pairs(g, top_k=1000).collect()}
    unc = {
        (r["a"], r["b"])
        for r in jaccard_pairs(g, top_k=1000, max_center_degree=None).collect()
    }
    assert auto == unc and len(auto) > 0
    g.unpersist()


def _bfs_dists_numpy(edges: np.ndarray, n: int, source: int) -> np.ndarray:
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    dist = np.full(n, -1)
    dist[source] = 0
    frontier = [source]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_multi_source_bfs_matches_per_source_bfs(spark):
    edges, n = zipf_edges(n=300, m=1500)
    g = make_graph(spark, edges, n)
    sources = [0, 1, 2, 3]
    got = {
        (r["source"], r["id"]): r["dist"]
        for r in multi_source_bfs(g, sources).collect()
    }
    for s in sources:
        want = _bfs_dists_numpy(edges, n, s)
        reached = {v for v in range(n) if want[v] >= 0}
        assert {v for (src, v) in got if src == s} == reached
        for v in reached:
            assert got[(s, v)] == want[v]
    g.unpersist()


def test_harmonic_chain_closed_form(spark):
    edges, n = chain_edges(8)  # 0→1→…→7
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(g, [0, 1]).collect()}
    for v in range(n):
        want = 0.0
        if v > 0:
            want += 1 / v  # from source 0
        if v > 1:
            want += 1 / (v - 1)  # from source 1
        assert got[v] == pytest.approx(round(want, 6), abs=1e-6)
    g.unpersist()


def test_closeness_chain_closed_form(spark):
    edges, n = chain_edges(8)  # 0→1→…→7
    g = make_graph(spark, edges, n)
    got = {r["id"]: r for r in closeness_centrality(g, [0, 1]).collect()}
    for v in range(n):
        dists = [d for d in (v, v - 1) if d > 0]  # d(0,v)=v, d(1,v)=v-1
        assert got[v]["reached"] == len(dists)
        want = len(dists) / sum(dists) if dists else 0.0
        assert got[v]["closeness"] == pytest.approx(round(want, 6), abs=1e-6)
    g.unpersist()


def test_closeness_matches_numpy_bfs(spark):
    edges, n = zipf_edges(n=300, m=1500)
    g = make_graph(spark, edges, n)
    sources = [0, 1, 2, 3, 4]
    got = {r["id"]: r for r in closeness_centrality(g, sources).collect()}
    dist = {s: _bfs_dists_numpy(edges, n, s) for s in sources}
    for v in range(n):
        ds = [dist[s][v] for s in sources if dist[s][v] > 0]
        assert got[v]["reached"] == len(ds)
        want = len(ds) / sum(ds) if ds else 0.0
        assert got[v]["closeness"] == pytest.approx(round(want, 6), abs=1e-6)
    g.unpersist()


def _exact_nf_numpy(edges: np.ndarray, n: int, max_h: int) -> list[int]:
    per_pair = []
    for s in range(n):
        d = _bfs_dists_numpy(edges, n, s)
        per_pair.extend(d[d >= 0].tolist())
    arr = np.array(per_pair)
    return [int((arr <= h).sum()) for h in range(max_h + 1)]


def test_neighborhood_function_exact_matches_numpy(spark):
    edges, n = zipf_edges(n=120, m=700)
    g = make_graph(spark, edges, n)
    got = {r["h"]: r["nf"] for r in neighborhood_function_exact(g, max_h=6).collect()}
    want = _exact_nf_numpy(edges, n, 6)
    assert [got[h] for h in range(7)] == want
    g.unpersist()


def test_hyperanf_tracks_exact_curve(spark):
    # lg_config_k=12 → rsd ≈ 1.6% per-vertex; summed estimates are far
    # tighter — assert each curve point within 5% of the exact N(h)
    edges, n = zipf_edges(n=400, m=3000)
    g = make_graph(spark, edges, n)
    curve = dict(neighborhood_function(g, max_h=8, lg_config_k=12))
    want = _exact_nf_numpy(edges, n, 8)
    assert curve[0] == float(n)  # N(0) is exact by construction
    prev = 0.0
    for h in sorted(curve):
        assert curve[h] == pytest.approx(want[h], rel=0.05)
        assert curve[h] >= prev  # monotone: balls only grow
        prev = curve[h]
    g.unpersist()


def test_effective_diameter_chain(spark):
    # directed chain 0→…→9: N(h) = sum over v of |B(v,h)| saturates at
    # h=9; the 0.9-effective diameter must land strictly inside (0, 9]
    edges, n = chain_edges(10)
    g = make_graph(spark, edges, n)
    d_eff, curve = effective_diameter(g, alpha=0.9, max_h=16, lg_config_k=12)
    assert 0.0 < d_eff <= 9.0
    assert curve[-1][0] <= 10  # saturation detected, not run to max_h
    g.unpersist()


def test_mean_distance_closed_form_chain(spark):
    from linkgraph.operators import mean_distance
    from tests.conftest import chain_edges, make_graph

    edges, n = chain_edges(5)  # 0→1→2→3→4
    g = make_graph(spark, edges, n)
    r = mean_distance(g, max_h=8).collect()[0]
    # ordered reachable pairs: dists 1x4, 2x3, 3x2, 4x1 → 10 pairs, sum 20
    assert (r["n_pairs"], r["mean_dist"]) == (10, 2.0)
    # capping at h=2 drops the longer pairs
    r2 = mean_distance(g, max_h=2).collect()[0]
    assert (r2["n_pairs"], r2["mean_dist"]) == (7, round(10 / 7, 6))
    g.unpersist()


def test_jaccard_pairs_closed_form(spark):
    import numpy as np

    from linkgraph.operators import jaccard_pairs
    from tests.conftest import make_graph

    # path 0-1-2-3 plus 1-4: pair (0,2) shares {1}; N(0)={1}, N(2)={1,3}
    edges = np.array([[0, 1], [1, 2], [2, 3], [1, 4]])
    g = make_graph(spark, edges, 5)
    got = {
        (r["a"], r["b"]): (r["cn"], r["jaccard"])
        for r in jaccard_pairs(g, top_k=50).collect()
    }
    # non-adjacent pairs w/ common nbr: (0,2),(0,4),(2,4) via 1; (1,3) via 2
    assert got[(0, 2)] == (1, 0.5)       # 1 / (1+2-1)
    assert got[(0, 4)] == (1, 1.0)       # 1 / (1+1-1)
    assert got[(2, 4)] == (1, 0.5)
    assert got[(1, 3)] == (1, round(1 / 3, 6))  # 1 / (deg(1)+deg(3)-cn) = 1/3
    assert len(got) == 4
    g.unpersist()


def test_jaccard_pairs_matches_python(spark):
    import numpy as np

    from linkgraph.operators import jaccard_pairs
    from tests.conftest import make_graph, zipf_edges

    edges, n = zipf_edges(n=100, m=500)
    g = make_graph(spark, edges, n)
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            if b in adj[a]:
                continue
            cn = len(adj[a] & adj[b])
            if cn:
                want[(a, b)] = (cn, round(cn / len(adj[a] | adj[b]), 6))
    # uncapped explicitly: this replication validates the exact math and
    # the fixture has a degree-87 hub the 'auto' default would drop
    rows = jaccard_pairs(g, top_k=10_000, max_center_degree=None).collect()
    got = {(r["a"], r["b"]): (r["cn"], r["jaccard"]) for r in rows}
    assert got == want
    g.unpersist()


def test_rectangle_count_planted(spark):
    # a single 4-cycle, a 4-cycle with a chord (still exactly 1 C4... the
    # chord adds two triangles, no extra rectangle), and K4 (3 rectangles)
    import numpy as np

    from linkgraph.operators.triangles import rectangle_count
    from tests.conftest import make_graph

    def count(edges, n):
        g = make_graph(spark, np.array(edges), n)
        r = rectangle_count(g, max_center_degree=None).collect()[0]["rectangles"]
        g.unpersist()
        return r

    assert count([(0, 1), (1, 2), (2, 3), (3, 0)], 4) == 1
    assert count([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], 4) == 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert count(k4, 4) == 3
    # triangle alone has none; path has none
    assert count([(0, 1), (1, 2), (2, 0)], 3) == 0
    assert count([(0, 1), (1, 2), (2, 3)], 4) == 0


def test_rectangle_count_brute_force_random(spark):
    import itertools

    import numpy as np

    from linkgraph.operators.triangles import rectangle_count
    from tests.conftest import make_graph

    rng = np.random.default_rng(11)
    n = 14
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, 60), rng.integers(0, n, 60))
    ]
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want = 0
    for quad in itertools.combinations(range(n), 4):
        # count distinct 4-cycles on this vertex set: 3 possible cyclic
        # pairings; a pairing (p,q)|(r,s) is a C4 iff p-r,r-q,q-s,s-p all
        # edges (diagonals p-q, r-s irrelevant)
        p, q, r, s = quad
        for d1, d2 in (((p, q), (r, s)), ((p, r), (q, s)), ((p, s), (q, r))):
            (x1, x2), (y1, y2) = d1, d2
            if (
                y1 in adj[x1] and y2 in adj[x1]
                and y1 in adj[x2] and y2 in adj[x2]
            ):
                want += 1
    g = make_graph(spark, np.array(edges), n)
    got = rectangle_count(g, max_center_degree=None).collect()[0]["rectangles"]
    g.unpersist()
    assert got == want


def test_resource_allocation_matches_python(spark):
    import numpy as np

    from linkgraph.operators import resource_allocation
    from tests.conftest import make_graph, zipf_edges

    edges, n = zipf_edges(n=100, m=500)
    g = make_graph(spark, edges, n)
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if common:
                want[(a, b)] = (
                    len(common),
                    round(sum(1.0 / len(adj[w]) for w in common), 6),
                )
    rows = resource_allocation(
        g, top_k=10_000, max_center_degree=None
    ).collect()
    got = {(r["a"], r["b"]): (r["cn"], r["ra"]) for r in rows}
    assert got == want
    g.unpersist()


def test_preferential_attachment_top_pairs(spark):
    import numpy as np

    from linkgraph.operators import preferential_attachment
    from tests.conftest import make_graph, zipf_edges

    edges, n = zipf_edges(n=100, m=500)
    g = make_graph(spark, edges, n)
    adj = {v: set() for v in range(n)}
    deg = {v: 0 for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    for v in adj:
        deg[v] = len(adj[v])
    want = sorted(
        (
            (-deg[a] * deg[b], a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if deg[a] and deg[b] and b not in adj[a]
        ),
    )[:20]
    want = [(a, b, -negpa) for negpa, a, b in want]
    got = [
        (r["a"], r["b"], r["pa"])
        for r in preferential_attachment(
            g, top_k=20, candidate_pool=100
        ).collect()
    ]
    assert got == want
    g.unpersist()


def test_hyperanf_systolic_matches_full_propagation(spark):
    """The r06 systolic frontier (changed-only sketch propagation) is
    register-identical to naive full propagation — unioning an unchanged
    neighbor sketch is a register-wise no-op. While sketches are in
    coupon (exact-set) mode — ball size ≤ ~2^lg_k, which covers the whole
    V=2048 gate configuration at the default lg_k=12 — the estimate is a
    pure function of the coupon set, so the curves agree BIT-FOR-BIT. In
    dense HLL mode the datasketches estimator also carries union-history
    state, so there the curves agree only to sketch precision (asserted
    at 1% below, lg_k=8)."""
    from pyspark.sql import functions as F

    edges_np, n = zipf_edges(n=400, m=3000)
    g = make_graph(spark, edges_np, n)
    got = neighborhood_function(g, max_h=16, lg_config_k=12)

    # naive twin: full-state propagation every round (the pre-r06 form)
    edges = g.edges.select("src", "dst")
    def naive(lg_k: int):
        state = (
            g.vertices()
            .groupBy("id")
            .agg(F.hll_sketch_agg("id", lg_k).alias("sk"))
            .localCheckpoint(eager=True)
        )
        want = [(0, float(n))]
        for h in range(1, 17):
            contrib = edges.join(state, edges["dst"] == state["id"]).select(
                edges["src"].alias("id"), "sk"
            )
            state = (
                state.unionByName(contrib)
                .groupBy("id")
                .agg(F.hll_union_agg("sk").alias("sk"))
                .localCheckpoint(eager=False)
            )
            nf = state.agg(
                F.sum(F.hll_sketch_estimate("sk")).alias("nf")
            ).collect()[0]["nf"]
            prev = want[-1][1]
            want.append((h, float(nf)))
            if nf <= prev * 1.0001:
                break
        return want

    assert got == naive(12)  # coupon mode: bit-for-bit

    got8 = dict(neighborhood_function(g, max_h=16, lg_config_k=8))
    want8 = dict(naive(8))  # dense HLL mode: sketch-precision agreement
    for h in set(got8) & set(want8):  # saturation round may differ by one
        assert got8[h] == pytest.approx(want8[h], rel=0.01)
    assert abs(len(got8) - len(want8)) <= 1
    g.unpersist()


def test_adamic_adar_deterministic_across_partitionings(spark):
    """The decimal(38,18) Σ 1/ln(d) reduction is exact, so the rounded aa
    values cannot depend on partition count or scheduling order — run the
    same graph at two parallelism levels and require identical rows."""
    from linkgraph.graph import Graph
    from linkgraph.operators import adamic_adar

    edges_np, n = zipf_edges(n=200, m=1600)
    outs = []
    for parts in (2, 8):
        g = Graph.from_edges(
            spark,
            spark.createDataFrame(
                [(int(s), int(d)) for s, d in edges_np], "src long, dst long"
            ),
            num_vertices=n,
            num_partitions=parts,
        )
        outs.append(
            [
                (r["a"], r["b"], r["cn"], r["aa"])
                for r in adamic_adar(g, top_k=50, max_center_degree=None).collect()
            ]
        )
        g.unpersist()
    assert outs[0] == outs[1]
