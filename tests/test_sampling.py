"""Graph samplers — determinism, layout-independence, rate behavior,
and a hashlib twin of the keep rule."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from linkgraph.operators.sampling import sample_edges, sample_vertices_induced
from tests.conftest import make_graph


def _kept(key: str, rate: float) -> bool:
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    return h < int(rate * float(1 << 60))


def test_sample_edges_matches_hashlib_rule(spark):
    e = [(i % 64, (i * 13 + 5) % 64) for i in range(300)]
    g = make_graph(spark, np.array(e), 64)
    got = {(r["src"], r["dst"]) for r in sample_edges(g, rate=0.3, seed=9).collect()}
    want = {(s, d) for s, d in set(e) if _kept(f"esamp:9:{s}:{d}", 0.3)}
    assert got == want
    g.unpersist()


def test_sample_vertices_induced_consistent(spark):
    e = [(i % 40, (i * 7 + 3) % 40) for i in range(200)]
    g = make_graph(spark, np.array(e), 40)
    rows = sample_vertices_induced(g, rate=0.5, seed=4).collect()
    kept_v = {v for v in range(40) if _kept(f"vsamp:4:{v}", 0.5)}
    got = {(r["src"], r["dst"]) for r in rows}
    want = {(s, d) for s, d in set(e) if s in kept_v and d in kept_v}
    assert got == want
    # consistency: every surviving endpoint is in the kept vertex set
    assert {v for p in got for v in p} <= kept_v
    g.unpersist()


def test_sample_rate_monotone_and_bounds(spark):
    e = [(i % 50, (i * 11 + 1) % 50) for i in range(250)]
    g = make_graph(spark, np.array(e), 50)
    s10 = {(r["src"], r["dst"]) for r in sample_edges(g, rate=0.1).collect()}
    s50 = {(r["src"], r["dst"]) for r in sample_edges(g, rate=0.5).collect()}
    s100 = {(r["src"], r["dst"]) for r in sample_edges(g, rate=1.0).collect()}
    assert s10 <= s50 <= s100
    assert len(s100) == len(set(e))
    assert sample_edges(g, rate=0.0).count() == 0
    with pytest.raises(ValueError):
        sample_edges(g, rate=1.5)
    g.unpersist()


def test_vertex_sample_no_shuffle_plan(spark):
    e = [(i, i + 1) for i in range(20)]
    g = make_graph(spark, np.array(e), 21)
    plan = (
        sample_vertices_induced(g, rate=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the persisted layout scan aside, the sampler itself adds no exchange
    assert "Exchange" not in plan.split("InMemoryTableScan")[0]
    g.unpersist()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_ego_network_chain(spark):
    # directed chain 0→1→…→7, seeds={3}, hops=2: the undirected ball is
    # {1..5}; induced directed edges are exactly 1→2…4→5
    import numpy as np

    from linkgraph.operators import ego_network
    from tests.conftest import chain_edges, make_graph

    edges, n = chain_edges(8)
    g = make_graph(spark, edges, n)
    got = sorted((r["src"], r["dst"]) for r in ego_network(g, [3], hops=2).collect())
    assert got == [(1, 2), (2, 3), (3, 4), (4, 5)]
    # hops=0: the ball is the seed alone — no non-self edges survive
    assert ego_network(g, [3], hops=0).count() == 0
    g.unpersist()


def test_ego_network_follows_in_links_and_dedupes(spark):
    # reachability must cross in-edges (5→3) and output is distinct
    import numpy as np

    from linkgraph.operators import ego_network
    from tests.conftest import make_graph

    edges = np.array([[5, 3], [5, 3], [6, 5], [0, 1]])
    g = make_graph(spark, edges, 7)
    got = sorted((r["src"], r["dst"]) for r in ego_network(g, [3], hops=2).collect())
    assert got == [(5, 3), (6, 5)]  # 0→1 is outside the ball; dupes collapse
    g.unpersist()


def test_ego_network_matches_numpy_ball(spark):
    import numpy as np

    from linkgraph.operators import ego_network
    from tests.conftest import make_graph, zipf_edges

    edges, n = zipf_edges(n=300, m=1500, seed=11)
    g = make_graph(spark, edges, n)
    seeds, hops = [0, 42], 2
    ball = set(seeds)
    for _ in range(hops):
        nxt = set()
        for s, d in edges:
            if s in ball:
                nxt.add(int(d))
            if d in ball:
                nxt.add(int(s))
        ball |= nxt
    want = sorted({(int(s), int(d)) for s, d in edges if s in ball and d in ball})
    got = sorted((r["src"], r["dst"]) for r in ego_network(g, seeds, hops=hops).collect())
    assert got == want
    g.unpersist()
