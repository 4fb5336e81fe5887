"""SimRank vs a dense NumPy twin of the truncated fixpoint."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import simrank
from tests.conftest import chain_edges, make_graph, zipf_edges


def _simrank_numpy(
    edges: np.ndarray, n: int, iterations: int, c: float
) -> np.ndarray:
    # in-neighbor MULTISETS: multi-edges count multiply, matching the
    # engine's row-counted ein/ind (the gate graph is deduped upstream)
    inn = [[] for _ in range(n)]
    for s, d in edges:
        inn[d].append(s)
    S = np.eye(n)
    for _ in range(iterations):
        S2 = np.eye(n)
        for a in range(n):
            for b in range(a + 1, n):
                if inn[a] and inn[b]:
                    tot = sum(S[i, j] for i in inn[a] for j in inn[b])
                    S2[a, b] = S2[b, a] = c * tot / (len(inn[a]) * len(inn[b]))
        S = S2
    return S


def test_simrank_matches_numpy_fixpoint(spark):
    edges, n = zipf_edges(n=48, m=160, seed=7)
    g = make_graph(spark, edges, n)
    got = {
        (r["a"], r["b"]): r["sim"]
        for r in simrank(g, iterations=3, decay=0.8, top_k=None).collect()
    }
    want = _simrank_numpy(edges, n, iterations=3, c=0.8)
    for a in range(n):
        for b in range(a + 1, n):
            assert got.get((a, b), 0.0) == pytest.approx(
                round(want[a, b], 6), abs=2e-6
            ), (a, b)
    g.unpersist()


def test_simrank_cocitation_closed_form(spark):
    # 0→2, 0→3, 1→2, 1→3: I(2) = I(3) = {0, 1}; 0 and 1 have no
    # in-edges, so after any k ≥ 1 the only nonzero off-diagonal score
    # is s(2,3) = C·|I(2)∩I(3)| / (|I(2)|·|I(3)|) = C/2.
    e = np.array([[0, 2], [0, 3], [1, 2], [1, 3]], dtype=np.int64)
    g = make_graph(spark, e, 4)
    rows = simrank(g, iterations=3, decay=0.8, top_k=None).collect()
    assert {(r["a"], r["b"]): r["sim"] for r in rows} == {(2, 3): 0.4}
    g.unpersist()


def test_simrank_chain_is_empty(spark):
    # a directed chain has |I(v)| = 1 with disjoint singleton in-sets at
    # every depth: no two vertices ever meet, all off-diagonals are 0
    edges, n = chain_edges(16)
    g = make_graph(spark, edges, n)
    assert simrank(g, iterations=4, top_k=None).count() == 0
    g.unpersist()


def test_simrank_eps_prunes_to_subset(spark):
    edges, n = zipf_edges(n=48, m=160, seed=7)
    g = make_graph(spark, edges, n)
    full = {
        (r["a"], r["b"]): r["sim"]
        for r in simrank(g, iterations=2, top_k=None).collect()
    }
    pruned = {
        (r["a"], r["b"]): r["sim"]
        for r in simrank(g, iterations=2, top_k=None, eps=0.05).collect()
    }
    assert set(pruned) <= set(full)
    assert all(v >= 0.05 for v in pruned.values())
    # every surviving score is what the exact run computed for that pair
    # up to the mass the pruned rounds dropped (one-sided: pruning only
    # removes contributions, so pruned <= full)
    for k, v in pruned.items():
        assert v <= full[k] + 1e-9
    g.unpersist()


def test_simrank_hub_cap_drops_hub_paths(spark):
    # hub 0 points at everything; capping out-degree at 4 removes all
    # propagation through it
    e = np.array(
        [[0, i] for i in range(1, 9)] + [[9, 1], [9, 2], [10, 1], [10, 2]],
        dtype=np.int64,
    )
    g = make_graph(spark, e, 11)
    capped = {
        (r["a"], r["b"]): r["sim"]
        for r in simrank(g, iterations=2, top_k=None, max_out_degree=4).collect()
    }
    # with the hub gone, I(1) = I(2) = {9, 10}: s(1,2) = C·2/4 = 0.4
    assert capped[(1, 2)] == pytest.approx(0.4, abs=1e-6)
    # pairs only co-cited by the hub vanish
    assert (3, 4) not in capped
    g.unpersist()
