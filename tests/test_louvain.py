"""louvain_move — deterministic synchronous Louvain local-move rounds.

Checks: (1) a planted two-clique graph resolves to exactly two
communities split at the bridge; (2) every round matches a pure-Python
twin of the pinned semantics (minimum-label rule, integer gain scores,
min-id ties) on an irregular graph; (3) community labels are a valid
partition (every vertex labeled, labels drawn from vertex ids)."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import louvain_move
from tests.conftest import make_graph


def _python_louvain(edges: list[tuple[int, int]], n: int, rounds: int) -> dict[int, int]:
    """Pure-Python twin of the pinned semantics — independent of both
    engines (no DataFrames, no SQL)."""
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    m = len(canon)
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for a, b in canon:
        adj[a].append(b)
        adj[b].append(a)
    deg = {i: len(adj[i]) for i in range(n)}
    comm = {i: i for i in range(n)}
    for _ in range(rounds):
        tot: dict[int, int] = {}
        for i in range(n):
            tot[comm[i]] = tot.get(comm[i], 0) + deg[i]
        new = dict(comm)
        for i in range(n):
            kin: dict[int, int] = {comm[i]: 0}
            for j in adj[i]:
                kin[comm[j]] = kin.get(comm[j], 0) + 1
            best, best_key = None, None
            for c, k in kin.items():
                if c > comm[i]:
                    continue  # minimum-label rule
                score = 2 * m * k - deg[i] * (tot[c] - (deg[i] if c == comm[i] else 0))
                key = (score, -c)  # max score, ties to smaller community id
                if best_key is None or key > best_key:
                    best, best_key = c, key
            new[i] = best
        comm = new
    return comm


def test_louvain_two_cliques(spark):
    # two 4-cliques joined by a single bridge 3–4: modularity-optimal
    # split IS the two cliques
    def clique(lo):
        return [(a, b) for a in range(lo, lo + 4) for b in range(a + 1, lo + 4)]

    e = clique(0) + clique(4) + [(3, 4)]
    g = make_graph(spark, np.array(e), 8)
    got = {r["id"]: r["comm"] for r in louvain_move(g, rounds=4).collect()}
    assert got == _python_louvain(e, 8, 4)
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(4, 8)}) == 1
    assert got[0] != got[4]
    g.unpersist()


def test_louvain_matches_python_twin_each_round(spark):
    # irregular graph: hub + cycle + isolated vertex + a multi-edge and a
    # self-loop (both must be dropped by the canonical simple view)
    e = [(0, i) for i in range(1, 6)] + [(i, i + 1) for i in range(5, 10)]
    e += [(10, 5), (0, 1), (7, 7), (9, 5)]
    n = 12  # vertex 11 isolated
    g = make_graph(spark, np.array(e), n)
    for rounds in (1, 2, 3):
        got = {r["id"]: r["comm"] for r in louvain_move(g, rounds=rounds).collect()}
        assert got == _python_louvain(e, n, rounds), f"rounds={rounds}"
    g.unpersist()


def test_louvain_partition_valid(spark):
    e = [(i, (i * 7 + 3) % 40) for i in range(80)]
    g = make_graph(spark, np.array(e), 40)
    rows = louvain_move(g, rounds=4).collect()
    assert len(rows) == 40
    assert {r["id"] for r in rows} == set(range(40))
    assert all(0 <= r["comm"] < 40 for r in rows)
    g.unpersist()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
