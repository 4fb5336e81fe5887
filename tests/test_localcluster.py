"""ACL PPR sweep cut vs hand-computed conductance on planted communities."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.localcluster import ppr_sweep
from tests.conftest import make_graph


def _bridged_cliques(k: int = 5) -> tuple[np.ndarray, int]:
    """Two k-cliques joined by one bridge edge (0 .. k-1 | k .. 2k-1)."""
    e = []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    e.append([base + i, base + j])
    e.append([k - 1, k])
    e.append([k, k - 1])
    return np.array(e, dtype=np.int64), 2 * k


def test_sweep_minimum_isolates_seed_clique(spark):
    edges, n = _bridged_cliques(5)
    g = make_graph(spark, edges, n)
    rows = ppr_sweep(g, source=0, iterations=20, k=n).orderBy("pos").collect()
    g.unpersist()
    # every vertex is reachable (undirected-ish construction) and has degree
    assert len(rows) == n
    by_pos = {r["pos"]: r for r in rows}
    # the first 5 sweep positions are exactly the seed's clique
    assert {by_pos[p]["id"] for p in range(1, 6)} == set(range(5))
    # prefix = the whole seed clique: only the bridge leaves, vol = 4*5+1
    assert by_pos[5]["cut"] == 1
    assert by_pos[5]["vol"] == 21
    assert by_pos[5]["phi"] == pytest.approx(1 / 21, abs=1e-6)
    # and that prefix is the unique conductance minimum
    phis = [r["phi"] for r in rows[:-1]]  # last prefix has denom->vol(V)-side
    assert min(range(len(phis)), key=lambda i: phis[i]) == 4
    # the full-graph prefix swallows every edge: cut 0, phi 0 by convention
    assert by_pos[n]["cut"] == 0
    assert by_pos[n]["phi"] == 0.0


def test_sweep_cut_matches_brute_force_on_random_graph(spark):
    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 24, size=(160, 2)) if a != b}
    edges = np.array(sorted(pairs), dtype=np.int64)
    n = 24
    g = make_graph(spark, edges, n)
    rows = ppr_sweep(g, source=3, iterations=10, k=16).orderBy("pos").collect()
    g.unpersist()

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(canon)
    prefix = []
    for r in rows:
        prefix.append(r["id"])
        s = set(prefix)
        cut = sum(1 for a, b in canon if (a in s) != (b in s))
        vol = sum(deg[v] for v in s)
        assert r["cut"] == cut, r
        assert r["vol"] == vol, r
        denom = min(vol, 2 * m - vol)
        want = round(cut / denom, 6) if denom > 0 else 0.0
        assert r["phi"] == pytest.approx(want, abs=1e-9), r
