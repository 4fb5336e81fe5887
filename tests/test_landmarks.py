"""Landmark distance sketches vs a NumPy BFS twin: deterministic
degree-ordered selection, directed distances, and the triangle-
inequality upper-bound property of the estimate join."""

from __future__ import annotations

import numpy as np

from linkgraph.operators import (
    landmark_distance_estimate,
    landmark_distances,
    select_landmarks,
)
from tests.conftest import make_graph, zipf_edges


def _bfs_numpy(edges: np.ndarray, n: int, root: int, max_depth: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(int(s), set()).add(int(d))
    dist = {root: 0}
    frontier = [root]
    for lvl in range(1, max_depth + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = lvl
                    nxt.append(v)
        frontier = nxt
        if not frontier:
            break
    return dist


def test_select_landmarks_is_degree_then_id_order(spark):
    edges, n = zipf_edges(n=300, m=2000)
    g = make_graph(spark, edges, n)
    lm = select_landmarks(g, 5)
    deg = np.zeros(n, dtype=np.int64)
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
    order = sorted(range(n), key=lambda v: (-deg[v], v))
    assert lm == order[:5]
    g.unpersist()


def test_landmark_distances_match_per_source_bfs(spark):
    edges, n = zipf_edges(n=300, m=2000)
    g = make_graph(spark, edges, n)
    got = {
        (r["landmark"], r["id"]): r["dist"]
        for r in landmark_distances(g, num_landmarks=3, max_depth=6).collect()
    }
    for lm in select_landmarks(g, 3):
        want = _bfs_numpy(edges, n, lm, 6)
        rows = {k[1]: v for k, v in got.items() if k[0] == lm}
        assert rows == want
    g.unpersist()


def test_estimate_is_an_upper_bound_on_true_distance(spark):
    edges, n = zipf_edges(n=300, m=2000)
    # symmetrize so landmark distances commute with the pair bound
    sym = np.vstack([edges, edges[:, ::-1]])
    g = make_graph(spark, sym, n)
    sketch = landmark_distances(g, num_landmarks=4, max_depth=8)
    pairs = g.spark.createDataFrame(
        [(1, 7), (3, 11), (20, 40)], "u long, v long"
    )
    est = {
        (r["u"], r["v"]): r["dist_est"]
        for r in landmark_distance_estimate(sketch, pairs).collect()
    }
    for (u, v), e in est.items():
        true = _bfs_numpy(sym, n, int(u), 16).get(int(v))
        assert true is not None and e >= true
    g.unpersist()
