"""Pure-NumPy reference oracles mirroring the C recurrences exactly.

These are the goldens: each function reimplements the corresponding
reference kernel's arithmetic (same constants, same init, same update
rule) in float64 over plain arrays, independent of Spark. Tests assert
engine == oracle (allclose 1e-6 for PageRank per the north rule; exact
for everything discrete).
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(
    edges: np.ndarray,
    n: int,
    iterations: int = 10,
    damping: float = 0.85,
    init_rank: float = 0.15,
    tol: float | None = None,
    max_iterations: int = 100,
    check_every: int = 1,
) -> np.ndarray:
    """pagerank_simple.c recurrence: init 0.15 (line 95), fixed iterations
    (line 115), rank' = (1-d)/N + d·Σ prev[u]/outdeg(u) (lines 62-84,
    119-123), no dangling redistribution. Multi-edges each contribute.

    ``check_every`` mirrors the engine's ``unroll``: the convergence test
    compares against the state ``check_every`` iterations back."""
    src, dst = edges[:, 0], edges[:, 1]
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    safe = np.where(outdeg == 0, 1.0, outdeg)
    rank = np.full(n, init_rank, dtype=np.float64)
    const = (1.0 - damping) / n
    rounds = iterations if tol is None else max_iterations
    it = 0
    while it < rounds:
        block = min(check_every, rounds - it) if tol is not None else 1
        old = rank
        for _ in range(block):
            contrib = rank[src] / safe[src]
            acc = np.bincount(dst, weights=contrib, minlength=n)
            rank = const + damping * acc
            it += 1
        if tol is not None and np.max(np.abs(rank - old)) < tol:
            break
    return rank


def wcc_oracle(edges: np.ndarray, n: int) -> np.ndarray:
    """Fixpoint min-label propagation over the symmetrized edge set
    (wcc.c:235-261 edge-array variant relaxes both directions)."""
    comp = np.arange(n, dtype=np.int64)
    src, dst = edges[:, 0], edges[:, 1]
    while True:
        before = comp.copy()
        # two half-relaxations per round, to fixpoint — order-independent
        np.minimum.at(comp, dst, comp[src])
        np.minimum.at(comp, src, comp[dst])
        if np.array_equal(before, comp):
            return comp


def label_propagation_oracle(edges: np.ndarray, n: int, iterations: int = 10) -> np.ndarray:
    """Synchronous LP over the symmetrized multigraph; argmax neighbor-label
    count with min-label tie-break; isolated vertices keep their label."""
    sym = np.vstack([edges, edges[:, ::-1]])
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iterations):
        new = labels.copy()
        votes: dict[int, dict[int, int]] = {}
        for s, d in sym:
            votes.setdefault(d, {}).setdefault(int(labels[s]), 0)
            votes[d][int(labels[s])] += 1
        for v, cnts in votes.items():
            best = max(cnts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def triangle_count_oracle(edges: np.ndarray, n: int) -> int:
    """Brute-force triangle count on the undirected simple graph."""
    adj = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].add(int(d))
            adj[d].add(int(s))
    count = 0
    for u in range(n):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    count += 1
    return count


def triangles_per_vertex_oracle(edges: np.ndarray, n: int) -> np.ndarray:
    adj = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].add(int(d))
            adj[d].add(int(s))
    t = np.zeros(n, dtype=np.int64)
    for u in range(n):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    t[u] += 1
                    t[v] += 1
                    t[w] += 1
    return t


def bfs_oracle(edges: np.ndarray, n: int, root: int) -> dict[int, int]:
    """Directed BFS levels (root=0); reached vertices only."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(int(s), []).append(int(d))
    dist = {int(root): 0}
    q = deque([int(root)])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def sssp_oracle(edges: np.ndarray, weights: np.ndarray, n: int, root: int) -> dict[int, float]:
    """Weighted shortest paths (Bellman-Ford fixpoint), self-loops skipped
    (sssp_pushpull.c:47); reached vertices only."""
    dist = {int(root): 0.0}
    changed = True
    while changed:
        changed = False
        for (s, d), w in zip(edges, weights):
            s, d = int(s), int(d)
            if s == d or s not in dist:
                continue
            nd = dist[s] + float(w)
            if d not in dist or nd < dist[d]:
                dist[d] = nd
                changed = True
    return dist


def spmv_oracle(edges: np.ndarray, n: int, scale: float = 0.001) -> np.ndarray:
    """y[v] = Σ_{(u,v)} scale·x[u], x[i]=i (spmv.c:98-106, 125-128)."""
    src, dst = edges[:, 0], edges[:, 1]
    x = np.arange(n, dtype=np.float64)
    return np.bincount(dst, weights=scale * x[src], minlength=n)
