"""Disparity-filter backbone vs a NumPy twin of the closed-form filter."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import disparity_backbone
from tests.conftest import make_graph, star_hub_edges, zipf_edges


def _backbone_numpy(edges: np.ndarray, n: int, alpha: float):
    und = {}
    for s, d in edges:
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        und[(a, b)] = float(a % 10 + b % 10)
    strength = np.zeros(n)
    degree = np.zeros(n, dtype=int)
    for (a, b), w in und.items():
        strength[a] += w
        strength[b] += w
        degree[a] += 1
        degree[b] += 1
    keep = {}
    for (a, b), w in und.items():
        aa = (1.0 - w / strength[a]) ** (degree[a] - 1) if strength[a] > 0 else 1.0
        ab = (1.0 - w / strength[b]) ** (degree[b] - 1) if strength[b] > 0 else 1.0
        am = round(min(aa, ab), 9)
        if am < alpha:
            keep[(a, b)] = (w, round(am, 6))
    return keep


def test_backbone_matches_numpy(spark):
    edges, n = zipf_edges(n=120, m=900, seed=11)
    g = make_graph(spark, edges, n)
    got = {
        (r["a"], r["b"]): (r["weight"], r["alpha_min"])
        for r in disparity_backbone(g, alpha=0.2).collect()
    }
    want = _backbone_numpy(edges, n, alpha=0.2)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)
    g.unpersist()


def test_backbone_star_keeps_heavy_spokes(spark):
    # hub 0 with 256 spokes: spoke weights w = i%10 (0..9); the hub's
    # null model spreads strength over 256 edges, so a spoke's p-value
    # tends to exp(-w/mean_w) ≈ 0.134 at w=9 — heavy spokes pass an
    # α = 0.2 filter; leaves (k=1) give α = 1 on their side
    edges, n = star_hub_edges(257)
    g = make_graph(spark, edges, n)
    rows = disparity_backbone(g, alpha=0.2).collect()
    want = _backbone_numpy(edges, n, alpha=0.2)
    assert {(r["a"], r["b"]) for r in rows} == set(want)
    assert len(want) > 0  # the fixture does exercise the keep branch
    # every kept edge touches the hub and carries an above-average weight
    # relative to ALL spokes (i%10 → mean 4.5): the filter keeps heavy edges
    all_mean = float(np.mean([(s % 10 + d % 10) for s, d in edges if s != d]))
    for r in rows:
        assert r["a"] == 0
        assert r["weight"] > all_mean
    g.unpersist()


def test_backbone_leaf_edge_never_kept_by_leaf(spark):
    # two vertices, one edge: both endpoints have k = 1 → α = 1 ≥ any α
    e = np.array([[3, 7]], dtype=np.int64)
    g = make_graph(spark, e, 8)
    assert disparity_backbone(g, alpha=0.999).count() == 0
    g.unpersist()
