"""rmat_edges — deterministic distributed R-MAT generation.

Checks: (1) the edge list matches a pure-Python hashlib twin bit for bit
(independent of both engines); (2) ids stay inside [0, 2^scale); (3) the
distribution is actually skewed (quadrant a dominates → low-id hubs);
(4) plan shape: no shuffle exchange in the generator."""

from __future__ import annotations

import hashlib

import pytest

from linkgraph.generate import _thresholds, rmat_edges


def _python_rmat(scale, n_edges, seed, a=0.57, b=0.19, c=0.19):
    ta, tab, tabc = _thresholds(a, b, c)
    out = []
    for i in range(n_edges):
        src = dst = 0
        for level in range(scale):
            u = int(
                hashlib.md5(f"{seed}|{i}|{level}".encode()).hexdigest()[:15], 16
            )
            shift = scale - 1 - level
            if u >= tab:
                src += 1 << shift
            if not (u < ta or (tab <= u < tabc)):
                dst += 1 << shift
    # mirror the engine's quadrant → bit mapping exactly:
    # (0,0) u<ta; (0,1) ta<=u<tab; (1,0) tab<=u<tabc; (1,1) u>=tabc
        out.append((src, dst))
    return out


def test_rmat_matches_hashlib_twin(spark):
    got = sorted(
        (r["src"], r["dst"]) for r in rmat_edges(spark, scale=6, n_edges=200).collect()
    )
    want = sorted(_python_rmat(6, 200, 42))
    assert got == want


def test_rmat_range_and_skew(spark):
    rows = rmat_edges(spark, scale=8, n_edges=2048, seed=7).collect()
    assert len(rows) == 2048
    assert all(0 <= r["src"] < 256 and 0 <= r["dst"] < 256 for r in rows)
    # a = 0.57 biases every level toward the low half: vertex frequency
    # must be top-heavy (low ids far more frequent than uniform 8 per id)
    from collections import Counter

    deg = Counter(r["src"] for r in rows)
    assert max(deg.values()) > 30


def test_rmat_no_shuffle(spark):
    plan = rmat_edges(spark, scale=8, n_edges=2048)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
