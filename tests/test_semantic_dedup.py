"""SemDeDup-style embedding-space dedup — similarity.semantic_dedup.

Pins the composition to its spec on a planted-duplicate fixture (near-
identical vectors must land in one cluster with exactly one keep=True),
verifies the keep-list semantics match docs.dedup_clusters (cluster_id =
min vec_id, singletons keep themselves), the cell cap drops oversized
cells with an audit row, and the CheckpointStore resume skips completed
stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.similarity import (
    ivf_assign,
    semantic_dedup,
    semantic_dedup_dropped_cells,
)


def _planted_embeddings(spark, n: int = 40, dim: int = 8, n_dups: int = 5):
    """n base vectors on distinct random directions; ids i and i+n for
    i < n_dups are near-identical (cosine ≈ 1), everything else far
    apart. Deterministic (hash-seeded numpy)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(n, dim))
    rows = []
    for i in range(n):
        rows.append((i, [float(x) for x in base[i]]))
    for i in range(n_dups):
        noisy = base[i] + rng.normal(scale=1e-4, size=dim)
        rows.append((n + i, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _keeplist_py(emb_rows, num_centroids: int, min_sim: float):
    """NumPy replication of the full composition: md5-seeded centroids,
    argmax 6-dp cosine assignment (ties → smaller cid), within-cell pairs
    at 6-dp cosine ≥ min_sim, union-find components, min-id keep-list."""
    ids = sorted(r[0] for r in emb_rows)
    vec = {r[0]: np.asarray(r[1], dtype=np.float64) for r in emb_rows}
    seeds = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [vec[i] for i in seeds[:num_centroids]]

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0.0 or nb == 0.0:
            return None
        return round(float(a @ b / (na * nb)), 6)

    cid = {}
    for i in ids:
        sims = [(cos(vec[i], c), -k) for k, c in enumerate(cents)]
        cid[i] = -max(sims)[1]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in ids:
        for b in ids:
            if a < b and cid[a] == cid[b] and (cos(vec[a], vec[b]) or -2) >= min_sim:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_semantic_dedup_matches_numpy_replication(spark):
    emb = _planted_embeddings(spark, n=40, dim=8, n_dups=5)
    got = {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            emb, num_centroids=4, min_sim=0.95, max_cell_size=None
        ).collect()
    }
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    want = _keeplist_py(rows, num_centroids=4, min_sim=0.95)
    assert got == {i: (c, i == c) for i, c in want.items()}
    # the planted near-identical pairs actually deduped: i+40 → cluster i
    for i in range(5):
        assert got[40 + i] == (i, False)
        assert got[i] == (i, True)


def test_semantic_dedup_one_keep_per_cluster_covers_all(spark):
    emb = _planted_embeddings(spark, n=30, dim=8, n_dups=8)
    res = semantic_dedup(emb, num_centroids=4, min_sim=0.9).collect()
    assert len(res) == emb.count()  # every vector classified
    by_cluster: dict[int, list] = {}
    for r in res:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cl, members in by_cluster.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1 and keeps[0]["vec_id"] == cl == min(
            m["vec_id"] for m in members
        )


def test_semantic_dedup_cell_cap_drops_and_audits(spark):
    # all 12 vectors near one direction → one cell holds everything;
    # max_cell_size below that turns the run into all-singletons, and the
    # audit reports exactly the dropped cell
    rng = np.random.default_rng(3)
    d = rng.normal(size=6)
    rows = [
        (i, [float(x) for x in (d + rng.normal(scale=1e-3, size=6))])
        for i in range(12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # ONE centroid so the cell split is deterministic: all 12 share cell 0
    res = semantic_dedup(emb, num_centroids=1, min_sim=0.99, max_cell_size=5)
    assert res.filter(~F.col("keep")).count() == 0  # cell dropped → no pairs
    dropped = semantic_dedup_dropped_cells(
        emb, num_centroids=1, max_cell_size=5
    ).collect()
    assert [(r["cid"], r["csz"]) for r in dropped] == [(0, 12)]
    # uncapped, the same corpus collapses to one cluster
    full = semantic_dedup(emb, num_centroids=1, min_sim=0.99, max_cell_size=None)
    assert full.filter(F.col("keep")).count() == 1


def test_semantic_dedup_store_resume_skips_stages(spark, tmp_path):
    from linkgraph.runner import CheckpointStore

    emb = _planted_embeddings(spark, n=24, dim=8, n_dups=4)
    store = CheckpointStore(spark, str(tmp_path / "sd"), "semdedup", "r1")
    first = {
        (r["vec_id"], r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            emb, num_centroids=4, min_sim=0.95, max_cell_size=None, store=store
        ).collect()
    }
    assert store.latest_iteration() is not None  # stages committed
    # relaunch with the same store: assignment + pairs reload, components
    # resume from the highest committed round — same answer
    store2 = CheckpointStore(spark, str(tmp_path / "sd"), "semdedup", "r1")
    second = {
        (r["vec_id"], r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            emb, num_centroids=4, min_sim=0.95, max_cell_size=None, store=store2
        ).collect()
    }
    assert first == second
    nostore = {
        (r["vec_id"], r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            emb, num_centroids=4, min_sim=0.95, max_cell_size=None
        ).collect()
    }
    assert first == nostore


def test_ivf_assign_methods_agree_on_planted(spark):
    emb = _planted_embeddings(spark, n=32, dim=8, n_dups=0)
    a = {r["vec_id"]: r["cid"] for r in ivf_assign(emb, 4, method="sql").collect()}
    b = {r["vec_id"]: r["cid"] for r in ivf_assign(emb, 4, method="matmul").collect()}
    assert a == b


def test_semantic_dedup_pair_methods_agree(spark):
    # the BLAS gram-matrix pair scorer (scale path) must reproduce the
    # SQL scorer's keep-list exactly (same 6-dp threshold semantics)
    emb = _planted_embeddings(spark, n=40, dim=8, n_dups=6)
    sql = {
        (r["vec_id"], r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            emb, num_centroids=4, min_sim=0.95, pair_method="sql"
        ).collect()
    }
    mm = {
        (r["vec_id"], r["cluster_id"], r["keep"])
        for r in semantic_dedup(
            emb, num_centroids=4, min_sim=0.95, pair_method="matmul"
        ).collect()
    }
    assert sql == mm
    assert any(not k for (_, _, k) in mm)  # the planted dups actually paired
