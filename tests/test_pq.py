"""Product quantization (PQ/ADC) — encode parity and serving quality.

Jégou et al. (TPAMI 2011): the index stores M small codes per vector;
queries pay an M×K lookup-table build plus M adds per database vector.
These tests pin (a) sql-vs-matmul encode agreement (the oracle-exact JVM
path vs the Arrow BLAS scale path), (b) ADC ranking quality against the
exact brute-force ordering on a clustered fixture, and (c) the in-gate
configuration's oracle parity is covered by tools/gatecheck.py (pq_knn).
"""

from __future__ import annotations

import numpy as np
import pytest

N = 400
DIM = 32
M = 4
K = 8


@pytest.fixture(scope="module")
def clustered(spark):
    """Vectors drawn around 8 well-separated anchors so quantization
    preserves neighborhood structure (ADC on pure noise is meaningless)."""
    rng = np.random.RandomState(11)
    anchors = rng.randn(8, DIM) * 3.0
    vecs = anchors[np.arange(N) % 8] + rng.randn(N, DIM) * 0.3
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    df = df.persist()
    df.count()
    yield df, vecs
    df.unpersist()


def test_encode_sql_matmul_agree(spark, clustered):
    from linkgraph.similarity import pq_encode

    df, _ = clustered
    a = {(r.vec_id, r.m): r.code for r in pq_encode(df, M, K, "sql").collect()}
    b = {(r.vec_id, r.m): r.code for r in pq_encode(df, M, K, "matmul").collect()}
    assert a == b
    assert len(a) == N * M


def test_encode_shape_and_range(spark, clustered):
    from linkgraph.similarity import pq_encode

    df, _ = clustered
    rows = pq_encode(df, M, K).collect()
    assert {r.m for r in rows} == set(range(M))
    assert all(0 <= r.code < K for r in rows)


def test_adc_topk_stays_in_query_cluster(spark, clustered):
    """With K codes ≈ the number of anchors, quantization collapses each
    cluster to (nearly) one codeword per subspace, so all same-cluster
    vectors share one ADC distance and ties break by vec_id — per-vector
    recall@10 vs exact L2 is therefore NOT the right metric. The
    guarantee ADC does give is neighborhood preservation: the top-10 for
    a cluster-0 query must come from cluster 0 (vec_id % 8 == 0)."""
    from linkgraph.similarity import pq_topk

    df, vecs = clustered
    got = [r.vec_id for r in pq_topk(df, query_vec_id=0, k=10, num_subspaces=M,
                                     codes_per_subspace=K).collect()]
    assert len(got) == 10 and 0 not in got
    in_cluster = sum(1 for v in got if v % 8 == 0)
    assert in_cluster >= 9


def test_adc_query_excluded_and_sorted(spark, clustered):
    from linkgraph.similarity import pq_topk

    df, _ = clustered
    rows = pq_topk(df, query_vec_id=3, k=15, num_subspaces=M,
                   codes_per_subspace=K).collect()
    assert all(r.vec_id != 3 for r in rows)
    dists = [r.adist for r in rows]
    assert dists == sorted(dists)


def test_bad_subspace_split_raises(spark, clustered):
    from linkgraph.similarity import pq_topk

    df, _ = clustered
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(df, query_vec_id=0, num_subspaces=5)


def test_pq_index_roundtrip_and_batch_parity(spark, clustered, tmp_path):
    """write_pq_index → read_pq_seeds roundtrip, and the one-scan batch
    ADC server must return exactly what per-query pq_topk returns
    (same (adist, vec_id) order, self excluded) — the threshold-mask
    candidate cut keeps boundary ties, so parity is exact even on this
    tie-heavy small-K fixture."""
    from linkgraph.similarity import (
        pq_codebooks,
        pq_index_topk_batch,
        pq_topk,
        read_pq_seeds,
        write_pq_index,
    )

    df, vecs = clustered
    path = str(tmp_path / "pqidx")
    seeds = write_pq_index(df, path, num_subspaces=M, codes_per_subspace=K)
    back = read_pq_seeds(spark, path)
    assert np.array_equal(seeds, back)
    assert np.array_equal(seeds, pq_codebooks(df, K))

    queries = {0: [float(x) for x in vecs[0]], 7: [float(x) for x in vecs[7]]}
    batch = pq_index_topk_batch(spark, path, seeds, queries, k=10, num_subspaces=M)
    got = {
        qid: [(r.vec_id, r.adist) for r in rows]
        for qid, rows in pd_groupby(batch)
    }
    for qid in queries:
        solo = pq_topk(df, query_vec_id=qid, k=10, num_subspaces=M,
                       codes_per_subspace=K).collect()
        assert got[qid] == [(r.vec_id, r.adist) for r in solo], f"query {qid}"


def pd_groupby(batch_df):
    rows = batch_df.orderBy("query_id", "adist", "vec_id").collect()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r.query_id, []).append(r)
    return out.items()


def test_pq_rerank_restores_exact_neighbors(spark, clustered, tmp_path):
    """ADC + exact re-rank (Jégou et al. IVFADC+R): with a shortlist
    covering the whole fixture (R large), the result must equal the
    exact L2 top-k — re-rank eliminates quantization error entirely
    when the shortlist holds the true neighbors."""
    from linkgraph.similarity import pq_index_topk_batch, write_pq_index

    df, vecs = clustered
    path = str(tmp_path / "pqrr")
    seeds = write_pq_index(df, path, num_subspaces=M, codes_per_subspace=K)
    queries = {0: [float(x) for x in vecs[0]]}
    got = [
        (r.vec_id, r.adist)
        for r in pq_index_topk_batch(
            spark, path, seeds, queries, k=10, num_subspaces=M,
            rerank_embeddings=df, rerank_factor=N,  # shortlist ⊇ corpus
        ).orderBy("adist", "vec_id").collect()
    ]
    d = np.sum((vecs.astype(np.float32).astype(np.float64)
                - vecs[0].astype(np.float32).astype(np.float64)) ** 2, axis=1)
    d[0] = np.inf
    exact = sorted(range(len(d)), key=lambda i: (round(d[i], 6), i))[:10]
    assert [v for v, _ in got] == exact
