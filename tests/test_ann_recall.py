"""Multi-band (OR-amplified) embedding LSH — recall on planted near-dups.

VERDICT r02 'Next round' #3: single-band sign-LSH recall falls
geometrically with num_bits; banding (b independent plane sets, union of
bucket joins — the embedding twin of docs.py's minhash banding) must
recover it. The fixture plants near-dup vector pairs at cosine ≈ 0.97
(angle ≈ 0.24 rad), where a single 8-bit band retains only ~(1-θ/π)^8 ≈
0.53 of pairs — low enough that amplification is measurably load-bearing.
"""

from __future__ import annotations

import numpy as np
import pytest

N_BASE = 600
N_DUPS = 100
DIM = 32
NOISE = 0.25  # ||noise||/||base|| → planted cosine ≈ 1/sqrt(1+ε²) ≈ 0.970


@pytest.fixture(scope="module")
def planted(spark):
    """(df, planted_pairs): N_BASE random unit-ish vectors; vector
    N_BASE+i is base[i] plus gaussian noise (cosine ≈ 0.97)."""
    rng = np.random.RandomState(7)
    base = rng.randn(N_BASE, DIM)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.randn(N_DUPS, DIM)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    dups = base[:N_DUPS] + NOISE * noise
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)] + [
        (N_BASE + i, [float(x) for x in v]) for i, v in enumerate(dups)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df = df.repartition(8).persist()
    df.count()
    pairs = {(i, N_BASE + i) for i in range(N_DUPS)}
    yield df, pairs
    df.unpersist()


def _recall(found_df, planted_pairs):
    got = {
        (min(r["vec_a"], r["vec_b"]), max(r["vec_a"], r["vec_b"]))
        for r in found_df.collect()
    }
    return len(got & planted_pairs) / len(planted_pairs)


def test_multiband_recall_meets_bar(spark, planted):
    """Banded cosine_dup_pairs at num_bits=8 must reach recall >= 0.95 —
    the round-3 'done' bar — where a single band demonstrably cannot."""
    from linkgraph.similarity import cosine_dup_pairs

    df, pairs = planted
    single = cosine_dup_pairs(
        df, min_sim=0.9, num_bits=8, num_bands=1, max_bucket_size=None
    )
    multi = cosine_dup_pairs(
        df, min_sim=0.9, num_bits=8, num_bands=8, max_bucket_size=None
    )
    r1 = _recall(single, pairs)
    r8 = _recall(multi, pairs)
    # analytic single-band recall ~0.53 at cos 0.97 / 8 bits; 100 planted
    # pairs → std ~5pp, so 0.80 is a >5-sigma ceiling
    assert r1 < 0.80, f"single-band recall {r1} — fixture not adversarial enough"
    assert r8 >= 0.95, f"multi-band recall {r8} < 0.95"
    assert r8 >= r1


def test_multiband_recall_monotone_in_bands(spark, planted):
    """Recall is (statistically) monotone in the band count — the recall
    curve the OR-amplification formula 1-(1-p)^b predicts."""
    from linkgraph.similarity import cosine_dup_pairs

    df, pairs = planted
    recalls = [
        _recall(
            cosine_dup_pairs(
                df, min_sim=0.9, num_bits=8, num_bands=b, max_bucket_size=None
            ),
            pairs,
        )
        for b in (1, 4, 8)
    ]
    # allow sampling noise but require a clearly rising curve
    assert recalls[1] >= recalls[0] + 0.1
    assert recalls[2] >= recalls[1]


def test_multiband_pairs_scored_once(spark, planted):
    """A pair colliding in several bands must appear exactly once."""
    from linkgraph.similarity import cosine_dup_pairs

    df, _ = planted
    out = cosine_dup_pairs(
        df, min_sim=0.9, num_bits=8, num_bands=8, max_bucket_size=None
    )
    rows = out.groupBy("vec_a", "vec_b").count().filter("count > 1").count()
    assert rows == 0


def test_multiband_lsh_topk_beats_single_band(spark, planted):
    """lsh_cosine_topk with bands finds the planted neighbor for queries
    a single band misses; every returned neighbor is exact-cosine-scored."""
    from linkgraph.similarity import cosine_topk, lsh_cosine_topk

    df, _ = planted
    hits_1 = hits_8 = 0
    queries = list(range(20))  # query base[i]; planted neighbor N_BASE+i
    for q in queries:
        want = N_BASE + q
        top1 = [
            r["vec_id"]
            for r in lsh_cosine_topk(
                df, query_vec_id=q, k=1, num_bits=8, num_bands=1
            ).collect()
        ]
        top8 = [
            r["vec_id"]
            for r in lsh_cosine_topk(
                df, query_vec_id=q, k=1, num_bits=8, num_bands=8
            ).collect()
        ]
        hits_1 += want in top1
        hits_8 += want in top8
    assert hits_8 >= 19  # near-perfect recall with 8 bands
    assert hits_8 > hits_1  # amplification is load-bearing on this fixture
    # spot-check scores agree with brute force for one query
    brute = cosine_topk(df, query_vec_id=0, k=1).collect()[0]
    approx = lsh_cosine_topk(df, query_vec_id=0, k=1, num_bits=8, num_bands=8).collect()[0]
    assert approx["vec_id"] == brute["vec_id"]
    assert abs(approx["sim"] - brute["sim"]) < 1e-9


def test_multiband_index_partition_pruning(spark, planted, tmp_path):
    """write_ann_index(num_bands=3) + ann_index_topk: the scan reads only
    the query's (band, bucket) partitions and dedups cross-band hits."""
    from linkgraph.similarity import (
        ann_index_topk,
        query_band_buckets,
        write_ann_index,
    )

    df, _ = planted
    path = str(tmp_path / "annidx")
    write_ann_index(df, path, num_bits=4, dim=DIM, num_bands=3)
    qv = df.filter("vec_id = 0").collect()[0]["embedding"]
    out = ann_index_topk(
        spark, path, qv, k=5, num_bits=4, num_bands=3, exclude_vec_id=0
    )
    rows = out.collect()
    assert rows and rows[0]["vec_id"] == N_BASE  # planted dup of base[0]
    # pruning: the scan carries PartitionFilters on band AND bucket —
    # applied at file listing (inputFiles() reports the PRE-pruning list,
    # so inspect the executed plan, as test_ann_index_partition_pruning does)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines, plan
    assert any(
        "band" in l and "bucket" in l and "[]" not in l.split("PartitionFilters:")[1][:80]
        for l in pf_lines
    ), pf_lines
    # the driver-side bucket routing agrees with the stored partitions:
    # every returned row lives in one of the query's (band, bucket) cells
    qbs = query_band_buckets(qv, num_bits=4, num_bands=3)
    stored = spark.read.parquet(path)
    cond = None
    for b, qb in enumerate(qbs):
        c = f"(band = {b} AND bucket = {qb})"
        cond = c if cond is None else f"{cond} OR {c}"
    in_cells = {r["vec_id"] for r in stored.filter(cond).collect()}
    assert all(r["vec_id"] in in_cells for r in rows)
    # no duplicate vec_ids despite multi-band collisions
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_knn_join_finds_planted_neighbors(spark, planted):
    """Batch k-NN join: with 8 bands, each planted dup's rank-1 neighbor
    must be its base vector (and vice versa) for nearly all pairs; ranks
    are dense from 1 and capped at k."""
    from linkgraph.similarity import lsh_knn_join

    df, pairs = planted
    out = lsh_knn_join(
        df, k=3, num_bits=8, num_bands=8, max_bucket_size=None
    ).collect()
    top1 = {r["vec_id"]: r["nbr_id"] for r in out if r["rank"] == 1}
    hits = sum(top1.get(a) == b and top1.get(b) == a for a, b in pairs)
    assert hits >= 0.95 * len(pairs)
    # rank integrity: per vec_id, ranks are 1..n (n <= k), no duplicates
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(r["rank"])
    for vid, ranks in by_vec.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (vid, ranks)
        assert len(ranks) <= 3


def test_knn_classify_majority_and_tiebreak(spark):
    # 2-D toy: queries 0/1 sit near label-0 and label-1 clusters;
    # query 2 is equidistant-ish so k=2 forces a 1-1 tie -> smaller label
    import numpy as np

    rows = [
        (0, [1.0, 0.0], 9),     # query A (own label never votes for itself)
        (1, [0.0, 1.0], 9),     # query B
        (2, [1.0, 1.0], 9),     # query C: tie between labels 0 and 1
        (10, [0.9, 0.1], 0),
        (11, [0.95, 0.05], 0),
        (12, [0.1, 0.9], 1),
        (13, [0.05, 0.95], 1),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    from linkgraph.similarity import knn_classify

    got = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(df, query_ids=[0, 1, 2], k=2).collect()
    }
    assert got[0] == (0, 2)
    assert got[1] == (1, 2)
    # query 2: nearest two are one from each cluster (cos sim symmetric),
    # 1-1 vote -> smaller label wins
    assert got[2] == (0, 1)


def test_knn_classify_matches_numpy_vote(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n, d = 120, 16
    vecs = rng.normal(size=(n, d))
    labels = rng.integers(0, 4, size=n)
    df = spark.createDataFrame(
        [
            (int(i), [float(x) for x in vecs[i]], int(labels[i]))
            for i in range(n)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    from linkgraph.similarity import knn_classify

    qids, k = [0, 5, 17, 42], 7
    got = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(df, query_ids=qids, k=k).collect()
    }
    # float32 storage: replicate through the same dtype truncation
    v32 = vecs.astype(np.float32).astype(np.float64)
    norms = np.linalg.norm(v32, axis=1)
    for q in qids:
        sims = np.round((v32 @ v32[q]) / (norms * norms[q]), 6)
        order = sorted(
            (i for i in range(n) if i != q), key=lambda i: (-sims[i], i)
        )[:k]
        votes: dict[int, int] = {}
        for i in order:
            votes[int(labels[i])] = votes.get(int(labels[i]), 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        assert got[q] == (pred, votes[pred]), q


def test_knn_classify_matmul_path_agrees_with_sql(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    from linkgraph.similarity import knn_classify

    qids = [0, 13, 77, 240, 499]
    a = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(emb, query_ids=qids, k=7).collect()
    }
    b = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(emb, query_ids=qids, k=7, score="matmul").collect()
    }
    assert a == b
