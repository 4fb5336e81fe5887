"""Document operators: planted-fixture semantics for dedup, token stats,
minhash/LSH, simhash, n-gram Jaccard, and cosine similarity search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.docs import (
    dedup_clusters,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_dropped_buckets,
    ngram_jaccard_pairs,
    simhash,
    token_stats,
)
from linkgraph.similarity import cosine_topk, lsh_cosine_topk

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "to find a quiet place in the deep green forest of the north"
)
NEAR = BASE.replace("quiet", "silent")  # one token differs
OTHER = "completely different content about spark shuffles and partitions " * 3


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, BASE, "en", "s", len(BASE)),
        (1, BASE, "en", "s", len(BASE)),       # exact dup of 0
        (2, NEAR, "en", "s", len(NEAR)),       # near dup of 0
        (3, OTHER, "en", "s", len(OTHER)),
        (4, "tiny", "en", "s", 4),             # shorter than shingle k
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup(spark, docs_df):
    got = {(r["doc_id"], r["n"]) for r in exact_dedup(docs_df).collect()}
    assert got == {(0, 2), (2, 1), (3, 1), (4, 1)}
    got_h = {(r["doc_id"], r["n"]) for r in exact_dedup(docs_df, by_hash=True).collect()}
    assert got_h == got


def test_token_stats(spark, docs_df):
    row = {r["doc_id"]: r for r in token_stats(docs_df).collect()}
    toks = BASE.lower().split()
    assert row[0]["n_tokens"] == len(toks)
    assert row[0]["n_chars"] == len(BASE)
    assert row[0]["mean_token_len"] == pytest.approx(
        sum(len(t) for t in toks) / len(toks), abs=1e-6
    )
    stop = {"the", "of", "and", "a", "to", "in", "is", "it", "that", "for"}
    assert row[0]["stopword_ratio"] == pytest.approx(
        sum(t in stop for t in toks) / len(toks), abs=1e-6
    )
    assert row[4]["n_tokens"] == 1
    # BPE-ish + punct columns (round 3): pin on a crafted doc
    import re

    crafted = spark.createDataFrame(
        [(9, "Don't count 123 twice!! ok", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r9 = token_stats(crafted).collect()[0]
    want_bpe = re.findall(
        r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+",
        "Don't count 123 twice!! ok",
    )
    # Don | 't | count | 123 | twice | !! | ok
    assert r9["n_bpe_tokens"] == len(want_bpe) == 7
    # punct chars: ' ! ! → 3 of 26 chars
    assert r9["punct_ratio"] == pytest.approx(3 / 26, abs=1e-6)


def test_minhash_pairs(spark, docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_candidate_pairs(docs_df, num_hashes=32, bands=8).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs: identical signatures
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5  # near dup caught
    assert not any(3 in p for p in pairs)  # unrelated doc never paired


def test_simhash(spark, docs_df):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs_df).collect()}
    assert fp[0] == fp[1]  # identical docs

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(fp[0], fp[2]) < hamming(fp[0], fp[3])
    assert hamming(fp[0], fp[2]) <= 8  # near dup: few bits flip


def _py_shingles(text, k=5):
    t = text.lower().split()
    if len(t) <= k:
        return {" ".join(t[i : i + k]) for i in range(max(len(t) - k, 0) + 1)}
    return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}


def test_ngram_jaccard_exact(spark, docs_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, k=5, min_jaccard=0.1).collect()
    }
    texts = {0: BASE, 1: BASE, 2: NEAR, 3: OTHER, 4: "tiny"}
    want = {}
    for a in texts:
        for b in texts:
            if a < b:
                sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
                inter = len(sa & sb)
                if inter:
                    j = inter / len(sa | sb)
                    if j >= 0.1:
                        want[(a, b)] = round(j, 6)
    assert got.keys() == want.keys()
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-6)


def test_md5_60_parity_spark_vs_duckdb(spark):
    """The cross-engine fingerprint primitive: Spark's
    conv(substr(md5,1,15),16,10) must equal DuckDB's
    CAST('0x'||substr(md5,1,15) AS BIGINT) — this equality is what makes
    every near-dup oracle value-checked instead of rows-only."""
    import duckdb

    from linkgraph.docs import _md5_60

    vals = ["hello", "the quick brown fox", "", "Ünïcödé ✓", "123,456"]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = {
        r["x"]: r["h"] for r in df.select("x", _md5_60("x").alias("h")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == want, v


def _boilerplate_docs(spark, n_dups=40):
    """A corpus where one license-header text is shared by n_dups docs —
    the pathological bucket SCALING.md cliff #3 describes."""
    header = "permission is hereby granted free of charge to any person obtaining a copy of this software"
    rows = [(i, header, "en", "s", len(header)) for i in range(n_dups)]
    rows.append((1000, "an unrelated document about shuffle partitioning in spark", "en", "s", 10))
    rows.append((1001, "another unrelated text mentioning catalyst and tungsten engines", "en", "s", 10))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_bucket_cap_prevents_quadratic_blowup(spark):
    bp = _boilerplate_docs(spark, n_dups=40)
    # uncapped: the boilerplate bucket self-joins to 40*39/2 pairs
    uncapped = minhash_candidate_pairs(bp, max_bucket_size=None)
    assert uncapped.count() == 40 * 39 // 2
    # capped below the boilerplate group: those buckets drop entirely
    capped = minhash_candidate_pairs(bp, max_bucket_size=10)
    assert capped.count() == 0
    # and the audit trail reports exactly the dropped buckets (one per
    # band: all 40 identical docs share every band bucket)
    dropped = minhash_dropped_buckets(bp, max_bucket_size=10).collect()
    assert len(dropped) == 8  # bands=8
    assert all(r["size"] == 40 for r in dropped)
    # a cap above the group keeps everything
    assert minhash_candidate_pairs(bp, max_bucket_size=64).count() == 40 * 39 // 2
    # audit is empty when nothing dropped
    assert minhash_dropped_buckets(bp, max_bucket_size=64).count() == 0


def test_ngram_jaccard_stop_shingle_cap(spark):
    bp = _boilerplate_docs(spark, n_dups=40)
    # exact: all 780 boilerplate pairs at jaccard 1.0
    assert ngram_jaccard_pairs(bp, min_jaccard=0.5).count() == 40 * 39 // 2
    # max_doc_freq below 40 drops the boilerplate shingles from the index
    assert ngram_jaccard_pairs(bp, min_jaccard=0.5, max_doc_freq=10).count() == 0


def test_dedup_clusters_transitive_and_keeplist(spark):
    """A≈B and B≈C near-dups must land in ONE cluster even though A and C
    may never share a bucket; keep = min doc_id of the cluster."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to find a quiet place in the deep green forest of the north "
        "while the winter wind blows cold across the silent frozen river"
    )
    chain_b = base.replace("quiet", "silent2")
    chain_c = chain_b.replace("winter", "summer")
    rows = [
        (0, base, "en", "s", 1),
        (1, base, "en", "s", 1),        # exact dup of 0
        (2, chain_b, "en", "s", 1),     # near dup of 0/1
        (3, chain_c, "en", "s", 1),     # near dup of 2, farther from 0
        (4, "a completely different tiny note", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in dedup_clusters(df, min_jaccard=0.5).collect()}
    assert got[0] == (0, True)
    assert got[1] == (0, False)
    assert got[2] == (0, False)
    assert got[3] == (0, False)  # transitive: joined via 2
    assert got[4] == (4, True)   # singleton keeps itself


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.normal(size=16).astype(np.float32)  # near 0
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return df, vecs


def test_cosine_topk_matches_numpy(spark, emb_df):
    df, vecs = emb_df
    got = [(r["vec_id"], r["sim"]) for r in cosine_topk(df, 0, k=5).collect()]
    v = vecs.astype(np.float64)
    sims = v @ v[0] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    order = sorted(
        ((round(s, 6), i) for i, s in enumerate(sims) if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    want = [(i, s) for s, i in order]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=2e-6)
    assert got[0][0] == 1  # the planted near-duplicate vector wins


def test_lsh_topk_subset_of_exact_scores(spark, emb_df):
    df, vecs = emb_df
    exact = {r["vec_id"]: r["sim"] for r in cosine_topk(df, 0, k=49).collect()}
    approx = [(r["vec_id"], r["sim"]) for r in lsh_cosine_topk(df, 0, k=5, num_bits=2, dim=16).collect()]
    assert approx, "query bucket must contain at least the near-duplicate"
    for vid, sim in approx:
        assert exact[vid] == pytest.approx(sim, abs=1e-6)  # same scores


def test_lsh_buckets_match_numpy(spark, emb_df):
    """The pandas-UDF bucket equals a direct NumPy evaluation of the same
    md5-seeded planes — pins the UDF's batch matmul semantics."""
    from linkgraph.similarity import hyperplane_buckets, plane_matrix

    df, vecs = emb_df
    got = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(df, num_bits=6, dim=16).collect()}
    planes = plane_matrix(6, 16)
    v = vecs.astype(np.float64)
    want = ((v @ planes.T) >= 0.0) @ (1 << np.arange(6))
    for i in range(len(v)):
        assert got[i] == int(want[i])


def test_lsh_dim_1024(spark):
    """Regression for VERDICT r01 'What's wrong' #1: at dim=1024 the old
    inline bucket expression generated ~25k hash calls in one SQL string
    (Catalyst codegen blowup). The pandas-UDF path must handle 1024 dims
    with a plan whose size is dimension-independent."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 1024)).astype(np.float32)
    vecs[7] = vecs[0] + 0.01 * rng.normal(size=1024).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = [(r["vec_id"], r["sim"]) for r in lsh_cosine_topk(df, 0, k=5, num_bits=8).collect()]
    assert got and got[0][0] == 7  # planted near-dup lands in the bucket and wins
    # wrong-dim input fails loudly, not silently
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    with pytest.raises(Exception, match="dim"):
        lsh_cosine_topk(bad.unionByName(df), 0, k=5, num_bits=8, dim=1024).collect()


def test_cosine_dup_pairs(spark, emb_df):
    """Bucketed embedding near-dup pairs: the planted near-identical pair
    (0,1) must survive bucketing and score ~1; scores match NumPy; a
    bucket cap below the bucket sizes empties the result."""
    from linkgraph.similarity import cosine_dup_pairs

    df, vecs = emb_df
    got = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in cosine_dup_pairs(df, min_sim=0.9, num_bits=2, dim=16).collect()
    }
    assert (0, 1) in got
    v = vecs.astype(np.float64)
    want = float(v[0] @ v[1] / (np.linalg.norm(v[0]) * np.linalg.norm(v[1])))
    assert got[(0, 1)] == pytest.approx(round(want, 6), abs=2e-6)
    # every reported pair really is >= the threshold under exact cosine
    for (a, b), s in got.items():
        exact = float(v[a] @ v[b] / (np.linalg.norm(v[a]) * np.linalg.norm(v[b])))
        assert s == pytest.approx(round(exact, 6), abs=2e-6) and s >= 0.9
    # cap below bucket sizes drops everything (boilerplate guard wired in)
    assert cosine_dup_pairs(df, min_sim=0.9, num_bits=2, dim=16, max_bucket_size=1).count() == 0


def test_ann_index_partition_pruning(spark, emb_df, tmp_path):
    """write_ann_index + ann_index_topk: the query scan must touch ONLY
    the query bucket's files (hive partition pruning), and the results
    must equal the recompute-everything lsh_cosine_topk path."""
    from linkgraph.similarity import ann_index_topk, write_ann_index

    df, vecs = emb_df
    path = str(tmp_path / "ann")
    write_ann_index(df, path, num_bits=2, dim=16)
    got = ann_index_topk(
        spark, path, vecs[0].astype(float).tolist(), k=5, num_bits=2, exclude_vec_id=0
    )
    rows = [(r["vec_id"], r["sim"]) for r in got.collect()]
    want = [
        (r["vec_id"], r["sim"])
        for r in lsh_cosine_topk(df, 0, k=5, num_bits=2, dim=16).collect()
    ]
    assert rows == want
    # pruning: the scan must carry a PartitionFilters entry on bucket —
    # the filter is applied at file listing, before any bytes are read
    # (inputFiles() reports the PRE-pruning candidate list, so inspect
    # the executed plan instead)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines, plan
    assert any("bucket" in l and "[]" not in l.split("PartitionFilters:")[1][:60] for l in pf_lines)


# ------------------------------------------------- winnowing fingerprints
def test_fingerprints_shared_passage_guarantee(spark):
    """Winnowing guarantee (SIGMOD'03): two docs sharing a substring of
    length >= k + window - 1 share at least one fingerprint; disjoint
    texts share none (modulo md5 collisions)."""
    from linkgraph.docs import fingerprints

    passage = "zqxjkwvbnmpl_shared_passage_zyxwvut"  # 35 chars >= 8+4-1
    rows = [
        (0, "aaaa bbbb " + passage + " cccc dddd", "en", "s", 0),
        (1, "1111 2222 3333 " + passage + " 4444", "en", "s", 0),
        (2, "totally unrelated content with no overlap at all", "en", "s", 0),
        (3, "short", "en", "s", 0),  # < k chars → no k-grams → no rows
        (4, "abcdefghij", "en", "s", 0),  # 3 k-grams < window → 1 clipped window
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fp = fingerprints(df, k=8, window=4)
    by_doc = {
        d: {r["fp"] for r in rs}
        for d, rs in __import__("itertools").groupby(
            sorted(fp.collect(), key=lambda r: r["doc_id"]), key=lambda r: r["doc_id"]
        )
    }
    assert by_doc[0] & by_doc[1], "shared passage must yield a shared fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert 3 not in by_doc
    assert len(by_doc[4]) == 1  # single clipped window → exactly one fp


def test_fingerprints_density(spark):
    """Winnowing keeps ~2/(window+1) of positions — far fewer than one fp
    per k-gram (that's the point: sublinear sketch), but at least
    n_kgrams/window (a window min changes at most every window steps)."""
    from linkgraph.docs import fingerprints

    text = "the quick brown fox jumps over the lazy dog " * 20
    df = spark.createDataFrame(
        [(0, text, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    n_kgrams = len(text) - 8 + 1
    n_fp = fingerprints(df, k=8, window=4).count()
    assert n_fp < n_kgrams / 2
    assert n_fp >= 1


def test_fingerprint_overlap_pairs_and_boilerplate_cap(spark):
    from linkgraph.docs import fingerprint_overlap_pairs

    passage = "zqxjkwvbnmpl_shared_passage_zyxwvut_even_longer_for_more_fps"
    boiler = "license header apache 2024 all rights reserved "
    rows = [(i, boiler + f" unique tail {i} " + ("x%d" % i) * 5, "en", "s", 0) for i in range(6)]
    rows += [
        (10, "aaaa bbbb " + passage + " cccc", "en", "s", 0),
        (11, "1111 2222 " + passage + " 3333", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in fingerprint_overlap_pairs(df, k=8, window=4, min_shared=2).collect()
    }
    assert (10, 11) in pairs
    # boilerplate guard: fps in >2 docs dropped → the 6 boiler docs (whose
    # only overlap IS the boilerplate) stop pairing; the planted pair stays
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in fingerprint_overlap_pairs(
            df, k=8, window=4, min_shared=2, max_fp_doc_freq=2
        ).collect()
    }
    assert (10, 11) in capped
    assert not any(a < 6 and b < 6 for a, b in capped)


# --------------------------------------------------------------- IVF ANN
def test_ivf_topk_exact_within_probed_cells(spark, emb_df):
    """Every (vec_id, sim) ivf_topk returns carries the EXACT cosine score
    (rerank is exact within probed cells), and with nprobe = num_centroids
    the result equals brute-force cosine_topk."""
    from linkgraph.similarity import ivf_topk

    df, vecs = emb_df
    v = vecs.astype(np.float64)
    exact = {r["vec_id"]: r["sim"] for r in cosine_topk(df, 0, k=49).collect()}
    got = [(r["vec_id"], r["sim"]) for r in ivf_topk(df, 0, k=5, num_centroids=8, nprobe=2).collect()]
    assert got, "probed cells must be non-empty"
    for vid, sim in got:
        assert exact[vid] == pytest.approx(sim, abs=1e-6)
    full = [(r["vec_id"], r["sim"]) for r in ivf_topk(df, 0, k=5, num_centroids=8, nprobe=8).collect()]
    brute = [(r["vec_id"], r["sim"]) for r in cosine_topk(df, 0, k=5).collect()]
    assert full == brute
    assert got[0][0] == 1  # near-duplicate shares the query's cell


def test_ivf_assign_sql_vs_matmul_agree(spark, emb_df):
    from linkgraph.similarity import ivf_assign

    df, _ = emb_df
    a = {r["vec_id"]: r["cid"] for r in ivf_assign(df, num_centroids=8, method="sql").collect()}
    b = {r["vec_id"]: r["cid"] for r in ivf_assign(df, num_centroids=8, method="matmul").collect()}
    assert a == b  # ties within float rounding have measure ~0 on gaussians


def test_ivf_lloyd_refinement_runs_and_tightens(spark, emb_df):
    """lloyd_iters > 0 must not break assignment, and mean within-cell
    cosine-to-centroid must not get worse (kmeans monotonicity, modulo
    the cosine-vs-euclidean objective mismatch — assert no collapse)."""
    from linkgraph.similarity import _centroid_df, _ivf_assign, ivf_centroids

    df, vecs = emb_df
    v = vecs.astype(np.float64)

    def mean_sim(iters):
        cents = ivf_centroids(df, num_centroids=4, lloyd_iters=iters)
        assign = {
            r["vec_id"]: r["cid"]
            for r in _ivf_assign(df, _centroid_df(spark, cents), "vec_id", "embedding").collect()
        }
        sims = []
        for vid, cid in assign.items():
            c = cents[cid]
            sims.append(v[vid] @ c / (np.linalg.norm(v[vid]) * np.linalg.norm(c)))
        return float(np.mean(sims))

    s0, s2 = mean_sim(0), mean_sim(2)
    assert s2 >= s0 - 0.05


def test_ivf_index_partition_pruning(spark, emb_df, tmp_path):
    """write_ivf_index + ivf_index_topk: scan reads only probed cells'
    files; results equal the in-memory ivf_topk path."""
    from linkgraph.similarity import ivf_index_topk, ivf_topk, write_ivf_index

    df, vecs = emb_df
    path = str(tmp_path / "ivf")
    cents = write_ivf_index(df, path, num_centroids=8, method="sql")
    got = ivf_index_topk(
        spark, path, cents, vecs[0].astype(float).tolist(), k=5, nprobe=2, exclude_vec_id=0
    )
    rows = [(r["vec_id"], r["sim"]) for r in got.collect()]
    want = [
        (r["vec_id"], r["sim"])
        for r in ivf_topk(df, 0, k=5, num_centroids=8, nprobe=2).collect()
    ]
    assert rows == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines, plan
    assert any("cid" in l and "[]" not in l.split("PartitionFilters:")[1][:60] for l in pf_lines)


def test_components_long_chain_converges(spark):
    """A serial near-dup edit chain longer than the round bound must still
    converge (pointer jumping gives O(log diameter) rounds; plain one-hop
    hash-min would need 80 rounds here and previously crashed at 50)."""
    from linkgraph.docs import _components_over_pairs

    n = 81
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = _components_over_pairs(pairs, max_iterations=50)
    rows = got.collect()
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} == {0}  # one chain, min-id root


def test_shingle_stream_tokenize_once_parity(spark):
    """Round-3 minhash speedup A/B: the tokenize-once shingle expression
    (lambda-bound token array) must emit BYTE-IDENTICAL (doc_id, shingle)
    multisets to the original formulation that re-split inside the
    per-position lambda — the 5.6x speedup is free only if this holds."""
    from linkgraph import docs as docmod
    from pyspark.sql import functions as F

    rows = [
        (0, "  leading and trailing   spaces\tplus tabs  ", "en", "s", 0),
        (1, "UPPER lower MiXeD case tokens repeated repeated repeated", "en", "s", 0),
        (2, "one two three four five six seven eight nine ten", "en", "s", 0),
        (3, "short", "en", "s", 0),
        (4, "a  b   c    d     e      f", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    k = 5
    old_expr = (
        f"transform(sequence(0, greatest(size({docmod._TOKENIZE}) - {k}, 0)), "
        f"i -> array_join(slice({docmod._TOKENIZE}, i + 1, {k}), ' '))"
    )
    old = docs.select(
        "doc_id", F.explode(F.expr(old_expr)).alias("shingle")
    )
    new = docmod._shingle_stream(docs, k)
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))


def test_quality_filter_thresholds(spark):
    """C4-style gate: each threshold independently rejects its crafted
    violator; a clean doc passes; an empty doc yields NULL keep (no
    stats) rather than a silent True."""
    from linkgraph.docs import quality_filter

    good = " ".join(["alpha", "beta", "gamma", "the", "delta"] * 4)  # 20 toks
    rows = [
        (0, good, "en", "s", 0),
        (1, "too short", "en", "s", 0),                     # < min_tokens
        (2, " ".join(["x"] * 30), "en", "s", 0),            # mean len 1 < 2
        (3, " ".join(["!!!???!!!"] * 20), "en", "s", 0),    # punct-heavy
        (4, "", "en", "s", 0),  # empty → split yields [""], 1 token → short
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["doc_id"]: r["keep"] for r in quality_filter(df).collect()}
    assert got[0] is True
    assert got[1] is False and got[2] is False and got[3] is False
    assert got[4] is False
    # semi-join composition keeps exactly the good doc
    kept = df.join(
        quality_filter(df).filter("keep"), "doc_id", "left_semi"
    ).collect()
    assert [r["doc_id"] for r in kept] == [0]


def test_sample_documents_deterministic_and_partition_invariant(spark):
    """The hash sample must (a) be identical across repartitionings —
    df.sample is not — (b) hit ~rate, (c) give disjoint-seed samples
    that are independent, (d) nest: a larger rate's set contains the
    smaller's (threshold monotonicity)."""
    from linkgraph.docs import sample_documents

    n = 2000
    df = spark.range(n).selectExpr(
        "id AS doc_id", "concat('text ', id) AS text", "'en' AS lang",
        "'s' AS source", "CAST(0 AS LONG) AS n_chars"
    )
    s1 = {r["doc_id"] for r in sample_documents(df, 0.3).collect()}
    s2 = {r["doc_id"] for r in sample_documents(df.repartition(17), 0.3).collect()}
    assert s1 == s2  # partition-layout invariant
    assert 0.25 * n < len(s1) < 0.35 * n
    smaller = {r["doc_id"] for r in sample_documents(df, 0.1).collect()}
    assert smaller <= s1  # nested by threshold
    other = {r["doc_id"] for r in sample_documents(df, 0.3, seed=7).collect()}
    overlap = len(s1 & other) / n
    assert 0.05 < overlap < 0.14  # ~rate² for independent samples


def test_bpe_regex_vertical_tab_parity(spark):
    """Java's \\s matches \\x0B, RE2's does not — the BPE pre-tokenizer
    uses an EXPLICIT whitespace class on both engines so n_bpe_tokens
    agrees even on vertical-tab text (ADVICE r03)."""
    import duckdb
    import pandas as pd

    from linkgraph import oracle_sql as osql
    from linkgraph.docs import token_stats

    texts = ["hello\x0bworld", "a\x0b\x0bb", "plain text", "tabs\there", "p!?x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in token_stats(df).select("doc_id", "n_bpe_tokens").collect()
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    want = {
        int(r[0]): int(r[1])
        for r in con.execute(
            f"SELECT doc_id, n_bpe_tokens FROM ({osql.docs_token_stats_sql()})"
        ).fetchall()
    }
    assert got == want


def test_ivf_lloyd_matmul_threaded(spark, emb_df):
    """method='matmul' reaches the Lloyd refinement loop: centroids match
    the SQL path's, and the matmul assign plan contains no zip_with
    scorer (VERDICT r03 'What's wrong' #2)."""
    from linkgraph.similarity import _assign_with_cents, ivf_centroids

    df, _ = emb_df
    c_sql = ivf_centroids(df, num_centroids=4, lloyd_iters=2, method="sql")
    c_mm = ivf_centroids(df, num_centroids=4, lloyd_iters=2, method="matmul")
    for a, b in zip(c_sql, c_mm):
        assert np.allclose(a, b, atol=1e-9)

    plan = (
        _assign_with_cents(df, c_mm, "matmul", "vec_id", "embedding")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "zip_with" not in plan and "aggregate(" not in plan


def _despan_fixture():
    import random

    rng = random.Random(7)

    def filler(n):
        return " ".join(
            "w%04d" % rng.randrange(10_000) for _ in range(n)
        )

    passage = "the quick brown fox jumps over the lazy dog again and again tonight"
    assert len(passage) >= 60
    texts = {
        0: filler(30),                                   # unique — untouched
        2: filler(10) + " " + passage + " " + filler(10),  # first occurrence
        5: filler(12) + " " + passage + " " + filler(8),   # dup occurrence
        9: passage + " " + filler(15),                     # dup at doc start
        11: "A" + passage + "B" + passage + "C",           # self-repeat in one doc
        12: filler(25),                                  # unique — untouched
    }
    return passage, texts


def test_remove_repeated_spans_planted_passages(spark):
    """Recall on planted repeated passages (VERDICT r03 'Next round' #2):
    every non-canonical occurrence of a ≥min_len repeated passage is
    removed, the canonical (first) occurrence survives, unique text is
    untouched, and keep='none' removes every occurrence."""
    from linkgraph.docs import remove_repeated_spans

    passage, texts = _despan_fixture()
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_repeated_spans(df, min_len=30, keep="first").collect()
    }
    # unique docs pass through byte-identical
    for d in (0, 12):
        assert out[d] == (texts[d], 0)
    # the first occurrence (doc 2: smallest doc_id) keeps the passage
    assert passage in out[2][0]
    # later occurrences lose it — no 30-char window of it survives
    for d in (5, 9):
        txt, removed = out[d]
        assert passage not in txt
        assert removed >= len(passage) - 29  # island = exactly the dup region
        assert all(passage[i : i + 30] not in txt for i in range(len(passage) - 29))
    # self-repeat: doc 11 is NOT the minimal occurrence (doc 2 is), so
    # both of its copies are removed under keep='first'
    assert passage not in out[11][0]

    none = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(df, min_len=30, keep="none").collect()
    }
    for d in (2, 5, 9, 11):
        assert passage not in none[d]
    for d in (0, 12):
        assert none[d] == texts[d]


def test_remove_repeated_spans_duckdb_parity(spark):
    """The full rewrite (spans AND rebuilt text) matches despan_sql on the
    planted fixture — both keep modes."""
    import duckdb
    import pandas as pd

    from linkgraph import oracle_sql as osql
    from linkgraph.docs import remove_repeated_spans

    _, texts = _despan_fixture()
    items = sorted(texts.items())
    df = spark.createDataFrame(items, "doc_id long, text string")
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [d for d, _ in items], "text": [t for _, t in items]}),
    )
    for keep in ("first", "none"):
        got = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in remove_repeated_spans(df, min_len=30, keep=keep).collect()
        }
        want = {
            int(r[0]): (r[1], int(r[2]))
            for r in con.execute(osql.despan_sql(min_len=30, keep=keep)).fetchall()
        }
        assert got == want


def test_batch_serving_matches_per_query_loop(spark, emb_df, tmp_path):
    """ann_index_topk_batch / ivf_index_topk_batch answer Q queries in
    one job with EXACTLY the per-query loop's results (same buckets /
    probes, same rounding, same tie-break), and the batch scan still
    partition-prunes (VERDICT r03 'Next round' #3)."""
    from linkgraph.similarity import (
        ann_index_topk,
        ann_index_topk_batch,
        ivf_index_topk,
        ivf_index_topk_batch,
        lsh_topk_batch,
        lsh_cosine_topk,
        write_ann_index,
        write_ivf_index,
    )

    df, vecs = emb_df
    queries = {i: vecs[i].astype(float).tolist() for i in (0, 3, 7, 11)}

    ann_path = str(tmp_path / "ann")
    write_ann_index(df, ann_path, num_bits=2, dim=16, num_bands=2)
    batch = ann_index_topk_batch(
        spark, ann_path, queries, k=5, num_bits=2, num_bands=2, score="matmul"
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["sim"]))
    for qid, qv in queries.items():
        want = [
            (i + 1, r["vec_id"], r["sim"])
            for i, r in enumerate(
                ann_index_topk(
                    spark, ann_path, qv, k=5, num_bits=2, num_bands=2,
                    exclude_vec_id=qid, score="matmul",
                ).collect()
            )
        ]
        assert sorted(got[qid]) == want, qid
    # the one batch job still prunes: PartitionFilters non-empty
    plan = batch._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any(
        "bucket" in l and "[]" not in l.split("PartitionFilters:")[1][:60]
        for l in pf
    )

    ivf_path = str(tmp_path / "ivf")
    cents = write_ivf_index(df, ivf_path, num_centroids=4)
    ibatch = ivf_index_topk_batch(
        spark, ivf_path, cents, queries, k=5, nprobe=2, score="matmul"
    )
    igot = {}
    for r in ibatch.collect():
        igot.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["sim"]))
    for qid, qv in queries.items():
        want = [
            (i + 1, r["vec_id"], r["sim"])
            for i, r in enumerate(
                ivf_index_topk(
                    spark, ivf_path, cents, qv, k=5, nprobe=2,
                    exclude_vec_id=qid, score="matmul",
                ).collect()
            )
        ]
        assert sorted(igot[qid]) == want, qid

    # the in-flight variant agrees with the single-query recompute path
    fly = lsh_topk_batch(df, queries, k=5, num_bits=2, dim=16, num_bands=2)
    fgot = {}
    for r in fly.collect():
        fgot.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["sim"]))
    for qid in queries:
        want = [
            (i + 1, r["vec_id"], r["sim"])
            for i, r in enumerate(
                lsh_cosine_topk(df, qid, k=5, num_bits=2, dim=16, num_bands=2).collect()
            )
        ]
        assert sorted(fgot[qid]) == want, qid


def test_remove_repeated_spans_xxhash_fast_path(spark):
    """hasher='xxhash64' (production fast path) removes exactly the same
    planted spans as the oracle-neutral md5 path — the hash only names
    k-grams, so any collision-free hash yields identical islands."""
    from linkgraph.docs import remove_repeated_spans

    _, texts = _despan_fixture()
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    for keep in ("first", "none"):
        md5 = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in remove_repeated_spans(df, min_len=30, keep=keep).collect()
        }
        xx = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in remove_repeated_spans(
                df, min_len=30, keep=keep, hasher="xxhash64"
            ).collect()
        }
        assert md5 == xx


def test_tfidf_top_terms_closed_form(spark):
    # 3 docs; "apple" in 1 doc (idf=ln 3), "boat" in 2 (ln 1.5), "cat" in all (0)
    import math

    from linkgraph.docs import tf_idf_top_terms

    d = spark.createDataFrame(
        [
            (0, "apple apple boat cat"),
            (1, "boat cat cat"),
            (2, "cat"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"])
        for r in tf_idf_top_terms(d, top_k=2).collect()
    }
    ln3, ln15 = math.log(3), math.log(1.5)
    assert got[(0, "apple")] == (2, round(2 * ln3, 6))
    assert got[(0, "boat")] == (1, round(ln15, 6))
    assert got[(1, "boat")] == (1, round(ln15, 6))
    assert got[(1, "cat")] == (2, 0.0)
    assert got[(2, "cat")] == (1, 0.0)
    assert len(got) == 5  # doc 2 has only one term


def test_tfidf_tie_breaks_by_term_and_caps_k(spark):
    from linkgraph.docs import tf_idf_top_terms

    d = spark.createDataFrame(
        [(0, "zz yy xx"), (1, "other words")], "doc_id long, text string"
    )
    # all three doc-0 terms have tf=1, df=1 → identical tfidf; term ASC wins
    rows = tf_idf_top_terms(d, top_k=2).filter("doc_id = 0").collect()
    assert sorted(r["term"] for r in rows) == ["xx", "yy"]


def test_lm_cross_entropy_closed_form(spark):
    import math

    from linkgraph.docs import lm_cross_entropy

    d = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a  b"), (2, ""), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm_cross_entropy(d, alpha=0.5).collect()
    }
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; c1: a=3, b=2; V=4
    lp_ab = math.log((3 + 0.5) / (3 + 0.5 * 4))
    lp_ba = math.log((1 + 0.5) / (2 + 0.5 * 4))
    lp_bc = lp_ba
    ce0 = round(-(2 * lp_ab + lp_ba + lp_bc) / 4, 6)
    assert got[0] == (4, ce0)
    assert got[1] == (1, round(-lp_ab, 6))
    assert got[2] == (0, 0.0)
    assert got[3] == (0, 0.0)


def test_pii_scrub_redacts_and_counts(spark):
    from linkgraph.docs import pii_scrub

    d = spark.createDataFrame(
        [
            (0, "mail me at a.b+c@foo-bar.example.com or visit https://x.io/p?q=1 now"),
            (1, "server 10.0.255.3 and 192.168.1.1, no pii"),
            (2, ""),
            (3, "plain text"),
            (4, "url with embedded addr http://10.1.2.3/admin stays one URL"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert got[0]["clean_text"] == "mail me at <EMAIL> or visit <URL> now"
    assert (got[0]["n_emails"], got[0]["n_urls"], got[0]["n_ips"]) == (1, 1, 0)
    assert got[1]["clean_text"] == "server <IP> and <IP>, no pii"
    assert got[1]["n_ips"] == 2
    assert got[2]["clean_text"] == ""
    assert got[3]["clean_text"] == "plain text"
    # the URL pass consumes the embedded IP; the raw-text count sees both
    assert got[4]["clean_text"] == "url with embedded addr <URL> stays one URL"
    assert (got[4]["n_urls"], got[4]["n_ips"]) == (1, 1)


def test_chunk_documents_slices_and_overlap(spark):
    from linkgraph.docs import chunk_documents

    d = spark.createDataFrame(
        [(0, "t0 t1 t2 t3 t4 t5 t6"), (1, "a b"), (2, "")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(d, chunk_tokens=4, overlap=1).collect()
    }
    # doc 0: 7 tokens, stride 3 -> two chunks cover all tokens; a third
    # would be pure overlap (t6 is already in chunk 1) and is suppressed
    assert got[(0, 0)] == (4, "t0 t1 t2 t3")
    assert got[(0, 1)] == (4, "t3 t4 t5 t6")
    assert (0, 2) not in got
    assert got[(1, 0)] == (2, "a b")
    assert {k[0] for k in got} == {0, 1}  # empty doc: no chunks


def test_chunk_documents_no_pure_overlap_tail(spark):
    from linkgraph.docs import chunk_documents

    d = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    rows = chunk_documents(d, chunk_tokens=4, overlap=2).collect()
    # 4 tokens in one chunk; a second chunk would be pure overlap
    assert len(rows) == 1 and rows[0]["n_tokens"] == 4


def test_pack_windows_concat_arithmetic(spark):
    from linkgraph.docs import pack_windows

    d = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "d e f g"), (3, "h"), (4, "i j")],
        "doc_id long, text string",
    )
    got = {
        (r["window_id"], r["doc_id"]): r["n_tokens"]
        for r in pack_windows(d, window_tokens=4, num_buckets=3).collect()
    }
    # stream: doc0[0,3) doc2[3,7) doc3[7,8) doc4[8,10); windows of 4
    assert got == {
        (0, 0): 3,
        (0, 2): 1,
        (1, 2): 3,
        (1, 3): 1,
        (2, 4): 2,
    }


def test_pack_windows_totals_invariant(spark):
    from pyspark.sql import functions as F

    from linkgraph.docs import pack_windows, token_stats

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_windows(d, window_tokens=128, num_buckets=8)
    total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    # every nonempty-token doc's tokens land somewhere exactly once
    want = (
        d.selectExpr(
            "size(filter(split(lower(trim(text)), '\\\\s+'), s -> s != '')) AS n"
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == want
    # no window exceeds its budget
    per_w = packed.groupBy("window_id").agg(F.sum("n_tokens").alias("s"))
    assert per_w.filter(F.col("s") > 128).count() == 0


def test_chunk_documents_short_doc_one_chunk(spark):
    # n <= overlap must still yield exactly one chunk (the negative
    # chunk-count case: Spark's sequence(1, 0) descends)
    from linkgraph.docs import chunk_documents

    d = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    rows = chunk_documents(d, chunk_tokens=40, overlap=10).collect()
    assert len(rows) == 1
    assert (rows[0]["chunk_id"], rows[0]["n_tokens"], rows[0]["chunk_text"]) == (
        0,
        1,
        "x",
    )


def test_stratified_sample_matches_hash_and_is_monotone(spark):
    import hashlib

    from linkgraph.docs import stratified_sample

    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3], "s", 6) for i in range(300)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    def kept(rates, default=0.0):
        return {
            r["doc_id"]
            for r in stratified_sample(d, rates, default_rate=default).collect()
        }

    got = kept({"en": 0.5, "de": 0.2})
    want = set()
    for i, _, lang, _, _ in rows:
        rate = {"en": 0.5, "de": 0.2}.get(lang, 0.0)
        h = int(hashlib.md5(f"samp:42:{i}".encode()).hexdigest()[:15], 16)
        if h < int(rate * (1 << 60)):
            want.add(i)
    assert got == want
    # monotone: raising a stratum's rate only grows its kept set
    assert got <= kept({"en": 0.8, "de": 0.2})
    # default_rate applies to strata without an explicit rate
    assert {i for i in kept({}, default=1.0)} == set(range(300))


def test_decontaminate_flags_probe_overlap(spark):
    """Round-5 benchmark-decontamination stage: a corpus doc is flagged
    iff it shares at least one k-token shingle with ANY probe doc —
    probes are an independent table (benchmark test sets), not a corpus
    slice."""
    from linkgraph.docs import decontaminate

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon", "en", "s", 0),   # contains probe trigram
            (1, "one two three four five", "en", "s", 0),          # disjoint
            (2, "x beta gamma delta y", "en", "s", 0),             # same trigram, shifted
            (3, "beta delta gamma", "en", "s", 0),                 # right words, wrong order
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    probes = spark.createDataFrame(
        [(100, "JUNK beta gamma delta JUNK", "en", "bench", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, probes, k=3).collect()
    }
    assert got == {0: True, 1: False, 2: True, 3: False}


def test_repetition_stats_planted(spark):
    """Gopher repetition rules: planted boilerplate loop vs clean text."""
    from linkgraph.docs import repetition_stats

    corpus = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam", "en", "s", 0),   # one 2-gram x4
            (1, "a b c d e", "en", "s", 0),                  # all distinct
            (2, "x", "en", "s", 0),                          # 1 partial gram
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["dup_ngram_frac"], r["top_ngram_frac"])
        for r in repetition_stats(corpus, n=2).collect()
    }
    # doc 0: 4 bigrams, all "spam spam" -> dup = 3/4, top = 4/4
    assert got[0] == (4, 0.75, 1.0)
    # doc 1: 4 distinct bigrams
    assert got[1] == (4, 0.0, 0.25)
    # doc 2: one partial 1-token gram
    assert got[2] == (1, 0.0, 1.0)


def test_paragraph_dedup(spark):
    from linkgraph.docs import paragraph_dedup

    df = spark.createDataFrame(
        [
            (0, "alpha\n\nbody zero\n\nomega"),
            (1, "alpha\n\nbody one\n\nomega"),
            (2, "unique only"),
            (3, "alpha\n\nomega"),  # pure boilerplate → rewritten empty
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["removed_paras"])
        for r in paragraph_dedup(df, min_doc_freq=2).collect()
    }
    assert got[0] == ("body zero", 2)
    assert got[1] == ("body one", 2)
    assert got[2] == ("unique only", 0)
    assert got[3] == ("", 2)


def test_paragraph_dedup_within_doc_repeat_not_removed(spark):
    from linkgraph.docs import paragraph_dedup

    # the SAME paragraph twice within ONE doc: doc-frequency is 1, so it
    # stays (within-doc repetition belongs to repetition_stats) — and
    # order is preserved through the shuffle
    df = spark.createDataFrame(
        [(0, "twice\n\nmiddle\n\ntwice"), (1, "other")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in paragraph_dedup(df).collect()}
    assert got[0] == "twice\n\nmiddle\n\ntwice"
    assert got[1] == "other"


def test_quantile_buckets_exact_rank(spark):
    from linkgraph.docs import quantile_buckets

    # 20 docs, scores with heavy ties → rank must still be the exact
    # (score, doc_id) order; decile boundaries land on precise counts
    rows = [(i, float(i % 5)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = quantile_buckets(df, score_col="s", buckets=4, num_range_buckets=8)
    got = {r["doc_id"]: (r["rank"], r["bucket"]) for r in out.collect()}
    expected_order = sorted(rows, key=lambda t: (t[1], t[0]))
    for rank, (doc_id, _s) in enumerate(expected_order):
        assert got[doc_id] == (rank, rank * 4 // 20), (doc_id, got[doc_id])
    # every bucket holds exactly n/k rows here (20 divisible by 4)
    from collections import Counter

    sizes = Counter(b for _r, b in got.values())
    assert sizes == {0: 5, 1: 5, 2: 5, 3: 5}


def test_quantile_buckets_empty_and_single(spark):
    from linkgraph.docs import quantile_buckets

    empty = spark.createDataFrame([], "doc_id long, s double")
    assert quantile_buckets(empty, score_col="s").count() == 0
    one = spark.createDataFrame([(7, 3.0)], "doc_id long, s double")
    r = quantile_buckets(one, score_col="s", buckets=10).collect()[0]
    assert (r["doc_id"], r["rank"], r["bucket"]) == (7, 0, 0)


def test_pmi_collocations_closed_form(spark):
    # corpus: "a b" twice + "a c" once + "d" once →
    # bigrams: (a,b)×2, (a,c)×1; N_bi=3; unigrams: a×3 b×2 c×1 d×1; N_uni=7
    import math

    from linkgraph.docs import pmi_collocations

    d = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c"), (3, "d")],
        "doc_id long, text string",
    )
    got = {
        (r["w1"], r["w2"]): (r["cnt"], r["pmi"])
        for r in pmi_collocations(d, min_count=1, top_k=10).collect()
    }
    def pmi(c12, c1, c2):
        return round(math.log((c12 / 3) / ((c1 / 7) * (c2 / 7))), 6)

    assert got == {
        ("a", "b"): (2, pmi(2, 3, 2)),
        ("a", "c"): (1, pmi(1, 3, 1)),
    }


def test_pmi_min_count_and_topk_tiebreak(spark):
    from linkgraph.docs import pmi_collocations

    # all four bigrams have cnt=1 and identical pmi → tie broken (w1, w2)
    d = spark.createDataFrame(
        [(0, "p q"), (1, "r s"), (2, "t u"), (3, "v w")],
        "doc_id long, text string",
    )
    rows = pmi_collocations(d, min_count=1, top_k=2).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("p", "q"), ("r", "s")]
    assert pmi_collocations(d, min_count=2, top_k=10).count() == 0


def _dsir_python(rows, target_ids, buckets=64):
    """Pure-Python twin of dsir_log_weights: md5-60 token bucketing,
    add-1 smoothed bucket models, Σ n·(ln p_t − ln p_r)."""
    import hashlib
    import math
    import re
    from collections import Counter

    def toks(text):
        return [t for t in re.split(r"[ \t\n\x0B\f\r]+", text.lower().strip()) if t]

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % buckets

    per_doc = {
        doc_id: Counter(bucket(w) for w in toks(text)) for doc_id, text in rows
    }
    raw = Counter()
    tgt = Counter()
    for doc_id, c in per_doc.items():
        raw.update(c)
        if doc_id in target_ids:
            tgt.update(c)
    nr, nt = sum(raw.values()), sum(tgt.values())
    out = {}
    for doc_id, c in per_doc.items():
        lw = sum(
            n
            * (
                math.log((tgt[b] + 1) / (nt + buckets))
                - math.log((raw[b] + 1) / (nr + buckets))
            )
            for b, n in c.items()
        )
        out[doc_id] = round(lw, 6)
    return out


def test_dsir_log_weights_matches_python_twin(spark):
    from linkgraph.docs import dsir_log_weights

    rows = [
        (0, "alpha beta gamma alpha"),
        (1, "alpha beta beta"),
        (2, "delta epsilon zeta"),
        (3, "delta delta eta theta"),
        (4, "alpha delta"),
    ]
    d = spark.createDataFrame(
        [(i, t, "en" if i < 2 else "fr") for i, t in rows],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(d, "lang = 'en'", buckets=64).collect()
    }
    want = _dsir_python(rows, target_ids={0, 1}, buckets=64)
    assert got == pytest.approx(want, abs=1e-9)
    # target-vocab docs must score above off-target-vocab docs
    assert min(got[0], got[1]) > max(got[2], got[3])


def test_dsir_resample_deterministic_topk(spark):
    from linkgraph.docs import dsir_resample

    d = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common", "en" if i % 2 == 0 else "fr")
         for i in range(40)],
        "doc_id long, text string, lang string",
    )
    a = dsir_resample(d, "lang = 'en'", keep=10, buckets=64).collect()
    b = dsir_resample(d, "lang = 'en'", keep=10, buckets=64).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 10
    # the returned keys are exactly the 10 largest over the full corpus
    full = dsir_resample(d, "lang = 'en'", keep=40, buckets=64).collect()
    top = sorted(full, key=lambda r: (-r["key"], r["doc_id"]))[:10]
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in top]


def _bpe_python(texts, merges):
    """Sequential Sennrich BPE over the word-frequency dict — the
    semantics bpe_train must reproduce exactly."""
    import re
    from collections import Counter

    def toks(t):
        return [w for w in re.split(r"[ \t\n\x0B\f\r]+", t.lower().strip()) if w]

    wc = Counter(w for t in texts for w in toks(t))
    words = {w: list(w) for w in wc}
    rules = []
    for k in range(1, merges + 1):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((k, a, b, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return rules


def test_bpe_train_matches_sequential_reference(spark):
    from linkgraph.docs import bpe_train

    texts = [
        "the cat sat on the mat",
        "the hat of the cat",
        "that thin theme then",
        "aaa aa aaaa banana bandana",  # lhs==rhs greedy-left cases
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_train(d, merges=6).orderBy("rank").collect()
    ]
    assert got == _bpe_python(texts, 6)


def test_bpe_train_exhausts_and_stops_early(spark):
    from linkgraph.docs import bpe_train

    # single two-char word: exactly one merge possible, then no pairs left
    d = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_train(d, merges=5).collect()
    ]
    assert got == [(1, "a", "b", 3)]


def test_bpe_train_max_words_caps_the_dict(spark):
    from linkgraph.docs import bpe_train

    # 'zz'×3 dominates; with max_words=1 only it trains the rules
    d = spark.createDataFrame(
        [(0, "zz zz zz qq qq pp")], "doc_id long, text string"
    )
    got = [
        (r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_train(d, merges=2, max_words=1).collect()
    ]
    assert got == [("z", "z", 3)]


def test_quality_classifier_matches_python_gd_twin(spark):
    import hashlib
    import math
    import re
    from collections import Counter

    from linkgraph.docs import quality_classifier

    rows = [
        (0, "good clean prose text here", 1),
        (1, "good clean wording text flows", 1),
        (2, "spam spam buy now click", 0),
        (3, "click buy spam offer now", 0),
        (4, "prose text buy here", 1),
    ]
    B, STEPS, LR = 64, 3, 1.0
    d = spark.createDataFrame(
        [(i, t, "en" if y else "xx") for i, t, y in rows],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in quality_classifier(
            d, "lang = 'en'", steps=STEPS, lr=LR, buckets=B
        ).collect()
    }

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % B

    feats, ys = {}, {}
    for doc_id, text, y in rows:
        toks = [t for t in re.split(r"[ \t\n\x0B\f\r]+", text.lower().strip()) if t]
        c = Counter(bucket(t) for t in toks)
        f = {b: n / len(toks) for b, n in c.items()}
        f[-1] = 1.0  # intercept
        feats[doc_id], ys[doc_id] = f, float(y)
    w = {b: 0.0 for f in feats.values() for b in f}
    n = len(rows)
    for _ in range(STEPS):
        resid = {
            d_: 1.0 / (1.0 + math.exp(-sum(x * w[b] for b, x in f.items()))) - ys[d_]
            for d_, f in feats.items()
        }
        grad = {b: 0.0 for b in w}
        for d_, f in feats.items():
            for b, x in f.items():
                grad[b] += x * resid[d_]
        w = {b: w[b] - LR * grad[b] / n for b in w}
    for doc_id, f in feats.items():
        p = 1.0 / (1.0 + math.exp(-sum(x * w[b] for b, x in f.items())))
        assert got[doc_id] == pytest.approx(round(p, 6), abs=1e-9)
    # separable vocab: every y=1 doc must outscore every y=0 doc
    assert min(got[0], got[1], got[4]) > max(got[2], got[3])


def test_quality_classifier_weights_shape(spark):
    from linkgraph.docs import quality_classifier

    d = spark.createDataFrame(
        [(0, "alpha beta", "en"), (1, "gamma delta", "fr")],
        "doc_id long, text string, lang string",
    )
    w = quality_classifier(
        d, "lang = 'en'", steps=1, buckets=32, return_weights=True
    ).collect()
    bs = {r["bucket"] for r in w}
    assert -1 in bs and all(-1 <= b_ < 32 for b_ in bs)


def test_bpe_token_counts_closed_form(spark):
    from linkgraph.docs import bpe_token_counts

    # corpus: 'ab'×3, 'abc'×1 → rule 1 merges (a,b) cnt=4; rule 2 merges
    # (ab,c) cnt=1. After 2 merges: ab→[ab] (1 tok), abc→[abc] (1 tok)
    d = spark.createDataFrame(
        [(0, "ab ab abc"), (1, "ab"), (2, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(d, merges=2).collect()
    }
    assert got == {0: 3, 1: 1, 2: 0}
    # with merges=1 only (a,b) learned: abc → [ab, c] = 2 tokens
    got1 = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(d, merges=1).collect()
    }
    assert got1 == {0: 4, 1: 1, 2: 0}


def test_containment_catches_subset_dup_jaccard_misses(spark):
    from linkgraph import docs as d

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pad = " ".join(f"w{i}" for i in range(90))
    df = spark.createDataFrame(
        [
            (0, base),                      # the small doc
            (1, base + " " + pad),          # contains doc 0 whole + 9x padding
            (2, "totally different words everywhere around here now"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["c_ab"], r["c_ba"])
        for r in d.containment_pairs(df, k=5, min_containment=0.8).collect()
    }
    assert (0, 1) in pairs
    c_ab, c_ba = pairs[(0, 1)]
    assert c_ab == 1.0        # every 5-shingle of doc 0 appears in doc 1
    assert c_ba < 0.3         # but doc 1 is mostly padding
    # jaccard at the same threshold misses it
    jac = d.ngram_jaccard_pairs(df, k=5, min_jaccard=0.8).collect()
    assert not any(r["doc_a"] == 0 and r["doc_b"] == 1 for r in jac)
    # the unrelated doc pairs with nobody
    assert all(2 not in p for p in pairs)


def test_containment_direction_and_symmetric_case(spark):
    from linkgraph import docs as d

    t = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(0, t), (1, t)], "doc_id long, text string"
    )
    rows = d.containment_pairs(df, k=5, min_containment=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["c_ab"], r["c_ba"]) == (0, 1, 1.0, 1.0)


def test_language_id_markers_and_ties(spark):
    """Marker argmax picks the right language; zero-hit and tied docs fall
    back to declaration order (en first); score = hits/tokens."""
    from linkgraph.docs import language_id

    corpus = spark.createDataFrame(
        [
            (0, "the cat and the dog", "en", "s", 0),       # en x3
            (1, "der Hund und die Katze ist", "en", "s", 0),  # de x4
            (2, "le chat est dans la maison", "en", "s", 0),  # fr: le,est,dans,la
            (3, "zzz qqq www", "en", "s", 0),                # zero hits -> en
            (4, "la", "en", "s", 0),                         # fr/es tie -> fr
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["lang_guess"], r["lang_score"])
        for r in language_id(corpus).collect()
    }
    assert got[0] == ("en", 0.6)
    assert got[1][0] == "de"
    assert got[2][0] == "fr"
    assert got[3] == ("en", 0.0)
    assert got[4] == ("fr", 1.0)


def test_language_id_oracle_parity(spark, sf_dir="/root/testdata/sf0.001"):
    """Value-for-value parity with the DuckDB twin on the gate corpus."""
    import duckdb

    from linkgraph.docs import language_id
    from linkgraph.oracle_sql import language_id_sql

    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["lang_guess"], r["lang_score"])
        for r in language_id(docs_df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        int(d): (g, s) for d, g, s in con.execute(language_id_sql()).fetchall()
    }
    assert got == want


def test_vocab_stats_counts_and_ratios(spark):
    from linkgraph.docs import vocab_stats

    rows = [
        (0, "a b b c", "en", "s", 7),
        (1, "b c d", "en", "s", 5),
        (2, "x y", "de", "s", 3),
        (3, "", "fr", "s", 0),  # no tokens: zero counts, NULL ratios
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["lang"]: r for r in vocab_stats(d).collect()}
    en = got["en"]
    # en: tokens a,b,b,c | b,c,d -> total 7, types {a,b,c,d}=4, hapax {a,d}=2
    assert (en["n_docs"], en["total_tokens"], en["distinct_types"]) == (2, 7, 4)
    assert en["hapax_types"] == 2
    assert en["type_token_ratio"] == pytest.approx(round(4 / 7, 6))
    assert en["hapax_ratio"] == pytest.approx(0.5)
    de = got["de"]
    assert (de["total_tokens"], de["distinct_types"], de["hapax_types"]) == (2, 2, 2)
    fr = got["fr"]
    assert (fr["n_docs"], fr["total_tokens"], fr["distinct_types"]) == (1, 0, 0)
    assert fr["type_token_ratio"] is None and fr["hapax_ratio"] is None


def test_ngram_novelty_planted_duplicates(docs_df, spark):
    from linkgraph.docs import ngram_novelty

    got = {r["doc_id"]: r for r in ngram_novelty(docs_df, k=5).collect()}
    # docs 0 and 1 are byte-identical: every shingle has df >= 2
    assert got[0]["novel_frac"] == 0.0 and got[1]["novel_frac"] == 0.0
    assert got[0]["n_shingles"] > 0
    # doc 3 shares no text with anyone: fully novel
    assert got[3]["novel_frac"] == 1.0
    # doc 2 differs from 0/1 by one token: only the k-gram window
    # crossing the changed token is novel — strictly between 0 and 1
    assert 0.0 < got[2]["novel_frac"] < 1.0
    # doc 4 ("tiny", shorter than k): its single short-shingle is unique
    assert got[4]["n_shingles"] == 1 and got[4]["novel_frac"] == 1.0


def test_lm_cross_entropy_deterministic_across_partitionings(spark):
    """The Σ cnt·lp reduction sums as decimal(38,18) (exact, commutative),
    so cross_entropy cannot depend on partition count or scheduling order
    — the order-dependent float sum behind the one red CORRECTNESS_r05
    row. Same corpus at two parallelism levels → byte-identical output."""
    from linkgraph import docs

    rows = [
        (i, " ".join(f"tok{(i * 17 + j * 5) % 23}" for j in range(40)))
        for i in range(60)
    ]
    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "doc_id long, text string").repartition(
            parts
        )
        outs.append(
            sorted(
                (r["doc_id"], r["n_bigrams"], r["cross_entropy"])
                for r in docs.lm_cross_entropy(df).collect()
            )
        )
    assert outs[0] == outs[1]
