"""The north-rule launch surface, exercised for real: the pipeline must
launch via ``spark-submit --py-files linkgraph.zip driver.py ...``.

This test runs spark-submit as a SUBPROCESS from a temp cwd where the
repo is NOT on sys.path — the zip built by tools/make_pyfiles.py is the
only way ``import linkgraph`` can succeed, so a pass proves the artifact
is complete and the driver CLI works end-to-end (derive → kernel →
parquet sink). One spark-submit JVM spin-up (~30 s), kept to a single
test on a tiny edge table."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    # edge table written by the ALREADY-RUNNING session (cheap); the
    # subprocess gets its own tiny local[2] JVM
    edges_path = str(tmp_path / "edges")
    n = 64
    rows = [(int(i), int((i + 1) % n)) for i in range(n)]  # ring: 1 component
    spark.createDataFrame(rows, "src long, dst long").write.parquet(edges_path)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = make_pyfiles.build(str(tmp_path / "linkgraph.zip"))

    workdir = tmp_path / "cwd"
    workdir.mkdir()
    shutil.copy(os.path.join(REPO, "driver.py"), workdir / "driver.py")
    out_path = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of linkgraph
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            "driver.py",
            "--algo", "wcc",
            "--edges", edges_path,
            "--output", out_path,
            "--num-partitions", "4",
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"

    got = spark.read.parquet(out_path).toPandas().sort_values("id")
    assert len(got) == n
    assert (got["comp"].to_numpy() == 0).all()  # ring → single component, min id 0
    assert np.array_equal(got["id"].to_numpy(), np.arange(n))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_doc_pipeline(spark, tmp_path):
    """The docs pipeline launches through the same CLI surface: dedup over
    a documents table via spark-submit --py-files."""
    docs_path = str(tmp_path / "docs")
    rows = [(i, "text body %d" % (i % 4), "en", "s", 0) for i in range(16)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(docs_path)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = make_pyfiles.build(str(tmp_path / "linkgraph.zip"))
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    shutil.copy(os.path.join(REPO, "driver.py"), workdir / "driver.py")
    out_path = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            "driver.py",
            "--algo", "dedup",
            "--docs", docs_path,
            "--output", out_path,
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    got = spark.read.parquet(out_path).toPandas().sort_values("doc_id")
    assert len(got) == 4  # 4 distinct texts
    assert sorted(got["doc_id"]) == [0, 1, 2, 3]  # min id per group kept
    assert (got["n"] == 4).all()


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_minhash_and_ann_index(spark, tmp_path):
    """Round-3 CLI surface (VERDICT r02 next #6): --algo minhash_pairs
    emits candidate pairs PLUS the dropped-buckets audit sidecar, and
    --algo ann_index builds the (band,bucket)-partitioned index — both in
    ONE spark-submit JVM each... actually one JVM total: two driver.main
    invocations run in a single subprocess via a tiny wrapper script to
    keep the test minutes-bounded."""
    docs_path = str(tmp_path / "docs")
    base = " ".join(f"tok{j}" for j in range(30))
    rows = [(i, base + f" tail{i // 2}", "en", "s", 0) for i in range(12)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(docs_path)

    emb_path = str(tmp_path / "emb")
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.randn(40, 16)
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).write.parquet(emb_path)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = make_pyfiles.build(str(tmp_path / "linkgraph.zip"))
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    shutil.copy(os.path.join(REPO, "driver.py"), workdir / "driver.py")
    pairs_out = str(tmp_path / "pairs")
    idx_out = str(tmp_path / "annidx")

    despan_out = str(tmp_path / "despan")
    ivf_out = str(tmp_path / "ivfidx")
    annq_out = str(tmp_path / "annq")
    ivfq_out = str(tmp_path / "ivfq")
    semdedup_out = str(tmp_path / "semdedup")
    pq_out = str(tmp_path / "pqidx")
    pqq_out = str(tmp_path / "pqq")
    wrapper = workdir / "both.py"
    wrapper.write_text(
        "import driver\n"
        f"rc1 = driver.main(['--algo', 'minhash_pairs', '--docs', {docs_path!r},"
        f" '--output', {pairs_out!r}, '--max-bucket-size', '1000'])\n"
        "assert rc1 == 0, rc1\n"
        f"rc2 = driver.main(['--algo', 'despan', '--docs', {docs_path!r},"
        f" '--output', {despan_out!r}, '--min-span-len', '30'])\n"
        "assert rc2 == 0, rc2\n"
    )
    wrapper2 = workdir / "ann.py"
    wrapper2.write_text(
        "import driver\n"
        f"rc = driver.main(['--algo', 'ann_index', '--embeddings', {emb_path!r},"
        f" '--output', {idx_out!r}, '--num-bits', '2', '--num-bands', '2'])\n"
        "assert rc == 0, rc\n"
        # round 4: batch query serving against the just-written indexes —
        # the query table here is the embeddings table itself
        f"rc = driver.main(['--algo', 'ann_query', '--embeddings', {emb_path!r},"
        f" '--index', {idx_out!r}, '--output', {annq_out!r},"
        f" '--num-bits', '2', '--num-bands', '2', '--topk', '3'])\n"
        "assert rc == 0, rc\n"
        f"rc = driver.main(['--algo', 'ivf_index', '--embeddings', {emb_path!r},"
        f" '--output', {ivf_out!r}, '--num-centroids', '4'])\n"
        "assert rc == 0, rc\n"
        f"rc = driver.main(['--algo', 'ivf_query', '--embeddings', {emb_path!r},"
        f" '--index', {ivf_out!r}, '--output', {ivfq_out!r},"
        f" '--topk', '3', '--nprobe', '2'])\n"
        "assert rc == 0, rc\n"
        # round 5: embedding-space keep-list + dropped-cells audit sidecar
        f"rc = driver.main(['--algo', 'semantic_dedup', '--embeddings', {emb_path!r},"
        f" '--output', {semdedup_out!r}, '--num-centroids', '4',"
        f" '--min-sim', '0.95'])\n"
        "assert rc == 0, rc\n"
        # round 5: compressed PQ index (M codes/vector) + one-scan ADC serving
        f"rc = driver.main(['--algo', 'pq_index', '--embeddings', {emb_path!r},"
        f" '--output', {pq_out!r}, '--num-subspaces', '4',"
        f" '--codes-per-subspace', '4'])\n"
        "assert rc == 0, rc\n"
        f"rc = driver.main(['--algo', 'pq_query', '--embeddings', {emb_path!r},"
        f" '--index', {pq_out!r}, '--output', {pqq_out!r},"
        f" '--num-subspaces', '4', '--topk', '3',"
        f" '--rerank-factor', '5', '--rerank-embeddings', {emb_path!r}])\n"
        "assert rc == 0, rc\n"
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    for script in ("both.py", "ann.py"):
        proc = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                script,
            ],
            cwd=str(workdir),
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, (
            f"{script} stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
        )

    pairs = spark.read.parquet(pairs_out).toPandas()
    # planted: docs 2i and 2i+1 share all but the tail token → 6 pairs
    assert {(int(a), int(b)) for a, b in zip(pairs.doc_a, pairs.doc_b)} >= {
        (2 * i, 2 * i + 1) for i in range(6)
    }
    # audit sidecar exists (empty here — nothing exceeds the cap)
    audit = spark.read.parquet(pairs_out + "_dropped_buckets")
    assert audit.count() == 0
    assert set(audit.columns) == {"band", "bucket", "size"}

    sd = spark.read.parquet(semdedup_out).toPandas()
    assert set(sd.columns) == {"vec_id", "cluster_id", "keep"}
    assert len(sd) == 40  # every vector classified
    sd_audit = spark.read.parquet(semdedup_out + "_dropped_cells")
    assert sd_audit.count() == 0  # 40 gaussian vecs: no cell over the cap
    assert set(sd_audit.columns) == {"cid", "csz"}

    from linkgraph.similarity import ann_index_topk

    got = ann_index_topk(
        spark, idx_out, vecs[0].tolist(), k=3, num_bits=2, num_bands=2,
        exclude_vec_id=0,
    )
    assert got.count() >= 1  # index routable end-to-end

    # round 4: despan rewrote the shared 30-token prefix out of the
    # later docs (doc 0/1 pair is the canonical keeper of the base text)
    despan = spark.read.parquet(despan_out).toPandas()
    assert len(despan) == 12
    assert despan["n_removed"].sum() > 0

    # batch query serving outputs: every query answered, schema stable
    for out, nq in ((annq_out, 40), (ivfq_out, 40)):
        q = spark.read.parquet(out).toPandas()
        assert set(q.columns) == {"qid", "vec_id", "sim", "rank"}
        assert q["qid"].nunique() >= nq - 1  # a query may have no band-mates
        assert (q.groupby("qid")["rank"].max() <= 3).all()

    # round 5: PQ — compressed code table + codebook sidecar + ADC serving
    pq_codes = spark.read.parquet(pq_out).toPandas()
    assert set(pq_codes.columns) == {"vec_id", "codes"}
    assert len(pq_codes) == 40 and all(len(c) == 4 for c in pq_codes["codes"])
    pqq = spark.read.parquet(pqq_out).toPandas()
    assert set(pqq.columns) == {"query_id", "vec_id", "adist"}
    assert pqq["query_id"].nunique() == 40  # ADC always answers
    assert (pqq.groupby("query_id").size() <= 3).all()
    assert (pqq["query_id"] != pqq["vec_id"]).all()
