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
