"""Iceberg surface probe (VERDICT r02 'What's missing' #4 / next #7).

The north rule names Iceberg tables; CheckpointStore(fmt='iceberg') is
the realized one-line swap. This sandbox ships no iceberg-spark runtime,
so the functional test PROBES the classpath and skips cleanly when the
runtime is absent — on a cluster with the jar it runs for real. What
always runs: the swap surface itself (fmt plumbing, marker selection)
against the parquet format, so a regression in the shared code path
fails loudly in every environment.
"""

from __future__ import annotations

import pytest

from linkgraph.runner import CheckpointStore


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_fmt_plumbing_parquet_explicit(spark, tmp_path):
    """fmt='parquet' (the explicit spelling of the default) must behave
    byte-identically to the default store — this pins the shared
    format-parameterized write/read/marker code in EVERY environment."""
    df = spark.createDataFrame([(i, i * 2) for i in range(10)], "id long, v long")
    store = CheckpointStore(spark, str(tmp_path / "ck"), "probe", "r0", fmt="parquet")
    out = store.checkpointer(df, 0)
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [
        (i, i * 2) for i in range(10)
    ]
    assert store.latest_iteration() == 0
    assert store.committed_iterations() == [0]
    assert store.load(0).count() == 10
    assert store.load_upto(0).count() == 10


def test_iceberg_checkpoint_roundtrip(spark, tmp_path):
    """With the iceberg-spark runtime present: configure a Hadoop catalog
    at runtime, run a store-backed checkpoint cycle in fmt='iceberg', and
    verify commit detection via the metadata dir. Skips (green) when the
    runtime is absent — the documented sandbox situation."""
    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark runtime not on classpath")
    spark.conf.set(
        "spark.sql.catalog.lg_probe", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.lg_probe.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lg_probe.warehouse", str(tmp_path / "wh"))

    df = spark.createDataFrame([(i, float(i)) for i in range(8)], "id long, rank double")
    store = CheckpointStore(spark, str(tmp_path / "ck"), "pagerank", "rI", fmt="iceberg")
    out = store.checkpointer(df, 0)
    assert out.count() == 8
    assert store.latest_iteration() == 0
    again = store.load(0)
    assert sorted(r["id"] for r in again.collect()) == list(range(8))
