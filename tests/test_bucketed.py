"""Bucketed edge storage: durable co-located layout (bucketBy on src).

The claim under test is physical, not just logical: a graph opened with
load_bucketed_graph must (a) compute identical results to the shuffled
in-memory layout and (b) feed the scatter join WITHOUT an Exchange on
the edge side — the catalog's bucket spec replaces the build-time
repartition.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.sources import load_bucketed_graph, save_bucketed_edges
from tests.conftest import make_graph, zipf_edges


@pytest.fixture()
def bucketed(spark, tmp_path):
    edges, n = zipf_edges(n=500, m=4000, seed=3)
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src long, dst long"
    )
    name = "bucketed_edges_test"
    save_bucketed_edges(df, name, num_buckets=4, path=str(tmp_path / "t"))
    yield name, edges, n
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_graph_matches_shuffled_layout(spark, bucketed):
    from linkgraph.operators import pagerank, wcc

    name, edges, n = bucketed
    gb = load_bucketed_graph(spark, name, num_vertices=n)
    g = make_graph(spark, edges, n)
    pb = {r["id"]: r["rank"] for r in pagerank(gb, iterations=5).collect()}
    pr = {r["id"]: r["rank"] for r in pagerank(g, iterations=5).collect()}
    assert pb.keys() == pr.keys()
    assert all(pb[k] == pytest.approx(pr[k], abs=1e-12) for k in pr)
    wb = sorted((r["id"], r["comp"]) for r in wcc(gb).collect())
    wr = sorted((r["id"], r["comp"]) for r in wcc(g).collect())
    assert wb == wr
    g.unpersist()


def test_bucketed_scan_is_recognized(spark, bucketed):
    name, edges, n = bucketed
    gb = load_bucketed_graph(spark, name, num_vertices=n)
    assert gb.num_partitions == 4  # read back from the bucket spec
    state = gb.vertices().select("id", F.lit(1.0).alias("rank"))
    plan = (
        gb.edges.join(state, gb.edges["src"] == state["id"])
        .groupBy("dst")
        .agg(F.sum("rank").alias("mass"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the scan must be planned AS bucketed (not a plain parquet scan that
    # would re-shuffle); Spark marks it in the FileScan node
    assert "Bucketed: true" in plan, plan


def test_bucketed_exchange_count_vs_unbucketed(spark, bucketed, tmp_path):
    """The same join over a NON-bucketed parquet copy needs one more
    Exchange than over the bucketed table."""
    name, edges, n = bucketed
    gb = load_bucketed_graph(spark, name, num_vertices=n)
    plain_path = str(tmp_path / "plain")
    spark.table(name).write.mode("overwrite").parquet(plain_path)
    plain = spark.read.parquet(plain_path).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )

    def n_exchanges(edges_df):
        # hint a shuffle (sort-merge) join: a broadcast of the tiny test
        # state would hide the partitioning difference that matters at
        # scale, where the per-vertex state is never broadcastable
        state = spark.range(n).select(
            F.col("id").cast("long"), F.lit(1.0).alias("rank")
        )
        plan = (
            edges_df.join(state.hint("merge"), edges_df["src"] == state["id"])
            .groupBy("dst")
            .agg(F.sum("rank").alias("mass"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        return plan.count("Exchange")

    assert n_exchanges(gb.edges.select("src", "dst")) < n_exchanges(plain)


def test_reregister_after_catalog_loss(spark, bucketed):
    """Cross-session path: the in-memory catalog forgets the table (we
    simulate by dropping it — the external files survive); re-registering
    via path + num_buckets restores the bucketed plan AND the results."""
    from linkgraph.operators import pagerank

    name, edges, n = bucketed
    want = {
        r["id"]: r["rank"]
        for r in pagerank(
            load_bucketed_graph(spark, name, num_vertices=n), iterations=3
        ).collect()
    }
    loc = (
        spark.sql(f"DESCRIBE EXTENDED {name}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    spark.sql(f"DROP TABLE {name}")  # metadata gone, files remain
    assert not spark.catalog.tableExists(name)
    with pytest.raises(ValueError):  # without the spec there is no safe open
        load_bucketed_graph(spark, name, num_vertices=n)
    g2 = load_bucketed_graph(
        spark, name, num_vertices=n, path=loc, num_buckets=4
    )
    assert g2.num_partitions == 4
    got = {r["id"]: r["rank"] for r in pagerank(g2, iterations=3).collect()}
    assert got.keys() == want.keys()
    assert all(got[k] == pytest.approx(want[k], abs=1e-12) for k in want)
