"""Streaming surface (availableNow-driven, deterministic) + source helpers."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph.ingest import extract_edges, synthesize_source_table
from linkgraph.sources import is_table_name, load_table, write_table
from linkgraph.streaming import stream_edge_ingest, stream_events

from tests.conftest import bridge_edges


def test_sources_parquet_round_trip(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    ref = str(tmp_path / "t1")
    write_table(df, ref)
    back = load_table(spark, ref)
    assert back.count() == 10
    assert not is_table_name(ref)
    assert is_table_name("catalog.db.table")


def test_stream_events_windowed_counts(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(events_dir)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    agg = stream_events(spark, events_dir, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    # batch oracle: append mode emits exactly the FINALIZED windows — those
    # whose end has passed the final watermark (max event ts - 2h); windows
    # still inside the horizon stay in state and are correctly withheld
    events = spark.read.parquet(events_dir)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .filter(
            F.col("window.end")
            <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        )
    )
    g = {(str(r["window"]), r["event_type"]): (r["n"], round(r["total_value"], 6)) for r in got.collect()}
    w = {(str(r["window"]), r["event_type"]): (r["n"], round(r["total_value"], 6)) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_edge_ingest_matches_batch(spark, tmp_path):
    planted, n = bridge_edges()
    planted = np.unique(planted[planted[:, 0] != planted[:, 1]], axis=0)
    source = synthesize_source_table(spark, planted, n)
    src_dir = str(tmp_path / "src")
    source.write.parquet(src_dir)

    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck2")
    q = stream_edge_ingest(spark, src_dir, sink, ck)
    q.awaitTermination(300)

    streamed_refs = spark.read.parquet(sink)
    batch_refs = (
        spark.read.parquet(src_dir)
        .transform(lambda df: __import__("linkgraph.ingest.extract", fromlist=["x"]).extract_references(df))
    )
    s = {(r["repo"], r["ref_repo"]) for r in streamed_refs.collect()}
    b = {(r["repo"], r["ref_repo"]) for r in batch_refs.collect()}
    assert s == b and len(s) == len(planted)
    # and the streamed sink feeds the normal batch pipeline
    edges, ids = extract_edges(spark.read.parquet(src_dir))
    assert edges.count() == len(planted)
