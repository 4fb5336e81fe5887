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


def test_stream_dedup_drops_cross_batch_replays(spark, tmp_path):
    """First arrival of each content passes; replays (same text, later ts,
    different doc_id) are dropped across micro-batches."""
    import datetime as dt

    from linkgraph.streaming import stream_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (0, t0, "alpha content"),
        (1, t0 + dt.timedelta(minutes=1), "beta content"),
        (2, t0 + dt.timedelta(minutes=2), "alpha content"),   # replay of 0
        (3, t0 + dt.timedelta(minutes=3), "gamma content"),
        (4, t0 + dt.timedelta(minutes=4), "beta content"),    # replay of 1
    ]
    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.parquet(docs_dir)
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream_dedup(spark, docs_dir, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["alpha content", "beta content", "gamma content"]
    # kept rows are the FIRST arrivals (within-batch order isn't pinned by
    # the API, but these all land in one availableNow batch where min-ts
    # wins is not guaranteed — assert set of texts only plus row count)
    assert got.count() == 3


def test_stream_sessionize_gap_timeout(spark, tmp_path):
    """applyInPandasWithState sessionization: two bursts separated by more
    than the gap → two sessions for the user; counts and bounds correct.
    A late high-watermark event from another user advances the watermark
    past the first burst's timeout so its session is emitted."""
    import datetime as dt

    from linkgraph.streaming import stream_sessionize

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = (
        # user 1, burst A: 3 events within the gap
        [(1, t0 + dt.timedelta(seconds=s)) for s in (0, 60, 120)]
        # user 1, burst B: 2 events, 2 h later (gap = 30 min → new session)
        + [(1, t0 + dt.timedelta(hours=2, seconds=s)) for s in (0, 30)]
        # user 2: a far-future event that drags the watermark forward so
        # both of user 1's sessions time out and get emitted
        + [(2, t0 + dt.timedelta(days=2))]
    )
    src_dir = str(tmp_path / "ev")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(src_dir)
        .withWatermark("ts", "10 minutes")
    )
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream_sessionize(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out_dir).collect()
        )
    )
    u1 = [g for g in got if g[0] == 1]
    assert len(u1) == 2
    (a_start, a_end, a_n) = (u1[0][1], u1[0][2], u1[0][3])
    (b_start, b_end, b_n) = (u1[1][1], u1[1][2], u1[1][3])
    assert a_n == 3 and a_start == t0 and a_end == t0 + dt.timedelta(seconds=120)
    assert b_n == 2 and b_start == t0 + dt.timedelta(hours=2)
    assert b_end == t0 + dt.timedelta(hours=2, seconds=30)


def test_stream_sessionize_late_event_extends_session_start(spark, tmp_path):
    """A late-but-within-watermark event that PRECEDES the stored session's
    start must pull session_start backward (regression: only the end was
    extended). Two availableNow runs over the same checkpoint simulate the
    cross-batch arrival."""
    import datetime as dt

    from linkgraph.streaming import stream_sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    src_dir = str(tmp_path / "ev")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_batch(rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").write.mode(
            "append"
        ).parquet(src_dir)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(src_dir)
            .withWatermark("ts", "30 minutes")
        )
        q = (
            stream_sessionize(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_batch([(1, t0)])
    # 11:45 is before the stored session start (12:00) but above the
    # watermark (12:00 - 30min = 11:30) → must merge and extend backward
    run_batch([(1, t0 - dt.timedelta(minutes=15))])
    # user 2 far in the future forces the watermark past user 1's timeout
    run_batch([(2, t0 + dt.timedelta(days=2))])

    u1 = [
        r
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] == 1
    ]
    assert len(u1) == 1
    assert u1[0]["session_start"] == t0 - dt.timedelta(minutes=15)
    assert u1[0]["session_end"] == t0
    assert u1[0]["n_events"] == 2


def test_stream_sessionize_old_late_event_forms_own_session(spark, tmp_path):
    """ADVICE r02 (medium): with watermark delay > gap, a late event older
    than session_start - gap must form its OWN earlier session instead of
    stretching the live session backward (which would miscount sessions)."""
    import datetime as dt

    from linkgraph.streaming import stream_sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    src_dir = str(tmp_path / "ev")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_batch(rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").write.mode(
            "append"
        ).parquet(src_dir)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(src_dir)
            .withWatermark("ts", "24 hours")
        )
        q = (
            stream_sessionize(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_batch([(1, t0)])
    # 6 h earlier: inside the 24 h watermark but far beyond the 30 min gap
    # → a separate, earlier session (and it must be emitted as CLOSED,
    # since the live session's span can never reach back within gap of it)
    run_batch([(1, t0 - dt.timedelta(hours=6))])
    # advance the watermark so the live session also times out
    run_batch([(2, t0 + dt.timedelta(days=3))])

    u1 = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] == 1
    )
    assert len(u1) == 2
    assert u1[0] == (t0 - dt.timedelta(hours=6), t0 - dt.timedelta(hours=6), 1)
    assert u1[1] == (t0, t0, 1)


def test_stream_active_users_matches_batch_pairs(spark, tmp_path):
    from linkgraph.streaming import stream_active_users

    events_dir = str(tmp_path / "events_au")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(
        events_dir
    )
    out_dir = str(tmp_path / "out_au")
    ck = str(tmp_path / "ck_au")
    agg = stream_active_users(spark, events_dir, window="1 hour", watermark="2 hours")
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
    events = spark.read.parquet(events_dir)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    # batch oracle: exact distinct users per finalized window
    want = (
        events.select(F.window("ts", "1 hour").alias("window"), "user_id")
        .distinct()
        .groupBy("window")
        .agg(F.count("*").alias("n_active"))
        .filter(F.col("window.end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
    )
    g = {str(r["window"]): r["n_active"] for r in got.collect()}
    w = {str(r["window"]): r["n_active"] for r in want.collect()}
    assert g == w and len(g) > 0
