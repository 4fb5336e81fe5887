"""Structured Streaming surface — incremental ingestion for a living graph.

The reference is batch-only (no streams, SURVEY.md §2.5); this module is
the engine's forward-looking surface for CONTINUOUSLY arriving data:

- :func:`stream_events` — file-source stream over an events directory
  (new parquet files appear → rows flow), watermarked windowed counts:
  the canonical late-data-tolerant aggregation.
- :func:`stream_edge_ingest` — streaming source-code rows → extracted
  edge rows appended to an edge sink; the incremental path that keeps a
  100 TB link graph fresh without full rebuilds (graph kernels then run
  in batch over the sink snapshot; per north rule the kernels themselves
  are batch-iterative, not streaming).
- :func:`stream_dedup` — cross-micro-batch exact dedup of a document
  stream: first arrival of each content hash passes, replays are dropped,
  with a watermark bounding the dedup state (the streaming sibling of
  docs.exact_dedup for continuously arriving training data).
- :func:`stream_sessionize` — custom stateful operator via
  ``applyInPandasWithState``: per-user event sessionization with an
  inactivity-gap timeout — the pattern to copy for any bespoke streaming
  state the built-in aggregates can't express.

Tests drive these with ``trigger(availableNow=True)`` so they run
deterministically to completion on the sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.ingest.extract import extract_references


def stream_events(
    spark: SparkSession,
    events_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over a file-source stream.

    Returns the streaming DataFrame (window, event_type, n, total_value);
    callers attach a sink + trigger. Late rows beyond the watermark are
    dropped — state is bounded, which is what makes this run forever.
    """
    src = spark.readStream.schema(schema).parquet(events_dir)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("window"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total_value"),
        )
    )


def stream_edge_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Streaming extraction: source-code rows → (repo, ref_repo) appended.

    Vertex-id assignment is deliberately NOT streaming (dense-id minting
    needs a global view); the batch ingest re-derives ids from the sink.
    Returns the StreamingQuery.
    """
    schema = "repo string, path string, commit string, lang string, content string"
    src = spark.readStream.schema(schema).parquet(source_dir)
    refs = extract_references(src)
    writer = (
        refs.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(
    spark: SparkSession,
    docs_dir: str,
    schema: str = "doc_id long, ts timestamp, text string",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup: exactly one arrival per distinct document
    content passes (the first across micro-batches; arbitrary within a
    single micro-batch — ``dropDuplicatesWithinWatermark`` does not
    promise the min-ts row survives an intra-batch tie).

    Built on the engine's streaming ``dropDuplicatesWithinWatermark`` over
    ``sha2(text)`` — the state store holds one 32-byte key per distinct
    doc inside the watermark horizon (bounded state: hashes older than the
    watermark are evicted, so an infinite stream doesn't accumulate an
    infinite set; re-arrivals beyond the horizon pass through — the
    at-scale contract is 'deduped within N hours', exact history requires
    the batch docs.exact_dedup over the sink). The shuffle carries the
    hash key, not document bodies — same 100 TB argument as
    docs.exact_dedup(by_hash=True)."""
    src = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        src.withColumn("content_hash", F.sha2(F.col("text"), 256))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    group events by user, close a session after ``gap_seconds`` of
    inactivity, emit (user_id, session_start, session_end, n_events).

    This is the engine's template for bespoke streaming state the built-in
    windowed aggregates can't express (a session's length is data-driven,
    not a fixed window). State per user is three scalars — O(active
    users), bounded by the event-time timeout: Spark calls the function
    with ``state.hasTimedOut`` once the watermark passes the session gap,
    which is when the session is emitted and the state freed. The input
    must already be watermarked by the caller (the timeout clock IS the
    watermark).
    """
    import pandas as pd  # local: keep the module import-light for executors

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start long, end long, n long"

    gap_us = gap_seconds * 1_000_000

    def emit(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield emit(user_id, [(start, end, n)])
            return
        # one user's batch slice fits comfortably in memory (events are
        # already grouped); sessions are split by gap WITHIN the batch too,
        # since an availableNow run can deliver hours of history at once.
        # The session list stays SORTED BY START: a late-but-in-watermark
        # event joins a session only if it lands within gap of the
        # session's span on EITHER side (start - gap <= t <= end + gap);
        # an event older than start - gap forms its own earlier session
        # instead of stretching the live one backward (which would
        # miscount sessions whenever the watermark delay exceeds the gap).
        ts_all = pd.concat(
            [pdf["ts"] for pdf in pdf_iter], ignore_index=True
        ).astype("int64") // 1000  # ns → us
        sessions: list[list[int]] = []
        if state.exists:
            s0, e0, n0 = state.get
            sessions.append([s0, e0, n0])
        for t in ts_all.sort_values():
            t = int(t)
            for i, s in enumerate(sessions):
                if t < s[0] - gap_us:
                    sessions.insert(i, [t, t, 1])
                    break
                if t <= s[1] + gap_us:  # within gap of this session's span
                    s[0] = min(s[0], t)
                    s[1] = max(s[1], t)
                    s[2] += 1
                    # the widened span may now bridge to the next session
                    if i + 1 < len(sessions) and sessions[i + 1][0] - s[1] <= gap_us:
                        nxt = sessions.pop(i + 1)
                        s[0] = min(s[0], nxt[0])
                        s[1] = max(s[1], nxt[1])
                        s[2] += nxt[2]
                    break
            else:
                sessions.append([t, t, 1])
        closed, live = sessions[:-1], sessions[-1]
        state.update((live[0], live[1], live[2]))
        state.setTimeoutTimestamp(live[1] // 1000 + gap_seconds * 1000)  # ms
        yield emit(user_id, [tuple(s) for s in closed])

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_active_users(
    spark: SparkSession,
    events_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """EXACT active users per tumbling window on a stream — the streaming
    twin of events.active_users' per-bucket leg, built the same way:
    dedup to (user_id, window) pairs first, then count.

    The watermarked dropDuplicates holds one state row per distinct
    (user, window) pair inside the horizon — bounded by actives ×
    windows-in-horizon, NOT by event volume; the downstream count is an
    ordinary windowed aggregate. Swap in approx_count_distinct (one
    aggregate, no dedup state) when the active set itself is too large
    to key state by — noted, not defaulted, so batch-vs-stream parity
    stays exact. Returns the streaming DataFrame (window, n_active);
    callers attach a sink + trigger.
    """
    src = spark.readStream.schema(schema).parquet(events_dir)
    pairs = (
        src.withWatermark("ts", watermark)
        .select("ts", "user_id", F.window("ts", window).alias("window"))
        .dropDuplicates(["user_id", "window"])
    )
    return pairs.groupBy("window").agg(
        F.count("*").alias("n_active")
    )
