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
