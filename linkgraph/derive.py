"""Canonical derived link graph over the sandbox test tables.

The engine's production input is an Iceberg source-code table whose edges
come from import extraction (linkgraph.ingest). For the driver's
correctness gate we need a graph that BOTH the Spark engine and a DuckDB
SQL oracle can derive, bit-identically, from the same parquet tables — so
the canonical gate graph is a pure arithmetic projection of ``lineitem``:

    edges = DISTINCT (l_orderkey % V  →  l_partkey % V),   V = 2048
    weight = src % 10 + dst % 10      (reference synthetic weight,
                                       init_all.c:661-667)
    vertex set = [0, V)               (dense ids, isolated allowed)

This yields a hashy, hub-skewed multigraph-free directed graph (~5.8k
edges at sf0.001, ~48k at sf0.01) over a FIXED vertex count, so PageRank
constants are scale-independent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from linkgraph.graph import Graph

NUM_VERTICES = 2048

# The same derivation as ANSI SQL (DuckDB), used as a CTE prefix by oracles.
EDGES_SQL = f"""
edges AS (
    SELECT DISTINCT
        l_orderkey % {NUM_VERTICES} AS src,
        l_partkey % {NUM_VERTICES} AS dst
    FROM lineitem
),
wedges AS (
    SELECT src, dst,
           CAST(src % 10 + dst % 10 AS DOUBLE) AS weight
    FROM edges
),
vertices AS (
    SELECT CAST(range AS BIGINT) AS id FROM range({NUM_VERTICES})
)
"""


def link_graph(
    spark: SparkSession,
    sf_dir: str,
    num_partitions: int | None = None,
    persist: bool = True,
) -> Graph:
    """Build the canonical gate graph from ``{sf_dir}/lineitem.parquet``."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        (F.col("l_orderkey") % NUM_VERTICES).alias("src"),
        (F.col("l_partkey") % NUM_VERTICES).alias("dst"),
    ).dropDuplicates(["src", "dst"])
    return Graph.from_edges(
        spark,
        edges,
        num_vertices=NUM_VERTICES,
        num_partitions=num_partitions,
        persist=persist,
    )
