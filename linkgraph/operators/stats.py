"""Whole-graph structural statistics — the first numbers anyone computes
on a link graph after the degree histogram.

Not in the reference binary set (its only whole-graph outputs are the WCC
census and per-phase timings); these are the standard link-graph summary
statistics, each a one-pass aggregate over the persisted edge layout —
no iteration, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def reciprocity(graph: Graph) -> DataFrame:
    """One row (reciprocity: double): the fraction of distinct non-self
    directed edges whose reverse edge also exists. Plan: one distinct
    (shuffle on the edge pair) + one self-semi-join on the same key — both
    hash-partitioned on (src, dst)/(dst, src), never all-pairs."""
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    tot = e.agg(F.count("*").alias("n"))
    rec = e.join(rev, ["src", "dst"], "left_semi").agg(F.count("*").alias("m"))
    return tot.crossJoin(rec).select(
        F.round(F.col("m") / F.col("n").cast("double"), 6).alias("reciprocity")
    )


def degree_assortativity(graph: Graph) -> DataFrame:
    """One row (assortativity: double): Pearson correlation, over directed
    edges, between the source's out-degree and the destination's
    in-degree (out-in assortativity). Hubs-link-to-hubs → positive;
    hubs-link-to-leaves → negative. Two broadcast-or-shuffle joins against
    the persisted degrees table + one corr aggregate (corr is a single
    map-side-combinable moment aggregate in both Spark and the oracle)."""
    deg = graph.degrees()
    ds = deg.select(F.col("id").alias("src"), F.col("out_deg").alias("sdeg"))
    dd = deg.select(F.col("id").alias("dst"), F.col("in_deg").alias("ddeg"))
    e = graph.edges.select("src", "dst").join(ds, "src").join(dd, "dst")
    return e.agg(
        F.round(F.corr(F.col("sdeg").cast("double"), F.col("ddeg").cast("double")), 6).alias(
            "assortativity"
        )
    )
