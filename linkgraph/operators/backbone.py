"""Multiscale backbone extraction — the disparity filter
(Serrano, Boguñá & Vespignani, PNAS 2009).

Not in the reference binary set; the canonical "which edges carry
statistically significant weight" reduction on a weighted link graph —
the preprocessing twin of the reference's synthetic-weight machinery
(init_all.c:661-667 creates w = src%10 + dst%10; this operator consumes
exactly that weight layout via Graph.canonical_undirected_edges +
synthetic_weight).

Under the null model that a vertex of degree k spreads its strength
uniformly at random over its k edges, the p-value of an edge carrying
normalized weight p = w/s(v) at endpoint v is

    α_vu = (1 - p)^(k_v - 1)

An edge survives if it is significant at EITHER endpoint
(min(α_vu, α_uv) < α) — the published filter, which keeps the backbone
connected across scales rather than thresholding on raw weight.
Degree-1 endpoints give α_vu = (1-p)⁰ = 1: a leaf edge can only be
kept by its other endpoint, per the paper.

Spark shape: one groupBy over the undirected incidence (strength +
degree per vertex), one join back per endpoint, one filter — a single
shuffle, no iteration, embarrassingly scalable. The significance test
compares the ROUNDED α (9 decimals) so the cut is bit-stable across
engines (java.lang.Math.pow vs libm pow may differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph, synthetic_weight


def disparity_backbone(
    graph: Graph,
    alpha: float = 0.05,
    broadcast_vertex_stats: "bool | None" = None,
) -> DataFrame:
    """(a, b, weight, alpha_min) for the canonical undirected edges whose
    disparity-filter p-value min(α_ab, α_ba) — rounded to 9 decimals —
    is below ``alpha``. Weights are the reference synthetic layout
    (src%10 + dst%10); self-loops are excluded by canonicalization.

    ``broadcast_vertex_stats``: the per-vertex (strength, degree) table
    is O(V) ≈ 24 B/row — tiny next to the edge set it joins twice. None
    (default) broadcasts when num_vertices ≤ 8M (~200 MB driver-side
    ceiling), making the whole filter ONE wide shuffle (the incidence
    aggregate) + two map-side joins — measured 146 → 5.3 s (warm;
    11.5 cold) on the 50M-edge / 1M-vertex bench graph with AQE off
    (with AQE on, the runtime re-plan makes the same call from
    observed sizes)."""
    edges = graph.canonical_undirected_edges().select(
        "a", "b", synthetic_weight(F.col("a"), F.col("b")).alias("w")
    )
    inc = edges.select(F.col("a").alias("v"), "w").unionByName(
        edges.select(F.col("b").alias("v"), "w")
    )
    vstat = inc.groupBy("v").agg(
        F.sum("w").alias("s"), F.count(F.lit(1)).alias("k")
    )
    if broadcast_vertex_stats is None:
        broadcast_vertex_stats = graph.num_vertices <= 8_000_000
    if broadcast_vertex_stats:
        vstat = F.broadcast(vstat)
    sa = vstat.select(F.col("v").alias("a"), F.col("s").alias("sa"), F.col("k").alias("ka"))
    sb = vstat.select(F.col("v").alias("b"), F.col("s").alias("sb"), F.col("k").alias("kb"))
    # s = 0 implies every incident weight is 0 (w >= 0, s >= w): the null
    # model is degenerate, the edge carries no signal — α = 1 (never kept)
    # rather than a 0/0 NaN whose ordering differs across engines.
    alpha_ab = F.when(
        F.col("sa") > 0,
        F.pow(F.lit(1.0) - F.col("w") / F.col("sa"), F.col("ka") - F.lit(1)),
    ).otherwise(F.lit(1.0))
    alpha_ba = F.when(
        F.col("sb") > 0,
        F.pow(F.lit(1.0) - F.col("w") / F.col("sb"), F.col("kb") - F.lit(1)),
    ).otherwise(F.lit(1.0))
    return (
        edges.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.col("w").alias("weight"),
            F.round(F.least(alpha_ab, alpha_ba), 9).alias("alpha_min"),
        )
        .filter(F.col("alpha_min") < alpha)
        .select("a", "b", "weight", F.round("alpha_min", 6).alias("alpha_min"))
    )
