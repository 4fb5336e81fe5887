"""Local clustering via the PPR sweep cut (Andersen, Chung & Lang,
FOCS 2006): rank vertices by degree-normalized personalized-PageRank
mass from a seed, then take the prefix of that order with minimum
conductance. The seed-local community detector beside the global
labelprop/louvain partitions — not in the reference binary set
(pagerank_simple.c is its PR recurrence); the standard link-graph
extension ("the community around this repo").

Scale shape: the PPR power loop is the only state-sized computation
(same persisted-adjacency plan as pagerank). The sweep itself touches
the full edge set exactly once, through a BROADCAST join against the
top-k position map (k ≤ a few hundred), partial-aggregated into two
≤k-row crossing histograms; the prefix cumulative sums run in a
single-partition window over k rows. One edge scan, no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.pagerank import personalized_pagerank


def ppr_sweep(
    graph: Graph,
    source: int,
    iterations: int = 10,
    k: int = 64,
) -> DataFrame:
    """Sweep-cut profile of the PPR vector from ``source``.

    Returns one row per prefix position p = 1..k of the sweep order
    (vertices sorted by round(ppr/deg, 9) desc, ties by id, restricted
    to ppr > 0 and undirected degree ≥ 1):

        (pos, id, cut, vol, phi)

    where cut = edges leaving the prefix set S_p, vol = Σ deg over S_p,
    and phi = cut / min(vol, 2m − vol) rounded at 6 dp (0.0 when the
    denominator is 0 — S_p swallowed every edge). argmin(phi) is the
    ACL local cluster; the full profile is returned so callers (and the
    DuckDB twin) check every prefix, not one argmin.

    The crossing count uses the histogram identity: an undirected edge
    with endpoint positions a < b (absent endpoints ⇒ position k+1)
    crosses S_p exactly for p ∈ [a, b−1], so
    cut(p) = |{edges: min-pos ≤ p}| − |{edges: max-pos ≤ p}| — two
    grouped counts, cumulated over the k-row sweep frame.
    """
    if k < 1:
        raise ValueError("ppr_sweep: k must be >= 1")
    canon = graph.canonical_undirected_edges()
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    m = canon.count()

    ppr = personalized_pagerank(graph, [int(source)], iterations=iterations)
    keyed = (
        ppr.filter(F.col("rank") > 0)
        .join(deg, "id")
        .select("id", "d", F.round(F.col("rank") / F.col("d"), 9).alias("key"))
    )
    order = [F.col("key").desc(), F.col("id").asc()]
    topk = keyed.orderBy(*order).limit(k)
    pos_map = topk.withColumn(
        "pos", F.row_number().over(Window.orderBy(*order))
    ).select("id", "d", "pos")

    far = F.lit(k + 1)
    crossings = (
        canon.join(
            F.broadcast(pos_map.select(F.col("id").alias("a"), F.col("pos").alias("pa"))),
            "a",
            "left",
        )
        .join(
            F.broadcast(pos_map.select(F.col("id").alias("b"), F.col("pos").alias("pb"))),
            "b",
            "left",
        )
        .select(
            F.least(F.coalesce("pa", far), F.coalesce("pb", far)).alias("pmin"),
            F.greatest(F.coalesce("pa", far), F.coalesce("pb", far)).alias("pmax"),
        )
    )
    hist_min = (
        crossings.filter(F.col("pmin") <= k)
        .groupBy(F.col("pmin").alias("pos"))
        .agg(F.count("*").alias("n_min"))
    )
    hist_max = (
        crossings.filter(F.col("pmax") <= k)
        .groupBy(F.col("pmax").alias("pos"))
        .agg(F.count("*").alias("n_max"))
    )

    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        pos_map.join(hist_min, "pos", "left")
        .join(hist_max, "pos", "left")
        .select(
            "pos",
            "id",
            (
                F.sum(F.coalesce("n_min", F.lit(0))).over(w)
                - F.sum(F.coalesce("n_max", F.lit(0))).over(w)
            ).alias("cut"),
            F.sum("d").over(w).alias("vol"),
        )
    )
    denom = F.least(F.col("vol"), F.lit(2 * m) - F.col("vol"))
    return sweep.select(
        "pos",
        "id",
        "cut",
        "vol",
        F.when(denom > 0, F.round(F.col("cut") / denom.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("phi"),
    )
