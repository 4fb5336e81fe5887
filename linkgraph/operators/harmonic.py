"""Harmonic centrality from a seed set, via multi-source BFS.

Not in the reference binary set; the standard centrality the reference's
BFS kernel (bfs_simple.c) is the building block for. Exact harmonic
centrality needs all-pairs BFS — O(V) traversals — so at link-graph
scale everyone computes the seeded estimator (Boldi & Vigna,
"Axioms for centrality", 2014; Eppstein-Wang sampling):

    harmonic(v) ≈ Σ_{s ∈ S, d(s,v) > 0, finite}  1 / d(s,v)

Spark shape — MS-BFS (Then et al., VLDB 2015) flattened into the
frontier DataFrame: the frontier carries a ``source`` column, so ALL
|S| traversals advance in ONE edges⋈frontier join per level (state and
shuffle O(|S|·V) total, |S| fixed), instead of |S| sequential BFS jobs
per level. Levels reuse the data-derived dist+1 trick from bfs.py (no
per-level literal → one compiled plan for every level).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def multi_source_bfs(
    graph: Graph,
    sources: Sequence[int],
    max_iterations: int = 64,
    broadcast_frontier_max: int = 1_000_000,
) -> DataFrame:
    """(source, id, dist) for every vertex reachable from each seed along
    DIRECTED edges — |S| traversals in one frontier dataflow, one Spark
    job per level (the lazy-checkpoint + counting-action shape of
    bfs.py)."""
    edges = graph.edges.select("src", "dst")
    seeds = graph.spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "source long, id long, dist long"
    )
    visited = seeds.localCheckpoint(eager=True)
    frontier = visited
    frontier_size = len(sources)
    visited_rows = frontier_size
    for level in range(1, max_iterations + 1):
        if frontier_size == 0:
            break
        f = (
            F.broadcast(frontier)
            if frontier_size <= broadcast_frontier_max
            else frontier
        )
        seen = visited.select("source", "id")
        if visited_rows <= broadcast_frontier_max:
            seen = F.broadcast(seen)
        nxt = (
            edges.join(f, edges["src"] == f["id"])
            .groupBy("source", F.col("dst").alias("id"))
            .agg((F.min("dist") + F.lit(1)).alias("dist"))
            .join(seen, ["source", "id"], "left_anti")
            .localCheckpoint(eager=False)
        )
        frontier_size = nxt.count()  # the level's single materializing action
        visited_rows += frontier_size
        visited = visited.unionByName(nxt)
        frontier = nxt
        if level % 8 == 0:
            visited = visited.localCheckpoint(eager=True)
    return visited


def closeness_centrality(
    graph: Graph,
    sources: Sequence[int],
    max_iterations: int = 64,
) -> DataFrame:
    """Seeded closeness (id, reached, closeness) over the FULL vertex
    set: reached = #{s in S : 0 < d(s,id) < inf}, closeness =
    reached / sum d(s,id) over those seeds (0 when unreached) — the
    Eppstein-Wang seeded estimator of classic closeness, rounded 6 dp.
    Rides the same one-job-per-level MS-BFS frontier as harmonic."""
    dists = multi_source_bfs(graph, sources, max_iterations=max_iterations)
    c = (
        dists.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("reached"),
            F.sum("dist").alias("sum_dist"),
        )
    )
    return (
        graph.vertices()
        .join(c, "id", "left")
        .select(
            "id",
            F.coalesce("reached", F.lit(0)).cast("long").alias("reached"),
            F.round(
                F.coalesce(F.col("reached") / F.col("sum_dist"), F.lit(0.0)), 6
            ).alias("closeness"),
        )
    )


def harmonic_centrality(
    graph: Graph,
    sources: Sequence[int],
    max_iterations: int = 64,
) -> DataFrame:
    """(id, harmonic) over the FULL vertex set: Σ 1/d(s, id) over seeds
    with finite positive distance (self-distances contribute 0, as do
    unreached pairs); rounded to 6 dp."""
    dists = multi_source_bfs(graph, sources, max_iterations=max_iterations)
    h = (
        dists.filter(F.col("dist") > 0)
        .groupBy("id")
        # scaled-BIGINT exact sum (the linkpred discipline): ≤ |sources|
        # reciprocal terms per vertex, summed order-independently so the
        # 6-dp value cannot flip with scheduling order
        .agg((F.sum(F.round(1e12 / F.col("dist")).cast("long")) / 1e12).alias("h"))
    )
    return (
        graph.vertices()
        .join(h, "id", "left")
        .select("id", F.round(F.coalesce("h", F.lit(0.0)), 6).alias("harmonic"))
    )
