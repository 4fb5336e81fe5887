"""Seeded betweenness centrality — Brandes forward/backward over MS-BFS.

Not in the reference binary set; the classic path-centrality built from
the reference's BFS kernel (bfs_simple.c) exactly as harmonic/closeness
are. Exact betweenness needs all-V Brandes passes (O(VE)); at link-graph
scale everyone runs the seeded estimator (Brandes & Pich 2007; the
Riondato-Kornaropoulos sampling bound): restrict the source set to S and
report

    bc(v) = Σ_{s ∈ S} δ_s(v),   δ_s(v) = Σ_{w: v on a shortest s-w path}
                                           σ_s(v)/σ_s(w) · (1 + δ_s(w))

over DIRECTED shortest paths (endpoints excluded, per Brandes 2001).

Spark shape: the forward pass is the MS-BFS frontier dataflow of
operators/harmonic.py with one extra aggregate — σ (shortest-path counts)
rides the SAME per-level groupBy as dist (sum instead of min), so path
counting is free: one edges⋈frontier join per level, one Spark job per
level (lazy checkpoint + counting action). Every level's (source, id,
sigma) set is retained (they are exactly the BFS DAG strata); the
backward pass then walks the strata deepest-first, each round one
edges⋈stratum⋈next-delta join-aggregate — 2·L bulk jobs total for L
levels, state O(|S|·V) like the distances themselves. σ and δ are doubles
(σ is integral and exact below 2^53; counts explode combinatorially on
dense DAGs, which is why Brandes implementations carry floats at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def betweenness(
    graph: Graph,
    sources: Sequence[int],
    max_iterations: int = 64,
    broadcast_frontier_max: int = 1_000_000,
) -> DataFrame:
    """(id, betweenness) over the FULL vertex set: summed Brandes
    dependency of each vertex over the seeded source set, directed
    shortest paths, endpoints excluded; 0 for vertices on no counted
    path; rounded to 6 dp. Deterministic — σ and δ are order-free
    aggregates over a unique BFS DAG."""
    edges = graph.edges.select("src", "dst")
    seeds = graph.spark.createDataFrame(
        [(int(s), int(s), 1.0) for s in sources], "source long, id long, sigma double"
    )
    levels: list[DataFrame] = [seeds.localCheckpoint(eager=True)]
    visited = levels[0].select("source", "id")
    frontier, frontier_size = levels[0], len(sources)
    visited_rows = frontier_size

    for level in range(1, max_iterations + 1):
        if frontier_size == 0:
            break
        f = (
            F.broadcast(frontier)
            if frontier_size <= broadcast_frontier_max
            else frontier
        )
        seen = visited
        if visited_rows <= broadcast_frontier_max:
            seen = F.broadcast(seen)
        nxt = (
            edges.join(f, edges["src"] == f["id"])
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen, ["source", "id"], "left_anti")
            .localCheckpoint(eager=False)
        )
        frontier_size = nxt.count()  # the level's single materializing action
        if frontier_size == 0:
            break
        visited_rows += frontier_size
        visited = visited.unionByName(nxt.select("source", "id"))
        if level % 8 == 0:
            visited = visited.localCheckpoint(eager=True)
        levels.append(nxt)
        frontier = nxt

    # backward dependency accumulation, deepest stratum first
    delta = levels[-1].select(
        "source", "id", "sigma", F.lit(0.0).alias("delta")
    )
    acc: list[DataFrame] = [] if len(levels) == 1 else [delta]
    for t in range(len(levels) - 2, -1, -1):
        nv = delta.select(
            F.col("source").alias("nsource"),
            F.col("id").alias("nid"),
            F.col("sigma").alias("nsigma"),
            F.col("delta").alias("ndelta"),
        )
        cur = levels[t]
        contrib = (
            cur.join(edges, cur["id"] == edges["src"])
            .join(
                nv,
                (F.col("nsource") == F.col("source"))
                & (F.col("nid") == F.col("dst")),
            )
            .groupBy("source", "id")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("nsigma") * (F.lit(1.0) + F.col("ndelta"))
                ).alias("c")
            )
        )
        delta = (
            cur.join(contrib, ["source", "id"], "left")
            .select(
                "source",
                "id",
                "sigma",
                F.coalesce(F.col("c"), F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint(eager=False)
        )
        if t >= 1:  # endpoints excluded: level-0 rows are the sources
            acc.append(delta)

    if not acc:
        return graph.vertices().select(
            "id", F.lit(0.0).alias("betweenness")
        )
    deltas = acc[0]
    for d in acc[1:]:
        deltas = deltas.unionByName(d)
    bc = deltas.groupBy("id").agg(F.sum("delta").alias("b"))
    return (
        graph.vertices()
        .join(bc, "id", "left")
        .select(
            "id", F.round(F.coalesce("b", F.lit(0.0)), 6).alias("betweenness")
        )
    )
