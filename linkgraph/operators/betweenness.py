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


def _forward_sigma(
    graph: Graph,
    sources: Sequence[int],
    max_iterations: int,
    broadcast_frontier_max: int,
) -> list[DataFrame]:
    """Brandes forward pass: the per-level (source, id, sigma) strata of
    the seeded MS-BFS DAG — σ rides the same per-level groupBy as the
    frontier itself, one Spark job per level."""
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
    return levels


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
    levels = _forward_sigma(
        graph, sources, max_iterations, broadcast_frontier_max
    )

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


def edge_betweenness(
    graph: Graph,
    sources: Sequence[int],
    max_iterations: int = 64,
    broadcast_frontier_max: int = 1_000_000,
) -> DataFrame:
    """(src, dst, betweenness) over the FULL edge set — the Girvan-Newman
    edge centrality (Girvan & Newman, PNAS 2002), seeded like
    :func:`betweenness`: for each source s, a DAG edge v→w (dist(w) =
    dist(v)+1) carries σ_s(v)/σ_s(w)·(1+δ_s(w)) — the fraction of
    s-rooted shortest paths through the edge (Brandes 2001 §4); edges on
    no counted shortest path report 0. Rounded to 6 dp.

    Spark shape: the SAME forward strata and backward δ recurrence as
    vertex betweenness; the per-stratum cur⋈edges⋈δ join is built once,
    lazily checkpointed, and feeds BOTH the vertex-δ aggregate (the
    recurrence) and the per-edge term accumulator — one final (src, dst)
    groupBy over the unioned terms instead of a per-level aggregate job,
    so the backward pass still runs 1 bulk job per stratum. The edge-term
    volume is exactly the backward message volume the vertex kernel
    already shuffles."""
    edges = graph.edges.select("src", "dst")
    levels = _forward_sigma(
        graph, sources, max_iterations, broadcast_frontier_max
    )
    zero = graph.edges.select(
        "src", "dst", F.lit(0.0).alias("betweenness")
    )
    if len(levels) == 1:
        return zero

    delta = levels[-1].select(
        "source", "id", "sigma", F.lit(0.0).alias("delta")
    )
    terms: list[DataFrame] = []
    for t in range(len(levels) - 2, -1, -1):
        nv = delta.select(
            F.col("source").alias("nsource"),
            F.col("id").alias("nid"),
            F.col("sigma").alias("nsigma"),
            F.col("delta").alias("ndelta"),
        )
        cur = levels[t]
        joined = (
            cur.join(edges, cur["id"] == edges["src"])
            .join(
                nv,
                (F.col("nsource") == F.col("source"))
                & (F.col("nid") == F.col("dst")),
            )
            .select(
                "source",
                "id",
                "dst",
                (
                    F.col("sigma") / F.col("nsigma") * (F.lit(1.0) + F.col("ndelta"))
                ).alias("term"),
            )
            .localCheckpoint(eager=False)
        )
        terms.append(joined.select("id", "dst", "term"))
        contrib = joined.groupBy("source", "id").agg(F.sum("term").alias("c"))
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

    allterms = terms[0]
    for tdf in terms[1:]:
        allterms = allterms.unionByName(tdf)
    eb = allterms.groupBy(F.col("id").alias("src"), "dst").agg(
        F.sum("term").alias("b")
    )
    return (
        graph.edges.select("src", "dst")
        .join(eb, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.round(F.coalesce("b", F.lit(0.0)), 6).alias("betweenness"),
        )
    )
