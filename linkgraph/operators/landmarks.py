"""Landmark-based distance sketches (Potamias et al., CIKM 2009).

Not in the reference binary set; the standard web-scale answer to
"what's the distance between u and v" when all-pairs BFS is impossible:
pick a small set of high-degree landmark vertices, run one multi-source
BFS from all of them, and store per-vertex distance vectors. Any (u, v)
query is then answered driver-free as an upper bound

    d(u, v) <= min_l  d(l, u) + d(l, v)

from two O(L) sketch rows — the triangle-inequality estimate that
landmark selection by degree makes tight on hub-routed link graphs.

Spark shape: landmark selection is a TakeOrdered over the persisted
degree frame (an O(L) driver artifact, like the IVF centroid seed);
the sweep is ONE multi-source frontier dataflow (harmonic.py's MS-BFS
— |L| traversals share each level's single edges join + min-agg, one
job per level), so sketch cost is O(depth) jobs regardless of L. State
is (landmark, id, dist) — O(L·V) rows, hash-partitioned; no per-source
loop, no driver-side data beyond the L landmark ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.harmonic import multi_source_bfs


def select_landmarks(graph: Graph, num_landmarks: int) -> list[int]:
    """Top-``num_landmarks`` vertex ids by total degree (out + in),
    deterministic ties by id asc — the degree heuristic of Potamias et
    al. §3.2, which beats random selection on skewed link graphs. An
    O(L) TakeOrdered collect (bounded driver artifact)."""
    rows = (
        graph.degrees()
        .select("id", (F.col("out_deg") + F.col("in_deg")).alias("d"))
        .orderBy(F.desc("d"), F.asc("id"))
        .limit(num_landmarks)
        .collect()
    )
    return [int(r["id"]) for r in rows]


def landmark_distances(
    graph: Graph,
    num_landmarks: int = 4,
    max_depth: int = 8,
    landmarks: "list[int] | None" = None,
) -> DataFrame:
    """(landmark, id, dist) for every vertex within ``max_depth`` of each
    landmark along DIRECTED edges — reached pairs only (a missing row IS
    the "no path ≤ max_depth" answer, exactly the sketch a distance
    oracle stores)."""
    if landmarks is None:
        landmarks = select_landmarks(graph, num_landmarks)
    dists = multi_source_bfs(graph, landmarks, max_iterations=max_depth)
    return dists.select(F.col("source").alias("landmark"), "id", "dist")


def landmark_distance_estimate(
    sketch: DataFrame, pairs: DataFrame
) -> DataFrame:
    """(u, v, dist_est) triangle-inequality upper bounds for each query
    row of ``pairs`` (u, v): min over landmarks of d(l,u) + d(l,v); pairs
    with no common landmark are dropped. Two hash joins on the sketch's
    id key — the query side is broadcast (it's a user query batch, small
    by construction)."""
    su = sketch.select(
        F.col("landmark"), F.col("id").alias("u"), F.col("dist").alias("du")
    )
    sv = sketch.select(
        F.col("landmark"), F.col("id").alias("v"), F.col("dist").alias("dv")
    )
    return (
        su.join(F.broadcast(pairs), "u")
        .join(sv, ["landmark", "v"])
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("dist_est"))
    )
