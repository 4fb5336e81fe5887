"""BFS — frontier-driven level traversal with a direction/size heuristic.

Reference semantics (/root/reference/bfs_simple.c): seed root, then per
level claim unvisited out-neighbors of the frontier (bfs_push,
bfs_simple.c:121-134). We report LEVELS (root = 0) rather than the
reference's 1-based dist array (dist[ROOT]=1, bfs_simple.c:247) — a fixed
+1 offset; parent trees are intentionally NOT reported because the
reference's parent choice is CAS-race nondeterministic (bfs_numa.c:257)
while our ``groupBy(dst).agg(min(src))`` parents are deterministic.

The reference's push↔pull switch at 5% of edges (bfs_simple.c:191-197) is
a *physical* choice; its Spark analog is broadcast-vs-shuffle join of the
frontier. We hint ``broadcast(frontier)`` while the frontier is small
(small frontier = push over a worklist) and let the planner fall back to a
shuffle join when it grows (large frontier = pull/dense pass); AQE makes
the same call from runtime stats when sizes are off-estimate.

Returned vertices: REACHED ones only (id, dist) — the sparse contract;
unreached vertices are absent rather than carrying the reference's 0
sentinel (bfs_simple.c:49-56 counts dist != 0).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def _default_checkpointer(df: DataFrame, iteration: int) -> DataFrame:
    return df.localCheckpoint(eager=True)


def bfs(
    graph: Graph,
    root: int,
    max_iterations: int = 10_000,
    broadcast_frontier_max: int = 1_000_000,
    return_parents: bool = False,
    checkpointer: Callable[[DataFrame, int], DataFrame] | None = None,
    store=None,
) -> DataFrame:
    """Returns DataFrame(id: long, dist: long[, parent: long]) for vertices
    reachable from ``root`` along DIRECTED edges, dist = hop count
    (root = 0). ``return_parents`` adds the BFS-tree parent — chosen as
    ``min(src)`` among the frontier predecessors, i.e. the reference's
    racy first-CAS-wins parent (bfs_numa.c:257) made deterministic;
    root's parent is itself (the reference marks roots the same way,
    bfs_numa.c:84).

    ``store`` commits the full visited set per level; a relaunch rebuilds
    the frontier from the max-dist rows of the latest committed level
    (re-deriving at most one already-finished expansion)."""
    if store is not None:
        commit = store.checkpointer
        scratch = _default_checkpointer  # intermediates stay in memory
    else:
        commit = scratch = checkpointer or _default_checkpointer
    edges = graph.edges.select("src", "dst")

    resumed = store.latest_iteration() if store is not None else None
    if resumed is not None:
        visited = store.load(resumed)
        max_d = visited.agg(F.max("dist")).collect()[0][0]
        frontier = visited.filter(F.col("dist") == max_d).select("id")
        frontier_size = frontier.count()
        start = resumed
    else:
        visited = graph.spark.createDataFrame(
            [(int(root), 0, int(root))], "id long, dist long, parent long"
        )
        visited = commit(visited, 0)
        frontier = visited.select("id")
        frontier_size = 1
        start = 0

    for level in range(start + 1, max_iterations + 1):
        f = F.broadcast(frontier) if frontier_size <= broadcast_frontier_max else frontier
        nxt = (
            edges.join(f, edges["src"] == f["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("src").alias("parent"))
            .join(visited.select("id"), "id", "left_anti")
        )
        nxt = scratch(nxt, level)
        frontier_size = nxt.count()
        if frontier_size == 0:
            break
        visited = commit(
            visited.unionByName(
                nxt.select("id", F.lit(level).cast("long").alias("dist"), "parent")
            ),
            level,
        )
        frontier = nxt.select("id")

    return visited if return_parents else visited.select("id", "dist")
