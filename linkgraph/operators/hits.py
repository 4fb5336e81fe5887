"""HITS (hubs & authorities) — Kleinberg's mutually-recursive centrality.

Not in the reference binary set; the natural sibling of its PageRank
kernel (pagerank_simple.c) on the same persisted edge layout — named here
because a link-graph engine over repo→repo edges wants both "good source"
(hub) and "good destination" (authority) scores.

Recurrence (Kleinberg, JACM 1999):

    a_i = normalize(Aᵀ h_{i-1})        (authority: sum of in-neighbor hubs)
    h_i = normalize(A  a_i)            (hub: sum of out-neighbor authorities)

with L2 normalization after each half-step and h_0 = 1.

Spark shape: each half-step is ONE edges⋈state join + groupBy aggregate
(the exact PageRank push shape, pagerank.py), and the L2 norm is a lazy
1-row aggregate crossJoined back in (broadcast by Catalyst) — no driver
action per iteration except the plan-truncating checkpoint. The edge
DataFrame is the persisted build-time layout; only the O(V) state
shuffles per iteration, exactly the scale contract of the PR loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def _normalized(raw: DataFrame, vertices: DataFrame, col: str) -> DataFrame:
    """Full-vertex-set L2-normalized score: missing ids → 0, then divide
    by the global L2 norm (a lazy 1-row agg, broadcast via crossJoin —
    the reciprocity pattern, stats.py)."""
    nrm = raw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm"))
    return (
        vertices.join(raw, vertices["id"] == raw["rid"], "left")
        .crossJoin(F.broadcast(nrm))
        .select(
            "id",
            (F.coalesce(F.col("s"), F.lit(0.0)) / F.col("nrm")).alias(col),
        )
    )


def hits(graph: Graph, iterations: int = 5) -> DataFrame:
    """(id, auth, hub) over the full vertex set after ``iterations``
    rounds, each L2-normalized. Isolated vertices score 0 on both axes.

    One eager checkpoint per iteration bounds the Catalyst plan depth
    (chained join-agg analysis is superlinear — the measured pagerank
    unroll pathology, pagerank.py); at 2 joins + 2 norms per round the
    5-round default would otherwise analyze a ~20-join tree.
    """
    edges = graph.edges.select("src", "dst")
    vertices = graph.vertices()
    hub = vertices.select("id", F.lit(1.0).alias("hub"))
    auth = vertices.select("id", F.lit(0.0).alias("auth"))
    state = vertices.select("id", F.lit(0.0).alias("auth"), F.lit(1.0).alias("hub"))
    for _ in range(iterations):
        a_raw = (
            edges.join(hub, edges["src"] == hub["id"])
            .groupBy(F.col("dst").alias("rid"))
            .agg(F.sum("hub").alias("s"))
        )
        auth = _normalized(a_raw, vertices, "auth")
        h_raw = (
            edges.join(auth, edges["dst"] == auth["id"])
            .groupBy(F.col("src").alias("rid"))
            .agg(F.sum("auth").alias("s"))
        )
        hub = _normalized(h_raw, vertices, "hub")
        state = auth.join(hub, "id").localCheckpoint(eager=True)
        auth = state.select("id", "auth")
        hub = state.select("id", "hub")
    return state.select("id", "auth", "hub")
