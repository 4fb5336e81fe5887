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
(the exact PageRank push shape, pagerank.py) over a SPARSE score frame —
vertices whose raw sum is 0 are simply absent; they contribute nothing
to the next join or to the L2 norm, so the dense full-vertex-set view is
joined in exactly once, at the end. The norm is a lazy 1-row aggregate
crossJoined back in (broadcast), not a driver action.

The raw half-step aggregate FANS OUT (the norm aggregate AND the
normalize projection both consume it), so it is eagerly checkpointed
first — Catalyst re-executes unshared subplans per consumer, and the
first cut of this operator paid that join-agg twice per half-step plus
once more through the iteration-state join (194 s for 5 rounds on the
50M-edge bench graph vs ~90 s restructured; the dedup_clusters lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def _l2_normalized(raw: DataFrame, col: str) -> DataFrame:
    """(id, <col>) = raw s / global L2 norm — raw must already be
    materialized (checkpointed): both consumers re-read it, not its
    lineage. Lazy 1-row agg crossJoin, the reciprocity pattern."""
    nrm = raw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm"))
    return raw.crossJoin(F.broadcast(nrm)).select(
        F.col("rid").alias("id"), (F.col("s") / F.col("nrm")).alias(col)
    )


def hits(graph: Graph, iterations: int = 5) -> DataFrame:
    """(id, auth, hub) over the full vertex set after ``iterations``
    rounds, each L2-normalized. Isolated vertices score 0 on both axes."""
    edges = graph.edges.select("src", "dst")
    vertices = graph.vertices()
    hub = vertices.select("id", F.lit(1.0).alias("hub"))
    auth = graph.spark.createDataFrame([], "id long, auth double")
    for _ in range(iterations):
        a_raw = (
            edges.join(hub, edges["src"] == hub["id"])
            .groupBy(F.col("dst").alias("rid"))
            .agg(F.sum("hub").alias("s"))
            .localCheckpoint(eager=True)  # fan-out: norm agg + projection
        )
        auth = _l2_normalized(a_raw, "auth")
        h_raw = (
            edges.join(auth, edges["dst"] == auth["id"])
            .groupBy(F.col("src").alias("rid"))
            .agg(F.sum("auth").alias("s"))
            .localCheckpoint(eager=True)
        )
        hub = _l2_normalized(h_raw, "hub")
    return (
        vertices.join(auth, "id", "left")
        .join(hub, "id", "left")
        .select(
            "id",
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )
