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


def _l1_normalized(raw: DataFrame, col: str) -> DataFrame:
    """(id, <col>) = raw s / global L1 norm; raw must be materialized
    (same fan-out contract as :func:`_l2_normalized`)."""
    nrm = raw.agg(F.sum(F.abs(F.col("s"))).alias("nrm"))
    return raw.crossJoin(F.broadcast(nrm)).select(
        F.col("rid").alias("id"), (F.col("s") / F.col("nrm")).alias(col)
    )


def eigenvector_centrality(graph: Graph, iterations: int = 10) -> DataFrame:
    """(id, eig) — eigenvector centrality by power iteration on Aᵀ
    (Bonacich 1987): x_i = L2-normalize(Aᵀ x_{i-1}) from x_0 = 1, the
    single-vector member of the hits/katz eigenvector family. Mass flows
    src→dst (a vertex is central when pointed at by central vertices),
    the katz direction without damping. Vertices with no length-i
    in-walk score 0 (sparse frame, absent until the final dense join).
    Each round is one edges⋈state join + groupBy sum with the checkpoint
    fan-out contract of :func:`hits`."""
    edges = graph.edges.select("src", "dst")
    vertices = graph.vertices()
    x = vertices.select(F.col("id"), F.lit(1.0).alias("x"))
    for _ in range(iterations):
        raw = (
            edges.join(x, edges["src"] == x["id"])
            .groupBy(F.col("dst").alias("rid"))
            .agg(F.sum("x").alias("s"))
            .localCheckpoint(eager=True)  # fan-out: norm agg + projection
        )
        x = _l2_normalized(raw, "x")
    return vertices.join(x, "id", "left").select(
        "id", F.coalesce("x", F.lit(0.0)).alias("eig")
    )


def salsa(graph: Graph, iterations: int = 5) -> DataFrame:
    """(id, auth, hub) — SALSA (Lempel & Moran, WWW 2000): HITS's
    mutual recurrence with the random-walk (stochastic) normalization
    instead of raw adjacency sums, run ``iterations`` rounds from
    h_0 = 1:

        a_i(j) = L1-normalize( Σ_{u→j} h_{i-1}(u) / outdeg(u) )
        h_i(u) = L1-normalize( Σ_{u→j} a_i(j)    / indeg(j)  )

    i.e. one forward step of the bipartite hub→auth walk then one
    backward step, each renormalized to a probability vector — SALSA's
    power iteration. Degree-normalizing per EDGE (each edge carries
    1/outdeg(src) and 1/indeg(dst), joined in ONCE before the loop)
    keeps every round the exact PageRank push shape: one edges⋈state
    join + groupBy sum, no per-round degree join. Isolated vertices
    score 0. Scores are engine-stable at 6 dp (the gate rounds them,
    the hits5 convention)."""
    edges = graph.edges.select("src", "dst")
    vertices = graph.vertices()
    outd = edges.groupBy("src").agg(F.count("*").alias("od"))
    ind = edges.groupBy("dst").agg(F.count("*").alias("idg"))
    ew = (
        edges.join(outd, "src")
        .join(ind, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("od")).alias("wa"),
            (F.lit(1.0) / F.col("idg")).alias("wh"),
        )
        .localCheckpoint(eager=True)  # consumed twice per round
    )
    hub = vertices.select("id", F.lit(1.0).alias("hub"))
    auth = graph.spark.createDataFrame([], "id long, auth double")
    for _ in range(iterations):
        a_raw = (
            ew.join(hub, ew["src"] == hub["id"])
            .groupBy(F.col("dst").alias("rid"))
            .agg(F.sum(F.col("wa") * F.col("hub")).alias("s"))
            .localCheckpoint(eager=True)  # fan-out: norm agg + projection
        )
        auth = _l1_normalized(a_raw, "auth")
        h_raw = (
            ew.join(auth, ew["dst"] == auth["id"])
            .groupBy(F.col("src").alias("rid"))
            .agg(F.sum(F.col("wh") * F.col("auth")).alias("s"))
            .localCheckpoint(eager=True)
        )
        hub = _l1_normalized(h_raw, "hub")
    return (
        vertices.join(auth, "id", "left")
        .join(hub, "id", "left")
        .select(
            "id",
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )
