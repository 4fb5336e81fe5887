"""SimRank — structural-context vertex similarity (Jeh & Widom, KDD'02).

Not in the reference binary set; the canonical "two pages are similar if
they are pointed to by similar pages" query on a link graph — the
similarity-space sibling of the reference's PageRank recurrence
(pagerank_simple.c:84-101), propagating over PAIRS of in-neighbors
instead of single in-neighbors:

    s(a, a) = 1
    s(a, b) = C / (|I(a)|·|I(b)|) · Σ_{i ∈ I(a), j ∈ I(b)} s(i, j)

computed by the standard truncated fixpoint: s₀ = identity, k rounds of
the recurrence. Scores live in [0, 1]; C (decay, classically 0.8) damps
longer meeting paths.

Spark shape: the pair state (a, b, s) is kept SPARSE and canonical
(a < b; the diagonal is implicit and re-injected each round). One round
= expand to both orientations + diagonal, two in-edge joins (i ∈ I(a),
j ∈ I(b)), re-canonicalize (dst_a < dst_b) BEFORE the groupBy so each
unordered pair shuffles once, then one aggregate scaled by
C / (|I(a)|·|I(b)|). Lineage is truncated per round with a lazy
localCheckpoint (the pagerank.py/katz.py pattern).

Scale notes: exact all-pairs SimRank state is Θ(co-reachable pairs) and
the round cost is Σ_{(i,j) live} |O(i)|·|O(j)| — quadratic in hub
out-fan, triangle counting's skew profile squared. The two production
levers, both OFF in the gate query (which runs exact for oracle
parity): ``eps`` prunes pairs whose score falls below a floor after
each round (Lizorkin et al., VLDB'08 — thresholded SimRank; dropped
mass is bounded by C·eps per round), and ``max_out_degree`` drops
propagation THROUGH hubs whose out-fan exceeds a cap (a vertex with
10⁵ out-edges contributes 10¹⁰ pair expansions but each weighted
1/(|I|·|I|) ≈ 0 — same rationale as linkpred.py's center cap, derived
from the degree histogram at scale, not a constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def simrank(
    graph: Graph,
    iterations: int = 3,
    decay: float = 0.8,
    top_k: int | None = 50,
    eps: float | None = None,
    max_out_degree: int | None = None,
) -> DataFrame:
    """Top-``top_k`` off-diagonal pairs (a, b, sim) with a < b after
    ``iterations`` rounds of the SimRank recurrence on the DIRECTED
    graph (in-neighbor sets), ordered by the ROUNDED score then (a, b)
    so the cut line is float-order stable (the adamic_adar convention).
    ``top_k=None`` returns every live pair (tests)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    c = float(decay)
    # in-neighbor relation: (i, v) means i ∈ I(v); |I(v)| alongside
    ein = graph.edges.select(F.col("src").alias("i"), F.col("dst").alias("v"))
    if max_out_degree is not None:
        outd = ein.groupBy("i").agg(F.count(F.lit(1)).alias("od"))
        keep = outd.filter(F.col("od") <= max_out_degree).select("i")
        ein = ein.join(keep, "i")
    ein = ein.localCheckpoint(eager=False)
    ind = ein.groupBy("v").agg(F.count(F.lit(1)).alias("d"))

    ea = ein.select(F.col("i").alias("pa"), F.col("v").alias("na"))
    eb = ein.select(F.col("i").alias("pb"), F.col("v").alias("nb"))
    da = ind.select(F.col("v").alias("a"), F.col("d").alias("dega"))
    db = ind.select(F.col("v").alias("b"), F.col("d").alias("degb"))
    diag = graph.vertices().select(
        F.col("id").alias("pa"), F.col("id").alias("pb"), F.lit(1.0).alias("s")
    )

    state: DataFrame | None = None  # canonical (a < b) off-diagonal scores
    for _ in range(iterations):
        if state is None:
            prev = diag
        else:
            prev = diag.unionByName(
                state.select(
                    F.col("a").alias("pa"), F.col("b").alias("pb"), "s"
                )
            ).unionByName(
                state.select(
                    F.col("b").alias("pa"), F.col("a").alias("pb"), "s"
                )
            )
        # expand pair (pa, pb) through one out-edge on each side; the
        # canonical filter (na < nb) keeps each unordered target pair on
        # one shuffle key — symmetry of prev covers the (nb, na) order
        nxt = (
            prev.join(ea, "pa")
            .join(eb, "pb")
            .filter(F.col("na") < F.col("nb"))
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.sum("s").alias("mass"))
            .join(da, "a")
            .join(db, "b")
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("mass") / (F.col("dega") * F.col("degb"))).alias(
                    "s"
                ),
            )
        )
        if eps is not None:
            nxt = nxt.filter(F.col("s") >= eps)
        state = nxt.localCheckpoint(eager=False)

    out = state.select("a", "b", F.round("s", 6).alias("sim"))
    if top_k is None:
        return out
    return out.orderBy(F.desc("sim"), "a", "b").limit(top_k)
