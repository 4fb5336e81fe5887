"""k-truss — iterative support peeling to the cohesion fixpoint.

Not in the reference's kernel set (README.md:6 lists BFS/PR/SSSP/SpMV/WCC);
provided as a link-graph analytics extension: the k-truss of an undirected
simple graph is the maximal subgraph in which every edge participates in
at least k−2 triangles WITHIN the subgraph (Cohen 2008). It is the edge
analog of the k-core (operators/kcore.py) and the standard community-core
extractor one notch stronger than k-core (every k-truss is inside the
(k−1)-core).

Plan shape per peel round: degree-oriented wedge join over the alive edge
set (the triangles.py machinery — orientation bounds the wedge explosion
by arboricity, O(E^1.5) instead of Σdeg²), semi-join closure, a 3-way
edge-credit union aggregated map-side into per-edge support, then a left
join back to the alive set filtering support ≥ k−2. State is the shrinking
canonical edge set — O(E') per round, monotone non-increasing; convergence
is an exact integer count (no fingerprint). The round count is the truss
peeling depth — O(1) on sharp community boundaries, O(E) adversarial worst
case (each round exposes one new under-supported edge), guarded loudly by
``max_iterations``. Checkpoints are LAZY on the default path so the
convergence count is the round's single Spark job (the r03 BFS/SSSP
pattern, same as k_core).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.triangles import _triangle_stream_from_canon


def _default_checkpointer(df: DataFrame, iteration: int) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _edge_support(canon: DataFrame, degree_oriented: bool) -> DataFrame:
    """(a, b, sup) — per-canonical-edge triangle count over the edge set
    ``canon`` (a < b, deduped). Edges in no triangle are ABSENT (the
    caller left-joins and coalesces to 0). Each triangle is enumerated
    exactly once by the adjacency-intersect stream (no wedge shuffle —
    triangles.py:_triangle_stream_from_canon), then credited to its
    three edges; the credit union is map-side combinable. least/greatest
    per pair because degree orientation does not preserve id order."""
    tri = _triangle_stream_from_canon(canon, degree_oriented)  # (u, v, w)
    e1 = tri.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    e2 = tri.select(
        F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
    )
    e3 = tri.select(
        F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")
    )
    return (
        e1.unionByName(e2)
        .unionByName(e3)
        .groupBy("a", "b")
        .agg(F.count("*").alias("sup"))
    )


def k_truss(
    graph: Graph,
    k: int = 4,
    max_iterations: int = 200,
    degree_oriented: bool = True,
    checkpointer: Callable[[DataFrame, int], DataFrame] | None = None,
) -> DataFrame:
    """Edges of the k-truss of the UNDIRECTED SIMPLE view of ``graph``
    (multi-edges and self-loops ignored): DataFrame(a: long, b: long,
    support: long) with a < b and support the edge's triangle count
    WITHIN the truss (≥ k−2 by construction). Empty when no k-truss
    exists. Deterministic — the k-truss is unique (union of all subgraphs
    whose every edge has in-subgraph support ≥ k−2), so peel order cannot
    matter. ``k=2`` returns every canonical edge (support ≥ 0 always).
    """
    if k < 2:
        raise ValueError(f"k must be ≥ 2, got {k}")
    lazy = checkpointer is None
    checkpoint = checkpointer or _default_checkpointer
    alive = graph.canonical_undirected_edges()
    alive = alive.localCheckpoint(eager=False) if lazy else checkpoint(alive, 0)
    n_alive = alive.count()

    for it in range(1, max_iterations + 1):
        if n_alive == 0:
            break
        supp = _edge_support(alive, degree_oriented)
        nxt = (
            alive.join(supp, ["a", "b"], "left")
            .filter(F.coalesce(F.col("sup"), F.lit(0)) >= k - 2)
            .select("a", "b")
        )
        nxt = nxt.localCheckpoint(eager=False) if lazy else checkpoint(nxt, it)
        n_next = nxt.count()
        if n_next == n_alive:
            break
        alive, n_alive = nxt, n_next
    else:
        raise RuntimeError(
            f"k_truss(k={k}): peel did not converge in {max_iterations} "
            f"rounds — a long under-support front; raise max_iterations"
        )

    supp = _edge_support(alive, degree_oriented)
    return alive.join(supp, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("sup"), F.lit(0)).cast("long").alias("support")
    )
