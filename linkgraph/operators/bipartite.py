"""Bipartite projection — build a weighted co-occurrence link graph
from a two-column containment relation.

THE canonical link-graph construction: co-purchase graphs from
(order, part), co-authorship from (paper, author), co-click from
(session, page). The reference consumes edge lists that upstream
systems built exactly this way; this operator is that upstream step,
in-engine.

Semantics (pinned, mirrored by oracle_sql.bipartite_project_sql):
- the relation is DISTINCT (left, right) pairs (containment is a set);
- projected edge (a < b) between two right-keys with weight = the
  number of DISTINCT left-keys containing both;
- ``min_count`` keeps edges with weight ≥ min_count (the support
  threshold every co-occurrence pipeline applies);
- ``max_left_degree`` drops left-keys containing more than that many
  right-keys from the projection ENTIRELY (None = exact). This is the
  scale knob: one 10⁶-item megabasket alone contributes C(10⁶,2) ≈
  5·10¹¹ pairs; real co-occurrence pipelines cap basket size because
  giant baskets carry no signal (everything co-occurs with
  everything). ``bipartite_dropped_left`` audits exactly what a cap
  dropped, the minhash_dropped_buckets convention.

Physical: one distinct shuffle on the relation, an optional degree
semi-join, ONE left-keyed self-join whose output (Σ C(size,2) rows)
flows straight into a map-side-combined (a, b) count — the pair table
is never wider than the surviving co-occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_rel(rel: DataFrame, left_col: str, right_col: str) -> DataFrame:
    return rel.select(
        F.col(left_col).alias("l"), F.col(right_col).alias("r")
    ).distinct()


def bipartite_project(
    rel: DataFrame,
    left_col: str,
    right_col: str,
    min_count: int = 1,
    max_left_degree: int | None = None,
) -> DataFrame:
    """Returns DataFrame(a, b, weight) — the projection of ``rel`` onto
    its ``right_col`` values (a < b, weight = distinct shared left-keys,
    weight ≥ min_count)."""
    d = _distinct_rel(rel, left_col, right_col)
    if max_left_degree is not None:
        sizes = d.groupBy("l").agg(F.count("*").alias("sz"))
        d = d.join(sizes.filter(F.col("sz") <= max_left_degree).select("l"), "l")
    d = d.localCheckpoint(eager=False)  # consumers: both sides of the self-join
    x = d.select("l", F.col("r").alias("a"))
    y = d.select(F.col("l").alias("l2"), F.col("r").alias("b"))
    return (
        x.join(y, x["l"] == y["l2"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("weight"))
        .filter(F.col("weight") >= min_count)
    )


def bipartite_dropped_left(
    rel: DataFrame, left_col: str, right_col: str, max_left_degree: int
) -> DataFrame:
    """(l, sz) — the left-keys a ``max_left_degree`` cap excludes, with
    their sizes: the audit row for every capped projection run."""
    d = _distinct_rel(rel, left_col, right_col)
    return (
        d.groupBy("l")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") > max_left_degree)
    )
