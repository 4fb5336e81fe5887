"""Deterministic distributed graph generators — the engine's synthetic
SOURCE side.

The reference consumes pre-generated Graph500 R-MAT inputs (its usage
text sizes -n for "rmat20 1048576" … "rmat27 134217728",
random.c:37-40) but cannot produce them; at 10^12-edge scale the
generator itself must be a distributed job (a single-node edge-list
writer IS the bottleneck). R-MAT (Chakrabarti-Zhan-Faloutsos 2004) is
embarrassingly parallel: every edge is independent, so the whole
generator is ONE projection over ``spark.range(n_edges)`` — zero
shuffles, zero UDFs, linear scan write.

Determinism (pinned, mirrored by oracle_sql.rmat_sql): the per-edge,
per-level quadrant draw is the 60-bit md5 of ``'{seed}|{i}|{level}'``
(docs._md5_60_sql — the engine-neutral hash every sketch here uses)
compared against INTEGER thresholds ``floor(cum_prob · 2^60)``: no
float arithmetic anywhere, so Spark and DuckDB (and any future engine
with md5) emit bit-identical edge lists for the same (scale, n_edges,
seed, a, b, c, d). Quadrant → bit mapping: (src_bit, dst_bit) =
(0,0)@a, (0,1)@b, (1,0)@c, (1,1)@d, most-significant level first — the
standard R-MAT recursion. Self-loops and multi-edges are kept (R-MAT
produces them; the reference's loader keeps them too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.docs import _md5_60_sql

_TWO60 = 1 << 60


def _thresholds(a: float, b: float, c: float) -> tuple[int, int, int]:
    """Integer cumulative thresholds in [0, 2^60) — the only place the
    float probabilities are touched, ONCE at plan-build time."""
    ta = int(a * _TWO60)
    tab = int((a + b) * _TWO60)
    tabc = int((a + b + c) * _TWO60)
    return ta, tab, tabc


def rmat_edges(
    spark: SparkSession,
    scale: int = 8,
    n_edges: int = 2048,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
) -> DataFrame:
    """Returns DataFrame(src: long, dst: long) — ``n_edges`` R-MAT edges
    over 2^scale vertices (d = 1 − a − b − c). One narrow projection over
    spark.range: ``scale`` md5 draws per edge, each picking one of four
    quadrants by integer threshold; bits assemble most-significant
    first."""
    if not 1 <= scale <= 40:
        raise ValueError(f"scale must be in [1, 40], got {scale}")
    ta, tab, tabc = _thresholds(a, b, c)
    src_terms, dst_terms = [], []
    for level in range(scale):
        u = _md5_60_sql(f"concat('{seed}|', id, '|{level}')")
        shift = scale - 1 - level
        # (src_bit, dst_bit): (0,0) if u<ta; (0,1) if u<tab; (1,0) if
        # u<tabc; else (1,1)
        src_terms.append(
            f"(CASE WHEN {u} < {tab}L THEN 0L ELSE {1 << shift}L END)"
        )
        dst_terms.append(
            f"(CASE WHEN {u} < {ta}L OR ({u} >= {tab}L AND {u} < {tabc}L) "
            f"THEN 0L ELSE {1 << shift}L END)"
        )
    return spark.range(n_edges).select(
        F.expr(" + ".join(src_terms)).alias("src"),
        F.expr(" + ".join(dst_terms)).alias("dst"),
    )
