"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k against a query vector:
  the correctness baseline. One scan, no shuffle except the final top-k
  (a TakeOrdered, not a full sort).
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH
  (sign-of-dot-product bits, deterministic seeded planes) buckets
  vectors; only the query's bucket(s) are scanned exactly. At 100 TB the
  bucketed table is written partitioned by bucket so a query prunes to
  one partition (partition pruning at the scan).

All arithmetic is JVM-side (zip_with / aggregate over array columns) —
no Python UDFs. Dot products accumulate in float64 in index order, so
results are deterministic and match a SQL oracle bit-for-bit before
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k rows by cosine similarity to the row with ``query_vec_id``
    (itself excluded). Deterministic tie-break: (sim desc, id asc).
    Returns (vec_id, sim)."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    scored = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(
                _dot(vec_col, "qv")
                / F.nullif(_norm(vec_col) * _norm("qv"), F.lit(0.0)),
                6,
            ).alias("sim"),
        )
    )
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


def _infer_dim(embeddings: DataFrame, vec_col: str) -> int:
    row = embeddings.select(F.size(vec_col).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dimension from column {vec_col!r}")
    return int(row["d"])


def bucket_expr(num_bits: int, dim: int, seed: int, vec_col: str) -> str:
    """SQL expression computing the random-hyperplane LSH bucket of a
    vector column — row-local (no joins, no broadcast state). Plane p's
    component j is a deterministic pseudo-gaussian (sum of three
    xxhash64-derived uniforms, centered); bit_p = sign(v · plane_p)."""

    def plane_component(p: int, j: int) -> str:
        draws = "+".join(
            f"(CAST(xxhash64({seed}, {p}, {j}, {t}) & 1048575 AS DOUBLE) / 1048576.0)"
            for t in range(3)
        )
        return f"(({draws}) - 1.5)"

    bit_exprs = []
    for p in range(num_bits):
        terms = " + ".join(
            f"CAST({vec_col}[{j}] AS DOUBLE) * {plane_component(p, j)}" for j in range(dim)
        )
        bit_exprs.append(
            f"shiftleft(CAST(CASE WHEN ({terms}) >= 0 THEN 1 ELSE 0 END AS BIGINT), {p})"
        )
    return " | ".join(bit_exprs)


def hyperplane_buckets(
    embeddings: DataFrame,
    num_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) — random-hyperplane LSH bucket per vector.
    ``dim`` defaults to the actual vector length (one first() probe);
    an explicit wrong dim would crash under ANSI (index out of bounds)
    or silently zero the planes with ANSI off."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.expr(bucket_expr(num_bits, dim, seed, vec_col)).alias("bucket"),
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    num_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket only.

    Recall depends on num_bits (fewer bits → bigger buckets → higher
    recall, more compute). Returns (vec_id, sim) like :func:`cosine_topk`.
    """
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    # bucket is a row-local expression — withColumn, NOT a self-join (a
    # self-join here would shuffle the whole table just to reattach a
    # column computed from the same row)
    with_b = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col),
        F.expr(bucket_expr(num_bits, dim, seed, vec_col)).alias("bucket"),
    )
    qb = with_b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket"), F.col(vec_col).alias("qv")
    )
    scored = (
        with_b.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            F.round(
                _dot(vec_col, "qv")
                / F.nullif(_norm(vec_col) * _norm("qv"), F.lit(0.0)),
                6,
            ).alias("sim"),
        )
    )
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)
