"""Explicit hub-vertex salting — two-phase aggregation for skewed keys.

The reference's answer to skew is the 2D grid layout plus work stealing
(pr_numa.c:325-351); the Spark-native answer is two-phase aggregation:
scatter each skewed destination key over ``salt`` sub-keys, aggregate
(dst, salt) partially, then re-aggregate dst. Catalyst's map-side partial
aggregate already absorbs MOST skew for algebraic aggregates; explicit
salting additionally bounds the size of every FINAL-aggregate group, which
matters when one hub's partial results alone exceed a reducer (a repo
imported by everything ≈ an RMAT hub at 10^12 files).

``salted_sum`` is aggregation-side salting. Join-side skew (a hub vertex
whose edge block dwarfs one shuffle partition) is handled by AQE skew-join
(on by default in linkgraph.session); both mechanisms compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    out: str,
    salt: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """sum(value) grouped by key, via (key, salt) partial then key final.

    The salt is derived from ``salt_source`` (a column whose values spread
    a hub's rows — e.g. the edge's src when aggregating by dst) so the
    scatter is deterministic; falls back to a per-row hash of the value.
    Result: DataFrame(key, out) — identical to a plain groupBy-sum.
    """
    s = F.pmod(F.xxhash64(F.col(salt_source if salt_source else value)), F.lit(salt))
    partial = (
        df.withColumn("_salt", s)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_psum"))
    )
    return partial.groupBy(key).agg(F.sum("_psum").alias(out))
