"""Table sources/sinks — Iceberg-first with parquet fallback.

The production contract reads the source-code table and writes results as
Iceberg tables. This sandbox has no Iceberg catalog jars, so every entry
point goes through these helpers: they use ``format('iceberg')`` when a
catalog-qualified table name is given AND the runtime has Iceberg support,
and plain parquet paths otherwise. On a real cluster the swap is
configuration only (spark.sql.catalog.* + --packages iceberg-spark-runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
        return True
    except Exception:
        return False


def is_table_name(ref: str) -> bool:
    """catalog.db.table (no slashes) vs a filesystem path."""
    return "/" not in ref and "." in ref


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read ``ref`` — an Iceberg table name or a parquet path."""
    if is_table_name(ref) and _iceberg_available(spark):
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """Write ``df`` to an Iceberg table name or a parquet path."""
    spark = df.sparkSession
    if is_table_name(ref) and _iceberg_available(spark):
        df.write.format("iceberg").mode(mode).save(ref)
    else:
        df.write.mode(mode).parquet(ref)
