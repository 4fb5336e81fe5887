"""SparkSession factory with the engine's scale-oriented defaults.

The defaults encode the physical-execution decisions from SURVEY.md §4:

- **AQE on** (runtime re-plan: partition coalescing, skew-join splitting) —
  the Spark-native analog of the reference's chunked dynamic load balancing
  (buffer.c:140-170) and NUMA work stealing (pr_numa.c:325-351).
- **skewJoin on** — hub vertices (a repo imported by everything) are the
  RMAT hubs the reference's 2D grid layout exists to tame; AQE splits the
  skewed shuffle partitions at runtime.
- **shuffle.partitions** sized for the local harness; on a real cluster set
  this to ~2-3x total cores via spark-submit conf.
- **Arrow enabled** for pandas UDFs (the only allowed Python execution path
  per the engine contract: vectorized Arrow batches, never per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linkgraph",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for the sandbox; in production the master comes from spark-submit and
    this argument is left None.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # Shuffle spill to tmpfs when available: local-mode shuffles are disk-I/O
    # bound otherwise (measured 2.8x on the PR loop). On a real cluster this
    # is the NVMe scratch volume configured via spark-submit.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
