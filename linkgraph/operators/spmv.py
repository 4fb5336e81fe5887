"""SpMV — one join-aggregate pass, the building block every kernel iterates.

Reference semantics (/root/reference/spmv.c): x initialized to the vertex
id (spmv.c:125-128); single pass y[v] = Σ_{(u,v)∈E_in} 0.001 · x[u]
(spmv_algo, spmv.c:98-106). Push (atomic writeAdd, spmv.c:110-118) and
pull are again the same ``groupBy(dst).sum()`` plan.

Vertices with no in-edges get y = 0 (the reference's value_out array is
calloc'd, spmv.c:119-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph

SCALE = 0.001  # spmv.c:103


def spmv(graph: Graph, x: DataFrame | None = None, scale: float = SCALE) -> DataFrame:
    """Returns DataFrame(id: long, y: double) = scale · Aᵀ·x over in-edges.

    ``x`` is DataFrame(id, x); defaults to x[i] = i (spmv.c:125-128).
    """
    if x is None:
        x = graph.vertices().select("id", F.col("id").cast("double").alias("x"))
    edges = graph.edges.select("src", "dst")
    y = (
        edges.join(x, edges["src"] == x["id"])
        .select(F.col("dst"), (F.lit(scale) * F.col("x")).alias("xs"))
        .groupBy("dst")
        .agg(F.sum("xs").alias("y"))
    )
    return (
        graph.vertices()
        .join(y, F.col("id") == F.col("dst"), "left")
        .select("id", F.coalesce("y", F.lit(0.0)).alias("y"))
    )
