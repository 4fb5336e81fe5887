"""Graph: the engine's single physical layout.

The reference maintains ten physical layouts (edge array / CSR / 2D grid,
selected by ``-m``, init_all.c:855-888) because random memory access cost
dominates on a single node. On Spark the shuffle subsystem plays that role
natively, so this engine has exactly ONE layout:

    edges: DataFrame(src: long, dst: long, weight: double)
           hash-partitioned on ``src`` and persisted.

- hash partitioning on ``src`` ≈ the reference's range partitioning
  (get_partition_id, init_all.c:54-60) but with skew mixing;
- ``sortWithinPartitions(src, dst)`` at build time gives the CSR-style
  clustering of init_adj_sort (init_all.c:629-790) without a global sort;
- the transposed (in-edge) orientation (init_all.c:714-784) is just the
  same DataFrame joined on ``dst`` — Catalyst plans the direction;
- degree tables (count_degree, init_all.c:425-443) are one groupBy-count.

Scale notes (100 TB / 10^12 edges): the edges DataFrame is the big,
immutable side — partition it ONCE, persist/checkpoint it, and shuffle the
small per-vertex state to it every iteration, never the reverse. Partition
count should be ~2-3x total cores and sized so a partition's edges fit in
executor memory (spark.sql.files.maxPartitionBytes governs the scan side).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def synthetic_weight(src: F.Column, dst: F.Column) -> F.Column:
    """Reference-parity synthetic weight ``w = src%10 + dst%10``.

    Mirrors the CREATE_WEIGHT path of the reference loader
    (init_all.c:661-667, 681-686): when an algorithm needs weights but the
    input has none, this deterministic weight is synthesized.
    """
    return (src % 10 + dst % 10).cast("double")


@dataclass
class Graph:
    """An immutable directed multigraph over dense vertex ids [0, num_vertices).

    ``edges`` carries (src, dst, weight). Multi-edges are preserved (the
    reference keeps them; only SSSP skips self-loops,
    sssp_pushpull.c:47) — callers that need a simple graph use
    :meth:`canonical_undirected`.
    """

    spark: SparkSession
    edges: DataFrame
    num_vertices: int
    num_partitions: int = 32
    _cache: dict = field(default_factory=dict, repr=False)

    # ---------------------------------------------------------------- build
    @classmethod
    def from_edges(
        cls,
        spark: SparkSession,
        edges: DataFrame,
        num_vertices: int | None = None,
        num_partitions: int | None = None,
        add_weight_if_missing: bool = True,
        persist: bool = True,
    ) -> "Graph":
        """Build the partitioned, persisted edge layout.

        ``num_vertices`` defaults to ``max(src, dst) + 1`` (the reference
        takes NB_NODES as a CLI argument, random.c:66-79; we infer when not
        given). Vertex ids must already be dense longs — use
        ``linkgraph.ingest.extract.assign_vertex_ids`` for string keys.
        """
        if num_partitions is None:
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        cols = [F.col("src").cast("long"), F.col("dst").cast("long")]
        if "weight" in edges.columns:
            cols.append(F.col("weight").cast("double"))
        elif add_weight_if_missing:
            cols.append(
                synthetic_weight(F.col("src").cast("long"), F.col("dst").cast("long")).alias("weight")
            )
        e = edges.select(*cols)
        # One shuffle at build time buys co-clustered, re-usable adjacency
        # for every subsequent iteration (the init_adj_sort analog).
        e = e.repartition(num_partitions, "src").sortWithinPartitions("src", "dst")
        if persist:
            e = e.persist(StorageLevel.MEMORY_AND_DISK)
        if num_vertices is None:
            row = e.agg(
                F.greatest(F.max("src"), F.max("dst")).alias("mx"),
            ).collect()[0]
            num_vertices = int(row["mx"]) + 1 if row["mx"] is not None else 0
        return cls(spark=spark, edges=e, num_vertices=num_vertices, num_partitions=num_partitions)

    # ------------------------------------------------------------- variants
    def vertices(self) -> DataFrame:
        """Dense vertex-id DataFrame [0, num_vertices) — the reference's
        implicit vertex set (ids below NB_NODES, random.c:66)."""
        return self.spark.range(self.num_vertices).select(F.col("id").cast("long"))

    def symmetrized(self) -> "Graph":
        """Undirected view by doubling: each edge also emitted reversed —
        the ``-u`` load path (init_all.c:102-106, nb_edges *= 2).
        Multi-edges are preserved, exactly as the reference does."""
        if "sym" not in self._cache:
            extra = ["weight"] if "weight" in self.edges.columns else []
            rev = self.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), *extra
            )
            sym = self.edges.unionByName(rev)
            sym = sym.repartition(self.num_partitions, "src").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            self._cache["sym"] = Graph(
                spark=self.spark,
                edges=sym,
                num_vertices=self.num_vertices,
                num_partitions=self.num_partitions,
            )
        return self._cache["sym"]

    def canonical_undirected_edges(self) -> DataFrame:
        """Deduplicated undirected simple edges with ``a < b`` — the input
        contract for triangle counting (self-loops and multi-edges removed,
        each undirected edge represented once). Persisted: consumers
        (wedge build + closing semi-join) scan it multiple times."""
        if "canon" not in self._cache:
            e = self.edges.filter(F.col("src") != F.col("dst"))
            canon = (
                e.select(
                    F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"),
                )
                .dropDuplicates(["a", "b"])
                .repartition(self.num_partitions, "a")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            self._cache["canon"] = canon
        return self._cache["canon"]

    def num_edges(self) -> int:
        """Edge count (nb_edges, init_all.c:821), cached — the direction
        heuristic's denominator (bfs_simple.c:191: nb_edges/20)."""
        if "num_edges" not in self._cache:
            self._cache["num_edges"] = self.edges.count()
        return self._cache["num_edges"]

    def degrees(self) -> DataFrame:
        """(id, out_deg, in_deg) over the FULL dense vertex set (isolated
        vertices included with degree 0) — count_degree analog
        (init_all.c:425-443), one shuffle each side, map-side combined."""
        if "degrees" not in self._cache:
            out_d = self.edges.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("out_deg")
            )
            in_d = self.edges.groupBy(F.col("dst").alias("id")).agg(
                F.count("*").alias("in_deg")
            )
            deg = (
                self.vertices()
                .join(out_d, "id", "left")
                .join(in_d, "id", "left")
                .select(
                    "id",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                )
            )
            self._cache["degrees"] = deg.persist(StorageLevel.MEMORY_AND_DISK)
        return self._cache["degrees"]

    def out_normalized_edges(self) -> DataFrame:
        """(src, dst, inv_out_deg) — edges pre-joined with 1/outdeg(src),
        persisted once so the PageRank loop never re-joins degrees.

        This is the engine's CSR: the reference stores outgoing_edges +
        nb_out_edges per vertex (random.h:87-93) for exactly this division
        (pagerank_simple.c:63-69)."""
        if "norm" not in self._cache:
            out_d = self.edges.groupBy("src").agg(F.count("*").alias("out_deg"))
            norm = (
                self.edges.join(out_d, "src")
                .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_out_deg"))
                .repartition(self.num_partitions, "src")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            self._cache["norm"] = norm
        return self._cache["norm"]

    def edges_with_dst_out_deg(self) -> DataFrame:
        """(src, dst, weight, dst_out_deg) — edges pre-joined with
        outdeg(dst), persisted once (the traversal sibling of
        :meth:`out_normalized_edges`). BFS/SSSP aggregate the next
        frontier's out-degree sum IN the relaxation groupBy itself, so the
        reference's degree-weighted direction statistic (bfs_simple.c:191,
        buffer.c:272-282) costs zero per-level joins — one build-time
        shuffle buys every level of every traversal."""
        if "dst_deg" not in self._cache:
            out_d = self.edges.groupBy(F.col("src").alias("_v")).agg(
                F.count("*").alias("dst_out_deg")
            )
            e = (
                self.edges.join(out_d, self.edges["dst"] == F.col("_v"), "left")
                .drop("_v")
                .withColumn("dst_out_deg", F.coalesce("dst_out_deg", F.lit(0)))
                .repartition(self.num_partitions, "src")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            self._cache["dst_deg"] = e
        return self._cache["dst_deg"]

    def unpersist(self) -> None:
        self.edges.unpersist()
        for v in self._cache.values():
            if isinstance(v, Graph):
                v.unpersist()
            elif isinstance(v, DataFrame):
                v.unpersist()
        self._cache.clear()
