"""Deterministic graph sampling — run expensive kernels on an auditable
fraction of a 10^12-edge graph.

At 100 TB you estimate before you compute: triangle counts, degree
distributions and motif statistics are routinely measured on a sample
first. ``df.sample`` is unusable for that audit trail — its RNG is
seeded per PARTITION, so the selected set changes whenever the layout
does. Both samplers here reuse the corpus sampler's engine-neutral rule
(docs.sample_documents): keep iff the 60-bit md5 of a tagged key falls
below rate·2^60 — reproducible across engines, runs, partitionings, and
(for vertex sampling) CONSISTENT: the same vertex set is kept no matter
which table it is matched against, so induced subgraphs compose with
any vertex-keyed state.

- ``sample_edges``: independent per-edge keep, key ``esamp:<seed>:src:dst``.
  Uniform edge sampling — unbiased for per-edge statistics (e.g. E[w]),
  scales triangle counts by p³.
- ``sample_vertices_induced``: per-VERTEX keep, key ``vsamp:<seed>:id``;
  an edge survives iff BOTH endpoints are kept (the induced-subgraph
  convention — unbiased for motif densities at p², p³ scaling). The
  filter is two pure hash predicates ON the edge row itself — no join,
  no shuffle, no materialized vertex list; the same predicate applied
  to any vertex-keyed table selects the consistent vertex set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.docs import _md5_60
from linkgraph.graph import Graph


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * float(1 << 60))


def sample_edges(graph: Graph, rate: float, seed: int = 42) -> DataFrame:
    """Uniform independent edge sample — keep an edge iff
    md5_60('esamp:<seed>:<src>:<dst>') < rate·2^60. Returns the kept
    edge rows (src, dst, weight). Parallel edges share a key and are
    kept or dropped together (the multiset stays consistent)."""
    t = _threshold(rate)
    h = _md5_60(
        f"concat('esamp:{seed}:', CAST(src AS STRING), ':', CAST(dst AS STRING))"
    )
    return graph.edges.filter(h < F.lit(t))


def sample_vertices_induced(graph: Graph, rate: float, seed: int = 42) -> DataFrame:
    """Vertex-induced subgraph sample — a vertex is kept iff
    md5_60('vsamp:<seed>:<id>') < rate·2^60; an edge survives iff both
    endpoints are kept. Zero-shuffle: two hash predicates on the edge
    row, pushed to the scan."""
    t = _threshold(rate)

    def keep(col: str):
        return _md5_60(f"concat('vsamp:{seed}:', CAST({col} AS STRING))") < F.lit(t)

    return graph.edges.filter(keep("src") & keep("dst"))


def ego_network(graph: Graph, seeds: "list[int]", hops: int = 2) -> DataFrame:
    """Induced subgraph extraction around a seed set: the DISTINCT
    directed edges (src: long, dst: long) whose BOTH endpoints lie
    within ``hops`` undirected hops of any seed — the standard ego-net /
    snowball extraction ("pull the neighborhood of these repos into a
    workbench") that turns a 10^12-edge graph into something a single
    analyst session can hold. Reachability is over the SYMMETRIZED view
    (an ego-net that ignored in-links would miss every page linking TO
    the seed); the returned edges keep their original direction, deduped
    so the output is a simple directed edge set (self-loops inside the
    ball included).

    Plan: ``hops`` frontier-expansion rounds over the persisted
    symmetrized adjacency — each round one join + union + dropDuplicates
    on the (small) reached-vertex state, checkpointed per round exactly
    like BFS — then TWO left-semi joins filter the edge table against
    the final ball (the ball is ego-net-small, so AQE broadcasts it;
    the edge scan is one pass, never a collect of the neighborhood)."""
    if hops < 0:
        raise ValueError(f"ego_network: hops must be >= 0, got {hops}")
    if not seeds:
        raise ValueError("ego_network: seeds must be non-empty")
    spark = graph.spark
    sym = graph.symmetrized().edges.select("src", "dst")
    ball = spark.createDataFrame(
        [(int(s),) for s in sorted({int(s) for s in seeds})], "id long"
    )
    frontier = ball
    for _ in range(hops):
        nxt = (
            sym.join(frontier, sym["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .join(ball, "id", "left_anti")
            .distinct()
        )
        ball = ball.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        graph.edges.select("src", "dst")
        .join(ball.select(F.col("id").alias("src")), "src", "left_semi")
        .join(ball.select(F.col("id").alias("dst")), "dst", "left_semi")
        .select("src", "dst")
        .distinct()
    )
