"""Deterministic random-walk corpus generation (DeepWalk / node2vec-style).

The training-data side of a link-graph engine: graph-embedding pipelines
(DeepWalk, Perozzi et al. KDD'14; node2vec, Grover & Leskovec KDD'16)
consume a corpus of fixed-length random walks as "sentences". On a
shared-nothing engine a *seeded deterministic* walk beats true randomness:
reruns are reproducible, resume is trivial, and the correctness gate can
value-check every step. The next-hop rule is hash-argmin — from vertex v
at step t in walk w, move to the out-neighbor u minimizing the
engine-neutral 60-bit md5 of ``seed|w|t|v|u`` (ties broken by u) — i.e. a
uniform draw from the out-neighborhood keyed by a counter-mode hash, the
same construction as docs.py's deterministic corpus sampling.

Scale shape: walk state is one row per live walk (O(V · walks_per_vertex),
independent of E); each step is ONE edges⋈state shuffle with a
map-side-combinable min(struct(h, dst)) aggregate, eagerly checkpointed so
step t never recomputes steps < t (the fan-out-recompute pitfall: a union
of L lazily-chained steps replays the whole prefix per branch). Walks at
dead ends (no out-edge) simply end early, like the papers' implementations.

No reference twin — the reference (bfs_simple.c etc.) has no sampling
kernels; this is a beyond-reference training-pipeline operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.docs import _md5_60
from linkgraph.graph import Graph


def random_walks(
    graph: Graph,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    seed: int = 42,
) -> DataFrame:
    """DataFrame(walk_id: long, step: long, id: long): walk ``w*k + j``
    (j in [0, walks_per_vertex)) starts at vertex w; row (walk_id, t, v)
    means the walk is at v after t hops. Deterministic in ``seed``;
    duplicate parallel edges cannot change the argmin (same hash), so no
    dedup shuffle is spent on them."""
    k = walks_per_vertex
    edges = graph.edges.select("src", "dst")
    state = (
        graph.vertices()
        .select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        )
        .select(
            (F.col("id") * k + F.col("j")).alias("walk_id"),
            F.col("id").alias("cur"),
        )
        .localCheckpoint(eager=True)
    )
    out = state.select(
        "walk_id", F.lit(0).cast("long").alias("step"), F.col("cur").alias("id")
    )
    for t in range(1, walk_length + 1):
        nxt = (
            edges.join(state, edges["src"] == state["cur"])
            .withColumn(
                "h",
                _md5_60(f"concat_ws('|', {seed}, walk_id, {t}, src, dst)"),
            )
            .groupBy("walk_id")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select("walk_id", F.col("m.dst").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            nxt.select(
                "walk_id",
                F.lit(t).cast("long").alias("step"),
                F.col("cur").alias("id"),
            )
        )
        state = nxt
    return out


def walk_corpus(walks: DataFrame) -> DataFrame:
    """(walk_id, sentence: array<long>) — the step-ordered 'sentences' an
    embedding trainer (word2vec over vertex ids) consumes. One shuffle;
    sort_array over (step, id) structs keeps the order exact without a
    window."""
    return (
        walks.groupBy("walk_id")
        .agg(F.sort_array(F.collect_list(F.struct("step", "id"))).alias("s"))
        .select("walk_id", F.col("s.id").alias("sentence"))
    )


def skipgram_pairs(corpus: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n_pairs) — word2vec skip-gram training pairs from
    the walk corpus: every ordered pair of sentence positions (i, j) with
    j ≠ i and |i − j| ≤ ``window``, counted over all sentences. This is
    the last dataflow stage before the embedding trainer (DeepWalk trains
    word2vec on exactly these pairs); n_pairs is the co-occurrence weight
    a count-based factorization (GloVe/PMI) would consume directly.

    Plan shape: the position cross-product is built INSIDE the sentence
    array with nested higher-order functions (O(L²) per sentence, L =
    walk_length+1 — tiny and JVM-side), so the only shuffle is the final
    (center, context) aggregate; no self-join of the corpus against
    itself. Lambda variables are bound references (the Catalyst
    no-hoisting pitfall from docs._shingle_stream does not bite here).
    """
    pair_expr = f"""
    flatten(transform(sentence, (c, i) ->
        transform(
            filter(transform(sentence, (x, j) -> struct(x AS ctx, j AS pos)),
                   s -> s.pos != i AND abs(s.pos - i) <= {int(window)}),
            s -> struct(c AS center, s.ctx AS context))))
    """
    return (
        corpus.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
