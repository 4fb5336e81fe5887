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


def node2vec_walks(
    graph: Graph,
    walk_length: int = 3,
    walks_per_vertex: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 42,
    max_replicas: int = 64,
) -> DataFrame:
    """Second-order (node2vec, Grover & Leskovec KDD'16) biased walks with
    the same hash-argmin determinism as :func:`random_walks`. From prev
    vertex s at current v, candidate u gets unnormalized weight α(s,u) =
    1/p if u == s (return), 1 if edge s→u exists (stay near), else 1/q
    (explore) — the paper's search bias over DIRECTED out-adjacency.

    The weighted categorical draw is made EXACT and engine-neutral by
    integer replication instead of float keys: weights are scaled by the
    lcm of their denominators to small integers W(u), each candidate is
    expanded to W(u) replica rows, and the argmin of md5-60(seed|w|t|v|u|r)
    over all replicas picks u with probability W(u)/ΣW — no logs, no float
    comparisons, so the DuckDB oracle reproduces every step bit-for-bit.
    ``p``/``q`` must be dyadic-ish rationals (denominator ≤ 16) so the
    replica count stays ≤ ``max_replicas``; the first hop (no prev) is the
    uniform draw of random_walks with replica r=1.

    Per-step cost: one edges⋈state shuffle + one broadcast-able distinct-
    adjacency flag join + an in-array replica explode (≤ max-weight ×
    candidate rows) + a map-side-combinable min aggregate — O(Σ deg(cur) ·
    W_max) rows, state O(V · walks_per_vertex) like the first-order walk.
    """
    from fractions import Fraction
    from math import lcm

    p_f = Fraction(p).limit_denominator(16)
    q_f = Fraction(q).limit_denominator(16)
    if p_f <= 0 or q_f <= 0:
        raise ValueError(
            f"node2vec_walks: p={p} / q={q} round to a non-positive "
            "rational — both must be in (1/16, 16]-ish dyadic range"
        )
    wr_f = Fraction(1) / p_f   # return: 1/p
    wn_f = Fraction(1)         # neighbor: 1
    wf_f = Fraction(1) / q_f   # far: 1/q
    scale = lcm(wr_f.denominator, wn_f.denominator, wf_f.denominator)
    w_ret, w_nbr, w_far = (int(f * scale) for f in (wr_f, wn_f, wf_f))
    w_max = max(w_ret, w_nbr, w_far)
    if w_max > max_replicas or min(w_ret, w_nbr, w_far) < 1:
        raise ValueError(
            f"node2vec_walks: p={p}, q={q} scale to replica weights "
            f"({w_ret}, {w_nbr}, {w_far}) outside [1, {max_replicas}] — "
            "use rationals with denominator ≤ 16 and ratio ≤ "
            f"{max_replicas}"
        )

    k = walks_per_vertex
    edges = graph.edges.select("src", "dst")
    # deduped out-adjacency of prev for the α-tier flag: one row per
    # (pv, au) so the flag join cannot duplicate candidates
    adj = edges.select(
        F.col("src").alias("pv"), F.col("dst").alias("au")
    ).distinct().localCheckpoint(eager=True)

    state = (
        graph.vertices()
        .select("id", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"))
        .select(
            (F.col("id") * k + F.col("j")).alias("walk_id"),
            F.lit(None).cast("long").alias("prev"),
            F.col("id").alias("cur"),
        )
        .localCheckpoint(eager=True)
    )
    out = state.select(
        "walk_id", F.lit(0).cast("long").alias("step"), F.col("cur").alias("id")
    )
    for t in range(1, walk_length + 1):
        cand = edges.join(state, edges["src"] == state["cur"])
        if t == 1:
            # no prev: uniform draw, single replica (r = 1)
            cand = cand.withColumn("w", F.lit(1))
        else:
            cand = cand.join(
                adj,
                (cand["prev"] == adj["pv"]) & (cand["dst"] == adj["au"]),
                "left",
            ).withColumn(
                "w",
                F.when(F.col("dst") == F.col("prev"), F.lit(w_ret))
                .when(F.col("pv").isNotNull(), F.lit(w_nbr))
                .otherwise(F.lit(w_far)),
            )
        nxt = (
            cand.select(
                "walk_id",
                "src",
                "dst",
                F.explode(F.sequence(F.lit(1), F.col("w"))).alias("r"),
            )
            .withColumn(
                "h",
                _md5_60(f"concat_ws('|', {seed}, walk_id, {t}, src, dst, r)"),
            )
            .groupBy("walk_id")
            # src is constant within a walk's candidate set, so riding it
            # in the struct costs nothing and yields prev without a join
            .agg(F.min(F.struct("h", "dst", "r", "src")).alias("m"))
            .select(
                "walk_id",
                F.col("m.src").alias("prev"),
                F.col("m.dst").alias("cur"),
            )
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
