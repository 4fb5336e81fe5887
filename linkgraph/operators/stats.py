"""Whole-graph structural statistics — the first numbers anyone computes
on a link graph after the degree histogram.

Not in the reference binary set (its only whole-graph outputs are the WCC
census and per-phase timings); these are the standard link-graph summary
statistics, each a one-pass aggregate over the persisted edge layout —
no iteration, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def reciprocity(graph: Graph) -> DataFrame:
    """One row (reciprocity: double): the fraction of distinct non-self
    directed edges whose reverse edge also exists. Plan: one distinct
    (shuffle on the edge pair) + one self-semi-join on the same key — both
    hash-partitioned on (src, dst)/(dst, src), never all-pairs."""
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    tot = e.agg(F.count("*").alias("n"))
    rec = e.join(rev, ["src", "dst"], "left_semi").agg(F.count("*").alias("m"))
    return tot.crossJoin(rec).select(
        F.round(F.col("m") / F.col("n").cast("double"), 6).alias("reciprocity")
    )


def local_clustering(graph: Graph) -> DataFrame:
    """(id, lcc) over the full vertex set: the local clustering
    coefficient of the undirected simple graph —

        lcc(v) = 2 · tri(v) / (deg(v) · (deg(v) − 1)),   0 when deg < 2

    with tri(v) the per-corner triangle count (triangles.py) and deg(v)
    the distinct-neighbor count. One wedge-join pass (shared with
    triangles_per_vertex) + one degree aggregate + one vertex join;
    rounded to 6 dp."""
    from linkgraph.operators.triangles import triangles_per_vertex

    canon = graph.canonical_undirected_edges()
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    tri = triangles_per_vertex(graph)
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.round(
                F.when(
                    F.col("d") >= 2,
                    2.0 * F.col("triangles") / (F.col("d") * (F.col("d") - 1)),
                ).otherwise(0.0),
                6,
            ).alias("lcc"),
        )
    )


def modularity(graph: Graph, labels: DataFrame, label_col: str = "label") -> DataFrame:
    """One row (modularity: double): Newman modularity of the vertex
    partition ``labels`` (id, ``label_col``) over the undirected simple
    view of the graph —

        Q = intra/m − Σ_c (d_c / 2m)²

    with m the undirected simple edge count, intra the edges whose
    endpoints share a label, and d_c the summed degree of community c.
    THE community-quality number (Newman & Girvan 2004) — the standard
    check after label propagation / Louvain that the partition is better
    than chance (Q > 0). Plan: two label joins on the canonical edge set
    (one aggregate for m + intra), one degree aggregate joined to labels
    for Σ d_c² — all map-side-combinable; the final combine is a
    broadcast join of two 1-row aggregates. Rounded to 6 dp."""
    canon = graph.canonical_undirected_edges()
    la = labels.select(F.col("id").alias("a"), F.col(label_col).alias("la"))
    lb = labels.select(F.col("id").alias("b"), F.col(label_col).alias("lb"))
    mi = (
        canon.join(la, "a")
        .join(lb, "b")
        .agg(
            F.count("*").alias("m"),
            F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0)).alias("intra"),
        )
    )
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    sq = (
        deg.join(labels.select("id", F.col(label_col).alias("lbl")), "id")
        .groupBy("lbl")
        .agg(F.sum("d").alias("dsum"))
        .agg(F.sum(F.col("dsum") * F.col("dsum")).alias("sq"))
    )
    return mi.crossJoin(sq).select(
        F.round(
            F.col("intra") / F.col("m").cast("double")
            - F.col("sq") / (4.0 * F.col("m") * F.col("m")),
            6,
        ).alias("modularity")
    )


def conductance(
    graph: Graph, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """(label, vol, cut, conductance) per community of the vertex
    partition ``labels`` over the undirected simple view —

        φ(S) = cut(S) / min(vol(S), 2m − vol(S))

    with vol(S) the summed degree of S, cut(S) the edges leaving S, and
    m the undirected simple edge count. The per-community quality number
    beside the global modularity (Kannan-Vempala-Vetta 2004): low φ =
    well-separated community. Plan: the SAME two label joins on the
    canonical edge set as modularity (each cross-label edge credits BOTH
    sides' cuts via an in-array explode), one degree-by-label aggregate,
    a broadcast 1-row m; communities with min(vol, 2m−vol) = 0 (isolated
    vertices) report φ = 0. Rounded to 6 dp."""
    canon = graph.canonical_undirected_edges()
    la = labels.select(F.col("id").alias("a"), F.col(label_col).alias("la"))
    lb = labels.select(F.col("id").alias("b"), F.col(label_col).alias("lb"))
    cut = (
        canon.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") != F.col("lb"))
        .select(F.explode(F.array("la", "lb")).alias("label"))
        .groupBy("label")
        .agg(F.count("*").alias("cut"))
    )
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    vol = (
        labels.select("id", F.col(label_col).alias("label"))
        .join(deg, "id", "left")
        .groupBy("label")
        .agg(F.coalesce(F.sum("d"), F.lit(0)).alias("vol"))
    )
    m = canon.agg(F.count("*").alias("m"))
    denom = F.least(F.col("vol"), 2 * F.col("m") - F.col("vol")).cast("double")
    return (
        vol.join(cut, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            F.col("vol").cast("long").alias("vol"),
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            F.when(
                denom > 0,
                F.round(F.coalesce(F.col("cut"), F.lit(0)) / denom, 6),
            )
            .otherwise(F.lit(0.0))
            .alias("conductance"),
        )
    )


def degree_assortativity(graph: Graph) -> DataFrame:
    """One row (assortativity: double): Pearson correlation, over directed
    edges, between the source's out-degree and the destination's
    in-degree (out-in assortativity). Hubs-link-to-hubs → positive;
    hubs-link-to-leaves → negative. Two broadcast-or-shuffle joins against
    the persisted degrees table + one corr aggregate (corr is a single
    map-side-combinable moment aggregate in both Spark and the oracle)."""
    deg = graph.degrees()
    ds = deg.select(F.col("id").alias("src"), F.col("out_deg").alias("sdeg"))
    dd = deg.select(F.col("id").alias("dst"), F.col("in_deg").alias("ddeg"))
    e = graph.edges.select("src", "dst").join(ds, "src").join(dd, "dst")
    return e.agg(
        F.round(F.corr(F.col("sdeg").cast("double"), F.col("ddeg").cast("double")), 6).alias(
            "assortativity"
        )
    )


def diameter_lower_bound(graph: Graph, root: int = 0) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien-Latapy-Habib 2009) —
    the standard cheap diameter estimate on huge graphs (exact diameter
    is all-pairs; the double sweep is TWO BFS runs and is exact on
    trees, near-exact on web graphs):

        one row (root_id, ecc_root, far_id, far2_id, diameter_lb)

    sweep 1: BFS from ``root`` over the SYMMETRIZED view; far_id is the
    farthest reached vertex under (dist DESC, id ASC) and ecc_root its
    distance (root's eccentricity within its component). sweep 2: BFS
    from far_id; diameter_lb = its farthest distance — a valid lower
    bound because every eccentricity bounds the diameter from below.

    Physical: two frontier-BFS runs plus two 1-row TakeOrdered actions
    (never a global sort); the symmetrized adjacency is the persisted
    build-time layout, shared with every other undirected kernel."""
    from linkgraph.operators.bfs import bfs

    sym = graph.symmetrized()
    d1 = bfs(sym, root=root)
    far1 = d1.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    d2 = bfs(sym, root=int(far1["id"]))
    far2 = d2.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    return graph.spark.createDataFrame(
        [
            (
                int(root),
                int(far1["dist"]),
                int(far1["id"]),
                int(far2["id"]),
                int(far2["dist"]),
            )
        ],
        "root_id long, ecc_root long, far_id long, far2_id long, diameter_lb long",
    )


def community_graph(
    graph: Graph, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Contract a vertex partition into its community meta-graph:
    (c_a: long, c_b: long, n_edges: long) with ``c_a <= c_b``, one row
    per unordered community pair connected by at least one undirected
    simple edge — ``c_a = c_b`` rows carry the INTRA-community edge
    count (the contraction's self-loop weight). This is the coarsening
    step of every multilevel community pipeline (Louvain phase 2,
    multilevel partitioning): after labelprop/louvain_move assigns
    labels, the contracted graph is the next level's input, typically
    orders of magnitude smaller — the practical way to iterate
    community detection on a 10^12-edge graph.

    Plan: the canonical undirected simple edge set (persisted, shared
    with triangles/modularity) joined twice against ``labels`` — the
    ``a``-side join reuses canon's hash partitioning on ``a`` — then one
    (c_a, c_b) count aggregate with map-side partial combine; skew on a
    giant community is absorbed by the partial aggregate exactly as
    PageRank's hub mass is. Never materializes per-community vertex
    lists."""
    canon = graph.canonical_undirected_edges()
    la = labels.select(F.col("id").alias("a"), F.col(label_col).alias("la"))
    lb = labels.select(F.col("id").alias("b"), F.col(label_col).alias("lb"))
    return (
        canon.join(la, "a")
        .join(lb, "b")
        .select(
            F.least("la", "lb").alias("c_a"),
            F.greatest("la", "lb").alias("c_b"),
        )
        .groupBy("c_a", "c_b")
        .agg(F.count("*").alias("n_edges"))
    )


def rich_club(graph: Graph, k: int) -> DataFrame:
    """One row (k: int, n_rich: long, rich_club: double): the rich-club
    coefficient φ(k) (Colizza et al. 2006) of the undirected simple
    view — among the ``n_rich`` vertices of undirected simple degree
    > k, the fraction of the possible C(n_rich, 2) edges that exist:

        φ(k) = 2·E_k / (n_rich · (n_rich − 1)),   0.0 when n_rich < 2

    φ(k) near 1 at high k = the hubs form a near-clique (the classic
    web/AS-graph signature). Plan: one degree aggregate over the
    persisted canonical edge set, then TWO left-semi joins of canon
    against the rich vertex set (src side rides canon's partitioning on
    ``a``) and two scalar aggregates combined via a 1-row crossJoin —
    the rich set shrinks rapidly with k, so Catalyst/AQE broadcasts it;
    no all-pairs structure anywhere. Rounded to 6 dp."""
    if k < 0:
        raise ValueError(f"rich_club: k must be >= 0, got {k}")
    canon = graph.canonical_undirected_edges()
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    rich = deg.filter(F.col("d") > k).select("id")
    n_rich = rich.agg(F.count("*").alias("n_rich"))
    ek = (
        canon.join(rich.select(F.col("id").alias("a")), "a", "left_semi")
        .join(rich.select(F.col("id").alias("b")), "b", "left_semi")
        .agg(F.count("*").alias("ek"))
    )
    return n_rich.crossJoin(ek).select(
        F.lit(int(k)).alias("k"),
        F.col("n_rich"),
        F.round(
            F.when(
                F.col("n_rich") >= 2,
                2.0 * F.col("ek") / (F.col("n_rich") * (F.col("n_rich") - 1.0)),
            ).otherwise(0.0),
            6,
        ).alias("rich_club"),
    )


def degree_powerlaw(graph: Graph, d_min: int = 2) -> DataFrame:
    """One row (alpha, d_min, n_tail, d_max): continuous-approximation
    MLE of the power-law exponent of the undirected distinct-neighbor
    degree distribution above ``d_min`` (Clauset, Shalizi & Newman 2009,
    eq. 3.7) —

        alpha = 1 + n_tail / Σ_{d(v) >= d_min} ln( d(v) / (d_min − 0.5) )

    THE summary statistic of link-graph skew: web/dependency graphs
    famously report alpha ≈ 2.1 (Broder et al. 2000), and alpha drives
    every skew decision in this engine (salting thresholds, wedge-join
    hub caps). Plan: the canonical-undirected degree aggregate + one
    scalar agg — two shuffles, no iteration, no driver data. ``alpha``
    rounded to 6 dp (both engines sum IEEE doubles over a ~V-term series
    whose terms are exactly reproducible: ln of an integer ratio)."""
    canon = graph.canonical_undirected_edges()
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionByName(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= d_min)
    )
    return deg.agg(
        F.round(
            1.0
            + F.count("*")
            / F.sum(F.log(F.col("d") / (F.lit(d_min) - F.lit(0.5)))),
            6,
        ).alias("alpha"),
        F.lit(d_min).cast("long").alias("d_min"),
        F.count("*").alias("n_tail"),
        F.max("d").alias("d_max"),
    )
