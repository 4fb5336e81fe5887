"""Strongly connected components — FW-BW-Trim coloring, O(V) state.

The web-graph bowtie decomposition (Broder et al., "Graph structure in
the web") needs SCCs, not WCCs: the reference's wcc.c (wcc.c:131-277)
symmetrizes away direction, so SCC is the directed sibling this engine
adds beyond the reference. Algorithm is the coloring FW-BW-Trim family
(Orzan 2004; Slota, Rajamanickam & Madduri, IPDPS 2014), which is the
standard distributed SCC — Tarjan/Kosaraju are inherently sequential.

Per outer pass over the remaining subgraph:

1. **Trim** to fixpoint: vertices with in-degree 0 or out-degree 0 in
   the remaining subgraph are singleton SCCs — peel them all at once.
   This disposes of the DAG tendrils that would otherwise cost one
   coloring pass each.
2. **Forward color** to fixpoint: f(v) = min active id that reaches v,
   by directed hash-min label propagation (the wcc.py worklist shape,
   one direction only). f is constant on every SCC, and each color
   root r (f(r)=r) is the minimum id of its own SCC.
3. **Backward sweep**: v belongs to SCC(r) iff f(v)=r and v reaches r;
   any v→r path stays inside color class r (every intermediate x has
   r→x and x→r, hence f(x)=r), so the sweep is a reverse BFS from the
   roots restricted to edges with f(src)=f(dst) — all colors advance
   in ONE job per level.
4. **Peel** the swept vertices (scc = their color = min id in the SCC,
   matching the oracle's MIN over the mutual-reachability relation)
   and drop their edges; repeat.

Scale shape: state is O(V_remaining) labels + the remaining edge set;
every round is one edges⋈frontier shuffle with map-side-combinable
min/dedup aggregates; no collect beyond the per-round empty-frontier
check (the round's single materializing action on a lazy checkpoint).
Web graphs finish in 1 coloring pass + trim (giant SCC + tendrils);
``max_outer`` guards pathological chains of small SCCs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def _peel(assigned: DataFrame, newly: DataFrame) -> DataFrame:
    return assigned.unionByName(newly) if assigned is not None else newly


def scc(
    graph: Graph,
    max_outer: int = 64,
    max_inner: int = 256,
) -> DataFrame:
    """DataFrame(id: long, scc: long): scc = MIN vertex id in the
    strongly connected component of id (deterministic; singleton SCCs
    label themselves). Directed semantics — compare wcc() which labels
    the undirected components."""
    spark = graph.spark
    edges0 = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    remaining = graph.vertices().select("id").localCheckpoint(eager=True)
    edges = edges0.localCheckpoint(eager=True)
    assigned: DataFrame | None = None

    for _outer in range(max_outer):
        # ---- 1. trim singleton SCCs (in-deg 0 or out-deg 0) to fixpoint
        for _ in range(max_inner):
            outs = edges.select(F.col("src").alias("id")).dropDuplicates(["id"])
            ins = edges.select(F.col("dst").alias("id")).dropDuplicates(["id"])
            core = outs.join(ins, "id")  # has both an in- and an out-edge
            trimmed = remaining.join(core, "id", "left_anti").select(
                "id", F.col("id").alias("scc")
            )
            trimmed = trimmed.localCheckpoint(eager=False)
            if trimmed.isEmpty():
                break
            assigned = _peel(assigned, trimmed)
            remaining = remaining.join(trimmed, "id", "left_anti").localCheckpoint(
                eager=False
            )
            edges = (
                edges.join(trimmed.select(F.col("id").alias("src")), "src", "left_anti")
                .join(trimmed.select(F.col("id").alias("dst")), "dst", "left_anti")
                .select("src", "dst")
                .localCheckpoint(eager=False)
            )
            if remaining.isEmpty():
                break
        if remaining.isEmpty():
            break

        # ---- 2. forward color: f(v) = min remaining id reaching v
        f = remaining.select("id", F.col("id").alias("f")).localCheckpoint(eager=True)
        frontier = f
        for _ in range(max_inner):
            upd = (
                edges.join(frontier, edges["src"] == frontier["id"])
                .select(F.col("dst"), F.col("f").alias("cand"))
                .groupBy("dst")
                .agg(F.min("cand").alias("cand"))
            )
            merged = (
                f.join(upd, f["id"] == upd["dst"], "left")
                .select(
                    "id",
                    F.col("f").alias("old_f"),
                    F.least(F.col("f"), F.coalesce("cand", F.col("f"))).alias("f"),
                )
                .localCheckpoint(eager=False)
            )
            frontier = merged.filter(F.col("f") < F.col("old_f")).select("id", "f")
            f = merged.select("id", "f")
            if frontier.isEmpty():
                break
        else:
            raise RuntimeError(
                f"scc: forward coloring not converged in {max_inner} rounds"
            )

        # ---- 3. backward sweep from roots over same-color edges
        fc_src = f.select(F.col("id").alias("src"), F.col("f").alias("f_src"))
        fc_dst = f.select(F.col("id").alias("dst"), F.col("f").alias("f_dst"))
        colored = (
            edges.join(fc_src, "src")
            .join(fc_dst, "dst")
            .filter(F.col("f_src") == F.col("f_dst"))
            .select("src", "dst", F.col("f_src").alias("color"))
            .localCheckpoint(eager=True)
        )
        roots = f.filter(F.col("f") == F.col("id")).select("id", F.col("f").alias("color"))
        reached = roots.localCheckpoint(eager=True)
        frontier = reached
        for _ in range(max_inner):
            nxt = (
                colored.join(
                    frontier.select(F.col("id").alias("dst"), "color"),
                    ["dst", "color"],
                )
                .select(F.col("src").alias("id"), "color")
                .dropDuplicates(["id"])
                .join(reached.select("id"), "id", "left_anti")
                .localCheckpoint(eager=False)
            )
            if nxt.isEmpty():
                break
            reached = reached.unionByName(nxt).localCheckpoint(eager=False)
            frontier = nxt
        else:
            raise RuntimeError(
                f"scc: backward sweep not converged in {max_inner} rounds"
            )

        # ---- 4. peel the swept SCCs; their color is the SCC min id
        newly = reached.select("id", F.col("color").alias("scc"))
        assigned = _peel(assigned, newly).localCheckpoint(eager=True)
        remaining = remaining.join(newly, "id", "left_anti").localCheckpoint(eager=False)
        if remaining.isEmpty():
            break
        edges = (
            edges.join(newly.select(F.col("id").alias("src")), "src", "left_anti")
            .join(newly.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"scc: {max_outer} FW-BW passes did not exhaust the graph — "
            f"pathological SCC chain; raise max_outer"
        )

    if assigned is None:  # empty graph
        return spark.createDataFrame([], "id long, scc long")
    return assigned.select("id", "scc")


def scc_census(graph: Graph, scc_labels: DataFrame | None = None) -> DataFrame:
    """(scc, size) census of the strongly connected components — the
    bowtie-analysis summary (1 row per SCC). Validates like
    wcc.validate_wcc: sizes sum to V."""
    labels = scc_labels if scc_labels is not None else scc(graph)
    return labels.groupBy("scc").agg(F.count(F.lit(1)).alias("size"))


def _reachable(edges: DataFrame, seeds: DataFrame, frm: str, to: str) -> DataFrame:
    """(id) — every vertex reachable from ``seeds`` following edges in
    the ``frm`` → ``to`` direction (seeds included). Classic frontier
    sweep: per level one edges⋈frontier join, an anti-join against the
    visited set, and a count action (the level's convergence statistic);
    both sets are eagerly checkpointed — visited fans out (anti-join +
    union + final count) and its union lineage would otherwise deepen
    per level."""
    visited = seeds.select("id").distinct().localCheckpoint(eager=True)
    frontier = visited
    while True:
        nxt = (
            edges.join(frontier, edges[frm] == frontier["id"])
            .select(F.col(to).alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            return visited
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt


def bowtie_census(graph: Graph, scc_labels: DataFrame | None = None) -> DataFrame:
    """One row (n_core, n_in, n_out, n_other) — the Broder et al. (2000)
    bow-tie decomposition of a directed graph: CORE = the largest SCC
    (ties broken by min label, deterministic), OUT = reachable FROM the
    core (excluded), IN = reaching the core (excluded), OTHER = tendrils,
    tubes and disconnected pieces. THE structural census of a web-scale
    link graph; fwd ∩ bwd = core exactly (a vertex both reaching and
    reached by the core is in the core's SCC), so the four counts
    partition V.

    Plan shape: the SCC labeling (scc.py's FW-BW-Trim coloring), one
    (scc)-keyed size aggregate whose argmax is a 1-row TakeOrdered, a
    broadcast semi-join to materialize the core id set, and two frontier
    reachability sweeps (one per edge direction) — each level a single
    edges⋈frontier join with an anti-join dedup; counts combine as lazy
    1-row crossJoined aggregates."""
    labels = scc_labels if scc_labels is not None else scc(graph)
    sizes = labels.groupBy("scc").agg(F.count(F.lit(1)).alias("n"))
    top = sizes.orderBy(F.desc("n"), "scc").limit(1).select("scc")
    core = (
        labels.join(F.broadcast(top), "scc", "left_semi")
        .select("id")
        .localCheckpoint(eager=True)  # seeds both sweeps + the core count
    )
    edges = graph.edges.select("src", "dst")
    fwd = _reachable(edges, core, "src", "dst")  # core ∪ OUT
    bwd = _reachable(edges, core, "dst", "src")  # core ∪ IN
    c_core = core.agg(F.count("*").alias("n_core"))
    c_fwd = fwd.agg(F.count("*").alias("nf"))
    c_bwd = bwd.agg(F.count("*").alias("nb"))
    v = int(graph.num_vertices)
    return (
        c_core.crossJoin(c_fwd)
        .crossJoin(c_bwd)
        .select(
            F.col("n_core").cast("long").alias("n_core"),
            (F.col("nb") - F.col("n_core")).cast("long").alias("n_in"),
            (F.col("nf") - F.col("n_core")).cast("long").alias("n_out"),
            (F.lit(v) - (F.col("nf") + F.col("nb") - F.col("n_core")))
            .cast("long")
            .alias("n_other"),
        )
    )


def condensation(graph: Graph, scc_labels: DataFrame | None = None) -> DataFrame:
    """(csrc, cdst) — the DISTINCT edges of the condensation DAG (one
    node per SCC, an edge where any original edge crosses components,
    self-edges dropped). The condensation of ANY digraph is acyclic —
    the structure dataflow/dependency scheduling runs on.

    Physical: two label joins against the V-row SCC map + one distinct —
    the edge table streams once; at 10^12 edges the distinct's key space
    is #SCC², typically orders of magnitude smaller than E."""
    labels = scc_labels if scc_labels is not None else scc(graph)
    ls = labels.select(F.col("id").alias("src"), F.col("scc").alias("csrc"))
    ld = labels.select(F.col("id").alias("dst"), F.col("scc").alias("cdst"))
    return (
        graph.edges.join(ls, "src")
        .join(ld, "dst")
        .filter(F.col("csrc") != F.col("cdst"))
        .select("csrc", "cdst")
        .distinct()
    )


def dag_layers(
    graph: Graph,
    max_rounds: int = 64,
    scc_labels: DataFrame | None = None,
) -> DataFrame:
    """(scc, layer) — longest-path topological layer of every SCC in the
    condensation DAG: layer(c) = 0 for sources, else 1 + max layer over
    predecessors (the critical-path / scheduling-depth layering; a valid
    topological order sorted by layer). Semantics pinned as the
    fixpoint of L(c) = max(0, max_{p→c} L(p) + 1) from L ≡ 0 — mirrored
    by oracle_sql.dag_layers_sql's exhaustive DAG walk.

    Physical (per round): one cond-edges⋈state join aggregated
    map-side-combined to per-target max, a row-preserving greatest()
    left join, and the round's single changed-count action (which also
    materializes the lazy checkpoint). Rounds = DAG depth, NOT V —
    web-graph condensations are shallow. The condensation edge set is
    computed once and checkpointed; the original edge table is never
    touched again."""
    labels = scc_labels if scc_labels is not None else scc(graph)
    cond = condensation(graph, scc_labels=labels).localCheckpoint(eager=True)
    state = (
        labels.select("scc")
        .distinct()
        .select("scc", F.lit(0).cast("long").alias("layer"))
        .localCheckpoint(eager=True)
    )
    # max_rounds + 1: a depth-d DAG needs d raising rounds plus ONE
    # confirming zero-change round — without the +1 a run converging
    # exactly on the last allowed round would raise falsely (the
    # mis/matching for-else pitfall)
    for _round in range(max_rounds + 1):
        pushed = (
            cond.join(state, cond["csrc"] == state["scc"])
            .groupBy(F.col("cdst").alias("scc"))
            .agg((F.max("layer") + 1).alias("pl"))
        )
        nxt = state.join(pushed, "scc", "left").select(
            "scc",
            F.col("layer").alias("old"),
            F.greatest(F.col("layer"), F.coalesce("pl", F.col("layer"))).alias("layer"),
        )
        nxt = nxt.localCheckpoint(eager=False)
        changed = nxt.filter(F.col("layer") > F.col("old")).count()
        state = nxt.select("scc", "layer")
        if changed == 0:
            return state
    raise RuntimeError(
        f"dag_layers did not converge in {max_rounds} rounds — the "
        f"condensation DAG is deeper than {max_rounds}; raise max_rounds"
    )
