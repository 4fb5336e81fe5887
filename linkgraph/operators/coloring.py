"""Distributed graph coloring — deterministic speculative rounds.

Not in the reference binary set (README.md:6 lists BFS/PR/SSSP/SpMV/WCC);
the standard parallel symmetry-breaking kernel next to MIS (register
allocation of the graph world: scheduling, frequency assignment, parallel
sparse factorization). Classic Jones–Plassmann colors only the
priority-local-minima each round — on a dense link graph (mean degree d̄)
only ~V/d̄ vertices are ready per round, so JP needs O(d̄·log V) rounds
(measured: >56 rounds at the sf0.01 gate graph, d̄ ≈ 55). The speculative
scheme here (Gebremedhin & Manne 2000; Çatalyürek et al. 2012) instead
colors EVERY uncolored vertex tentatively each round and retries the
losers of any conflict, converging in O(log V) expected rounds
independent of density.

Round shape (all bulk Catalyst plans, no driver-side data):
  1. tentative(v) = mex over v's ALREADY-COLORED neighbors' colors — one
     edges⋈colored join, distinct, then a per-vertex window over the ≤ Δ+1
     distinct neighbor colors (first index where the sorted colors skip a
     value); no colored neighbor → 0.
  2. conflicts = alive edges whose endpoints drew the SAME tentative
     color; the loser is the (p, id)-GREATER endpoint, where p is a FIXED
     engine-neutral hash priority (md5-60 of ``color:<seed>:<id>``,
     docs.py:44). Winners = non-losers; they keep their tentative color.
  3. losers stay uncolored and retry; the alive-alive edge set is pruned
     by two semi-joins (kcore shape) so the conflict self-join shrinks
     with the frontier.
Every step is a deterministic function of the graph and the seed, so the
result — while NOT the sequential-greedy coloring — is bit-identical
across engines, runs, and partitionings, and the DuckDB twin
(oracle_sql.coloring_sql) unrolls the identical rounds. The global
(p, id)-minimum alive vertex can never lose, so the alive set shrinks
every round; ``max_iterations`` guards the adversarial case loudly.
Colors are ≤ Δ+1 (mex over neighbors); validity (no monochromatic edge)
and the bound are asserted in tests/test_coloring.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.docs import _md5_60
from linkgraph.graph import Graph


def _default_checkpointer(df: DataFrame, iteration: int) -> DataFrame:
    return df.localCheckpoint(eager=True)


def graph_coloring(
    graph: Graph,
    seed: int = 42,
    max_iterations: int = 100,
    checkpointer: Callable[[DataFrame, int], DataFrame] | None = None,
) -> DataFrame:
    """(id, color) over the FULL vertex set: a proper coloring of the
    UNDIRECTED SIMPLE view of ``graph`` by deterministic speculative
    rounds on md5-priority conflict resolution. Colors are dense small
    ints from 0; isolated vertices get 0. Proper (no edge joins two
    equal colors) and ≤ Δ+1 colors — asserted in tests/test_coloring.py."""
    lazy = checkpointer is None
    checkpoint = checkpointer or _default_checkpointer
    canon = graph.canonical_undirected_edges()
    sym = canon.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        canon.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    pri = _md5_60(f"concat('color:{int(seed)}:', CAST(id AS STRING))")
    alive = graph.vertices().select("id", pri.alias("p"))
    alive = alive.localCheckpoint(eager=False) if lazy else checkpoint(alive, 0)
    # alive-alive edges for conflict detection, pruned as vertices retire
    live_e = sym.localCheckpoint(eager=False) if lazy else checkpoint(sym, -1)
    n_alive = alive.count()
    colored: DataFrame | None = None

    w = Window.partitionBy("id").orderBy("ncolor")
    for it in range(1, max_iterations + 1):
        if n_alive == 0:
            break
        # 1. tentative color = mex of already-colored neighbor colors
        if colored is not None:
            ncol = (
                sym.join(alive.select(F.col("id").alias("src")), "src", "left_semi")
                .join(
                    colored.select(
                        F.col("id").alias("dst"), F.col("color").alias("ncolor")
                    ),
                    "dst",
                )
                .select(F.col("src").alias("id"), "ncolor")
                .distinct()
            )
            mex = (
                ncol.withColumn("rn", F.row_number().over(w) - 1)
                .groupBy("id")
                .agg(
                    F.min(
                        F.when(F.col("ncolor") != F.col("rn"), F.col("rn"))
                    ).alias("gap"),
                    F.count("*").alias("n"),
                )
                .select("id", F.coalesce("gap", "n").alias("c"))
            )
            tent = alive.join(mex, "id", "left").select(
                "id", "p", F.coalesce(F.col("c"), F.lit(0)).cast("int").alias("color")
            )
        else:
            tent = alive.select("id", "p", F.lit(0).cast("int").alias("color"))
        # tent fans out into the conflict self-join (both sides) AND the
        # winner/loser splits — materialize once (fan-out recompute pitfall)
        tent = tent.localCheckpoint(eager=True) if lazy else checkpoint(tent, it)
        # 2. losers: alive-alive edges with equal tentative colors; the
        #    (p, id)-greater endpoint retries next round
        ta = tent.select(
            F.col("id").alias("src"), F.col("p").alias("pa"), F.col("color").alias("ca")
        )
        tb = tent.select(
            F.col("id").alias("dst"), F.col("p").alias("pb"), F.col("color").alias("cb")
        )
        losers = (
            live_e.join(ta, "src")
            .join(tb, "dst")
            .filter(
                (F.col("ca") == F.col("cb"))
                & (
                    (F.col("pb") < F.col("pa"))
                    | ((F.col("pb") == F.col("pa")) & (F.col("dst") < F.col("src")))
                )
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        losers = (
            losers.localCheckpoint(eager=True) if lazy else checkpoint(losers, 1000 + it)
        )
        newly = tent.join(losers, "id", "left_anti").select("id", "color")
        colored = newly if colored is None else colored.unionByName(newly)
        # 3. shrink the frontier and its live edge set
        nxt = alive.join(losers, "id", "left_semi")
        nxt = nxt.localCheckpoint(eager=False) if lazy else checkpoint(nxt, 2000 + it)
        lid = losers.select(F.col("id"))
        live_e = live_e.join(lid, live_e["src"] == lid["id"], "left_semi").join(
            lid, live_e["dst"] == lid["id"], "left_semi"
        )
        live_e = (
            live_e.localCheckpoint(eager=False)
            if lazy
            else checkpoint(live_e, 3000 + it)
        )
        n_alive = nxt.count()
        alive = nxt
    else:
        if n_alive != 0:
            raise RuntimeError(
                f"graph_coloring: did not converge in {max_iterations} "
                f"rounds — raise max_iterations"
            )

    if colored is None:  # zero-vertex graph
        return graph.vertices().select("id", F.lit(0).alias("color")).limit(0)
    return (
        graph.vertices()
        .join(colored, "id", "left")
        .select("id", F.coalesce(F.col("color"), F.lit(0)).cast("int").alias("color"))
    )
