"""Neighborhood function + effective diameter — exact and HyperANF.

The neighborhood function N(h) = #{(u,v) : d(u,v) <= h} (self pairs
included, d=0) is the standard whole-graph distance summary for web-scale
link graphs; alpha-effective diameter is the interpolated h at which
N(h) reaches alpha * N(inf). Not a reference kernel, but the canonical
consumer of the reference's BFS machinery (bfs_simple.c) at "all sources
at once" scale — nobody runs V BFS traversals on a web graph, so the
production estimator is HyperANF (Boldi, Rosa & Vigna, WWW 2011): one
HyperLogLog sketch per vertex approximating its ball |B(v, h)|, advanced
by one edges-join-union per hop.

Spark shape (HyperANF): state is (id, sketch) with sketch a Datasketches
HLL binary of 2^lg_config_k registers — O(V * 2^lg_k) bytes total state,
independent of E and of h. One round = ONE edges join state shuffle +
groupBy(id) hll_union_agg (map-side partial union: HLL union is
commutative-idempotent, so the combine runs JVM-side before the
exchange), then a 1-row sum(hll_sketch_estimate) action that doubles as
the round's materializing action (lazy-checkpoint pattern, bfs.py).
Rounds = effective diameter = O(log V) on web graphs. All JVM built-ins
(pyspark.sql.functions.hll_*) — no Python in the loop.

The exact variant rides multi_source_bfs (harmonic.py) from ALL vertices
— O(V^2) pair state, gate/test scale only — and is the DuckDB-matched
oracle surface; HyperANF is the 100 TB path, tested against the exact
curve at a relative-error tolerance set by its register count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.harmonic import multi_source_bfs


def neighborhood_function_exact(graph: Graph, max_h: int = 8) -> DataFrame:
    """(h, nf) for h in [0, max_h]: nf = exact #{(s,v): d(s,v) <= h},
    via MS-BFS from every vertex. Pair state is O(V * avg-ball), so this
    is the small-graph oracle twin of :func:`neighborhood_function`."""
    n = graph.num_vertices
    # only dist <= max_h is consumed below — capping the MS-BFS depth at
    # max_h (not 64) stops the O(V·reachable) pair state from expanding
    # past the consumed horizon on high-eccentricity graphs (ADVICE r04);
    # matches the oracle's dist < max_h walk cap
    dists = multi_source_bfs(graph, range(n), max_iterations=max_h)
    per_d = dists.groupBy("dist").agg(F.count(F.lit(1)).alias("c"))
    hs = graph.spark.range(max_h + 1).select(F.col("id").alias("h"))
    return (
        hs.join(per_d, per_d["dist"] <= hs["h"], "left")
        .groupBy("h")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("nf"))
    )


def neighborhood_function(
    graph: Graph,
    max_h: int = 64,
    lg_config_k: int = 12,
    rel_tol: float = 1e-4,
) -> list[tuple[int, float]]:
    """HyperANF: [(h, N_est(h))] until the curve saturates (relative
    growth < ``rel_tol``) or ``max_h``. The returned curve is monotone
    by construction (each ball only grows and HLL union is exact on
    sketches). ``lg_config_k``: 2^k registers/vertex; relative standard
    error ~= 1.04 / sqrt(2^k) (k=12 -> ~1.6%).

    Systolic propagation (the HyperANF paper's own optimization, §4):
    round h joins only the sketches that CHANGED in round h-1. If
    sketch(w) was already folded into sketch(v) last round and did not
    change since, re-unioning it is a register-wise no-op, so dropping
    unchanged sources leaves every register — and therefore the curve —
    bit-identical while the joined frontier shrinks geometrically once
    balls saturate (the wcc.py worklist pattern). Change detection is a
    byte compare of the serialized sketch (equal bytes ⇔ equal
    registers); a small frontier is broadcast so late rounds never
    shuffle the edge table at all.

    On low-diameter expanders the frontier stays full until global
    saturation (measured on the 50M-edge Zipf bench graph: every sketch
    changes every round, then all stop at once), so the gain there is
    the saturated tail rounds only. Two further variants were A/B'd at
    50M edges and REJECTED (r06): a dst-keyed sorted localCheckpoint of
    the edge table (to spare the per-round edge exchange + sort) and a
    shuffle_hash build of the sketch side — both measured slower
    (min-of-2: 94.7 s / 107.1 s vs 63.5 s for this form; the one-time
    50M-row checkpoint write plus its resident memory cost more than
    the per-round int sort it saved)."""
    edges = graph.edges.select("src", "dst")
    state = (
        graph.vertices()
        .groupBy("id")
        .agg(F.hll_sketch_agg("id", lg_config_k).alias("sk"))
        .localCheckpoint(eager=True)
    )
    curve: list[tuple[int, float]] = [
        (0, float(graph.num_vertices))  # B(v,0) = {v}: N(0) = V exactly
    ]
    changed = state  # round 0 created every sketch: all changed
    n_changed = graph.num_vertices
    # compact sketch ≈ 2^lg_k bytes (+ header); broadcast the frontier
    # while its total stays well inside executor comfort (~48 MB)
    bcast_rows = max(1, (48 << 20) // ((1 << lg_config_k) + 64))
    for h in range(1, max_h + 1):
        fr = F.broadcast(changed) if n_changed <= bcast_rows else changed
        contrib = edges.join(fr, edges["dst"] == fr["id"]).select(
            edges["src"].alias("id"), "sk"
        )
        # per-destination partial union of the frontier's contributions
        # (map-side combined), then one left join folds it into state
        delta = contrib.groupBy("id").agg(F.hll_union_agg("sk").alias("dsk"))
        merged = (
            state.withColumnRenamed("sk", "old_sk")
            .join(delta, "id", "left")
            .select(
                "id",
                F.when(F.col("dsk").isNull(), F.col("old_sk"))
                .otherwise(F.hll_union("old_sk", "dsk"))
                .alias("sk"),
                "old_sk",
            )
            .select("id", "sk", (F.col("sk") != F.col("old_sk")).alias("chg"))
            .localCheckpoint(eager=False)
        )
        row = merged.agg(
            F.sum(F.hll_sketch_estimate("sk")).alias("nf"),
            F.sum(F.col("chg").cast("long")).alias("nc"),
        ).collect()[0]  # the round's single materializing action
        nf = float(row["nf"])
        n_changed = int(row["nc"] or 0)
        state = merged.select("id", "sk")
        changed = merged.filter("chg").select("id", "sk")
        prev = curve[-1][1]
        curve.append((h, nf))
        if nf <= prev * (1.0 + rel_tol) or n_changed == 0:
            break
    return curve


def effective_diameter(
    graph: Graph,
    alpha: float = 0.9,
    max_h: int = 64,
    lg_config_k: int = 12,
) -> tuple[float, list[tuple[int, float]]]:
    """(alpha-effective diameter, HyperANF curve): smallest interpolated
    h with N(h) >= alpha * N(h_max), linear between integer hops (the
    HyperANF paper's definition)."""
    curve = neighborhood_function(graph, max_h=max_h, lg_config_k=lg_config_k)
    target = alpha * curve[-1][1]
    for (h0, n0), (h1, n1) in zip(curve, curve[1:]):
        if n1 >= target:
            frac = 0.0 if n1 == n0 else (target - n0) / (n1 - n0)
            return (h0 + max(0.0, frac), curve)
    return (float(curve[-1][0]), curve)


def mean_distance(graph: Graph, max_h: int = 8) -> DataFrame:
    """One row (n_pairs, mean_dist): exact mean shortest-path distance
    over ordered reachable pairs with 0 < d(s, v) ≤ ``max_h`` — the
    average-path-length summary next to the effective diameter, computed
    from the same all-sources MS-BFS the exact neighborhood function
    rides (pair state O(V · avg-ball): the small-graph exact path; at
    100 TB estimate from :func:`neighborhood_function`'s HLL curve
    instead). Single division, rounded to 6 dp, so engine and oracle
    agree bit-for-bit."""
    n = graph.num_vertices
    # depth capped at max_h: deeper pairs are filtered out anyway (see
    # neighborhood_function_exact)
    dists = multi_source_bfs(graph, range(n), max_iterations=max_h)
    return (
        dists.filter((F.col("dist") > 0) & (F.col("dist") <= max_h))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("dist") / F.count(F.lit(1)), 6).alias("mean_dist"),
        )
    )


def eccentricity(graph: Graph, max_h: int = 8) -> DataFrame:
    """(id, ecc) — per-vertex OUT-eccentricity within the ``max_h``
    horizon: ecc(v) = max over reachable u of d(v, u), capped (the
    horizon makes the all-sources sweep affordable and matches every
    other MS-BFS consumer here; the exact diameter's per-vertex
    refinement — diameter_lower_bound gives the global bound in two
    sweeps, this gives the full profile). A vertex reaching nothing has
    ecc 0 (its self pair, d = 0). Rides the same all-sources MS-BFS as
    neighborhood_function_exact / mean_distance — pair state
    O(V · avg-ball), the gate/estimation path; at 100 TB take per-vertex
    ball radii from HyperANF sketches instead."""
    n = graph.num_vertices
    dists = multi_source_bfs(graph, range(n), max_iterations=max_h)
    return (
        dists.groupBy(F.col("source").alias("id"))
        .agg(F.max("dist").alias("ecc"))
    )
