"""Scaling-efficiency evidence: the identical PageRank job at two
parallelism levels (N and 4N cores) on the same input.

The north rule's criterion — ≥0.8 throughput scaling efficiency from N to
4N executors — cannot use a real cluster in this sandbox, so we evidence
it the sanctioned way: same job, same input, two local parallelism levels.

Parallelism pair: **local[2] vs local[8]**. Why not 8 vs 32: this host
advertises 32 CPUs but measured effective parallelism is ~24 and
memory-touching throughput DEGRADES beyond ~8 threads (a cached 24M-row
scan ran 2.5x slower at 32 threads than at 8 — shared-tenancy
contention). 2→8 sits below the contention knee, so it measures the
ENGINE's scaling, not the neighbors'. Both raw 8-vs-32 and 2-vs-8 numbers
are recorded in BASELINE.md for transparency.

The input is generated INSIDE Spark, deterministically (xxhash64 of a
range — no data files): V = 2^22 vertices, E = 96M edges, hub-free hash
scatter. The job is 8 parity-mode PageRank iterations (unroll=1: one
checkpoint per iteration, individually timed) over the persisted
normalized adjacency — the engine's core join→agg→merge round. Fixed
shuffle.partitions=64 at both levels (identical physical plan; only
executor-thread count changes); AQE off (static, known-good plan — AQE's
per-stage re-planning is pure serial driver overhead in this loop);
shuffle on tmpfs (see linkgraph.session).

Usage:  python tools/scaling_bench.py                      # PageRank (default)
        python tools/scaling_bench.py --kernel labelprop   # labelprop rounds
        python tools/scaling_bench.py --child 8 [kernel]   # one measured run

``--kernel labelprop`` runs the same protocol over label propagation's
single-exchange round (join + repartition(dst) + two in-partition
aggregates) at a smaller input (V=2^21, E=24M, 8 rounds) — an LP round
moves the raw vote pairs, ~5× a PageRank round's exchange volume, so the
input is sized to keep the local[2] leg inside the tenancy-stable
window."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
V = 1 << 22
E = 96_000_000
ITERS = 16  # ADVICE r01: better-sample the min; also report a trimmed mean
SHUFFLE_PARTITIONS = 64
CORES_LOW = 2
CORES_HIGH = 8


LP_V = 1 << 21
LP_E = 24_000_000
LP_ITERS = 8


def child(cores: int, kernel: str = "pagerank") -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from linkgraph.graph import Graph
    from linkgraph.operators import label_propagation, pagerank
    from linkgraph.session import get_spark

    v, e = (LP_V, LP_E) if kernel == "labelprop" else (V, E)
    iters = LP_ITERS if kernel == "labelprop" else ITERS
    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.range(e, numPartitions=SHUFFLE_PARTITIONS).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(v)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(v)).alias("dst"),
    )
    g = Graph.from_edges(
        spark, edges, num_vertices=v, num_partitions=SHUFFLE_PARTITIONS,
        add_weight_if_missing=False,
    )
    if kernel == "labelprop":
        g.symmetrized().edges.count()  # materialize the doubled layout
    else:
        g.out_normalized_edges().count()  # materialize adjacency before timing

    # per-iteration timing via the checkpointer hook; unroll=1 pins ONE
    # checkpointer call per iteration (the default unroll=4 would batch 4
    # iterations per call and inflate every per-iteration stat 4x). MIN
    # iteration time is the noise-robust statistic on a shared-tenancy
    # host — interference only ever ADDS time.
    import statistics

    times: list[float] = []
    last = [time.monotonic()]

    def timing_checkpoint(df, it):
        out = df.localCheckpoint(eager=True)
        now = time.monotonic()
        times.append(now - last[0])
        last[0] = now
        return out

    if kernel == "labelprop":
        label_propagation(g, iterations=iters, checkpointer=timing_checkpoint).count()
    else:
        pagerank(g, iterations=iters, checkpointer=timing_checkpoint, unroll=1).count()
    iter_times = times[1:]  # times[0] is the init-state checkpoint
    assert len(iter_times) == iters, f"expected {iters} per-iteration samples, got {len(iter_times)}"
    best = min(iter_times)
    med = statistics.median(iter_times)
    # 25%-trimmed mean: robust middle-half statistic, shown alongside
    # min/median so the pass is visibly not an artifact of one lucky
    # iteration (ADVICE r01, scaling_bench.py:107)
    srt = sorted(iter_times)
    q = len(srt) // 4
    trimmed = statistics.mean(srt[q : len(srt) - q] or srt)
    print(
        json.dumps(
            {
                "cores": cores,
                "kernel": kernel,
                "edges": e,
                "vertices": v,
                "iterations": iters,
                "iter_sec": [round(t, 3) for t in iter_times],
                "min_iter_sec": round(best, 3),
                "median_iter_sec": round(med, 3),
                "trimmed_mean_iter_sec": round(trimmed, 3),
                "edges_per_sec_per_iter": round(e / best, 1),
                "edges_per_sec_per_iter_trimmed": round(e / trimmed, 1),
            }
        )
    )
    spark.stop()


def parent(kernel: str = "pagerank") -> None:
    results = {}
    for cores in (CORES_LOW, CORES_HIGH):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores), kernel],
            capture_output=True, text=True, timeout=3000,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    ratio = CORES_HIGH / CORES_LOW
    tlo = results[CORES_LOW]["edges_per_sec_per_iter"]
    thi = results[CORES_HIGH]["edges_per_sec_per_iter"]
    eff = (thi / tlo) / ratio
    tlo_t = results[CORES_LOW]["edges_per_sec_per_iter_trimmed"]
    thi_t = results[CORES_HIGH]["edges_per_sec_per_iter_trimmed"]
    eff_t = (thi_t / tlo_t) / ratio
    print(
        json.dumps(
            {
                "metric": f"{kernel} throughput scaling, local[{CORES_LOW}] vs local[{CORES_HIGH}]",
                f"throughput_{CORES_LOW}": tlo,
                f"throughput_{CORES_HIGH}": thi,
                "speedup": round(thi / tlo, 3),
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_trimmed_mean": round(eff_t, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
                "detail": results,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "pagerank")
    elif len(sys.argv) > 2 and sys.argv[1] == "--kernel":
        parent(sys.argv[2])
    else:
        parent()
