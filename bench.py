"""Benchmark harness: headline kernels at two scales.

1. GATE graph (sf-derived, V=2048): correctness-scale numbers, including
   the authoritative metric — edges/sec per PageRank iteration at 1e-6
   convergence (``pr_edges_per_sec_per_iter``).
2. BIG graph (V=2^20, E=50M, Zipf-skewed in-degree hubs, generated
   deterministically in-Spark — VERDICT r01 top-next: measure plans, not
   scheduler latency): every kernel timed with per-kernel edges/sec, so
   the skew/memory claims in SCALING.md are demonstrated, not argued.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"pagerank_conv": sec, ..., "big_pagerank10": sec, ...},
     "sf": "...", "big": {...per-kernel edges/sec...}, ...}

Scaling-efficiency evidence (same job at two parallelism levels) is
produced by tools/scaling_bench.py and recorded in BASELINE.md.
Set SPARK_GRAFT_SKIP_BIG=1 to run only the gate section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.derive import link_graph  # noqa: E402
from linkgraph.graph import Graph  # noqa: E402
from linkgraph.operators import (  # noqa: E402
    bfs,
    label_propagation,
    pagerank,
    spmv,
    sssp,
    triangle_count,
    wcc,
)
from linkgraph.session import get_spark  # noqa: E402

BIG_V = 1 << 20
BIG_E = 50_000_000


def big_graph(spark, num_partitions: int) -> Graph:
    """Deterministic synthetic graph with Zipf-ish in-degree hubs:
    src uniform via xxhash64; dst = floor(V·u³) for uniform u, i.e.
    P(dst < x) = (x/V)^(1/3) — vertex 0 receives ~1% of ALL edges
    (≈500k in-edges), the hub profile the grid layouts in the reference
    exist for. No data files: generated from spark.range."""
    u = (
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1 << 30)).cast("double")
        / float(1 << 30)
    )
    edges = spark.range(BIG_E, numPartitions=num_partitions).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(BIG_V)).alias("src"),
        F.floor(F.lit(float(BIG_V)) * F.pow(u, F.lit(3.0))).cast("long").alias("dst"),
    )
    return Graph.from_edges(
        spark, edges, num_vertices=BIG_V, num_partitions=num_partitions
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    skip_big = os.environ.get("SPARK_GRAFT_SKIP_BIG", "") == "1"
    spark = get_spark(
        app_name="linkgraph-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    g = link_graph(spark, sf_dir)
    n_edges = g.edges.count()  # forces build + persist
    g.out_normalized_edges().count()  # pre-build the PR adjacency
    build_sec = time.monotonic() - t0

    # the kernel loops have static, known-good plans; AQE's per-stage
    # re-planning is pure driver latency there (measured ~12% of PR wall)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t, 3)
        return out

    # ---------------- gate graph: headline PR-to-convergence + kernels
    iters_box = {"n": 0}

    def counting_checkpoint(df, it):
        iters_box["n"] = max(iters_box["n"], it)
        return df.localCheckpoint(eager=True)

    ranks = timed(
        "pagerank_conv",
        lambda: pagerank(g, tol=1e-6, max_iterations=200, checkpointer=counting_checkpoint),
    )
    ranks.count()
    pr_iters = iters_box["n"]
    extras["pr_iterations"] = pr_iters
    extras["pr_edges_per_sec_per_iter"] = round(
        n_edges * pr_iters / timings["pagerank_conv"], 1
    )

    timed("pagerank10", lambda: pagerank(g, iterations=10).count())
    timed("wcc", lambda: wcc(g).count())
    timed("labelprop5", lambda: label_propagation(g, iterations=5).count())
    timed("triangles", lambda: triangle_count(g).collect()[0]["triangles"])
    timed("bfs", lambda: bfs(g, root=0).count())
    timed("sssp", lambda: sssp(g, root=0).count())
    timed("spmv", lambda: spmv(g).count())

    # ---------------- big graph: every kernel at plan-dominant scale
    big_stats: dict[str, float] = {}
    if not skip_big:
        tb = time.monotonic()
        bg = big_graph(spark, num_partitions=max(cpus, 16))
        bg.num_edges()  # build + persist
        bg.out_normalized_edges().count()
        bg.degrees().count()
        big_stats["build_sec"] = round(time.monotonic() - tb, 3)

        def timed_big(name, fn, rounds: int = 1):
            t = time.monotonic()
            fn()
            wall = time.monotonic() - t
            timings[f"big_{name}"] = round(wall, 3)
            big_stats[f"{name}_edges_per_sec"] = round(BIG_E * rounds / wall, 1)

        timed_big("pagerank10", lambda: pagerank(bg, iterations=10).count(), rounds=10)
        timed_big("spmv", lambda: spmv(bg).count())
        timed_big("wcc", lambda: wcc(bg).count())
        timed_big("labelprop5", lambda: label_propagation(bg, iterations=5).count(), rounds=5)
        timed_big("bfs", lambda: bfs(bg, root=0).count())
        timed_big("sssp", lambda: sssp(bg, root=0).count())
        timed_big(
            "triangles",
            lambda: triangle_count(bg).collect()[0]["triangles"],
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total kernel wall time (gate graph + 50M-edge Zipf graph)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "n_edges": n_edges,
                "n_vertices": g.num_vertices,
                "build_sec": round(build_sec, 3),
                "cpus": cpus,
                "big": {"vertices": BIG_V, "edges": BIG_E, **big_stats},
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
