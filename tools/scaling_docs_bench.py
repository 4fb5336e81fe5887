"""Scaling-efficiency evidence for the DOCS pipeline: the identical
dedup_clusters / lm_score job at two parallelism levels (N and 4N cores)
on the same in-Spark-generated corpus — the N-vs-4N protocol of
tools/scaling_bench.py applied to the most expensive non-graph surface
(VERDICT r04 'Next round' #6).

Same parallelism pair as the graph bench (local[2] vs local[8] — below
this host's shared-tenancy contention knee, rationale in
scaling_bench.py), same fixed shuffle.partitions at both levels
(identical physical plan; only executor-thread count changes). The
corpus is bench.big_docs at a size where compute dominates the fixed
per-job driver latency; the operator runs ``REPEATS`` back-to-back times
per level and the MIN wall is the number of record (tenancy only ever
adds time).

Usage:  python tools/scaling_docs_bench.py
            [dedup_clusters|lm_score|semantic_dedup|quality_clf|bpe]
        python tools/scaling_docs_bench.py --child 8 dedup_clusters
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# corpus size: bigger corpora shrink the pipeline's fixed per-job driver
# latency relative to wall, so efficiency rises with size (the knee
# analysis in BASELINE.md) — override to measure the trend
N_DOCS = int(os.environ.get("SCALING_DOCS_N", "100000"))
SHUFFLE_PARTITIONS = 64
CORES_LOW = 2
CORES_HIGH = 8
REPEATS = 3


def child(cores: int, op: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    import bench
    from linkgraph import docs as docmod
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name=f"scaling-docs-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if op == "semantic_dedup":
        # the ANN/embedding surface (round 5): same protocol on the
        # SemDeDup pipeline — matmul IVF assignment + per-cell BLAS gram
        # pairs + components + keep-list; compute is Arrow-batched numpy
        # inside executor threads, so thread-count scaling is exactly
        # what this measures. Vector count sized so compute dominates
        # the fixed per-job driver latency at 2 cores without making the
        # 3-repeat low-cores leg take tens of minutes.
        bench.BIG_VECS = int(os.environ.get("SCALING_VECS_N", "200000"))
        corpus = bench.big_embeddings(
            spark, num_partitions=SHUFFLE_PARTITIONS
        ).persist()
        n_items = corpus.count()
    else:
        bench.BIG_DOCS = N_DOCS
        corpus = bench.big_docs(spark, num_partitions=SHUFFLE_PARTITIONS).persist()
        n_items = corpus.count()  # materialize before timing

    def run_once() -> None:
        if op == "dedup_clusters":
            docmod.dedup_clusters(corpus, max_bucket_size=1000).count()
        elif op == "lm_score":
            docmod.lm_cross_entropy(corpus).agg(F.sum("cross_entropy")).collect()
        elif op == "quality_clf":
            # round 5: 3 full-batch GD steps = 7 corpus-pass join-aggs
            docmod.quality_classifier(
                corpus, "doc_id % 5 = 0", steps=3, buckets=512
            ).agg(F.sum("score")).collect()
        elif op == "bpe":
            # round 5: tokenizer training — one corpus pass to the word
            # dict, then 8 vocab-sized argmax+fold rounds
            docmod.bpe_train(corpus, merges=8).agg(F.sum("cnt")).collect()
        elif op == "semantic_dedup":
            from linkgraph import similarity

            similarity.semantic_dedup(
                corpus,
                num_centroids=256,
                min_sim=0.95,
                method="matmul",
                pair_method="matmul",
                max_cell_size=100_000,
            ).filter(F.col("keep")).count()
        else:
            raise ValueError(f"unknown op {op!r}")

    def drop_run_leftovers() -> None:
        """Free the run's lazy localCheckpoint blocks (feature tables,
        per-step states) between repeats, then re-pin the corpus. Without
        this the repeats are not independent: each leaves its checkpoints
        resident with no unpersist hook, storage squeezes execution
        memory, and samples CLIMB run-over-run (measured 38.7 → 57.0 →
        79.9 s for quality_clf at 200k docs / 8 cores; the bench.py
        inter-section sweep, applied per-repeat)."""
        spark.catalog.clearCache()
        for _id, jrdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            jrdd.unpersist()
        corpus.persist()
        corpus.count()

    samples = []
    for _ in range(REPEATS):
        t = time.monotonic()
        run_once()
        samples.append(round(time.monotonic() - t, 3))
        drop_run_leftovers()
    best = min(samples)
    print(
        json.dumps(
            {
                "cores": cores,
                "op": op,
                "n_items": n_items,
                "samples_sec": samples,
                "min_sec": best,
                "docs_per_sec": round(n_items / best, 1),
            }
        )
    )
    spark.stop()


def parent(op: str) -> None:
    results = {}
    for cores in (CORES_LOW, CORES_HIGH):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores), op],
            capture_output=True, text=True, timeout=5400,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"child {cores} produced no JSON")
        results[cores] = json.loads(lines[-1])
    ratio = CORES_HIGH / CORES_LOW
    tlo = results[CORES_LOW]["docs_per_sec"]
    thi = results[CORES_HIGH]["docs_per_sec"]
    eff = (thi / tlo) / ratio
    print(
        json.dumps(
            {
                "metric": f"{op} throughput scaling, local[{CORES_LOW}] vs local[{CORES_HIGH}]",
                f"throughput_{CORES_LOW}": tlo,
                f"throughput_{CORES_HIGH}": thi,
                "speedup": round(thi / tlo, 3),
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
                "detail": results,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "dedup_clusters")
    else:
        parent(sys.argv[1] if len(sys.argv) > 1 else "dedup_clusters")
