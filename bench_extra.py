"""Targeted per-cell benchmarks for optimization work (guide §1.4).

bench.py is FROZEN for measurement; this sidecar reproduces its exact
data shapes (gate graph, 50M-edge Zipf graph, 200k-doc corpus, 1M×256
embeddings) and timing methodology (min-of-N back-to-back) but runs only
the cells named on the command line, so an optimization can be A/B'd in
minutes instead of a 45-minute full run. Numbers quoted in
OPTIMIZATION_r06.md cite this file.

Usage:
    python bench_extra.py docs despan despan_xx decontaminate ...
    python bench_extra.py gate adamic_adar pagerank_conv ...
    python bench_extra.py big hyperanf_ed labelprop5 ...
    python bench_extra.py ann loop_ann loop_ivf build_ann ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import big_docs, big_embeddings, big_graph  # noqa: E402
from linkgraph.derive import link_graph  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402


def main() -> None:
    section = sys.argv[1]
    cells = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    spark = get_spark(
        app_name=f"linkgraph-bench-extra-{section}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    timings: dict[str, list[float]] = {}

    def timed(name, fn, n=repeats, stop_over=240.0):
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(n):
            t = time.monotonic()
            fn()
            s = round(time.monotonic() - t, 3)
            samples.append(s)
            if s > stop_over:
                break
        timings[name] = samples
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)
        spark.sparkContext.setJobDescription(None)

    if section == "gate":
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        g = link_graph(spark, sf_dir)
        g.edges.count()
        g.out_normalized_edges().count()
        g.degrees().count()
        g.edges_with_dst_out_deg().count()
        from linkgraph.operators import (
            adamic_adar,
            neighborhood_function,
            pagerank,
        )
        from linkgraph.operators.triangles import rectangle_count

        reg = {
            "adamic_adar": lambda: adamic_adar(
                g, top_k=50, max_center_degree=None
            ).collect(),
            "pagerank_conv": lambda: pagerank(
                g, tol=1e-6, max_iterations=200
            ).count(),
            "hyperanf": lambda: neighborhood_function(g, max_h=16)[-1],
            "rectangles": lambda: rect_call(g),
        }

        def rect_call(g):
            return rectangle_count(g).collect()

        for c in cells:
            timed(c, reg[c])

    elif section == "big":
        bg = big_graph(spark, num_partitions=max(cpus, 16))
        bg.num_edges()
        bg.out_normalized_edges().count()
        bg.degrees().count()
        bg.edges_with_dst_out_deg().count()
        from linkgraph.operators import (
            effective_diameter,
            hits,
            label_propagation,
            pagerank,
            sssp,
            triangle_count,
            wcc,
        )
        from linkgraph.operators.wcc import wcc_large_small_star

        def _ed():
            d, curve = effective_diameter(bg, alpha=0.9, max_h=32, lg_config_k=8)
            print(f"  ed={d:.2f} rounds={len(curve) - 1}", flush=True)

        reg = {
            "hyperanf_ed": _ed,
            "pagerank10": lambda: pagerank(bg, iterations=10).count(),
            "wcc": lambda: wcc(bg).count(),
            "wcc_lss": lambda: wcc_large_small_star(bg).count(),
            "labelprop5": lambda: label_propagation(bg, iterations=5).count(),
            "sssp": lambda: sssp(bg, root=0).count(),
            "triangles": lambda: triangle_count(bg).collect(),
            "hits5": lambda: hits(bg, iterations=5)
            .agg(F.sum("auth"), F.sum("hub"))
            .collect(),
        }
        for c in cells:
            timed(c, reg[c], n=min(repeats, 2))

    elif section == "docs":
        from linkgraph import docs as docmod

        corpus = big_docs(spark, num_partitions=max(cpus, 16)).persist()
        corpus.count()
        reg = {
            "token_stats": lambda: docmod.token_stats(corpus)
            .agg(F.sum("n_bpe_tokens"))
            .collect(),
            "tfidf": lambda: docmod.tf_idf_top_terms(corpus, top_k=5)
            .agg(F.sum("tfidf"))
            .collect(),
            "lm_score": lambda: docmod.lm_cross_entropy(corpus)
            .agg(F.sum("cross_entropy"))
            .collect(),
            "repetition_stats": lambda: docmod.repetition_stats(corpus, n=2)
            .agg(F.sum("dup_ngram_frac"))
            .collect(),
            "decontaminate": lambda: docmod.decontaminate(
                corpus, corpus.filter(F.col("doc_id") % 50 == 0), k=13
            )
            .agg(F.sum(F.col("contaminated").cast("long")))
            .collect(),
            "minhash_pairs": lambda: docmod.minhash_candidate_pairs(
                corpus, max_bucket_size=1000
            ).count(),
            "dedup_clusters": lambda: docmod.dedup_clusters(
                corpus, max_bucket_size=1000
            ).count(),
            "fingerprints": lambda: docmod.fingerprints(
                corpus.filter(F.col("doc_id") % 4 == 0)
            ).count(),
            "despan": lambda: docmod.remove_repeated_spans(
                corpus.filter(F.col("doc_id") % 4 == 0), min_len=50
            )
            .agg(F.sum("n_removed"))
            .collect(),
            "despan_xx": lambda: docmod.remove_repeated_spans(
                corpus.filter(F.col("doc_id") % 4 == 0),
                min_len=50,
                hasher="xxhash64",
            )
            .agg(F.sum("n_removed"))
            .collect(),
            "quality_clf": lambda: docmod.quality_classifier(
                corpus, "doc_id % 5 = 0", steps=3, buckets=512
            )
            .agg(F.sum("score"))
            .collect(),
            "pmi": lambda: docmod.pmi_collocations(corpus, min_count=5, top_k=30)
            .agg(F.sum("pmi"))
            .collect(),
        }
        for c in cells:
            timed(c, reg[c])
        corpus.unpersist()

    elif section == "ann":
        import shutil
        import tempfile

        import numpy as np

        from linkgraph.similarity import (
            ann_index_topk,
            ivf_index_topk,
            semantic_dedup,
            write_ann_index,
            write_ivf_index,
        )

        BIG_VECS, VEC_DIM = 1_000_000, 256
        emb = big_embeddings(spark, num_partitions=max(cpus, 16)).persist()
        emb.count()
        scratch = tempfile.mkdtemp(prefix="linkgraph_ann_extra_")
        try:
            ANN_BITS, ANN_BANDS = 8, 8
            IVF_C, IVF_NPROBE = 64, 8
            ann_path, ivf_path = f"{scratch}/ann", f"{scratch}/ivf"
            if {"loop_ann", "build_ann"} & set(cells):
                timed(
                    "build_ann",
                    lambda: write_ann_index(
                        emb, ann_path, num_bits=ANN_BITS, dim=VEC_DIM,
                        num_bands=ANN_BANDS,
                    ),
                    n=1 if "build_ann" not in cells else min(repeats, 2),
                )
            cents = None
            if {"loop_ivf", "build_ivf"} & set(cells):
                t = time.monotonic()
                cents = write_ivf_index(emb, ivf_path, num_centroids=IVF_C)
                print(f"build_ivf: {round(time.monotonic() - t, 3)}", flush=True)
            stride = BIG_VECS // 50
            qdf = emb.filter(F.col("vec_id") % stride == 0).collect()
            queries = {
                int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
                for r in qdf
            }
            if "loop_ann" in cells:
                ann_df = spark.read.parquet(ann_path)

                def loop_ann():
                    for qid, qv in queries.items():
                        ann_index_topk(
                            spark, ann_path, qv, k=10, num_bits=ANN_BITS,
                            num_bands=ANN_BANDS, exclude_vec_id=qid,
                            index_df=ann_df, score="matmul",
                        ).collect()

                timed("loop_ann", loop_ann, n=min(repeats, 2))
            if "loop_ivf" in cells:
                ivf_df = spark.read.parquet(ivf_path)

                def loop_ivf():
                    for qid, qv in queries.items():
                        ivf_index_topk(
                            spark, ivf_path, cents, qv, k=10,
                            nprobe=IVF_NPROBE, exclude_vec_id=qid,
                            index_df=ivf_df, score="matmul",
                        ).collect()

                timed("loop_ivf", loop_ivf, n=min(repeats, 2))
            if "semdedup" in cells:
                timed(
                    "semdedup",
                    lambda: semantic_dedup(
                        emb, num_centroids=1024, min_sim=0.95, method="matmul",
                        pair_method="matmul", max_cell_size=100_000,
                    )
                    .filter(F.col("keep"))
                    .count(),
                    n=min(repeats, 2),
                )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        emb.unpersist()
    else:
        raise SystemExit(f"unknown section {section!r}")

    print(json.dumps({k: min(v) for k, v in timings.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
