"""Physical-plan audits — the scale claims, asserted against Catalyst.

These pin the plan PROPERTIES the 100 TB story depends on, so a refactor
that silently degrades a plan (an accidental cartesian product, a lost
column pruning, a dropped broadcast) fails CI rather than a cluster run.
String-matching executed plans is Spark-version-sensitive by nature; this
repo pins pyspark 4.x and the matched tokens are stable operator names.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from linkgraph import docs

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_unbounded_cartesian_in_any_gate_query(spark):
    """No gate query may contain a CartesianProduct. BroadcastNestedLoopJoin
    is allowed ONLY because every crossJoin in the engine broadcasts a
    provably tiny side (a 1-row query vector or a C-row centroid table);
    a plain CartesianProduct means both sides were big — the unbounded
    shuffle this test exists to catch."""
    for name, fn in entry.queries().items():
        plan = _plan(fn(spark, SF))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_docs_scan_prunes_columns(spark):
    """token_stats touches only (doc_id, text): the parquet ReadSchema must
    not include lang/source/n_chars — column pruning reaching the scan is
    what makes a 100 TB text table affordable to fingerprint."""
    df = docs.token_stats(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = _plan(df)
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, plan
    schema = scan_lines[0].split("ReadSchema:")[1]
    assert "doc_id" in schema and "text" in schema
    assert "source" not in schema and "n_chars" not in schema


def test_exact_dedup_filter_pushdown(spark):
    """A filtered dedup (common: dedup one source at a time) must push the
    source predicate into the parquet scan (PushedFilters), not read
    everything and filter later."""
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("source") == "s0")
    plan = _plan(docs.exact_dedup(d))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    assert any("source" in l for l in pushed), pushed


def test_pagerank_loop_reuses_persisted_adjacency(spark):
    """The PageRank iteration must read the normalized adjacency from the
    persisted in-memory relation (InMemoryTableScan), not re-derive it
    from the raw edge table each iteration — re-deriving would re-shuffle
    E rows per iteration, the exact cost the persisted layout removes."""
    from linkgraph.derive import link_graph
    from linkgraph.operators import pagerank

    g = link_graph(spark, SF)
    g.out_normalized_edges().count()  # materialize the persisted adjacency
    # the returned df is just a scan of the last checkpoint — capture the
    # PRE-checkpoint plan of a loop iteration via the checkpointer hook
    captured = {}

    def cap(df, it):
        captured[it] = _plan(df)
        return df.localCheckpoint(eager=True)

    pagerank(g, iterations=2, checkpointer=cap)
    it_plan = captured[max(captured)]
    assert "InMemoryTableScan" in it_plan or "InMemoryRelation" in it_plan, it_plan
    # and the iteration reads the previous state from its checkpoint, not
    # by recomputing the full lineage
    assert "ExistingRDD" in it_plan, it_plan


def test_docs_expressions_stay_jvm_side(spark):
    """The docs quality expressions are pure JVM built-ins: the plan must
    contain whole-stage-codegen spans ('*(n)' markers in toString) and NO
    Python evaluation nodes (a Python/UDF hole here would put per-row
    Python on the 100 TB hot path). The higher-order-function Project
    (aggregate/transform lambdas) legitimately sits outside codegen —
    still JVM-interpreted expressions, not Python."""
    df = docs.token_stats(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = _plan(df)
    assert "*(1)" in plan, plan  # codegen reaches the scan+project pipeline
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_ivf_seed_no_global_sort(spark):
    """ivf_centroids' orderBy(md5).limit(C) seed must compile to
    TakeOrderedAndProject (per-partition top-C + driver merge), never a
    global Sort+Exchange — at 10^9 vectors a full sort to pick 16 seed
    rows would be the plan's dominant shuffle (VERDICT r02 wrong #3)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    seed_plan = _plan(
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(16)
    )
    assert "TakeOrderedAndProject" in seed_plan, seed_plan
    assert "Sort " not in seed_plan, seed_plan


def test_pmi_and_dsir_topk_no_global_sort(spark):
    """pmi_collocations' and dsir_resample's global top-k must compile to
    TakeOrderedAndProject (per-partition heap + k-row driver merge), never
    a global Sort+Exchange — the corpus-wide sort would dominate at
    100 TB; a heap over (rounded) keys is free."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (
        docs.pmi_collocations(d, min_count=2, top_k=10),
        docs.dsir_resample(d, "lang = 'en'", keep=10, buckets=64),
    ):
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan, plan
        # the global-sort signature is a range-partitioning exchange;
        # dsir legitimately contains LOCAL sorts inside its doc_id-keyed
        # SortMergeJoin (corpus ⋈ per-doc scores), so "no Sort" is wrong
        assert "rangepartitioning" not in plan, plan


def test_quality_clf_broadcasts_weight_state(spark):
    """The classifier's margin join (features ⋈ weights) must broadcast
    the B-row weight side — shuffling the corpus-sized feature table on
    the bucket key every GD step would be the dominant cost at scale."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(docs.quality_classifier(d, "lang = 'en'", steps=1, buckets=64))
    assert "BroadcastHashJoin" in plan, plan


def test_retention_cohort_sizes_broadcast(spark):
    """retention's cohort-size self-join must broadcast the cohort-keyed
    side (one row per cohort bucket — bounded by the calendar, not the
    user count)."""
    from linkgraph import events

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(events.retention(ev, period="week"))
    assert "BroadcastHashJoin" in plan, plan


def test_transitions_broadcasts_row_totals(spark):
    """The T×T row-normalization join must broadcast the totals side —
    shuffling the pair table against a T-row aggregate would be a wasted
    exchange at 10^12 events."""
    from linkgraph.events import transitions

    plan = _plan(transitions(spark.read.parquet(f"{SF}/events.parquet")))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def test_featprop_avg_is_partially_aggregated(spark):
    """The per-(dst, dim) neighbor mean must be a partial (map-side
    combined) hash aggregate — the E·D message rows combine before the
    exchange, which is the whole point of keying the state by (id, dim)."""
    from linkgraph.derive import link_graph
    from linkgraph.operators import feature_propagation

    g = link_graph(spark, SF)
    feats = (
        g.vertices()
        .join(
            spark.read.parquet(f"{SF}/embeddings.parquet"),
            F.col("id") % 500 == F.col("vec_id"),
        )
        .select("id", F.col("embedding").alias("vec"))
    )
    # pass-through checkpointer: the default localCheckpoint truncates the
    # final plan to an RDD scan, hiding the hop's aggregate from the audit
    out = feature_propagation(
        g, feats, hops=1, dims=4, checkpointer=lambda df, it: df
    )
    plan = _plan(out)
    assert "partial_avg" in plan, plan


def test_ppr_sweep_edge_scan_broadcasts_position_map(spark):
    """The sweep's crossing histograms must come from broadcast joins of
    the tiny top-k position map against the edge scan — a shuffle join
    there would re-exchange the full edge set twice per sweep."""
    from linkgraph.operators.localcluster import ppr_sweep
    from linkgraph.derive import link_graph

    g = link_graph(spark, SF)
    plan = _plan(ppr_sweep(g, source=0, iterations=2, k=16))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_active_users_grid_join_broadcasts(spark):
    """The rolling-distinct interval join must broadcast the bucket GRID
    (time buckets, not data); a shuffle range join against raw pairs is
    the unbounded version this plan exists to avoid."""
    from linkgraph import events

    df = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(events.active_users(df, bucket="hour", window_buckets=24))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
