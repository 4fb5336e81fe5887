"""Property-based tests (hypothesis) — algebraic invariants that hold for
ARBITRARY small graphs/corpora, complementing the fixed-fixture oracle
tests: random structure exercises shapes no hand-picked fixture does.
Each property uses a handful of examples (a Spark job per example)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from linkgraph.operators import pagerank, wcc
from tests.conftest import make_graph

N = 12  # vertex universe per example — small keeps each job sub-second

edge_lists = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=1,
    max_size=40,
)

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=edge_lists)
@PROP
def test_pagerank_mass_recurrence(spark, edges):
    """On a graph where EVERY vertex has out-degree >= 1 (self-loops added
    below), total rank obeys sum_{t+1} = (1-d) + d*sum_t EXACTLY (the
    reference recurrence conserves pushed mass when nothing dangles)."""
    arr = np.array(edges + [(v, v) for v in range(N)], dtype=np.int64)
    g = make_graph(spark, arr, N)
    d = 0.85
    s1 = sum(
        r["rank"] for r in pagerank(g, iterations=1).collect()
    )
    s2 = sum(
        r["rank"] for r in pagerank(g, iterations=2).collect()
    )
    s0 = N * 0.15
    assert s1 == pytest.approx((1 - d) + d * s0, rel=1e-9)
    assert s2 == pytest.approx((1 - d) + d * s1, rel=1e-9)
    g.unpersist()


def _components_py(edges, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labeling, matching hash-min semantics
    return {v: find(v) for v in range(n)}


@given(edges=edge_lists)
@PROP
def test_wcc_matches_union_find(spark, edges):
    arr = np.array(edges, dtype=np.int64)
    g = make_graph(spark, arr, N)
    got = {r["id"]: r["comp"] for r in wcc(g).collect()}
    assert got == _components_py(edges, N)
    g.unpersist()


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=12
    )
)
@PROP
def test_exact_dedup_minimal_and_idempotent(spark, texts):
    """(doc_id, n) rows: one per distinct text, doc_id = the group MIN,
    group sizes sum to the corpus; by_hash gives the identical result;
    a second dedup over the kept representatives is the identity."""
    from linkgraph import docs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["n"]) for r in docs.exact_dedup(df).collect()
    )
    want_min, want_n = {}, {}
    for i, t in enumerate(texts):
        want_min.setdefault(t, i)
        want_n[t] = want_n.get(t, 0) + 1
    assert got == sorted((want_min[t], want_n[t]) for t in want_min)
    assert sum(n for _, n in got) == len(texts)
    got_h = sorted(
        (r["doc_id"], r["n"])
        for r in docs.exact_dedup(df, by_hash=True).collect()
    )
    assert got_h == got
    kept_ids = {i for i, _ in got}
    kept_df = df.filter(F.col("doc_id").isin(list(kept_ids)))
    again = sorted(
        (r["doc_id"], r["n"]) for r in docs.exact_dedup(kept_df).collect()
    )
    assert again == sorted((i, 1) for i in kept_ids)


@given(
    rates=st.tuples(
        st.floats(0.05, 0.5, allow_nan=False), st.floats(0.5, 0.95, allow_nan=False)
    )
)
@PROP
def test_sample_monotone_in_rate(spark, rates):
    """md5-threshold sampling: the kept set at a lower rate is a SUBSET of
    the kept set at any higher rate (the retuning-without-resampling
    contract in docs.sample's docstring)."""
    from linkgraph import docs

    lo, hi = rates
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    keep_lo = {r["doc_id"] for r in docs.sample_documents(df, rate=lo).collect()}
    keep_hi = {r["doc_id"] for r in docs.sample_documents(df, rate=hi).collect()}
    assert keep_lo <= keep_hi
