"""Explicit hub salting: identical results on skewed graphs, both via the
utility directly and through PageRank's salted aggregation path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph.operators import pagerank
from linkgraph.operators.salting import salted_sum
from linkgraph.oracles import pagerank_oracle

from tests.conftest import make_graph, star_hub_edges, zipf_edges


def test_salted_sum_equals_plain(spark):
    edges, n = zipf_edges()  # hub-skewed destinations
    df = spark.createDataFrame(
        [(int(s), int(d), float(s % 7) + 0.25) for s, d in edges],
        "src long, dst long, v double",
    )
    plain = {
        r["dst"]: r["m"]
        for r in df.groupBy("dst").agg(F.sum("v").alias("m")).collect()
    }
    salted = {
        r["dst"]: r["m"]
        for r in salted_sum(df, key="dst", value="v", out="m", salt=8, salt_source="src").collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-9


def test_pagerank_salted_matches_oracle(spark):
    """star_hub: every vertex points at vertex 0 — the maximal skew case
    the salting exists for. Salted PR must still match the oracle."""
    edges, n = star_hub_edges()
    g = make_graph(spark, edges, n)
    got = np.zeros(n)
    for row in pagerank(g, iterations=10, salt=8).collect():
        got[row["id"]] = row["rank"]
    want = pagerank_oracle(edges, n, iterations=10)
    assert np.allclose(got, want, atol=1e-9)
    g.unpersist()
