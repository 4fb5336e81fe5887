"""bipartite_project — co-occurrence projection of a containment
relation, with cap + audit semantics."""

from __future__ import annotations

import pytest

from linkgraph.operators.bipartite import bipartite_dropped_left, bipartite_project


def _rel(spark, rows):
    return spark.createDataFrame(rows, "basket long, item long")


def test_projection_counts_distinct_shared_baskets(spark):
    rows = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 10), (3, 11),
        (1, 10),            # duplicate containment row: must NOT double-count
        (4, 12),            # singleton basket: no pairs
    ]
    got = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(_rel(spark, rows), "basket", "item").collect()
    }
    assert got == {(10, 11): 3, (10, 12): 1, (11, 12): 1}


def test_min_count_and_cap_with_audit(spark):
    rows = [(1, i) for i in range(10, 16)]          # megabasket, 6 items
    rows += [(2, 10), (2, 11), (3, 10), (3, 11)]
    rel = _rel(spark, rows)
    # uncapped: the megabasket contributes C(6,2)=15 pairs
    assert bipartite_project(rel, "basket", "item").count() == 15
    # capped at 4: megabasket excluded entirely; only (10,11) survives
    capped = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(
            rel, "basket", "item", max_left_degree=4
        ).collect()
    }
    assert capped == {(10, 11): 2}
    dropped = bipartite_dropped_left(rel, "basket", "item", 4).collect()
    assert [(r["l"], r["sz"]) for r in dropped] == [(1, 6)]
    # min_count keeps only the repeated co-occurrence
    filtered = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(rel, "basket", "item", min_count=3).collect()
    }
    assert filtered == {(10, 11): 3}


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
