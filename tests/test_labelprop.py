"""Label propagation: exact equality vs the synchronous NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators import label_propagation
from linkgraph.oracles import label_propagation_oracle

from tests.conftest import SMALL_FIXTURES, make_graph


def _label_array(df, n):
    out = np.full(n, -1, dtype=np.int64)
    for row in df.collect():
        out[row["id"]] = row["label"]
    return out


@pytest.mark.parametrize("name", sorted(SMALL_FIXTURES))
def test_labelprop_exact(spark, name):
    edges, n = SMALL_FIXTURES[name]()
    g = make_graph(spark, edges, n)
    got = _label_array(label_propagation(g, iterations=10), n)
    want = label_propagation_oracle(edges, n, iterations=10)
    assert np.array_equal(got, want), name
    g.unpersist()


def test_labelprop_cliques_converge_to_min(spark):
    """Each K8 clique settles on its minimum vertex id as the label."""
    from tests.conftest import two_cliques_edges

    edges, n = two_cliques_edges()
    g = make_graph(spark, edges, n)
    got = _label_array(label_propagation(g, iterations=10), n)
    assert set(got[:8]) == {0} and set(got[8:]) == {8}
    g.unpersist()


def test_weighted_lp_follows_heavy_edge(spark):
    # vertex 2 has neighbors 0 (weight 10) and two votes from 1 (weight 1
    # each): unweighted mode follows the count (label 1), weighted mode
    # follows the mass (label 0)
    import numpy as np
    from pyspark.sql import functions as F

    from linkgraph.graph import Graph
    from linkgraph.operators import label_propagation

    rows = [(0, 2, 10.0), (1, 2, 1.0), (1, 2, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = Graph.from_edges(spark, edges, num_vertices=3)
    unw = {r["id"]: r["label"] for r in label_propagation(g, iterations=1).collect()}
    wtd = {
        r["id"]: r["label"]
        for r in label_propagation(g, iterations=1, weighted=True).collect()
    }
    assert unw[2] == 1
    assert wtd[2] == 0
    g.unpersist()


def test_weighted_lp_uniform_weights_match_unweighted(spark):
    # weight ≡ 1 must reproduce the unweighted fixpoint exactly
    import numpy as np
    from pyspark.sql import functions as F

    from linkgraph.graph import Graph
    from linkgraph.operators import label_propagation
    from tests.conftest import zipf_edges

    edges, n = zipf_edges(n=200, m=1000, seed=5)
    df = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    g = Graph.from_edges(spark, df, num_vertices=n)
    a = sorted(
        (r["id"], r["label"]) for r in label_propagation(g, iterations=3).collect()
    )
    b = sorted(
        (r["id"], r["label"])
        for r in label_propagation(g, iterations=3, weighted=True).collect()
    )
    assert a == b
    g.unpersist()


def test_weighted_lp_requires_weight_column(spark):
    import pytest as _pytest

    from linkgraph.graph import Graph
    from linkgraph.operators import label_propagation

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    g = Graph.from_edges(spark, edges, num_vertices=2, add_weight_if_missing=False)
    with _pytest.raises(ValueError):
        label_propagation(g, weighted=True)
    g.unpersist()
