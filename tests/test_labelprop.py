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
