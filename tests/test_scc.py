"""SCC — FW-BW-Trim coloring vs a sequential Kosaraju ground truth.

The reference has no directed-components kernel (wcc.c symmetrizes);
these tests pin operators/scc.py to the textbook semantics: scc(v) =
min id in v's strongly connected component.
"""

from __future__ import annotations

import numpy as np

from linkgraph.operators import scc, scc_census
from tests.conftest import chain_edges, make_graph, zipf_edges


def _kosaraju(edges: np.ndarray, n: int) -> dict[int, int]:
    """Sequential ground truth: scc label = min id in the component."""
    fwd: list[list[int]] = [[] for _ in range(n)]
    rev: list[list[int]] = [[] for _ in range(n)]
    for s, d in edges:
        if s != d:
            fwd[int(s)].append(int(d))
            rev[int(d)].append(int(s))
    order, seen = [], [False] * n
    for start in range(n):
        if seen[start]:
            continue
        stack = [(start, iter(fwd[start]))]
        seen[start] = True
        while stack:
            v, it = stack[-1]
            nxt = next((w for w in it if not seen[w]), None)
            if nxt is None:
                order.append(v)
                stack.pop()
            else:
                seen[nxt] = True
                stack.append((nxt, iter(fwd[nxt])))
    comp = [-1] * n
    for start in reversed(order):
        if comp[start] != -1:
            continue
        members, stack = [], [start]
        comp[start] = start
        while stack:
            v = stack.pop()
            members.append(v)
            for w in rev[v]:
                if comp[w] == -1:
                    comp[w] = start
                    stack.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    return {v: comp[v] for v in range(n)}


def test_scc_chain_all_singletons(spark):
    edges, n = chain_edges(12)  # DAG: every vertex its own SCC
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    assert got == {v: v for v in range(n)}
    g.unpersist()


def test_scc_cycle_single_component(spark):
    n = 9
    edges = np.array([[i, (i + 1) % n] for i in range(n)], dtype=np.int64)
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    assert got == {v: 0 for v in range(n)}
    g.unpersist()


def test_scc_two_cycles_one_way_bridge(spark):
    # cycle A {0,1,2} → bridge → cycle B {3,4,5}; 6 isolated
    edges = np.array(
        [[0, 1], [1, 2], [2, 0], [2, 3], [3, 4], [4, 5], [5, 3]],
        dtype=np.int64,
    )
    n = 7
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6}
    g.unpersist()


def test_scc_matches_kosaraju_zipf(spark):
    edges, n = zipf_edges(n=300, m=2500)
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    assert got == _kosaraju(edges, n)
    g.unpersist()


def test_scc_chain_of_cycles_needs_multiple_passes(spark):
    # 4 cycles of 3 linked in a line: coloring pass 1 colors everything
    # with the first cycle's min; later cycles peel in later passes
    blocks = 4
    rows = []
    for b in range(blocks):
        base = 3 * b
        rows += [[base, base + 1], [base + 1, base + 2], [base + 2, base]]
        if b + 1 < blocks:
            rows.append([base, base + 3])
    edges, n = np.array(rows, dtype=np.int64), 3 * blocks
    g = make_graph(spark, edges, n)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    assert got == {v: 3 * (v // 3) for v in range(n)}
    g.unpersist()


def test_scc_census_sizes_sum_to_v(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    labels = scc(g)
    census = scc_census(g, labels)
    assert census.groupBy().sum("size").collect()[0][0] == n
    want = _kosaraju(edges, n)
    sizes: dict[int, int] = {}
    for v, c in want.items():
        sizes[c] = sizes.get(c, 0) + 1
    got = {r["scc"]: r["size"] for r in census.collect()}
    assert got == sizes
    g.unpersist()


def test_bowtie_census_planted_bowtie(spark):
    import numpy as np

    from linkgraph.operators import bowtie_census
    from tests.conftest import make_graph

    # core SCC {0,1,2}; IN: 3→0, 4→3; OUT: 2→5, 5→6; OTHER: 7 isolated,
    # 8→9 disconnected pair, 10 a tendril off IN (3→10, never reaches core)
    edges = np.array(
        [[0, 1], [1, 2], [2, 0], [3, 0], [4, 3], [2, 5], [5, 6], [8, 9], [3, 10]]
    )
    g = make_graph(spark, edges, 11)
    r = bowtie_census(g).collect()[0]
    assert (r["n_core"], r["n_in"], r["n_out"], r["n_other"]) == (3, 2, 2, 4)
    g.unpersist()


def test_bowtie_census_all_one_scc(spark):
    import numpy as np

    from linkgraph.operators import bowtie_census
    from tests.conftest import make_graph

    edges = np.array([[i, (i + 1) % 5] for i in range(5)])  # directed 5-cycle
    g = make_graph(spark, edges, 5)
    r = bowtie_census(g).collect()[0]
    assert (r["n_core"], r["n_in"], r["n_out"], r["n_other"]) == (5, 0, 0, 0)
    g.unpersist()


def test_condensation_and_dag_layers_planted(spark):
    # two 3-cycles (SCCs {0,1,2} and {3,4,5}) chained into a tail 6 -> 7:
    # condensation 0 -> 3 -> 6 -> 7, layers 0,1,2,3
    import numpy as np

    from linkgraph.operators.scc import condensation, dag_layers
    from tests.conftest import make_graph

    e = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3),
         (2, 3), (5, 6), (6, 7)]
    g = make_graph(spark, np.array(e), 8)
    cedges = {(r["csrc"], r["cdst"]) for r in condensation(g).collect()}
    assert cedges == {(0, 3), (3, 6), (6, 7)}
    layers = {r["scc"]: r["layer"] for r in dag_layers(g).collect()}
    assert layers == {0: 0, 3: 1, 6: 2, 7: 3}
    g.unpersist()


def test_dag_layers_longest_path_not_shortest(spark):
    # diamond with a long arm: 0->1->2->3 and 0->3 — layer(3) must be 3
    # (longest path), not 1
    import numpy as np

    from linkgraph.operators.scc import dag_layers
    from tests.conftest import make_graph

    g = make_graph(spark, np.array([(0, 1), (1, 2), (2, 3), (0, 3)]), 4)
    layers = {r["scc"]: r["layer"] for r in dag_layers(g).collect()}
    assert layers == {0: 0, 1: 1, 2: 2, 3: 3}
    g.unpersist()
