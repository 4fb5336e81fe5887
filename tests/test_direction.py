"""Direction-switch heuristic (reference bfs_simple.c:191-197) + BFS
delta-commit + unweighted-SSSP parity tests (VERDICT round 1, items 4/7/8).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph.operators import bfs, sssp
from linkgraph.operators.direction import use_broadcast_frontier
from linkgraph.runner import CheckpointStore
from tests.conftest import chain_edges, make_graph, star_hub_edges, zipf_edges


# ------------------------------------------------------------- pure heuristic
def test_small_light_frontier_pushes():
    # 10 rows, 50 out-edges, 10k edges: 60 <= 500 → push (broadcast)
    assert use_broadcast_frontier(10, 50, 10_000) is True


def test_hub_frontier_pulls_despite_few_rows():
    # the case row-count-only switching gets wrong: 100 frontier rows that
    # collectively own 60% of the edges must NOT be broadcast
    assert use_broadcast_frontier(100, 6_000, 10_000) is False


def test_row_cap_guards_broadcast_size():
    # degree-light but enormous frontier: work estimate says push, the
    # absolute broadcast cap says no
    assert use_broadcast_frontier(2_000_000, 0, 10_000_000_000) is False


def test_exact_reference_boundary():
    # switch strictly ABOVE nb_edges/20 (reference uses >, bfs_simple.c:191)
    assert use_broadcast_frontier(1, 4, 100) is True  # 5 <= 5
    assert use_broadcast_frontier(1, 5, 100) is False  # 6 > 5


def test_hub_fixture_statistics_pin_the_decision(spark):
    """On an out-star (hub 0 → all others) the level-0 frontier is ONE row
    whose out-degree is the whole edge set — the degree-weighted rule must
    choose pull, where a row-count rule would broadcast."""
    e, n = star_hub_edges(257)
    out_star = np.column_stack([e[:, 1], e[:, 0]])  # 0 -> i for all i
    g = make_graph(spark, out_star, n)
    row = (
        g.degrees().filter(F.col("id") == 0).select("out_deg").collect()[0]
    )
    frontier_size, frontier_degree = 1, int(row["out_deg"])
    assert frontier_degree == g.num_edges() == n - 1
    assert use_broadcast_frontier(frontier_size, frontier_degree, g.num_edges()) is False
    # and the traversal itself is still correct under the pull plan
    got = {(r["id"], r["dist"]) for r in bfs(g, root=0).collect()}
    assert got == {(0, 0), *{(i, 1) for i in range(1, n)}}


def test_bfs_correct_across_switch(spark):
    """Zipf graph with a low threshold path: force the engine through both
    directions by comparing against itself with broadcasting disabled."""
    e, n = zipf_edges(400, 3000)
    g = make_graph(spark, e, n)
    want = {(r["id"], r["dist"]) for r in bfs(g, root=0, broadcast_frontier_max=0).collect()}
    got = {(r["id"], r["dist"]) for r in bfs(g, root=0).collect()}
    assert got == want and len(got) > 1


# ------------------------------------------------------------ delta commits
def test_bfs_store_commits_deltas_not_snapshots(spark, tmp_path):
    """Total rows committed across all levels == vertices reached (each row
    written exactly once): O(V) checkpoint I/O, not O(V · diameter)."""
    e, n = chain_edges(24)
    g = make_graph(spark, e, n)
    store = CheckpointStore(spark, str(tmp_path / "c"), "bfs", "r1")
    result = bfs(g, root=0, store=store)
    n_reached = result.count()
    assert n_reached == n  # the whole chain
    total_committed = sum(
        store.load(it).count() for it in store.committed_iterations()
    )
    assert total_committed == n_reached


def test_bfs_resume_from_deltas_and_clamp(spark, tmp_path):
    e, n = chain_edges(16)
    g = make_graph(spark, e, n)
    want = {(r["id"], r["dist"]) for r in bfs(g, root=0).collect()}

    store = CheckpointStore(spark, str(tmp_path / "d"), "bfs", "r1")
    bfs(g, root=0, max_iterations=5, store=store)  # "crash" after level 5
    got = {(r["id"], r["dist"]) for r in bfs(g, root=0, store=store).collect()}
    assert got == want

    # clamp: a store holding 15 levels, asked for max_iterations=3, must
    # honor the smaller bound (ADVICE round 1, bfs.py:64)
    clamped = bfs(g, root=0, max_iterations=3, store=store)
    assert clamped.agg(F.max("dist")).collect()[0][0] == 3
    assert clamped.count() == 4


def test_sssp_resume_clamp(spark, tmp_path):
    e, n = chain_edges(16)
    g = make_graph(spark, e, n)
    store = CheckpointStore(spark, str(tmp_path / "s"), "sssp", "r1")
    sssp(g, root=0, store=store)  # run to fixpoint (15 rounds committed)
    clamped = sssp(g, root=0, max_iterations=3, store=store)
    # state as of round 3: exactly vertices 0..3 discovered on a chain
    assert clamped.count() == 4


# ------------------------------------------------------- unweighted SSSP
def test_sssp_unweighted_matches_bfs_hops(spark):
    """weighted=False replicates the reference push path's hardcoded +1
    (sssp_pushpull.c:46): distances equal BFS hop counts even though the
    graph carries real weights."""
    e, n = zipf_edges(300, 2000)
    g = make_graph(spark, e, n)  # synthetic weights attached
    hops = {(r["id"], r["dist"]) for r in bfs(g, root=0).collect()}
    relax = {
        (r["id"], int(r["dist"]))
        for r in sssp(g, root=0, weighted=False).collect()
    }
    # BFS does not skip self-loops, SSSP does — but self-loops never change
    # hop distances, so the result sets must be identical
    assert relax == hops


def test_sssp_weighted_differs_from_hops_on_weighted_chain(spark):
    # chain 0→1→2 with synthetic weights (w = src%10+dst%10 > 1): weighted
    # dists must exceed hop counts, proving the flag switches semantics
    e, n = chain_edges(8)
    g = make_graph(spark, e, n)
    w = dict(
        (r["id"], r["dist"]) for r in sssp(g, root=0, weighted=True).collect()
    )
    u = dict(
        (r["id"], r["dist"]) for r in sssp(g, root=0, weighted=False).collect()
    )
    assert u[7] == 7 and w[7] > u[7]
