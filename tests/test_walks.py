"""Deterministic random walks — engine vs a hashlib replication.

Pins operators/walks.py to its spec: next hop = out-neighbor minimizing
the 60-bit md5 of seed|walk_id|step|src|dst (tie: min dst); dead ends
terminate the walk early; walk_corpus reassembles step-ordered sentences.
"""

from __future__ import annotations

import hashlib

import numpy as np

from linkgraph.operators import random_walks, walk_corpus
from tests.conftest import chain_edges, make_graph, zipf_edges


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _walks_py(
    edges: np.ndarray, n: int, walk_length: int, k: int, seed: int
) -> set[tuple[int, int, int]]:
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(int(s), set()).add(int(d))
    rows = set()
    for v in range(n):
        for j in range(k):
            wid, cur = v * k + j, v
            rows.add((wid, 0, cur))
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs, key=lambda u: (_md5_60(f"{seed}|{wid}|{t}|{cur}|{u}"), u)
                )
                rows.add((wid, t, cur))
    return rows


def test_walks_match_hashlib_replication(spark):
    edges, n = zipf_edges(n=150, m=900)
    g = make_graph(spark, edges, n)
    got = {
        (r["walk_id"], r["step"], r["id"])
        for r in random_walks(g, walk_length=4, walks_per_vertex=2, seed=7).collect()
    }
    assert got == _walks_py(edges, n, 4, 2, 7)
    g.unpersist()


def test_walks_dead_end_terminates_early(spark):
    edges, n = chain_edges(5)  # 0→1→2→3→4; vertex 4 is a sink
    g = make_graph(spark, edges, n)
    rows = random_walks(g, walk_length=10, walks_per_vertex=1, seed=1).collect()
    by_walk: dict[int, list] = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], []).append((r["step"], r["id"]))
    # walk from v deterministically runs v→v+1→…→4 then stops
    for v in range(n):
        path = sorted(by_walk[v])
        assert path == [(t, v + t) for t in range(n - v)]
    g.unpersist()


def test_walks_seed_changes_corpus(spark):
    edges, n = zipf_edges(n=100, m=800)
    g = make_graph(spark, edges, n)
    a = {
        (r["walk_id"], r["step"], r["id"])
        for r in random_walks(g, walk_length=3, seed=1).collect()
    }
    b = {
        (r["walk_id"], r["step"], r["id"])
        for r in random_walks(g, walk_length=3, seed=2).collect()
    }
    assert a != b  # same starts (step 0) but different hops
    assert {r for r in a if r[1] == 0} == {r for r in b if r[1] == 0}
    g.unpersist()


def test_walk_corpus_sentences_ordered(spark):
    edges, n = zipf_edges(n=80, m=500)
    g = make_graph(spark, edges, n)
    w = random_walks(g, walk_length=4, walks_per_vertex=1, seed=3)
    rows = {(r["walk_id"], r["step"]): r["id"] for r in w.collect()}
    sents = {r["walk_id"]: list(r["sentence"]) for r in walk_corpus(w).collect()}
    assert set(sents) == {wid for wid, _ in rows}
    for wid, sent in sents.items():
        assert sent == [rows[(wid, t)] for t in range(len(sent))]
        assert sent[0] == wid  # walks_per_vertex=1: walk_id == start vertex
    g.unpersist()


def test_skipgram_pairs_match_python_replication(spark):
    from linkgraph.operators import skipgram_pairs

    edges, n = zipf_edges(n=120, m=700)
    g = make_graph(spark, edges, n)
    corpus = walk_corpus(random_walks(g, walk_length=4, walks_per_vertex=2, seed=7))
    sents = [r["sentence"] for r in corpus.collect()]
    want: dict[tuple[int, int], int] = {}
    for s in sents:
        for i, c in enumerate(s):
            for j, x in enumerate(s):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] = want.get((c, x), 0) + 1
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(corpus, window=2).collect()
    }
    assert got == want
    g.unpersist()


def test_skipgram_window_one_is_adjacent_bigrams(spark):
    from linkgraph.operators import skipgram_pairs

    corpus = spark.createDataFrame(
        [(0, [1, 2, 3])], "walk_id long, sentence array<long>"
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(corpus, window=1).collect()
    }
    assert got == {(1, 2): 1, (2, 1): 1, (2, 3): 1, (3, 2): 1}


# ------------------------------------------------------------- node2vec
def _node2vec_py(
    edges: np.ndarray,
    n: int,
    walk_length: int,
    k: int,
    seed: int,
    w_ret: int,
    w_nbr: int,
    w_far: int,
) -> set[tuple[int, int, int]]:
    """Sequential replication of operators.walks.node2vec_walks: exact
    weighted draw via replica hashing — candidate u with weight w expands
    to replicas r=1..w; argmin of (md5_60(seed|wid|t|cur|u|r), u, r)."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(int(s), set()).add(int(d))
    rows = set()
    for v in range(n):
        for j in range(k):
            wid, prev, cur = v * k + j, None, v
            rows.add((wid, 0, cur))
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                best = None
                for u in sorted(nbrs):
                    if t == 1:
                        w = 1
                    elif u == prev:
                        w = w_ret
                    elif u in adj.get(prev, ()):
                        w = w_nbr
                    else:
                        w = w_far
                    for r in range(1, w + 1):
                        key = (_md5_60(f"{seed}|{wid}|{t}|{cur}|{u}|{r}"), u, r)
                        if best is None or key < best[0]:
                            best = (key, u)
                prev, cur = cur, best[1]
                rows.add((wid, t, cur))
    return rows


def test_node2vec_matches_hashlib_replication(spark):
    from linkgraph.operators import node2vec_walks

    edges, n = zipf_edges(n=120, m=700)
    g = make_graph(spark, edges, n)
    got = {
        (r["walk_id"], r["step"], r["id"])
        for r in node2vec_walks(
            g, walk_length=3, walks_per_vertex=2, p=2.0, q=0.5, seed=7
        ).collect()
    }
    # p=2, q=0.5 → weights 1/p : 1 : 1/q = 0.5 : 1 : 2, scaled ×2 → 1, 2, 4
    assert got == _node2vec_py(edges, n, 3, 2, 7, 1, 2, 4)
    g.unpersist()


def test_node2vec_p1_q1_single_replica_is_deepwalk(spark):
    # p=q=1 → all weights 1 → one replica per candidate: the biased walk
    # degenerates to a first-order uniform walk, but with the r suffix in
    # the hash it is its OWN determinism class (not byte-equal to
    # random_walks) — pin it against the python replication instead
    from linkgraph.operators import node2vec_walks

    edges, n = zipf_edges(n=80, m=400)
    g = make_graph(spark, edges, n)
    got = {
        (r["walk_id"], r["step"], r["id"])
        for r in node2vec_walks(
            g, walk_length=3, walks_per_vertex=1, p=1.0, q=1.0, seed=3
        ).collect()
    }
    assert got == _node2vec_py(edges, n, 3, 1, 3, 1, 1, 1)
    g.unpersist()


def test_node2vec_every_hop_is_an_edge_and_dead_ends_stop(spark):
    from linkgraph.operators import node2vec_walks

    edges, n = chain_edges(5)  # 0→1→2→3→4, sink at 4
    g = make_graph(spark, edges, n)
    rows = node2vec_walks(g, walk_length=10, walks_per_vertex=1, seed=1).collect()
    by_walk: dict[int, list] = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], []).append((r["step"], r["id"]))
    for v in range(n):
        assert sorted(by_walk[v]) == [(t, v + t) for t in range(n - v)]
    g.unpersist()


def test_node2vec_rejects_non_dyadic_bias(spark):
    import pytest

    from linkgraph.operators import node2vec_walks

    edges, n = chain_edges(4)
    g = make_graph(spark, edges, n)
    with pytest.raises(ValueError, match="replica weights"):
        node2vec_walks(g, p=128.0, q=1.0)  # 1/p scales the others to 128
    with pytest.raises(ValueError, match="p=|q="):
        node2vec_walks(g, p=1.0, q=0.001)  # q rounds to 0 → no valid tier
    g.unpersist()
