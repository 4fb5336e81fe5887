"""Shared pytest fixtures: one session-scoped SparkSession + fixture graphs.

Fixture graphs follow FIXTURES.md §2 — deterministic, seeded, small; each
exercises a distinct structure the reference's layouts/heuristics target.
"""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.graph import Graph
from linkgraph.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="linkgraph-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield s
    s.stop()


def _edges_df(spark, edges: np.ndarray):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src long, dst long"
    )


def make_graph(spark, edges: np.ndarray, n: int) -> Graph:
    return Graph.from_edges(spark, _edges_df(spark, edges), num_vertices=n, num_partitions=8)


# ---------------------------------------------------------------- fixtures
def chain_edges(n: int = 64) -> tuple[np.ndarray, int]:
    e = np.array([[i, i + 1] for i in range(n - 1)], dtype=np.int64)
    return e, n


def star_hub_edges(n: int = 257) -> tuple[np.ndarray, int]:
    e = np.array([[i, 0] for i in range(1, n)], dtype=np.int64)
    return e, n


def two_cliques_edges(k: int = 8) -> tuple[np.ndarray, int]:
    e = []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    e.append([base + i, base + j])
    return np.array(e, dtype=np.int64), 2 * k


def bridge_edges(k: int = 8) -> tuple[np.ndarray, int]:
    e, n = two_cliques_edges(k)
    return np.vstack([e, [[0, k]]]), n


def zipf_edges(n: int = 1000, m: int = 8000, seed: int = 42) -> tuple[np.ndarray, int]:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    # Zipf-ish in-degree skew: hub-heavy destinations
    dst = (rng.zipf(1.5, size=m) - 1) % n
    return np.column_stack([src, dst]).astype(np.int64), n


def rmat_mini_edges(scale: int = 10, edges_per_v: int = 8, seed: int = 42) -> tuple[np.ndarray, int]:
    n = 1 << scale
    m = n * edges_per_v
    rng = np.random.default_rng(seed)
    a, b, c = 0.57, 0.19, 0.19
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    for bit in range(scale):
        r = rng.random(m)
        go_right = (r >= a) & (r < a + b)
        go_down = (r >= a + b) & (r < a + b + c)
        go_diag = r >= a + b + c
        src = src * 2 + (go_down | go_diag)
        dst = dst * 2 + (go_right | go_diag)
    return np.column_stack([src, dst]), n


def selfloop_multi_edges(seed: int = 42) -> tuple[np.ndarray, int]:
    n = 32
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n, size=(80, 2))
    loops = np.column_stack([np.arange(8), np.arange(8)])
    dups = e[:8]
    return np.vstack([e, loops, dups]).astype(np.int64), n


def empty_vertex_edges(seed: int = 42) -> tuple[np.ndarray, int]:
    n = 64
    rng = np.random.default_rng(seed)
    # edges only among the first 40 vertices; 24 fully isolated + danglers
    e = rng.integers(0, 40, size=(80, 2)).astype(np.int64)
    return e, n


ALL_FIXTURES = {
    "chain": chain_edges,
    "star_hub": star_hub_edges,
    "two_cliques": two_cliques_edges,
    "bridge": bridge_edges,
    "zipf": zipf_edges,
    "rmat_mini": rmat_mini_edges,
    "selfloop_multi": selfloop_multi_edges,
    "empty_vertex": empty_vertex_edges,
}

SMALL_FIXTURES = {
    k: ALL_FIXTURES[k]
    for k in ["chain", "star_hub", "two_cliques", "bridge", "selfloop_multi", "empty_vertex"]
}
