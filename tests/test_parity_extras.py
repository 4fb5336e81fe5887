"""Parent trees, binary-format round trip, and cross-parallelism parity."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.ingest.binary import read_reference_edges, write_reference_edges
from linkgraph.operators import bfs, sssp

from tests.conftest import make_graph, zipf_edges


def test_bfs_parents_form_valid_tree(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    root = int(edges[0, 0])
    res = bfs(g, root, return_parents=True)
    rows = {r["id"]: (r["dist"], r["parent"]) for r in res.collect()}
    assert rows[root] == (0, root)
    edge_set = {(int(s), int(d)) for s, d in edges}
    for v, (d, p) in rows.items():
        if v == root:
            continue
        assert (p, v) in edge_set          # parent is a real predecessor
        assert rows[p][0] == d - 1         # parent is exactly one level up
        # deterministic choice: p is the MIN id among level-(d-1) preds
        preds = [u for (u, w) in edge_set if w == v and u in rows and rows[u][0] == d - 1]
        assert p == min(preds)
    g.unpersist()


def test_sssp_parents_tight(spark):
    edges, n = zipf_edges(n=200, m=1200)
    g = make_graph(spark, edges, n)
    root = int(edges[0, 0])
    res = sssp(g, root, return_parents=True)
    rows = {r["id"]: (r["dist"], r["parent"]) for r in res.collect()}
    w = {}
    for s, d in edges:
        if s != d:
            key = (int(s), int(d))
            wt = float(s % 10 + d % 10)
            w[key] = min(w.get(key, float("inf")), wt)
    for v, (dist, p) in rows.items():
        if v == root:
            continue
        assert (p, v) in w
        assert rows[p][0] + w[(p, v)] == pytest.approx(dist)  # tree edge is tight
    g.unpersist()


def test_binary_format_round_trip(spark, tmp_path):
    edges, n = zipf_edges(n=64, m=300)
    g = make_graph(spark, edges, n)
    path = str(tmp_path / "edges.bin")
    cnt = write_reference_edges(g.edges, path, weighted=False)
    assert cnt == len(edges)
    back = read_reference_edges(spark, path)
    orig = sorted((int(s), int(d)) for s, d in edges)
    got = sorted((r["src"], r["dst"]) for r in back.collect())
    assert got == orig
    # record width matches the reference's item_size (init_all.c:43-49)
    import os

    assert os.path.getsize(path) == cnt * 8


_CHILD = r"""
import sys, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from linkgraph.session import get_spark
from linkgraph.graph import Graph
from linkgraph.operators import pagerank, wcc
cores = int(sys.argv[1])
spark = get_spark(app_name=f"parity{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.range(3000, numPartitions=cores).select(
    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(500)).alias("src"),
    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(500)).alias("dst"))
g = Graph.from_edges(spark, edges, num_vertices=500, num_partitions=cores)
pr = {r["id"]: round(r["rank"], 10) for r in pagerank(g, iterations=5).collect()}
cc = {r["id"]: r["comp"] for r in wcc(g).collect()}
print(json.dumps({"pr": pr, "cc": cc}))
spark.stop()
"""


@pytest.mark.slow
def test_cross_parallelism_parity(tmp_path):
    """SURVEY §5.5: the same job at two parallelism levels produces the
    same result (PR to 1e-10 rounding; WCC exactly)."""
    outs = []
    for cores in (2, 8):
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, str(cores)],
            capture_output=True, text=True, timeout=600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
    assert outs[0]["cc"] == outs[1]["cc"]
    assert outs[0]["pr"] == outs[1]["pr"]
