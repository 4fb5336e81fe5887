"""Guards tying the SQL-oracle recursion bounds (oracle_sql.bfs_sql
max_depth=256, oracle_sql.sssp_sql cost_cap=2000) to the derive.py gate
graph's actual structure: if a future change to the derivation or the
synthetic weight rule pushes true distances near the caps, these tests
fail loudly instead of the gate silently truncating the oracle (ADVICE
round 1, oracle_sql.py:146).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.derive import link_graph
from linkgraph.operators import bfs, sssp

SF_DIR = "/root/testdata/sf0.001"

# caps as wired into __spark_entry__.oracle_sql()
BFS_MAX_DEPTH = 256
SSSP_COST_CAP = 2000


def test_bfs_depth_far_below_oracle_cap(spark):
    g = link_graph(spark, SF_DIR)
    max_d = bfs(g, root=0).agg(F.max("dist")).collect()[0][0]
    assert max_d is not None
    # require a >=4x margin so drift is caught before truncation
    assert max_d * 4 <= BFS_MAX_DEPTH, (
        f"gate-graph BFS eccentricity {max_d} is within 4x of the oracle "
        f"recursion cap {BFS_MAX_DEPTH}; re-derive bfs_sql/bfs_parents_sql max_depth"
    )


def test_sssp_dist_far_below_oracle_cap(spark):
    g = link_graph(spark, SF_DIR)
    max_d = sssp(g, root=0).agg(F.max("dist")).collect()[0][0]
    assert max_d is not None
    assert max_d * 4 <= SSSP_COST_CAP, (
        f"gate-graph max shortest distance {max_d} is within 4x of the "
        f"oracle cost cap {SSSP_COST_CAP}; re-derive sssp_sql cost_cap"
    )
    # weight-rule invariant the cap derivation rests on (synthetic_weight)
    wmax = g.edges.agg(F.max("weight")).collect()[0][0]
    assert wmax <= 18.0
