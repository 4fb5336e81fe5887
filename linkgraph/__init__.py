"""linkgraph — a PySpark-native distributed link-graph analytics engine.

A brand-new engine (NOT a port) with the analytic capabilities of
jmalicevic/EverythingGraph (BFS, PageRank, SSSP, SpMV, WCC; see
/root/reference/README.md:6) plus label propagation and triangle counting,
re-expressed as iterative DataFrame join-aggregate dataflows:

- the reference's dense per-vertex state arrays (pagerank_simple.c:5-9)
  become a hash-partitioned ``(id, value)`` vertex-state DataFrame;
- its scatter/gather atomics (writeAdd/writeMin, utils_ligra.h:285-313)
  become ``groupBy(dst).agg(sum/min)`` — shuffle replaces shared memory;
- its physical layouts (edge array / CSR / 2D grid, init_all.c:855-888)
  collapse into ONE layout: a hash-partitioned, persisted edges DataFrame,
  with shuffle-partition count playing the role of the grid.

Everything is pyspark.sql DataFrame + vectorized pandas/Arrow UDFs; no
per-row Python in any hot path.
"""

from linkgraph.graph import Graph
from linkgraph.session import get_spark

__all__ = ["Graph", "get_spark"]

__version__ = "0.1.0"
