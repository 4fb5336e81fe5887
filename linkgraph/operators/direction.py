"""Push↔pull direction heuristic — the reference's degree-weighted switch.

The reference switches BFS/SSSP from push (worklist scatter) to pull
(dense gather) when the frontier's work estimate exceeds 5% of the edges:

    items_in_frontier + degree_in_frontier > nb_edges / 20
    (/root/reference/bfs_simple.c:191-197, sssp_pushpull.c:169-180;
     the frontier degree is accumulated at enqueue time,
     buffer.c:272-282 via thread_add_task)

In Spark the physical analog is broadcast-vs-shuffle join of the frontier
against the persisted edge table: a broadcast frontier joined on src IS
push (each edge partition scatters from its resident frontier copy —
no shuffle of the big side); a shuffle join IS pull (frontier rows are
routed to the edges — the dense pass). Row count alone is the wrong
statistic: a 900k-row frontier of hub vertices fans out to billions of
join rows, which is exactly the case the reference's degree term exists
to catch. We therefore weight the frontier by its out-degree sum (one
lookup against the persisted degrees table per level) and apply the
reference's E/20 rule, with an absolute row cap as a broadcast-size
guard (driver memory is finite regardless of the work estimate).
"""

from __future__ import annotations

# Reference constant: switch at 5% of edges (bfs_simple.c:191 — the
# literal `nb_edges / 20`).
SWITCH_EDGE_FRACTION = 20.0


def use_broadcast_frontier(
    frontier_size: int,
    frontier_degree: int,
    num_edges: int,
    row_cap: int = 1_000_000,
) -> bool:
    """True → broadcast the frontier (push); False → shuffle join (pull).

    Mirrors bfs_simple.c:191-197: push while
    ``frontier_size + frontier_degree <= num_edges / 20``. ``row_cap``
    bounds the broadcast's absolute size — a degree-light but enormous
    frontier must still not be collected to every executor.
    """
    if frontier_size > row_cap:
        return False
    return frontier_size + frontier_degree <= num_edges / SWITCH_EDGE_FRACTION
