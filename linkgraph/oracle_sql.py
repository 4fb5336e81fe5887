"""ANSI-SQL (DuckDB) oracles for every gate query.

Each function returns a self-contained SQL string over the pre-registered
parquet views (lineitem etc.) that computes the SAME result as the
corresponding Spark query in ``__spark_entry__.queries()`` — same column
names, same types, same rounding. Iterative kernels are expressed as
unrolled CTE chains (fixed-round algorithms) or recursive CTEs
(fixpoint algorithms); floats are rounded identically on both sides
because summation order differs between engines.
"""

from __future__ import annotations

from linkgraph.derive import EDGES_SQL, NUM_VERTICES
from linkgraph.docs import MINHASH_PRIME, minhash_params

_TELEPORT = f"(0.15 / {NUM_VERTICES})"  # (1-0.85)/N


def _md5_60_duck(inner_sql: str) -> str:
    """DuckDB twin of linkgraph.docs._md5_60_sql — identical 60-bit value
    (verified value-for-value in tests/test_docs.py::test_md5_60_parity)."""
    return f"CAST('0x' || substr(md5({inner_sql}), 1, 15) AS BIGINT)"


def _shingles_cte(k: int) -> str:
    """toks + sh CTE bodies — the DuckDB twin of docs.shingle_hashes():
    ``sh`` carries the DISTINCT 60-bit md5 of each doc's shingles, so
    sizes and intersections are keyed on the SAME hash as the engine —
    parity is exact by construction, not merely modulo md5-60 collisions
    (ADVICE r02)."""
    shingle = f"array_to_string(t[i+1:i+{k}], ' ')"
    return f"""toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, {_md5_60_duck(shingle)} AS x
    FROM toks, UNNEST(generate_series(0, greatest(len(t)-{k}, 0))) AS u(i)
)"""


def _minhash_ctes(
    num_hashes: int, bands: int, k: int, seed: int, max_bucket_size: int | None
) -> str:
    """CTE chain ending in ``pairs(doc_a, doc_b)`` + ``sig`` — the DuckDB
    twin of docs.minhash_candidate_pairs' bucket join (same md5-affine
    hash family, same band buckets, same bucket-size cap)."""
    rows = num_hashes // bands
    params = minhash_params(num_hashes, seed)
    P = MINHASH_PRIME
    sig_cols = ", ".join(
        f"MIN(({a} * x + {b}) % {P}) AS h{i}" for i, (a, b) in enumerate(params)
    )
    band_rows = []
    for b_idx in range(bands):
        cols = ", ".join(f"h{b_idx * rows + r}" for r in range(rows))
        band_key = _md5_60_duck("concat_ws(',', " + cols + ")")
        band_rows.append(
            f"SELECT doc_id, {b_idx} AS band, {band_key} AS bucket FROM sig"
        )
    cap_filter = (
        f"QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= {max_bucket_size}"
        if max_bucket_size is not None
        else ""
    )
    return f"""{_shingles_cte(k)},
hb AS (
    SELECT doc_id, x % {P} AS x FROM sh
),
sig AS (SELECT doc_id, {sig_cols} FROM hb GROUP BY doc_id),
banded AS ({" UNION ALL ".join(band_rows)}),
capped AS (SELECT * FROM banded {cap_filter}),
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""


def degrees_sql() -> str:
    return f"""
WITH {EDGES_SQL}
SELECT v.id,
       CAST(COALESCE(o.c, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.c, 0) AS BIGINT) AS in_deg
FROM vertices v
LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges GROUP BY src) o ON v.id = o.src
LEFT JOIN (SELECT dst, COUNT(*) AS c FROM edges GROUP BY dst) i ON v.id = i.dst
"""


def pagerank_sql(iterations: int = 10) -> str:
    rounds = []
    for k in range(1, iterations + 1):
        rounds.append(
            f"""r{k} AS (
    SELECT v.id,
           {_TELEPORT} + 0.85 * COALESCE(m.mass, 0.0) AS pr
    FROM vertices v
    LEFT JOIN (
        SELECT ne.dst AS id, SUM(r.pr * ne.w) AS mass
        FROM ne JOIN r{k - 1} r ON ne.src = r.id
        GROUP BY ne.dst
    ) m ON v.id = m.id
)"""
        )
    return f"""
WITH {EDGES_SQL},
deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ne AS (SELECT e.src, e.dst, 1.0 / d.od AS w FROM edges e JOIN deg d ON e.src = d.src),
r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS pr FROM vertices),
{",".join(rounds)}
SELECT id, ROUND(pr, 6) AS pr FROM r{iterations}
"""


def weighted_pagerank_sql(iterations: int = 10) -> str:
    """DuckDB twin of operators/pagerank.py:weighted_pagerank — the
    parity recurrence with weight-proportional transitions w/W(u),
    W(u)=0 rows excluded (all-zero out-weights ⇒ zero outflow)."""
    rounds = []
    for k in range(1, iterations + 1):
        rounds.append(
            f"""w{k} AS MATERIALIZED (
    SELECT v.id,
           {_TELEPORT} + 0.85 * COALESCE(m.mass, 0.0) AS pr
    FROM vertices v
    LEFT JOIN (
        SELECT nw.dst AS id, SUM(r.pr * nw.p) AS mass
        FROM nw JOIN w{k - 1} r ON nw.src = r.id
        GROUP BY nw.dst
    ) m ON v.id = m.id
)"""
        )
    return f"""
WITH {EDGES_SQL},
wt AS (SELECT src, SUM(weight) AS wsum FROM wedges GROUP BY src),
nw AS MATERIALIZED (
    SELECT e.src, e.dst, e.weight / t.wsum AS p
    FROM wedges e JOIN wt t ON e.src = t.src
    WHERE t.wsum > 0
),
w0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS pr FROM vertices),
{",".join(rounds)}
SELECT id, ROUND(pr, 6) AS pr FROM w{iterations}
"""


def wcc_sql() -> str:
    return f"""
WITH RECURSIVE {EDGES_SQL},
sym AS (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
),
reach(id, lbl) AS (
    SELECT id, id FROM vertices
    UNION
    SELECT s.dst AS id, r.lbl FROM sym s JOIN reach r ON s.src = r.id
)
SELECT id, MIN(lbl) AS comp FROM reach GROUP BY id
"""


def _labelprop_ctes(iterations: int, weighted: bool = False) -> str:
    """CTE body (sym, l0 … l{iterations}) for the synchronous
    min-tiebreak label propagation — shared by labelprop_sql and
    modularity_sql. ``weighted`` makes each vote carry the edge weight
    (sums of the integer-valued synthetic weights are exact in double,
    so the argmax is deterministic on both engines)."""
    vote = "SUM(s.weight)" if weighted else "COUNT(*)"
    rounds = []
    for k in range(1, iterations + 1):
        rounds.append(
            f"""votes{k} AS (
    SELECT s.dst AS id, l.label AS label, {vote} AS cnt
    FROM sym s JOIN l{k - 1} l ON s.src = l.id
    GROUP BY s.dst, l.label
),
win{k} AS (
    SELECT id, label FROM (
        SELECT id, label,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
        FROM votes{k}
    ) WHERE rn = 1
),
l{k} AS (
    SELECT v.id, COALESCE(w.label, p.label) AS label
    FROM vertices v
    JOIN l{k - 1} p ON v.id = p.id
    LEFT JOIN win{k} w ON v.id = w.id
)"""
        )
    src_rel = "wedges" if weighted else "edges"
    wcol = ", weight" if weighted else ""
    return f"""sym AS (
    SELECT src, dst{wcol} FROM {src_rel}
    UNION ALL
    SELECT dst AS src, src AS dst{wcol} FROM {src_rel}
),
l0 AS (SELECT id, id AS label FROM vertices),
{",".join(rounds)}"""


def labelprop_sql(iterations: int = 5, weighted: bool = False) -> str:
    return f"""
WITH {EDGES_SQL},
{_labelprop_ctes(iterations, weighted=weighted)}
SELECT id, label FROM l{iterations}
"""


def modularity_sql(iterations: int = 5) -> str:
    """DuckDB twin of operators.stats.modularity over the labelprop5
    partition: Q = intra/m − Σ_c (d_c / 2m)² on the undirected simple
    edge set."""
    return f"""
WITH {EDGES_SQL},
{_labelprop_ctes(iterations)},
lab AS MATERIALIZED (SELECT id, label FROM l{iterations}),
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
mi AS (
    SELECT COUNT(*) AS m,
           SUM(CASE WHEN x.label = y.label THEN 1 ELSE 0 END) AS intra
    FROM canon c JOIN lab x ON c.a = x.id JOIN lab y ON c.b = y.id
),
deg AS (
    SELECT id, COUNT(*) AS d FROM (
        SELECT a AS id FROM canon UNION ALL SELECT b AS id FROM canon
    ) GROUP BY id
),
sq AS (
    SELECT SUM(dsum * dsum) AS sq FROM (
        SELECT x.label, SUM(g.d) AS dsum
        FROM deg g JOIN lab x ON g.id = x.id GROUP BY x.label
    )
)
SELECT ROUND(mi.intra * 1.0 / mi.m - sq.sq / (4.0 * mi.m * mi.m), 6) AS modularity
FROM mi, sq
"""


def conductance_sql(iterations: int = 5) -> str:
    """DuckDB twin of operators.stats.conductance over the labelprop5
    partition: per-label φ = cut / min(vol, 2m − vol), isolated
    communities report 0."""
    return f"""
WITH {EDGES_SQL},
{_labelprop_ctes(iterations)},
lab AS MATERIALIZED (SELECT id, label FROM l{iterations}),
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
cut AS (
    SELECT label, COUNT(*) AS cut FROM (
        SELECT x.label FROM canon c
        JOIN lab x ON c.a = x.id JOIN lab y ON c.b = y.id
        WHERE x.label <> y.label
        UNION ALL
        SELECT y.label FROM canon c
        JOIN lab x ON c.a = x.id JOIN lab y ON c.b = y.id
        WHERE x.label <> y.label
    ) GROUP BY label
),
deg AS (
    SELECT id, COUNT(*) AS d FROM (
        SELECT a AS id FROM canon UNION ALL SELECT b AS id FROM canon
    ) GROUP BY id
),
vol AS (
    SELECT l.label, COALESCE(SUM(g.d), 0) AS vol
    FROM lab l LEFT JOIN deg g ON l.id = g.id GROUP BY l.label
),
mm AS (SELECT COUNT(*) AS m FROM canon)
SELECT v.label,
       CAST(v.vol AS BIGINT) AS vol,
       CAST(COALESCE(c.cut, 0) AS BIGINT) AS cut,
       CASE WHEN LEAST(v.vol, 2 * mm.m - v.vol) > 0
            THEN ROUND(COALESCE(c.cut, 0)
                       / CAST(LEAST(v.vol, 2 * mm.m - v.vol) AS DOUBLE), 6)
            ELSE 0.0 END AS conductance
FROM vol v LEFT JOIN cut c ON v.label = c.label CROSS JOIN mm
"""


def louvain_sql(rounds: int = 4) -> str:
    """DuckDB twin of operators/louvain.py:louvain_move — synchronous
    min-label local-move rounds over the canonical simple undirected
    view with ALL-INTEGER gain scores 2m·k_in − d_i·(Σtot − d_i·[i∈c]),
    candidates restricted to community ids ≤ the vertex's own
    (Halappanavar et al.'s convergence rule), ties to the smaller
    community id. Every l{k} is referenced by four CTEs of round k+1 —
    MATERIALIZED, or DuckDB re-inlines the whole prefix per reference."""
    parts = []
    for k in range(1, rounds + 1):
        parts.append(
            f"""tot{k} AS MATERIALIZED (
    SELECT comm, SUM(d) AS tot FROM l{k - 1} GROUP BY comm
),
cand{k} AS MATERIALIZED (
    SELECT src AS id, nc, SUM(kin) AS kin FROM (
        SELECT s.src, l.comm AS nc, 1 AS kin
        FROM sym s JOIN l{k - 1} l ON s.dst = l.id
        UNION ALL
        SELECT id AS src, comm AS nc, 0 AS kin FROM l{k - 1}
    ) GROUP BY src, nc
),
l{k} AS MATERIALIZED (
    SELECT id, nc AS comm, d FROM (
        SELECT c.id, c.nc, p.d,
               ROW_NUMBER() OVER (
                   PARTITION BY c.id
                   ORDER BY 2 * mm.m * c.kin
                            - p.d * (t.tot - CASE WHEN c.nc = p.comm
                                                  THEN p.d ELSE 0 END) DESC,
                            c.nc ASC
               ) AS rn
        FROM cand{k} c
        JOIN l{k - 1} p ON c.id = p.id AND c.nc <= p.comm
        JOIN tot{k} t ON c.nc = t.comm
        CROSS JOIN mm
    ) WHERE rn = 1
)"""
        )
    return f"""
WITH {EDGES_SQL},
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
sym AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM canon
    UNION ALL
    SELECT b AS src, a AS dst FROM canon
),
mm AS MATERIALIZED (SELECT COUNT(*) AS m FROM canon),
l0 AS MATERIALIZED (
    SELECT v.id, v.id AS comm, COALESCE(g.d, 0) AS d
    FROM vertices v
    LEFT JOIN (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src) g
      ON v.id = g.id
),
{",".join(parts)}
SELECT id, comm FROM l{rounds}
"""


def featprop_sql(hops: int = 2, dims: int = 8, n_feat: int = 500) -> str:
    """DuckDB twin of operators/featprop.py:feature_propagation with the
    gate's attach policy feature(v) = embeddings[v % n_feat], truncated
    to the first ``dims`` dimensions: per hop, x[v] ← AVG of neighbor x
    over the symmetrized edge multiset, keep-own when no neighbors."""
    parts = []
    for k in range(1, hops + 1):
        parts.append(
            f"""x{k} AS MATERIALIZED (
    SELECT p.id, p.dim, COALESCE(a.nx, p.x) AS x
    FROM x{k - 1} p LEFT JOIN (
        SELECT s.dst AS id, q.dim, AVG(q.x) AS nx
        FROM sym s JOIN x{k - 1} q ON s.src = q.id
        GROUP BY s.dst, q.dim
    ) a ON p.id = a.id AND p.dim = a.dim
)"""
        )
    return f"""
WITH {EDGES_SQL},
sym AS MATERIALIZED (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
),
x0 AS MATERIALIZED (
    SELECT v.id, u.i AS dim, CAST(e.embedding[u.i + 1] AS DOUBLE) AS x
    FROM vertices v
    JOIN embeddings e ON v.id % {n_feat} = e.vec_id,
    UNNEST(generate_series(0, {dims - 1})) AS u(i)
),
{",".join(parts)}
SELECT id, dim, ROUND(x, 6) AS x FROM x{hops}
"""


def msf_sql(rounds: int = 12) -> str:
    """DuckDB twin of operators/mst.py:minimum_spanning_forest — unrolled
    Borůvka rounds over the canonical simple weighted view (parallel edges
    collapsed to their min weight), edges totally ordered by
    (weight, a, b) so the forest is unique. Each round: per-component
    argmin incident inter-component edge, then a recursive min-label
    reachability over the SELECTED pairs to merge components (the twin of
    the engine's pointer-jumped contraction)."""
    parts = []
    for k in range(1, rounds + 1):
        parts.append(
            f"""inter{k} AS MATERIALIZED (
    SELECT c.weight, c.a, c.b, la.comp AS ca, lb.comp AS cb
    FROM mcanon c
    JOIN m{k - 1} la ON c.a = la.id
    JOIN m{k - 1} lb ON c.b = lb.id
    WHERE la.comp <> lb.comp
),
sel{k} AS MATERIALIZED (
    SELECT DISTINCT weight, a, b, ca, cb FROM (
        SELECT weight, a, b, ca, cb,
               ROW_NUMBER() OVER (PARTITION BY c ORDER BY weight, a, b) AS rn
        FROM (
            SELECT ca AS c, weight, a, b, ca, cb FROM inter{k}
            UNION ALL
            SELECT cb AS c, weight, a, b, ca, cb FROM inter{k}
        )
    ) WHERE rn = 1
),
selsym{k} AS MATERIALIZED (
    SELECT ca AS src, cb AS dst FROM sel{k}
    UNION ALL
    SELECT cb AS src, ca AS dst FROM sel{k}
),
reach{k}(cid, lbl) AS (
    SELECT src AS cid, src AS lbl FROM selsym{k}
    UNION
    SELECT s.dst AS cid, r.lbl FROM selsym{k} s JOIN reach{k} r ON s.src = r.cid
),
merged{k} AS MATERIALIZED (
    SELECT cid, MIN(lbl) AS new_comp FROM reach{k} GROUP BY cid
),
m{k} AS MATERIALIZED (
    SELECT p.id, COALESCE(g.new_comp, p.comp) AS comp
    FROM m{k - 1} p LEFT JOIN merged{k} g ON p.comp = g.cid
)"""
        )
    forest_union = "\n    UNION ALL\n    ".join(
        f"SELECT a, b, weight FROM sel{k}" for k in range(1, rounds + 1)
    )
    return f"""
WITH RECURSIVE {EDGES_SQL},
mcanon AS MATERIALIZED (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, MIN(weight) AS weight
    FROM wedges WHERE src <> dst
    GROUP BY 1, 2
),
m0 AS MATERIALIZED (SELECT id, id AS comp FROM vertices),
{",".join(parts)}
SELECT a, b, weight FROM (
    {forest_union}
)
"""


def triangles_sql() -> str:
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM canon e1
JOIN canon e2 ON e1.b = e2.a
JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def bipartite_project_sql(min_count: int = 2) -> str:
    """DuckDB twin of operators/bipartite.py:bipartite_project over the
    raw lineitem (l_orderkey, l_partkey) containment relation, projected
    onto parts (uncapped — the gate's oracle-parity configuration)."""
    return f"""
WITH rel AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS l, l_partkey AS r FROM lineitem
)
SELECT x.r AS a, y.r AS b, COUNT(*) AS weight
FROM rel x JOIN rel y ON x.l = y.l AND x.r < y.r
GROUP BY x.r, y.r
HAVING COUNT(*) >= {min_count}
"""


def embeddedness_sql() -> str:
    """DuckDB twin of triangles.edge_embeddedness — common-neighbor count
    per canonical simple edge, triangle-free edges at 0."""
    return f"""
WITH {EDGES_SQL},
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
sym AS MATERIALIZED (
    SELECT a AS c, b AS n FROM canon
    UNION ALL
    SELECT b AS c, a AS n FROM canon
),
sup AS (
    SELECT e.a, e.b, COUNT(*) AS sup
    FROM canon e
    JOIN sym s1 ON s1.c = e.a
    JOIN sym s2 ON s2.c = e.b AND s2.n = s1.n
    GROUP BY e.a, e.b
)
SELECT c.a, c.b, CAST(COALESCE(s.sup, 0) AS BIGINT) AS embeddedness
FROM canon c LEFT JOIN sup s ON c.a = s.a AND c.b = s.b
"""


def triangles_estimate_sql(rate: float = 0.25, seed: int = 42) -> str:
    """DuckDB twin of triangles.triangle_count_estimate — the same
    md5-threshold canonical-edge sample, exact triangle count on it,
    scaled by 1/p³."""
    t = int(rate * float(1 << 60))
    h = _md5_60_duck(f"'tsamp:{seed}:' || CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)")
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
kept AS MATERIALIZED (SELECT a, b FROM canon WHERE {h} < {t}),
cnt AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS sampled_triangles
    FROM kept e1
    JOIN kept e2 ON e1.b = e2.a
    JOIN kept e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT sampled_triangles,
       ROUND(sampled_triangles / {float(rate) ** 3!r}, 6) AS estimate
FROM cnt
"""


def bfs_sql(root: int = 0, max_depth: int = 256) -> str:
    """``max_depth`` bounds the recursive walk; it must exceed the graph's
    true BFS eccentricity from ``root`` or the oracle silently truncates.
    The derive.py gate graph is a hashy near-random digraph over V=2048
    with ~12 distinct out-neighbors per vertex — diameter ~4; 256 is a
    >40x margin, asserted against the engine in
    tests/test_oracle_bounds.py."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(id, dist) AS (
    SELECT CAST({root} AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
    UNION
    SELECT e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_depth}
)
SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
"""


def sssp_sql(root: int = 0, cost_cap: int = 2000) -> str:
    """``cost_cap`` prunes the recursive walk; it must exceed the true
    max shortest distance from ``root`` or the oracle silently truncates.
    Bound for the derive.py gate graph: weights are src%10 + dst%10 ≤ 18
    (graph.synthetic_weight, reference init_all.c:661-667) and the BFS
    eccentricity is ~4 (see bfs_sql), so true distances are ≲ 72;
    2000 is a >25x margin, asserted against the engine in
    tests/test_oracle_bounds.py. If derive.py's weight rule or vertex
    count changes, re-derive this cap."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(id, dist) AS (
    SELECT CAST({root} AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
    UNION
    SELECT e.dst AS id, w.dist + CAST(e.weight AS BIGINT) AS dist
    FROM wedges e JOIN walk w ON e.src = w.id
    WHERE e.src <> e.dst AND w.dist + e.weight <= {cost_cap}
)
SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
"""


def spmv_sql() -> str:
    return f"""
WITH {EDGES_SQL}
SELECT v.id, ROUND(COALESCE(y.y, 0.0), 6) AS y
FROM vertices v
LEFT JOIN (
    SELECT dst AS id, SUM(0.001 * CAST(src AS DOUBLE)) AS y
    FROM edges GROUP BY dst
) y ON v.id = y.id
"""


# ----------------------------------------------------------------- documents
def minhash_pairs_sql(
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    seed: int = 42,
    max_bucket_size: int | None = 10_000,
) -> str:
    est_terms = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
WITH {_minhash_ctes(num_hashes, bands, k, seed, max_bucket_size)}
SELECT p.doc_a, p.doc_b,
       ROUND(CAST({est_terms} AS DOUBLE) / {float(num_hashes)}, 6) AS est_jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_a
JOIN sig sb ON sb.doc_id = p.doc_b
"""


def simhash_sql(bits: int = 60) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH tk AS (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
    FROM documents
),
hashed AS (SELECT doc_id, {_md5_60_duck('tok')} AS h FROM tk),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


def dedup_clusters_sql(
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    seed: int = 42,
    min_jaccard: float = 0.6,
    max_bucket_size: int | None = 10_000,
) -> str:
    """Candidates (minhash LSH) → exact-jaccard verify → recursive-CTE
    connected components → keep-list — the DuckDB twin of
    docs.dedup_clusters."""
    return f"""
WITH RECURSIVE {_minhash_ctes(num_hashes, bands, k, seed, max_bucket_size)},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.x = b.x AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
verified AS (
    SELECT p.doc_a, p.doc_b
    FROM pairs p
    JOIN inter ON inter.doc_a = p.doc_a AND inter.doc_b = p.doc_b
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= {min_jaccard}
),
sym AS (
    SELECT doc_a AS src, doc_b AS dst FROM verified
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM verified
),
reach(id, lbl) AS (
    SELECT src, src FROM sym
    UNION
    SELECT s.dst AS id, r.lbl FROM sym s JOIN reach r ON s.src = r.id
),
comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


def repetition_stats_sql(n: int = 2) -> str:
    """DuckDB twin of docs.repetition_stats — same shingle stream
    (duplicates KEPT), two aggregates, zero-gram docs report 0.0."""
    ngram = f"array_to_string(t[i+1:i+{n}], ' ')"
    return f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t FROM documents
),
ng AS (
    SELECT doc_id, {ngram} AS s
    FROM toks, UNNEST(generate_series(0, greatest(len(t)-{n}, 0))) AS u(i)
),
grp AS (SELECT doc_id, s, COUNT(*) AS c FROM ng GROUP BY doc_id, s),
per AS (
    SELECT doc_id, SUM(c) AS total, COUNT(*) AS dist, MAX(c) AS topc
    FROM grp GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.total, 0) AS BIGINT) AS n_ngrams,
       CASE WHEN p.total > 0
            THEN ROUND((p.total - p.dist) / CAST(p.total AS DOUBLE), 6)
            ELSE 0.0 END AS dup_ngram_frac,
       CASE WHEN p.total > 0
            THEN ROUND(p.topc / CAST(p.total AS DOUBLE), 6)
            ELSE 0.0 END AS top_ngram_frac
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def decontaminate_sql(k: int = 8, probe_mod: int = 17) -> str:
    """DuckDB twin of docs.decontaminate with probes = the gate corpus
    slice doc_id % probe_mod == 0 (the gate has no separate benchmark
    table, so the probe set is a deterministic subset — the operator
    itself takes any probe DataFrame)."""
    return f"""
WITH {_shingles_cte(k)},
probe AS (SELECT DISTINCT x FROM sh WHERE doc_id % {probe_mod} = 0),
flagged AS (SELECT DISTINCT s.doc_id FROM sh s JOIN probe p ON s.x = p.x)
SELECT d.doc_id, f.doc_id IS NOT NULL AS contaminated
FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
"""


def docs_dedup_sql() -> str:
    return """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n
FROM documents GROUP BY text
"""


def docs_token_stats_sql() -> str:
    stop_list = "'the','of','and','a','to','in','is','it','that','for'"
    # DuckDB (RE2) twins of docs._BPE_REGEX / the ASCII-punct class; both
    # engines' regex dialects agree on these ASCII-anchored patterns.
    # The whitespace class is explicit (not \s): Java's \s matches \x0B,
    # RE2's does not — docs._BPE_REGEX carries the identical class.
    # the leading apostrophe (contraction tails) is doubled for the SQL literal
    bpe = "''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]+"
    punct = "[^!-/:-@\\[-`{-~]"
    return f"""
WITH toks AS (
    SELECT doc_id, text, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
    FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{bpe}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       ROUND(CAST(list_sum(list_transform(t, s -> length(s))) AS DOUBLE)
             / NULLIF(CAST(len(t) AS DOUBLE), 0.0), 6) AS mean_token_len,
       ROUND(CAST(len(list_filter(t, s -> s IN ({stop_list}))) AS DOUBLE)
             / NULLIF(CAST(len(t) AS DOUBLE), 0.0), 6) AS stopword_ratio,
       ROUND(CAST(length(regexp_replace(text, '{punct}', '', 'g')) AS DOUBLE)
             / NULLIF(CAST(length(text) AS DOUBLE), 0.0), 6) AS punct_ratio
FROM toks
"""


def quality_filter_sql(
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.0,
) -> str:
    """DuckDB twin of docs.quality_filter — the token_stats CTE with the
    same keep predicate (an empty text tokenizes to [''] in both
    engines, so n_tokens is never 0 and keep is never NULL)."""
    return f"""
WITH stats AS ({docs_token_stats_sql()})
SELECT doc_id,
       (n_tokens >= {min_tokens} AND n_tokens <= {max_tokens}
        AND mean_token_len >= {min_mean_token_len}
        AND mean_token_len <= {max_mean_token_len}
        AND punct_ratio <= {max_punct_ratio}
        AND stopword_ratio >= {min_stopword_ratio}) AS keep
FROM stats
"""


def tfidf_sql(top_k: int = 5) -> str:
    """DuckDB twin of docs.tf_idf_top_terms: same whitespace tokenizer
    (the token_stats twin), tf·ln(N/df) rounded to 6 dp BEFORE the
    QUALIFY ranking so the k-boundary order matches the engine exactly."""
    return f"""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM toks WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT t.doc_id, t.term, t.tf,
       ROUND(t.tf * LN(n.n * 1.0 / d.df), 6) AS tfidf
FROM tf t JOIN dfreq d ON t.term = d.term, n
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY t.doc_id
    ORDER BY ROUND(t.tf * LN(n.n * 1.0 / d.df), 6) DESC, t.term ASC
) <= {int(top_k)}
"""


def chunk_documents_sql(chunk_tokens: int = 100, overlap: int = 0) -> str:
    """DuckDB twin of docs.chunk_documents: same whitespace tokenizer,
    same 1-based slice arithmetic (list_slice is inclusive-1-based, so
    the end index is start + chunk − 1)."""
    stride = chunk_tokens - overlap
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                       s -> s <> '') AS tt
    FROM documents
),
ch AS (
    SELECT doc_id,
           unnest(CASE WHEN len(tt) = 0 THEN [] ELSE
               list_transform(range(1, 2 + GREATEST(0,
                       CAST(floor((len(tt) - {chunk_tokens} + {stride - 1})
                                  * 1.0 / {stride}) AS INT))),
                   i -> struct_pack(
                       chunk_id := CAST(i - 1 AS BIGINT),
                       toks := list_slice(tt, (i - 1) * {stride} + 1,
                                          (i - 1) * {stride} + {chunk_tokens})))
           END) AS c
    FROM toks
)
SELECT doc_id,
       c.chunk_id AS chunk_id,
       CAST(len(c.toks) AS BIGINT) AS n_tokens,
       array_to_string(c.toks, ' ') AS chunk_text
FROM ch
"""


def pack_windows_sql(window_tokens: int = 2048) -> str:
    """DuckDB twin of docs.pack_windows — single-node, so the two-level
    prefix sum collapses to one SUM OVER (ORDER BY doc_id); identical
    integer arithmetic."""
    w = int(window_tokens)
    return f"""
WITH toks AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                                s -> s <> '')) AS BIGINT) AS n
    FROM documents
),
spans AS (
    SELECT doc_id, n,
           COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
    FROM toks WHERE n > 0
),
hit AS (
    SELECT doc_id, n, start,
           unnest(range(CAST(floor(start / {w}) AS BIGINT),
                        CAST(floor((start + n - 1) / {w}) AS BIGINT) + 1)) AS window_id
    FROM spans
)
SELECT window_id, doc_id,
       CAST(LEAST({w} * (window_id + 1), start + n)
            - GREATEST({w} * window_id, start) AS BIGINT) AS n_tokens
FROM hit
"""


def pii_scrub_sql() -> str:
    """DuckDB twin of docs.pii_scrub — identical ASCII-anchored patterns
    (imported from docs.py so the two engines cannot drift), same
    email → URL → IP rewrite order, counts over the original text."""
    from linkgraph.docs import PII_EMAIL, PII_IP, PII_URL

    return f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{PII_EMAIL}', '<EMAIL>', 'g'),
      '{PII_URL}', '<URL>', 'g'),
      '{PII_IP}', '<IP>', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PII_URL}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(text, '{PII_IP}')) AS BIGINT) AS n_ips
FROM documents
"""


def lm_cross_entropy_sql(alpha: float = 0.5) -> str:
    """DuckDB twin of docs.lm_cross_entropy: same whitespace tokenizer,
    in-list bigram construction (1-based list indexing in both engines
    via element_at / tt[i]), identical add-α smoothing."""
    a = float(alpha)
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                       s -> s <> '') AS tt
    FROM documents
),
bigf AS (
    SELECT doc_id, u.bg.w1 AS w1, u.bg.w2 AS w2 FROM (
        SELECT doc_id, unnest(CASE WHEN len(tt) >= 2
            THEN list_transform(range(2, len(tt) + 1),
                                i -> struct_pack(w1 := tt[i-1], w2 := tt[i]))
            ELSE [] END) AS bg
        FROM toks) u
),
tf AS MATERIALIZED (
    SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM bigf GROUP BY doc_id, w1, w2
),
c2 AS (SELECT w1, w2, SUM(cnt) AS c2 FROM tf GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT s) AS v FROM (SELECT unnest(tt) AS s FROM toks)),
scored AS (
    -- count-WEIGHTED form, identical to the engine's (≡ per-instance mean)
    SELECT b.doc_id, b.cnt,
           LN((c2.c2 + {a}) / (c1.c1 + {a} * vocab.v)) AS lp
    FROM tf b JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
    JOIN c1 ON b.w1 = c1.w1, vocab
)
SELECT d.doc_id,
       COALESCE(s.nb, 0) AS n_bigrams,
       COALESCE(s.ce, 0.0) AS cross_entropy
FROM documents d LEFT JOIN (
    SELECT doc_id, SUM(cnt) AS nb,
           ROUND(-SUM(cnt * lp) / SUM(cnt), 6) AS ce
    FROM scored GROUP BY doc_id
) s ON d.doc_id = s.doc_id
"""


def pmi_sql(min_count: int = 5, top_k: int = 30) -> str:
    """DuckDB twin of docs.pmi_collocations — same whitespace tokenizer,
    same in-list bigram construction as lm_cross_entropy_sql, the
    IDENTICAL division shape (cnt/nb) / ((c1/nu)·(c2/nu)) so libm sees
    the same doubles, 6-dp round BEFORE the (pmi DESC, w1, w2) rank."""
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                       s -> s <> '') AS tt
    FROM documents
),
bigf AS (
    SELECT u.bg.w1 AS w1, u.bg.w2 AS w2 FROM (
        SELECT unnest(CASE WHEN len(tt) >= 2
            THEN list_transform(range(2, len(tt) + 1),
                                i -> struct_pack(w1 := tt[i-1], w2 := tt[i]))
            ELSE [] END) AS bg
        FROM toks) u
),
bi AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS cnt FROM bigf GROUP BY w1, w2),
uni AS MATERIALIZED (
    SELECT w, COUNT(*) AS c FROM (SELECT unnest(tt) AS w FROM toks) GROUP BY w
),
tot AS (
    SELECT (SELECT CAST(SUM(cnt) AS DOUBLE) FROM bi) AS nb,
           (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS nu
)
SELECT b.w1, b.w2, b.cnt,
       ROUND(LN((b.cnt / t.nb) / ((u1.c / t.nu) * (u2.c / t.nu))), 6) AS pmi
FROM bi b JOIN uni u1 ON b.w1 = u1.w JOIN uni u2 ON b.w2 = u2.w CROSS JOIN tot t
WHERE b.cnt >= {min_count}
ORDER BY pmi DESC, w1, w2 LIMIT {top_k}
"""


def _bpe_ctes(merges: int) -> str:
    """Shared CTE chain for bpe_sql / bpe_counts_sql — unrolled merge
    rounds ending in st{merges} (word, cnt, final symbol list) and
    best1..best{merges} (the learned rules). The engine's greedy-left
    in-array fold is rewritten as the island-parity rule: within each
    maximal run of consecutive pair-match positions (runs longer than 1
    only occur when lhs = rhs), merge exactly the even offsets from the
    run start — provably the same positions the sequential left-to-right
    scan merges. Every round CTE is AS MATERIALIZED (multi-referenced;
    the hits_sql re-inline hazard)."""
    parts = [
        """wc AS MATERIALIZED (
    SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(list_filter(
            string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
            s -> s <> '')) AS word
        FROM documents)
    GROUP BY word
),
st0 AS MATERIALIZED (
    SELECT word, cnt,
           list_transform(generate_series(1, length(word)),
                          i -> substr(word, i, 1)) AS s
    FROM wc
)"""
    ]
    for k in range(1, merges + 1):
        parts.append(
            f"""best{k} AS MATERIALIZED (
    SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c FROM (
        SELECT s[i] AS a, s[i + 1] AS b, cnt
        FROM st{k - 1}, UNNEST(generate_series(1, len(s) - 1)) AS u(i)
        WHERE len(s) >= 2
    ) GROUP BY a, b
    ORDER BY c DESC, a, b LIMIT 1
),
pos{k} AS (
    SELECT t.word, t.cnt, u.i, t.s[u.i] AS sym, bb.a AS ba, bb.b AS bb2,
           CASE WHEN u.i < len(t.s) AND t.s[u.i] = bb.a
                 AND t.s[u.i + 1] = bb.b THEN 1 ELSE 0 END AS m
    FROM st{k - 1} t CROSS JOIN best{k} bb,
         UNNEST(generate_series(1, len(t.s))) AS u(i)
),
mrg{k} AS MATERIALIZED (
    SELECT word, cnt, i, sym, ba, bb2,
           CASE WHEN m = 1
                 AND (i - MIN(i) OVER (PARTITION BY word, m, grp)) % 2 = 0
                THEN 1 ELSE 0 END AS do_merge
    FROM (SELECT *,
                 i - ROW_NUMBER() OVER (PARTITION BY word, m ORDER BY i) AS grp
          FROM pos{k})
),
st{k} AS MATERIALIZED (
    SELECT word, cnt,
           list(CASE WHEN do_merge = 1 THEN ba || bb2 ELSE sym END ORDER BY i) AS s
    FROM (SELECT *,
                 LAG(do_merge, 1, 0) OVER (PARTITION BY word ORDER BY i) AS consumed
          FROM mrg{k})
    WHERE consumed = 0
    GROUP BY word, cnt
)"""
        )
    return ",".join(parts)


def bpe_sql(merges: int = 8) -> str:
    """DuckDB twin of docs.bpe_train — the learned rules from the shared
    unrolled chain (_bpe_ctes)."""
    finals = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, a AS lhs, b AS rhs, c AS cnt FROM best{k}"
        for k in range(1, merges + 1)
    )
    return f"""
WITH {_bpe_ctes(merges)}
{finals}
"""


def bpe_counts_sql(merges: int = 8) -> str:
    """DuckDB twin of docs.bpe_token_counts — per-doc Σ n(word)·len(bpe
    word) over the shared chain's final symbol table."""
    return f"""
WITH {_bpe_ctes(merges)},
inst AS (
    SELECT doc_id, word, COUNT(*) AS n FROM (
        SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
            s -> s <> '')) AS word
        FROM documents)
    GROUP BY doc_id, word
),
per_doc AS (
    SELECT i.doc_id, CAST(SUM(i.n * len(st.s)) AS BIGINT) AS n_tokens
    FROM inst i JOIN st{merges} st ON i.word = st.word
    GROUP BY i.doc_id
)
SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def quality_clf_sql(
    label_predicate: str = "lang = 'en'",
    steps: int = 3,
    lr: float = 1.0,
    buckets: int = 512,
    l2: float = 0.0,
) -> str:
    """DuckDB twin of docs.quality_classifier — unrolled full-batch GD
    steps over the same md5-60 hashed features (intercept = bucket −1),
    the IDENTICAL sigmoid/gradient/update expression shapes, 6-dp round
    on the final score only."""
    b, rate, lam = int(buckets), float(lr), float(l2)
    parts = [
        f"""toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                       s -> s <> '') AS tt
    FROM documents
),
tb AS (
    SELECT doc_id, {_md5_60_duck("w")} % {b} AS bucket
    FROM (SELECT doc_id, unnest(tt) AS w FROM toks)
),
feats AS MATERIALIZED (
    SELECT c.doc_id, c.bucket, c.n / l.len AS x
    FROM (SELECT doc_id, bucket, COUNT(*) AS n FROM tb GROUP BY doc_id, bucket) c
    JOIN (SELECT doc_id, COUNT(*) AS len FROM tb GROUP BY doc_id) l
      ON c.doc_id = l.doc_id
    UNION ALL
    SELECT doc_id, CAST(-1 AS BIGINT) AS bucket, 1.0 AS x FROM documents
),
labels AS MATERIALIZED (
    SELECT doc_id, CASE WHEN {label_predicate} THEN 1.0 ELSE 0.0 END AS y
    FROM documents
),
nn AS (SELECT COUNT(*) AS n FROM documents),
w0 AS MATERIALIZED (SELECT DISTINCT bucket, 0.0 AS w FROM feats)"""
    ]
    for k in range(1, steps + 1):
        parts.append(
            f"""m{k} AS (
    SELECT f.doc_id, SUM(f.x * w.w) AS m
    FROM feats f JOIN w{k - 1} w ON f.bucket = w.bucket GROUP BY f.doc_id
),
r{k} AS MATERIALIZED (
    SELECT l.doc_id, (1.0 / (1.0 + EXP(-m.m)) - l.y) AS r
    FROM labels l JOIN m{k} m ON l.doc_id = m.doc_id
),
g{k} AS (
    SELECT f.bucket, SUM(f.x * r.r) / nn.n AS g
    FROM feats f JOIN r{k} r ON f.doc_id = r.doc_id CROSS JOIN nn
    GROUP BY f.bucket, nn.n
),
w{k} AS MATERIALIZED (
    SELECT w.bucket, w.w - {rate!r} * (COALESCE(g.g, 0.0) + {lam!r} * w.w) AS w
    FROM w{k - 1} w LEFT JOIN g{k} g ON w.bucket = g.bucket
)"""
        )
    return f"""
WITH {",".join(parts)},
mf AS (
    SELECT f.doc_id, SUM(f.x * w.w) AS m
    FROM feats f JOIN w{steps} w ON f.bucket = w.bucket GROUP BY f.doc_id
)
SELECT doc_id, ROUND(1.0 / (1.0 + EXP(-m)), 6) AS score FROM mf
"""


def dsir_sql(
    target_predicate: str = "lang = 'en'",
    keep: int = 100,
    buckets: int = 4096,
    seed: int = 42,
) -> str:
    """DuckDB twin of docs.dsir_resample — same md5-60 token bucketing,
    same add-1 smoothed bucket models with the IDENTICAL division shape,
    same rounded-logw-then-Gumbel key, same (key DESC, doc_id) top-k."""
    b = int(buckets)
    two60 = float((1 << 60) + 1)
    salt = f"concat('dsir:{int(seed)}:', CAST(doc_id AS VARCHAR))"
    u = f"(({_md5_60_duck(salt)}) + 1) / {two60!r}"
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                       s -> s <> '') AS tt
    FROM documents
),
nb AS MATERIALIZED (
    SELECT doc_id, {_md5_60_duck("w")} % {b} AS bucket, COUNT(*) AS n
    FROM (SELECT doc_id, unnest(tt) AS w FROM toks)
    GROUP BY doc_id, bucket
),
raw AS (SELECT bucket, SUM(n) AS cr FROM nb GROUP BY bucket),
tgt AS (
    SELECT nb.bucket, SUM(nb.n) AS ct
    FROM nb JOIN (SELECT doc_id FROM documents WHERE {target_predicate}) t
      ON nb.doc_id = t.doc_id
    GROUP BY nb.bucket
),
model AS MATERIALIZED (
    SELECT r.bucket, r.cr, COALESCE(t.ct, 0) AS ct
    FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket
),
tot AS (
    SELECT (SELECT SUM(cr) FROM model) AS nr,
           (SELECT SUM(ct) FROM model) AS nt
),
lw AS (
    SELECT nb.doc_id,
           ROUND(SUM(nb.n * (LN((m.ct + 1) / (tot.nt + {b}))
                           - LN((m.cr + 1) / (tot.nr + {b})))), 6) AS logw
    FROM nb JOIN model m ON nb.bucket = m.bucket CROSS JOIN tot
    GROUP BY nb.doc_id
),
dense AS (
    SELECT d.doc_id, COALESCE(l.logw, 0.0) AS logw
    FROM documents d LEFT JOIN lw l ON d.doc_id = l.doc_id
)
SELECT doc_id, logw,
       ROUND(logw - LN(-LN({u})), 6) AS key
FROM dense
ORDER BY key DESC, doc_id LIMIT {int(keep)}
"""


def docs_sample_sql(rate: float = 0.25, seed: int = 42) -> str:
    """DuckDB twin of docs.sample_documents — same md5-60 threshold on
    the same salt string, so the selected set is identical by
    construction."""
    threshold = int(rate * float(1 << 60))
    inner = f"concat('samp:{seed}:', CAST(doc_id AS VARCHAR))"
    return f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE {_md5_60_duck(inner)} < {threshold}
"""


def ngram_jaccard_sql(k: int = 5, min_jaccard: float = 0.5) -> str:
    return f"""
WITH {_shingles_cte(k)},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.x = b.x AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= {min_jaccard}
"""


def containment_sql(k: int = 5, min_containment: float = 0.8) -> str:
    """DuckDB twin of docs.containment_pairs — same inverted-index join,
    asymmetric |A∩B|/|A| and |A∩B|/|B|, filter on the ROUNDED greatest
    (matching the engine's post-round filter exactly)."""
    return f"""
WITH {_shingles_cte(k)},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.x = b.x AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, c_ab, c_ba FROM (
    SELECT doc_a, doc_b,
           ROUND(CAST(i AS DOUBLE) / sa.sz, 6) AS c_ab,
           ROUND(CAST(i AS DOUBLE) / sb.sz, 6) AS c_ba
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
)
WHERE GREATEST(c_ab, c_ba) >= {min_containment}
"""


def knn_classify_sql(query_ids: list[int], k: int = 10) -> str:
    """DuckDB twin of similarity.knn_classify: per query, exact cosine
    against all other rows, 6-dp round BEFORE the rank window (the
    engine-stable k boundary), modal label with smaller-label tie-break."""
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id IN ({ids})
),
scored AS (
    SELECT q.query_id, e.vec_id, e.label,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS sim
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
),
top AS (
    SELECT query_id, label FROM (
        SELECT query_id, label,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, vec_id ASC
               ) AS rn
        FROM scored
    ) WHERE rn <= {k}
),
votes AS (
    SELECT query_id, label, COUNT(*) AS votes
    FROM top GROUP BY query_id, label
)
SELECT query_id, label AS pred_label, votes FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY votes DESC, label ASC
    ) AS rn FROM votes
) WHERE rn = 1
"""


def props_rollup_sql(field: str = "k") -> str:
    """DuckDB twin of events.props_rollup: JSON property extraction +
    per-type aggregate. TRY_CAST mirrors Spark's null-on-miss cast."""
    return f"""
SELECT event_type,
       COUNT(*) AS n,
       SUM(pv) AS sum_v,
       ROUND(AVG(pv), 6) AS avg_v
FROM (
    SELECT event_type,
           TRY_CAST(json_extract_string(props, '$.{field}') AS BIGINT) AS pv
    FROM events
)
WHERE pv IS NOT NULL
GROUP BY event_type
"""


def knn_cosine_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (
    SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id}
)
SELECT vec_id, sim FROM (
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS sim
    FROM embeddings e, q
    WHERE e.vec_id <> {query_vec_id}
)
ORDER BY sim DESC, vec_id ASC LIMIT {k}
"""


def lsh_knn_sql(
    query_vec_id: int = 0,
    k: int = 10,
    num_bits: int = 4,
    dim: int = 64,
    seed: int = 42,
    num_bands: int = 1,
) -> str:
    """DuckDB twin of similarity.lsh_cosine_topk: the md5-seeded plane
    matrix (similarity.plane_matrix — same function the Spark UDF uses)
    is inlined as float64 literals; bucket = sum of sign bits; exact
    cosine among rows sharing the query's bucket in ANY band
    (OR-amplification). ``dim`` must match the embeddings table (the gate
    table is 64-dim; the Spark UDF raises on mismatch, so drift fails
    loudly on the engine side first)."""
    bcols = ", ".join(
        f"{_bucket_expr_duck(num_bits, dim, seed, band, num_bands)} AS b{band}"
        for band in range(num_bands)
    )
    any_band = " OR ".join(f"e.b{band} = q.b{band}" for band in range(num_bands))
    return f"""
WITH b AS (
    SELECT vec_id, embedding, {bcols}
    FROM embeddings
),
q AS (
    SELECT {', '.join(f'b{band}' for band in range(num_bands))},
           embedding::DOUBLE[] AS qv
    FROM b WHERE vec_id = {query_vec_id}
)
SELECT vec_id, sim FROM (
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS sim
    FROM b e, q
    WHERE e.vec_id <> {query_vec_id} AND ({any_band})
)
ORDER BY sim DESC, vec_id ASC LIMIT {k}
"""


def lsh_knn_batch_sql(
    qids: "list[int]",
    k: int = 5,
    num_bits: int = 4,
    dim: int = 64,
    seed: int = 42,
    num_bands: int = 1,
) -> str:
    """DuckDB twin of similarity.lsh_topk_batch (score='sql'): all Q
    queries answered in one statement — per-band buckets from the same
    inlined md5-seeded planes, OR-of-bands candidate join, each query's
    own row excluded, ROW_NUMBER top-k per query."""
    bcols = ", ".join(
        f"{_bucket_expr_duck(num_bits, dim, seed, band, num_bands)} AS b{band}"
        for band in range(num_bands)
    )
    any_band = " OR ".join(f"e.b{band} = q.b{band}" for band in range(num_bands))
    qlist = ", ".join(str(int(q)) for q in qids)
    return f"""
WITH b AS (
    SELECT vec_id, embedding, {bcols}
    FROM embeddings
),
q AS (
    SELECT vec_id AS qid,
           {', '.join(f'b{band}' for band in range(num_bands))},
           embedding::DOUBLE[] AS qv
    FROM b WHERE vec_id IN ({qlist})
),
cand AS (
    SELECT q.qid, e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS sim
    FROM b e JOIN q ON ({any_band}) AND e.vec_id <> q.qid
)
SELECT qid, vec_id, sim, rank FROM (
    SELECT qid, vec_id, sim,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY sim DESC, vec_id ASC
           ) AS BIGINT) AS rank
    FROM cand
)
WHERE rank <= {k}
"""


def _bucket_expr_duck(
    num_bits: int, dim: int, seed: int, band: int = 0, num_bands: int = 1
) -> str:
    """DuckDB hyperplane-bucket expression for one band, with the plane
    matrix inlined as float64 literals (same similarity.plane_matrix
    values; band b = rows [b·num_bits, (b+1)·num_bits) of the taller
    matrix, exactly as similarity._band_buckets_udf slices it)."""
    from linkgraph.similarity import plane_matrix

    planes = plane_matrix(num_bits * num_bands, dim, seed)
    terms = []
    for p in range(num_bits):
        lits = ", ".join(repr(float(x)) for x in planes[band * num_bits + p])
        terms.append(
            f"(CASE WHEN list_inner_product(embedding::DOUBLE[], [{lits}]) >= 0.0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


def cosine_dup_pairs_sql(
    min_sim: float = 0.3,
    num_bits: int = 4,
    dim: int = 64,
    seed: int = 42,
    num_bands: int = 1,
) -> str:
    """DuckDB twin of similarity.cosine_dup_pairs (no bucket cap at gate
    scale — buckets are ~30 rows): a pair qualifies by sharing a bucket
    in ANY band, scored once."""
    bcols = ", ".join(
        f"{_bucket_expr_duck(num_bits, dim, seed, band, num_bands)} AS b{band}"
        for band in range(num_bands)
    )
    any_band = " OR ".join(f"x.b{band} = y.b{band}" for band in range(num_bands))
    return f"""
WITH bk AS (
    SELECT vec_id, embedding, {bcols}
    FROM embeddings
)
SELECT vec_a, vec_b, sim FROM (
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           ROUND(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) AS sim
    FROM bk x JOIN bk y ON ({any_band}) AND x.vec_id < y.vec_id
)
WHERE sim >= {min_sim}
"""


def semantic_dedup_sql(num_centroids: int = 16, min_sim: float = 0.3) -> str:
    """DuckDB twin of similarity.semantic_dedup with lloyd_iters=0: md5-
    seeded centroids (the ivf_knn_sql seed CTE), argmax-cosine cell
    assignment with ties to the smaller cid, within-cell pairs at 6-dp
    cosine ≥ min_sim, recursive-CTE min-label components, keep-list over
    the full vector set."""
    return f"""
WITH RECURSIVE seeds AS (
    SELECT embedding::DOUBLE[] AS cvec,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
    FROM embeddings
    QUALIFY cid < {num_centroids}
),
assign AS MATERIALIZED (
    SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, s.cid,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], s.cvec), 6) AS csim
        FROM embeddings e CROSS JOIN seeds s
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) = 1
),
pairs AS (
    SELECT doc_a, doc_b FROM (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
        FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    WHERE sim >= {min_sim}
),
sym AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, lbl) AS (
    SELECT src, src FROM sym
    UNION
    SELECT s.dst AS id, r.lbl FROM sym s JOIN reach r ON s.src = r.id
),
comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
SELECT e.vec_id,
       COALESCE(c.cluster_id, e.vec_id) AS cluster_id,
       e.vec_id = COALESCE(c.cluster_id, e.vec_id) AS keep
FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
"""


def kcore_sql(k: int = 5, rounds: int = 8) -> str:
    """DuckDB twin of operators.kcore.k_core: ``rounds`` unrolled peel
    rounds (degree filter + both-endpoint edge prune). Rounds past the
    fixpoint are no-ops, so any ``rounds`` ≥ the true peeling depth is
    exact — the gate graphs converge in ≤ 3 rounds (measured at sf0.001
    and sf0.01); 8 leaves margin, and the ENGINE side runs to an actual
    fixpoint and raises if it fails to converge, so a hypothetical
    deeper-peeling gate graph would fail loudly, not silently."""
    parts = [
        """canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
e0 AS (
    SELECT a AS src, b AS dst FROM canon
    UNION ALL
    SELECT b AS src, a AS dst FROM canon
)"""
    ]
    for r in range(1, rounds + 1):
        # AS MATERIALIZED: each round references the previous one three
        # times (degree filter + two endpoint joins) — inlining would
        # re-evaluate the chain 3^rounds times
        parts.append(
            f"""k{r} AS MATERIALIZED (SELECT src FROM e{r - 1} GROUP BY src HAVING COUNT(*) >= {k}),
e{r} AS MATERIALIZED (
    SELECT e.src, e.dst FROM e{r - 1} e
    JOIN k{r} x ON e.src = x.src
    JOIN k{r} y ON e.dst = y.src
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT src AS id, COUNT(*) AS core_deg FROM e{rounds} GROUP BY src
"""


def mis_sql(seed: int = 42, rounds: int = 10) -> str:
    """DuckDB twin of operators.mis.maximal_independent_set: ``rounds``
    unrolled Luby rounds on the fixed md5-60 priority order (winners =
    local (p, id) minima among alive neighbors; winners + their
    neighborhoods retire). Rounds past exhaustion are no-ops, so any
    ``rounds`` ≥ the true depth is exact — measured depth is 3 (sf0.001)
    / 7 (sf0.01); 10 leaves margin, and the ENGINE runs to an empty
    alive set and raises if it fails to converge."""
    pri = _md5_60_duck(f"'mis:{int(seed)}:' || CAST(id AS VARCHAR)")
    parts = [
        """canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
sym AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM canon
    UNION ALL SELECT b AS src, a AS dst FROM canon
)""",
        f"a0 AS MATERIALIZED (SELECT id, {pri} AS p FROM vertices)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""w{r} AS MATERIALIZED (
    SELECT a.id FROM a{r - 1} a
    WHERE NOT EXISTS (
        SELECT 1 FROM sym e JOIN a{r - 1} b ON e.dst = b.id
        WHERE e.src = a.id AND (b.p < a.p OR (b.p = a.p AND b.id < a.id))
    )
),
a{r} AS MATERIALIZED (
    SELECT a.id, a.p FROM a{r - 1} a
    WHERE NOT EXISTS (SELECT 1 FROM w{r} w WHERE w.id = a.id)
      AND NOT EXISTS (
        SELECT 1 FROM sym e JOIN w{r} w ON e.dst = w.id WHERE e.src = a.id
      )
)"""
        )
    union = "\n    UNION ALL ".join(f"SELECT id FROM w{r}" for r in range(1, rounds + 1))
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT v.id, (m.id IS NOT NULL) AS in_mis
FROM vertices v LEFT JOIN ({union}) m ON v.id = m.id
"""


def matching_sql(seed: int = 42, rounds: int = 12) -> str:
    """DuckDB twin of operators.matching.maximal_matching: ``rounds``
    unrolled greedy rounds on the fixed md5-60 edge-priority order
    (winners = (p, a, b)-minima among edges sharing an endpoint; matched
    stars retire). Rounds past exhaustion are no-ops, so any ``rounds``
    ≥ the true depth is exact — measured depth is 4 (sf0.001) / 9
    (sf0.01); 12 leaves margin, and the ENGINE runs to an empty alive
    set and raises if it fails to converge."""
    pri = _md5_60_duck(
        f"'match:{int(seed)}:' || CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)"
    )
    return _greedy_matching_sql(pri, rounds, "SELECT a, b FROM matched")


def weighted_matching_sql(rounds: int = 56) -> str:
    """DuckDB twin of operators.matching.maximal_weight_matching: the same
    unrolled greedy rounds, priority = (18 − weight) packed above 56
    md5 hash bits (weight DESC, hash tie-break — the engine's exact
    key). 19 distinct weight levels stack domination chains (measured
    depth 38 at sf0.01 vs 9 for the pure-hash order), so the unroll
    carries extra margin — rounds past exhaustion are no-ops."""
    h = _md5_60_duck("'wmatch:' || CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)")
    return _greedy_matching_sql(
        f"(CAST(18 - (a % 10 + b % 10) AS BIGINT) * (1::BIGINT << 56) + ({h}) // 16)",
        rounds,
        "SELECT a, b, CAST(a % 10 + b % 10 AS BIGINT) AS weight FROM matched",
    )


def _greedy_matching_sql(pri: str, rounds: int, tail_select: str) -> str:
    """Shared unroll for the greedy-matching twins. Each round mirrors the
    engine's aggregation plan rather than a correlated NOT EXISTS (the
    quadratic edge×edge scan took 300+ s at 56 rounds on sf0.01; this
    per-vertex MIN + anti-join form runs in seconds): explode alive
    edges to endpoint incidence, take each vertex's lexicographic-min
    (p, a, b) struct, match edges that are the min at BOTH endpoints,
    retire matched vertices."""
    parts = [
        f"""a0 AS MATERIALIZED (
    SELECT a, b, {pri} AS p FROM (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst
    )
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""i{r} AS MATERIALIZED (
    SELECT v, MIN(struct_pack(p := p, a := a, b := b)) AS m FROM (
        SELECT a AS v, p, a, b FROM a{r - 1}
        UNION ALL SELECT b AS v, p, a, b FROM a{r - 1}
    ) GROUP BY v
),
w{r} AS MATERIALIZED (
    SELECT x.a, x.b FROM a{r - 1} x
    JOIN i{r} ia ON ia.v = x.a
        AND ia.m = struct_pack(p := x.p, a := x.a, b := x.b)
    JOIN i{r} ib ON ib.v = x.b
        AND ib.m = struct_pack(p := x.p, a := x.a, b := x.b)
),
a{r} AS MATERIALIZED (
    SELECT x.a, x.b, x.p FROM a{r - 1} x
    WHERE x.a NOT IN (SELECT a FROM w{r} UNION ALL SELECT b FROM w{r})
      AND x.b NOT IN (SELECT a FROM w{r} UNION ALL SELECT b FROM w{r})
)"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT a, b FROM w{r}" for r in range(1, rounds + 1)
    )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body},
matched AS ({union})
{tail_select}
"""


def ktruss_sql(k: int = 4, rounds: int = 14) -> str:
    """DuckDB twin of operators.truss.k_truss: ``rounds`` unrolled support
    peel rounds. Each round lists triangles over the alive canonical edge
    set (a<b<c triple join), credits each to its three edges, and keeps
    edges with support ≥ k−2 (a LEFT join so zero-support edges peel too).
    Rounds past the fixpoint are no-ops, so any ``rounds`` ≥ the true
    peel depth is exact — measured depth is 4 (sf0.001) / 11 (sf0.01) at
    k=4; 14 leaves margin, and the ENGINE runs to an actual fixpoint and
    raises if it fails to converge, so a deeper-peeling gate graph would
    fail loudly, not silently."""
    parts = [
        """a0 AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
)"""
    ]
    for r in range(rounds):
        # AS MATERIALIZED: each round references the previous alive set
        # four times (3 triangle sides + the left join) — inlining would
        # re-evaluate the chain 4^rounds times
        parts.append(
            f"""t{r} AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM a{r} e1 JOIN a{r} e2 ON e1.b = e2.a
    JOIN a{r} e3 ON e3.a = e1.a AND e3.b = e2.b
),
s{r} AS MATERIALIZED (
    SELECT a, b, COUNT(*) AS sup FROM (
        SELECT x AS a, y AS b FROM t{r}
        UNION ALL SELECT y AS a, z AS b FROM t{r}
        UNION ALL SELECT x AS a, z AS b FROM t{r}
    ) GROUP BY a, b
),
a{r + 1} AS MATERIALIZED (
    SELECT e.a, e.b FROM a{r} e
    LEFT JOIN s{r} s ON e.a = s.a AND e.b = s.b
    WHERE COALESCE(s.sup, 0) >= {k - 2}
)"""
        )
    # one final support pass over the fixpoint for the output column
    parts.append(
        f"""tf AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM a{rounds} e1 JOIN a{rounds} e2 ON e1.b = e2.a
    JOIN a{rounds} e3 ON e3.a = e1.a AND e3.b = e2.b
),
sf AS (
    SELECT a, b, COUNT(*) AS sup FROM (
        SELECT x AS a, y AS b FROM tf
        UNION ALL SELECT y AS a, z AS b FROM tf
        UNION ALL SELECT x AS a, z AS b FROM tf
    ) GROUP BY a, b
)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT e.a, e.b, COALESCE(s.sup, 0) AS support
FROM a{rounds} e LEFT JOIN sf s ON e.a = s.a AND e.b = s.b
"""


def trussness_sql(rounds: int = 20) -> str:
    """DuckDB twin of operators.truss.trussness: the triangle list is
    built ONCE (a<b<c triple join, MATERIALIZED), then ``rounds``
    unrolled clamped edge-H-index iterations from the support vector —
    each round joins the state three times (one per triangle edge),
    emits the per-triangle partner-min for each edge, and takes
    H = MAX(LEAST(rank, value)) per edge, clamped by the previous value.
    Monotone non-increasing and stationary at the trussness−2 fixpoint,
    so rounds past convergence are no-ops — measured convergence: 3
    rounds (sf0.001), 10 (sf0.01); 20 leaves margin, and the ENGINE
    iterates to an actual fixpoint and raises if it needs more than its
    own max_iterations, so a deeper graph fails loudly, not silently.
    Edges in no triangle surface with trussness 2 via the final LEFT
    join, matching the engine's coalesce."""
    parts = [
        """canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
tri AS MATERIALIZED (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM canon e1 JOIN canon e2 ON e1.b = e2.a
    JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
s0 AS MATERIALIZED (
    SELECT a, b, COUNT(*) AS rho FROM (
        SELECT x AS a, y AS b FROM tri
        UNION ALL SELECT x AS a, z AS b FROM tri
        UNION ALL SELECT y AS a, z AS b FROM tri
    ) GROUP BY a, b
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""v{r} AS (
    SELECT t.x, t.y, t.z, sxy.rho AS rxy, sxz.rho AS rxz, syz.rho AS ryz
    FROM tri t
    JOIN s{r - 1} sxy ON t.x = sxy.a AND t.y = sxy.b
    JOIN s{r - 1} sxz ON t.x = sxz.a AND t.z = sxz.b
    JOIN s{r - 1} syz ON t.y = syz.a AND t.z = syz.b
),
h{r} AS (
    SELECT a, b, MAX(LEAST(rn, val)) AS h FROM (
        SELECT a, b, val,
               ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY val DESC) AS rn
        FROM (
            SELECT x AS a, y AS b, LEAST(rxz, ryz) AS val FROM v{r}
            UNION ALL SELECT x AS a, z AS b, LEAST(rxy, ryz) AS val FROM v{r}
            UNION ALL SELECT y AS a, z AS b, LEAST(rxy, rxz) AS val FROM v{r}
        )
    ) GROUP BY a, b
),
s{r} AS MATERIALIZED (
    SELECT s.a, s.b, LEAST(s.rho, h.h) AS rho
    FROM s{r - 1} s JOIN h{r} h ON s.a = h.a AND s.b = h.b
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT c.a, c.b, CAST(COALESCE(s.rho + 2, 2) AS BIGINT) AS trussness
FROM canon c LEFT JOIN s{rounds} s ON c.a = s.a AND c.b = s.b
"""


def coreness_sql(rounds: int = 30) -> str:
    """DuckDB twin of operators.kcore.coreness: ``rounds`` unrolled
    H-index iterations from the degree vector (each a neighbor join +
    per-vertex ROW_NUMBER window + MAX(LEAST(rank, value))). The
    iteration is monotone non-increasing and stationary at the coreness
    fixpoint, so rounds past convergence are no-ops — measured
    convergence: 8 rounds (sf0.001), 21 (sf0.01), 12 (sf0.1); 30 leaves
    margin, and the engine raises (rather than silently disagreeing) if
    a graph ever needs more than its own max_iterations. All CTEs
    MATERIALIZED (multi-referenced chain — inlining is exponential)."""
    parts = [
        """canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
e0 AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM canon
    UNION ALL
    SELECT b AS src, a AS dst FROM canon
),
c0 AS MATERIALIZED (SELECT src AS id, COUNT(*) AS c FROM e0 GROUP BY src)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""c{r} AS MATERIALIZED (
    SELECT src AS id, MAX(LEAST(rn, cval)) AS c FROM (
        SELECT e.src, c.c AS cval,
               ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY c.c DESC) AS rn
        FROM e0 e JOIN c{r - 1} c ON e.dst = c.id
    ) GROUP BY src
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT v.id, CAST(COALESCE(c.c, 0) AS BIGINT) AS coreness
FROM vertices v LEFT JOIN c{rounds} c ON v.id = c.id
"""


def knn_join_sql(
    k: int = 5,
    num_bits: int = 4,
    dim: int = 64,
    seed: int = 42,
    num_bands: int = 2,
) -> str:
    """DuckDB twin of similarity.lsh_knn_join: any-band bucket self-join,
    exact cosine, ROW_NUMBER top-k per query vector — same plane
    literals, same (sim desc, nbr_id asc) tie-break."""
    bcols = ", ".join(
        f"{_bucket_expr_duck(num_bits, dim, seed, band, num_bands)} AS b{band}"
        for band in range(num_bands)
    )
    any_band = " OR ".join(f"x.b{band} = y.b{band}" for band in range(num_bands))
    return f"""
WITH bk AS (
    SELECT vec_id, embedding, {bcols}
    FROM embeddings
),
cand AS (
    SELECT DISTINCT x.vec_id, y.vec_id AS nbr_id,
           ROUND(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) AS sim
    FROM bk x JOIN bk y ON ({any_band}) AND x.vec_id <> y.vec_id
),
ranked AS (
    SELECT vec_id, nbr_id, sim,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS rank
    FROM cand
)
SELECT vec_id, nbr_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def triangles_per_vertex_sql() -> str:
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
tri AS (
    SELECT e1.a AS u, e1.b AS v, e2.b AS w
    FROM canon e1
    JOIN canon e2 ON e1.b = e2.a
    JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT id, COUNT(*) AS t FROM (
        SELECT u AS id FROM tri
        UNION ALL SELECT v AS id FROM tri
        UNION ALL SELECT w AS id FROM tri
    ) GROUP BY id
)
SELECT v.id, CAST(COALESCE(c.t, 0) AS BIGINT) AS triangles
FROM vertices v LEFT JOIN corners c ON v.id = c.id
"""


def bfs_parents_sql(root: int = 0, max_depth: int = 256) -> str:
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(id, dist) AS (
    SELECT CAST({root} AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
    UNION
    SELECT e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_depth}
),
d AS (SELECT id, MIN(dist) AS dist FROM walk GROUP BY id),
preds AS (
    SELECT e.dst AS id, MIN(e.src) AS parent
    FROM edges e
    JOIN d du ON e.src = du.id
    JOIN d dv ON e.dst = dv.id
    WHERE du.dist = dv.dist - 1
    GROUP BY e.dst
)
SELECT d.id, d.dist, COALESCE(p.parent, d.id) AS parent
FROM d LEFT JOIN preds p ON d.id = p.id
"""


def wcc_census_sql() -> str:
    return f"""
WITH RECURSIVE {EDGES_SQL},
sym AS (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
),
reach(id, lbl) AS (
    SELECT id, id FROM vertices
    UNION
    SELECT s.dst AS id, r.lbl FROM sym s JOIN reach r ON s.src = r.id
),
comp AS (SELECT id, MIN(lbl) AS comp FROM reach GROUP BY id),
census AS (SELECT comp, COUNT(*) AS size FROM comp GROUP BY comp)
SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(MAX(size) AS BIGINT) AS max_size
FROM census
"""


def top_pagerank_sql(iterations: int = 10, k: int = 20) -> str:
    inner = pagerank_sql(iterations).strip()
    return f"""
SELECT id, pr FROM (
{inner}
) ORDER BY pr DESC, id ASC LIMIT {k}
"""


def degree_histogram_sql() -> str:
    return f"""
WITH {EDGES_SQL},
deg AS (
    SELECT v.id, CAST(COALESCE(o.c, 0) AS BIGINT) AS out_deg
    FROM vertices v
    LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges GROUP BY src) o ON v.id = o.src
)
SELECT out_deg, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY out_deg
"""


def fingerprints_sql(k: int = 8, window: int = 4) -> str:
    """DuckDB twin of docs.fingerprints (winnowing, SIGMOD'03): k-gram
    hashes via the shared md5-60 fragment, window-min via the identical
    ROWS frame, full windows only except a single clipped window for docs
    with fewer than ``window`` k-grams."""
    return f"""
WITH pos AS (
    SELECT doc_id, i AS pos, length(text) - {k - 1} AS n_kgrams,
           {_md5_60_duck(f"substr(text, i, {k})")} AS h
    FROM documents, UNNEST(generate_series(1, length(text) - {k - 1})) AS g(i)
    WHERE length(text) >= {k}
),
win AS (
    SELECT doc_id, pos, n_kgrams,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp
    FROM pos
)
SELECT DISTINCT doc_id, fp FROM win
WHERE pos <= n_kgrams - {window - 1} OR pos = 1
"""


def despan_sql(min_len: int = 30, keep: str = "first") -> str:
    """DuckDB twin of docs.remove_repeated_spans (exact-substring dedup,
    Lee et al. 2022): duplicated min_len-gram positions via the shared
    md5-60 fragment, gaps-and-islands span merge, then a character-level
    rebuild (string_agg of uncovered chars ORDER BY position) — the
    slow-but-unarguable formulation of the same rewrite the engine does
    with one aggregate() fold per doc."""
    k = min_len
    keep_filter = (
        f"WHERE p.doc_id * 4294967296 + p.pos <> s.keep_key"
        if keep == "first"
        else ""
    )
    return f"""
WITH pos AS (
    SELECT doc_id, i AS pos, {_md5_60_duck(f"substr(text, i, {k})")} AS h
    FROM documents, UNNEST(generate_series(1, length(text) - {k - 1})) AS g(i)
    WHERE length(text) >= {k}
),
stats AS (
    SELECT h, MIN(doc_id * 4294967296 + pos) AS keep_key
    FROM pos GROUP BY h HAVING COUNT(*) >= 2
),
dup AS (
    SELECT p.doc_id, p.pos
    FROM pos p JOIN stats s USING (h)
    {keep_filter}
),
lagged AS (
    SELECT doc_id, pos,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM dup
),
isl AS (
    SELECT doc_id, pos,
           SUM(CASE WHEN prev IS NULL OR pos - prev > {k} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM lagged
),
spans AS (
    SELECT doc_id, MIN(pos) AS sp_s, MAX(pos) + {k - 1} AS sp_e
    FROM isl GROUP BY doc_id, island
),
chars AS (
    SELECT doc_id, i, substr(text, i, 1) AS ch
    FROM documents, UNNEST(generate_series(1, length(text))) AS g(i)
),
kept AS (
    SELECT c.doc_id, c.i, c.ch
    FROM chars c
    WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = c.doc_id AND c.i BETWEEN s.sp_s AND s.sp_e
    )
),
clean AS (
    SELECT doc_id, string_agg(ch, '' ORDER BY i) AS text
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(cl.text, '') AS text,
       CAST(length(d.text) - length(COALESCE(cl.text, '')) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN clean cl ON cl.doc_id = d.doc_id
"""


def fp_overlap_sql(
    k: int = 8, window: int = 4, min_shared: int = 2
) -> str:
    """DuckDB twin of docs.fingerprint_overlap_pairs (no doc-freq cap at
    gate scale)."""
    inner = fingerprints_sql(k, window).strip()
    return f"""
WITH fp AS (
{inner}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""


def ivf_knn_sql(
    query_vec_id: int = 0,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 2,
) -> str:
    """DuckDB twin of similarity.ivf_topk with lloyd_iters=0: centroids are
    the ``num_centroids`` vectors with smallest md5(vec_id) (cid = rank in
    that order — similarity.ivf_centroids), assignment is argmax of the
    6-dp-rounded cosine with ties to the smaller cid, rerank is exact
    within the ``nprobe`` probed cells."""
    return f"""
WITH seeds AS (
    SELECT embedding::DOUBLE[] AS cvec,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
    FROM embeddings
    QUALIFY cid < {num_centroids}
),
q AS (
    SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id}
),
probes AS (
    SELECT cid FROM seeds, q
    ORDER BY ROUND(list_cosine_similarity(cvec, qv), 6) DESC, cid ASC
    LIMIT {nprobe}
),
assign AS (
    SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, s.cid,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], s.cvec), 6) AS csim
        FROM embeddings e CROSS JOIN seeds s
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) = 1
)
SELECT vec_id, sim FROM (
    SELECT a.vec_id,
           ROUND(list_cosine_similarity(a.v, q.qv), 6) AS sim
    FROM assign a JOIN probes p USING (cid), q
    WHERE a.vec_id <> {query_vec_id}
)
ORDER BY sim DESC, vec_id ASC LIMIT {k}
"""


def personalized_pagerank_sql(
    sources: "list[int]", iterations: int = 10
) -> str:
    """DuckDB twin of operators.personalized_pagerank: the uniform
    teleport becomes a source-restricted base vector (0.15/|S| on S, else
    0); init = base; same no-dangling-redistribution recurrence as
    pagerank_sql."""
    srcs = sorted({int(s) for s in sources})
    b = repr(0.15 / len(srcs))
    in_list = ", ".join(str(s) for s in srcs)
    rounds = []
    for k in range(1, iterations + 1):
        rounds.append(
            f"""r{k} AS (
    SELECT v.id, v.base,
           v.base + 0.85 * COALESCE(m.mass, 0.0) AS pr
    FROM base v
    LEFT JOIN (
        SELECT ne.dst AS id, SUM(r.pr * ne.w) AS mass
        FROM ne JOIN r{k - 1} r ON ne.src = r.id
        GROUP BY ne.dst
    ) m ON v.id = m.id
)"""
        )
    return f"""
WITH {EDGES_SQL},
deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ne AS (SELECT e.src, e.dst, 1.0 / d.od AS w FROM edges e JOIN deg d ON e.src = d.src),
base AS (
    SELECT id, CASE WHEN id IN ({in_list}) THEN CAST({b} AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS base
    FROM vertices
),
r0 AS (SELECT id, base, base AS pr FROM base),
{",".join(rounds)}
SELECT id, ROUND(pr, 6) AS pr FROM r{iterations}
"""


def reciprocity_sql() -> str:
    return f"""
WITH {EDGES_SQL},
e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
m AS (
    SELECT COUNT(*) AS m FROM e
    WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
)
SELECT ROUND(CAST(m.m AS DOUBLE) / CAST((SELECT COUNT(*) FROM e) AS DOUBLE), 6)
       AS reciprocity
FROM m
"""


def assortativity_sql() -> str:
    return f"""
WITH {EDGES_SQL},
deg AS (
    SELECT v.id,
           CAST(COALESCE(o.c, 0) AS BIGINT) AS out_deg,
           CAST(COALESCE(i.c, 0) AS BIGINT) AS in_deg
    FROM vertices v
    LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges GROUP BY src) o ON v.id = o.src
    LEFT JOIN (SELECT dst, COUNT(*) AS c FROM edges GROUP BY dst) i ON v.id = i.dst
)
SELECT ROUND(corr(CAST(ds.out_deg AS DOUBLE), CAST(dd.in_deg AS DOUBLE)), 6)
       AS assortativity
FROM edges e
JOIN deg ds ON e.src = ds.id
JOIN deg dd ON e.dst = dd.id
"""


def hits_sql(iterations: int = 5) -> str:
    """Unrolled Kleinberg HITS: per half-step a sum-over-neighbors CTE, a
    1-row L2-norm CTE, and a full-vertex-set normalized-score CTE — the
    DuckDB twin of operators/hits.py (same order: auth from the previous
    hub, then hub from the NEW auth)."""
    # AS MATERIALIZED on every round CTE: each is referenced 2-3 times
    # (score join + its own norm + the next half-step) — without it DuckDB
    # re-inlines the whole chain per reference, ~4^rounds re-evaluations
    # (the kcore_sql hazard; this oracle measured 10+ minutes at sf0.001
    # before the fix, sub-second after)
    parts = ["h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM vertices)"]
    for i in range(1, iterations + 1):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
    SELECT e.dst AS id, SUM(h.hub) AS s
    FROM edges e JOIN h{i - 1} h ON e.src = h.id GROUP BY e.dst
),
an{i} AS MATERIALIZED (SELECT sqrt(SUM(s * s)) AS nrm FROM ar{i}),
a{i} AS MATERIALIZED (
    SELECT v.id, COALESCE(r.s, 0.0) / n.nrm AS auth
    FROM vertices v LEFT JOIN ar{i} r ON v.id = r.id CROSS JOIN an{i} n
),
hr{i} AS MATERIALIZED (
    SELECT e.src AS id, SUM(a.auth) AS s
    FROM edges e JOIN a{i} a ON e.dst = a.id GROUP BY e.src
),
hn{i} AS MATERIALIZED (SELECT sqrt(SUM(s * s)) AS nrm FROM hr{i}),
h{i} AS MATERIALIZED (
    SELECT v.id, COALESCE(r.s, 0.0) / n.nrm AS hub
    FROM vertices v LEFT JOIN hr{i} r ON v.id = r.id CROSS JOIN hn{i} n
)"""
        )
    return f"""
WITH {EDGES_SQL},
{",".join(parts)}
SELECT a.id, ROUND(a.auth, 6) AS auth, ROUND(h.hub, 6) AS hub
FROM a{iterations} a JOIN h{iterations} h ON a.id = h.id
"""


def katz_sql(iterations: int = 8, alpha: float = 0.01, beta: float = 1.0) -> str:
    """Unrolled truncated Katz recurrence x ← β + α·Aᵀx from x₀ = β·1 —
    the DuckDB twin of operators/katz.py. Each round CTE is referenced
    exactly once (by the next round), so no AS MATERIALIZED is needed;
    the chain is linear, not the hits_sql fan-out."""
    a, b = float(alpha), float(beta)
    rounds = []
    for k in range(1, iterations + 1):
        rounds.append(
            f"""r{k} AS (
    SELECT v.id, {b!r} + {a!r} * COALESCE(m.mass, 0.0) AS kz
    FROM vertices v
    LEFT JOIN (
        SELECT e.dst AS id, SUM(r.kz) AS mass
        FROM edges e JOIN r{k - 1} r ON e.src = r.id
        GROUP BY e.dst
    ) m ON v.id = m.id
)"""
        )
    return f"""
WITH {EDGES_SQL},
r0 AS (SELECT id, CAST({b!r} AS DOUBLE) AS kz FROM vertices),
{",".join(rounds)}
SELECT id, ROUND(kz, 6) AS katz FROM r{iterations}
"""


def clustering_coeff_sql() -> str:
    """lcc = 2·tri(v) / (deg·(deg−1)) over the undirected simple graph —
    shares the compact-forward triangle CTEs of triangles_per_vertex_sql."""
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
tri AS (
    SELECT e1.a AS u, e1.b AS v, e2.b AS w
    FROM canon e1
    JOIN canon e2 ON e1.b = e2.a
    JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT id, COUNT(*) AS t FROM (
        SELECT u AS id FROM tri
        UNION ALL SELECT v AS id FROM tri
        UNION ALL SELECT w AS id FROM tri
    ) GROUP BY id
),
deg AS (
    SELECT id, COUNT(*) AS d FROM (
        SELECT a AS id FROM canon UNION ALL SELECT b AS id FROM canon
    ) GROUP BY id
)
SELECT v.id,
       ROUND(CASE WHEN d.d >= 2
                  THEN 2.0 * COALESCE(c.t, 0) / (d.d * (d.d - 1))
                  ELSE 0.0 END, 6) AS lcc
FROM vertices v
LEFT JOIN corners c ON v.id = c.id
LEFT JOIN deg d ON v.id = d.id
"""


def adamic_adar_sql(top_k: int = 50) -> str:
    """Wedge-join link prediction (operators/linkpred.py): the cut line
    orders by the ROUNDED score so both engines agree despite float
    summation order."""
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
sym AS (
    SELECT a AS w, b AS x FROM canon
    UNION ALL
    SELECT b AS w, a AS x FROM canon
),
deg AS (SELECT w AS id, COUNT(*) AS d FROM sym GROUP BY w),
sd AS (
    SELECT s.w, s.x, 1.0 / ln(d.d) AS inv_ln_d
    FROM sym s JOIN deg d ON s.w = d.id
),
scored AS (
    SELECT s1.x AS a, s2.x AS b,
           COUNT(*) AS cn,
           ROUND(SUM(s1.inv_ln_d), 6) AS aa
    FROM sd s1 JOIN sd s2 ON s1.w = s2.w AND s1.x < s2.x
    GROUP BY s1.x, s2.x
)
SELECT s.a, s.b, s.cn, s.aa
FROM scored s
WHERE NOT EXISTS (SELECT 1 FROM canon c WHERE c.a = s.a AND c.b = s.b)
ORDER BY s.aa DESC, s.a ASC, s.b ASC
LIMIT {top_k}
"""


def resource_allocation_sql(top_k: int = 50) -> str:
    """DuckDB twin of operators.linkpred.resource_allocation — the
    adamic_adar wedge join with the 1/deg(w) hub discount and the
    rounded-score cut line."""
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
sym AS (
    SELECT a AS w, b AS x FROM canon
    UNION ALL
    SELECT b AS w, a AS x FROM canon
),
deg AS (SELECT w AS id, COUNT(*) AS d FROM sym GROUP BY w),
sd AS (
    SELECT s.w, s.x, 1.0 / d.d AS inv_d
    FROM sym s JOIN deg d ON s.w = d.id
),
scored AS (
    SELECT s1.x AS a, s2.x AS b,
           COUNT(*) AS cn,
           ROUND(SUM(s1.inv_d), 6) AS ra
    FROM sd s1 JOIN sd s2 ON s1.w = s2.w AND s1.x < s2.x
    GROUP BY s1.x, s2.x
)
SELECT s.a, s.b, s.cn, s.ra
FROM scored s
WHERE NOT EXISTS (SELECT 1 FROM canon c WHERE c.a = s.a AND c.b = s.b)
ORDER BY s.ra DESC, s.a ASC, s.b ASC
LIMIT {top_k}
"""


def preferential_attachment_sql(top_k: int = 50, candidate_pool: int = 128) -> str:
    """DuckDB twin of operators.linkpred.preferential_attachment — the
    same top-``candidate_pool`` degree prefilter (deg DESC, id ASC), pair
    product, adjacency anti-join, (pa DESC, a, b) cut."""
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
sym AS (
    SELECT a AS w FROM canon UNION ALL SELECT b AS w FROM canon
),
deg AS (SELECT w, COUNT(*) AS d FROM sym GROUP BY w),
pool AS (
    SELECT w, d FROM deg ORDER BY d DESC, w ASC LIMIT {candidate_pool}
),
pairs AS (
    SELECT p1.w AS a, p2.w AS b, p1.d * p2.d AS pa
    FROM pool p1 JOIN pool p2 ON p1.w < p2.w
)
SELECT p.a, p.b, p.pa
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM canon c WHERE c.a = p.a AND c.b = p.b)
ORDER BY p.pa DESC, p.a ASC, p.b ASC
LIMIT {top_k}
"""


def jaccard_pairs_sql(top_k: int = 50) -> str:
    """DuckDB twin of operators.linkpred.jaccard_pairs — the adamic_adar
    wedge join with a degree-sum union size and the rounded-score cut."""
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
sym AS (
    SELECT a AS w, b AS x FROM canon
    UNION ALL
    SELECT b AS w, a AS x FROM canon
),
deg AS (SELECT w AS id, COUNT(*) AS d FROM sym GROUP BY w),
pairs AS (
    SELECT s1.x AS a, s2.x AS b, COUNT(*) AS cn
    FROM sym s1 JOIN sym s2 ON s1.w = s2.w AND s1.x < s2.x
    GROUP BY s1.x, s2.x
),
nonadj AS (
    SELECT p.a, p.b, p.cn FROM pairs p
    WHERE NOT EXISTS (SELECT 1 FROM canon c WHERE c.a = p.a AND c.b = p.b)
)
SELECT n.a, n.b, n.cn,
       ROUND(n.cn * 1.0 / (da.d + db.d - n.cn), 6) AS jaccard
FROM nonadj n JOIN deg da ON n.a = da.id JOIN deg db ON n.b = db.id
ORDER BY jaccard DESC, n.a ASC, n.b ASC
LIMIT {top_k}
"""


def harmonic_sql(sources: list[int], max_depth: int = 64) -> str:
    """Seeded harmonic centrality via a seed-dimensioned recursive walk —
    the bfs_sql shape with a ``source`` column (MS-BFS flattening,
    operators/harmonic.py). ``max_depth`` must exceed the gate graph's
    eccentricity from every seed (diameter ~4, see bfs_sql — 16x
    margin), matching the engine's max_iterations."""
    seed_rows = ", ".join(f"({s}::BIGINT)" for s in sources)
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(source, id, dist) AS (
    SELECT s.s AS source, s.s AS id, CAST(0 AS BIGINT) AS dist
    FROM (VALUES {seed_rows}) s(s)
    UNION
    SELECT w.source, e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_depth}
),
md AS (SELECT source, id, MIN(dist) AS dist FROM walk GROUP BY source, id)
SELECT v.id,
       ROUND(COALESCE(SUM(CASE WHEN md.dist > 0 THEN 1.0 / md.dist END), 0.0), 6)
       AS harmonic
FROM vertices v LEFT JOIN md ON v.id = md.id
GROUP BY v.id
"""


def betweenness_sql(sources: list[int], levels: int = 8) -> str:
    """DuckDB twin of operators.betweenness.betweenness: Brandes with the
    BFS DAG unrolled — ``levels`` forward strata CTEs carrying σ (sum of
    predecessor σ, anti-joined against the cumulative visited set), then
    backward δ CTEs deepest-first (σ_u/σ_v·(1+δ_v) over stratum-crossing
    edges). ``levels`` must exceed the gate graph's eccentricity from
    every seed (diameter ~4, see bfs_sql — 2x margin); strata past
    exhaustion are empty, so the unroll is EXACT, not truncated."""
    seed_rows = ", ".join(f"({s}::BIGINT)" for s in sources)
    parts = [
        f"""l0 AS MATERIALIZED (
    SELECT s.source, s.source AS id, 1.0::DOUBLE AS sigma
    FROM (SELECT * FROM (VALUES {seed_rows}) t(source)) s
),
vis0 AS MATERIALIZED (SELECT source, id FROM l0)"""
    ]
    for t in range(1, levels + 1):
        parts.append(
            f"""l{t} AS MATERIALIZED (
    SELECT f.source, e.dst AS id, SUM(f.sigma) AS sigma
    FROM l{t - 1} f JOIN edges e ON e.src = f.id
    WHERE NOT EXISTS (
        SELECT 1 FROM vis{t - 1} v WHERE v.source = f.source AND v.id = e.dst
    )
    GROUP BY f.source, e.dst
),
vis{t} AS MATERIALIZED (
    SELECT source, id FROM vis{t - 1}
    UNION ALL SELECT source, id FROM l{t}
)"""
        )
    parts.append(
        f"d{levels} AS (SELECT source, id, sigma, 0.0::DOUBLE AS delta FROM l{levels})"
    )
    for t in range(levels - 1, -1, -1):
        parts.append(
            f"""c{t} AS (
    SELECT f.source, f.id,
           SUM(f.sigma / v.sigma * (1.0 + v.delta)) AS delta
    FROM l{t} f JOIN edges e ON e.src = f.id
    JOIN d{t + 1} v ON v.source = f.source AND v.id = e.dst
    GROUP BY f.source, f.id
),
d{t} AS MATERIALIZED (
    SELECT f.source, f.id, f.sigma, COALESCE(c.delta, 0.0) AS delta
    FROM l{t} f LEFT JOIN c{t} c ON c.source = f.source AND c.id = f.id
)"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT id, delta FROM d{t}" for t in range(1, levels + 1)
    )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT v.id, ROUND(COALESCE(b.b, 0.0), 6) AS betweenness
FROM vertices v LEFT JOIN (
    SELECT id, SUM(delta) AS b FROM ({union}) GROUP BY id
) b ON v.id = b.id
"""


def edge_betweenness_sql(sources: list[int], levels: int = 8) -> str:
    """DuckDB twin of operators.betweenness.edge_betweenness — the same
    unrolled forward-σ/backward-δ strata as betweenness_sql, emitting the
    per-DAG-edge term σ_u/σ_v·(1+δ_v) for every stratum-crossing edge
    instead of the vertex dependency; edges on no shortest path from the
    seed set report 0."""
    seed_rows = ", ".join(f"({s}::BIGINT)" for s in sources)
    parts = [
        f"""l0 AS MATERIALIZED (
    SELECT s.source, s.source AS id, 1.0::DOUBLE AS sigma
    FROM (SELECT * FROM (VALUES {seed_rows}) t(source)) s
),
vis0 AS MATERIALIZED (SELECT source, id FROM l0)"""
    ]
    for t in range(1, levels + 1):
        parts.append(
            f"""l{t} AS MATERIALIZED (
    SELECT f.source, e.dst AS id, SUM(f.sigma) AS sigma
    FROM l{t - 1} f JOIN edges e ON e.src = f.id
    WHERE NOT EXISTS (
        SELECT 1 FROM vis{t - 1} v WHERE v.source = f.source AND v.id = e.dst
    )
    GROUP BY f.source, e.dst
),
vis{t} AS MATERIALIZED (
    SELECT source, id FROM vis{t - 1}
    UNION ALL SELECT source, id FROM l{t}
)"""
        )
    parts.append(
        f"d{levels} AS (SELECT source, id, sigma, 0.0::DOUBLE AS delta FROM l{levels})"
    )
    for t in range(levels - 1, -1, -1):
        parts.append(
            f"""t{t} AS MATERIALIZED (
    SELECT f.source, f.id, e.dst,
           f.sigma / v.sigma * (1.0 + v.delta) AS term
    FROM l{t} f JOIN edges e ON e.src = f.id
    JOIN d{t + 1} v ON v.source = f.source AND v.id = e.dst
),
c{t} AS (
    SELECT source, id, SUM(term) AS delta FROM t{t} GROUP BY source, id
),
d{t} AS MATERIALIZED (
    SELECT f.source, f.id, f.sigma, COALESCE(c.delta, 0.0) AS delta
    FROM l{t} f LEFT JOIN c{t} c ON c.source = f.source AND c.id = f.id
)"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT id, dst, term FROM t{t}" for t in range(0, levels)
    )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT e.src, e.dst, ROUND(COALESCE(b.b, 0.0), 6) AS betweenness
FROM edges e LEFT JOIN (
    SELECT id AS src, dst, SUM(term) AS b FROM ({union}) GROUP BY id, dst
) b ON e.src = b.src AND e.dst = b.dst
"""


def closeness_sql(sources: list[int], max_depth: int = 64) -> str:
    """Seeded closeness — the harmonic_sql walk with a count/sum tail
    (reached seeds, reached/sum-dist), operators/harmonic.py
    closeness_centrality. DuckDB ``/`` on integers is float division,
    matching Spark's long/long -> double."""
    seed_rows = ", ".join(f"({s}::BIGINT)" for s in sources)
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(source, id, dist) AS (
    SELECT s.s AS source, s.s AS id, CAST(0 AS BIGINT) AS dist
    FROM (VALUES {seed_rows}) s(s)
    UNION
    SELECT w.source, e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_depth}
),
md AS (SELECT source, id, MIN(dist) AS dist FROM walk GROUP BY source, id),
agg AS (
    SELECT id, COUNT(*) AS reached, SUM(dist) AS sum_dist
    FROM md WHERE dist > 0 GROUP BY id
)
SELECT v.id,
       CAST(COALESCE(a.reached, 0) AS BIGINT) AS reached,
       ROUND(COALESCE(a.reached / a.sum_dist, 0.0), 6) AS closeness
FROM vertices v LEFT JOIN agg a ON v.id = a.id
"""


def neighborhood_sql(max_h: int = 6) -> str:
    """Exact neighborhood function N(h), h in [0, max_h] — all-sources
    walk CAPPED at dist < max_h (the cap bounds the cyclic-walk blowup:
    every shortest path of length d <= max_h survives the cap, so the
    MIN over enumerated paths is the true distance for every pair that
    counts toward any reported h). Twin of
    operators/anf.py neighborhood_function_exact."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(source, id, dist) AS (
    SELECT v.id AS source, v.id AS id, CAST(0 AS BIGINT) AS dist
    FROM vertices v
    UNION
    SELECT w.source, e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_h}
),
md AS (SELECT source, id, MIN(dist) AS dist FROM walk GROUP BY source, id),
per_d AS (SELECT dist, COUNT(*) AS c FROM md GROUP BY dist),
hs AS (SELECT CAST(range AS BIGINT) AS h FROM range({max_h} + 1))
SELECT hs.h AS h, CAST(COALESCE(SUM(p.c), 0) AS BIGINT) AS nf
FROM hs LEFT JOIN per_d p ON p.dist <= hs.h
GROUP BY hs.h
"""


def mean_distance_sql(max_h: int = 6) -> str:
    """DuckDB twin of operators.anf.mean_distance — the neighborhood_sql
    capped walk with a filtered single-division tail."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(source, id, dist) AS (
    SELECT v.id AS source, v.id AS id, CAST(0 AS BIGINT) AS dist
    FROM vertices v
    UNION
    SELECT w.source, e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_h}
),
md AS (SELECT source, id, MIN(dist) AS dist FROM walk GROUP BY source, id)
SELECT COUNT(*) AS n_pairs,
       ROUND(SUM(dist) * 1.0 / COUNT(*), 6) AS mean_dist
FROM md WHERE dist > 0 AND dist <= {max_h}
"""


def eccentricity_sql(max_h: int = 8) -> str:
    """DuckDB twin of operators.anf.eccentricity — the capped all-sources
    walk, MAX(dist) per source (the self row keeps unreaching vertices
    at ecc 0)."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
walk(source, id, dist) AS (
    SELECT v.id AS source, v.id AS id, CAST(0 AS BIGINT) AS dist
    FROM vertices v
    UNION
    SELECT w.source, e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_h}
),
md AS (SELECT source, id, MIN(dist) AS dist FROM walk GROUP BY source, id)
SELECT source AS id, MAX(dist) AS ecc FROM md GROUP BY source
"""


def stratified_sample_sql(
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 0.0,
    seed: int = 42,
) -> str:
    """DuckDB twin of docs.stratified_sample — identical md5-60
    threshold per stratum."""
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v * float(1 << 60))}" for k, v in rates.items()
    )
    h = _md5_60_duck(f"'samp:{int(seed)}:' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT * FROM documents
WHERE {h} < CASE {strata_col} {cases}
            ELSE {int(default_rate * float(1 << 60))} END
"""


def _walks_ctes(walk_length: int, walks_per_vertex: int, seed: int) -> tuple[str, str]:
    """(cte_body, union_select) for the deterministic walk corpus —
    operators/walks.py random_walks unrolled: step t picks the
    out-neighbor minimizing the md5-60 of seed|walk_id|t|src|dst (tie:
    min dst), one CTE per step with a QUALIFY ROW_NUMBER argmin (the
    kcore5 unrolled-CTE pattern). Shared by walks_sql and skipgrams_sql."""
    k = walks_per_vertex
    ctes = [
        f"""s0 AS (
    SELECT v.id * {k} + j.j AS walk_id, CAST(0 AS BIGINT) AS step, v.id AS id
    FROM vertices v CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range({k})) j
)"""
    ]
    for t in range(1, walk_length + 1):
        h = _md5_60_duck(f"concat_ws('|', {seed}, s.walk_id, {t}, e.src, e.dst)")
        ctes.append(
            f"""s{t} AS (
    SELECT walk_id, CAST({t} AS BIGINT) AS step, dst AS id
    FROM (
        SELECT s.walk_id, e.dst, {h} AS h
        FROM s{t - 1} s JOIN edges e ON e.src = s.id
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY walk_id ORDER BY h, dst) = 1
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM s{t}" for t in range(walk_length + 1))
    return ",\n".join(ctes), union


def node2vec_walks_sql(
    walk_length: int = 3,
    walks_per_vertex: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 42,
) -> str:
    """DuckDB twin of operators.walks.node2vec_walks — the same integer
    replica weights (scaled 1/p, 1, 1/q), same md5-60 hash string
    seed|walk_id|t|src|dst|r, same (h, dst, r) argmin. State CTEs carry
    (walk_id, prev, id); the α tier is CASE dst = prev → return weight,
    EXISTS(prev→dst) → neighbor weight, else far weight."""
    from fractions import Fraction
    from math import lcm

    wr_f = Fraction(1) / Fraction(p).limit_denominator(16)  # guards mirror
    wn_f = Fraction(1)                                       # the engine's
    wf_f = Fraction(1) / Fraction(q).limit_denominator(16)  # (walks.py)
    scale = lcm(wr_f.denominator, wn_f.denominator, wf_f.denominator)
    w_ret, w_nbr, w_far = (int(f * scale) for f in (wr_f, wn_f, wf_f))
    w_max = max(w_ret, w_nbr, w_far)
    k = walks_per_vertex
    ctes = [
        f"""s0 AS (
    SELECT v.id * {k} + j.j AS walk_id, CAST(NULL AS BIGINT) AS prev, v.id AS id
    FROM vertices v CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range({k})) j
)"""
    ]
    for t in range(1, walk_length + 1):
        h = _md5_60_duck(f"concat_ws('|', {seed}, walk_id, {t}, src, dst, r)")
        if t == 1:
            cand = f"""
        SELECT s.walk_id, e.src, e.dst, 1 AS w
        FROM s0 s JOIN edges e ON e.src = s.id"""
        else:
            cand = f"""
        SELECT s.walk_id, e.src, e.dst,
               CASE WHEN e.dst = s.prev THEN {w_ret}
                    WHEN EXISTS (SELECT 1 FROM edges pe
                                 WHERE pe.src = s.prev AND pe.dst = e.dst)
                        THEN {w_nbr}
                    ELSE {w_far} END AS w
        FROM s{t - 1} s JOIN edges e ON e.src = s.id"""
        ctes.append(
            f"""s{t} AS MATERIALIZED (
    SELECT walk_id, src AS prev, dst AS id
    FROM (
        SELECT c.walk_id, c.src, c.dst, r.r, {h} AS h
        FROM ({cand}) c
        JOIN (SELECT CAST(range AS BIGINT) + 1 AS r FROM range({w_max})) r
          ON r.r <= c.w
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY walk_id ORDER BY h, dst, r) = 1
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, id FROM s{t}"
        for t in range(walk_length + 1)
    )
    return f"WITH {EDGES_SQL},\n" + ",\n".join(ctes) + f"\n{union}"


def walks_sql(walk_length: int = 4, walks_per_vertex: int = 2, seed: int = 42) -> str:
    """Deterministic random walks — see _walks_ctes."""
    ctes, union = _walks_ctes(walk_length, walks_per_vertex, seed)
    return f"WITH {EDGES_SQL},\n{ctes}\n{union}"


def skipgrams_sql(
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    seed: int = 42,
    window: int = 2,
) -> str:
    """DuckDB twin of operators.walks.skipgram_pairs over the same
    deterministic corpus: the within-sentence position pairs the engine
    builds with nested array HOFs are exactly a self-join of the long-form
    walk rows on walk_id with 0 < |Δstep| ≤ window."""
    ctes, union = _walks_ctes(walk_length, walks_per_vertex, seed)
    return f"""
WITH {EDGES_SQL},
{ctes},
w AS MATERIALIZED ({union})
SELECT a.id AS center, b.id AS context, COUNT(*) AS n_pairs
FROM w a JOIN w b
  ON a.walk_id = b.walk_id AND a.step <> b.step
 AND abs(a.step - b.step) <= {int(window)}
GROUP BY 1, 2
"""


def scc_sql() -> str:
    """Strongly connected components by definition: scc(v) = MIN u with
    u→*v AND v→*u (self included) over the full reachability relation —
    the semantic spec operators/scc.py's FW-BW-Trim coloring must meet.
    O(V^2) pair state; gate scale only (V=2048)."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
reach(source, id) AS (
    SELECT v.id AS source, v.id AS id FROM vertices v
    UNION
    SELECT r.source, e.dst AS id FROM edges e JOIN reach r ON e.src = r.id
)
SELECT r1.id AS id, CAST(MIN(r1.source) AS BIGINT) AS scc
FROM reach r1 JOIN reach r2 ON r1.id = r2.source AND r1.source = r2.id
GROUP BY r1.id
"""


_SCC_CTES = """reach(source, id) AS (
    SELECT v.id AS source, v.id AS id FROM vertices v
    UNION
    SELECT r.source, e.dst AS id FROM edges e JOIN reach r ON e.src = r.id
),
sccs AS MATERIALIZED (
    SELECT r1.id AS id, CAST(MIN(r1.source) AS BIGINT) AS scc
    FROM reach r1 JOIN reach r2 ON r1.id = r2.source AND r1.source = r2.id
    GROUP BY r1.id
),
cond AS MATERIALIZED (
    SELECT DISTINCT ls.scc AS csrc, ld.scc AS cdst
    FROM edges e
    JOIN sccs ls ON e.src = ls.id
    JOIN sccs ld ON e.dst = ld.id
    WHERE ls.scc <> ld.scc
)"""


def condensation_sql() -> str:
    """DuckDB twin of operators/scc.py:condensation — distinct
    cross-component edges over the reachability-definition SCC labels."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
{_SCC_CTES}
SELECT csrc, cdst FROM cond
"""


def dag_layers_sql() -> str:
    """DuckDB twin of operators/scc.py:dag_layers — longest-path layer
    per SCC via an exhaustive walk over the condensation DAG (acyclic,
    so the recursion terminates without a depth bound)."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
{_SCC_CTES},
comps AS MATERIALIZED (SELECT DISTINCT scc FROM sccs),
walk(id, d) AS (
    SELECT scc AS id, CAST(0 AS BIGINT) AS d FROM comps
    UNION
    SELECT c.cdst AS id, w.d + 1 AS d FROM cond c JOIN walk w ON c.csrc = w.id
)
SELECT id AS scc, MAX(d) AS layer FROM walk GROUP BY id
"""


def bowtie_sql() -> str:
    """DuckDB twin of operators/scc.py:bowtie_census — SCC by the
    reachability definition (scc_sql's spec), largest-SCC core by
    (size DESC, scc ASC), forward/backward recursive sweeps from the
    core, counts partitioning V."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
reach(source, id) AS (
    SELECT v.id AS source, v.id AS id FROM vertices v
    UNION
    SELECT r.source, e.dst AS id FROM edges e JOIN reach r ON e.src = r.id
),
sccs AS MATERIALIZED (
    SELECT r1.id AS id, MIN(r1.source) AS scc
    FROM reach r1 JOIN reach r2 ON r1.id = r2.source AND r1.source = r2.id
    GROUP BY r1.id
),
core AS MATERIALIZED (
    SELECT id FROM sccs
    WHERE scc = (SELECT scc FROM sccs GROUP BY scc
                 ORDER BY COUNT(*) DESC, scc LIMIT 1)
),
fwd(id) AS (
    SELECT id FROM core
    UNION
    SELECT e.dst FROM edges e JOIN fwd f ON e.src = f.id
),
bwd(id) AS (
    SELECT id FROM core
    UNION
    SELECT e.src FROM edges e JOIN bwd b ON e.dst = b.id
)
SELECT (SELECT COUNT(*) FROM core) AS n_core,
       (SELECT COUNT(*) FROM bwd) - (SELECT COUNT(*) FROM core) AS n_in,
       (SELECT COUNT(*) FROM fwd) - (SELECT COUNT(*) FROM core) AS n_out,
       (SELECT COUNT(*) FROM vertices)
         - ((SELECT COUNT(*) FROM fwd) + (SELECT COUNT(*) FROM bwd)
            - (SELECT COUNT(*) FROM core)) AS n_other
"""


# ------------------------------------------------------------------ events
def funnel_sql(steps: list[str], within_seconds: int | None = 3600) -> str:
    """DuckDB twin of events.funnel: one MIN-aggregate CTE per step,
    each joined to the previous step's (user, t); greedy-earliest,
    strict ordering, integral-microsecond windows (epoch_us)."""
    w_us = None if within_seconds is None else int(within_seconds) * 1_000_000
    parts = [
        "ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events)",
        f"""s0 AS MATERIALIZED (
    SELECT user_id, MIN(t) AS t FROM ev
    WHERE event_type = '{steps[0]}' GROUP BY user_id
)""",
    ]
    for k, s in enumerate(steps[1:], start=1):
        win = "" if w_us is None else f" AND e.t - p.t <= {w_us}"
        parts.append(
            f"""s{k} AS MATERIALIZED (
    SELECT e.user_id, MIN(e.t) AS t
    FROM ev e JOIN s{k - 1} p ON e.user_id = p.user_id
    WHERE e.event_type = '{s}' AND e.t > p.t{win}
    GROUP BY e.user_id
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {k}::BIGINT AS step, '{s}' AS event_type, COUNT(*) AS n_users FROM s{k}"
        for k, s in enumerate(steps)
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
{union}
"""


def sessionize_sql(gap_seconds: int = 1800) -> str:
    """DuckDB twin of events.sessionize — identical (ts, event_id)
    ordering, integral-microsecond gap comparison (epoch_us ↔
    unix_micros; a seconds-truncating cast would diverge)."""
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
WITH marked AS (
    SELECT user_id, event_id, value, epoch_us(ts) AS t_us,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us}
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_id, value, t_us,
           CAST(SUM(brk) OVER (PARTITION BY user_id
                               ORDER BY t_us, event_id) + 1 AS BIGINT)
           AS session_id
    FROM marked
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(t_us) AS start_us,
       MAX(t_us) AS end_us,
       ROUND(SUM(value), 6) AS total_value
FROM sess
GROUP BY user_id, session_id
"""


def rectangles_sql() -> str:
    """DuckDB twin of operators/triangles.py:rectangle_count (uncapped) —
    co-degree identity: rectangles = Σ_{u<w} k·(k−1) / 4."""
    return f"""
WITH {EDGES_SQL},
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
sym AS MATERIALIZED (
    SELECT a AS c, b AS n FROM canon
    UNION ALL
    SELECT b AS c, a AS n FROM canon
),
codeg AS (
    SELECT l.n AS u, r.n AS w, COUNT(*) AS k
    FROM sym l JOIN sym r ON l.c = r.c AND l.n < r.n
    GROUP BY l.n, r.n
)
SELECT CAST(COALESCE(SUM(k * (k - 1)) / 4, 0) AS BIGINT) AS rectangles
FROM codeg
"""


def sample_edges_sql(rate: float, seed: int = 42) -> str:
    """DuckDB twin of operators/sampling.py:sample_edges."""
    t = int(rate * float(1 << 60))
    h = _md5_60_duck(
        f"'esamp:{seed}:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)"
    )
    return f"""
WITH {EDGES_SQL}
SELECT src, dst, weight FROM wedges WHERE {h} < {t}
"""


def sample_vertices_induced_sql(rate: float, seed: int = 42) -> str:
    """DuckDB twin of operators/sampling.py:sample_vertices_induced."""
    t = int(rate * float(1 << 60))

    def keep(col: str) -> str:
        h = _md5_60_duck(f"'vsamp:{seed}:' || CAST({col} AS VARCHAR)")
        return f"{h} < {t}"

    return f"""
WITH {EDGES_SQL}
SELECT src, dst, weight FROM wedges WHERE {keep("src")} AND {keep("dst")}
"""


def rmat_sql(
    scale: int = 8,
    n_edges: int = 2048,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
) -> str:
    """DuckDB twin of generate.rmat_edges — same md5-60 per-(edge, level)
    draw against the same integer thresholds, so the edge lists are
    bit-identical."""
    from linkgraph.generate import _thresholds

    ta, tab, tabc = _thresholds(a, b, c)
    src_terms, dst_terms = [], []
    for level in range(scale):
        u = _md5_60_duck(f"'{seed}|' || id || '|{level}'")
        shift = scale - 1 - level
        src_terms.append(f"(CASE WHEN {u} < {tab} THEN 0 ELSE {1 << shift} END)")
        dst_terms.append(
            f"(CASE WHEN {u} < {ta} OR ({u} >= {tab} AND {u} < {tabc}) "
            f"THEN 0 ELSE {1 << shift} END)"
        )
    return f"""
SELECT CAST({" + ".join(src_terms)} AS BIGINT) AS src,
       CAST({" + ".join(dst_terms)} AS BIGINT) AS dst
FROM (SELECT CAST(range AS BIGINT) AS id FROM range({n_edges}))
"""


def diameter_sql(root: int = 0, max_depth: int = 256) -> str:
    """DuckDB twin of operators/stats.py:diameter_lower_bound — two
    depth-bounded recursive walks over the symmetrized edges, the second
    rooted at the first's (dist DESC, id ASC) argmax. ``max_depth``
    carries bfs_sql's bound contract (tests/test_oracle_bounds.py)."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
sym AS (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
),
w1(id, dist) AS (
    SELECT CAST({root} AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
    UNION
    SELECT s.dst AS id, w.dist + 1 AS dist
    FROM sym s JOIN w1 w ON s.src = w.id
    WHERE w.dist < {max_depth}
),
d1 AS (SELECT id, MIN(dist) AS dist FROM w1 GROUP BY id),
far1 AS (SELECT id, dist FROM d1 ORDER BY dist DESC, id ASC LIMIT 1),
w2(id, dist) AS (
    SELECT id, CAST(0 AS BIGINT) AS dist FROM far1
    UNION
    SELECT s.dst AS id, w.dist + 1 AS dist
    FROM sym s JOIN w2 w ON s.src = w.id
    WHERE w.dist < {max_depth}
),
d2 AS (SELECT id, MIN(dist) AS dist FROM w2 GROUP BY id),
far2 AS (SELECT id, dist FROM d2 ORDER BY dist DESC, id ASC LIMIT 1)
SELECT CAST({root} AS BIGINT) AS root_id,
       f1.dist AS ecc_root,
       f1.id AS far_id,
       f2.id AS far2_id,
       f2.dist AS diameter_lb
FROM far1 f1 CROSS JOIN far2 f2
"""


def transitions_sql() -> str:
    """DuckDB twin of events.transitions — LEAD over the identical
    (ts, event_id) per-user order, pair counts, row-normalized."""
    return """
WITH pairs AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
),
cnt AS (
    SELECT from_type, to_type, COUNT(*) AS n
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM cnt
"""


def top_event_types_sql(bucket: str = "hour", k: int = 3) -> str:
    """DuckDB twin of events.top_event_types — identical count-then-rank
    with (n DESC, event_type ASC) ties."""
    return f"""
WITH counts AS (
    SELECT epoch_us(date_trunc('{bucket}', ts)) AS bucket_us,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT bucket_us, event_type, n, rank FROM (
    SELECT bucket_us, event_type, n,
           ROW_NUMBER() OVER (PARTITION BY bucket_us
                              ORDER BY n DESC, event_type ASC) AS rank
    FROM counts
) WHERE rank <= {k}
"""


def retention_sql(period: str = "week") -> str:
    """DuckDB twin of events.retention — same date_trunc buckets in
    epoch microseconds, same exact-multiple period arithmetic."""
    p_us = {"hour": 3_600_000_000, "day": 86_400_000_000, "week": 7 * 86_400_000_000}[
        period
    ]
    return f"""
WITH ub AS MATERIALIZED (
    SELECT DISTINCT user_id, epoch_us(date_trunc('{period}', ts)) AS bucket_us
    FROM events
),
cohort AS (
    SELECT user_id, MIN(bucket_us) AS cohort_us FROM ub GROUP BY user_id
),
active AS MATERIALIZED (
    SELECT c.cohort_us,
           CAST((u.bucket_us - c.cohort_us) / {p_us} AS BIGINT) AS period,
           COUNT(DISTINCT u.user_id) AS n_active
    FROM ub u JOIN cohort c ON u.user_id = c.user_id
    GROUP BY 1, 2
)
SELECT a.cohort_us, a.period, a.n_active, s.cohort_size,
       ROUND(a.n_active / s.cohort_size, 6) AS retention
FROM active a
JOIN (SELECT cohort_us, n_active AS cohort_size FROM active WHERE period = 0) s
  ON a.cohort_us = s.cohort_us
"""


def events_rollup_sql(bucket: str = "hour") -> str:
    return f"""
SELECT epoch_us(date_trunc('{bucket}', ts)) AS bucket_us,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 6) AS sum_value,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


def coloring_sql(seed: int = 42, rounds: int = 16) -> str:
    """DuckDB twin of operators.coloring.graph_coloring: ``rounds``
    unrolled Johansson random-palette rounds (per-(round, vertex) md5
    draw of the j-th available color in {0..deg} minus colored-neighbor
    colors via the order-statistic skip formula; the (p, id)-greater
    endpoint of any equal-color alive edge loses and retries). Rounds
    past exhaustion are no-ops, so any ``rounds`` >= the true round
    count is exact; the final INNER join makes a shortfall loud (missing
    rows), never a silent color-0 default — and the ENGINE runs to an
    empty alive set and raises if it fails to converge."""
    pri = _md5_60_duck(f"'color:{int(seed)}:' || CAST(id AS VARCHAR)")
    parts = [
        """canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
sym AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM canon
    UNION ALL SELECT b AS src, a AS dst FROM canon
),
dg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src)""",
        f"""a0 AS MATERIALIZED (
    SELECT v.id AS id, {pri.replace("(id", "(v.id")} AS p, COALESCE(d.deg, 0) AS deg
    FROM vertices v LEFT JOIN dg d ON v.id = d.id
)""",
        "c0 AS (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS INT) AS color WHERE FALSE)",
        "le0 AS MATERIALIZED (SELECT src, dst FROM sym)",
    ]
    for r in range(1, rounds + 1):
        draw = _md5_60_duck(f"'colorj:{int(seed)}:{r}:' || CAST(a.id AS VARCHAR)")
        parts.append(
            f"""nc{r} AS MATERIALIZED (
    SELECT id, ncolor,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY ncolor) - 1 AS rn
    FROM (SELECT DISTINCT e.src AS id, c.color AS ncolor
          FROM sym e
          JOIN c{r - 1} c ON e.dst = c.id
          JOIN a{r - 1} a ON e.src = a.id AND c.color <= a.deg)
),
u{r} AS MATERIALIZED (SELECT id, COUNT(*) AS m FROM nc{r} GROUP BY id),
tj{r} AS MATERIALIZED (
    SELECT a.id, a.p, a.deg,
           {draw} % (a.deg + 1 - COALESCE(u.m, 0)) AS j
    FROM a{r - 1} a LEFT JOIN u{r} u ON a.id = u.id
),
sh{r} AS MATERIALIZED (
    SELECT n.id, MAX(CASE WHEN n.ncolor - n.rn <= t.j THEN n.rn + 1 END) AS s
    FROM nc{r} n JOIN tj{r} t ON n.id = t.id
    GROUP BY n.id
),
t{r} AS MATERIALIZED (
    SELECT t.id, t.p, CAST(t.j + COALESCE(s.s, 0) AS INT) AS color
    FROM tj{r} t LEFT JOIN sh{r} s ON t.id = s.id
),
l{r} AS MATERIALIZED (
    SELECT DISTINCT e.src AS id
    FROM le{r - 1} e JOIN t{r} x ON e.src = x.id JOIN t{r} y ON e.dst = y.id
    WHERE x.color = y.color
      AND (y.p < x.p OR (y.p = x.p AND e.dst < e.src))
),
n{r} AS MATERIALIZED (
    SELECT t.id, t.color FROM t{r} t
    WHERE NOT EXISTS (SELECT 1 FROM l{r} l WHERE l.id = t.id)
),
c{r} AS MATERIALIZED (
    SELECT id, color FROM c{r - 1} UNION ALL SELECT id, color FROM n{r}
),
a{r} AS MATERIALIZED (
    SELECT a.id, a.p, a.deg FROM a{r - 1} a JOIN l{r} l ON a.id = l.id
),
le{r} AS MATERIALIZED (
    SELECT e.src, e.dst FROM le{r - 1} e
    JOIN l{r} x ON e.src = x.id JOIN l{r} y ON e.dst = y.id
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body}
SELECT v.id, c.color FROM vertices v JOIN c{rounds} c ON v.id = c.id
"""


def densest_sql(eps_num: int = 1, eps_den: int = 10, rounds: int = 40) -> str:
    """DuckDB twin of operators.densest.densest_subgraph: ``rounds``
    unrolled Bahmani peel rounds (integer-exact threshold
    d·nv·eps_den > (eps_den+eps_num)·ns), best level by the identical
    IEEE-double density expression with earliest-round tie-break. The
    peel strictly shrinks until empty, so any ``rounds`` ≥ the true peel
    depth is exact (later rounds are empty no-ops, excluded from the
    best-level argmax by ns > 0); the ENGINE peels to the actual empty
    set and raises if it fails to get there."""
    thresh = int(eps_den) + int(eps_num)
    parts = [
        """canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
e0 AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM canon
    UNION ALL SELECT b AS src, a AS dst FROM canon
),
s0 AS MATERIALIZED (SELECT COUNT(*) AS ns, COUNT(DISTINCT src) AS nv FROM e0)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""k{r} AS MATERIALIZED (
    SELECT src FROM e{r - 1} GROUP BY src
    HAVING COUNT(*) * (SELECT nv FROM s{r - 1}) * {int(eps_den)}
           > {thresh} * (SELECT ns FROM s{r - 1})
),
e{r} AS MATERIALIZED (
    SELECT e.src, e.dst FROM e{r - 1} e
    JOIN k{r} x ON e.src = x.src
    JOIN k{r} y ON e.dst = y.src
),
s{r} AS MATERIALIZED (SELECT COUNT(*) AS ns, COUNT(DISTINCT src) AS nv FROM e{r})"""
        )
    stats = "\n    UNION ALL ".join(
        f"SELECT {r} AS r, ns, nv FROM s{r}" for r in range(rounds + 1)
    )
    verts = "\n    UNION ALL ".join(
        f"SELECT DISTINCT src, {r} AS r FROM e{r}" for r in range(rounds + 1)
    )
    body = ",\n".join(parts)
    return f"""
WITH {EDGES_SQL},
{body},
stats AS ({stats}),
best AS (
    SELECT r, ns, nv FROM stats WHERE ns > 0
    ORDER BY CAST(ns AS DOUBLE) / (2 * nv) DESC, r ASC LIMIT 1
),
verts AS ({verts})
SELECT v.src AS id, ROUND(CAST(b.ns AS DOUBLE) / (2 * b.nv), 6) AS density
FROM verts v JOIN best b ON v.r = b.r
"""


# the paragraph-dedup gate fixture: the synthetic corpus is single-line,
# so BOTH engines plant the same shared header/footer paragraphs around
# each document's own text — doc_id % 7 headers repeat across ~N/7 docs,
# doc_id % 13 footers across ~N/13; the body survives unless the corpus
# has a planted exact-duplicate text (then removing it IS the correct
# paragraph-dedup answer). The Spark twin lives in
# __spark_entry__._para_fixture.
PARA_FIXTURE_SQL = (
    "SELECT doc_id, 'shared header ' || CAST(doc_id % 7 AS VARCHAR) || '.'"
    " || chr(10) || chr(10) || text || chr(10) || chr(10) ||"
    " 'shared footer ' || CAST(doc_id % 13 AS VARCHAR) || '.' AS text"
    " FROM documents"
)


def paragraph_dedup_sql(min_doc_freq: int = 2) -> str:
    """DuckDB twin of docs.paragraph_dedup over the planted-boilerplate
    fixture (PARA_FIXTURE_SQL): literal-separator split with positions,
    md5-60 paragraph hash, distinct-doc-frequency filter, ordered
    string_agg reassembly. COUNT(CASE …) not SUM for the audit column —
    DuckDB SUM(int) is HUGEINT, the engine emits BIGINT."""
    h = _md5_60_duck("u.para")
    return f"""
WITH base AS ({PARA_FIXTURE_SQL}),
sp AS (
    SELECT doc_id, string_split(text, chr(10) || chr(10)) AS parts FROM base
),
paras AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(parts) + 1),
               i -> struct_pack(pos := i, para := parts[i]))) AS u
    FROM sp
),
p2 AS (
    SELECT doc_id, u.pos AS pos, u.para AS para, {h} AS h FROM paras
),
dup AS (
    SELECT h FROM p2 GROUP BY h HAVING COUNT(DISTINCT doc_id) >= {int(min_doc_freq)}
)
SELECT p.doc_id,
       COALESCE(string_agg(CASE WHEN d.h IS NULL THEN p.para END,
                           chr(10) || chr(10) ORDER BY p.pos), '') AS text,
       COUNT(CASE WHEN d.h IS NOT NULL THEN 1 END) AS removed_paras
FROM p2 p LEFT JOIN dup d USING (h)
GROUP BY p.doc_id
"""


def quantile_buckets_sql(score_col: str = "n_chars", buckets: int = 10) -> str:
    """DuckDB twin of docs.quantile_buckets: single-node, so the two-level
    prefix sum collapses to one ROW_NUMBER window; identical (score, id)
    sort key and integer bucket arithmetic (// floor division — the
    engine's `div`)."""
    return f"""
WITH r AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY {score_col}, doc_id) - 1 AS rnk
    FROM documents
)
SELECT doc_id, rnk AS "rank",
       CAST((rnk * {int(buckets)}) // (SELECT COUNT(*) FROM documents) AS INT) AS bucket
FROM r
"""


def community_graph_sql(iterations: int = 5) -> str:
    """DuckDB twin of operators.stats.community_graph over the labelprop
    partition: contract the canonical undirected simple edge set onto
    community labels; (c_a <= c_b, n_edges), intra edges on the
    diagonal."""
    return f"""
WITH {EDGES_SQL},
{_labelprop_ctes(iterations)},
lab AS MATERIALIZED (SELECT id, label FROM l{iterations}),
canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
)
SELECT LEAST(x.label, y.label) AS c_a,
       GREATEST(x.label, y.label) AS c_b,
       COUNT(*) AS n_edges
FROM canon c JOIN lab x ON c.a = x.id JOIN lab y ON c.b = y.id
GROUP BY 1, 2
"""


def rich_club_sql(k: int) -> str:
    """DuckDB twin of operators.stats.rich_club: density among vertices
    of undirected simple degree > k; 0.0 when fewer than 2 such
    vertices."""
    return f"""
WITH {EDGES_SQL},
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS (
    SELECT id, COUNT(*) AS d FROM (
        SELECT a AS id FROM canon UNION ALL SELECT b AS id FROM canon
    ) GROUP BY id
),
rich AS MATERIALIZED (SELECT id FROM deg WHERE d > {int(k)}),
nr AS (SELECT COUNT(*) AS n FROM rich),
ek AS (
    SELECT COUNT(*) AS e FROM canon
    WHERE a IN (SELECT id FROM rich) AND b IN (SELECT id FROM rich)
)
SELECT CAST({int(k)} AS INT) AS k,
       nr.n AS n_rich,
       ROUND(CASE WHEN nr.n >= 2
                  THEN 2.0 * ek.e / (nr.n * (nr.n - 1.0))
                  ELSE 0.0 END, 6) AS rich_club
FROM nr, ek
"""


def ego_network_sql(seeds: "list[int]", hops: int = 2) -> str:
    """DuckDB twin of operators.sampling.ego_network: unrolled
    ``hops``-round frontier expansion over the symmetrized edge set,
    then the induced DISTINCT directed edges with both endpoints in the
    ball."""
    seed_rows = ", ".join(f"({int(s)})" for s in sorted({int(s) for s in seeds}))
    ctes = [
        f"r0 AS (SELECT CAST(id AS BIGINT) AS id FROM (VALUES {seed_rows}) AS t(id))"
    ]
    for h in range(1, hops + 1):
        ctes.append(
            f"""r{h} AS (
    SELECT DISTINCT id FROM (
        SELECT id FROM r{h - 1}
        UNION ALL
        SELECT s.dst AS id FROM sym s JOIN r{h - 1} r ON s.src = r.id
    )
)"""
        )
    return f"""
WITH {EDGES_SQL},
sym AS (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
),
{", ".join(ctes)}
SELECT DISTINCT e.src, e.dst
FROM edges e
JOIN r{hops} x ON e.src = x.id
JOIN r{hops} y ON e.dst = y.id
"""


def language_id_sql() -> str:
    """DuckDB twin of docs.language_id: same whitespace tokenization, same
    marker lists (imported constant — shared data, like the md5 seeds),
    same argmax with declaration-order tie-break (zero-hit docs → 'en')."""
    from linkgraph.docs import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    hits = []
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        hits.append(f"len(list_filter(t, x -> x IN ({lst}))) AS s_{lang}")
    # argmax with earlier-language tie-break: lang i wins iff its hits are
    # >= every LATER language's hits (earlier ones already failed their turn)
    guess = "CASE\n"
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{o}" for o in langs[i + 1:])
        guess += f"    WHEN {conds} THEN '{lang}'\n"
    guess += f"    ELSE '{langs[-1]}' END"
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    cols = ",\n           ".join(hits)
    return f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS t
    FROM documents
),
scored AS (
    SELECT doc_id, len(t) AS n,
           {cols}
    FROM toks
)
SELECT doc_id,
       {guess} AS lang_guess,
       ROUND({best} / NULLIF(CAST(n AS DOUBLE), 0.0), 6) AS lang_score
FROM scored
"""


def cliques4_sql() -> str:
    """DuckDB twin of operators.triangles.four_clique_count: the flat
    6-edge join over the canonical a<b simple edge set — each id-ordered
    4-tuple {u<v<w<x} with all six edges present counted once. An
    independent formulation (no orientation, no adjacency arrays)."""
    return f"""
WITH {EDGES_SQL},
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS cliques4
FROM canon e1
JOIN canon e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN canon e3 ON e3.a = e1.b AND e3.b = e2.b
JOIN canon e4 ON e4.a = e1.a AND e4.b > e2.b
JOIN canon e5 ON e5.a = e1.b AND e5.b = e4.b
JOIN canon e6 ON e6.a = e2.b AND e6.b = e4.b
"""


def _common_neighbor_pairs_sql(center: str, side: str, top_k: int) -> str:
    """Shared tail for the co-citation / coupling twins: pair count over
    wedge centers on the directed simple (self-loop-free) edge set,
    deterministic (c DESC, a, b) top-k."""
    return f"""
WITH {EDGES_SQL},
simple AS (SELECT src, dst FROM edges WHERE src <> dst),
pairs AS (
    SELECT e1.{side} AS a, e2.{side} AS b, COUNT(*) AS c
    FROM simple e1 JOIN simple e2
      ON e1.{center} = e2.{center} AND e1.{side} < e2.{side}
    GROUP BY 1, 2
)
SELECT a, b, c FROM pairs ORDER BY c DESC, a, b LIMIT {int(top_k)}
"""


def cocitation_sql(top_k: int = 50) -> str:
    """DuckDB twin of operators.cocitation.cocitation: top-k pairs by
    common in-neighbor count (wedge center = src), uncapped."""
    return _common_neighbor_pairs_sql("src", "dst", top_k)


def coupling_sql(top_k: int = 50) -> str:
    """DuckDB twin of operators.cocitation.bibliographic_coupling: top-k
    pairs by common out-neighbor count (wedge center = dst), uncapped."""
    return _common_neighbor_pairs_sql("dst", "src", top_k)


def eigenvector_sql(iterations: int = 10) -> str:
    """Unrolled power iteration x ← L2-normalize(Aᵀx) — the DuckDB twin
    of operators/hits.py::eigenvector_centrality. Round CTEs fan out
    (norm agg + projection) → AS MATERIALIZED, the hits_sql hazard."""
    parts = ["x0 AS MATERIALIZED (SELECT id, 1.0 AS v FROM vertices)"]
    for k in range(1, iterations + 1):
        parts.append(
            f"""rr{k} AS MATERIALIZED (
    SELECT e.dst AS id, SUM(x.v) AS s
    FROM edges e JOIN x{k - 1} x ON e.src = x.id GROUP BY e.dst
),
n{k} AS MATERIALIZED (SELECT SQRT(SUM(s * s)) AS nrm FROM rr{k}),
x{k} AS MATERIALIZED (
    SELECT v.id, COALESCE(r.s, 0.0) / n.nrm AS v
    FROM vertices v LEFT JOIN rr{k} r ON v.id = r.id CROSS JOIN n{k} n
)"""
        )
    return f"""
WITH {EDGES_SQL},
{",".join(parts)}
SELECT id, ROUND(v, 6) AS eig FROM x{iterations}
"""


def salsa_sql(iterations: int = 5) -> str:
    """Unrolled SALSA power iteration — the DuckDB twin of
    operators/hits.py::salsa. hits_sql's round shape with the
    random-walk edge weights (1/outdeg(src), 1/indeg(dst)) joined in
    once, and L1 norms in place of L2. AS MATERIALIZED on the fan-out
    CTEs for the same re-inlining hazard hits_sql documents."""
    parts = [
        """outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ind AS (SELECT dst, COUNT(*) AS idg FROM edges GROUP BY dst),
ew AS MATERIALIZED (
    SELECT e.src, e.dst, 1.0 / o.od AS wa, 1.0 / i.idg AS wh
    FROM edges e
    JOIN outd o ON e.src = o.src
    JOIN ind i ON e.dst = i.dst
),
h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM vertices)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
    SELECT e.dst AS id, SUM(e.wa * h.hub) AS s
    FROM ew e JOIN h{i - 1} h ON e.src = h.id GROUP BY e.dst
),
an{i} AS MATERIALIZED (SELECT SUM(ABS(s)) AS nrm FROM ar{i}),
a{i} AS MATERIALIZED (
    SELECT v.id, COALESCE(r.s, 0.0) / n.nrm AS auth
    FROM vertices v LEFT JOIN ar{i} r ON v.id = r.id CROSS JOIN an{i} n
),
hr{i} AS MATERIALIZED (
    SELECT e.src AS id, SUM(e.wh * a.auth) AS s
    FROM ew e JOIN a{i} a ON e.dst = a.id GROUP BY e.src
),
hn{i} AS MATERIALIZED (SELECT SUM(ABS(s)) AS nrm FROM hr{i}),
h{i} AS MATERIALIZED (
    SELECT v.id, COALESCE(r.s, 0.0) / n.nrm AS hub
    FROM vertices v LEFT JOIN hr{i} r ON v.id = r.id CROSS JOIN hn{i} n
)"""
        )
    return f"""
WITH {EDGES_SQL},
{",".join(parts)}
SELECT a.id, ROUND(a.auth, 6) AS auth, ROUND(h.hub, 6) AS hub
FROM a{iterations} a JOIN h{iterations} h ON a.id = h.id
"""


def onion_sql(rounds: int = 60) -> str:
    """DuckDB twin of operators.kcore.onion_decomposition: ``rounds``
    unrolled peel layers. Each round: alive degrees (isolated alive
    vertices at 0), running threshold c_r = max(c_{r-1}, min alive
    degree), layer split, both-endpoint edge prune. Rounds past the
    exhaustion of the vertex set are no-ops (empty alive set → NULL min
    coalesced to the previous core, empty layer), so any ``rounds`` ≥
    the true layer count is exact — measured 17 layers at sf0.001 and
    48 at sf0.01; the ENGINE side runs to the actual empty-set fixpoint
    and raises if it exceeds its bound, so a deeper gate graph fails
    loudly. AS MATERIALIZED throughout: every round CTE fans out
    (degree agg + threshold scalar + layer split + edge prune)."""
    parts = [
        """canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
e0 AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM canon
    UNION ALL
    SELECT b AS src, a AS dst FROM canon
),
v0 AS MATERIALIZED (SELECT id FROM vertices),
c0 AS (SELECT 0 AS core)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
    SELECT v.id, COALESCE(g.d, 0) AS d
    FROM v{r - 1} v
    LEFT JOIN (SELECT src AS id, COUNT(*) AS d FROM e{r - 1} GROUP BY src) g
      ON v.id = g.id
),
c{r} AS MATERIALIZED (
    SELECT GREATEST((SELECT core FROM c{r - 1}),
                    COALESCE((SELECT MIN(d) FROM d{r}),
                             (SELECT core FROM c{r - 1}))) AS core
),
r{r} AS MATERIALIZED (
    SELECT id, {r} AS layer, (SELECT core FROM c{r}) AS onion_core
    FROM d{r} WHERE d <= (SELECT core FROM c{r})
),
v{r} AS MATERIALIZED (
    SELECT id FROM d{r} WHERE d > (SELECT core FROM c{r})
),
e{r} AS MATERIALIZED (
    SELECT e.src, e.dst FROM e{r - 1} e
    JOIN v{r} x ON e.src = x.id
    JOIN v{r} y ON e.dst = y.id
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM r{r}" for r in range(1, rounds + 1))
    return f"""
WITH {EDGES_SQL},
{",".join(parts)}
SELECT CAST(id AS BIGINT) AS id, CAST(layer AS BIGINT) AS layer,
       CAST(onion_core AS BIGINT) AS onion_core
FROM ({union})
"""


def vocab_stats_sql() -> str:
    """DuckDB twin of docs.vocab_stats: the shared explicit-class
    whitespace tokenizer, (lang, term) counts, per-lang vocabulary
    aggregates with 6-dp ratios. SUM is cast back to BIGINT (DuckDB
    widens BIGINT sums to HUGEINT; the engine column is long)."""
    return """
WITH toks AS (
    SELECT lang,
           unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS term
    FROM documents
),
counts AS (
    SELECT lang, term, COUNT(*) AS c FROM toks WHERE term <> '' GROUP BY 1, 2
),
per_lang AS (
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS total_tokens,
           COUNT(*) AS distinct_types,
           COUNT(*) FILTER (c = 1) AS hapax_types
    FROM counts GROUP BY lang
),
nd AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
SELECT nd.lang,
       nd.n_docs,
       COALESCE(p.total_tokens, 0) AS total_tokens,
       COALESCE(p.distinct_types, 0) AS distinct_types,
       COALESCE(p.hapax_types, 0) AS hapax_types,
       ROUND(p.distinct_types / NULLIF(p.total_tokens * 1.0, 0.0), 6) AS type_token_ratio,
       ROUND(p.hapax_types / NULLIF(p.distinct_types * 1.0, 0.0), 6) AS hapax_ratio
FROM nd LEFT JOIN per_lang p ON nd.lang = p.lang
"""


def ngram_novelty_sql(k: int = 8) -> str:
    """DuckDB twin of docs.ngram_novelty: the shared distinct md5-60
    shingle CTE, doc-frequency over hashes, per-doc novel fraction."""
    return f"""
WITH {_shingles_cte(k)},
dfreq AS (SELECT x, COUNT(*) AS df FROM sh GROUP BY x),
per AS (
    SELECT s.doc_id, COUNT(*) AS n_shingles,
           COUNT(*) FILTER (d.df = 1) AS novel
    FROM sh s JOIN dfreq d ON s.x = d.x GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_shingles, 0) AS n_shingles,
       CASE WHEN p.n_shingles > 0
            THEN ROUND(p.novel / (p.n_shingles * 1.0), 6)
            ELSE 0.0 END AS novel_frac
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def landmarks_sql(num_landmarks: int = 4, max_depth: int = 8) -> str:
    """DuckDB twin of operators/landmarks.py::landmark_distances — degree
    TakeOrdered landmark pick (d DESC, id ASC), then the harmonic_sql
    seed-dimensioned recursive walk from those seeds."""
    return f"""
WITH RECURSIVE {EDGES_SQL},
deg AS (
    SELECT v.id, COALESCE(o.c, 0) + COALESCE(i.c, 0) AS d
    FROM vertices v
    LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges GROUP BY src) o ON v.id = o.src
    LEFT JOIN (SELECT dst, COUNT(*) AS c FROM edges GROUP BY dst) i ON v.id = i.dst
),
lm AS (SELECT id FROM deg ORDER BY d DESC, id LIMIT {num_landmarks}),
walk(landmark, id, dist) AS (
    SELECT id AS landmark, id, CAST(0 AS BIGINT) AS dist FROM lm
    UNION
    SELECT w.landmark, e.dst AS id, w.dist + 1 AS dist
    FROM edges e JOIN walk w ON e.src = w.id
    WHERE w.dist < {max_depth}
)
SELECT landmark, id, MIN(dist) AS dist FROM walk GROUP BY landmark, id
"""


def powerlaw_sql(d_min: int = 2) -> str:
    """DuckDB twin of stats.degree_powerlaw — the canonical-undirected
    distinct-neighbor degree CTE + the CSN continuous-MLE aggregate."""
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS (
    SELECT id, COUNT(*) AS d FROM (
        SELECT a AS id FROM canon UNION ALL SELECT b AS id FROM canon
    ) GROUP BY id HAVING COUNT(*) >= {d_min}
)
SELECT ROUND(1.0 + COUNT(*) / SUM(LN(d / ({d_min} - 0.5))), 6) AS alpha,
       CAST({d_min} AS BIGINT) AS d_min,
       COUNT(*) AS n_tail,
       MAX(d) AS d_max
FROM deg
"""


def event_anomaly_sql(bucket: str = "hour", top_k: int = 20) -> str:
    """DuckDB twin of events.anomalies — identical avg-of-squares
    variance expression, round-before-rank |z| order."""
    return f"""
WITH counts AS (
    SELECT event_type, epoch_us(date_trunc('{bucket}', ts)) AS bucket_us,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, AVG(n_events) AS mu,
           AVG(n_events * n_events) AS msq
    FROM counts GROUP BY event_type
)
SELECT c.event_type, c.bucket_us, c.n_events,
       ROUND((c.n_events - s.mu) / SQRT(s.msq - s.mu * s.mu), 6) AS z
FROM counts c JOIN stats s ON c.event_type = s.event_type
WHERE s.msq - s.mu * s.mu > 0
ORDER BY ABS(ROUND((c.n_events - s.mu) / SQRT(s.msq - s.mu * s.mu), 6)) DESC,
         c.event_type, c.bucket_us
LIMIT {top_k}
"""


def spam_mass_sql(trusted: "list[int]", iterations: int = 10) -> str:
    """DuckDB twin of operators.spam_mass: the pagerank_sql unroll and the
    personalized_pagerank_sql unroll over one shared deg/ne, combined as
    ROUND((pr − tr)/pr, 6) — identical IEEE expression order to Spark."""
    srcs = sorted({int(s) for s in trusted})
    b = repr(0.15 / len(srcs))
    in_list = ", ".join(str(s) for s in srcs)
    g_rounds, t_rounds = [], []
    for k in range(1, iterations + 1):
        g_rounds.append(
            f"""g{k} AS (
    SELECT v.id, {_TELEPORT} + 0.85 * COALESCE(m.mass, 0.0) AS pr
    FROM vertices v
    LEFT JOIN (
        SELECT ne.dst AS id, SUM(r.pr * ne.w) AS mass
        FROM ne JOIN g{k - 1} r ON ne.src = r.id GROUP BY ne.dst
    ) m ON v.id = m.id
)"""
        )
        t_rounds.append(
            f"""t{k} AS (
    SELECT v.id, v.base, v.base + 0.85 * COALESCE(m.mass, 0.0) AS pr
    FROM tbase v
    LEFT JOIN (
        SELECT ne.dst AS id, SUM(r.pr * ne.w) AS mass
        FROM ne JOIN t{k - 1} r ON ne.src = r.id GROUP BY ne.dst
    ) m ON v.id = m.id
)"""
        )
    return f"""
WITH {EDGES_SQL},
deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ne AS (SELECT e.src, e.dst, 1.0 / d.od AS w FROM edges e JOIN deg d ON e.src = d.src),
g0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS pr FROM vertices),
tbase AS (
    SELECT id, CASE WHEN id IN ({in_list}) THEN CAST({b} AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS base
    FROM vertices
),
t0 AS (SELECT id, base, base AS pr FROM tbase),
{",".join(g_rounds)},
{",".join(t_rounds)}
SELECT g.id, ROUND(g.pr, 6) AS pr, ROUND(t.pr, 6) AS trust,
       ROUND((g.pr - t.pr) / g.pr, 6) AS spam_mass
FROM g{iterations} g JOIN t{iterations} t ON g.id = t.id
"""


def ppr_sweep_sql(source: int, iterations: int = 10, k: int = 64) -> str:
    """DuckDB twin of operators.localcluster.ppr_sweep: the single-source
    personalized_pagerank_sql unroll, ROUND(pr/deg, 9) sweep order, the
    same min/max-position crossing histograms and prefix cumulative
    sums, phi rounded at 6 dp."""
    far = k + 1
    rounds = []
    for r in range(1, iterations + 1):
        rounds.append(
            f"""t{r} AS (
    SELECT v.id, v.base, v.base + 0.85 * COALESCE(m.mass, 0.0) AS pr
    FROM tbase v
    LEFT JOIN (
        SELECT ne.dst AS id, SUM(r.pr * ne.w) AS mass
        FROM ne JOIN t{r - 1} r ON ne.src = r.id GROUP BY ne.dst
    ) m ON v.id = m.id
)"""
        )
    return f"""
WITH {EDGES_SQL},
odeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ne AS (SELECT e.src, e.dst, 1.0 / d.od AS w
       FROM edges e JOIN odeg d ON e.src = d.src),
tbase AS (
    SELECT id, CASE WHEN id = {int(source)} THEN CAST(0.15 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS base
    FROM vertices
),
t0 AS (SELECT id, base, base AS pr FROM tbase),
{",".join(rounds)},
canon AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS (
    SELECT id, COUNT(*) AS d FROM (
        SELECT a AS id FROM canon UNION ALL SELECT b AS id FROM canon
    ) GROUP BY id
),
mm AS (SELECT COUNT(*) AS m FROM canon),
keyed AS (
    SELECT p.id, g.d, ROUND(p.pr / g.d, 9) AS key
    FROM t{iterations} p JOIN deg g ON p.id = g.id
    WHERE p.pr > 0
),
topk AS MATERIALIZED (
    SELECT id, d, pos FROM (
        SELECT id, d, ROW_NUMBER() OVER (ORDER BY key DESC, id) AS pos
        FROM keyed
    ) WHERE pos <= {k}
),
xing AS (
    SELECT LEAST(COALESCE(pa.pos, {far}), COALESCE(pb.pos, {far})) AS pmin,
           GREATEST(COALESCE(pa.pos, {far}), COALESCE(pb.pos, {far})) AS pmax
    FROM canon c
    LEFT JOIN topk pa ON c.a = pa.id
    LEFT JOIN topk pb ON c.b = pb.id
),
hmin AS (SELECT pmin AS pos, COUNT(*) AS n_min FROM xing
         WHERE pmin <= {k} GROUP BY 1),
hmax AS (SELECT pmax AS pos, COUNT(*) AS n_max FROM xing
         WHERE pmax <= {k} GROUP BY 1),
sweep AS (
    SELECT t.pos, t.id,
           SUM(COALESCE(h1.n_min, 0)) OVER (ORDER BY t.pos)
             - SUM(COALESCE(h2.n_max, 0)) OVER (ORDER BY t.pos) AS cut,
           SUM(t.d) OVER (ORDER BY t.pos) AS vol
    FROM topk t
    LEFT JOIN hmin h1 ON t.pos = h1.pos
    LEFT JOIN hmax h2 ON t.pos = h2.pos
)
SELECT s.pos, s.id, CAST(s.cut AS BIGINT) AS cut, CAST(s.vol AS BIGINT) AS vol,
       CASE WHEN LEAST(s.vol, 2 * mm.m - s.vol) > 0
            THEN ROUND(s.cut / CAST(LEAST(s.vol, 2 * mm.m - s.vol) AS DOUBLE), 6)
            ELSE 0.0 END AS phi
FROM sweep s CROSS JOIN mm
"""


def active_users_sql(bucket: str = "hour", window_buckets: int = 24) -> str:
    """DuckDB twin of events.active_users — same dedup-to-pairs,
    grid-interval-join, exact distinct re-aggregate."""
    width = {
        "minute": 60,
        "hour": 3600,
        "day": 86400,
        "week": 7 * 86400,
    }[bucket] * 1_000_000
    span = int(window_buckets) * width
    return f"""
WITH pairs AS (
    SELECT DISTINCT user_id,
           epoch_us(date_trunc('{bucket}', ts)) AS bucket_us
    FROM events
),
grid AS (SELECT DISTINCT bucket_us AS g_us FROM pairs),
rolling AS (
    SELECT g.g_us, COUNT(DISTINCT p.user_id) AS n_active_rolling
    FROM pairs p JOIN grid g
      ON p.bucket_us <= g.g_us AND p.bucket_us > g.g_us - {span}
    GROUP BY g.g_us
),
per_bucket AS (
    SELECT bucket_us, COUNT(DISTINCT user_id) AS n_active
    FROM pairs GROUP BY bucket_us
)
SELECT b.bucket_us, b.n_active, r.n_active_rolling
FROM per_bucket b JOIN rolling r ON b.bucket_us = r.g_us
"""


def pq_knn_sql(
    query_vec_id: int = 0,
    k: int = 10,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB twin of similarity.pq_topk (ADC over md5-seeded product
    codebooks): seeds are the K vectors with smallest md5(vec_id)
    (j = rank, same seeding as ivf_knn_sql); subspace m's codebook is the
    1-based slice [m*sub+1 : (m+1)*sub]; encode = per-(vec,m) argmin of
    the 6-dp-rounded squared L2 with ties to the smaller j; ADC = sum of
    the query's 6-dp-rounded partial distances at the encoded cells,
    rounded to 6 dp; ascending, ties to the smaller vec_id, query
    excluded. list_sum folds in index order, matching the engine's
    zip_with/aggregate fold bit-for-bit before rounding."""
    sub = dim // num_subspaces
    return f"""
WITH seeds AS (
    SELECT embedding::DOUBLE[] AS v,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
    FROM embeddings
    QUALIFY j < {codes_per_subspace}
),
mtab AS (SELECT CAST(m AS INT) AS m FROM range(0, {num_subspaces}) t(m)),
books AS (
    SELECT mtab.m, seeds.j,
           (seeds.v)[mtab.m * {sub} + 1 : (mtab.m + 1) * {sub}] AS bvec
    FROM seeds CROSS JOIN mtab
),
slices AS (
    SELECT vec_id, mtab.m,
           (embedding::DOUBLE[])[mtab.m * {sub} + 1 : (mtab.m + 1) * {sub}] AS sv
    FROM embeddings CROSS JOIN mtab
),
enc AS (
    SELECT vec_id, m, j AS code FROM (
        SELECT s.vec_id, s.m, b.j,
               ROUND(list_sum(list_transform(list_zip(s.sv, b.bvec),
                     x -> (x[1] - x[2]) * (x[1] - x[2]))), 6) AS d
        FROM slices s JOIN books b USING (m)
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, j ASC) = 1
),
lut AS (
    SELECT s.m, b.j AS code,
           ROUND(list_sum(list_transform(list_zip(s.sv, b.bvec),
                 x -> (x[1] - x[2]) * (x[1] - x[2]))), 6) AS pd
    FROM slices s JOIN books b USING (m)
    WHERE s.vec_id = {query_vec_id}
)
SELECT e.vec_id, ROUND(SUM(l.pd), 6) AS adist
FROM enc e JOIN lut l USING (m, code)
WHERE e.vec_id <> {query_vec_id}
GROUP BY e.vec_id
ORDER BY adist ASC, e.vec_id ASC
LIMIT {k}
"""


def simrank_sql(
    iterations: int = 3,
    decay: float = 0.8,
    top_k: int = 50,
    num_vertices: int | None = None,
) -> str:
    """Unrolled SimRank fixpoint (operators/simrank.py): per round, the
    previous OFF-DIAGONAL canonical scores are expanded to both
    orientations plus the implicit diagonal (s(i,i)=1), pushed through
    one in-edge join per side, re-canonicalized (a < b) and scaled by
    C/(|I(a)|·|I(b)|). The cut line orders by the ROUNDED score (the
    adamic_adar convention) so both engines agree despite float
    summation order. ``num_vertices`` gates on the induced subgraph of
    ids < num_vertices (the gate runs V=256 — exact all-pairs SimRank is
    quadratic by construction, so the cut keeps both engines linear-ish)."""
    v = num_vertices if num_vertices is not None else NUM_VERTICES
    parts = [
        f"""ein AS MATERIALIZED (
    SELECT src AS i, dst AS v FROM edges WHERE src < {v} AND dst < {v}
),
verts AS (SELECT CAST(range AS BIGINT) AS id FROM range({v})),
ind AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM ein GROUP BY v),
s0 AS (SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b,
              CAST(NULL AS DOUBLE) AS s WHERE FALSE)"""
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f"""p{k} AS (
    SELECT a AS pa, b AS pb, s FROM s{k - 1}
    UNION ALL
    SELECT b AS pa, a AS pb, s FROM s{k - 1}
    UNION ALL
    SELECT id AS pa, id AS pb, 1.0 AS s FROM verts
),
s{k} AS MATERIALIZED (
    SELECT ea.v AS a, eb.v AS b,
           {decay} * SUM(p.s) / (da.d * db.d) AS s
    FROM p{k} p
    JOIN ein ea ON ea.i = p.pa
    JOIN ein eb ON eb.i = p.pb
    JOIN ind da ON da.v = ea.v
    JOIN ind db ON db.v = eb.v
    WHERE ea.v < eb.v
    GROUP BY ea.v, eb.v, da.d, db.d
)"""
        )
    return f"""
WITH {EDGES_SQL},
{",".join(parts)}
SELECT a, b, ROUND(s, 6) AS sim FROM s{iterations}
ORDER BY sim DESC, a ASC, b ASC
LIMIT {top_k}
"""


def backbone_sql(alpha: float = 0.05) -> str:
    """DuckDB twin of operators/backbone.py::disparity_backbone — the
    Serrano-Boguñá-Vespignani filter over the canonical undirected
    synthetic-weight edges. Strengths are exact (integer-valued
    weights), the significance test compares the α rounded to 9
    decimals (java Math.pow vs libm pow last-ulp guard), and the
    degenerate s = 0 endpoint (all-zero incident weights) pins α = 1
    instead of a NaN whose ordering differs across engines."""
    return f"""
WITH {EDGES_SQL},
canon AS (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
ew AS (SELECT a, b, CAST(a % 10 + b % 10 AS DOUBLE) AS w FROM canon),
inc AS (
    SELECT a AS v, w FROM ew
    UNION ALL
    SELECT b AS v, w FROM ew
),
vs AS (SELECT v, SUM(w) AS s, COUNT(*) AS k FROM inc GROUP BY v),
sig AS (
    SELECT e.a, e.b, e.w,
           ROUND(LEAST(
               CASE WHEN va.s > 0
                    THEN POWER(1.0 - e.w / va.s, va.k - 1) ELSE 1.0 END,
               CASE WHEN vb.s > 0
                    THEN POWER(1.0 - e.w / vb.s, vb.k - 1) ELSE 1.0 END
           ), 9) AS am
    FROM ew e JOIN vs va ON va.v = e.a JOIN vs vb ON vb.v = e.b
)
SELECT a, b, w AS weight, ROUND(am, 6) AS alpha_min
FROM sig WHERE am < {alpha}
ORDER BY a ASC, b ASC
"""
