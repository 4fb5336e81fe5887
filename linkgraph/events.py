"""Batch event-stream analytics over the ``events`` table — the batch
siblings of linkgraph.streaming (stream_sessionize et al.), for the
backfill/replay half of a lambda pipeline.

Input schema (TESTDATA.md): events(event_id, ts: timestamp, user_id,
event_type, value, props).

Scale notes: both operators are single-shuffle — sessionize shuffles
once on user_id (the window and the session aggregate share that
partitioning, Catalyst plans one exchange), rollup is one partial-
aggregated groupBy. Timestamps are compared in integral MICROSECONDS
on both engine and oracle. The parquet ``ts`` is TIMESTAMP_NTZ, so the
micros expression is ``timestampdiff(MICROSECOND, ntz-epoch, ts)`` —
timezone-INDEPENDENT, matching DuckDB's naive ``epoch_us`` no matter
the session timezone (``unix_micros(cast(ts as timestamp))`` would
shift by the session zone; a plain long cast truncates to seconds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ntz_micros(col: Column) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ, timezone-independent."""
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: a user's events ordered by (ts,
    event_id) split into sessions wherever the inter-event gap exceeds
    ``gap_seconds``. Returns one row per session:

        (user_id, session_id, n_events, start_us, end_us, total_value)

    session_id numbers a user's sessions from 1 in time order; bounds
    are epoch microseconds (engine-neutral, unlike rendered timestamps);
    total_value is rounded to 6 dp. Same gap semantics as
    streaming.stream_sessionize, without the watermark machinery."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _ntz_micros(F.col("ts"))
    gap_us = int(gap_seconds) * 1_000_000
    new_sess = (
        F.when(us - F.lag(us).over(w) > F.lit(gap_us), 1)
        .otherwise(0)  # first event: lag is null → otherwise-branch 0
    )
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        us.alias("t_us"),
        new_sess.alias("brk"),
    ).withColumn("session_id", F.sum("brk").over(w) + 1)
    return (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("t_us").alias("start_us"),
            F.max("t_us").alias("end_us"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def rollup(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Time-bucketed rollup — the hypertable continuous-aggregate shape:

        (bucket_us, event_type, n_events, n_users, sum_value, avg_value)

    one row per (date_trunc(bucket, ts), event_type); n_users is an
    exact COUNT(DISTINCT user_id) (swap in approx_count_distinct at
    100 TB — noted, not defaulted, so the oracle matches exactly);
    floats rounded to 6 dp."""
    return (
        events.groupBy(
            _ntz_micros(F.date_trunc(bucket, F.col("ts"))).alias("bucket_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int | None = 3600,
) -> DataFrame:
    """Ordered-sequence funnel: (step, event_type, n_users) — how many
    users complete the first k steps of ``steps`` in time order, each
    step STRICTLY after the previous matched one and (when
    ``within_seconds`` is set) within that many seconds of it.

    Matching is greedy-earliest FIRST-TOUCH (step k's match = the user's
    earliest event qualifying against the greedily-matched step k−1) —
    the standard product-analytics funnel semantics, fully deterministic.
    With ``within_seconds=None`` it is also existence-exact (a chain
    exists iff greedy completes). Under a per-transition window it is a
    defined policy, not existence-exact: a user whose earliest step-k
    match strands the next transition counts as stopping there even if a
    later step-k event would have chained (A@0, B@1, B@9, C@15 at W=10
    stops at B — by design, matching the first-touch convention).

    Plan shape: one filtered min-aggregate per step, each joined to the
    previous step's (user, t) table — K shuffles on user_id for a
    K-step funnel, no window functions, no per-user event arrays (the
    collect-events-per-user formulation breaks on power users; this one
    never materializes a user's history)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    us = _ntz_micros(F.col("ts"))
    ev = events.select("user_id", "event_type", us.alias("t"))
    w_us = None if within_seconds is None else int(within_seconds) * 1_000_000
    counts = []
    cur = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("t").alias("t"))
    )
    counts.append(cur)
    for s in steps[1:]:
        prev = cur.select("user_id", F.col("t").alias("pt"))
        nxt = ev.filter(F.col("event_type") == s).join(prev, "user_id")
        cond = F.col("t") > F.col("pt")
        if w_us is not None:
            cond = cond & (F.col("t") - F.col("pt") <= w_us)
        cur = nxt.filter(cond).groupBy("user_id").agg(F.min("t").alias("t"))
        counts.append(cur)
    out = None
    for k, (s, c) in enumerate(zip(steps, counts)):
        row = c.agg(F.count("*").alias("n_users")).select(
            F.lit(k).cast("long").alias("step"),
            F.lit(s).alias("event_type"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


_PERIOD_US = {
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def retention(events: DataFrame, period: str = "week") -> DataFrame:
    """Cohort retention — the product-analytics staple:

        (cohort_us, period, n_active, cohort_size, retention)

    one row per (cohort, k): users whose FIRST activity falls in
    date_trunc(``period``) bucket ``cohort_us`` (epoch microseconds)
    who were active again k periods later; retention = n_active /
    cohort_size rounded to 6 dp (k = 0 is 1.0 by construction).
    ``period`` must be a fixed-length calendar unit (hour/day/week —
    TIMESTAMP_NTZ has no DST, so trunc-bucket differences are exact
    multiples of the period; months are not fixed-length and are
    deliberately unsupported).

    Plan shape: one DISTINCT (user, bucket) shuffle, a per-user min
    aggregate for the cohort, one user-keyed join back, and one
    (cohort, k) aggregate with an exact COUNT(DISTINCT user) — the
    distinct's key set is already (user, bucket), so the count is a
    cheap re-shuffle on the cohort key; cohort sizes come from the
    k = 0 rows themselves (every user is active in their own first
    period), a broadcast-sized cohort-keyed self-join, not a second
    corpus pass."""
    if period not in _PERIOD_US:
        raise ValueError(f"period must be one of {sorted(_PERIOD_US)}, got {period!r}")
    p_us = _PERIOD_US[period]
    ub = (
        events.select(
            "user_id",
            _ntz_micros(F.date_trunc(period, F.col("ts"))).alias("bucket_us"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: cohort min-agg + the join
    )
    cohort = ub.groupBy("user_id").agg(F.min("bucket_us").alias("cohort_us"))
    active = (
        ub.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_us",
            ((F.col("bucket_us") - F.col("cohort_us")) / F.lit(p_us))
            .cast("long")
            .alias("period"),
        )
        .groupBy("cohort_us", "period")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .localCheckpoint(eager=False)  # consumers: k=0 sizes + the join
    )
    sizes = active.filter(F.col("period") == 0).select(
        "cohort_us", F.col("n_active").alias("cohort_size")
    )
    return active.join(F.broadcast(sizes), "cohort_us").select(
        "cohort_us",
        "period",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams —
    the user-path-mining primitive (next-action prediction, anomalous-
    flow detection):

        (from_type, to_type, n, p)

    one row per ordered (event_type → next event_type) pair observed in
    some user's stream under the (ts, event_id) total order; n is the
    transition count, p = n / Σ n over the same from_type, rounded to
    6 dp. A user's last event emits no transition.

    Plan shape: ONE user_id exchange — the lead window and nothing else
    shuffles the events; the (from, to) pair count is a map-side-combined
    aggregate over the window's output, and the row-normalizing
    denominator is a second tiny aggregate over the T×T pair table
    joined back broadcast-sized (T = distinct event types, never the
    event count)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)  # consumers: the row-sum + the join
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("row_n"), 6).alias("p"),
    )


def top_event_types(events: DataFrame, bucket: str = "hour", k: int = 3) -> DataFrame:
    """Top-k event types per time bucket — the trending-now query:

        (bucket_us, event_type, n, rank),  rank ≤ k

    ranked by (count DESC, event_type ASC) so ties are deterministic.

    Plan shape: the heavy lift is ONE map-side-combined
    (bucket, event_type) count over the raw events; the rank window then
    runs over the B×T aggregate table (buckets × types — thousands of
    rows at any corpus size), so the per-group sort the window implies
    never touches event-count-sized data."""
    counts = events.groupBy(
        _ntz_micros(F.date_trunc(bucket, F.col("ts"))).alias("bucket_us"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("bucket_us").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("bucket_us", "event_type", "n", "rank")
    )


def anomalies(
    events: DataFrame, bucket: str = "hour", top_k: int = 20
) -> DataFrame:
    """Count-spike detection — the monitoring query of an event pipeline:
    z-score of each (event_type, time-bucket) event count against that
    type's mean/std across its OBSERVED buckets (empty buckets are not
    zero-filled; a type must vary to alarm), top ``top_k`` rows

        (event_type, bucket_us, n_events, z)

    by |z| (rounded to 6 dp BEFORE ranking — the engine-stable order),
    ties by (event_type, bucket_us). Variance is the explicit
    avg-of-squares form ``avg(n²) − avg(n)²`` — written identically in
    the DuckDB twin so both engines run the same IEEE expression on the
    same exact integer sums. Plan: one partial-aggregated groupBy for
    the counts, one tiny per-type aggregate broadcast back, TakeOrdered
    top-k — no window over the full count table."""
    counts = events.groupBy(
        _ntz_micros(F.date_trunc(bucket, F.col("ts"))).alias("bucket_us"),
        "event_type",
    ).agg(F.count("*").alias("n_events"))
    stats = counts.groupBy("event_type").agg(
        F.avg("n_events").alias("mu"),
        F.avg(F.col("n_events") * F.col("n_events")).alias("msq"),
    )
    z = (F.col("n_events") - F.col("mu")) / F.sqrt(
        F.col("msq") - F.col("mu") * F.col("mu")
    )
    return (
        counts.join(F.broadcast(stats), "event_type")
        .filter(F.col("msq") - F.col("mu") * F.col("mu") > 0)
        .select(
            "event_type",
            "bucket_us",
            "n_events",
            F.round(z, 6).alias("z"),
        )
        .orderBy(F.abs(F.col("z")).desc(), "event_type", "bucket_us")
        .limit(top_k)
    )


def active_users(
    events: DataFrame, bucket: str = "hour", window_buckets: int = 24
) -> DataFrame:
    """Per-bucket active users plus the EXACT trailing rolling distinct
    (e.g. hourly DAU + trailing-24h actives):

        (bucket_us, n_active, n_active_rolling)

    A rolling COUNT(DISTINCT) does not decompose over per-bucket counts
    (the same user in 5 buckets is one rolling active), so the plan
    dedups to (user_id, bucket) pairs once, then interval-joins that
    pair set against the OBSERVED bucket grid (a broadcast of at most
    |grid| rows — time buckets, not data) and re-aggregates distinct
    users per grid point. Cost = |pairs| × (windows each pair lands in,
    ≤ window_buckets) partial-aggregated rows — linear in data with a
    small constant, no per-user state, no window over raw events. At
    100 TB swap the exact distinct for approx_count_distinct (noted,
    not defaulted, so the DuckDB twin matches exactly). Grid points
    whose trailing window has no observed earlier bucket still report
    their own actives (the join matches the point itself)."""
    us_per_bucket = 0
    for unit, width in (
        ("hour", 3600 * 1_000_000),
        ("day", 86400 * 1_000_000),
        ("minute", 60 * 1_000_000),
        ("week", 7 * 86400 * 1_000_000),
    ):
        if bucket == unit:
            us_per_bucket = width
            break
    if not us_per_bucket:
        raise ValueError(f"active_users: unsupported bucket {bucket!r}")
    pairs = events.select(
        "user_id",
        _ntz_micros(F.date_trunc(bucket, F.col("ts"))).alias("bucket_us"),
    ).dropDuplicates(["user_id", "bucket_us"])
    grid = pairs.select("bucket_us").distinct()
    span = F.lit(int(window_buckets) * us_per_bucket)
    rolling = (
        pairs.alias("p")
        .join(
            F.broadcast(grid.select(F.col("bucket_us").alias("g_us"))),
            (F.col("p.bucket_us") <= F.col("g_us"))
            & (F.col("p.bucket_us") > F.col("g_us") - span),
        )
        .groupBy("g_us")
        .agg(F.countDistinct("user_id").alias("n_active_rolling"))
    )
    per_bucket = pairs.groupBy("bucket_us").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return per_bucket.join(
        rolling, per_bucket["bucket_us"] == rolling["g_us"]
    ).select("bucket_us", "n_active", "n_active_rolling")


def props_rollup(events: DataFrame, field: str = "k") -> DataFrame:
    """Per-event-type aggregate of a numeric JSON property carried in the
    ``props`` column — the semi-structured payload analytics every event
    pipeline grows (props is a JSON string; the reference-style typed
    columns cover only the fixed schema): (event_type, n, sum_v, avg_v),
    avg rounded to 6 dp.

    Spark shape: ``get_json_object`` is a JVM expression, so extraction
    rides the scan projection — rows missing the field drop BEFORE the
    single map-side-combinable groupBy; nothing but (type, long) pairs
    shuffles. At 100 TB this is the same one-exchange profile as rollup().
    """
    pv = F.get_json_object(F.col("props"), f"$.{field}").cast("long")
    return (
        events.select("event_type", pv.alias("pv"))
        .filter(F.col("pv").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pv").alias("sum_v"),
            F.round(F.avg("pv"), 6).alias("avg_v"),
        )
    )
