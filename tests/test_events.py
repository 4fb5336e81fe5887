"""Batch events operators (linkgraph.events) vs hand-computed sessions
and rollups on a planted micro-table, plus gap-boundary semantics."""

from __future__ import annotations

from datetime import datetime

import pytest

from linkgraph import events as ev


def _events_df(spark, rows):
    """rows: (event_id, iso_ts, user_id, event_type, value)."""
    data = [
        (eid, datetime.fromisoformat(ts), uid, et, val)
        for eid, ts, uid, et, val in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )


def test_sessionize_splits_on_gap_and_numbers_in_time_order(spark):
    df = _events_df(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0),
            (2, "2024-01-01 00:10:00", 1, "click", 2.0),
            # 40 min after event 2 → new session for user 1 (gap 30 min)
            (3, "2024-01-01 00:50:00", 1, "view", 4.0),
            (4, "2024-01-01 09:00:00", 2, "view", 8.0),
        ],
    )
    got = {
        (r["user_id"], r["session_id"]): r
        for r in ev.sessionize(df, gap_seconds=1800).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s11 = got[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["total_value"] == pytest.approx(3.0)
    assert s11["end_us"] - s11["start_us"] == 600 * 1_000_000
    assert got[(1, 2)]["n_events"] == 1
    assert got[(2, 1)]["total_value"] == pytest.approx(8.0)


def test_sessionize_gap_boundary_is_inclusive(spark):
    # exactly gap_seconds apart → SAME session (strictly greater splits),
    # matching the oracle's `> gap` predicate
    df = _events_df(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0),
            (2, "2024-01-01 00:30:00", 1, "view", 1.0),
            (3, "2024-01-01 01:00:00.000001", 1, "view", 1.0),  # 1 µs over
        ],
    )
    got = sorted(
        ev.sessionize(df, gap_seconds=1800).collect(),
        key=lambda r: r["session_id"],
    )
    assert [r["n_events"] for r in got] == [2, 1]


def test_rollup_hourly_counts_and_means(spark):
    df = _events_df(
        spark,
        [
            (1, "2024-01-01 00:05:00", 1, "view", 1.0),
            (2, "2024-01-01 00:55:00", 2, "view", 3.0),
            (3, "2024-01-01 00:20:00", 1, "click", 10.0),
            (4, "2024-01-01 01:05:00", 1, "view", 5.0),
        ],
    )
    got = {
        (r["bucket_us"], r["event_type"]): r for r in ev.rollup(df, "hour").collect()
    }
    # NTZ epoch diff (timezone-independent) — not datetime.timestamp(),
    # which would inject the local zone
    epoch = datetime.fromisoformat("1970-01-01 00:00:00")
    h0 = int(
        (datetime.fromisoformat("2024-01-01 00:00:00") - epoch).total_seconds() * 1e6
    )
    h1 = h0 + 3600 * 1_000_000
    assert got[(h0, "view")]["n_events"] == 2
    assert got[(h0, "view")]["n_users"] == 2
    assert got[(h0, "view")]["sum_value"] == pytest.approx(4.0)
    assert got[(h0, "view")]["avg_value"] == pytest.approx(2.0)
    assert got[(h0, "click")]["n_events"] == 1
    assert got[(h1, "view")]["n_events"] == 1
    assert got[(h1, "view")]["avg_value"] == pytest.approx(5.0)


def test_funnel_greedy_earliest_and_window(spark):
    from datetime import datetime

    from linkgraph.events import funnel

    def ev(i, t, u, typ):
        return (i, datetime(2024, 1, 1, 0, 0, t), u, typ, 1.0, "{}")

    rows = [
        # user 1 completes view(0) -> click(10) -> purchase(20)
        ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
        # user 2: click BEFORE view only -> stops at view
        ev(4, 5, 2, "click"), ev(5, 9, 2, "view"),
        # user 3: completes but the click->purchase gap exceeds the window
        ev(6, 0, 3, "view"), ev(7, 1, 3, "click"), ev(8, 50, 3, "purchase"),
        # user 4: view@0, click@2, click@30, purchase@31 — first-touch
        # click(2)→purchase(31) gap 29 > 20, and the later click(30) is
        # itself outside view@0's 20 s window, so user 4 stops at click
        # under within=20; unbounded, the chain completes
        ev(9, 0, 4, "view"), ev(10, 2, 4, "click"),
        ev(11, 30, 4, "click"), ev(12, 31, 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel(df, ["view", "click", "purchase"], within_seconds=20).collect()
    }
    assert got[0] == ("view", 4)
    assert got[1] == ("click", 3)  # user 2 never clicks after viewing
    assert got[2] == ("purchase", 1)  # only user 1 within 20 s per hop
    # unbounded window: users 1, 3 and 4 all purchase
    got_u = {
        r["step"]: r["n_users"]
        for r in funnel(df, ["view", "click", "purchase"], within_seconds=None).collect()
    }
    assert got_u[2] == 3


def test_funnel_first_touch_policy_pinned(spark):
    # the documented divergence from existence semantics: A@0 B@1 B@9
    # C@15 with W=10 — a valid chain exists (B@9), but first-touch
    # greedily binds B@1 and strands C
    from datetime import datetime

    from linkgraph.events import funnel

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 0, 1), 1, "click", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 0, 9), 1, "click", 1.0, "{}"),
        (4, datetime(2024, 1, 1, 0, 0, 15), 1, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel(df, ["view", "click", "purchase"], within_seconds=10).collect()
    }
    assert got == {0: 1, 1: 1, 2: 0}


def test_retention_planted_cohorts(spark):
    from datetime import datetime

    from linkgraph.events import retention

    # cohort A (Jan 1 week): users 1,2 — user 1 returns week 1 and 2,
    # user 2 only week 2. cohort B (Jan 8 week): user 3, never returns.
    rows = [
        (1, datetime(2024, 1, 1), 1), (2, datetime(2024, 1, 8), 1),
        (3, datetime(2024, 1, 15), 1), (4, datetime(2024, 1, 2), 2),
        (5, datetime(2024, 1, 16), 2), (6, datetime(2024, 1, 9), 3),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["cohort_us"], r["period"]): (r["n_active"], r["cohort_size"], r["retention"])
        for r in retention(df, period="week").collect()
    }
    wk = 7 * 86_400_000_000
    a = datetime(2024, 1, 1).timestamp()  # trunc('week') of Jan 1 2024 (a Monday)
    a_us = 1704067200 * 1_000_000
    b_us = a_us + wk
    assert got[(a_us, 0)] == (2, 2, 1.0)
    assert got[(a_us, 1)] == (1, 2, 0.5)
    assert got[(a_us, 2)] == (2, 2, 1.0)
    assert got[(b_us, 0)] == (1, 1, 1.0)
    assert len(got) == 4


def test_retention_rejects_variable_periods(spark):
    import pytest as _pytest

    from linkgraph.events import retention

    with _pytest.raises(ValueError):
        retention(spark.range(1), period="month")


def test_transitions_counts_and_row_normalization(spark):
    df = _events_df(
        spark,
        [
            # user 1: view -> click -> view -> buy  (ordered by ts)
            (1, "2024-01-01T00:00:00", 1, "view", 1.0),
            (2, "2024-01-01T00:01:00", 1, "click", 1.0),
            (3, "2024-01-01T00:02:00", 1, "view", 1.0),
            (4, "2024-01-01T00:03:00", 1, "buy", 1.0),
            # user 2: view -> view  (single transition; last emits none)
            (5, "2024-01-01T00:00:00", 2, "view", 1.0),
            (6, "2024-01-01T00:05:00", 2, "view", 1.0),
            # user 3: one event — no transitions at all
            (7, "2024-01-01T00:00:00", 3, "click", 1.0),
        ],
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in ev.transitions(df).collect()
    }
    # from view: ->click (1), ->buy (1), ->view (1)  => p = 1/3 each
    assert got[("view", "click")] == (1, pytest.approx(0.333333))
    assert got[("view", "buy")] == (1, pytest.approx(0.333333))
    assert got[("view", "view")] == (1, pytest.approx(0.333333))
    # from click: ->view (1) only => p = 1.0
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 4  # buy and user-3 click are stream-final


def test_transitions_tie_order_is_ts_then_event_id(spark):
    # two events share a timestamp: event_id breaks the tie, so the
    # stream is a(1) -> b(2) -> c(3), never a -> c
    df = _events_df(
        spark,
        [
            (1, "2024-01-01T00:00:00", 1, "a", 1.0),
            (3, "2024-01-01T00:00:01", 1, "c", 1.0),
            (2, "2024-01-01T00:00:00", 1, "b", 1.0),
        ],
    )
    got = {(r["from_type"], r["to_type"]) for r in ev.transitions(df).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_top_event_types_rank_and_ties(spark):
    df = _events_df(
        spark,
        [
            # hour bucket 00: view x3, click x2, buy x1, nav x1
            (1, "2024-01-01T00:01:00", 1, "view", 1.0),
            (2, "2024-01-01T00:02:00", 2, "view", 1.0),
            (3, "2024-01-01T00:03:00", 3, "view", 1.0),
            (4, "2024-01-01T00:04:00", 1, "click", 1.0),
            (5, "2024-01-01T00:05:00", 2, "click", 1.0),
            (6, "2024-01-01T00:06:00", 1, "buy", 1.0),
            (7, "2024-01-01T00:07:00", 2, "nav", 1.0),
            # hour bucket 01: single event
            (8, "2024-01-01T01:30:00", 1, "view", 1.0),
        ],
    )
    got = {
        (r["bucket_us"], r["rank"]): (r["event_type"], r["n"])
        for r in ev.top_event_types(df, k=3).collect()
    }
    h0 = 1704067200000000  # 2024-01-01T00:00 epoch micros
    h1 = h0 + 3600 * 1_000_000
    assert got[(h0, 1)] == ("view", 3)
    assert got[(h0, 2)] == ("click", 2)
    assert got[(h0, 3)] == ("buy", 1)      # buy < nav breaks the 1-1 tie
    assert got[(h1, 1)] == ("view", 1)
    assert len(got) == 4                   # k caps bucket 0 at 3 rows


def test_anomalies_zscore_and_filtering(spark):
    # type "a": counts per hour (3, 1, 1, 1) -> mu=1.5, var=.75; the
    # 3-count bucket is the spike. type "b": constant count 2 in both
    # observed buckets -> zero variance -> filtered out entirely.
    rows = []
    eid = 0
    for h, n in enumerate([3, 1, 1, 1]):
        for i in range(n):
            eid += 1
            rows.append((eid, f"2024-01-01 0{h}:0{i}:00", 1, "a", 1.0))
    for h in (0, 1):
        for i in range(2):
            eid += 1
            rows.append((eid, f"2024-01-01 0{h}:1{i}:00", 2, "b", 1.0))
    got = ev.anomalies(_events_df(spark, rows), bucket="hour", top_k=20).collect()
    assert all(r["event_type"] == "a" for r in got)  # b: zero variance
    assert len(got) == 4
    top = got[0]
    h0 = 1704067200000000  # 2024-01-01T00:00 epoch micros
    assert (top["bucket_us"], top["n_events"]) == (h0, 3)
    # z = (3 - 1.5) / sqrt(0.75)
    assert top["z"] == pytest.approx(1.732051, abs=1e-6)
    # the three 1-count buckets tie on |z|; order falls back to bucket_us
    assert [r["bucket_us"] for r in got[1:]] == [
        h0 + 3600 * 1_000_000 * k for k in (1, 2, 3)
    ]


def test_anomalies_top_k_caps_rows(spark):
    rows = []
    eid = 0
    for h in range(5):
        for i in range(h + 1):  # strictly growing counts -> distinct |z|
            eid += 1
            rows.append((eid, f"2024-01-01 0{h}:{i:02d}:00", 1, "a", 1.0))
    got = ev.anomalies(_events_df(spark, rows), bucket="hour", top_k=2).collect()
    assert len(got) == 2


def test_active_users_rolling_exact_distinct(spark):
    # hour 0: users {1,2}; hour 1: users {1}; hour 3: users {3}
    # rolling window = 2 buckets (current + previous)
    df = _events_df(
        spark,
        [
            (1, "2024-01-01 00:05:00", 1, "view", 1.0),
            (2, "2024-01-01 00:06:00", 1, "view", 1.0),  # dup user-bucket
            (3, "2024-01-01 00:07:00", 2, "view", 1.0),
            (4, "2024-01-01 01:10:00", 1, "click", 1.0),
            (5, "2024-01-01 03:00:00", 3, "view", 1.0),
        ],
    )
    got = {
        r["bucket_us"]: (r["n_active"], r["n_active_rolling"])
        for r in ev.active_users(df, bucket="hour", window_buckets=2).collect()
    }
    h0 = 1704067200000000
    hr = 3600 * 1_000_000
    # hour 0: {1,2}; rolling(h0) = {1,2}
    assert got[h0] == (2, 2)
    # hour 1: {1}; rolling covers hours 0-1 = {1,2}
    assert got[h0 + hr] == (1, 2)
    # hour 3: {3}; rolling covers hours 2-3, hour 2 unobserved = {3}
    assert got[h0 + 3 * hr] == (1, 1)
    assert len(got) == 3  # only observed buckets appear


def test_active_users_rejects_unknown_bucket(spark):
    df = _events_df(spark, [(1, "2024-01-01 00:00:00", 1, "view", 1.0)])
    with pytest.raises(ValueError):
        ev.active_users(df, bucket="fortnight")


def test_props_rollup_extracts_and_aggregates(spark):
    # props carry {"k": n}; one malformed row and one missing-field row
    # must drop before the aggregate (null cast), not poison it
    df = spark.createDataFrame(
        [
            (1, "click", '{"k": 10}'),
            (2, "click", '{"k": 4}'),
            (3, "view", '{"k": 7}'),
            (4, "view", '{"other": 9}'),
            (5, "view", "not json"),
        ],
        "event_id long, event_type string, props string",
    )
    got = {
        r["event_type"]: (r["n"], r["sum_v"], r["avg_v"])
        for r in ev.props_rollup(df, field="k").collect()
    }
    assert got == {"click": (2, 14, 7.0), "view": (1, 7, 7.0)}


def test_props_rollup_custom_field(spark):
    df = spark.createDataFrame(
        [(1, "a", '{"x": 3, "k": 1}'), (2, "a", '{"x": 5}')],
        "event_id long, event_type string, props string",
    )
    got = ev.props_rollup(df, field="x").collect()
    assert [(r["event_type"], r["n"], r["sum_v"], r["avg_v"]) for r in got] == [
        ("a", 2, 8, 4.0)
    ]
