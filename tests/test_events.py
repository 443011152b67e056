"""Sessionization and as-of join (operators/events.py): gap semantics
against a hand-computed fixture, ASOF semantics (latest right <= left,
equal-ts visible, tie to highest right_tie), and DuckDB twin parity.
"""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.events import (
    asof_join,
    asof_join_sql,
    sessionize,
    sessionize_sql,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(secs, us=0):
    return T0 + dt.timedelta(seconds=secs, microseconds=us)


EVENTS = [
    # user 1: 3 events in one session, then a >gap break, then 1 more
    (0, _ts(0), 1, "view", 1.0),
    (1, _ts(100), 1, "click", 2.0),
    (2, _ts(1800), 1, "view", 3.0),        # exactly gap after prev: SAME session
    (3, _ts(1800 + 1801), 1, "click", 4.0),  # > gap: new session
    # user 2: single event
    (4, _ts(50), 2, "view", 10.0),
    # user 3: equal timestamps, tie broken by event_id
    (5, _ts(7), 3, "view", 1.5),
    (6, _ts(7), 3, "click", 2.5),
]
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(EVENTS, SCHEMA)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE)"
    )
    c.executemany("INSERT INTO events VALUES (?,?,?,?,?)", EVENTS)
    return c


def test_sessionize_gap_semantics(spark, events):
    rows = {
        (r.user_id, r.sess_n): r
        for r in sessionize(events, gap_secs=1800).collect()
    }
    assert set(rows) == {(1, 1), (1, 2), (2, 1), (3, 1)}
    s11 = rows[(1, 1)]
    # events 0,1,2 — the exactly-at-gap event stays in the session
    assert s11.n_events == 3 and s11.duration_secs == 1800.0
    assert s11.sum_value == 6.0
    assert rows[(1, 2)].n_events == 1
    assert rows[(2, 1)].duration_secs == 0.0
    assert rows[(3, 1)].n_events == 2


def test_sessionize_twin(spark, events, con):
    got = sorted(
        tuple(r) for r in sessionize(events, gap_secs=600).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(sessionize_sql("events", gap_secs=600)).fetchall()
    )
    assert got == want and len(got) >= 4


def test_sessionize_tz_flavor_invariant(spark):
    """`sessionize` epoch-micros must not depend on the session TZ or
    on the parquet scan's timestamp flavor (r4 driver hash-mismatch
    hardening).  Empirical semantics on this pyspark build: with
    `inferTimestampNTZ.enabled=false` the scan surfaces the NTZ-stored
    micros as a TIMESTAMP whose *instant* is the raw stored value, so
    `unix_micros` — not an LTZ→NTZ cast, which shifts by the session
    offset — recovers the stored naive micros in every TZ."""
    from pdf_parser_spark.operators.events import sessionize

    path = "/root/testdata/sf0.001/events.parquet"

    def run():
        return sorted(
            tuple(r)
            for r in sessionize(
                spark.read.parquet(path), gap_secs=900
            ).collect()
        )

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    ntz0 = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    baseline = run()
    assert len(baseline) > 10
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert run() == baseline, f"LTZ flavor diverged under {tz}"
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert run() == baseline, "NTZ flavor diverged under non-UTC TZ"
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntz0)


def test_asof_semantics(spark, events):
    clicks = events.where(F.col("event_type") == "click")
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            clicks, views, on="user_id", left_ts="ts", right_ts="view_ts",
            right_cols=["view_id"], right_tie="view_id",
        ).collect()
    }
    assert out[1].view_id == 0          # latest view <= t=100 is event 0
    assert out[3].view_id == 2          # after the gap, view 2 still latest
    assert out[6].view_id == 5          # equal-ts view IS visible
    assert out[6].asof_ts_us == 1704067207_000000


def test_asof_no_match_is_null(spark, events):
    clicks = events.where(F.col("event_type") == "click")
    late_views = events.where(
        (F.col("event_type") == "view") & (F.col("event_id") == 2)
    ).select(
        F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts"),
        "user_id",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            clicks, late_views, on="user_id", left_ts="ts",
            right_ts="view_ts", right_cols=["view_id"], right_tie="view_id",
        ).collect()
    }
    assert out[1].view_id is None and out[1].asof_ts_us is None
    assert out[3].view_id == 2
    assert out[6].view_id is None       # user 3 has no view in right


def test_asof_twin(spark, events, con):
    clicks = events.where(F.col("event_type") == "click")
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
    )
    got = sorted(
        tuple(r)
        for r in asof_join(
            clicks, views, on="user_id", left_ts="ts", right_ts="view_ts",
            right_cols=["view_id"], right_tie="view_id",
        ).select("event_id", "user_id", "view_id", "asof_ts_us").collect()
    )
    sql = asof_join_sql(
        "SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'",
        "SELECT event_id AS view_id, ts AS view_ts, user_id FROM events "
        "WHERE event_type = 'view'",
        on="user_id", left_ts="ts", right_ts="view_ts",
        left_cols=["event_id", "user_id", "ts"], right_cols=["view_id"],
        right_tie="view_id",
    )
    want = sorted(
        (r[0], r[1], r[3], r[4])
        for r in con.execute(sql).fetchall()
    )
    assert got == want


def test_asof_matches_duckdb_native_asof(spark, events, con):
    # cross-check the union-window plan against DuckDB's built-in
    # ASOF JOIN (independent implementation of the same semantics)
    clicks = events.where(F.col("event_type") == "click")
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
    )
    got = sorted(
        (r.event_id, r.view_id)
        for r in asof_join(
            clicks, views, on="user_id", left_ts="ts", right_ts="view_ts",
            right_cols=["view_id"], right_tie="view_id",
        ).collect()
    )
    want = sorted(
        tuple(r) for r in con.execute("""
        SELECT c.event_id, v.view_id
        FROM (SELECT * FROM events WHERE event_type='click') c
        ASOF LEFT JOIN (SELECT event_id AS view_id, ts AS view_ts, user_id
                        FROM events WHERE event_type='view') v
          ON c.user_id = v.user_id AND v.view_ts <= c.ts
        """).fetchall()
    )
    assert got == want


def test_sessions_stream_matches_batch_on_fixture(spark, tmp_path):
    """Streaming↔batch sessionization parity: the session_window
    stream run to completion over the real events fixture equals the
    batch gap-session operator keyed by (user, start_us)."""
    import os
    import shutil

    from pdf_parser_spark.operators.events import sessionize
    from pdf_parser_spark.streaming.sessions import run_sessions_complete

    events_dir = str(tmp_path / "events_src")
    os.makedirs(events_dir)
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(events_dir, "part-0.parquet"))
    out = str(tmp_path / "sessions_out")
    run_sessions_complete(spark, events_dir, out,
                          str(tmp_path / "ckpt"), gap_secs=900)
    got = {
        (r.user_id, r.start_us): (r.end_us, r.n_events,
                                  r.duration_secs, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.user_id, r.start_us): (r.end_us, r.n_events,
                                  r.duration_secs, r.sum_value)
        for r in sessionize(
            spark.read.parquet(events_dir), gap_secs=900
        ).collect()
    }
    assert got == want and len(got) > 10


# ------------------------------------------------------------ window funnel

FUNNEL_EVENTS = [
    # user 1: full view->click->purchase chain inside the window
    (0, _ts(0), 1, "view", 0.0),
    (1, _ts(50), 1, "click", 0.0),
    (2, _ts(120), 1, "purchase", 0.0),
    # user 2: first chain times out; the DP must RESTART from the
    # later view (maximize chain start) to reach level 2
    (3, _ts(0), 2, "view", 0.0),
    (4, _ts(250), 2, "view", 0.0),
    (5, _ts(320), 2, "click", 0.0),
    # user 3: never performs step 0
    (6, _ts(10), 3, "click", 0.0),
    # user 4: whole chain at ONE timestamp — event_id order decides
    (7, _ts(7), 4, "view", 0.0),
    (8, _ts(7), 4, "click", 0.0),
    (9, _ts(7), 4, "purchase", 0.0),
    # user 5: steps present but in the wrong order
    (10, _ts(5), 5, "purchase", 0.0),
    (11, _ts(6), 5, "click", 0.0),
    (12, _ts(7), 5, "view", 0.0),
]
STEPS = ["view", "click", "purchase"]


@pytest.fixture(scope="module")
def funnel_events(spark):
    return spark.createDataFrame(FUNNEL_EVENTS, SCHEMA)


def test_window_funnel_semantics(spark, funnel_events):
    from pdf_parser_spark.operators.events import window_funnel

    got = {
        r.user_id: r.funnel_level
        for r in window_funnel(funnel_events, STEPS, 200).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 3, 5: 1}


def test_window_funnel_window_binds_full_chain(spark, funnel_events):
    from pdf_parser_spark.operators.events import window_funnel

    # shrink the window under user 1's 120 s span: purchase no longer
    # counts but the 50 s view->click prefix still does
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel(funnel_events, STEPS, 100).collect()
    }
    assert got[1] == 2 and got[2] == 2 and got[4] == 3


def test_window_funnel_twin(spark, funnel_events):
    from pdf_parser_spark.operators.events import (
        window_funnel,
        window_funnel_sql,
    )

    c = duckdb.connect()
    c.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE)"
    )
    c.executemany("INSERT INTO events VALUES (?,?,?,?,?)", FUNNEL_EVENTS)
    got = sorted(
        tuple(r) for r in window_funnel(funnel_events, STEPS, 200).collect()
    )
    want = sorted(
        tuple(r)
        for r in c.execute(window_funnel_sql("events", STEPS, 200)).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------- retention

DAY = 86400
RETENTION_EVENTS = [
    (0, _ts(0), 1, "signup", 0.0),
    (1, _ts(10), 1, "click", 0.0),
    (2, _ts(DAY + 5), 1, "view", 0.0),
    (3, _ts(3 * DAY + 5), 1, "click", 0.0),
    (4, _ts(DAY + 1), 2, "signup", 0.0),
    (5, _ts(DAY + 2), 2, "view", 0.0),
    (6, _ts(20), 3, "click", 0.0),          # no signup: not cohorted
    (7, _ts(30), 4, "signup", 0.0),
    (8, _ts(2 * DAY + 9), 4, "view", 0.0),
]

#: period index of 2024-01-01 at period_days=1 (epoch-day arithmetic)
DAY0 = 1704067200 // DAY


@pytest.fixture(scope="module")
def retention_events(spark):
    return spark.createDataFrame(RETENTION_EVENTS, SCHEMA)


def test_retention_matrix(spark, retention_events):
    from pdf_parser_spark.operators.events import retention

    got = {
        (r.cohort_p - DAY0, r.period_offset): (
            r.active_users, r.cohort_users, r.retention_rate
        )
        for r in retention(retention_events, period_days=1).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (0, 2): (1, 2, 0.5),
        (0, 3): (1, 2, 0.5),
        (1, 0): (1, 1, 1.0),
    }


def test_retention_active_types_filter(spark, retention_events):
    from pdf_parser_spark.operators.events import retention

    got = {
        (r.cohort_p - DAY0, r.period_offset): r.active_users
        for r in retention(
            retention_events, active_types=["click"], period_days=1
        ).collect()
    }
    assert got == {(0, 0): 1, (0, 3): 1}


def test_retention_twin(spark, retention_events):
    from pdf_parser_spark.operators.events import retention, retention_sql

    c = duckdb.connect()
    c.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE)"
    )
    c.executemany("INSERT INTO events VALUES (?,?,?,?,?)", RETENTION_EVENTS)
    got = sorted(
        tuple(r)
        for r in retention(retention_events, period_days=1).collect()
    )
    want = sorted(
        tuple(r)
        for r in c.execute(retention_sql("events", period_days=1)).fetchall()
    )
    assert got == want


# ------------------------------------------------------- interval join

IJ_EVENTS = [
    # user 1: views at 0s and 100s; purchases at 50s, 100s, 3650s
    (0, _ts(0), 1, "view", 1.0),
    (1, _ts(100), 1, "view", 1.0),
    (2, _ts(50), 1, "purchase", 9.0),
    (3, _ts(100), 1, "purchase", 8.0),       # equal-ts: delta 0 matches
    (4, _ts(3650), 1, "purchase", 7.0),      # 3600 after view@50? no view@50
    # user 2: purchase BEFORE any view — never matches
    (5, _ts(10), 2, "purchase", 5.0),
    (6, _ts(20), 2, "view", 1.0),
    # user 3: purchase exactly window after the view (inclusive edge)
    (7, _ts(0), 3, "view", 1.0),
    (8, _ts(3600), 3, "purchase", 4.0),
    # user 3: one past the window
    (9, _ts(3600, 1), 3, "purchase", 3.0),
]


@pytest.fixture(scope="module")
def ij_events(spark):
    return spark.createDataFrame(IJ_EVENTS, SCHEMA)


def _ij(spark, ij_events, window_secs=3600):
    from pdf_parser_spark.operators.events import interval_join

    views = ij_events.where("event_type = 'view'").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    buys = ij_events.where("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"), F.col("value").alias("buy_value"),
    )
    return interval_join(
        views, buys, on="user_id", left_ts="ts", right_ts="buy_ts",
        right_cols=["buy_id", "buy_value"], window_secs=window_secs,
    )


def test_interval_join_semantics(spark, ij_events):
    got = {
        (r.view_id, r.buy_id, r.delta_us)
        for r in _ij(spark, ij_events).collect()
    }
    assert got == {
        (0, 2, 50_000_000),        # view@0 → buy@50
        (0, 3, 100_000_000),       # view@0 → buy@100
        (1, 3, 0),                 # equal timestamps match (delta 0)
        (1, 4, 3_550_000_000),
        (7, 8, 3_600_000_000),     # right at window edge: inclusive
    }


def test_interval_join_bucket_boundary_no_dupes(spark):
    """Pairs that straddle a bucket boundary are found exactly once,
    and same-bucket pairs are not double-counted by the 2x fan-out."""
    from pdf_parser_spark.operators.events import interval_join

    rows = [
        (0, _ts(59), 1, "view", 1.0),
        (1, _ts(61), 1, "purchase", 1.0),   # next bucket (W=60)
        (2, _ts(59, 500), 1, "purchase", 1.0),  # same bucket
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    views = ev.where("event_type='view'").select(
        "user_id", "ts", F.col("event_id").alias("view_id"))
    buys = ev.where("event_type='purchase'").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"))
    out = interval_join(
        views, buys, on="user_id", left_ts="ts", right_ts="buy_ts",
        right_cols=["buy_id"], window_secs=60,
    ).collect()
    assert sorted((r.view_id, r.buy_id) for r in out) == [(0, 1), (0, 2)]


def test_interval_join_guard(spark, ij_events):
    from pdf_parser_spark.operators.events import interval_join

    with pytest.raises(ValueError):
        interval_join(
            ij_events, ij_events, on="user_id", left_ts="ts",
            right_ts="ts", right_cols=[], window_secs=0,
        )


def test_interval_join_twin(spark, ij_events):
    from pdf_parser_spark.operators.events import interval_join_sql

    c = duckdb.connect()
    c.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE)"
    )
    c.executemany("INSERT INTO events VALUES (?,?,?,?,?)", IJ_EVENTS)
    sql = interval_join_sql(
        "SELECT user_id, ts, event_id AS view_id FROM events "
        "WHERE event_type = 'view'",
        "SELECT user_id, ts AS buy_ts, event_id AS buy_id, "
        "value AS buy_value FROM events WHERE event_type = 'purchase'",
        on="user_id", left_ts="ts", right_ts="buy_ts",
        left_cols=["user_id", "view_id"],
        right_cols=["buy_id", "buy_value"],
        window_secs=3600,
    )
    want = sorted(tuple(r) for r in c.execute(sql).fetchall())
    got = sorted(
        tuple(r)
        for r in _ij(spark, ij_events).select(
            "user_id", "view_id", "buy_id", "buy_value", "delta_us"
        ).collect()
    )
    assert got == want


def test_interval_join_stream_matches_batch_on_fixture(spark, tmp_path):
    """Streaming↔batch interval-join parity on the real events
    fixture: the watermarked stream-stream inner join run to
    completion equals the batch banded operator row-for-row — two
    genuinely different execution paths (symmetric hash join with
    range eviction vs bucket-fan-out equi-join) on one contract."""
    import os

    from pdf_parser_spark.operators.events import interval_join
    from pdf_parser_spark.streaming.interval import run_interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    views_dir = str(tmp_path / "views")
    buys_dir = str(tmp_path / "buys")
    ev.where("event_type = 'view'").write.parquet(views_dir)
    ev.where("event_type = 'purchase'").write.parquet(buys_dir)
    out = str(tmp_path / "ij_out")
    run_interval_join(
        spark, views_dir, buys_dir, out, str(tmp_path / "ij_ckpt"),
        on="user_id", left_ts="ts", right_ts="buy_ts",
        right_cols=["buy_id", "buy_value"], window_secs=86400,
        left_select=["user_id", "ts", "event_id AS view_id"],
        right_select=["user_id", "ts AS buy_ts", "event_id AS buy_id",
                      "value AS buy_value"],
    )
    got = {
        (r.view_id, r.buy_id, r.delta_us, r.buy_value)
        for r in spark.read.parquet(out).collect()
    }
    views = ev.where("event_type = 'view'").select(
        "user_id", "ts", F.col("event_id").alias("view_id"))
    buys = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
        F.col("value").alias("buy_value"))
    want = {
        (r.view_id, r.buy_id, r.delta_us, r.buy_value)
        for r in interval_join(
            views, buys, on="user_id", left_ts="ts", right_ts="buy_ts",
            right_cols=["buy_id", "buy_value"], window_secs=86400,
        ).collect()
    }
    assert len(want) > 20
    assert got == want
