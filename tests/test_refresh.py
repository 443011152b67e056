"""Crawl refresh planner (jobs/refresh.py): status routing, rotating
backoff coverage, priority-ordered politeness waves, robots gating,
recuration delta, determinism at any partitioning, twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.jobs import refresh as rf

OLD = [
    ("http://a.com/keep", "same"),
    ("http://a.com/edit", "v1"),
    ("http://a.com/gone", "bye"),
    ("http://b.com/keep", "same2"),
    ("http://b.com/edit", "v1"),
]
NEW = [
    ("http://a.com/keep", "same"),
    ("http://a.com/edit", "v2"),
    ("http://b.com/keep", "same2"),
    ("http://b.com/edit", "v2"),
    ("http://b.com/new", "fresh"),
    ("http://c.com/new", "fresh2"),
]


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(OLD, "url string, text string")
    new = spark.createDataFrame(NEW, "url string, text string")
    return old, new


def test_candidate_routing(spark, snaps):
    old, new = snaps
    # backoff=1: every unchanged url re-enters; removed never does
    got = {
        r.url: (r.status, r.priority)
        for r in rf.refresh_candidates(old, new, backoff=1).collect()
    }
    assert got == {
        "http://a.com/edit": ("changed", 0),
        "http://b.com/edit": ("changed", 0),
        "http://b.com/new": ("added", 1),
        "http://c.com/new": ("added", 1),
        "http://a.com/keep": ("unchanged", 2),
        "http://b.com/keep": ("unchanged", 2),
    }


def test_backoff_rotates_full_coverage(spark, snaps):
    """Across enough cycles every unchanged url re-enters at least
    once, while changed/added appear every cycle."""
    old, new = snaps
    seen = set()
    for cycle in range(12):
        rows = rf.refresh_candidates(old, new, backoff=3, cycle=cycle)
        urls = {r.url for r in rows.collect()}
        assert {"http://a.com/edit", "http://b.com/new"} <= urls
        seen |= {u for u in urls if u.endswith("/keep")}
    assert seen == {"http://a.com/keep", "http://b.com/keep"}


def test_plan_waves_polite_and_priority_ordered(spark, snaps):
    old, new = snaps
    plan = rf.refresh_plan(old, new, backoff=1).collect()
    # politeness: one url per host per wave
    pairs = [(r.host, r.wave) for r in plan]
    assert len(pairs) == len(set(pairs))
    # priority: within each host, waves are sorted by priority
    by_host = {}
    for r in plan:
        by_host.setdefault(r.host, []).append((r.wave, r.priority))
    for host, rows in by_host.items():
        rows.sort()
        pris = [p for _, p in rows]
        assert pris == sorted(pris), host
    # b.com has changed + added + unchanged: changed must be wave 1
    b = {r.wave: r.status for r in plan if r.host == "b.com"}
    assert b[1] == "changed"


def test_plan_robots_gate(spark, snaps):
    from pdf_parser_spark.sources.robots import parse_robots

    old, new = snaps
    robots = spark.createDataFrame(
        [("c.com", "User-agent: *\nDisallow: /")],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots)
    plan = rf.refresh_plan(old, new, rules=rules, backoff=1)
    hosts = {r.host for r in plan.collect()}
    assert "c.com" not in hosts and {"a.com", "b.com"} <= hosts


def test_plan_partitioning_invariant(spark, snaps):
    old, new = snaps
    a = sorted(map(tuple, rf.refresh_plan(old, new, cycle=2).collect()))
    b = sorted(map(tuple, rf.refresh_plan(
        old.repartition(7), new.repartition(3), cycle=2).collect()))
    assert a == b


def test_recurate_delta(spark, snaps):
    old, new = snaps
    got = {r.url: r.text for r in rf.recurate_delta(new, old).collect()}
    assert got == {
        "http://a.com/edit": "v2",
        "http://b.com/edit": "v2",
        "http://b.com/new": "fresh",
        "http://c.com/new": "fresh2",
    }


def test_guard_rails(spark, snaps):
    old, new = snaps
    with pytest.raises(ValueError):
        rf.refresh_candidates(old, new, backoff=0)


def test_duckdb_twin_parity(spark, snaps):
    old, new = snaps
    con = duckdb.connect()
    con.execute("CREATE TABLE old_snap (url VARCHAR, text VARCHAR)")
    con.execute("CREATE TABLE new_snap (url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO old_snap VALUES (?, ?)", OLD)
    con.executemany("INSERT INTO new_snap VALUES (?, ?)", NEW)
    sql = rf.refresh_plan_sql(
        "SELECT * FROM old_snap", "SELECT * FROM new_snap",
        backoff=2, cycle=1,
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    got = sorted(
        map(tuple, rf.refresh_plan(old, new, backoff=2, cycle=1).collect())
    )
    assert got == want
