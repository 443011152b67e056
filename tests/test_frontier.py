"""Frontier scheduling (jobs/frontier.py): politeness invariant,
determinism, robots gating, exact per-host quota, DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.jobs.frontier import (
    frontier_schedule,
    frontier_schedule_sql,
)
from pdf_parser_spark.sources.robots import parse_robots


@pytest.fixture(scope="module")
def pages(spark):
    # 40 hosts x uneven url counts (host 0 is 'heavy'), plus dup urls
    return spark.range(2000).select(
        F.concat(
            F.lit("https://h"),
            F.when(F.col("id") < 500, F.lit(0)).otherwise(F.col("id") % 40),
            F.lit(".example.com/p/"),
            (F.col("id") % 1700).cast("string"),
        ).alias("url")
    ).persist()


def test_politeness_invariant_and_determinism(pages):
    out = frontier_schedule(pages).collect()
    pairs = [(r.host, r.wave) for r in out]
    assert len(pairs) == len(set(pairs))  # one url per (host, wave)
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r.wave)
    for host, waves in by_host.items():
        assert sorted(waves) == list(range(1, len(waves) + 1)), host
    again = frontier_schedule(pages).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # dedup: distinct urls only
    n_urls = pages.distinct().count()
    assert len(out) == n_urls


def test_per_host_limit_is_exact_window_prefix(pages):
    full = frontier_schedule(pages).where(F.col("wave") <= 3)
    capped = frontier_schedule(pages, per_host_limit=3)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, capped.collect())
    )


def test_robots_gating(spark, pages):
    rules = parse_robots(
        spark.createDataFrame(
            [("h0.example.com", "User-agent: *\nDisallow: /")],
            "host string, robots_txt string",
        )
    )
    out = frontier_schedule(pages, rules=rules).collect()
    assert not any(r.host == "h0.example.com" for r in out)
    assert any(r.host == "h1.example.com" for r in out)


def test_duckdb_twin(spark, pages):
    urls = [r.url for r in pages.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (url VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?)", [(u,) for u in urls])
    for limit in (None, 5):
        got = sorted(
            tuple(r)
            for r in frontier_schedule(
                pages, per_host_limit=limit, salt="fz"
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                frontier_schedule_sql(
                    "pages", per_host_limit=limit, salt="fz"
                )
            ).fetchall()
        )
        assert got == want, limit


def test_crawl_budgets_allocation(spark):
    import pytest

    from pdf_parser_spark.jobs.frontier import crawl_budgets

    ranks = spark.createDataFrame(
        [("a", 0.6), ("b", 0.3), ("c", 0.0999), ("d", 0.0001)],
        "id string, rank double",
    )
    got = {r.id: r.budget
           for r in crawl_budgets(ranks, 10_000).collect()}
    # proportional, floored; tiny domains get the min_pages floor
    assert got["a"] == 6000 and got["b"] == 3000
    assert got["d"] == 1
    assert sum(got.values()) <= 10_000 + len(got)  # residue bounded
    # beta=0.5 flattens: head share shrinks, tail share grows
    flat = {r.id: r.budget
            for r in crawl_budgets(ranks, 10_000, beta=0.5).collect()}
    assert flat["a"] < got["a"] and flat["c"] > got["c"]
    with pytest.raises(ValueError):
        crawl_budgets(ranks, 0)
    with pytest.raises(ValueError):
        crawl_budgets(ranks, 100, beta=0.3)
