"""Bucketed-edge PageRank (operators/graph.py + jobs/bucketize.py):
writing the edge table bucketed by `src` pays the edge shuffle once at
write time; every PageRank round's contrib join and out-degree
aggregate then run with NO Exchange on the edge side — at 10^12 edges
that removes the dominant per-round shuffle.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.jobs.bucketize import write_bucketed
from pdf_parser_spark.operators import graph


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _edges(spark):
    # distinct by construction (mirrors link_edges output)
    return spark.range(4000).select(
        F.concat(F.lit("http://s"),
                 (F.col("id") % 200).cast("string")).alias("src"),
        F.concat(F.lit("http://d"),
                 (F.col("id") % 997).cast("string")).alias("dst"),
    ).distinct()


def _round_plan(spark, e):
    """Plan of ONE pagerank iteration (the exact loop body the
    operator runs) with merge hints pinning SMJ so a broadcast can't
    make the Exchange assertions pass for the wrong reason."""
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n1 = nodes.agg(F.count("*").cast("double").alias("n"))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("od"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    ).localCheckpoint()
    return _plan(
        graph.pagerank_round(e.hint("merge"), deg, nodes, n1,
                             ranks.hint("merge"), 0.85)
    )


@pytest.fixture()
def bkt_edges(spark):
    spark.sql("DROP TABLE IF EXISTS bkt_edges")
    write_bucketed(_edges(spark), "bkt_edges", key="src", buckets=8)
    yield "bkt_edges"
    spark.sql("DROP TABLE IF EXISTS bkt_edges")


def test_bucketed_round_edge_side_exchange_free(spark, bkt_edges):
    e = spark.table(bkt_edges).persist()
    plan = _round_plan(spark, e)
    e.unpersist()
    # the ONLY src-shuffle left is the small (id, rank) frame joining
    # INTO the bucketed edges; the edge scan feeds the SortMergeJoin
    # and the out-degree HashAggregate pair directly.
    assert plan.count("hashpartitioning(src") == 1, plan
    assert "Bucketed: true" in plan, plan
    # the persist must not hide the layout: the cached bucketed scan
    # still satisfies the join's distribution requirement.
    assert "InMemoryTableScan" in plan


def test_unbucketed_control_shuffles_edges(spark):
    e = _edges(spark).persist()
    e.count()
    plan = _round_plan(spark, e)
    e.unpersist()
    # control: without the bucket layout the edge side shuffles too
    assert plan.count("hashpartitioning(src") >= 2, plan


def test_pagerank_bucketed_matches_plain(spark, bkt_edges):
    edges = _edges(spark)
    want = {
        r["id"]: r["rank"]
        for r in graph.pagerank(edges, iters=2).collect()
    }
    got = {
        r["id"]: r["rank"]
        for r in graph.pagerank_bucketed(spark, bkt_edges,
                                         iters=2).collect()
    }
    assert got == want
