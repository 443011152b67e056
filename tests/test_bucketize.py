"""Bucketed documents table (jobs/bucketize.py): the id-shuffle is
paid once at write time; downstream equi-joins and aggregations on the
bucket key run with NO Exchange on the bucketed side."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pdf_parser_spark.jobs.bucketize import write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark):
    _drop(spark, "bkt_docs", "bkt_index")
    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text_hash"),
    )
    index = spark.range(0, 5000, 7).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("flag")
    )
    write_bucketed(docs, "bkt_docs", buckets=8)
    write_bucketed(index, "bkt_index", buckets=8)

    # merge hint pins SMJ so a BroadcastExchange can't make the
    # no-Exchange assertion pass (or fail) for the wrong reason
    joined = spark.table("bkt_docs").hint("merge").join(
        spark.table("bkt_index").hint("merge"), "doc_id"
    )
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == index.count()
    _drop(spark, "bkt_docs", "bkt_index")


def test_bucketed_groupby_has_no_exchange(spark):
    _drop(spark, "bkt_docs2")
    docs = spark.range(3000).select(
        (F.col("id") % 500).alias("doc_id"),
        F.col("id").alias("n"),
    )
    write_bucketed(docs, "bkt_docs2", buckets=8)

    agg = spark.table("bkt_docs2").groupBy("doc_id").agg(
        F.sum("n").alias("s")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 500
    _drop(spark, "bkt_docs2")


def test_unbucketed_control_does_shuffle(spark):
    # control: the same join WITHOUT bucketing must show the Exchange
    # the bucketed layout removes (guards against the assertion above
    # passing vacuously, e.g. broadcast kicking in).
    docs = spark.range(5000).select(F.col("id").alias("doc_id"))
    index = spark.range(0, 5000, 7).select(F.col("id").alias("doc_id"))
    plan = _plan(
        docs.hint("merge").join(index.hint("merge"), "doc_id")
    )
    assert "Exchange" in plan
