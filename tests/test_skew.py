"""North-rule skew defusal: salted repartition by url-hash must spread
a pathologically skewed crawl (one host's giant documents arriving
consecutively) evenly across partitions."""

from pyspark.sql import functions as F

from pdf_parser_spark.jobs.extract import salted_repartition


def _partition_byte_sums(df):
    return [
        r.total
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.sum(F.length("html")).alias("total"))
        .collect()
    ]


def test_salting_spreads_clustered_giants(spark):
    # 990 small docs + 10 giant docs from one host, clustered in url
    # order (the crawl-locality worst case)
    rows = [(f"https://small.example/{i:05d}", b"x" * 200)
            for i in range(990)]
    rows += [(f"https://giant.example/{i:02d}", b"y" * 400_000)
             for i in range(10)]
    pages = spark.createDataFrame(rows, "url string, html binary")

    n_parts = 8
    # range partitioning by url (what naive ingest order gives) puts
    # the giants together
    naive = pages.repartitionByRange(n_parts, "url")
    naive_sums = _partition_byte_sums(naive)
    salted = salted_repartition(pages, n_parts)
    salted_sums = _partition_byte_sums(salted)

    total = sum(salted_sums)
    assert total == sum(naive_sums)
    # naive: one partition carries nearly all bytes
    assert max(naive_sums) > 0.5 * total
    # salted: the heaviest partition carries a bounded share
    assert max(salted_sums) < 0.35 * total
    assert len(salted_sums) == n_parts
