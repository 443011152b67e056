"""Streaming trending terms (streaming/trending.py): stream snapshot
== batch twin on the same files, watermark bounds state, top-k view
deterministic."""

import datetime

from pyspark.sql import functions as F

from pdf_parser_spark.streaming import trending as tr

SF = "/root/testdata/sf0.001"
_T0 = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)


def _doc_fixture(spark):
    # spread docs across 3 hours so several windows exist
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    return docs.select(
        "doc_id",
        F.to_timestamp(
            F.lit(_T0) + F.make_interval(mins=(F.col("doc_id") % 180))
        ).alias("warc_ts"),
        "text",
    )


def test_stream_snapshot_equals_batch(spark, tmp_path):
    fix = _doc_fixture(spark)
    docs_dir = str(tmp_path / "docs")
    fix.write.parquet(docs_dir)
    out = str(tmp_path / "out")
    tr.run_trending_complete(
        spark, docs_dir, out, str(tmp_path / "ckpt")
    )
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r)
        for r in tr.trending_terms_batch(
            spark.read.parquet(docs_dir)
        ).collect()
    )
    assert got == want and len(got) > 30
    # windows tile the 3-hour span
    wins = {r[0] for r in got}
    assert len(wins) == 3


def test_topk_deterministic_and_bounded(spark):
    fix = _doc_fixture(spark)
    counts = tr.trending_terms_batch(fix)
    top = tr.topk_per_window(counts, k=5).collect()
    per_win = {}
    for r in top:
        per_win.setdefault(r.win_start_us, []).append(r)
    for win, rows in per_win.items():
        assert len(rows) <= 5
        rows.sort(key=lambda r: r.rank)
        # rank order follows (n desc, term asc)
        keys = [(-r.n, r.term) for r in rows]
        assert keys == sorted(keys)
    # stable under re-execution
    again = tr.topk_per_window(counts, k=5).collect()
    assert sorted(map(tuple, top)) == sorted(map(tuple, again))
