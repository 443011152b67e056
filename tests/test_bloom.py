"""Bloom-filter dedup (operators/bloom.py): the no-false-negative
guarantee, tunable false positives, bounded filter size, and the
cross-engine twin."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators import bloom

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_no_false_negatives_and_fresh_text_passes(spark):
    """Every history text is flagged; fresh texts pass at a wide
    filter (FP rate ~(bits/m)^7 is negligible at m=2^22)."""
    d = _docs(spark)
    hist = d.where(F.col("doc_id") % 2 == 0)
    flags = {
        r.doc_id: r.maybe_dup
        for r in bloom.bloom_maybe_dup_against(d, hist).collect()
    }
    assert all(flags[i] for i in flags if i % 2 == 0)
    assert not any(flags[i] for i in flags if i % 2 == 1)


def test_false_positives_appear_at_tiny_m_never_negatives(spark):
    """Shrinking m trades memory for false positives — but history
    texts stay flagged (the Bloom contract)."""
    d = _docs(spark).limit(100)
    hist = d.where(F.col("doc_id") % 2 == 0)
    flags = {
        r.doc_id: r.maybe_dup
        for r in bloom.bloom_maybe_dup_against(d, hist, m=64).collect()
    }
    assert all(flags[i] for i in flags if i % 2 == 0)  # no false negs
    assert any(flags[i] for i in flags if i % 2 == 1)  # FPs now occur


def test_filter_size_is_bounded_by_m(spark):
    d = _docs(spark)
    assert bloom.build_bloom_bits(d, m=128).count() <= 128
    wide = bloom.build_bloom_bits(d, m=1 << 22).count()
    assert wide <= d.count() * bloom.DEFAULT_K


def test_spark_matches_duckdb_twin(spark):
    import duckdb

    d = _docs(spark)
    got = {
        (r.doc_id, r.maybe_dup)
        for r in bloom.bloom_maybe_dup_against(
            d, d.where(F.col("doc_id") % 3 == 0), m=256, salt="t"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    sql = bloom.bloom_maybe_dup_sql(
        "documents", "(SELECT * FROM documents WHERE doc_id % 3 = 0)",
        m=256, salt="t",
    )
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want and len(got) == 500
