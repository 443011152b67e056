"""Product-quantization ANN invariants (operators/similarity.py
pq_*): deterministic codebooks, map-only encoding, Lloyd refinement,
ADC search, and the DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pq_codes_contract(spark):
    emb = _emb(spark)
    books = sim.pq_codebooks(emb)
    assert len(books) == sim.PQ_M * sim.PQ_KSUB
    codes = sim.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == sim.PQ_M
        assert all(1 <= c <= sim.PQ_KSUB for c in r.codes)
    # deterministic under rerun
    again = sim.pq_encode(emb, books).collect()
    assert sorted((r.vec_id, tuple(r.codes)) for r in codes) == sorted(
        (r.vec_id, tuple(r.codes)) for r in again
    )


def test_pq_seed_guard(spark):
    emb = _emb(spark).limit(10)
    with pytest.raises(ValueError, match="seed"):
        sim.pq_codebooks(emb, m_sub=8, ksub=8)
    full = _emb(spark)
    with pytest.raises(ValueError, match="divisible"):
        sim.pq_codebooks(full, m_sub=7, ksub=2)


def test_pq_search_separates_clusters(spark):
    # three well-separated clusters in R^8: ADC must rank the query's
    # own cluster ahead of the others even through quantization
    def vec(base, wiggle):
        return [float(base + 0.01 * wiggle * (i + 1)) for i in range(8)]

    rows = []
    vid = 0
    for base in (0.0, 10.0, 20.0):
        for w in range(8):
            rows.append((vid, vec(base, w)))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = sim.pq_build(df, m_sub=2, ksub=4)
    got = sim.pq_search(index, vec(0.0, 3), k=8).collect()
    assert len(got) == 8
    assert {r.vec_id for r in got} == set(range(8))   # cluster 0 only
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)


def test_pq_lloyd_reduces_distortion(spark):
    emb = _emb(spark)
    books0 = sim.pq_codebooks(emb)

    def distortion(books):
        codes = sim.pq_encode(emb, books)
        dsub = len(next(iter(books.values())))
        v = F.col("embedding").cast("array<double>")
        total = F.lit(0.0)
        for s in range(sim.PQ_M):
            sl = F.slice(v, s * dsub + 1, dsub)
            dists = F.array(*[
                F.round(sim._l2sq(sl, books[(s, c)]), 6)
                for c in range(1, sim.PQ_KSUB + 1)
            ])
            total = total + F.array_min(dists)
        return emb.select(F.sum(total).alias("d")).first()["d"]

    d0 = distortion(books0)
    books1 = sim.pq_lloyd_step(emb, books0)
    d1 = distortion(books1)
    assert d1 <= d0
    # refined build beats the seeded build on reconstruction error
    assert d1 < d0 * 0.9


def test_pq_lloyd_keeps_empty_cells(spark):
    # 4 identical vectors, 2x2 books: most cells lose all members and
    # must keep their previous centroid
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    # hand-built books: cell 1 near the data, cell 2 far away — every
    # row assigns to cell 1, so cell 2 is empty in both subspaces
    books = {
        (0, 1): [0.0, 0.0], (0, 2): [100.0, 100.0],
        (1, 1): [0.0, 0.0], (1, 2): [100.0, 100.0],
    }
    out = sim.pq_lloyd_step(df, books, m_sub=2, ksub=2)
    assert set(out) == set(books)
    # winners move to the member mean; empty cells keep old centroids
    assert out[(0, 1)] == [1.0, 2.0] and out[(1, 1)] == [3.0, 4.0]
    assert out[(0, 2)] == [100.0, 100.0]
    assert out[(1, 2)] == [100.0, 100.0]


def test_pq_topk_twin(spark):
    got = sim.pq_topk(_emb(spark), k=15).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF}/embeddings.parquet'"
    )
    want = con.execute(sim.pq_topk_sql(k=15)).fetchall()
    assert [(r.vec_id, r.adc_dist) for r in got] == [
        (v, d) for v, d in want
    ]
    assert len(got) == 15


def test_pq_recall_vs_exact(spark):
    # ADC over 8-byte codes must still land most of the exact
    # squared-L2 top-20 inside its own top-20 (deterministic corpus,
    # deterministic codebooks -> deterministic recall)
    emb = _emb(spark)
    qvec = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    q = F.array(*[F.lit(float(v)) for v in qvec])
    exact = (
        emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"), q,
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0), lambda a, v: a + v,
            ).alias("d"),
        )
        .orderBy(F.asc("d"), F.asc("vec_id")).limit(20).collect()
    )
    exact_ids = {r.vec_id for r in exact}
    approx_ids = {r.vec_id for r in sim.pq_topk(emb, k=20).collect()}
    recall = len(exact_ids & approx_ids) / 20
    assert recall >= 0.3, recall


def test_ivfpq_is_pq_restricted_to_probed_cells(spark):
    emb = _emb(spark)
    got = sim.ivfpq_topk(emb, k=12).collect()
    # recompute by hand: PQ ADC ranking over only the probed cells
    icb = sim.ivf_codebook(emb)
    books = sim.pq_codebooks(emb)
    qvec = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    probes = {
        c[0]
        for c in sorted(
            icb, key=lambda c: (-round(sim._cos_py(qvec, c[1]), 6), c[0])
        )[: sim.IVF_NPROBE]
    }
    surv = sim.ivf_assign(emb, icb).where(
        F.col("cell").isin(list(probes))
    ).select("vec_id", "embedding")
    index = sim.PqIndex(
        books, sim.pq_encode(surv, books), sim.PQ_M, sim.PQ_KSUB, "vec_id"
    )
    want = sim.pq_search(index, qvec, k=12).collect()
    assert [(r.vec_id, r.adc_dist) for r in got] == [
        (r.vec_id, r.adc_dist) for r in want
    ]
    # pruning is real: survivors are a strict subset of the corpus
    assert 0 < surv.count() < emb.count()


def test_ivfpq_twin(spark):
    got = sim.ivfpq_topk(_emb(spark), k=10).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF}/embeddings.parquet'"
    )
    want = con.execute(sim.ivfpq_topk_sql(k=10)).fetchall()
    assert [(r.vec_id, r.adc_dist) for r in got] == [
        (v, d) for v, d in want
    ]
