"""IVF-flat ANN invariants (operators/similarity.py ivf_*): the
deterministic codebook, map-only cell assignment, and probe pruning."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_ivf_topk_contains_query_and_is_sorted(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    rows = sim.ivf_topk(emb, qvec, k=10).collect()
    assert len(rows) == 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    # the query's own vector lives in the query's nearest cell, which
    # is always the first probe — it must rank first with cosine 1.0
    assert rows[0].vec_id == 0 and rows[0].cos_sim == 1.0


def test_ivf_assignment_partitions_everything(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    cb = sim.ivf_codebook(emb, k=sim.IVF_K)
    assert len(cb) == sim.IVF_K
    assigned = sim.ivf_assign(emb, cb)
    # total membership preserved; every cell id within [1, k]
    cells = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in cells) == n
    assert all(1 <= r.cell <= sim.IVF_K for r in cells)
    # probing nprobe of k cells scans a strict subset (the pruning
    # that makes IVF the scale path)
    qvec = list(emb.where(F.col("vec_id") == 7).first()["embedding"])
    probed = sim.ivf_topk(emb, qvec, k=10**6, nprobe=sim.IVF_NPROBE)
    assert probed.count() < n
