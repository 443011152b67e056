"""Recall@k of the IVF ANN path vs brute-force cosine ground truth.

Usage: python tools/ivf_recall.py [sf_dir] [k]

Reports mean recall@k over a fixed query panel for the unrefined
(lloyd_iters=0, the oracle-mirrored path) and refined (lloyd_iters=2)
codebooks at the default nprobe/k geometry (2 of 8 cells), plus the
scan fraction each probe actually touched. The refined number is the
one BENCH.md records (VERDICT r2 next-round #2).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pdf_parser_spark.caching import release_cached  # noqa: E402
from pdf_parser_spark.operators import similarity as sim  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402

QUERY_IDS = (0, 7, 23, 101, 499)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("ivf-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    qvecs = {
        qid: list(emb.where(F.col("vec_id") == qid).first()["embedding"])
        for qid in QUERY_IDS
    }
    truth = {
        qid: {r.vec_id for r in
              sim.cosine_topk(emb, qv, k=k, id_col="vec_id").collect()}
        for qid, qv in qvecs.items()
    }
    for iters in (0, 2):
        index = sim.ivf_build(emb, lloyd_iters=iters)
        hits = total = scanned = 0
        for qid, qv in qvecs.items():
            got = {r.vec_id
                   for r in sim.ivf_search(index, qv, k=k).collect()}
            hits += len(truth[qid] & got)
            total += k
            cells = index.probe_cells(qv)
            scanned += index.assigned.where(
                F.col("cell").isin(cells)).count()
        print(
            f"lloyd_iters={iters}: recall@{k} = {hits / total:.3f} "
            f"({hits}/{total} over {len(QUERY_IDS)} queries), "
            f"scan fraction = {scanned / (total / k) / n:.3f} "
            f"(nprobe {sim.IVF_NPROBE}/{sim.IVF_K}, corpus {n})"
        )
        release_cached()

    # --- PQ / IVF+PQ: squared-L2 ground truth (PQ's native metric) ---
    def l2_truth(qv):
        q = F.array(*[F.lit(float(v)) for v in qv])
        return {
            r.vec_id
            for r in emb.select(
                "vec_id",
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"), q,
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0), lambda a, v: a + v,
                ).alias("d"),
            ).orderBy(F.asc("d"), F.asc("vec_id")).limit(k).collect()
        }

    truth_l2 = {qid: l2_truth(qv) for qid, qv in qvecs.items()}
    for iters in (0, 1):
        index = sim.pq_build(emb, lloyd_iters=iters)
        hits = total = 0
        for qid, qv in qvecs.items():
            got = {r.vec_id
                   for r in sim.pq_search(index, qv, k=k).collect()}
            hits += len(truth_l2[qid] & got)
            total += k
        print(
            f"pq lloyd_iters={iters}: recall@{k} = {hits / total:.3f} "
            f"({hits}/{total}; codes {sim.PQ_M} B vs "
            f"{4 * len(qvecs[0])} B vectors, corpus {n})"
        )
        release_cached()
    hits = total = 0
    for qid, qv in qvecs.items():
        got = {r.vec_id
               for r in sim.ivfpq_topk(emb, k=k, query_id=qid).collect()}
        hits += len(truth_l2[qid] & got)
        total += k
        release_cached()
    print(
        f"ivfpq (nprobe {sim.IVF_NPROBE}/{sim.IVF_K}): recall@{k} = "
        f"{hits / total:.3f} ({hits}/{total})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
