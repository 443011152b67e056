"""sf0.1 -> sf1 nonlinear-blowup check (round-5 verdict item 7).

The driver ships no sf1 parquet, so this tool synthesizes one ORDER
OF MAGNITUDE more data from the sf0.1 fixtures themselves: 10 copies
of `documents` with shifted doc_ids and per-copy salted text (so the
exact-dup rate stays realistic instead of jumping to 90%), and 10
copies of `embeddings` with dimension-0 perturbed per copy (so ANN /
near-dup structure scales instead of collapsing onto 10-way ties).
It then runs the most expensive registry queries at both scales and
reports wall ratios. A linear-complexity operator should land near
10x (modulo fixed overheads); anything far beyond its documented
complexity is flagged.

This is a SCALING diagnostic, not a correctness gate — the oracle
contract stays at sf0.01 against driver-generated data only.

Usage: python tools/sf1_bench.py [out_json]
Env:   SF1_DIR (default /tmp/sf1_synth), SF1_QUERIES (csv override)
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: the r4 bench's most expensive rows + the verdict-named four
QUERIES = [
    "allpairs_cosine",
    "semdedup",
    "edit_verify",
    "dup_spans",
    "dedup_clusters",
    "minhash_lsh_candidates",
    "embedding_neardup_pairs",
    "pareto_select",
    "curate_fates",
    "ivfpq_topk",
]


def build_sf1(spark, out_dir):
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for k in range(COPIES):
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * n_docs)
        )
        if k:
            # salt text + url so cross-copy rows are near-dups at
            # most, not exact dups
            c = c.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copysalt{k}"))
            )
            if "url" in c.columns:
                c = c.withColumn(
                    "url", F.concat(F.col("url"), F.lit(f"?copy={k}"))
                )
        parts.append(c)
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    eparts = []
    for k in range(COPIES):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_emb))
        if k:
            shift = float(k) * 0.003
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    # 2-arg transform lambda: arg 2 IS the array index
                    lambda x, i: x
                    + F.when(i == 0, F.lit(shift)).otherwise(F.lit(0.0)),
                ),
            )
        eparts.append(c)
    big_emb = eparts[0]
    for p in eparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # events for completeness (cheap queries may read them)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_us = ev.agg(F.max("user_id")).collect()[0][0] + 1
    evp = []
    for k in range(COPIES):
        evp.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(k * n_ev))
            .withColumn("user_id", F.col("user_id") + F.lit(k * n_us))
        )
    big_ev = evp[0]
    for p in evp[1:]:
        big_ev = big_ev.unionByName(p)
    big_ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # small dims pass through untouched
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        src = f"{SRC}/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_bench.json"
    sf1_dir = os.environ.get("SF1_DIR", "/tmp/sf1_synth")
    queries = os.environ.get("SF1_QUERIES", "").split(",") or None
    queries = [q for q in (queries or []) if q] or QUERIES

    import __spark_entry__ as entry
    from pdf_parser_spark.caching import release_cached
    from pdf_parser_spark.session import get_spark

    spark = get_spark("sf1_bench", master="local[32]")
    if not os.path.exists(f"{sf1_dir}/documents.parquet"):
        print(f"building {COPIES}x corpus at {sf1_dir} ...")
        t0 = time.time()
        build_sf1(spark, sf1_dir)
        print(f"  built in {time.time() - t0:.0f}s")

    qs = entry.queries()
    out = {"copies": COPIES, "queries": {}}
    for name in queries:
        fn = qs[name]
        walls = {}
        for label, d in (("sf0.1", SRC), ("sf1", sf1_dir)):
            t0 = time.time()
            try:
                n = fn(spark, d).count()
                walls[label] = {"wall": round(time.time() - t0, 2),
                                "rows": n}
            except Exception as e:  # noqa: BLE001
                walls[label] = {"error": str(e)[:200]}
            finally:
                release_cached()
        r = None
        if "wall" in walls.get("sf0.1", {}) and "wall" in walls.get(
                "sf1", {}):
            r = round(walls["sf1"]["wall"]
                      / max(walls["sf0.1"]["wall"], 1e-9), 2)
        out["queries"][name] = {**walls, "ratio": r}
        print(f"{name}: sf0.1 {walls.get('sf0.1')}  sf1 "
              f"{walls.get('sf1')}  ratio {r}")
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main()
