"""Headline benchmark for the PySpark extraction engine.

Runs the flagship pipeline (pages → documents, both HTML and PDF
routes built deterministically from $SPARK_GRAFT_SF_DIR/documents
per BASELINE.json input_hint) plus the training-data-tier operators,
on local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ..., ...}

The driver records this as BENCH_r{N}.json. For the north rule's
two-cluster-size scaling evidence, run tools/scaling_bench.py (same
job at N=1 and 4N=4 separate executor JVMs, sized inside the host's
measured CPU budget → efficiency in BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


#: trials per query (median reported); override with SPARK_GRAFT_TRIALS=1
#: for a quick pass
N_TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pdf_parser_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from pdf_parser_spark.jobs.extract import extract_documents
    from pdf_parser_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()

    timings: dict[str, float] = {}
    trials: dict[str, dict] = {}
    extra: dict[str, float] = {}

    from pdf_parser_spark.caching import release_cached

    def timed(name: str, fn):
        """Trial-median timing: run `fn` N_TRIALS times, record the
        median wall — single-trial numbers can't be separated from
        ambient co-tenant noise on this box (up to 2x wall variance).
        Operator-internal caches are released between trials so each
        trial pays the full plan. Per-trial walls AND the 1-min load
        average at each trial end are emitted alongside the median:
        a median that hides a 10x straggler trial (or rides a loaded
        window — this KVM host shows multi-minute co-tenant bursts)
        is visible in the record instead of shipping unexplained
        (the round-3 ann_lsh_topk 35 s outlier was exactly this)."""
        walls = []
        loads = []
        out = None
        for _ in range(N_TRIALS):
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 3))
            loads.append(round(os.getloadavg()[0], 2))
            release_cached()
        timings[name] = sorted(walls)[len(walls) // 2]
        trials[name] = {"walls": walls, "load1": loads}
        return out

    # materialize the synthetic pages ONCE (datagen is bench harness,
    # not engine work) so extract timing measures the pipeline itself
    sf_tag = sf_dir.strip("/").replace("/", "_")
    pages_path = f"/tmp/bench_pages_{sf_tag}.parquet"
    if not os.path.exists(pages_path):
        pages = entry._html_pages(docs.where(F.col("doc_id") % 4 != 3)).unionByName(
            entry._pdf_pages(docs.where(F.col("doc_id") % 4 == 3))
        )
        pages.write.mode("overwrite").parquet(pages_path)

    # flagship: mixed-route extraction (the BASELINE.json metric).
    # Warm-up first (5% sample): forks the Python workers and JITs the
    # JVM so the timed pass measures the engine, not process startup —
    # same protocol as tools/scaling_worker.py.
    def q_extract(sample=None):
        pages = spark.read.parquet(pages_path)
        if sample:
            pages = pages.sample(sample, seed=1)
        out = extract_documents(pages, partitions=cpus * 2)
        return out.agg(
            F.count("*"), F.sum(F.length("text")), F.sum("num_chunks")
        ).collect()

    q_extract(sample=0.05)
    timed("extract_mixed", q_extract)
    extra["docs_per_sec"] = round(n_docs / timings["extract_mixed"], 2)

    # tables: ruled-PDF lattice extraction throughput
    timed(
        "extract_tables",
        lambda: entry._q_extract_pdf_tables(spark, sf_dir)
        .agg(F.sum("n_tables")).collect(),
    )

    # dedup family
    timed("minhash_lsh", lambda: dedup.minhash_lsh_candidates(docs).count())
    timed(
        "dedup_clusters",
        lambda: dedup.dedup_clusters(
            dedup.minhash_lsh_candidates(docs)).count(),
    )
    timed("simhash", lambda: dedup.simhash32(docs).agg(F.sum("simhash")).collect())
    timed(
        "ngram_jaccard",
        lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.5).count(),
    )
    timed("exact_dedup", lambda: dedup.exact_dedup(docs).count())
    timed(
        "bloom_dedup",
        lambda: entry._q_bloom_dedup(spark, sf_dir)
        .where("maybe_dup").count(),
    )
    timed(
        "dup_spans",
        lambda: entry._q_dup_span_stats(spark, sf_dir)
        .agg(F.sum("dup_words")).collect(),
    )
    timed(
        "contamination",
        lambda: entry._q_contamination(spark, sf_dir)
        .agg(F.sum("n_hits")).collect(),
    )
    # winnowing: the sampled overlap tier — map-only fingerprint
    # selection, ~2/(w+1) the positional tier's shuffled volume
    timed(
        "winnow_fp",
        lambda: entry._q_winnow_fp(spark, sf_dir)
        .agg(F.count("*"), F.sum("fp")).collect(),
    )

    # text analysis (one fused native pass)
    def q_textstats():
        from pdf_parser_spark.functions import textstats as ts

        return docs.select(
            ts.ws_token_count(F.col("text")).alias("a"),
            ts.bpe_token_count(F.col("text")).alias("b"),
            ts.quality_score(F.col("text")).alias("q"),
            ts.lang_id(F.col("text")).alias("l"),
            ts.md5_fingerprint(F.col("text")).alias("m"),
        ).agg(F.sum("a"), F.sum("b"), F.sum("q"), F.count("l")).collect()

    timed("textstats", q_textstats)

    # exact heavy hitters: bounded MG candidate pass + native verify
    timed(
        "heavy_hitters",
        lambda: entry._q_heavy_hitters(spark, sf_dir).count(),
    )

    # BPE encode with the shipped merge list: pure chained-replace
    # codegen projection (the map-only tokenization path)
    timed(
        "bpe_tokens",
        lambda: entry._q_bpe_tokens(spark, sf_dir)
        .agg(F.sum("n_tokens")).collect(),
    )

    # similarity search
    timed("cosine_topk", lambda: entry._q_cosine_topk(spark, sf_dir).collect())
    timed("ann_lsh_topk", lambda: entry._q_ann_topk(spark, sf_dir).collect())
    timed("ivf_topk", lambda: entry._q_ivf_topk(spark, sf_dir).collect())
    timed(
        "ivf_refined_topk",
        lambda: entry._q_ivf_refined_topk(spark, sf_dir).collect(),
    )
    timed("pq_topk", lambda: entry._q_pq_topk(spark, sf_dir).collect())
    timed("ivfpq_topk",
          lambda: entry._q_ivfpq_topk(spark, sf_dir).collect())
    timed(
        "emb_neardup",
        lambda: entry._q_emb_neardup(spark, sf_dir).count(),
    )
    timed("semdedup", lambda: entry._q_semdedup(spark, sf_dir)
          .where("is_dup").count())

    # sampling / packing / PII (map-side or few-shuffle natives)
    timed("hash_sample", lambda: entry._q_hash_sample(spark, sf_dir).count())
    timed(
        "url_canonicalize",
        lambda: entry._q_url_canonicalize(spark, sf_dir).count(),
    )
    timed("domain_stats", lambda: entry._q_domain_stats(spark, sf_dir).count())
    timed(
        "warc_roundtrip",
        lambda: entry._q_warc_roundtrip(spark, sf_dir).count(),
    )
    timed("tfidf_topk", lambda: entry._q_tfidf_topk(spark, sf_dir).count())

    # link-graph tier (parse fan-out + iterated-join PageRank)
    timed(
        "extract_links",
        lambda: entry._q_extract_links(spark, sf_dir).count(),
    )
    timed("pagerank", lambda: entry._q_pagerank(spark, sf_dir).count())
    timed("cdx_latest", lambda: entry._q_cdx_latest(spark, sf_dir).count())
    # crawl refresh: snapshot fingerprint diff → politeness waves
    timed(
        "refresh_plan",
        lambda: entry._q_refresh_plan(spark, sf_dir).count(),
    )
    timed("bm25_topk", lambda: entry._q_bm25_topk(spark, sf_dir).count())
    timed(
        "bm25_indexed",
        lambda: entry._q_bm25_indexed(spark, sf_dir).count(),
    )
    timed("mix_corpus", lambda: entry._q_mix_corpus(spark, sf_dir).count())
    timed(
        "stratified_sample",
        lambda: entry._q_stratified_sample(spark, sf_dir).count(),
    )
    timed("pack_blocks", lambda: entry._q_pack_blocks(spark, sf_dir)
          .agg(F.max("bin_id")).collect())
    timed("pack_concat", lambda: entry._q_pack_concat(spark, sf_dir)
          .agg(F.max("block_id"), F.sum("seg_len")).collect())
    timed("pii_counts", lambda: entry._q_pii_counts(spark, sf_dir)
          .agg(F.sum("emails"), F.sum("redacted_len")).collect())
    timed(
        "token_budget_sample",
        lambda: entry._q_token_budget_sample(spark, sf_dir).count(),
    )
    timed("gopher_gate", lambda: entry._q_gopher_gate(spark, sf_dir)
          .where("NOT keep").count())
    timed("dsir_topn", lambda: entry._q_dsir_topn(spark, sf_dir).collect())
    timed("lm_perplexity", lambda: entry._q_lm_perplexity(spark, sf_dir)
          .agg(F.avg("ppl")).collect())
    timed("pareto_select", lambda: entry._q_pareto_select(spark, sf_dir)
          .where("kept").count())

    # relational natives
    timed(
        "pricing_summary",
        lambda: entry._q_pricing_summary(spark, sf_dir).collect(),
    )
    timed(
        "events_hourly", lambda: entry._q_events_hourly(spark, sf_dir).count()
    )
    # event analytics: one-shuffle window DP + cohort matrix
    timed(
        "window_funnel",
        lambda: entry._q_window_funnel(spark, sf_dir)
        .agg(F.sum("funnel_level")).collect(),
    )
    timed(
        "sessionize",
        lambda: entry._q_sessionize(spark, sf_dir).count(),
    )
    # banded interval join: equi-join decomposition of the range join
    timed(
        "click_attribution",
        lambda: entry._q_click_attribution(spark, sf_dir).count(),
    )
    # media tier: native header telemetry + real BMP decode -> aHash
    timed(
        "media_metadata",
        lambda: entry._q_media_metadata(spark, sf_dir).count(),
    )
    timed(
        "ahash_images",
        lambda: entry._q_ahash_images(spark, sf_dir).count(),
    )
    # charset front door: hex-space sniff + decode, pure codegen
    timed(
        "html_decode",
        lambda: entry._q_html_decode(spark, sf_dir)
        .agg(F.sum("n_chars")).collect(),
    )
    # trigram index serve: candidates + verify, no corpus scan shape
    timed(
        "trigram_search",
        lambda: entry._q_trigram_search(spark, sf_dir).count(),
    )
    # exact all-pairs cosine via prefix filtering
    timed(
        "allpairs_cosine",
        lambda: entry._q_allpairs_cosine(spark, sf_dir).count(),
    )
    # domain-level weighted pagerank over the eTLD+1 rollup
    timed(
        "domain_rank",
        lambda: entry._q_domain_rank(spark, sf_dir).count(),
    )
    # temperature-balanced multilingual mix
    timed(
        "temperature_mix",
        lambda: entry._q_temperature_mix(spark, sf_dir).count(),
    )
    # content-defined chunking: native array fold, no shuffle
    timed(
        "cdc_chunks",
        lambda: entry._q_cdc_chunks(spark, sf_dir)
        .agg(F.sum("length")).collect(),
    )
    # edit-distance verify over LSH candidates
    timed(
        "edit_verify",
        lambda: entry._q_edit_verify(spark, sf_dir).count(),
    )

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "extraction+training-data suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "trials": trials,
        "sf": sf_dir,
        "n_docs": n_docs,
        "cpus": cpus,
        **extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
