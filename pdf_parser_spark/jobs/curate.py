"""End-to-end corpus curation: extraction output → training corpus.

The composition job a training-data pipeline actually runs, chaining
the repo's tiers in the publicly documented C4/CCNet/RefinedWeb
order: containment filter → quality gate → URL-level dedup → exact
text dedup → MinHash-LSH near-dedup → (optional) PII redaction and
hash sampling. The reference app has no pipeline tier (per-request
parser); this is the 10^12-row workflow its users would need.

Audit-grade single-pass design: instead of materializing a shrinking
corpus per stage, every document is TAGGED with its fate — the first
stage that dropped it (``error``, ``quality:<reason>``, ``url_dup``,
``exact_dup``, ``near_dup``) or ``kept``. The curated corpus is
``fate = 'kept'``; per-fate counts (the job's metrics row) and the
"why was my document dropped" answer both come from the same tagged
DataFrame — ONE extra shuffle for the metrics, zero re-scans.

Plan shape at 100 TB:
- quality/error/canonical-url tags are native column expressions
  (codegen, no shuffle);
- each dedup stage computes only a doc_id DROP LIST over the
  SURVIVORS of the previous stages (no wasted signatures for docs
  already dropped), joined back as a left join whose small side is
  the drop list — AQE broadcasts it at typical dup rates;
- texts never shuffle: URL dedup shuffles canonical-url strings,
  exact dedup 16-byte md5s, near-dedup the LSH band keys
  (operators/dedup.py's capped band table).
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import persisted, release_cached
from ..functions.textstats import pii_redact, quality_gate
from ..operators import urls as ur
from ..operators.dedup import (
    dedup_clusters,
    exact_dup_groups,
    minhash_lsh_candidates,
)
from ..operators.sampling import hash_draw, keep_threshold
from ..sources.catalog import append_table, read_table


def canonical_text(col):
    """The dedup-canonical form of a text column: mojibake repair
    (functions/mojibake.py) then CCNet normalization
    (functions/normalize.py) — so "Café—2024" and its cp1252-wrecked
    or reskinned variants hash together.  Pure native expressions;
    composes in front of every dedup family."""
    from ..functions.mojibake import fix_mojibake
    from ..functions.normalize import normalize_text

    return normalize_text(fix_mojibake(col))


def curate_documents(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    error_col: Optional[str] = "error",
    id_col: Optional[str] = None,
    near_dedup: bool = True,
    redact_pii: bool = False,
    sample_rate: Optional[float] = None,
    salt: str = "curate",
    canonicalize: bool = False,
) -> DataFrame:
    """Tag every document with its curation fate; returns the input
    columns plus ``doc_id``, ``canon_url`` and ``fate``. Kept rows
    are ``fate = 'kept'``; callers filter, and aggregate the same
    frame for metrics. ``id_col`` names an existing unique row id;
    without one, doc_id = md5 of the RAW url (the crawl table's
    natural key — canonical urls collide by design, that's what url
    dedup detects, so they can't identify rows). md5 is 128-bit, so
    at 10^12 rows expected birthday collisions are ~n²/2¹²⁹ ≈ 10⁻¹⁵ —
    negligible, where a 64-bit key would alias tens of thousands of
    row pairs and silently drop/keep the wrong document in every fate
    join. Dedup keepers are the MIN doc_id of each group, so a
    caller-supplied id also fixes which duplicate survives.

    ``canonicalize=True`` makes the exact- and near-dedup stages hash
    the :func:`canonical_text` form (mojibake repair + CCNet
    normalization) instead of the raw text, so trivially-reskinned
    duplicates ("Café—2024" vs "cafe-0000" vs the cp1252-wrecked
    variant) collapse; the quality gate, PII redaction, and the OUTPUT
    text stay raw."""
    d = docs.withColumn("canon_url", ur.canonical_url(F.col(url_col)))
    if id_col is None:
        d = d.withColumn("doc_id", F.md5(F.col(url_col)))
    elif id_col != "doc_id":
        d = d.withColumn("doc_id", F.col(id_col))

    err = (
        F.col(error_col).isNotNull() if error_col in docs.columns
        else F.lit(False)
    )
    gate = quality_gate(F.col(text_col))
    pre = (
        F.when(err, F.lit("error"))
        .when(F.trim(F.col(text_col)) == "", F.lit("quality:empty"))
        .when(~gate["keep"], F.concat(F.lit("quality:"), gate["reason"]))
    )
    # registered cache (caching.release_cached() frees it): the tagged
    # base feeds every survivor filter, three drop-list derivations,
    # AND the near-dedup clustering loop — without the cache each of
    # those branches re-runs the quality-gate expressions and the
    # upstream scan (the multi-consumer re-scan trap; at 100 TB this
    # is a disk-backed persist or an explicit staging table).
    dt = "_ct" if canonicalize else text_col
    if canonicalize:
        d = d.withColumn("_ct", canonical_text(F.col(text_col)))
    d = persisted(d.withColumn("_pre", pre))

    # URL-level dedup over pre-stage survivors: keep the bytewise-min
    # raw url per canonical url (deterministic pick).
    w = Window.partitionBy("canon_url").orderBy(F.asc(url_col))
    s0 = d.where(F.col("_pre").isNull())
    url_drop = (
        s0.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select("doc_id")
        .withColumn("_url_dup", F.lit(True))
    )
    d = d.join(url_drop, "doc_id", "left")

    # exact text dedup over survivors: keep min doc_id per md5 group.
    s1 = d.where(F.col("_pre").isNull() & F.col("_url_dup").isNull())
    groups = exact_dup_groups(s1, text_col=dt, id_col="doc_id")
    exact_drop = (
        s1.select(F.md5(F.col(dt)).alias("fingerprint"), "doc_id")
        .join(groups.where(F.col("n_docs") > 1)
              .select("fingerprint", "keeper"), "fingerprint")
        .where(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
        .withColumn("_exact_dup", F.lit(True))
    )
    d = d.join(exact_drop, "doc_id", "left")

    if near_dedup:
        s2 = d.where(
            F.col("_pre").isNull()
            & F.col("_url_dup").isNull()
            & F.col("_exact_dup").isNull()
        )
        pairs = minhash_lsh_candidates(s2, text_col=dt,
                                       id_col="doc_id")
        labels = dedup_clusters(pairs)
        near_drop = (
            labels.where(F.col("cluster_id") != F.col("doc_id"))
            .select("doc_id")
            .withColumn("_near_dup", F.lit(True))
        )
        d = d.join(near_drop, "doc_id", "left")
    else:
        d = d.withColumn("_near_dup", F.lit(None).cast("boolean"))

    fate = F.coalesce(
        F.col("_pre"),
        F.when(F.col("_url_dup"), F.lit("url_dup")),
        F.when(F.col("_exact_dup"), F.lit("exact_dup")),
        F.when(F.col("_near_dup"), F.lit("near_dup")),
        F.lit("kept"),
    )
    out = d.withColumn("fate", fate).drop(
        "_pre", "_url_dup", "_exact_dup", "_near_dup", "_ct"
    )
    if sample_rate is not None:
        # sampling is part of the fate story too: kept docs losing the
        # deterministic hash draw are tagged, not silently absent.
        thr = keep_threshold(sample_rate)
        out = out.withColumn(
            "fate",
            F.when(
                (F.col("fate") == "kept")
                & (hash_draw(F.col("canon_url"), salt) >= thr),
                F.lit("sampled_out"),
            ).otherwise(F.col("fate")),
        )
    if redact_pii:
        out = out.withColumn(
            text_col,
            F.when(F.col("fate") == "kept",
                   pii_redact(F.col(text_col))).otherwise(F.col(text_col)),
        )
    return out


def curate_documents_incremental(
    new_docs: DataFrame,
    history: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    error_col: Optional[str] = "error",
    id_col: Optional[str] = None,
    near_dedup: bool = True,
    history_band_index: Optional[DataFrame] = None,
    canonicalize: bool = False,
) -> DataFrame:
    """Curate a NEW crawl increment against an EXISTING corpus — the
    daily workflow at 10^12 rows, where re-curating the whole corpus
    per increment is not an option. Same tagged-frame contract as
    :func:`curate_documents`, with three additional fates checked
    BEFORE their within-batch counterparts (the history doc is always
    the keeper — a new doc never evicts a corpus doc):

    error → quality:* → ``url_dup_hist`` → url_dup →
    ``exact_dup_hist`` → exact_dup → ``near_dup_hist`` → near_dup →
    kept.

    ``history`` carries the existing corpus's ``url_col``/``text_col``
    (the curated table). Every history probe is a narrow-key semi-
    join: canonical-url strings, 16-byte text fingerprints, LSH band
    keys — history TEXTS are scanned once (three map-side key
    derivations) and never shuffle. ``history_band_index`` accepts the
    materialized (doc_id, band_key) relation from
    jobs/dedup_index.py, skipping the history signature recompute —
    how a deployment amortizes the per-shingle hash work across
    increments (the canon-url and fingerprint key sets are cheap
    single-column scans; materialize them the same way if even that
    matters).

    ``near_dup_hist`` semantics: a new doc sharing >= 1 LSH band with
    any history doc, evaluated over the UNION of both sides' band
    tables with the same ``MAX_BUCKET`` degenerate-bucket cap as the
    in-batch path (a boilerplate band key shared by >MAX_BUCKET docs
    is dropped, not joined — observable, never quadratic).

    ``canonicalize=True`` hashes :func:`canonical_text` on BOTH sides
    of every text-dedup probe (in-batch and vs history).  A supplied
    ``history_band_index`` must then have been materialized over the
    same canonical form — the caller owns that consistency, exactly as
    with any persisted index vs its query-time key derivation.
    """
    from ..operators.dedup import MAX_BUCKET, band_table

    d = new_docs.withColumn("canon_url", ur.canonical_url(F.col(url_col)))
    if id_col is None:
        d = d.withColumn("doc_id", F.md5(F.col(url_col)))
    elif id_col != "doc_id":
        d = d.withColumn("doc_id", F.col(id_col))

    err = (
        F.col(error_col).isNotNull() if error_col in new_docs.columns
        else F.lit(False)
    )
    gate = quality_gate(F.col(text_col))
    pre = (
        F.when(err, F.lit("error"))
        .when(F.trim(F.col(text_col)) == "", F.lit("quality:empty"))
        .when(~gate["keep"], F.concat(F.lit("quality:"), gate["reason"]))
    )
    dt = "_ct" if canonicalize else text_col
    if canonicalize:
        d = d.withColumn("_ct", canonical_text(F.col(text_col)))
    d = persisted(d.withColumn("_pre", pre))

    # URL vs history: canonical url already in the corpus. Semi-join
    # on the canon string; at typical increment-vs-corpus ratios the
    # increment side is the small one and AQE broadcasts it.
    hcanon = history.select(
        ur.canonical_url(F.col(url_col)).alias("canon_url")
    ).distinct()
    s0 = d.where(F.col("_pre").isNull())
    uh_drop = (
        s0.join(hcanon, "canon_url", "left_semi")
        .select("doc_id").withColumn("_url_hist", F.lit(True))
    )
    d = d.join(uh_drop, "doc_id", "left")

    # URL within-batch, over history-stage survivors
    w = Window.partitionBy("canon_url").orderBy(F.asc(url_col))
    s1 = d.where(F.col("_pre").isNull() & F.col("_url_hist").isNull())
    url_drop = (
        s1.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select("doc_id").withColumn("_url_dup", F.lit(True))
    )
    d = d.join(url_drop, "doc_id", "left")

    # exact text vs history: 16-byte fingerprint semi-join
    _htext = (
        canonical_text(F.col(text_col)) if canonicalize
        else F.col(text_col)
    )
    hfp = history.select(F.md5(_htext).alias("_fp")).distinct()
    s2 = d.where(
        F.col("_pre").isNull()
        & F.col("_url_hist").isNull()
        & F.col("_url_dup").isNull()
    )
    eh_drop = (
        s2.select(F.md5(F.col(dt)).alias("_fp"), "doc_id")
        .join(hfp, "_fp", "left_semi")
        .select("doc_id").withColumn("_exact_hist", F.lit(True))
    )
    d = d.join(eh_drop, "doc_id", "left")

    # exact within-batch
    s3 = d.where(
        F.col("_pre").isNull()
        & F.col("_url_hist").isNull()
        & F.col("_url_dup").isNull()
        & F.col("_exact_hist").isNull()
    )
    groups = exact_dup_groups(s3, text_col=dt, id_col="doc_id")
    exact_drop = (
        s3.select(F.md5(F.col(dt)).alias("fingerprint"), "doc_id")
        .join(groups.where(F.col("n_docs") > 1)
              .select("fingerprint", "keeper"), "fingerprint")
        .where(F.col("doc_id") != F.col("keeper"))
        .select("doc_id").withColumn("_exact_dup", F.lit(True))
    )
    d = d.join(exact_drop, "doc_id", "left")

    if near_dedup:
        s4 = d.where(
            F.col("_pre").isNull()
            & F.col("_url_hist").isNull()
            & F.col("_url_dup").isNull()
            & F.col("_exact_hist").isNull()
            & F.col("_exact_dup").isNull()
        )
        # near vs history: union band tables tagged by side; a capped
        # bucket containing >= 1 history member drops its new members
        hbands = (
            history_band_index.select(
                F.col(history_band_index.columns[0]).alias("doc_id"),
                "band_key",
            )
            if history_band_index is not None
            else band_table(
                history.select(
                    F.md5(F.col(url_col)).alias("doc_id"),
                    _htext.alias(dt),
                ),
                dt, "doc_id",
            )
        )
        nbands = persisted(band_table(s4, dt, "doc_id"))
        both = nbands.select(
            "doc_id", "band_key", F.lit(False).alias("_hist")
        ).unionByName(
            hbands.select(
                "doc_id", "band_key", F.lit(True).alias("_hist")
            )
        )
        hist_buckets = (
            both.groupBy("band_key")
            .agg(
                F.count("*").alias("_n"),
                F.max(F.col("_hist").cast("int")).alias("_has_hist"),
            )
            .where((F.col("_n") <= MAX_BUCKET) & (F.col("_has_hist") == 1))
            .select("band_key")
        )
        nh_drop = (
            nbands.join(hist_buckets, "band_key", "left_semi")
            .select("doc_id").distinct()
            .withColumn("_near_hist", F.lit(True))
        )
        d = d.join(nh_drop, "doc_id", "left")

        # near within-batch, over history-stage survivors
        s5 = d.where(
            F.col("_pre").isNull()
            & F.col("_url_hist").isNull()
            & F.col("_url_dup").isNull()
            & F.col("_exact_hist").isNull()
            & F.col("_exact_dup").isNull()
            & F.col("_near_hist").isNull()
        )
        pairs = minhash_lsh_candidates(s5, text_col=dt,
                                       id_col="doc_id")
        labels = dedup_clusters(pairs)
        near_drop = (
            labels.where(F.col("cluster_id") != F.col("doc_id"))
            .select("doc_id").withColumn("_near_dup", F.lit(True))
        )
        d = d.join(near_drop, "doc_id", "left")
    else:
        d = (
            d.withColumn("_near_hist", F.lit(None).cast("boolean"))
            .withColumn("_near_dup", F.lit(None).cast("boolean"))
        )

    fate = F.coalesce(
        F.col("_pre"),
        F.when(F.col("_url_hist"), F.lit("url_dup_hist")),
        F.when(F.col("_url_dup"), F.lit("url_dup")),
        F.when(F.col("_exact_hist"), F.lit("exact_dup_hist")),
        F.when(F.col("_exact_dup"), F.lit("exact_dup")),
        F.when(F.col("_near_hist"), F.lit("near_dup_hist")),
        F.when(F.col("_near_dup"), F.lit("near_dup")),
        F.lit("kept"),
    )
    return d.withColumn("fate", fate).drop(
        "_pre", "_url_hist", "_url_dup", "_exact_hist", "_exact_dup",
        "_near_hist", "_near_dup", "_ct",
    )


def run_curate_job(
    spark: SparkSession,
    docs_ref: str,
    out_dir: str,
    run_id: str = "run1",
    history_ref: Optional[str] = None,
    **curate_kwargs,
) -> dict:
    """Curate an extracted documents table into a training corpus.

    Table refs as in `run_extract_job` (paths → parquet; catalog
    identifiers → managed/Iceberg). Writes ``curated`` (kept rows,
    audit columns dropped) and appends one metrics row per fate to
    ``curation_metrics``. The tagged frame is persisted so the
    curated write and the metrics aggregate share one computation.

    ``history_ref`` switches to the INCREMENTAL path
    (:func:`curate_documents_incremental`): `docs_ref` is the new
    crawl increment, `history_ref` the existing curated corpus —
    typically the previous run's ``curated`` output, making daily
    appends a fixed-cost loop: curate increment vs corpus, append
    kept rows to the corpus.
    """
    import os

    from pyspark import StorageLevel

    from ..sources.catalog import is_path_ref

    t0 = time.time()
    docs = read_table(spark, docs_ref)
    if history_ref is not None:
        tagged = curate_documents_incremental(
            docs, read_table(spark, history_ref), **curate_kwargs
        )
        # localCheckpoint, NOT persist: in the daily loop history_ref
        # IS this job's own curated output, so the tagged plan reads
        # the very table the kept-append below grows — a lazily-cached
        # plan can recompute after the append and re-fate the freshly
        # appended rows as history dups (measured in the streaming
        # twin, streaming/curate_stream.py). Materializing eagerly
        # severs the plan from the table before it changes.
        tagged = tagged.localCheckpoint()
    else:
        tagged = curate_documents(docs, **curate_kwargs)
        tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
    if is_path_ref(out_dir):
        curated_ref = os.path.join(out_dir, "curated.parquet")
        metrics_ref = os.path.join(out_dir, "curation_metrics.parquet")
    else:
        curated_ref = f"{out_dir}.curated"
        metrics_ref = f"{out_dir}.curation_metrics"

    kept = tagged.where(F.col("fate") == "kept").drop("fate")
    append_table(kept, curated_ref)

    fates = {
        r["fate"]: r["n"]
        for r in tagged.groupBy("fate").agg(F.count("*").alias("n")).collect()
    }  # bounded: one row per fate kind
    wall = time.time() - t0
    metrics = spark.createDataFrame(
        [(run_id, k, int(v), float(wall)) for k, v in sorted(fates.items())],
        "run_id string, fate string, n_docs long, run_wall_sec double",
    )
    append_table(metrics, metrics_ref)
    tagged.unpersist()
    release_cached()  # LSH band-table cache
    return {"fates": fates, "wall_sec": wall}
