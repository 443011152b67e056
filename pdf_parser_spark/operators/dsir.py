"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169): score every raw document by how much
it resembles a small high-quality TARGET corpus, using hashed n-gram
bucket distributions, then resample the raw corpus with probability
proportional to the importance weight.

The estimator is the paper's: word unigrams+bigrams hashed into B
buckets; bucket unigram models p (target) and q (raw), each Laplace
+1 smoothed; per-document log importance weight

    log w(doc) = sum over doc grams of  [ ln p(bucket) - ln q(bucket) ]

and the sample is the Gumbel-top-n under those log weights (the
Gumbel-max trick makes "sample n without replacement proportional to
w" a deterministic ORDER BY once the uniform draw is a hash of the
doc id — no RNG state, reproducible at any cluster size, identical
in the DuckDB twin).

Scale design (100 TB):
- ONE tokenize/explode pass over the raw corpus (the per-doc bucket
  counts are persisted and REUSED to build q by a second, narrow
  aggregation — buckets are bigints, texts never shuffle again), and
  one pass over the target, which is small by construction.
- p and q are at most B rows each (B ~ 10^4): broadcast to the
  per-doc join; the weight is a partial-combine groupBy on doc_id.
- The top-n is orderBy+limit → TakeOrderedAndProject (per-partition
  heaps, no global sort).

Cross-engine determinism: bucket ids come from the md5 prefix (the
repo's shared draw idiom, operators/sampling.py); ln last-ulp noise
is absorbed by rounding scores to 6 dp before ORDER BY with doc_id
tie-breaks (the repo's standard double discipline — same exposure as
bm25_topk's summed scores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import persisted
from .sampling import HASH_SPACE, hash_draw, hash_draw_sql
from .terms import TERM_REGEX, TERMS_SQL

#: default hashed-feature space (the paper uses 10^4; small corpora
#: work fine coarser)
N_BUCKETS = 1024


# ------------------------------------------------------------ grams


def _grams(col: Column) -> Column:
    """Unigrams + bigrams over the shared TERM_REGEX token stream."""
    toks = F.regexp_extract_all(F.lower(col), F.lit(TERM_REGEX), 0)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _grams_over_sql(toks: str) -> str:
    """Gram-list expression over an already-materialized token-array
    column `toks` (inlining the tokenizer would re-run it per bigram
    position — O(n^2) regex work in DuckDB)."""
    return (
        f"list_concat({toks}, "
        f"list_transform(generate_series(1, len({toks}) - 1), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1]))"
    )


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-prefix bucket id in [0, n_buckets) — hash_draw mod B."""
    return hash_draw(gram) % F.lit(n_buckets)


def _bucket_sql(gram: str, n_buckets: int) -> str:
    return f"({hash_draw_sql(gram)}) % {n_buckets}"


def doc_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, bucket, cnt) hashed-gram counts per document — the one
    explode pass over the corpus; everything downstream is narrow."""
    return (
        df.select(
            F.col(id_col),
            F.explode(_grams(F.col(text_col))).alias("gram"),
        )
        .select(F.col(id_col), _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


# ----------------------------------------------------------- weights


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-document log importance weight of every `raw` document
    against the `target` bucket distribution → (id, log_weight).

    log_weight = sum_b cnt_b * [ ln(p_b) - ln(q_b) ] with Laplace
    smoothing p_b = (tc_b + 1)/(T + B), q_b = (rc_b + 1)/(R + B);
    documents with no grams get 0.0 (the empty product). Rounded to
    6 dp.
    """
    # persisted: q derives from the same per-doc counts the weight
    # join reads — un-persisted, the corpus tokenize-explode runs
    # twice (a whole extra corpus scan at 100 TB).
    per_doc = persisted(doc_bucket_counts(raw, text_col, id_col, n_buckets))
    # p and q each feed TWO consumers (the totals row and the weight
    # join); persisted (<= B rows each) so the target tokenize pass
    # and the per_doc re-aggregation run once, not twice.
    q = persisted(
        per_doc.groupBy("bucket").agg(F.sum("cnt").alias("qc"))
    )  # <= B rows
    p = persisted(
        doc_bucket_counts(target, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("pc"))
    )  # <= B rows
    totals = (
        q.agg(F.coalesce(F.sum("qc"), F.lit(0)).alias("qt"))
        .crossJoin(p.agg(F.coalesce(F.sum("pc"), F.lit(0)).alias("pt")))
    )  # 1 row
    b = float(n_buckets)
    scored = (
        per_doc.join(F.broadcast(p), "bucket", "left")
        .join(F.broadcast(q), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (
                F.col("cnt").cast("double")
                * (
                    F.log(F.coalesce(F.col("pc"), F.lit(0)).cast("double") + 1.0)
                    - F.log(F.col("pt").cast("double") + b)
                    - F.log(F.coalesce(F.col("qc"), F.lit(0)).cast("double") + 1.0)
                    + F.log(F.col("qt").cast("double") + b)
                )
            ).alias("contrib"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("log_weight"))
    )
    # gram-less documents never reach per_doc: restore them at 0.0
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_topn(
    raw: DataFrame,
    target: DataFrame,
    n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """Sample `n` raw documents without replacement with probability
    proportional to the importance weight — the Gumbel-top-n:
    key = log_weight + Gumbel(u), u a deterministic md5 uniform of
    (id, salt). Returns (id, log_weight, gumbel_key), highest keys
    first semantics (the caller sees the selected set; ordering is
    re-established by the rounded key + id tie-break)."""
    w = dsir_weights(raw, target, text_col, id_col, n_buckets)
    u = (hash_draw(F.col(id_col), salt).cast("double") + 0.5) / float(HASH_SPACE)
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    return (
        w.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(n)
    )


# ------------------------------------------------------- DuckDB twins


def _counts_cte(table: str, text_col: str, id_col: str,
                n_buckets: int, name: str) -> str:
    toks = TERMS_SQL.format(col=text_col)
    grams = _grams_over_sql("toks")
    return f"""{name} AS MATERIALIZED (
  SELECT {id_col}, {_bucket_sql('gram', n_buckets)} AS bucket,
         count(*) AS cnt
  FROM (SELECT {id_col}, unnest({grams}) AS gram
        FROM (SELECT {id_col}, {toks} AS toks FROM {table}))
  GROUP BY {id_col}, bucket
)"""


def dsir_weights_sql(
    raw_table: str,
    target_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`dsir_weights` (same smoothing, same
    rounding)."""
    b = float(n_buckets)
    return f"""
WITH {_counts_cte(raw_table, text_col, id_col, n_buckets, 'per_doc')},
{_counts_cte(target_table, text_col, id_col, n_buckets, 'tgt_doc')},
q AS (SELECT bucket, sum(cnt) AS qc FROM per_doc GROUP BY bucket),
p AS (SELECT bucket, sum(cnt) AS pc FROM tgt_doc GROUP BY bucket),
totals AS (
  SELECT (SELECT coalesce(sum(qc), 0) FROM q) AS qt,
         (SELECT coalesce(sum(pc), 0) FROM p) AS pt
),
scored AS (
  SELECT d.{id_col},
         round(sum(
           CAST(d.cnt AS DOUBLE) * (
             ln(CAST(coalesce(p.pc, 0) AS DOUBLE) + 1.0)
             - ln(CAST(t.pt AS DOUBLE) + {b!r})
             - ln(CAST(coalesce(q.qc, 0) AS DOUBLE) + 1.0)
             + ln(CAST(t.qt AS DOUBLE) + {b!r})
           )
         ), 6) AS log_weight
  FROM per_doc d
  LEFT JOIN p USING (bucket)
  LEFT JOIN q USING (bucket), totals t
  GROUP BY d.{id_col}
)
SELECT r.{id_col}, coalesce(s.log_weight, 0.0) AS log_weight
FROM {raw_table} r LEFT JOIN scored s USING ({id_col})
"""


def dsir_topn_sql(
    raw_table: str,
    target_table: str,
    n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    salt: str = "dsir",
) -> str:
    """DuckDB twin of :func:`dsir_topn`."""
    u = (
        f"(CAST({hash_draw_sql(id_col, salt)} AS DOUBLE) + 0.5) "
        f"/ {float(HASH_SPACE)!r}"
    )
    return f"""
WITH w AS ({dsir_weights_sql(raw_table, target_table, text_col,
                             id_col, n_buckets)})
SELECT {id_col}, log_weight,
       round(log_weight - ln(-ln({u})), 6) AS gumbel_key
FROM w
ORDER BY gumbel_key DESC, {id_col} ASC LIMIT {n}
"""
