"""Corpus-level term statistics: document frequency and TF-IDF.

The per-document text stats (functions/textstats.py) need no global
state; this module adds the corpus-statistics tier — the global term
dictionary (document frequency) and per-document TF-IDF top terms —
used for keyword extraction, topic sketches, and as a cheap relevance
feature in training-data curation.

Scale design (100 TB):
- Terms are Zipf-distributed, so the raw term key space is massively
  skewed. BOTH hot directions are defused: the document-frequency
  aggregation is a partial-combine groupBy (the `the` key arrives at
  its reducer pre-counted per partition), and the tf↔df JOIN only
  happens AFTER the `max_df_frac` cap drops the Zipf head — stop
  words never cross the join.
- `min_df` drops the hapax tail (typically >40% of the dictionary),
  bounding the df table.
- The per-doc top-k is a window over (doc, term) pairs that survive
  the df filter — bounded per doc, partitioned on doc_id, with
  WindowGroupLimit pre-pruning (row_number <= k).
- All tokenization/aggregation is native (codegen); no Python.

Cross-engine determinism: IDF uses natural log, whose last-ulp can
differ between JVM and C libm, so scores are ROUNDED to 6 dp before
both the ORDER BY and the output (the repo's standard double
discipline), and ties break on the term string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tokens = lowercased letter runs of length >= 2 (no digits/punct).
TERM_REGEX = r"[a-z]{2,}"


def _terms(col):
    return F.regexp_extract_all(F.lower(col), F.lit(TERM_REGEX), 0)


TERMS_SQL = "regexp_extract_all(lower({col}), '[a-z]{{2,}}')"


def term_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_df: int = 2, max_df_frac: float = 0.5, n_docs: int = None,
) -> DataFrame:
    """Document-frequency table: (term, df) for terms appearing in
    [min_df, max_df_frac * N] documents. Distinct-per-doc is taken
    BEFORE the term groupBy (array_distinct map-side, so a term
    counts once per doc and the explode carries no within-doc dups).
    """
    if n_docs is None:
        n_docs = df.count()
    # Python int() TRUNCATES; the DuckDB twin must floor() too — a
    # bare CAST rounds-to-nearest and keeps boundary terms Spark drops
    # whenever max_df_frac * N is non-integral (odd N at 0.5).
    cap = int(max_df_frac * n_docs)
    per_doc = df.select(
        F.explode(F.array_distinct(_terms(F.col(text_col)))).alias("term")
    )
    return (
        per_doc.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= cap))
    )


def tfidf_topk(
    df: DataFrame, k: int = 5, text_col: str = "text",
    id_col: str = "doc_id", min_df: int = 2, max_df_frac: float = 0.5,
) -> DataFrame:
    """Per-document top-k TF-IDF terms →
    (doc_id, term, tf, score, rank).

    score = round(tf * (ln((N+1)/(df+1)) + 1), 6) — smoothed IDF;
    ranking orders by the ROUNDED score then term (deterministic and
    engine-portable). Documents whose every term fell outside the df
    band produce no rows.
    """
    n_docs = df.count()
    dft = term_df(df, text_col, id_col, min_df, max_df_frac, n_docs)
    tf = (
        df.select(
            F.col(id_col),
            F.explode(_terms(F.col(text_col))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = tf.join(dft, "term").select(
        id_col, "term", "tf",
        F.round(
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bm25_topk(
    df: DataFrame, query_terms, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a bag of query terms
    → (doc_id, score). Robertson plus-one IDF
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; score rounded to 6 dp and
    ties broken on doc_id, so the cut set is deterministic and
    engine-portable.

    Plan shape at 100 TB: the query-term filter runs map-side inside
    the explode (non-matching terms never shuffle), so the (doc,
    term) aggregate is bounded by |query| × matching docs; df and
    the global (N, avgdl) scalars are 1-row/tiny aggregates broadcast
    back in-plan; the final top-k is orderBy+limit →
    TakeOrderedAndProject (per-partition heap, no global sort).
    """
    q = sorted({t.lower() for t in query_terms})
    toks = df.select(
        F.col(id_col), _terms(F.col(text_col)).alias("ts")
    ).select(id_col, F.size("ts").alias("dl"), "ts")
    stats = toks.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )  # 1 row
    from ..caching import persisted

    # persisted: dft derives from tf AND the scored join reads tf —
    # un-persisted, the corpus tokenize-explode subtree runs twice
    # (the second pass map-side-filtered to query terms, cheap but a
    # whole extra corpus scan at 100 TB). tf is tiny: bounded by
    # |query| × matching docs.
    tf = persisted(
        toks.select(id_col, "dl", F.explode("ts").alias("term"))
        .where(F.col("term").isin(q))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))  # <= |query| rows
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def bm25_topk_sql(
    table: str, query_terms, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk`."""
    q = sorted({t.lower() for t in query_terms})
    qlist = ", ".join(f"'{t}'" for t in q)
    terms = TERMS_SQL.format(col=text_col)
    k1d = f"CAST({k1!r} AS DOUBLE)"
    bd = f"CAST({b!r} AS DOUBLE)"
    return f"""
WITH toks AS MATERIALIZED (
  SELECT {id_col}, {terms} AS ts FROM {table}
),
lens AS (SELECT {id_col}, len(ts) AS dl, ts FROM toks),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM lens
),
tf AS (
  SELECT {id_col}, dl, term, count(*) AS tf
  FROM (SELECT {id_col}, dl, unnest(ts) AS term FROM lens)
  WHERE term IN ({qlist})
  GROUP BY {id_col}, dl, term
),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.{id_col},
         round(sum(
           ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({k1d} + 1.0))
           / (t.tf + {k1d} * (1.0 - {bd} + {bd} * t.dl / s.avgdl))
         ), 6) AS score
  FROM tf t JOIN dft d USING (term), stats s
  GROUP BY t.{id_col}
)
SELECT {id_col}, score FROM scored
ORDER BY score DESC, {id_col} ASC LIMIT {k}
"""


def term_df_sql(
    table: str, text_col: str = "text", min_df: int = 2,
    max_df_frac: float = 0.5,
) -> str:
    """DuckDB twin of :func:`term_df` (same spec, DuckDB dialect)."""
    terms = TERMS_SQL.format(col=text_col)
    return f"""
SELECT term, count(*) AS df
FROM (
  SELECT unnest(list_distinct({terms})) AS term FROM {table}
)
GROUP BY term
HAVING count(*) >= {min_df}
   AND count(*) <= CAST(floor({max_df_frac} * (SELECT count(*) FROM {table})) AS BIGINT)
"""


def tfidf_topk_sql(
    table: str, k: int = 5, text_col: str = "text",
    id_col: str = "doc_id", min_df: int = 2, max_df_frac: float = 0.5,
) -> str:
    """DuckDB twin of :func:`tfidf_topk`."""
    terms = TERMS_SQL.format(col=text_col)
    return f"""
WITH dft AS ({term_df_sql(table, text_col, min_df, max_df_frac)}),
tf AS (
  SELECT {id_col}, term, count(*) AS tf
  FROM (SELECT {id_col}, unnest({terms}) AS term FROM {table})
  GROUP BY {id_col}, term
),
scored AS (
  SELECT t.{id_col}, t.term, t.tf,
         round(t.tf * (ln(((SELECT count(*) FROM {table}) + 1.0)
                          / (d.df + 1.0)) + 1.0), 6) AS score
  FROM tf t JOIN dft d USING (term)
)
SELECT * FROM (
  SELECT {id_col}, term, tf, score,
         CAST(row_number() OVER (
           PARTITION BY {id_col} ORDER BY score DESC, term ASC
         ) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# --------------------------------------------------- reciprocal rank fusion

def rrf_fuse(rankings, id_col: str = "doc_id", k_const: int = 60,
             topk: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    of N ranked lists → (id, rrf_score, n_lists): score =
    Σ 1/(k_const + rank) over the lists that contain the id, rounded
    to 6 dp with an id tie-break — the standard score-free way to
    combine lexical (BM25) and semantic (ANN) retrieval.

    Each input frame must carry ``id_col`` and a 1-based ``rank``
    column.  The inputs are already top-k cuts from their rankers, so
    the fusion itself is a bounded union + one tiny aggregate — at
    100 TB all the scale lives in the rankers (which prune map-side);
    this stage never sees more than Σ k_i rows.
    """
    tagged = None
    for r in rankings:
        part = r.select(
            F.col(id_col), F.col("rank").cast("long").alias("rank")
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    if tagged is None:
        raise ValueError("rankings must be non-empty")
    fused = tagged.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(int(k_const)) + F.col("rank"))), 6
        ).alias("rrf_score"),
        F.count("*").alias("n_lists"),
    )
    return fused.orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    ).limit(int(topk))


def rrf_fuse_sql(ranking_sqls, id_col: str = "doc_id", k_const: int = 60,
                 topk: int = 10) -> str:
    """DuckDB twin of :func:`rrf_fuse`; each SQL must produce
    (``id_col``, rank)."""
    if not ranking_sqls:
        raise ValueError("ranking_sqls must be non-empty")
    union = " UNION ALL ".join(
        f"SELECT {id_col}, rank FROM ({s})" for s in ranking_sqls
    )
    return f"""
SELECT {id_col},
       round(sum(CAST(1.0 AS DOUBLE) / ({int(k_const)} + rank)), 6)
         AS rrf_score,
       count(*) AS n_lists
FROM ({union})
GROUP BY {id_col}
ORDER BY rrf_score DESC, {id_col} ASC
LIMIT {int(topk)}
"""
