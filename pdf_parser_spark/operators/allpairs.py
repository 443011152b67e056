"""Exact all-pairs sparse cosine similarity with prefix filtering
(Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
WWW 2007) — the tenth dedup/overlap family: EXACT tf-idf cosine
pairs over the corpus, where minhash/simhash/winnowing are
probabilistic and SemDeDup needs an embedding column.

The trick that makes "all pairs ≥ t" tractable is the one-sided
prefix bound: order each document's features by descending weight
and call the minimal leading set whose TAIL L2-norm drops below t
the document's *prefix*. If every feature two documents share lies
in one document's tail, then

    sim(x, y) = Σ_shared x_f · y_f  ≤  ||x_tail|| · ||y||  <  t,

so every qualifying pair shares at least one feature that is in one
side's prefix — candidates are (prefix ⋈ full) postings pairs, a
tiny subset of the full (term ⋈ term) self-join. The exact cosine
then verifies candidates only. Candidates are a provable superset
under EACH engine's own float arithmetic, and the verify is exact,
so the result equals the naive threshold join — which is exactly
the DuckDB twin (:func:`allpairs_cosine_sql`): a cross-algorithm
oracle, not a mirrored one.

Weights: w = tf · idf with the repo's terms.py discipline — idf =
round(ln((N+1)/(df+1)) + 1, 6) so the rounded idf is bit-identical
cross-engine — then L2-normalized per document. Per-doc norm and
per-pair dot sums are float sums whose accumulation order differs
between engines (~1e-15 relative); the output sim is rounded to
6 dp and the threshold compare rides the raw double — a pair would
have to land within ~1e-12 of t to flip, which the oracle fixtures
cannot do (docstring discipline shared with mix_thresholds).

Scale design (100 TB):
- The Zipf head is dropped from the FEATURE SPACE before anything
  joins (``max_df_frac``, default 0.5 — stop words never cross the
  wire), the hapax tail via ``min_df`` (a df-1 term can produce no
  pair; dropping it changes no sim that matters and removes ~40% of
  the dictionary).
- Prefix selection is ONE window over (doc, term) rows — narrow
  (id, term, w) triples, no text.
- The candidate join is prefix-postings ⋈ full-postings on term:
  with tails of L2 mass < t excluded, a near-dup-threshold t (0.8+)
  indexes only a few features per doc. The exact verify aggregates
  w·w products per candidate pair — partial-combine, narrow keys.
- Everything is native: no UDF, no driver loop, two shuffles
  (postings build, pair aggregate) plus the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persisted
from .terms import TERMS_SQL, _terms


def tfidf_unit_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df_frac: float = 0.5,
    n_docs: int = None,
) -> DataFrame:
    """(doc_id, term, w): L2-unit tf-idf vectors as postings rows.
    Terms outside the [min_df, floor(max_df_frac·N)] band are dropped
    from the feature space (both engines, identically)."""
    if n_docs is None:
        n_docs = df.count()
    cap = int(max_df_frac * n_docs)
    tf = (
        df.select(F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = (
        tf.groupBy("term").agg(F.count("*").alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= cap))
    )
    idf = F.round(
        F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0),
        6,
    )
    w = tf.join(dfreq, "term").select(
        F.col(id_col), "term", (F.col("tf") * idf).alias("w")
    )
    norm = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w.join(norm, id_col).select(
        F.col(id_col), "term", (F.col("w") / F.col("nrm")).alias("w")
    )


def allpairs_cosine(
    df: DataFrame,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """(id1, id2, sim): every unordered pair with tf-idf cosine ≥
    threshold, sim rounded to 6 dp; id1 < id2. Exact — equal to the
    naive threshold join by the prefix-filter argument above."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # registered cache (caching.persisted): postings feed the prefix
    # window, the candidate join (twice) and the verify joins (twice);
    # released by the caller's release_cached() after the action
    posts = persisted(
        tfidf_unit_postings(df, text_col, id_col, min_df, max_df_frac)
    )
    # prefix: order features by (w DESC, term) per doc; a row is
    # indexed iff the suffix L2 mass from it onward is still >= t^2
    suffix = F.sum(F.col("w") * F.col("w")).over(
        Window.partitionBy(id_col)
        .orderBy(F.col("w").desc(), F.col("term"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prefix = (
        posts.withColumn("_sfx", suffix)
        .where(F.col("_sfx") >= threshold * threshold)
        .select(F.col(id_col).alias("_pid"), "term")
    )
    full = posts.select(F.col(id_col).alias("_aid"), "term")
    cand = (
        prefix.join(full, "term")
        .where(F.col("_pid") != F.col("_aid"))
        .select(
            F.least("_pid", "_aid").alias("id1"),
            F.greatest("_pid", "_aid").alias("id2"),
        )
        .distinct()
    )
    p1 = posts.select(F.col(id_col).alias("id1"), "term", F.col("w").alias("w1"))
    p2 = posts.select(F.col(id_col).alias("id2"), "term", F.col("w").alias("w2"))
    out = (
        cand.join(p1, "id1")
        .join(p2, ["id2", "term"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("_sim"))
        .where(F.col("_sim") >= threshold)
        .select("id1", "id2", F.round("_sim", 6).alias("sim"))
    )
    return out


def _unit_postings_sql(
    table: str, text_col: str, id_col: str, min_df: int,
    max_df_frac: float,
) -> str:
    terms = TERMS_SQL.format(col=text_col)
    return f"""
tf AS MATERIALIZED (
  SELECT {id_col} AS id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT {id_col}, unnest({terms}) AS term FROM {table})
  GROUP BY 1, 2
),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}),
dfreq AS (
  SELECT term, round(ln(((SELECT n FROM nd) + 1.0) / (count(*) + 1.0))
                     + 1.0, 6) AS idf
  FROM tf GROUP BY term
  HAVING count(*) >= {min_df}
     AND count(*) <= CAST(floor({max_df_frac} * (SELECT n FROM nd))
                          AS BIGINT)
),
w AS MATERIALIZED (
  SELECT tf.id, tf.term, tf.tf * dfreq.idf AS w
  FROM tf JOIN dfreq USING (term)
),
nrm AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
up AS MATERIALIZED (
  SELECT w.id, w.term, w.w / nrm.nrm AS w FROM w JOIN nrm USING (id)
)"""


def allpairs_cosine_sql(
    table: str,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> str:
    """DuckDB twin: the NAIVE threshold self-join over the same unit
    postings — the plan the prefix-filtered operator is provably
    equal to."""
    t = f"CAST({threshold!r} AS DOUBLE)"
    ups = _unit_postings_sql(table, text_col, id_col, min_df, max_df_frac)
    return f"""
WITH {ups.lstrip()}
SELECT a.id AS id1, b.id AS id2, round(sum(a.w * b.w), 6) AS sim
FROM up a JOIN up b ON a.term = b.term AND a.id < b.id
GROUP BY 1, 2
HAVING sum(a.w * b.w) >= {t}"""
