"""CCNet-style language-model perplexity scoring (Wenzek et al.,
LREC 2020, arXiv:1911.00359): score every document by the perplexity
of a small n-gram language model trained on a high-quality TARGET
corpus, then split each language into head/middle/tail terciles —
the selection signal CCNet feeds to its quality buckets (the paper
uses a 5-gram KenLM over Wikipedia; the sandbox stand-in is a hashed
bigram model with add-one smoothing, which keeps the estimator fully
relational and cross-engine exact).

Model: tokens hash into B buckets (the shared md5 draw,
operators/sampling.py); a bigram (prev, cur) becomes ONE bigint
``pair = prev * B + cur`` so the whole feature pipeline is integer
arithmetic until the final log.  Trained on the target corpus:

    P(cur | prev) = (c(prev, cur) + 1) / (c(prev, *) + B)

Per document, perplexity = exp( -(1/T) * sum_i ln P(pair_i) ) over
its T bigram positions; documents with fewer than two tokens carry a
NULL perplexity (no model evidence either way — CCNet drops them).

Scale design (100 TB):
- ONE tokenize/explode pass over the raw corpus producing
  (doc_id, pair, cnt) bigints — texts never shuffle.
- The model is two aggregates over the (small) target corpus:
  bigram counts (<= B^2 rows, sparse in practice) and context counts
  (<= B rows); both broadcast into the scoring join.  Pick B so the
  bigram table fits the broadcast budget (the default 4096 caps it
  at ~16.7M rows worst case; real text is far sparser) — beyond
  that the join degrades gracefully to a shuffle on bigint keys.
- The per-document reduction is a partial-combine groupBy on doc_id.
- Terciles are an ntile window per language over the (rounded)
  perplexity with doc_id tie-breaks — deterministic in both engines.

Reference scope note: the reference (PiyushPrasun/pdf_parser) has no
corpus-selection tier; this operator extends the pipeline the way
`README.md`'s training-data story requires (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persisted
from .sampling import hash_draw, hash_draw_sql
from .terms import TERM_REGEX, TERMS_SQL

#: default hashed-vocabulary size (bigram table worst case B^2)
N_BUCKETS = 4096


# ------------------------------------------------------------ pairs


def _pair_stream(col: Column, n_buckets: int) -> Column:
    """array<bigint> of ``prev_bucket * B + cur_bucket`` over the
    shared TERM_REGEX token stream (empty for < 2 tokens)."""
    toks = F.regexp_extract_all(F.lower(col), F.lit(TERM_REGEX), 0)
    # one-arg lambda only: a two-arg F.transform lambda receives the
    # array index as arg 2 (repo pitfall, CLAUDE.md)
    bkts = F.transform(toks, lambda t: hash_draw(t) % F.lit(n_buckets))
    return F.when(
        F.size(bkts) >= 2,
        F.zip_with(
            F.slice(bkts, 1, F.size(bkts) - 1),
            F.slice(bkts, 2, F.size(bkts) - 1),
            lambda a, b: a * F.lit(n_buckets) + b,
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _buckets_sql(col: str, n_buckets: int) -> str:
    """DuckDB bucket-array expression over the token stream."""
    toks = TERMS_SQL.format(col=col)
    bkt = f"({hash_draw_sql('t', '')}) % {n_buckets}"
    return f"list_transform({toks}, t -> {bkt})"


def doc_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, pair, cnt) hashed-bigram counts per document — the one
    explode pass over a corpus; downstream is all-bigint."""
    return (
        df.select(
            F.col(id_col),
            F.explode(_pair_stream(F.col(text_col), n_buckets)).alias("pair"),
        )
        .groupBy(id_col, "pair")
        .agg(F.count("*").alias("cnt"))
    )


# ------------------------------------------------------------ scoring


def lm_perplexity(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Perplexity of every `raw` document under the bigram bucket
    model trained on `target` → (id, ppl); NULL ppl for documents
    with fewer than two tokens.  ppl rounded to 6 dp (the repo's
    double discipline — same exposure as bm25_topk's summed scores).
    """
    # model: two aggregates over the target; persisted because bg
    # feeds both the context re-aggregation and the scoring join
    # (without the persist the target tokenize pass runs twice).
    bg = persisted(
        doc_pair_counts(target, text_col, id_col, n_buckets)
        .groupBy("pair")
        .agg(F.sum("cnt").alias("bc"))
    )
    ctx = (
        bg.groupBy(
            F.floor(F.col("pair") / F.lit(n_buckets))
            .cast("bigint")
            .alias("pb")
        )
        .agg(F.sum("bc").alias("cc"))
    )
    b = float(n_buckets)
    per_doc = doc_pair_counts(raw, text_col, id_col, n_buckets)
    scored = (
        per_doc.join(F.broadcast(bg), "pair", "left")
        .join(
            F.broadcast(ctx),
            F.floor(F.col("pair") / F.lit(n_buckets)).cast("bigint")
            == F.col("pb"),
            "left",
        )
        .select(
            F.col(id_col),
            F.col("cnt"),
            (
                F.col("cnt").cast("double")
                * (
                    F.log(F.coalesce(F.col("bc"), F.lit(0)).cast("double") + 1.0)
                    - F.log(F.coalesce(F.col("cc"), F.lit(0)).cast("double") + b)
                )
            ).alias("ll"),
        )
        .groupBy(id_col)
        .agg(
            F.round(
                F.exp(-F.sum("ll") / F.sum("cnt").cast("double")), 6
            ).alias("ppl")
        )
    )
    # token-poor documents never reach per_doc: restore with NULL ppl
    return raw.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col), F.col("ppl")
    )


#: ntile position → CCNet bucket label
_BUCKETS = {1: "head", 2: "middle", 3: "tail"}


def perplexity_buckets(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """CCNet head/middle/tail terciles per language by ascending
    perplexity (lower ppl = closer to the target = head) →
    (id, lang, ppl, bucket).  Documents with NULL ppl (< 2 tokens)
    are dropped, as in CCNet.  Ordering ties break on id so the
    tercile boundaries are deterministic across engines."""
    ppl = lm_perplexity(raw, target, text_col, id_col, n_buckets)
    w = Window.partitionBy(lang_col).orderBy(
        F.asc("ppl"), F.asc(id_col)
    )
    return (
        raw.select(id_col, lang_col)
        .join(ppl, id_col)
        .where(F.col("ppl").isNotNull())
        .withColumn("tile", F.ntile(3).over(w))
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.col("ppl"),
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in _BUCKETS.items() for x in kv]
                ),
                F.col("tile"),
            ).alias("bucket"),
        )
    )


# ------------------------------------------------------- DuckDB twins


def _pair_counts_cte(table: str, text_col: str, id_col: str,
                     n_buckets: int, name: str) -> str:
    # the bucket array is materialized ONCE per document before the
    # positional unnest — inlining it into the pair expression would
    # re-run the md5 list_transform per bigram position (O(n^2))
    bkts = _buckets_sql(text_col, n_buckets)
    return f"""{name} AS MATERIALIZED (
  SELECT {id_col}, pair, count(*) AS cnt
  FROM (
    SELECT {id_col}, bkts[i] * {n_buckets} + bkts[i + 1] AS pair
    FROM (
      SELECT {id_col}, bkts,
             unnest(generate_series(1, len(bkts) - 1)) AS i
      FROM (SELECT {id_col}, {bkts} AS bkts FROM {table})
    )
  )
  GROUP BY {id_col}, pair
)"""


def lm_perplexity_sql(
    raw_table: str,
    target_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`lm_perplexity` (same smoothing, same
    rounding)."""
    b = float(n_buckets)
    return f"""
WITH {_pair_counts_cte(raw_table, text_col, id_col, n_buckets, 'per_doc')},
{_pair_counts_cte(target_table, text_col, id_col, n_buckets, 'tgt_doc')},
bg AS (SELECT pair, sum(cnt) AS bc FROM tgt_doc GROUP BY pair),
ctx AS (SELECT CAST(floor(pair / {n_buckets}) AS BIGINT) AS pb,
               sum(bc) AS cc
        FROM bg GROUP BY pb),
scored AS (
  SELECT d.{id_col},
         round(exp(-sum(
           CAST(d.cnt AS DOUBLE) * (
             ln(CAST(coalesce(bg.bc, 0) AS DOUBLE) + 1.0)
             - ln(CAST(coalesce(ctx.cc, 0) AS DOUBLE) + {b!r})
           )
         ) / CAST(sum(d.cnt) AS DOUBLE)), 6) AS ppl
  FROM per_doc d
  LEFT JOIN bg USING (pair)
  LEFT JOIN ctx ON CAST(floor(d.pair / {n_buckets}) AS BIGINT) = ctx.pb
  GROUP BY d.{id_col}
)
SELECT r.{id_col}, s.ppl
FROM {raw_table} r LEFT JOIN scored s USING ({id_col})
"""


def perplexity_buckets_sql(
    raw_table: str,
    target_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`perplexity_buckets`."""
    ppl = lm_perplexity_sql(raw_table, target_table, text_col, id_col,
                            n_buckets)
    return f"""
WITH p AS ({ppl})
SELECT {id_col}, {lang_col}, ppl,
       CASE ntile(3) OVER (PARTITION BY {lang_col}
                           ORDER BY ppl ASC, {id_col} ASC)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS bucket
FROM (SELECT r.{id_col}, r.{lang_col}, p.ppl
      FROM {raw_table} r JOIN p USING ({id_col})
      WHERE p.ppl IS NOT NULL)
"""
