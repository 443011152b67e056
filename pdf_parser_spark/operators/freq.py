"""Exact heavy hitters with bounded memory: Misra-Gries candidates +
a native verify pass (Misra & Gries, Sci. Comput. Program. 1982;
the distributed two-pass shape of Cormode & Hadjieleftheriou,
VLDB 2008 "Finding frequent items in data streams").

The problem at 100 TB: "which tokens exceed phi of the corpus?"
An exact one-pass ``groupBy(term)`` shuffles EVERY distinct term —
the long Zipf tail is billions of keys, almost all of them hapax
noise that can never be a heavy hitter. The classic fix is a
candidate pass whose state is bounded by the ERROR BUDGET, not the
vocabulary, followed by an exact count of the candidates only:

- **Candidate pass** (`mg_candidates`): each partition streams its
  tokens through a Misra-Gries summary of k-1 counters (increment on
  hit, admit while there is room, otherwise decrement ALL counters —
  a token must be seen > n_p/k times net of decrements to survive).
  MG guarantees every term with partition frequency > n_p/k is in the
  summary; summing over partitions, any term with CORPUS frequency
  > N/k survives in at least one partition (if f_p <= n_p/k for all
  p then f <= N/k). So with k >= 1/phi the union of per-partition
  candidates is a SUPERSET of the true heavy hitters — never a miss,
  only bounded-many false candidates (<= partitions x (k-1)).
  Implemented as an Arrow-batched ``mapInPandas`` whose state
  persists across record batches within the partition; the Python
  tokenizer mirrors Java ``\\s+`` ([ \\t\\n\\x0b\\f\\r]+) so the
  candidate superset is computed over the same token stream the
  native verify pass counts. This is the one imperative loop — it
  carries k counters, never the corpus.
- **Verify pass** (`heavy_hitters`): all-native — one map-only
  total-token aggregate, then explode + broadcast LEFT-SEMI join
  against the candidate frame + ``groupBy(term)``. The groupBy's key
  space is the candidate set (bounded), so the exchange carries
  almost nothing; the threshold compare is done against the 1-row
  broadcast total in-plan (no driver collect).

Output is EXACT (identical to the full groupBy, pinned by the DuckDB
twin `heavy_hitters_sql`, which is the naive exact query) while the
shuffled state is bounded by partitions x k instead of |vocabulary|.

Reference scope note: the reference (`/root/reference`) has no corpus
statistics at all; this operator exists for the 100 TB training-data
tier (frequent boilerplate tokens, stop-shingle discovery for the
dedup family's MAX_BUCKET caps, telemetry).
"""

from __future__ import annotations

import math
import re
from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import _tokens, _tokens_sql

#: Java \s — keep the Python candidate tokenizer byte-compatible with
#: the native verify pass (Python's str.split()/\s also matches
#: unicode whitespace like \xa0, which Java \s does not).
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def mg_candidates(
    df: DataFrame,
    text_col: str = "text",
    k: int = 256,
    lowercase: bool = True,
) -> DataFrame:
    """Per-partition Misra-Gries candidate terms: every term with
    corpus token frequency > N_tokens/k is guaranteed present; at
    most (k-1) terms survive per partition."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                s = text.lower() if lowercase else text
                for tok in _JAVA_WS.split(s.strip()):
                    if not tok:
                        continue
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k - 1:
                        counters[tok] = 1
                    else:
                        dead = []
                        for u in counters:
                            counters[u] -= 1
                            if counters[u] == 0:
                                dead.append(u)
                        for u in dead:
                            del counters[u]
        yield pd.DataFrame({"term": list(counters.keys())})

    return (
        df.select(text_col)
        .mapInPandas(summarize, schema="term string")
        .distinct()
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    phi: float = 0.001,
    k: Optional[int] = None,
    lowercase: bool = True,
) -> DataFrame:
    """(term, cnt) for every token whose EXACT corpus frequency
    exceeds floor(phi * total_tokens) — equal to the naive full
    groupBy (the DuckDB twin), but the only per-term state that ever
    shuffles is the bounded candidate set.

    `k` defaults to ceil(1/phi) + 1, the smallest summary for which
    the MG containment guarantee covers the phi threshold (a term at
    exactly the threshold has frequency > total/k)."""
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if k is None:
        k = int(math.ceil(1.0 / phi)) + 1
    if k < int(math.ceil(1.0 / phi)):
        raise ValueError(
            f"k={k} breaks the containment guarantee for phi={phi} "
            f"(needs k >= {math.ceil(1.0 / phi):.0f})"
        )
    col: Column = F.col(text_col)
    toks = _tokens(col, lowercase)
    # map-only: total token count never explodes the corpus
    total = df.agg(
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).alias("total")
    )
    cand = mg_candidates(df, text_col=text_col, k=k, lowercase=lowercase)
    counted = (
        df.select(F.explode(toks).alias("term"))
        .join(F.broadcast(cand), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.floor(F.lit(phi) * F.col("total")))
        .select("term", "cnt")
    )


def heavy_hitters_sql(
    table: str = "documents",
    text_col: str = "text",
    phi: float = 0.001,
    lowercase: bool = True,
) -> str:
    """DuckDB twin: the NAIVE exact frequent-terms query the bounded
    two-pass plan is provably equal to. CAST the phi literal to
    DOUBLE (a bare DuckDB numeric literal is DECIMAL and would round
    differently from Spark's double multiply at the boundary)."""
    toks = _tokens_sql(text_col, lowercase)
    return f"""
WITH toks AS (SELECT unnest({toks}) AS term FROM {table}),
tot AS (SELECT count(*) AS total FROM toks)
SELECT term, count(*) AS cnt
FROM toks, tot
GROUP BY term, total
HAVING count(*) > CAST(floor(CAST({phi!r} AS DOUBLE) * total) AS BIGINT)
"""
