"""BPE tokenizer training and encoding (Sennrich et al. ACL 2016,
arXiv:1508.07909) — the vocabulary-induction stage a training-data
pipeline runs between curation and packing (GPT-2/Llama-style
tokenizers are BPE trained on the curated corpus).

Spark-first decomposition:

- The corpus collapses to a (word, count) table in ONE shuffle
  (`word_counts`) — classic BPE trains on the word-frequency dict,
  never the raw text, so 100 TB of text becomes ~10^7-10^8 distinct
  words before any iteration starts.
- Each merge round is: explode adjacent symbol pairs weighted by word
  count → one partial-agg shuffle → a 1-ROW driver collect of the
  best pair (count desc, pair bytewise asc — fully deterministic) →
  apply the merge as a native string replace.  k merges = k bounded
  rounds over the persisted words table, the same driver-loop shape
  as Lloyd refinement (similarity.py) and pointer-jumping
  (dedup.py) — nothing driver-side ever exceeds one row per round.
- Words are carried as DOUBLE-SPACE-separated symbol strings with a
  single-space pad on each end (``" h  e  l  l  o  </w> "``):
  applying merge (a, b) is ``replace(syms, ' a  b ', ' ab ')``.  The
  pattern consumes only ONE space of each flanking double gap, so the
  leftover space re-seeds the boundary for the next occurrence —
  back-to-back repeats (``. . . .``) merge with exactly the greedy
  leftmost non-overlapping grouping of the reference implementation
  (a single-space scheme gets this wrong: the shared separator is
  consumed and every second occurrence is skipped).  Token
  boundaries stay unambiguous because symbols cannot contain spaces,
  so a single space can only ever flank a whole symbol.  Pure
  codegen expression on both engines.
- `bpe_encode` bakes a trained merge list into ONE chained-replace
  column expression: char-split each word, append ``</w>``, replay
  the merges in rank order.  Encoding 100 TB is therefore a map-only
  codegen projection — no Python, no UDF, no lookup join.

DuckDB twins: `bpe_train_sql` unrolls the k rounds as CTE stages
(the `pagerank` / IVF-Lloyd oracle pattern) and must reproduce the
merge table BIT-identically; `bpe_encode_sql` mirrors the chained
replace.

Scope: character-level initial alphabet over whitespace-split words
(byte-level pre-mapping à la GPT-2 is an input transform, not a
different algorithm); ties broken bytewise, no frequency floor below
``min_count``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import persisted

#: end-of-word marker symbol (Sennrich-style, its own final symbol).
EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus → (word, cnt): the one full-corpus shuffle BPE needs."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = docs.select(
        F.explode(
            F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("cnt"))


def _initial_syms(word: Column) -> Column:
    """'hello' → ' h  e  l  l  o  </w> ' (double-space separators,
    single-space pads)."""
    return F.concat(
        F.lit(" "),
        F.concat_ws("  ", F.split(word, "")),
        F.lit("  " + EOW + " "),
    )


def _symbols(syms: Column) -> Column:
    """Padded symbol string → symbol array."""
    return F.split(F.trim(syms), "  ")


def _adjacent_pairs(syms: Column) -> Column:
    """Symbol string → array of adjacent 'a b' pair strings."""
    arr = _symbols(syms)
    n = F.size(arr)
    return F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def _pattern(pair: str) -> str:
    """Ranked pair 'a b' → its in-string match pattern ' a  b '."""
    return " " + pair.replace(" ", "  ") + " "


def _apply_merge(syms: Column, pair: str) -> Column:
    """Greedy leftmost non-overlapping merge of one ranked pair (each
    replacement leaves one space on each side, so double gaps and the
    end pads are preserved and adjacent occurrences still match)."""
    merged = pair.replace(" ", "")
    return F.replace(syms, F.lit(_pattern(pair)), F.lit(f" {merged} "))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    top_words: Optional[int] = 10_000,
    min_count: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the ranked merge table
    (step, pair, merged, pair_count) — k rows, the artifact a
    tokenizer ships.  ``top_words`` bounds the working set to the
    most frequent words (count desc, word asc — deterministic), the
    standard practical cap; None trains on every distinct word."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    wc = word_counts(docs, text_col=text_col, lowercase=lowercase)
    if top_words is not None:
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(top_words)
    state = persisted(
        wc.select("cnt", _initial_syms(F.col("word")).alias("syms"))
    )
    merges = []
    for step in range(1, n_merges + 1):
        best = (
            state.select(
                "cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("pair")
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
            .where(F.col("c") >= min_count)
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, c = best[0]["pair"], best[0]["c"]
        merges.append((step, pair, pair.replace(" ", ""), c))
        nxt = persisted(
            state.select("cnt", _apply_merge(F.col("syms"), pair).alias("syms"))
        )
        state.unpersist()
        state = nxt
    state.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "step int, pair string, merged string, pair_count bigint"
    )


def bpe_encode(col: Column, merges: list) -> Column:
    """Encode a text column with a trained merge list (pair strings in
    rank order): one chained-replace codegen expression per word —
    map-only at any scale.  Returns the space-joined token string."""
    def encode_word(w: Column) -> Column:
        out = _initial_syms(w)
        for pair in merges:
            out = _apply_merge(out, pair)
        return F.concat_ws(" ", _symbols(out))

    return F.concat_ws(
        " ",
        F.transform(
            F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != ""),
            encode_word,
        ),
    )


# ---------------------------------------------------------------- SQL twins

def _word_counts_sql(table: str, text_col: str, lowercase: bool) -> str:
    t = f"lower({text_col})" if lowercase else text_col
    return f"""
  SELECT word, count(*) AS cnt
  FROM (SELECT unnest(list_filter(
                 string_split_regex(trim({t}), '\\s+'),
                 w -> w <> '')) AS word
        FROM {table})
  GROUP BY word
"""


# Padded double-space symbol string, mirroring `_initial_syms`:
# 'hello' -> ' h  e  l  l  o  </w> '.
_SYMS_SQL = (
    "' ' || array_to_string(list_transform(generate_series(1, length(word)), "
    "i -> substring(word, i, 1)), '  ') || '  " + EOW + " '"
)


def bpe_train_sql(
    table: str,
    n_merges: int,
    text_col: str = "text",
    top_words: Optional[int] = 10_000,
    min_count: int = 2,
    lowercase: bool = True,
) -> str:
    """DuckDB twin of :func:`bpe_train`: the k rounds unrolled as CTE
    stages (pair-count CTE + 1-row best CTE + merged-state CTE per
    round), bit-identical merge table."""
    cap = (
        f"ORDER BY cnt DESC, word LIMIT {int(top_words)}"
        if top_words is not None
        else ""
    )
    ctes = [
        f"wc AS MATERIALIZED (SELECT * FROM ({_word_counts_sql(table, text_col, lowercase)}) {cap})",
        f"s0 AS MATERIALIZED (SELECT cnt, {_SYMS_SQL} AS syms FROM wc)",
    ]
    selects = []
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT arr[i] || ' ' || arr[i + 1] AS pair, sum(cnt) AS c
  FROM (SELECT cnt, arr,
               unnest(generate_series(1, len(arr) - 1)) AS i
        FROM (SELECT cnt, string_split(trim(syms), '  ') AS arr FROM {prev}))
  GROUP BY 1
  HAVING sum(cnt) >= {int(min_count)}
)""")
        ctes.append(
            f"b{k} AS MATERIALIZED (SELECT pair, c FROM p{k} "
            f"ORDER BY c DESC, pair ASC LIMIT 1)"
        )
        # syms stays in padded double-space form; replacing
        # ' a  b ' with ' ab ' leaves one space on each side, so the
        # boundary re-seeds for back-to-back occurrences (same greedy
        # leftmost grouping as the Spark side).
        ctes.append(f"""s{k} AS MATERIALIZED (
  SELECT cnt,
         CASE WHEN (SELECT count(*) FROM b{k}) = 0 THEN syms
              ELSE replace(syms,
                     ' ' || (SELECT replace(pair, ' ', '  ') FROM b{k}) || ' ',
                     ' ' || (SELECT replace(pair, ' ', '') FROM b{k}) || ' ')
         END AS syms
  FROM {prev}
)""")
        selects.append(
            f"SELECT {k} AS step, pair, replace(pair, ' ', '') AS merged, "
            f"c AS pair_count FROM b{k}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY step"
    )


def bpe_encode_sql(col: str, merges: list) -> str:
    """DuckDB twin of :func:`bpe_encode` (same double-space chained
    replace, then collapse back to single-space tokens)."""
    word_syms = (
        "' ' || array_to_string(list_transform("
        "generate_series(1, length(w)), "
        "i -> substring(w, i, 1)), '  ') || '  " + EOW + " '"
    )
    out = f"({word_syms})"
    for pair in merges:
        pat = pair.replace(" ", "  ")
        merged = pair.replace(" ", "")
        out = f"replace({out}, ' {pat} ', ' {merged} ')"
    return (
        f"array_to_string(list_transform("
        f"list_filter(string_split_regex(trim({col}), '\\s+'), "
        f"w -> w <> ''), "
        f"w -> array_to_string(string_split(trim({out}), '  '), ' ')), ' ')"
    )
