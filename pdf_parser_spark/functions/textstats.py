"""Text-analysis functions for the training-data pipeline tier.

Every function here is a NATIVE Spark column expression (JVM-side,
whole-stage codegen — no Python in the hot path) with a DuckDB-SQL
twin string for the driver's oracle comparison. The twin must compute
bit-identical values, so only constructs with identical semantics in
Spark SQL and DuckDB are used (length, lower, split-regex, list
lambdas, md5, arithmetic).

Operators: token counting (whitespace + BPE-ish word-piece regex),
quality scoring (length / punctuation / stopword / alpha ratios),
language ID (stopword-profile n-gram heuristic), document
fingerprinting (md5 exact + polynomial rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------- tokens

#: BPE-ish pre-tokenizer: word pieces = letter runs, digit runs, or
#: single non-space punctuation (GPT-2-style pre-tokenization shape).
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def ws_token_count_sql(col: str) -> str:
    return (
        f"CASE WHEN trim({col}) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim({col}), '\\s+')) END"
    )


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish word pieces (letters / digits / punct singles)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_REGEX), 0))


def bpe_token_count_sql(col: str) -> str:
    return f"len(regexp_extract_all({col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"


# ------------------------------------------------------------ quality

STOPWORDS = (
    "the a an and or of to in is it that for on with as at this by "
    "from be are was were has have had not but"
).split()

_PUNCT_CLASS = r"[.,!?;:'\"()\[\]-]"


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def quality_features(col: Column) -> dict:
    """Component features of the quality score, each a named Column."""
    n_chars = F.length(col)
    words = F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.lower(col)), r"\s+")
    )
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(col, _PUNCT_CLASS, ""))
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": _ratio(n_chars - (n_words - 1), n_words),
        "punct_ratio": _ratio(n_punct, n_chars),
        "alpha_ratio": _ratio(n_alpha, n_chars),
        "stopword_ratio": _ratio(n_stop, n_words),
    }


def quality_score(col: Column) -> Column:
    """Gopher/C4-style heuristic quality score in [0,1]:
    0.25·len_ok + 0.25·stopword_ok + 0.25·alpha_ok + 0.25·punct_ok,
    with len_ok = 50 <= n_chars <= 100000, stopword_ok = ratio >= 0.05,
    alpha_ok = ratio >= 0.6, punct_ok = ratio <= 0.2."""
    f = quality_features(col)
    ok = lambda c: F.when(c, 1.0).otherwise(0.0)  # noqa: E731
    return (
        0.25 * ok((f["n_chars"] >= 50) & (f["n_chars"] <= 100000))
        + 0.25 * ok(f["stopword_ratio"] >= 0.05)
        + 0.25 * ok(f["alpha_ratio"] >= 0.6)
        + 0.25 * ok(f["punct_ratio"] <= 0.2)
    ).alias("quality_score")


_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def quality_features_sql(col: str) -> dict:
    words = (
        f"CASE WHEN trim({col}) = '' THEN [] "
        f"ELSE string_split_regex(trim(lower({col})), '\\s+') END"
    )
    n_words = f"len({words})"
    n_chars = f"length({col})"
    n_punct = (
        f"length({col}) - length(regexp_replace({col},"
        " '[.,!?;:''\"()\\[\\]-]', '', 'g'))"
    )
    n_alpha = f"length(regexp_replace({col}, '[^A-Za-z]', '', 'g'))"
    n_stop = f"len(list_filter({words}, w -> list_contains({_SW_SQL}, w)))"
    r = lambda num, den: (  # noqa: E731
        f"CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE)/CAST({den} AS DOUBLE)"
        " ELSE 0.0 END"
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": r(f"{n_chars} - ({n_words} - 1)", n_words),
        "punct_ratio": r(n_punct, n_chars),
        "alpha_ratio": r(n_alpha, n_chars),
        "stopword_ratio": r(n_stop, n_words),
    }


def quality_score_sql(col: str) -> str:
    f = quality_features_sql(col)
    ok = lambda c: f"CASE WHEN {c} THEN 1.0 ELSE 0.0 END"  # noqa: E731
    len_ok = ok(f"({f['n_chars']}) >= 50 AND ({f['n_chars']}) <= 100000")
    stop_ok = ok(f"({f['stopword_ratio']}) >= 0.05")
    alpha_ok = ok(f"({f['alpha_ratio']}) >= 0.6")
    punct_ok = ok(f"({f['punct_ratio']}) <= 0.2")
    # CAST: DuckDB decimal literals would otherwise yield DECIMAL, and
    # round(DECIMAL) renders '1.000' != Spark's DOUBLE 1.0
    return (
        f"CAST(0.25*({len_ok}) + 0.25*({stop_ok}) + 0.25*({alpha_ok})"
        f" + 0.25*({punct_ok}) AS DOUBLE)"
    )


# ------------------------------------------------------------- langid

LANG_PROFILES = {
    "en": "the and is of to in that it for with as this".split(),
    "de": "der die das und ist von zu mit nicht ein eine den".split(),
    "fr": "le la les et est des une dans que pour sur pas".split(),
    "es": "el la los y es de en que un una para por".split(),
}


def lang_scores(col: Column) -> dict:
    """Per-language stopword-hit counts over lowercase word tokens."""
    words = F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.lower(col)), r"\s+")
    )
    out = {}
    for lang, prof in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in prof])
        out[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    return out


def lang_id(col: Column) -> Column:
    """argmax language, 'und' when all scores are 0. Deterministic
    tie-break: higher score wins, ties broken by profile order
    en > de > fr > es (strict > comparison in a fold)."""
    scores = lang_scores(col)
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in LANG_PROFILES:  # insertion order = tie-break order
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def lang_id_sql(col: str) -> str:
    words = (
        f"CASE WHEN trim({col}) = '' THEN [] "
        f"ELSE string_split_regex(trim(lower({col})), '\\s+') END"
    )
    parts = []
    for lang, prof in LANG_PROFILES.items():
        arr = "[" + ", ".join(f"'{w}'" for w in prof) + "]"
        parts.append(
            (lang, f"len(list_filter({words}, w -> list_contains({arr}, w)))")
        )
    # same strict-> fold, rendered as nested CASE
    expr_lang, expr_score = "'und'", "0"
    for lang, s in parts:
        expr_lang = f"CASE WHEN ({s}) > ({expr_score}) THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN ({s}) > ({expr_score}) THEN ({s}) ELSE {expr_score} END"
    return expr_lang


# -------------------------------------------------------- fingerprints

def md5_fingerprint(col: Column) -> Column:
    """Exact-dedup content fingerprint (hex md5 — identical builtin in
    Spark and DuckDB)."""
    return F.md5(col)


def md5_fingerprint_sql(col: str) -> str:
    return f"md5({col})"


ROLL_BASE, ROLL_MOD = 257, 1_000_000_007


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over ascii codes (Rabin-Karp form):
    fold(acc = (acc*257 + ascii(char)) mod 1e9+7). Whole-document
    variant of the shingle fingerprints used by the dedup family.
    Expressed with higher-order aggregate → stays JVM-side."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * ROLL_BASE + F.ascii(ch)) % ROLL_MOD,
    )


def rolling_fingerprint_sql(col: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex({col}, ''), "
        f"ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(acc, ch) -> (acc * {ROLL_BASE} + ch) % {ROLL_MOD})"
    )


# ------------------------------------------------- repetition (Gopher)


def repetition_from_shingles(sh: Column) -> Column:
    """Repetition ratio over a PRE-PROJECTED shingle array column.

    IMPORTANT: pass a projected column (df.select(shingles.alias("sh"))
    first), not the raw shingle expression — Spark re-evaluates a
    non-attribute expression inside every higher-order-lambda element,
    turning the O(n^2) count into O(n^2) x shingle-construction
    (measured ~50x slower); a multiply-referenced projected attribute
    evaluates once per row and CollapseProject keeps the barrier."""
    top = F.array_max(
        F.transform(
            F.array_distinct(sh),
            lambda s: F.size(F.filter(sh, lambda x: x == s)),
        )
    )
    return (
        F.when(F.size(sh) > 0, top.cast("double") / F.size(sh))
        .otherwise(F.lit(0.0))
    )


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Gopher-style repetition feature: fraction of word n-grams taken
    by the single most frequent one (high => boilerplate/spam).

    Pure column expression (map-only, NO shuffle): distinct shingles x
    occurrence counts via higher-order functions. Quadratic in the
    per-document shingle count — the right trade for web pages (10^2 -
    10^4 tokens); for book-length documents switch to the
    explode+groupBy formulation (one shuffle on (doc, shingle)).
    Prefer the two-step form (project shingles, then
    :func:`repetition_from_shingles`) in hot paths — see its note."""
    from ..operators.dedup import word_shingles

    return repetition_from_shingles(word_shingles(col, n))


def repetition_ratio_sql(col: str, n: int = 2) -> str:
    from ..operators.dedup import word_shingles_sql

    sh = word_shingles_sql(col, n)
    return (
        f"CASE WHEN len({sh}) > 0 THEN "
        f"CAST(list_max(list_transform(list_distinct({sh}), "
        f"s -> len(list_filter({sh}, x -> x = s)))) AS DOUBLE) "
        f"/ len({sh}) ELSE 0.0 END"
    )


# ------------------------------------- repetition suite (Gopher A.1.2)

#: (signal name, threshold) in Rae et al. 2021 Table A1 order; a doc
#: is removed when signal > threshold, and the FIRST exceeded signal
#: (in this order) is the gate's reason.
GOPHER_REPETITION_RULES = (
    ("dup_line_frac", 0.30),
    ("dup_para_frac", 0.30),
    ("dup_line_char_frac", 0.20),
    ("dup_para_char_frac", 0.20),
    ("top_2gram_char_frac", 0.20),
    ("top_3gram_char_frac", 0.18),
    ("top_4gram_char_frac", 0.16),
    ("dup_5gram_char_frac", 0.15),
    ("dup_6gram_char_frac", 0.14),
    ("dup_7gram_char_frac", 0.13),
    ("dup_8gram_char_frac", 0.12),
    ("dup_9gram_char_frac", 0.11),
    ("dup_10gram_char_frac", 0.10),
)

_L0 = lambda: F.lit(0).cast("long")  # noqa: E731


def _sum_lens(els: Column) -> Column:
    """Sum of element string lengths as BIGINT (0 for [])."""
    return F.aggregate(els, _L0(), lambda a, x: a + F.length(x))


def _dup_elem_exprs(els: Column) -> tuple:
    """(dup_frac, dup_char_frac) over an element array ATTRIBUTE.

    dup_frac = instances beyond each element's first occurrence / n
    (Gopher's duplicate line/paragraph fraction); dup_char_frac = the
    character-weighted variant. O(distinct x n) higher-order scan per
    row — map-only, no shuffle."""
    n = F.size(els)
    dup_frac = _ratio(n - F.size(F.array_distinct(els)), n)
    dup_chars = F.aggregate(
        F.array_distinct(els),
        _L0(),
        lambda a, e: a
        + (F.size(F.filter(els, lambda x: x == e)) - 1).cast("long")
        * F.length(e),
    )
    return dup_frac, _ratio(dup_chars, _sum_lens(els))


def _trimmed_elems(col: Column, sep_regex: str) -> Column:
    """Non-empty trimmed segments of `col` split on `sep_regex`."""
    return F.filter(
        F.transform(F.split(col, sep_regex), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _gram_stats(sh: Column) -> Column:
    """array<struct<c,l>> of (occurrence count, char length) per
    DISTINCT n-gram of a pre-projected shingle-array attribute."""
    return F.transform(
        F.array_distinct(sh),
        lambda g: F.struct(
            F.size(F.filter(sh, lambda x: x == g)).alias("c"),
            F.length(g).alias("l"),
        ),
    )


def _dup_starts(sh: Column) -> Column:
    """1-based start positions of shingles that occur >= 2 times."""
    return F.when(
        F.size(sh) < 1, F.array().cast("array<int>")
    ).otherwise(
        F.filter(
            F.sequence(F.lit(1), F.size(sh)),
            lambda i: F.size(
                F.filter(sh, lambda x: x == F.element_at(sh, i))
            )
            >= 2,
        )
    )


def repetition_signals(
    df, text_col: str = "text", id_col: str = "doc_id"
):
    """Gopher's full repetition ruleset (Rae et al. 2021 §A.1.2 /
    Table A1) per document — the heavy sibling of
    :func:`repetition_ratio` and the missing half of
    :func:`gopher_gate`. Returns (id_col, 13 signal doubles, keep,
    reason):

    - ``dup_line_frac`` / ``dup_para_frac``: fraction of line /
      paragraph instances beyond each distinct value's first
      occurrence (lines = non-empty trimmed ``\\n`` segments,
      paragraphs = non-empty trimmed ``\\n{2,}`` segments).
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: the
      character-weighted variants (duplicate-instance chars / total
      segment chars).
    - ``top_{2,3,4}gram_char_frac``: occurrences x char-length of the
      most frequent word n-gram / total text length; ties broken by
      max (count, length) — 0 when the top gram occurs once.
    - ``dup_{5..10}gram_char_frac``: fraction of word characters
      covered by ANY word position inside an n-gram that occurs >= 2
      times (overlapping coverage counted once, the paper's exact
      set-union definition, not the greedy skip approximation).

    Execution shape: three stacked narrow projections (text -> word /
    line / para / shingle arrays -> per-gram stats + duplicate start
    positions -> fractions), every stage a native higher-order
    expression — map-only, NO shuffle, nothing leaves the JVM. The
    arrays are projected as attributes between stages because Spark
    re-evaluates a non-attribute expression inside every lambda
    element (see :func:`repetition_from_shingles`). Per-row cost is
    O(distinct-grams x grams) — the web-page trade; book-length
    corpora should switch to the explode+groupBy formulation.

    The gate (keep, reason) applies Table A1's thresholds with reason
    = first exceeded signal in ``GOPHER_REPETITION_RULES`` order.
    """
    from ..operators.dedup import word_shingles

    t = F.col("__t")
    l1 = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
    ).select(
        id_col,
        "__t",
        F.when(
            F.trim(t) == "", F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(t), r"\s+")).alias("__words"),
        _trimmed_elems(t, "\n").alias("__lines"),
        _trimmed_elems(t, r"\n{2,}").alias("__paras"),
        *[word_shingles(t, n).alias(f"__sh{n}") for n in range(2, 11)],
    )

    line_f, line_cf = _dup_elem_exprs(F.col("__lines"))
    para_f, para_cf = _dup_elem_exprs(F.col("__paras"))
    l2 = l1.select(
        id_col,
        "__t",
        "__words",
        _sum_lens(F.col("__words")).alias("__word_chars"),
        line_f.alias("dup_line_frac"),
        line_cf.alias("dup_line_char_frac"),
        para_f.alias("dup_para_frac"),
        para_cf.alias("dup_para_char_frac"),
        *[_gram_stats(F.col(f"__sh{n}")).alias(f"__st{n}")
          for n in (2, 3, 4)],
        *[_dup_starts(F.col(f"__sh{n}")).alias(f"__ds{n}")
          for n in range(5, 11)],
    )

    def top_frac(n: int) -> Column:
        st = F.col(f"__st{n}")
        best = F.array_max(st)
        return (
            F.when(
                (F.size(st) > 0) & (best["c"] >= 2),
                _ratio(best["c"].cast("long") * best["l"], F.length(t)),
            )
            .otherwise(F.lit(0.0))
            .alias(f"top_{n}gram_char_frac")
        )

    def dup_frac(n: int) -> Column:
        ds = F.col(f"__ds{n}")
        words = F.col("__words")
        covered = F.when(
            F.size(words) < 1, F.array().cast("array<int>")
        ).otherwise(
            F.filter(
                F.sequence(F.lit(1), F.size(words)),
                lambda p: F.exists(
                    ds, lambda i: (p >= i) & (p <= i + (n - 1))
                ),
            )
        )
        num = F.aggregate(
            covered, _L0(),
            lambda a, p: a + F.length(F.element_at(words, p)),
        )
        return _ratio(num, F.col("__word_chars")).alias(
            f"dup_{n}gram_char_frac"
        )

    sig = l2.select(
        id_col,
        "dup_line_frac",
        "dup_para_frac",
        "dup_line_char_frac",
        "dup_para_char_frac",
        *[top_frac(n) for n in (2, 3, 4)],
        *[dup_frac(n) for n in range(5, 11)],
    )
    reason = F.lit("")
    for name, thr in reversed(GOPHER_REPETITION_RULES):
        reason = F.when(F.col(name) > thr, F.lit(name)).otherwise(reason)
    return sig.select(
        "*", (reason == "").alias("keep"), reason.alias("reason")
    )


def repetition_signals_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`repetition_signals` — same staged CTEs
    (MATERIALIZED so constructed-text fixtures aren't re-inlined into
    every downstream lambda), identical integer arithmetic, so every
    fraction is the same IEEE double."""
    from ..operators.dedup import word_shingles_sql

    def elems(sep: str) -> str:
        return (
            f"list_filter(list_transform(string_split_regex(t, '{sep}'),"
            " x -> trim(x)), x -> x <> '')"
        )

    def sum_lens(els: str) -> str:
        return (
            f"coalesce(list_sum(list_transform({els},"
            " x -> CAST(length(x) AS BIGINT))), 0)"
        )

    r = lambda num, den: (  # noqa: E731
        f"CASE WHEN ({den}) > 0 THEN CAST({num} AS DOUBLE)"
        f"/CAST({den} AS DOUBLE) ELSE 0.0 END"
    )

    def dup_elem(els: str) -> tuple:
        n = f"len({els})"
        dup_f = r(f"({n}) - len(list_distinct({els}))", n)
        dup_chars = (
            f"coalesce(list_sum(list_transform(list_distinct({els}), "
            f"e -> CAST((len(list_filter({els}, x -> x = e)) - 1)"
            f" * length(e) AS BIGINT))), 0)"
        )
        return dup_f, r(dup_chars, sum_lens(els))

    line_f, line_cf = dup_elem("lines_a")
    para_f, para_cf = dup_elem("paras_a")

    def gram_stats(sh: str) -> str:
        return (
            f"list_transform(list_distinct({sh}), "
            f"g -> {{'c': len(list_filter({sh}, x -> x = g)),"
            f" 'l': length(g)}})"
        )

    def dup_starts(sh: str) -> str:
        return (
            f"CASE WHEN len({sh}) < 1 THEN [] "
            f"ELSE list_filter(generate_series(1, len({sh})), "
            f"i -> len(list_filter({sh}, x -> x = {sh}[i])) >= 2) END"
        )

    def top_frac(n: int) -> str:
        st = f"st{n}"
        c = f"struct_extract(list_max({st}), 'c')"
        ln = f"struct_extract(list_max({st}), 'l')"
        frac = r(f"CAST({c} AS BIGINT) * {ln}", "length(t)")
        return (
            f"CASE WHEN len({st}) > 0 AND ({c}) >= 2 THEN {frac} "
            f"ELSE 0.0 END AS top_{n}gram_char_frac"
        )

    def dup_frac(n: int) -> str:
        covered = (
            f"CASE WHEN len(words_a) < 1 THEN [] "
            f"ELSE list_filter(generate_series(1, len(words_a)), "
            f"p -> len(list_filter(ds{n},"
            f" i -> p >= i AND p <= i + {n - 1})) > 0) END"
        )
        num = (
            f"coalesce(list_sum(list_transform({covered}, "
            f"p -> CAST(length(words_a[p]) AS BIGINT))), 0)"
        )
        return f"{r(num, 'word_chars')} AS dup_{n}gram_char_frac"

    sig_names = [name for name, _ in GOPHER_REPETITION_RULES]
    reason = "''"
    for name, thr in reversed(GOPHER_REPETITION_RULES):
        reason = (
            f"CASE WHEN {name} > CAST({thr} AS DOUBLE) "
            f"THEN '{name}' ELSE {reason} END"
        )
    sh_cols = ",\n    ".join(
        f"{word_shingles_sql('t', n)} AS sh{n}" for n in range(2, 11)
    )
    st_cols = ",\n    ".join(
        f"{gram_stats(f'sh{n}')} AS st{n}" for n in (2, 3, 4)
    )
    ds_cols = ",\n    ".join(
        f"{dup_starts(f'sh{n}')} AS ds{n}" for n in range(5, 11)
    )
    words = (
        "CASE WHEN trim(t) = '' THEN [] "
        "ELSE string_split_regex(trim(t), '\\s+') END"
    )
    lines_e = elems("\\n")
    paras_e = elems("\\n{2,}")
    return f"""
WITH l0 AS MATERIALIZED (
  SELECT {id_col}, {text_col} AS t FROM {table}
), l1 AS MATERIALIZED (
  SELECT {id_col}, t,
    {words} AS words_a,
    {lines_e} AS lines_a,
    {paras_e} AS paras_a,
    {sh_cols}
  FROM l0
), l2 AS MATERIALIZED (
  SELECT {id_col}, t, words_a,
    {sum_lens('words_a')} AS word_chars,
    {line_f} AS dup_line_frac,
    {line_cf} AS dup_line_char_frac,
    {para_f} AS dup_para_frac,
    {para_cf} AS dup_para_char_frac,
    {st_cols},
    {ds_cols}
  FROM l1
), sig AS MATERIALIZED (
  SELECT {id_col},
    dup_line_frac, dup_para_frac,
    dup_line_char_frac, dup_para_char_frac,
    {top_frac(2)}, {top_frac(3)}, {top_frac(4)},
    {dup_frac(5)}, {dup_frac(6)}, {dup_frac(7)},
    {dup_frac(8)}, {dup_frac(9)}, {dup_frac(10)}
  FROM l2
)
SELECT {id_col}, {', '.join(sig_names)},
  ({reason}) = '' AS keep, {reason} AS reason
FROM sig
"""


# ---------------------------------------------- cleaning gate (C4-ish)

#: (rule name, in gate order) — first failing rule is the reason
QUALITY_GATE_RULES = (
    "too_few_words", "word_len", "alpha", "repetition",
)


def quality_gate(col: Column, sh: Column = None) -> Column:
    """C4/Gopher-style document cleaning gate as ONE struct column
    (keep boolean, reason string = first failing rule or '') — the
    filter stage a training-data pipeline runs before dedup. Rules:
    n_words >= 15; 2 <= avg_word_len <= 12; alpha_ratio >= 0.5;
    repetition_ratio(bigram) <= 0.2. Entirely native expressions —
    whole-stage codegen, no UDF, no shuffle. In hot paths pass `sh` =
    a PROJECTED bigram-shingle column (see repetition_from_shingles)."""
    f = quality_features(col)
    rep = (repetition_from_shingles(sh) if sh is not None
           else repetition_ratio(col, 2))
    reason = (
        F.when(f["n_words"] < 15, F.lit("too_few_words"))
        .when((f["avg_word_len"] < 2) | (f["avg_word_len"] > 12),
              F.lit("word_len"))
        .when(f["alpha_ratio"] < 0.5, F.lit("alpha"))
        .when(rep > 0.2, F.lit("repetition"))
        .otherwise(F.lit(""))
    )
    return F.struct((reason == "").alias("keep"), reason.alias("reason"))


def quality_gate_sql(col: str) -> dict:
    f = quality_features_sql(col)
    rep = repetition_ratio_sql(col, 2)
    reason = (
        f"CASE WHEN {f['n_words']} < 15 THEN 'too_few_words' "
        f"WHEN {f['avg_word_len']} < 2 OR {f['avg_word_len']} > 12 "
        f"THEN 'word_len' "
        f"WHEN {f['alpha_ratio']} < 0.5 THEN 'alpha' "
        f"WHEN {rep} > 0.2 THEN 'repetition' ELSE '' END"
    )
    return {"keep": f"({reason}) = ''", "reason": reason}


#: Gopher's document-level stop-word set (Rae et al. 2021, §A.1.1) —
#: a doc must contain at least 2 distinct members to pass.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_gate(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> Column:
    """Gopher's full document-quality ruleset (Rae et al. 2021,
    §A.1.1) as ONE struct column (keep boolean, reason string = first
    failing rule or '') — the heavier sibling of :func:`quality_gate`
    (whose 4 rules are the C4-ish fast path). Rules, in reason
    precedence order:

    - ``n_words``: word count outside [min_words, max_words]
    - ``word_len``: mean word length outside [3, 10]
    - ``symbols``: symbol-to-word ratio ('#' or ellipsis) > 0.1
    - ``bullets``: > 90% of lines start with a bullet character
    - ``ellipsis``: > 30% of lines end with an ellipsis
    - ``alpha_words``: < 80% of words contain an alphabetic character
    - ``stopwords``: fewer than 2 distinct Gopher stop words present

    Gopher's repetition rules (dup line/paragraph/n-gram fractions)
    are exposed separately (:func:`repetition_ratio`,
    operators/spans.py) and compose with this gate. Entirely native
    expressions — codegen, no UDF, no shuffle; every construct has
    identical Java-regex/RE2 semantics so :func:`gopher_gate_sql` is
    bit-exact.
    """
    words = F.when(
        F.trim(col) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.lower(col)), r"\s+"))
    n_words = F.size(words)
    mean_wl = _ratio(F.length(col) - (n_words - 1), n_words)
    n_hash = F.length(col) - F.length(F.regexp_replace(col, "#", ""))
    n_ell = F.size(F.regexp_extract_all(col, F.lit(r"(\.\.\.|…)"), 0))
    symbol_ratio = _ratio(n_hash + n_ell, n_words)
    lines = F.split(col, "\n")
    n_lines = F.size(lines)
    bullet_ratio = _ratio(
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•‣▪]"))),
        n_lines,
    )
    ellipsis_ratio = _ratio(
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))),
        n_lines,
    )
    alpha_word_ratio = _ratio(
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))), n_words
    )
    n_stop_distinct = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(words, s),
        )
    )
    reason = (
        F.when((n_words < min_words) | (n_words > max_words),
               F.lit("n_words"))
        .when((mean_wl < 3.0) | (mean_wl > 10.0), F.lit("word_len"))
        .when(symbol_ratio > 0.1, F.lit("symbols"))
        .when(bullet_ratio > 0.9, F.lit("bullets"))
        .when(ellipsis_ratio > 0.3, F.lit("ellipsis"))
        .when(alpha_word_ratio < 0.8, F.lit("alpha_words"))
        .when(n_stop_distinct < 2, F.lit("stopwords"))
        .otherwise(F.lit(""))
    )
    return F.struct((reason == "").alias("keep"), reason.alias("reason"))


def gopher_gate_sql(
    col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> dict:
    words = (
        f"CASE WHEN trim({col}) = '' THEN [] "
        f"ELSE string_split_regex(trim(lower({col})), '\\s+') END"
    )
    n_words = f"len({words})"
    r = lambda num, den: (  # noqa: E731
        f"CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE)/CAST({den} AS DOUBLE)"
        " ELSE 0.0 END"
    )
    mean_wl = r(f"length({col}) - ({n_words} - 1)", n_words)
    n_hash = f"length({col}) - length(replace({col}, '#', ''))"
    n_ell = f"len(regexp_extract_all({col}, '(\\.\\.\\.|…)'))"
    symbol_ratio = r(f"{n_hash} + {n_ell}", n_words)
    lines = f"string_split({col}, chr(10))"
    n_lines = f"len({lines})"
    bullet_ratio = r(
        f"len(list_filter({lines},"
        " l -> regexp_matches(ltrim(l), '^[-*•‣▪]')))",
        n_lines,
    )
    ellipsis_ratio = r(
        f"len(list_filter({lines},"
        " l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))",
        n_lines,
    )
    alpha_word_ratio = r(
        f"len(list_filter({words}, w -> regexp_matches(w, '[a-z]')))",
        n_words,
    )
    sw = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"
    n_stop_distinct = (
        f"len(list_filter({sw}, s -> list_contains({words}, s)))"
    )
    reason = (
        f"CASE WHEN ({n_words}) < {min_words} OR ({n_words}) > {max_words} "
        f"THEN 'n_words' "
        f"WHEN ({mean_wl}) < 3.0 OR ({mean_wl}) > 10.0 THEN 'word_len' "
        f"WHEN ({symbol_ratio}) > 0.1 THEN 'symbols' "
        f"WHEN ({bullet_ratio}) > 0.9 THEN 'bullets' "
        f"WHEN ({ellipsis_ratio}) > 0.3 THEN 'ellipsis' "
        f"WHEN ({alpha_word_ratio}) < 0.8 THEN 'alpha_words' "
        f"WHEN ({n_stop_distinct}) < 2 THEN 'stopwords' "
        f"ELSE '' END"
    )
    return {"keep": f"({reason}) = ''", "reason": reason}


# ------------------------------------------------- C4 line-level clean

#: C4's line filter constants (Raffel et al. 2020 §2.2; the TF C4
#: implementation uses min 5 words/line and min 5 retained
#: "sentences"/page — we count retained LINES, documented deviation).
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES = 5
_C4_TERMINAL = r'[.!?"]$'


def _c4_kept_lines(col: Column) -> Column:
    """Trimmed lines that survive C4's line rules: end in terminal
    punctuation (. ! ? \"), have >= C4_MIN_WORDS_PER_LINE whitespace
    words, and do not mention 'javascript' (case-insensitive)."""
    return F.filter(
        F.transform(F.split(col, "\n"), lambda x: F.trim(x)),
        lambda t: t.rlike(_C4_TERMINAL)
        & (F.size(F.split(t, r"\s+")) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(t).contains("javascript"),
    )


def c4_clean(col: Column) -> Column:
    """C4's cleaning stage (Raffel et al. 2020 §2.2) as ONE struct
    column (clean_text, n_kept_lines, keep, reason) — the line-level
    REWRITE sibling of the document-level gates (:func:`quality_gate`
    scores, this one edits). Line rules (each dropped line): must end
    in terminal punctuation, >= 5 words, no 'javascript'. Page rules
    on the ORIGINAL text, reason precedence: 'lorem_ipsum' (contains
    lorem ipsum), 'curly_brace' (contains ``{``, code placeholder),
    'too_few_lines' (< 5 retained lines — C4 counts sentences via a
    splitter; we count retained lines, see C4_MIN_LINES). Entirely
    native split/filter/rlike expressions — map-only, no UDF, no
    shuffle; the twin :func:`c4_clean_sql` is bit-exact."""
    kept = _c4_kept_lines(col)
    reason = (
        F.when(F.lower(col).contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(col.contains("{"), F.lit("curly_brace"))
        .when(F.size(kept) < C4_MIN_LINES, F.lit("too_few_lines"))
        .otherwise(F.lit(""))
    )
    return F.struct(
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).alias("n_kept_lines"),
        (reason == "").alias("keep"),
        reason.alias("reason"),
    )


def c4_clean_sql(col: str) -> dict:
    """DuckDB twin of :func:`c4_clean` — {field: sql} expressions."""
    kept = (
        f"list_filter(list_transform(string_split({col}, chr(10)),"
        " x -> trim(x)), t -> regexp_matches(t, '[.!?\"]$')"
        f" AND len(string_split_regex(t, '\\s+'))"
        f" >= {C4_MIN_WORDS_PER_LINE}"
        " AND NOT contains(lower(t), 'javascript'))"
    )
    reason = (
        f"CASE WHEN contains(lower({col}), 'lorem ipsum')"
        " THEN 'lorem_ipsum' "
        f"WHEN contains({col}, '" + "{" + "') THEN 'curly_brace' "
        f"WHEN len({kept}) < {C4_MIN_LINES} THEN 'too_few_lines' "
        "ELSE '' END"
    )
    return {
        # array_to_string([]) is NULL in DuckDB, '' in Spark
        "clean_text": f"coalesce(array_to_string({kept}, chr(10)), '')",
        "n_kept_lines": f"len({kept})",
        "keep": f"({reason}) = ''",
        "reason": reason,
    }


# ---------------------------------------------------------------- PII

#: PII detectors a training pipeline runs pre-release (C4 strips
#: "dirty" documents; The Pile / Dolma count-and-redact). Patterns are
#: restricted to constructs with IDENTICAL semantics in Java regex
#: (Spark) and RE2 (DuckDB): character classes, bounded repetition,
#: word boundaries — no alternation whose leftmost-first (Java) vs
#: leftmost-longest (RE2) resolution could diverge.
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4s": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn_like": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(col: Column) -> dict:
    """{name: count column} of non-overlapping PII pattern matches.
    Native regexp_extract_all — codegen, no UDF, no shuffle."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat in PII_PATTERNS.items()
    }


def pii_counts_sql(col: str) -> dict:
    return {
        name: f"len(regexp_extract_all({col}, '{pat}'))"
        for name, pat in PII_PATTERNS.items()
    }


def pii_redact(col: Column, token: str = "<PII>") -> Column:
    """Replace every PII match with `token` (the redaction sibling of
    :func:`pii_counts`; chained native regexp_replace)."""
    out = col
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_redact_sql(col: str, token: str = "<PII>") -> str:
    out = col
    for pat in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
