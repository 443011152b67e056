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
