"""URL canonicalization and domain-level operators.

Every crawl pipeline keys on URLs before it ever looks at content:
URL-level exact dedup runs ahead of text dedup (the same page is
fetched under utm-tagged / fragment / default-port variants), and
domain-level aggregation drives blocklists and per-site quotas. The
reference app has no crawl tier (per-request parser); these operators
cover that stage for the 10^12-row corpus this engine targets, in the
shape CCNet/C4-style pipelines describe publicly.

All column functions are NATIVE Spark expressions (JVM, whole-stage
codegen — no Python, no UDF) with DuckDB-SQL twins for the driver's
oracle gate, written independently per the repo's oracle discipline
(same spec, different engine, bit-identical output).

Canonicalization spec (documented here, implemented twice):
 1. trim; cut the fragment (first ``#`` to end).
 2. split base / query at the first ``?``.
 3. lowercase the ``scheme://host[:port]`` prefix; strip a default
    port (``:80`` for http, ``:443`` for https).
 4. drop trailing ``/`` runs from the path (so ``/p/`` == ``/p`` and
    a bare ``/`` collapses to the empty path).
 5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``,
    ``msclkid``, ``ref``), sort the rest bytewise, rejoin with ``&``;
    re-attach as ``?q`` only when non-empty.

Registered-domain spec: host = the ``://``..``[/:?#]`` span of the
CANONICAL url, minus one leading ``www.``; take the last 2 labels,
or 3 when the last 2 form a multi-part public suffix from the small
embedded list (a public-suffix-list subset; the full PSL would ship
as a broadcast table on a real cluster, same plan shape).

Scale notes (100 TB): canonicalize / domain are map-only narrow
projections (free at any width); ``domain_stats`` is ONE partial-agg
shuffle on the domain key; ``filter_blocked_domains`` is a map-side
literal predicate for list blocklists and a broadcast anti-join for
table blocklists — kept rows never shuffle in either form.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: multi-part public suffixes where the registered domain needs three
#: labels (PSL subset; swap for the full broadcast PSL in production).
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.kr", "co.nz", "co.za",
    "com.br", "com.cn", "com.mx", "com.tr",
)

#: tracking query params dropped by canonicalization (key match).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL — a pure native column expression
    implementing the module-docstring spec."""
    u = F.regexp_replace(F.trim(col), r"#.*$", "")
    qpos = F.instr(u, "?")
    base = F.when(qpos > 0, F.substr(u, F.lit(1), qpos - 1)).otherwise(u)
    q = F.when(qpos > 0, F.substr(u, qpos + 1)).otherwise(F.lit(""))

    prefix = F.lower(
        F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)", 1)
    )
    rest = F.substr(base, F.length(prefix) + 1)
    prefix = F.when(
        prefix.startswith("https://"), F.regexp_replace(prefix, r":443$", "")
    ).when(
        prefix.startswith("http://"), F.regexp_replace(prefix, r":80$", "")
    ).otherwise(prefix)
    rest = F.regexp_replace(rest, r"/+$", "")

    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qn = F.concat_ws("&", kept)
    return F.concat(
        prefix, rest, F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit(""))
    )


def canonical_url_sql(col: str) -> str:
    """DuckDB twin of :func:`canonical_url` (same spec, independent
    formulation: list lambdas + regexps in DuckDB dialect)."""
    u = f"regexp_replace(trim({col}), '#.*$', '')"
    return f"""(
WITH_u AS_PLACEHOLDER
)""".replace("WITH_u AS_PLACEHOLDER", f"""
  SELECT concat(
    pfx2,
    regexp_replace(rest, '/+$', ''),
    CASE WHEN qn <> '' THEN '?' || qn ELSE '' END
  )
  FROM (
    SELECT
      CASE WHEN pfx LIKE 'https://%' THEN regexp_replace(pfx, ':443$', '')
           WHEN pfx LIKE 'http://%'  THEN regexp_replace(pfx, ':80$', '')
           ELSE pfx END AS pfx2,
      substr(base, length(pfx) + 1) AS rest,
      array_to_string(
        list_sort(list_filter(string_split(q, '&'),
          p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))),
        '&') AS qn
    FROM (
      SELECT base, q,
        lower(coalesce(regexp_extract(base,
          '^([A-Za-z][A-Za-z0-9+.\\-]*://[^/]*)', 1), '')) AS pfx
      FROM (
        SELECT
          CASE WHEN instr(u, '?') > 0
               THEN substr(u, 1, instr(u, '?') - 1) ELSE u END AS base,
          CASE WHEN instr(u, '?') > 0
               THEN substr(u, instr(u, '?') + 1) ELSE '' END AS q
        FROM (SELECT {u} AS u)
      )
    )
  )
""")


def registered_domain(col: Column) -> Column:
    """Registered domain (eTLD+1, PSL-subset) of a CANONICAL url."""
    host = F.regexp_replace(
        F.regexp_extract(col, r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)", 1),
        r"^www\.", "",
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.get(labels, n - 2), F.get(labels, n - 1))
    suf = F.array(*[F.lit(s) for s in MULTI_SUFFIXES])
    k = F.when(F.array_contains(suf, last2), F.lit(3)).otherwise(F.lit(2))
    return F.when(n <= k, host).otherwise(
        F.concat_ws(
            ".",
            F.when(k == 3, F.get(labels, n - 3)),
            F.get(labels, n - 2),
            F.get(labels, n - 1),
        )
    )


def registered_domain_sql(col: str) -> str:
    """DuckDB twin of :func:`registered_domain`."""
    sufs = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return f"""(
  SELECT CASE WHEN n <= k THEN host
              WHEN k = 3 THEN labels[n-2] || '.' || labels[n-1] || '.' || labels[n]
              ELSE labels[n-1] || '.' || labels[n] END
  FROM (
    SELECT host, labels, n,
      CASE WHEN n >= 2 AND (labels[n-1] || '.' || labels[n]) IN ({sufs})
           THEN 3 ELSE 2 END AS k
    FROM (
      SELECT host, string_split(host, '.') AS labels,
             len(string_split(host, '.')) AS n
      FROM (
        SELECT regexp_replace(coalesce(regexp_extract({col},
          '^[a-z][a-z0-9+.\\-]*://([^/:?#]*)', 1), ''), '^www\\.', '') AS host
      )
    )
  )
)"""


def with_url_columns(
    df: DataFrame, url_col: str = "url",
    canon_col: str = "canon_url", domain_col: str = "domain",
) -> DataFrame:
    """Map-only projection adding canonical-url and domain columns."""
    c = canonical_url(F.col(url_col))
    return df.withColumn(canon_col, c).withColumn(
        domain_col, registered_domain(F.col(canon_col))
    )


def url_dedup_key(col: Column) -> Column:
    """16-byte exact-dedup key over the canonical url — feed to the
    exact-dedup tier (operators/dedup.py) for URL-level dedup ahead
    of any content pass."""
    return F.md5(canonical_url(col))


def url_dedup_key_sql(col: str) -> str:
    return f"md5({canonical_url_sql(col)})"


def surt_key(col: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL —
    the key Common Crawl's CDX index sorts by, so one range-partition
    co-locates a whole domain subtree. Spec here (simplified from the
    public webarchive-commons SURT): canonicalize (module spec), take
    ``host[:port]`` minus one leading ``www.``, reverse the dot-split
    labels and join with commas, then append ``)`` + the canonical
    path-and-query, all lowercased. Native expression, map-only."""
    c = canonical_url(col)
    prefix = F.regexp_extract(c, r"^([a-z][a-z0-9+.\-]*://[^/]*)", 1)
    host = F.regexp_replace(
        F.regexp_extract(c, r"^[a-z][a-z0-9+.\-]*://([^/]*)", 1),
        r"^www\.", "",
    )
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    return F.lower(
        F.concat(rev, F.lit(")"), F.substr(c, F.length(prefix) + 1))
    )


def surt_key_sql(col: str) -> str:
    """DuckDB twin of :func:`surt_key`."""
    c = canonical_url_sql(col)
    return f"""(
  SELECT lower(concat(
    array_to_string(list_reverse(string_split(
      regexp_replace(coalesce(regexp_extract(c,
        '^[a-z][a-z0-9+.\\-]*://([^/]*)', 1), ''), '^www\\.', ''),
      '.')), ','),
    ')',
    substr(c, length(coalesce(regexp_extract(c,
      '^([a-z][a-z0-9+.\\-]*://[^/]*)', 1), '')) + 1)
  ))
  FROM (SELECT {c} AS c)
)"""


def domain_stats(
    df: DataFrame, url_col: str = "url",
    chars_col: str = "n_chars", lang_col: str = "lang",
) -> DataFrame:
    """Per-registered-domain corpus statistics: doc count, total
    chars, distinct languages. ONE partial-agg shuffle on the domain
    key; distinct-lang uses a pre-aggregated exact count (small
    cardinality per domain), not a corpus-wide distinct."""
    d = df.select(
        registered_domain(canonical_url(F.col(url_col))).alias("domain"),
        F.col(chars_col), F.col(lang_col),
    )
    return d.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum(chars_col).alias("total_chars"),
        F.countDistinct(lang_col).alias("n_langs"),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: Union[Sequence[str], DataFrame],
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted.

    A list/tuple blocklist compiles to a map-side literal predicate
    (no join, no shuffle — the common case: curated blocklists are
    thousands of entries). A DataFrame blocklist (one ``domain``
    column) becomes a broadcast LEFT ANTI join — kept rows never
    shuffle either way.
    """
    dom = registered_domain(canonical_url(F.col(url_col)))
    tagged = df.withColumn(domain_col, dom)
    if isinstance(blocked, DataFrame):
        return tagged.join(
            F.broadcast(blocked.select(F.col("domain").alias(domain_col))),
            domain_col, "left_anti",
        )
    return tagged.where(~F.col(domain_col).isin(list(blocked)))


# ------------------------------------------------------- spider traps


def url_trap_stats(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Per-URL-pattern crawl-trap statistics: (host, path_tpl,
    param_sig, n_urls, n_contents, trap_ratio).

    Spider traps — calendars, session ids, faceted-search grids —
    generate unbounded URL spaces over a bounded content set, and a
    frontier that can't see them wastes its politeness budget
    re-fetching the same bytes. The detector groups URLs by PATTERN:
    host + path template (digit runs folded to 'N', so /cal/2024/01
    and /cal/2031/12 collide) + the sorted set of query-param NAMES
    (values dropped — the trap varies values, not names). Per
    pattern, distinct URLs vs distinct content fingerprints: a high
    ratio means the pattern mints URLs without minting content.

    Feature extraction is map-only native regexp; the aggregate is
    ONE partial-combine shuffle on the pattern key. `fp_col` is any
    content fingerprint (md5 text hash, the canonical-text hash, or
    a simhash) already carried by the documents table — texts are
    never read here. Both distinct counts are exact (patterns are
    host-bounded; at 100 TB swap countDistinct for
    approx_count_distinct the same way jobs/report.py documents).
    `trap_ratio` is rounded to 6 dp for cross-engine stability.
    """
    host = F.lower(F.regexp_extract(F.col(url_col), r"://([^/?#]*)", 1))
    path = F.regexp_extract(F.col(url_col), r"://[^/?#]*([^?#]*)", 1)
    path_tpl = F.regexp_replace(path, r"[0-9]+", "N")
    q = F.when(
        F.instr(F.col(url_col), "?") > 0,
        F.substr(
            F.regexp_replace(F.col(url_col), r"#.*$", ""),
            F.instr(F.col(url_col), "?") + 1,
        ),
    ).otherwise(F.lit(""))
    param_sig = F.concat_ws(
        "&",
        F.array_sort(
            F.filter(
                F.transform(
                    F.split(q, "&"), lambda p: F.regexp_extract(p, "^([^=]*)", 1)
                ),
                lambda n: n != "",
            )
        ),
    )
    pat = df.select(
        host.alias("host"),
        path_tpl.alias("path_tpl"),
        param_sig.alias("param_sig"),
        F.col(url_col).alias("u"),
        F.col(fp_col).alias("f"),
    )
    return pat.groupBy("host", "path_tpl", "param_sig").agg(
        F.countDistinct("u").alias("n_urls"),
        F.countDistinct("f").alias("n_contents"),
        F.round(
            F.countDistinct("u").cast("double")
            / F.greatest(F.countDistinct("f"), F.lit(1)).cast("double"),
            6,
        ).alias("trap_ratio"),
    )


def url_trap_stats_sql(
    src: str, url_col: str = "url", fp_col: str = "fp"
) -> str:
    """DuckDB twin of :func:`url_trap_stats` (same spec, DuckDB
    regexp/list dialect)."""
    u = url_col
    q = (
        f"CASE WHEN instr({u}, '?') > 0 THEN"
        f" substr(regexp_replace({u}, '#.*$', ''), instr({u}, '?') + 1)"
        f" ELSE '' END"
    )
    return f"""
SELECT host, path_tpl, param_sig,
       count(DISTINCT u) AS n_urls,
       count(DISTINCT f) AS n_contents,
       round(CAST(count(DISTINCT u) AS DOUBLE)
             / CAST(greatest(count(DISTINCT f), 1) AS DOUBLE), 6)
         AS trap_ratio
FROM (
  SELECT
    lower(coalesce(regexp_extract({u}, '://([^/?#]*)', 1), '')) AS host,
    regexp_replace(
      coalesce(regexp_extract({u}, '://[^/?#]*([^?#]*)', 1), ''),
      '[0-9]+', 'N', 'g') AS path_tpl,
    coalesce(array_to_string(list_sort(list_filter(
      list_transform(string_split({q}, '&'),
                     p -> coalesce(regexp_extract(p, '^([^=]*)', 1), '')),
      n -> n <> '')), '&'), '') AS param_sig,
    {u} AS u, {fp_col} AS f
  FROM {src}
)
GROUP BY host, path_tpl, param_sig
"""


def trap_patterns(
    stats: DataFrame, min_urls: int = 100, min_ratio: float = 10.0
) -> DataFrame:
    """Flagged trap patterns from :func:`url_trap_stats` output —
    the frontier exclusion feed (compose with
    `jobs/frontier.py` / `filter_blocked_domains` the same way
    blocklists do)."""
    return stats.filter(
        (F.col("n_urls") >= min_urls) & (F.col("trap_ratio") >= min_ratio)
    )
