"""robots.txt source + politeness gate (RFC 9309, the Robots
Exclusion Protocol).

A crawl pipeline fetches ``/robots.txt`` once per host and gates every
candidate URL through it BEFORE scheduling a fetch — at 10^12 planned
fetches the gate must be a table operation, not a per-URL library
call.  Two operators:

- :func:`parse_robots`: (host, robots_txt) → a typed rules table
  (host, group_id, agent, rule, path).  Parsing is fully NATIVE
  (split + posexplode + regexp + one running-sum window): lines are
  comment-stripped, ``user-agent`` lines open a group (consecutive
  user-agent lines share their group per RFC 9309 §2.2.1), and each
  allow/disallow line joins every agent of its group.  Rules that
  precede any user-agent line are invalid per spec and drop out
  naturally (their group has no agents).  Empty ``Disallow:`` — the
  classic "allow everything" idiom — is a no-op and is dropped.
- :func:`robots_allowed`: pages × rules → per-URL verdict.  Group
  choice per RFC: if the host has rules for the SPECIFIC agent, only
  that group applies, else the ``*`` group.  Match semantics are the
  RFC's path-prefix rule with longest-match-wins and allow-wins-ties
  (§2.2.2); the optional ``*``/``$`` wildcard extension (RFC §2.2.3
  "crawlers MAY support") is out of scope — wildcard characters match
  literally, as in the original 1994 REP.

Scale design: robots bodies are KB-sized and one-per-host, so the
parse is a narrow per-host pass; the gate is one equi-join on host
(broadcast the rules table — even 100M hosts × a handful of rules is
GBs, not TBs) followed by a per-URL window whose partitions are the
handful of matching rules per URL, never whole hosts.

Reference parity: none (the reference has no crawl tier); semantics
per the public RFC 9309.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: directives the parser keeps (sitemap/crawl-delay are extensions a
#: caller can pull from the pre-filter stage if needed).
DIRECTIVES = ("user-agent", "allow", "disallow")


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies → rules table (host, group_id, agent, rule,
    path), one row per (agent × allow/disallow line) of each group."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    directives = (
        lines.select(
            "host",
            "line_no",
            F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1))).alias(
                "key"
            ),
            F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("val"),
        )
        .where(F.col("key").isin(*DIRECTIVES))
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("key") == "user-agent"
    # two steps: lag and running sum are both window functions and may
    # not nest inside one expression.
    grouped = (
        directives.withColumn(
            "_new_group",
            (
                is_ua
                & (F.coalesce(F.lag("key").over(w), F.lit(""))
                   != "user-agent")
            ).cast("int"),
        )
        .withColumn(
            "group_id",
            F.sum("_new_group").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    agents = grouped.where(is_ua).select(
        "host", "group_id", F.lower(F.col("val")).alias("agent")
    )
    rules = grouped.where(~is_ua & (F.col("val") != "")).select(
        "host", "group_id", F.col("key").alias("rule"),
        F.col("val").alias("path"),
    )
    return agents.join(rules, ["host", "group_id"])


def parse_robots_sql(
    table: str, host_col: str = "host", text_col: str = "robots_txt"
) -> str:
    """DuckDB twin of :func:`parse_robots` (same spec, DuckDB
    positional-unnest + window dialect)."""
    return f"""
WITH lines AS (
  SELECT host, ls,
         unnest(generate_series(1, len(ls))) AS line_no
  FROM (SELECT {host_col} AS host,
               string_split({text_col}, chr(10)) AS ls
        FROM {table})
), directives AS (
  SELECT host, line_no,
         lower(trim(regexp_extract(clean, '^([^:]+):', 1))) AS key,
         trim(regexp_extract(clean, '^[^:]+:(.*)$', 1)) AS val
  FROM (SELECT host, line_no,
               trim(regexp_replace(ls[line_no], '#.*$', '')) AS clean
        FROM lines)
  WHERE lower(trim(regexp_extract(clean, '^([^:]+):', 1)))
        IN ('user-agent', 'allow', 'disallow')
), flagged AS (
  SELECT *,
    CASE WHEN key = 'user-agent'
          AND coalesce(lag(key) OVER (PARTITION BY host
                                      ORDER BY line_no), '')
              <> 'user-agent'
     THEN 1 ELSE 0 END AS new_group
  FROM directives
), grouped AS (
  SELECT *,
    SUM(new_group) OVER (PARTITION BY host ORDER BY line_no
                         ROWS UNBOUNDED PRECEDING) AS group_id
  FROM flagged
)
SELECT a.host, a.group_id, a.agent, r.rule, r.path
FROM (SELECT host, group_id, lower(val) AS agent
      FROM grouped WHERE key = 'user-agent') a
JOIN (SELECT host, group_id, key AS rule, val AS path
      FROM grouped WHERE key <> 'user-agent' AND val <> '') r
USING (host, group_id)
"""


#: host + path extraction for the gate (same regex on both engines).
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(/[^?#]*)?"


def robots_allowed(
    pages: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Per-URL politeness verdict for ``agent``: (url, allowed,
    matched_rule, matched_path).  No applicable group or no matching
    rule → allowed (RFC default-allow)."""
    agent = agent.lower()
    r = rules.where((F.col("agent") == agent) | (F.col("agent") == "*"))
    # RFC group choice: the specific agent's group shadows '*'
    # entirely for its host.
    spec = r.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("_has_spec")
    )
    r = (
        r.join(spec, "host")
        .where((F.col("agent") == agent).cast("int") == F.col("_has_spec"))
        .select("host", "rule", F.col("path").alias("rule_path"))
    )
    if broadcast_rules:
        r = F.broadcast(r)
    p = pages.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(url_col, _HOST_RE, 1)).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, _PATH_RE, 1), F.lit("")),
            F.lit("/"),
        ).alias("_path"),
    )
    joined = p.join(
        r,
        (p["host"] == r["host"])
        & F.col("_path").startswith(F.col("rule_path")),
        "left",
    )
    w = Window.partitionBy("url").orderBy(
        F.desc(F.length("rule_path")), F.asc("rule")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "url",
            (F.col("rule").isNull() | (F.col("rule") == "allow")).alias(
                "allowed"
            ),
            F.col("rule").alias("matched_rule"),
            F.col("rule_path").alias("matched_path"),
        )
    )


def robots_allowed_sql(
    pages_table: str, rules_sql: str, agent: str = "*",
    url_col: str = "url",
) -> str:
    """DuckDB twin of :func:`robots_allowed`; ``rules_sql`` is a
    subquery producing the rules table (host, agent, rule, path)."""
    agent = agent.lower()
    return f"""
WITH r0 AS (
  SELECT * FROM ({rules_sql})
  WHERE agent IN ('{agent}', '*')
), spec AS (
  SELECT host,
         max(CASE WHEN agent = '{agent}' THEN 1 ELSE 0 END) AS has_spec
  FROM r0 GROUP BY host
), r AS (
  SELECT r0.host, r0.rule, r0.path AS rule_path
  FROM r0 JOIN spec USING (host)
  WHERE CASE WHEN r0.agent = '{agent}' THEN 1 ELSE 0 END = spec.has_spec
), p AS (
  SELECT {url_col} AS url,
         lower(coalesce(regexp_extract({url_col},
           '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/:?#]*)', 1), '')) AS host,
         coalesce(nullif(regexp_extract({url_col},
           '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]*(/[^?#]*)?', 1), ''),
           '/') AS path
  FROM {pages_table}
), joined AS (
  SELECT p.url, r.rule, r.rule_path,
         row_number() OVER (
           PARTITION BY p.url
           ORDER BY length(r.rule_path) DESC, r.rule ASC
         ) AS rn
  FROM p LEFT JOIN r
    ON p.host = r.host AND starts_with(p.path, r.rule_path)
)
SELECT url,
       (rule IS NULL OR rule = 'allow') AS allowed,
       rule AS matched_rule,
       rule_path AS matched_path
FROM joined WHERE rn = 1
"""


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url): the `Sitemap:` directives — robots.txt is
    how a crawler DISCOVERS a site's sitemaps (sitemaps.org protocol:
    the directive is GROUP-INDEPENDENT, so no user-agent machinery
    applies); feeds sources/sitemaps.py::parse_sitemaps and from
    there jobs/frontier.py. Map-only: line split + key/val regexp,
    distinct per (host, url)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    key = F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1)))
    # the value is a URL and contains ':' — split on the FIRST colon
    val = F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1))
    return (
        lines.select("host", key.alias("k"), val.alias("sitemap_url"))
        .where((F.col("k") == "sitemap") & (F.col("sitemap_url") != ""))
        .select("host", "sitemap_url")
        .distinct()
    )


def robots_sitemaps_sql(
    table: str, host_col: str = "host", text_col: str = "robots_txt"
) -> str:
    """DuckDB twin of :func:`robots_sitemaps`."""
    return f"""
SELECT DISTINCT host, sitemap_url FROM (
  SELECT {host_col} AS host,
         lower(trim(regexp_extract(clean, '^([^:]+):', 1))) AS k,
         trim(regexp_extract(clean, '^[^:]+:(.*)$', 1)) AS sitemap_url
  FROM (
    SELECT {host_col},
           trim(regexp_replace(unnest(string_split({text_col}, chr(10))),
                               '#.*$', '')) AS clean
    FROM {table}
  ) t
) x WHERE k = 'sitemap' AND sitemap_url <> ''"""


def crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, delay_secs): the effective `Crawl-delay` for ``agent``
    — the de-facto extension honored by most crawlers (not in RFC
    9309 itself; Yandex/Bing semantics). Group resolution matches
    :func:`robots_allowed`: the directive belongs to the §2.2.1
    consecutive-user-agent group it appears in, a specific agent's
    group shadows '*' entirely, and when several applicable groups
    carry delays the MAX wins (conservative politeness). Non-numeric
    values drop. Hosts without an applicable delay emit no row —
    the frontier's pacing default applies."""
    agent = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    # group over ALL group-forming directive lines (user-agent, allow,
    # disallow, crawl-delay) exactly like parse_robots: an allow/
    # disallow line between two user-agent blocks TERMINATES the first
    # group, so filtering to {user-agent, crawl-delay} before grouping
    # would merge adjacent groups and leak one group's delay into
    # another's agents (round-4 advisor repro: a specific agent
    # inheriting '*'-group's Crawl-delay across an intervening
    # Disallow line). Keys are filtered AFTER group_id is assigned.
    directives = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("val"),
    ).where(F.col("key").isin(*DIRECTIVES, "crawl-delay"))
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("key") == "user-agent"
    grouped = (
        directives.withColumn(
            "_new_group",
            (
                is_ua
                & (F.coalesce(F.lag("key").over(w), F.lit(""))
                   != "user-agent")
            ).cast("int"),
        )
        .withColumn(
            "group_id",
            F.sum("_new_group").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    agents = grouped.where(is_ua).select(
        "host", "group_id", F.lower(F.col("val")).alias("agent")
    )
    delays = grouped.where(
        (F.col("key") == "crawl-delay")
        & F.col("val").rlike(r"^[0-9]+(\.[0-9]+)?$")
    ).select(
        "host", "group_id", F.col("val").cast("double").alias("delay")
    )
    applicable = agents.where(
        (F.col("agent") == agent) | (F.col("agent") == "*")
    )
    # shadowing is decided by GROUP MEMBERSHIP, not by delay presence:
    # when any group names the agent specifically, '*' groups are out
    # of play even if the specific groups carry no Crawl-delay (then
    # no row is emitted at all) — RFC 9309 §2.2.1 group selection.
    spec = applicable.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("_has_spec")
    )
    d = applicable.join(delays, ["host", "group_id"])
    return (
        d.join(spec, "host")
        .where((F.col("agent") == agent).cast("int") == F.col("_has_spec"))
        .groupBy("host")
        .agg(F.max("delay").alias("delay_secs"))
    )


def crawl_delays_sql(
    table: str,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> str:
    """DuckDB twin of :func:`crawl_delays`."""
    agent = agent.lower().replace("'", "''")
    return f"""
WITH lines AS (
  SELECT host, ls, unnest(generate_series(1, len(ls))) AS line_no
  FROM (SELECT {host_col} AS host,
               string_split({text_col}, chr(10)) AS ls FROM {table})
), directives AS (
  SELECT host, line_no,
         lower(trim(regexp_extract(clean, '^([^:]+):', 1))) AS key,
         trim(regexp_extract(clean, '^[^:]+:(.*)$', 1)) AS val
  FROM (SELECT host, line_no,
               trim(regexp_replace(ls[line_no], '#.*$', '')) AS clean
        FROM lines)
  WHERE lower(trim(regexp_extract(clean, '^([^:]+):', 1)))
        IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
), flagged AS (
  SELECT *, CASE WHEN key = 'user-agent'
        AND coalesce(lag(key) OVER (PARTITION BY host ORDER BY line_no),
                     '') <> 'user-agent'
     THEN 1 ELSE 0 END AS new_group
  FROM directives
), grouped AS (
  SELECT *, SUM(new_group) OVER (PARTITION BY host ORDER BY line_no
                                 ROWS UNBOUNDED PRECEDING) AS group_id
  FROM flagged
), applicable AS (
  SELECT host, group_id, lower(val) AS agent
  FROM grouped WHERE key = 'user-agent'
    AND (lower(val) = '{agent}' OR lower(val) = '*')
), spec AS (
  -- group MEMBERSHIP decides shadowing (a specific group with no
  -- delay still silences '*'), matching the Spark operator
  SELECT host, MAX(CASE WHEN agent = '{agent}' THEN 1 ELSE 0 END)
           AS has_spec
  FROM applicable GROUP BY host
), d AS (
  SELECT a.host, a.agent, dl.delay
  FROM applicable a
  JOIN (SELECT host, group_id, CAST(val AS DOUBLE) AS delay
        FROM grouped WHERE key = 'crawl-delay'
          AND regexp_matches(val, '^[0-9]+(\\.[0-9]+)?$')) dl
  USING (host, group_id)
)
SELECT d.host, MAX(d.delay) AS delay_secs
FROM d JOIN spec USING (host)
WHERE CASE WHEN d.agent = '{agent}' THEN 1 ELSE 0 END = spec.has_spec
GROUP BY d.host"""
