"""Event-stream relational operators: gap-based sessionization, the
point-in-time (as-of) join, the ordered-sequence window funnel, and
cohort retention — the time-series primitives a clickstream /
crawl-telemetry warehouse needs that plain SQL joins don't express
well at scale.

Spark-first decomposition:

- `sessionize` is ONE user-key window pass (lag → gap flag → running
  sum = session ordinal) followed by a (user, session) aggregate.
  Only (user_id, epoch-micros, value) triples cross the two shuffles;
  at 10^12 events that's the minimum state the semantics permit.
  The streaming counterpart is `F.session_window` (see
  streaming/windowed.py); this batch operator matches its gap
  semantics (a session CLOSES when the next event is strictly more
  than `gap_secs` after the previous one).
- `asof_join` deliberately avoids both a range join (quadratic
  blow-up per key) and Spark's missing native ASOF: tag the two
  inputs, UNION them, and carry the most recent right-side payload
  forward with ``last(..., ignorenulls=True)`` over a
  (key, ts, tag) window — one shuffle, each row visited once,
  DuckDB's ASOF JOIN semantics (right ts <= left ts, latest wins)
  reproduced exactly.  Right rows order BEFORE left rows at equal
  timestamps, so an equal-ts quote is visible to the event.
- `window_funnel` (ClickHouse's ``windowFunnel``) is a per-step
  running-max DP over ONE user-key sort: step j's chain-start column
  is the running max of step j-1's over strictly-earlier events —
  maximizing the chain START time dominates every other chain, so
  the window check (last ts − start ≤ window) only binds at the
  claimed level.  k steps = k window passes REUSING one shuffle+sort;
  nothing quadratic, no self-joins.
- `retention` is the cohort matrix: first-`cohort_type` period per
  user, distinct (user, period) activity, one key join, one tiny
  per-(cohort, offset) aggregate.  Periods are integer arithmetic on
  epoch micros (`(t - t % L) / L`), exact in doubles and identical
  on both engines — no date_trunc/timezone dependence.

Timestamps compare as epoch MICROSECONDS on both engines
(`unix_micros` / `epoch_us`) so the oracle is
session-timezone-independent (the round-3 CDX advisory, applied here
from the start).

DuckDB twins mirror the same plans (lag/cumsum; union + last_value
IGNORE NULLS) rather than DuckDB's built-in ASOF JOIN, so the
algorithm itself — not just the answer — is cross-checked.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(df: DataFrame, ts_col: str):
    """Epoch-microseconds expression for a timestamp column of EITHER
    flavor, independent of session timezone AND of how the scan typed
    the column.  The parquet fixture stores NTZ micros
    (isAdjustedToUTC=false); depending on
    `spark.sql.parquet.inferTimestampNTZ.enabled` the scan surfaces it
    as TIMESTAMP_NTZ or (inference off) as TIMESTAMP whose *instant*
    is the raw stored micros — verified empirically on this pyspark
    build by rereading the fixture with inference disabled under
    America/New_York: `unix_micros` returns the identical stored
    value in both flavors, while an LTZ→NTZ cast would shift it by
    the session offset.  So: fixed-epoch NTZ timestampdiff for the
    NTZ flavor, raw `unix_micros` for the LTZ flavor — both equal the
    stored naive micros in every session TZ (pinned by
    test_sessionize_tz_flavor_invariant).  DuckDB's `epoch_us` on the
    naive timestamp agrees."""
    c = F.col(ts_col)
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            c,
        )
    return F.unix_micros(c)


# ------------------------------------------------------------- sessionize

def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_secs: int = 1800,
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Gap-based sessions: a new session starts when an event arrives
    strictly more than ``gap_secs`` after the user's previous event.
    Returns one row per (user, session ordinal): start/end micros,
    n_events, duration_secs, and (optionally) the rounded value sum.

    ``id_col`` breaks exact-timestamp ties deterministically.
    """
    gap_us = int(gap_secs) * 1_000_000
    t = _micros(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(t, F.col(id_col))
    new_sess = F.when(
        F.lag(t).over(w).isNull() | (t - F.lag(t).over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    tagged = events.select(
        F.col(user_col),
        t.alias("_t"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sess_n"),
        *([F.col(value_col)] if value_col else []),
    )
    aggs = [
        F.min("_t").alias("start_us"),
        F.max("_t").alias("end_us"),
        F.count("*").alias("n_events"),
        F.round((F.max("_t") - F.min("_t")) / 1e6, 6).alias("duration_secs"),
    ]
    if value_col:
        # Sum in DECIMAL(18,6): decimal addition is exact and therefore
        # independent of aggregation order (a double sum's last ulp
        # depends on partial-agg order, the one engine-divergence
        # surface a full-precision hash can see — r4 hardening).  The
        # double→decimal cast rounds at 6dp where both engines agree
        # (inputs are ~2-decimal values, 1e-15 from the boundary).
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value")
        )
    return tagged.groupBy(user_col, "sess_n").agg(*aggs)


def sessionize_sql(
    table: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_secs: int = 1800,
    value_col: Optional[str] = "value",
) -> str:
    """DuckDB twin of :func:`sessionize` (same lag → flag → cumsum)."""
    gap_us = int(gap_secs) * 1_000_000
    val_sel = f", {value_col}" if value_col else ""
    val_agg = (
        f", CAST(sum(CAST({value_col} AS DECIMAL(18,6))) AS DOUBLE)"
        " AS sum_value"
        if value_col
        else ""
    )
    return f"""
WITH flagged AS (
  SELECT {user_col}, _t{val_sel},
         CASE WHEN lag(_t) OVER w IS NULL
                   OR _t - lag(_t) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT *, epoch_us({ts_col}) AS _t FROM {table})
  WINDOW w AS (PARTITION BY {user_col} ORDER BY _t, {id_col})
),
tagged AS (
  SELECT {user_col}, _t{val_sel},
         sum(new_sess) OVER (PARTITION BY {user_col} ORDER BY _t
                             ROWS UNBOUNDED PRECEDING) AS sess_n
  FROM flagged
)
SELECT {user_col}, sess_n,
       min(_t) AS start_us, max(_t) AS end_us,
       count(*) AS n_events,
       round((max(_t) - min(_t)) / 1e6, 6) AS duration_secs{val_agg}
FROM tagged GROUP BY {user_col}, sess_n
"""


# -------------------------------------------------------------- asof join

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_tie: str,
) -> DataFrame:
    """Point-in-time join: for every left row, attach the right row
    with the LATEST ``right_ts`` <= ``left_ts`` for the same ``on``
    key (none → nulls).  ``right_cols`` are the carried payload
    columns (names must not collide with left's); ``right_tie``
    breaks equal right timestamps deterministically (highest wins,
    matching "latest record wins").

    One (key)-shuffle union-window plan; no range join, no per-key
    quadratic work, rows stream once through the window in timestamp
    order — the standard scalable ASOF plan.  Adds ``asof_ts_us``
    (the matched right timestamp) alongside the payload.
    """
    carried = list(right_cols) + ["asof_ts_us"]
    lt = _micros(left, left_ts)
    rt = _micros(right, right_ts)
    l_tagged = left.select(
        "*",
        lt.alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_cols],
        F.lit(None).cast("long").alias("asof_ts_us"),
    )
    r_tagged = right.select(
        F.col(on),
        rt.alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(right_tie).cast("long").alias("_tie"),
        *right_cols,
        rt.alias("asof_ts_us"),
    )
    for c in left.columns:
        if c != on:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    u = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_tag", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.select(
        *[c for c in left.columns],
        *[F.last(c, ignorenulls=True).over(w).alias(f"_c_{c}")
          for c in carried],
        "_tag",
    ).where(F.col("_tag") == 1)
    for c in carried:
        out = out.withColumn(c, F.col(f"_c_{c}"))
    return out.select(*left.columns, *carried)


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    on: str,
    left_ts: str,
    right_ts: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    right_tie: str,
) -> str:
    """DuckDB twin of :func:`asof_join`: the SAME union + last_value
    IGNORE NULLS plan (not DuckDB's native ASOF JOIN, so the
    algorithm is cross-checked; `left_cols` must list the left
    frame's columns with `on` included)."""
    other_left = [c for c in left_cols if c != on]
    carried = list(right_cols) + ["asof_ts_us"]
    l_nulls = ", ".join(f"NULL AS {c}" for c in right_cols)
    r_nulls = ", ".join(f"NULL AS {c}" for c in other_left)
    win = (
        f"OVER (PARTITION BY {on} ORDER BY _t, _tag, _tie "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    carry = ", ".join(
        f"last_value({c} IGNORE NULLS) {win} AS {c}" for c in carried
    )
    return f"""
WITH u AS MATERIALIZED (
  SELECT {", ".join(left_cols)}, epoch_us({left_ts}) AS _t,
         1 AS _tag, CAST(NULL AS BIGINT) AS _tie,
         {l_nulls}, CAST(NULL AS BIGINT) AS asof_ts_us
  FROM ({left_sql})
  UNION ALL BY NAME
  SELECT {on}, epoch_us({right_ts}) AS _t,
         0 AS _tag, CAST({right_tie} AS BIGINT) AS _tie,
         {r_nulls}, {", ".join(right_cols)},
         epoch_us({right_ts}) AS asof_ts_us
  FROM ({right_sql})
)
SELECT {", ".join(left_cols)}, {", ".join(carried)}
FROM (SELECT {", ".join(left_cols)}, {carry}, _tag FROM u)
WHERE _tag = 1
"""


# ---------------------------------------------------------- interval join


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    window_secs: int,
) -> DataFrame:
    """All (left, right) pairs with the same ``on`` key and
    ``0 <= right_ts - left_ts <= window_secs`` — the attribution /
    stream-correlation join (click within a day of the view, error
    within a minute of the deploy).

    A naive range join is a per-key cartesian scan — quadratic in the
    hot key's row count, the classic 100 TB blow-up. This is the
    BANDED decomposition instead: bucket both sides by
    ``trunc(ts / W)``, fan each LEFT row into its bucket and the next
    (2x map-only duplication), equi-join on (key, bucket), then apply
    the exact window predicate. For any pair within the window,
    ``trunc(rt/W) ∈ {trunc(lt/W), trunc(lt/W)+1}`` (adding one full W
    advances the truncated quotient by exactly 1), so every
    qualifying pair is found exactly once — no range scan, one narrow
    shuffle per side, and each join task sees only a 2W time slice of
    any key. The bucket arithmetic is the module's exact
    epoch-micros integer idiom; ``delta_us`` is emitted alongside the
    right payload columns (which must not collide with left's)."""
    if window_secs <= 0:
        raise ValueError(f"window_secs must be > 0, got {window_secs}")
    w_us = int(window_secs) * 1_000_000
    lt = _micros(left, left_ts)
    rt = _micros(right, right_ts)
    lb = ((lt - lt % w_us) / w_us).cast("bigint")
    rb = ((rt - rt % w_us) / w_us).cast("bigint")
    l = left.select(
        "*",
        lt.alias("_lt"),
        F.explode(F.array(lb, lb + 1)).alias("_bk"),
    )
    r = right.select(
        F.col(on).alias("_ron"),
        rt.alias("_rt"),
        rb.alias("_rbk"),
        *right_cols,
    )
    delta = F.col("_rt") - F.col("_lt")
    return (
        l.join(
            r,
            (l[on] == r["_ron"]) & (F.col("_bk") == F.col("_rbk")),
        )
        .where((delta >= 0) & (delta <= w_us))
        .select(*left.columns, *right_cols, delta.alias("delta_us"))
    )


def interval_join_sql(
    left_sql: str,
    right_sql: str,
    on: str,
    left_ts: str,
    right_ts: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    window_secs: int,
) -> str:
    """DuckDB twin of :func:`interval_join`: the NAIVE range join the
    banded plan is provably equal to (`left_cols` lists the left
    frame's output columns including `on`)."""
    w_us = int(window_secs) * 1_000_000
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    rsel = ", ".join(f"r.{c}" for c in right_cols)
    return f"""
SELECT {lsel}, {rsel},
       epoch_us(r.{right_ts}) - epoch_us(l.{left_ts}) AS delta_us
FROM ({left_sql}) l JOIN ({right_sql}) r
  ON l.{on} = r.{on}
 AND epoch_us(r.{right_ts}) - epoch_us(l.{left_ts}) BETWEEN 0 AND {w_us}
"""


# ---------------------------------------------------------- window funnel

def window_funnel(
    events: DataFrame,
    steps: Sequence[str],
    window_secs: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """ClickHouse-style ``windowFunnel``: per user, the deepest prefix
    of ``steps`` completed by STRICTLY-ordered events (order =
    (ts, id), so equal timestamps break deterministically and one
    event can't serve two steps) whose total span fits in
    ``window_secs`` of the chain's first event.  Returns
    (user, funnel_level) for every user present in ``events``;
    level 0 = never performed ``steps[0]``.

    Plan: one user-key shuffle + sort; step j adds a running-max
    window column (the latest possible chain start reaching level j),
    all passes reusing the same sort.  Maximizing the start time is
    the dominating DP choice, so the window constraint is checked
    once per level at the end.  Per-event state is one bigint per
    step — nothing quadratic, no self-joins, skew bounded by the
    busiest single user like any sessionization.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    win_us = int(window_secs) * 1_000_000
    t = _micros(events, ts_col)
    df = events.select(
        F.col(user_col),
        t.alias("_t"),
        F.col(type_col).alias("_ty"),
        F.col(id_col).alias("_id"),
    ).withColumn("_s1", F.when(F.col("_ty") == steps[0], F.col("_t")))
    w_prev = (
        Window.partitionBy(user_col)
        .orderBy("_t", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for j in range(2, k + 1):
        df = df.withColumn(
            f"_s{j}",
            F.when(
                F.col("_ty") == steps[j - 1],
                F.max(f"_s{j - 1}").over(w_prev),
            ),
        )
    # the achieved level per event: one CASE from deepest to shallowest
    level = None
    for j in range(k, 0, -1):
        cond = F.col(f"_s{j}").isNotNull() & (
            F.col("_t") - F.col(f"_s{j}") <= win_us
        )
        level = F.when(cond, F.lit(j)) if level is None else level.when(
            cond, F.lit(j)
        )
    level = level.otherwise(F.lit(0))
    return df.groupBy(user_col).agg(F.max(level).alias("funnel_level"))


def window_funnel_sql(
    table: str,
    steps: Sequence[str],
    window_secs: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`window_funnel` (same per-step running-max
    DP, unrolled as CTE stages)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    win_us = int(window_secs) * 1_000_000
    ctes = [
        f"base AS MATERIALIZED (SELECT {user_col}, epoch_us({ts_col}) AS _t, "
        f"{type_col} AS _ty, {id_col} AS _id FROM {table})",
        f"s1 AS (SELECT {user_col}, _t, _ty, _id, "
        f"CASE WHEN _ty = '{steps[0]}' THEN _t END AS _s1 FROM base)",
    ]
    for j in range(2, k + 1):
        ctes.append(
            f"s{j} AS (SELECT *, CASE WHEN _ty = '{steps[j - 1]}' THEN "
            f"max(_s{j - 1}) OVER (PARTITION BY {user_col} "
            f"ORDER BY _t, _id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END "
            f"AS _s{j} FROM s{j - 1})"
        )
    case = " ".join(
        f"WHEN _s{j} IS NOT NULL AND _t - _s{j} <= {win_us} THEN {j}"
        for j in range(k, 0, -1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {user_col}, max(CASE {case} ELSE 0 END) AS funnel_level"
        + f"\nFROM s{k} GROUP BY {user_col}"
    )


# --------------------------------------------------------------- retention

def _period(t, period_days: int):
    """Exact integer period index from epoch micros: (t - t % L) / L
    is a multiple-of-L divided by L — both steps exact in a double
    for any realistic timestamp (quotient << 2^53), and the identical
    expression runs on DuckDB, so no date_trunc/session-timezone
    dependence.  Period 0 starts at the 1970-01-01 epoch."""
    lus = int(period_days) * 86_400_000_000
    return ((t - t % lus) / lus).cast("long")


def retention(
    events: DataFrame,
    cohort_type: str = "signup",
    active_types: Optional[Sequence[str]] = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST ``cohort_type`` event; a cohort member is retained at
    offset k if they have any qualifying event in cohort period + k
    (``active_types`` None = every event type qualifies).  Returns
    (cohort_p, period_offset, active_users, cohort_users,
    retention_rate).

    Plan: one first-event aggregate, one distinct over (user, period)
    — both narrow bigint pairs — a key join, and a per-(cohort,
    offset) count whose output is bounded by periods² rows; the
    cohort-size side of the final join is broadcast.  Texts/props
    never move.
    """
    t = _micros(events, ts_col)
    p = _period(t, period_days)
    cohorts = (
        events.where(F.col(type_col) == cohort_type)
        .groupBy(user_col)
        .agg(F.min(p).alias("cohort_p"))
    )
    act = events
    if active_types is not None:
        act = act.where(F.col(type_col).isin(list(active_types)))
    activity = act.select(F.col(user_col), p.alias("_p")).distinct()
    sizes = cohorts.groupBy("cohort_p").agg(
        F.count("*").alias("cohort_users")
    )
    hits = (
        activity.join(cohorts, user_col)
        .where(F.col("_p") >= F.col("cohort_p"))
        .groupBy(
            "cohort_p",
            (F.col("_p") - F.col("cohort_p")).alias("period_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    return hits.join(F.broadcast(sizes), "cohort_p").select(
        "cohort_p",
        "period_offset",
        "active_users",
        "cohort_users",
        F.round(
            F.col("active_users") / F.col("cohort_users"), 6
        ).alias("retention_rate"),
    )


def retention_sql(
    table: str,
    cohort_type: str = "signup",
    active_types: Optional[Sequence[str]] = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    period_days: int = 7,
) -> str:
    """DuckDB twin of :func:`retention` (identical period arithmetic)."""
    lus = int(period_days) * 86_400_000_000
    p = (
        f"CAST((epoch_us({ts_col}) - epoch_us({ts_col}) % {lus}) "
        f"/ {lus} AS BIGINT)"
    )
    act_where = ""
    if active_types is not None:
        quoted = ", ".join(f"'{a}'" for a in active_types)
        act_where = f"WHERE {type_col} IN ({quoted})"
    return f"""
WITH cohorts AS MATERIALIZED (
  SELECT {user_col}, min({p}) AS cohort_p
  FROM {table} WHERE {type_col} = '{cohort_type}'
  GROUP BY {user_col}
),
activity AS (
  SELECT DISTINCT {user_col}, {p} AS _p FROM {table} {act_where}
),
sizes AS (
  SELECT cohort_p, count(*) AS cohort_users FROM cohorts GROUP BY cohort_p
),
hits AS (
  SELECT cohort_p, _p - cohort_p AS period_offset, count(*) AS active_users
  FROM activity JOIN cohorts USING ({user_col})
  WHERE _p >= cohort_p
  GROUP BY 1, 2
)
SELECT cohort_p, period_offset, active_users, cohort_users,
       round(active_users / CAST(cohort_users AS DOUBLE), 6)
         AS retention_rate
FROM hits JOIN sizes USING (cohort_p)
"""
