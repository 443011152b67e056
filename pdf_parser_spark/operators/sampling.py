"""Deterministic sampling operators for the training-data pipeline.

The reference app is a per-request parser with no corpus operations;
these operators cover the subsampling step every large-scale training
pipeline needs between dedup and training: draw a reproducible fraction
of the corpus (ablations, held-out splits) and enforce per-stratum
quotas (e.g. per-language token budgets per the data-mixing literature).

Both operators are DETERMINISTIC functions of the data — no RNG state,
no Spark `sample()` (whose output depends on partitioning and seed
plumbing) — so results are reproducible across runs, cluster sizes,
and engines, and each has an exact DuckDB twin in `__spark_entry__`.

The randomness source is the shared md5→int idiom used by the dedup
tier (operators/dedup.py:121): the first 15 hex chars of
md5(key || salt) as a bigint is a uniform draw from [0, 16^15), and
both engines compute it bit-identically (Spark `conv`, DuckDB
`'0x' || substring` cast). Comparisons stay in INTEGER space — the
keep-threshold is precomputed as `int(rate * 16**15)` — so no float
crosses an engine boundary.

Scale notes (100 TB):
- `hash_sample` is a map-only narrow filter: no shuffle, no state,
  prunable columns reach the scan untouched.
- `stratified_sample` takes exact per-key top-n by hash order WITHOUT
  sorting whole strata: a broadcast per-key count computes an
  oversampled hash threshold, the full table is filtered map-side to
  ~oversample*n survivors per key, and only survivors enter the
  rank window. A window partitioned by a skewed key would otherwise
  sort that key's entire stratum in ONE task — at 10^12 rows with an
  80% `en` stratum that is the job. Keys whose survivor count falls
  short (hash fluctuation) fall back to their full stratum, so the
  result is EXACTLY the true top-n per key, not an approximation —
  the DuckDB twin is the plain window over the whole table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persisted

#: md5-prefix draw space: 15 hex chars < 2^60, safely inside int64.
HASH_SPACE = 16 ** 15


def hash_draw(col: Column, salt: str = "") -> Column:
    """Uniform bigint draw in [0, 16^15) — a pure function of
    (value, salt), identical in DuckDB via :func:`hash_draw_sql`."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15),
        16, 10,
    ).cast("bigint")


def hash_draw_sql(col: str, salt: str = "") -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({col} AS VARCHAR) || '{salt}'), "
        f"1, 15)) AS BIGINT)"
    )


def keep_threshold(rate: float) -> int:
    """Integer keep-threshold for `rate` — computed once driver-side so
    both engines compare against the same int literal."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * HASH_SPACE)


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "",
) -> DataFrame:
    """Keep a deterministic ~`rate` fraction of rows: row survives iff
    hash_draw(key, salt) < int(rate * 16^15).

    Changing `salt` yields an independent draw (disjoint-looking
    subsets for ablations); the same (key, salt) always lands on the
    same side, so reruns, resumes, and downstream joins see a stable
    subset. Map-only — no shuffle at any scale.
    """
    return df.where(hash_draw(F.col(key_col), salt) < keep_threshold(rate))


def hash_sample_sql(
    table: str, rate: float, key_col: str = "doc_id", salt: str = "",
    columns: str = "*",
) -> str:
    return (
        f"SELECT {columns} FROM {table} "
        f"WHERE {hash_draw_sql(key_col, salt)} < {keep_threshold(rate)}"
    )


def split_cutpoints(fractions: dict) -> list:
    """Cumulative integer cut points for a labeled partition of the
    hash space — computed once driver-side, so both engines compare
    against identical int literals.  Fractions must sum to 1 (the last
    label absorbs integer-rounding residue up to HASH_SPACE)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    cuts, acc = [], 0.0
    labels = list(fractions)
    for label in labels[:-1]:
        if fractions[label] <= 0:
            raise ValueError(f"fraction for {label!r} must be positive")
        acc += fractions[label]
        cuts.append((label, int(acc * HASH_SPACE)))
    cuts.append((labels[-1], HASH_SPACE))
    return cuts


def dataset_split(
    df: DataFrame,
    fractions: dict,
    key_col: str = "doc_id",
    salt: str = "split",
    label_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: label each row by
    where hash_draw(key, salt) falls among the cumulative cut points.

    The assignment is a pure function of (key, salt) — stable under
    corpus growth, resumes, repartitioning, and cluster size, so a
    document can NEVER migrate between splits across pipeline runs
    (the property `randomSplit` lacks).  Leakage control is the
    caller's choice of `key_col`: key by the dedup identity
    (canonical url, content fingerprint) and near-identical documents
    land on the same side of the split.  Map-only — no shuffle.
    """
    cuts = split_cutpoints(fractions)
    draw = hash_draw(F.col(key_col), salt)
    expr = F.lit(cuts[-1][0])
    for label, cut in reversed(cuts[:-1]):
        expr = F.when(draw < cut, F.lit(label)).otherwise(expr)
    return df.withColumn(label_col, expr)


def dataset_split_sql(
    table: str,
    fractions: dict,
    key_col: str = "doc_id",
    salt: str = "split",
    label_col: str = "split",
    columns: str = "*",
) -> str:
    cuts = split_cutpoints(fractions)
    draw = hash_draw_sql(key_col, salt)
    whens = " ".join(
        f"WHEN {draw} < {cut} THEN '{label}'" for label, cut in cuts[:-1]
    )
    return (
        f"SELECT {columns}, CASE {whens} ELSE '{cuts[-1][0]}' END "
        f"AS {label_col} FROM {table}"
    )


def stratified_sample(
    df: DataFrame,
    n_per_key: int,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    oversample: float = 2.0,
    keys_broadcast_limit: int = 100_000,
) -> DataFrame:
    """Exact deterministic top-`n_per_key` rows per `key_col` stratum,
    ranked by hash_draw(id, salt) with `id_col` as the tie-break.

    Equivalent by construction to the naive
    `row_number() OVER (PARTITION BY key ORDER BY draw, id) <= n`
    (the DuckDB twin runs exactly that), but never sorts a full
    stratum: survivors of a per-key hash threshold
    (~`oversample * n_per_key` rows expected per key) are ranked, and
    any key whose survivors undershoot its quota falls back to its
    full stratum — rare (P ~ exp(-n·(o-1)²/(o+1)) per key by Chernoff)
    but required for exactness. A NULL `key_col` is one stratum of its
    own, exactly as the plain window (and the DuckDB twin) treats it —
    the threshold join is null-safe.

    `keys_broadcast_limit` bounds the driver-side collect of per-key
    counts (collected once; as DataFrame references the count agg —
    and its table SCAN — would re-run per consuming branch): beyond
    it the key cardinality is high enough that plain windowing has no
    skewed stratum to fear — the guard raises so the caller decides,
    instead of silently pulling a giant count table to the driver.
    """
    if n_per_key < 1:
        raise ValueError(f"n_per_key must be >= 1, got {n_per_key}")
    draw = hash_draw(F.col(id_col), salt)
    tagged = df.withColumn("_draw", draw)

    # Per-key counts collected ONCE driver-side (bounded by the guard
    # below — the same pattern as the job lineage / IVF codebook
    # collects). Referencing a counts DataFrame from the downstream
    # branches instead would re-run the full-table aggregation — and
    # its SCAN — once per reference (measured: 5 table scans in the
    # naive plan); as a local relation it costs the plan nothing.
    cnt_rows = (
        tagged.groupBy(key_col).agg(F.count("*").alias("_cnt"))
        .limit(keys_broadcast_limit + 1).collect()
    )
    if len(cnt_rows) > keys_broadcast_limit:
        raise ValueError(
            f"stratified_sample: > {keys_broadcast_limit} strata; "
            "per-key counts no longer driver-collectable — use a plain "
            "window (no single stratum can dominate at this cardinality)"
        )
    counts = {r[key_col]: r["_cnt"] for r in cnt_rows}
    # integer threshold per key: min(HASH_SPACE, ceil-free conservative
    # oversample * n / cnt * HASH_SPACE) — pure int comparisons on the
    # executors, no float in the filter.
    thresholds = {
        k: min(HASH_SPACE,
               int(float(HASH_SPACE) * oversample * n_per_key / c) + 1)
        for k, c in counts.items()
    }
    spark = df.sparkSession
    # NULL is a legitimate stratum (the plain-window DuckDB twin keeps
    # it): the threshold frame carries the key's real type via an
    # explicit schema and the join is NULL-SAFE equality (still a
    # broadcast hash equi-join) — a plain equi-join would silently drop
    # every NULL-key row.
    from pyspark.sql.types import LongType, StructField, StructType

    key_field = df.schema[key_col]
    thr_df = spark.createDataFrame(
        [(k, t) for k, t in thresholds.items()],
        StructType([
            StructField("_thr_key", key_field.dataType, True),
            StructField("_thr", LongType(), False),
        ]),
    )
    surv = persisted(
        tagged.join(
            F.broadcast(thr_df),
            F.col(key_col).eqNullSafe(F.col("_thr_key")),
        )
        .where(F.col("_draw") < F.col("_thr"))
        .drop("_thr_key", "_thr")
    )

    # keys whose survivors undershoot min(n, cnt) fall back to their
    # full stratum — rare, so the common case never re-scans the table
    scnt = {
        r[key_col]: r["_scnt"]
        for r in surv.groupBy(key_col).agg(F.count("*").alias("_scnt"))
        .collect()
    }
    deficient = [
        k for k, c in counts.items()
        if scnt.get(k, 0) < min(c, n_per_key)
    ]
    pool = surv
    if deficient:
        if len(deficient) <= 256:
            # literal IN-filter pushes to the parquet scan. The
            # predicate is made null-safe BOOLEAN (coalesce to false):
            # a bare isin() returns NULL for NULL-key rows, and
            # `~NULL` would silently drop them from the pool.
            vals = [k for k in deficient if k is not None]
            pred = (
                F.coalesce(F.col(key_col).isin(vals), F.lit(False))
                if vals else F.lit(False)
            )
            if any(k is None for k in deficient):
                pred = pred | F.col(key_col).isNull()
            fallback = tagged.where(pred)
            pool = surv.where(~pred)
        else:
            dd = F.broadcast(
                spark.createDataFrame(
                    [(k,) for k in deficient],
                    StructType([
                        StructField("_dk", key_field.dataType, True)
                    ]),
                )
            )
            cond = F.col(key_col).eqNullSafe(F.col("_dk"))
            fallback = tagged.join(dd, cond, "left_semi")
            pool = surv.join(dd, cond, "left_anti")
        pool = pool.unionByName(fallback.select(*pool.columns))

    w = Window.partitionBy(key_col).orderBy(F.col("_draw"), F.col(id_col))
    return (
        pool.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_key)
        .drop("_draw", "_rn")
    )


def mix_thresholds(
    counts: dict, weights: dict, strict: bool = True
) -> dict:
    """Per-stratum integer keep-thresholds realizing the target mix.

    `weights` are relative target proportions per stratum (they are
    normalized here); `counts` the available rows per stratum. The
    output corpus is the LARGEST one with exactly the target
    proportions: total T = min_s(count_s / w_s), keep-rate_s =
    w_s * T / count_s (the binding stratum keeps everything, the rest
    downsample). Thresholds are floor(rate * 16^15) — the same IEEE
    double expression the DuckDB twin evaluates, so both engines keep
    bit-identical row sets.
    """
    import math

    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    missing = [s for s in weights if counts.get(s, 0) <= 0]
    if missing:
        if strict:
            raise ValueError(
                f"mix infeasible: no rows for strata {sorted(missing)}"
            )
        weights = {s: w for s, w in weights.items() if s not in missing}
        if not weights:
            return {}
    tot = float(sum(weights.values()))
    wn = {s: w / tot for s, w in weights.items()}
    t_total = min(counts[s] / wn[s] for s in wn)
    return {
        s: int(math.floor(wn[s] * t_total / counts[s] * HASH_SPACE))
        for s in wn
    }


def mix_corpus(
    df: DataFrame,
    weights: dict,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    keys_broadcast_limit: int = 100_000,
) -> DataFrame:
    """Source-weighted deterministic downsampling — the data-mixing
    stage between dedup and training (Pile/Dolma-style): keep the
    largest subcorpus whose per-stratum proportions equal `weights`.
    Strata absent from `weights` are dropped.

    One pruned pass for the per-stratum counts (collected driver-side,
    bounded like `stratified_sample`'s), then a map-side broadcast
    join + integer hash-threshold filter — no shuffle of the kept
    rows, reproducible at any cluster size.
    """
    cnt_rows = (
        df.groupBy(key_col).agg(F.count("*").alias("_cnt"))
        .limit(keys_broadcast_limit + 1).collect()
    )
    if len(cnt_rows) > keys_broadcast_limit:
        raise ValueError(
            f"mix_corpus: > {keys_broadcast_limit} strata; aggregate "
            "to a coarser key before mixing"
        )
    counts = {r[key_col]: r["_cnt"] for r in cnt_rows}
    thresholds = mix_thresholds(counts, weights)
    spark = df.sparkSession
    thr_df = spark.createDataFrame(
        [(k, t) for k, t in thresholds.items()], [key_col, "_thr"]
    )
    return (
        df.join(F.broadcast(thr_df), key_col)
        .where(hash_draw(F.col(id_col), salt) < F.col("_thr"))
        .drop("_thr")
    )


def mix_corpus_sql(
    table: str,
    weights: dict,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    columns: str = "*",
) -> str:
    """DuckDB twin of :func:`mix_corpus`: computes the SAME thresholds
    from the SAME counts with the SAME double expression shape
    (w*T/count*16^15, floored), so the kept row set is bit-identical.
    `weights` must be the same dict passed to the Spark side
    (normalized weights are embedded as full-precision literals)."""
    tot = float(sum(weights.values()))
    vals = ", ".join(
        f"('{s}', {w / tot!r})" for s, w in sorted(weights.items())
    )
    return f"""
WITH w(k, wn) AS (VALUES {vals}),
cnt AS (
  SELECT {key_col} AS k, CAST(count(*) AS DOUBLE) AS c
  FROM {table} GROUP BY {key_col}
),
tt AS (SELECT MIN(c / wn) AS t FROM cnt JOIN w USING (k)),
thr AS (
  SELECT k, CAST(floor(wn * (SELECT t FROM tt) / c * {HASH_SPACE}.0)
              AS BIGINT) AS thr
  FROM cnt JOIN w USING (k)
)
SELECT {columns} FROM {table} d JOIN thr ON d.{key_col} = thr.k
WHERE {hash_draw_sql("d." + id_col, salt)} < thr.thr
"""


def token_budget_sample(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "",
    n_buckets: int = 4096,
    levels: int = 2,
) -> DataFrame:
    """Keep an EXACT deterministic token budget: rows ordered by
    (hash_draw(id, salt), id), keep the maximal prefix whose
    `weight_col` sum is <= `budget`. This is the budget-shaped
    sampling request a training pipeline actually gets ("X billion
    tokens from this source"), where :func:`hash_sample` /
    :func:`mix_corpus` are rate-shaped.

    Exactness WITHOUT a global sort: a window cumsum ordered by draw
    would sort the whole corpus into one task. Instead the draw space
    [0, 16^15) is cut into `n_buckets` equal ranges; one pruned
    aggregate (weight sum per range, map-side partial) is collected
    driver-side (n_buckets rows), the prefix of fully-kept ranges is
    resolved there, and only the single BOUNDARY range recurses —
    `levels` rounds shrink it to n / n_buckets^levels rows (at 10^12
    rows, 4096²: ~60k rows), which one window task then resolves
    exactly. Kept rows form one contiguous draw-prefix, so the final
    filter is map-side (`draw < cut` plus the window survivors of the
    boundary range).

    Equivalent by construction to the naive

        SELECT * FROM (SELECT *, sum(w) OVER (ORDER BY draw, id) c
                       FROM t) WHERE c <= budget

    which is the DuckDB twin (:func:`token_budget_sample_sql`).
    Weights must be non-negative and non-null (rows with w=0 inside
    the kept prefix are kept — they cost nothing).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if HASH_SPACE % (n_buckets ** levels):
        raise ValueError(
            f"n_buckets^levels must divide 16^15 (a power of 2 up to "
            f"2^60); got {n_buckets}^{levels}"
        )
    d = persisted(df.withColumn("_draw", hash_draw(F.col(id_col), salt)))
    lo, width, remaining = 0, HASH_SPACE, int(budget)
    for _ in range(levels):
        width //= n_buckets
        stats = (
            d.where((F.col("_draw") >= lo)
                    & (F.col("_draw") < lo + width * n_buckets))
            # integral `div`, not `/`: float division of ~2^60 draws
            # loses low bits (53-bit mantissa) and could mis-bucket a
            # boundary row relative to the integer-exact range filters
            .groupBy(F.expr(f"(_draw - {lo}) div {width}").alias("_b"))
            .agg(F.sum(F.col(weight_col).cast("long")).alias("_w"))
            .collect()
        )  # <= n_buckets rows
        by_b = {r["_b"]: r["_w"] for r in stats}
        if any(v is None for v in by_b.values()):
            raise ValueError(
                f"token_budget_sample: NULL values in {weight_col}"
            )
        k = 0
        while k < n_buckets and by_b.get(k, 0) <= remaining:
            remaining -= by_b.get(k, 0)
            k += 1
        lo += k * width
        if k == n_buckets:  # budget swallows this whole range
            width = 0
            break
    kept = d.where(F.col("_draw") < lo)
    if width > 0:
        w = Window.orderBy(F.col("_draw"), F.col(id_col)).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        boundary = (
            d.where((F.col("_draw") >= lo) & (F.col("_draw") < lo + width))
            .withColumn("_cum", F.sum(F.col(weight_col).cast("long")).over(w))
            .where(F.col("_cum") <= remaining)
            .drop("_cum")
        )
        kept = kept.unionByName(boundary)
    return kept.drop("_draw")


def token_budget_sample_sql(
    table: str,
    budget: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "",
    columns: str = "*",
) -> str:
    """DuckDB twin of :func:`token_budget_sample` — the naive global
    cumsum the Spark side is exactly equivalent to."""
    return f"""
SELECT {columns} FROM (
  SELECT *, sum(CAST({weight_col} AS BIGINT)) OVER (
    ORDER BY {hash_draw_sql(id_col, salt)}, {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS _cum
  FROM {table}
) WHERE _cum <= {int(budget)}
"""


def shuffle_assignment(
    df: DataFrame, n_parts: int, id_col: str = "doc_id", salt: str = "",
) -> DataFrame:
    """Deterministic global-shuffle assignment for training output →
    (id, part, sort_key): `part = hash_draw(id, salt) % n_parts`,
    `sort_key` the draw itself. Reading parts in order of
    (part, sort_key, id) is a uniform corpus permutation that is a
    pure function of (ids, salt) — reproducible across runs, cluster
    sizes, and engines, unlike `df.orderBy(rand())` (whose result
    depends on partitioning) or a single global sort (one-task
    anti-pattern). Map-only; the physical shuffle happens once, in
    :func:`write_shuffled`.
    """
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    draw = hash_draw(F.col(id_col), salt)
    return df.select(
        F.col(id_col),
        (draw % n_parts).cast("int").alias("part"),
        draw.alias("sort_key"),
    )


def shuffle_assignment_sql(
    table: str, n_parts: int, id_col: str = "doc_id", salt: str = "",
) -> str:
    draw = hash_draw_sql(id_col, salt)
    return (
        f"SELECT {id_col}, CAST({draw} % {n_parts} AS INT) AS part, "
        f"{draw} AS sort_key FROM {table}"
    )


def write_shuffled(
    df: DataFrame, path: str, n_parts: int, id_col: str = "doc_id",
    salt: str = "", fmt: str = "parquet",
) -> None:
    """Materialize the training-ready shuffled corpus: ONE hash
    repartition on the :func:`shuffle_assignment` part column into
    `n_parts` tasks, rows sorted within each task by (sort_key, id) —
    the per-task external sort spills, never a global sort. A reader
    streaming the output files gets a reproducible uniform permutation
    of the corpus. Spark maps the `part` value to a task by re-hashing
    it, so one physical file may carry several logical parts — each
    internally sorted, which is what sequential training consumption
    needs; per-part physical files are `partitionBy("part")` away.
    """
    draw = hash_draw(F.col(id_col), salt)
    tagged = df.withColumn("_sort_key", draw).withColumn(
        "part", (draw % n_parts).cast("int")
    )
    (
        tagged.repartition(n_parts, F.col("part"))
        .sortWithinPartitions("_sort_key", id_col)
        .drop("_sort_key")
        .write.format(fmt).mode("overwrite").save(path)
    )


def stratified_sample_sql(
    table: str,
    n_per_key: int,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    columns: Optional[Sequence[str]] = None,
) -> str:
    """DuckDB twin: the plain full-table window — the semantics
    `stratified_sample` reproduces without the full-stratum sort."""
    cols = ", ".join(columns) if columns else "*"
    return f"""
SELECT {cols} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {key_col}
    ORDER BY {hash_draw_sql(id_col, salt)}, {id_col}) AS _rn
  FROM {table}
) WHERE _rn <= {n_per_key}
"""


# ------------------------------------------------ temperature balancing

def _tweight(c: float, alpha: float) -> float:
    """count^alpha with correctly-rounded special cases — sqrt (the
    XLM alpha=0.5) and the trivial 1/2 exponents are bit-identical
    across engines; general pow is libm-dependent (documented in
    :func:`temperature_mix_sql`)."""
    import math

    if alpha == 0.5:
        return math.sqrt(c)
    if alpha == 1.0:
        return float(c)
    if alpha == 2.0:
        return float(c) * float(c)
    return float(c) ** alpha


def _tweight_sql(c: str, alpha: float) -> str:
    if alpha == 0.5:
        return f"sqrt({c})"
    if alpha == 1.0:
        return c
    if alpha == 2.0:
        return f"({c} * {c})"
    return f"pow({c}, CAST({alpha!r} AS DOUBLE))"


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp",
    keys_broadcast_limit: int = 100_000,
) -> DataFrame:
    """Temperature-balanced multilingual resampling (Lample & Conneau
    2019 arXiv:1901.07291 §3.1; XLM-R arXiv:1911.02116; mT5's
    alpha=0.3): keep the largest corpus whose per-language
    proportions follow p_l^alpha — flattening the head languages so
    low-resource ones are not drowned, without the explicit target
    weights :func:`mix_corpus` requires.

    Same execution shape as `mix_corpus`: one pruned counts pass
    (driver-collected, bounded), then a broadcast-threshold map-side
    filter — no shuffle of kept rows, stable across reruns and
    cluster sizes.

    Engine-parity note: rate_s = w_s * min_u(c_u / w_u) / c_s — the
    normalizing sum of the textbook q_l = p_l^a / sum p^a CANCELS,
    which matters here: a float SUM is accumulation-order-dependent
    and could not be replayed bit-exactly by the twin, while sqrt /
    divide / min / multiply / floor all are.
    """
    import math

    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    cnt_rows = (
        df.groupBy(key_col).agg(F.count("*").alias("_cnt"))
        .limit(keys_broadcast_limit + 1).collect()
    )
    if len(cnt_rows) > keys_broadcast_limit:
        raise ValueError(
            f"temperature_mix: > {keys_broadcast_limit} strata; "
            "aggregate to a coarser key before mixing"
        )
    counts = {r[key_col]: r["_cnt"] for r in cnt_rows}
    wr = {s: _tweight(c, alpha) for s, c in counts.items()}
    t_prime = min(counts[s] / wr[s] for s in wr)
    thresholds = {
        s: int(math.floor(wr[s] * t_prime / counts[s] * HASH_SPACE))
        for s in wr
    }
    spark = df.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    # NULL key (undetected language) is a FIRST-CLASS stratum — the
    # stratified_sample precedent: an equi-join would silently drop
    # every NULL row while its count still participated in t_prime,
    # collapsing the other languages' rates. Null-safe join instead;
    # schema built explicitly (None defeats type inference).
    thr_schema = StructType(
        [StructField("_tk", df.schema[key_col].dataType),
         StructField("_thr", LongType())]
    )
    thr_df = spark.createDataFrame(
        [(k, t) for k, t in thresholds.items()], thr_schema
    )
    return (
        df.join(
            F.broadcast(thr_df),
            F.col(key_col).eqNullSafe(F.col("_tk")),
        )
        .where(hash_draw(F.col(id_col), salt) < F.col("_thr"))
        .drop("_tk", "_thr")
    )


def temperature_mix_sql(
    table: str,
    alpha: float = 0.5,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp",
    columns: str = "*",
) -> str:
    """DuckDB twin of :func:`temperature_mix`: recomputes the SAME
    thresholds from in-SQL counts with the SAME left-associative
    double expression — bit-exact for alpha in {0.5, 1, 2} (sqrt and
    products are correctly rounded everywhere); general alpha rides
    libm pow and may differ in the last ulp at a floor boundary."""
    w = _tweight_sql("c", alpha)
    return f"""
WITH cnt AS (
  SELECT {key_col} AS k, CAST(count(*) AS DOUBLE) AS c
  FROM {table} GROUP BY {key_col}
),
wr AS (SELECT k, c, {w} AS w FROM cnt),
tt AS (SELECT MIN(c / w) AS t FROM wr),
thr AS (
  SELECT k, CAST(floor(w * (SELECT t FROM tt) / c * {HASH_SPACE}.0)
              AS BIGINT) AS thr
  FROM wr
)
SELECT {columns} FROM {table} d
JOIN thr ON d.{key_col} IS NOT DISTINCT FROM thr.k
WHERE {hash_draw_sql("d." + id_col, salt)} < thr.thr
"""


# ----------------------------------------------------- weighted sampling

def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsamp",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    IPL 2006, algorithm A-ES): each row draws a deterministic
    u ∈ (0, 1] from md5(key, salt) and ranks by u^(1/w) — the n
    largest keys are EXACTLY a weight-proportional sample without
    replacement.  We rank by the monotone-equivalent ln(u)/w
    (closer to 0 = better), ROUNDED to 10 dp with a key tie-break so
    both engines cut the same set (the repo-wide rounded-double
    idiom; raw last-ULP libm noise cannot flip the boundary).

    Rows with NULL or non-positive weight are excluded.  Plan:
    map-only scoring + TakeOrderedAndProject (per-partition partial
    top-n, driver merge) — no shuffle, no global sort; ``n`` is a
    sample size, bounded like any top-k.  Returns (key, weight,
    es_key); deterministic under reruns, resumes, and cluster-size
    changes like every sampler in this module.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(weight_col).cast("double")
    u = (hash_draw(F.col(key_col), salt) + 1).cast("double") / F.lit(
        float(HASH_SPACE)
    )
    es = F.round(F.log(u) / w, 10)
    return (
        df.where(w.isNotNull() & (w > 0))
        .select(
            F.col(key_col),
            w.alias("weight"),
            es.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc(key_col))
        .limit(int(n))
    )


def weighted_sample_sql(
    table: str,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsamp",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (identical draw and
    rounding arithmetic)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = f"CAST({weight_col} AS DOUBLE)"
    u = (
        f"CAST({hash_draw_sql(key_col, salt)} + 1 AS DOUBLE) "
        f"/ CAST({float(HASH_SPACE)!r} AS DOUBLE)"
    )
    return f"""
SELECT {key_col}, {w} AS weight, round(ln({u}) / {w}, 10) AS es_key
FROM {table}
WHERE {w} IS NOT NULL AND {w} > 0
ORDER BY es_key DESC, {key_col} ASC
LIMIT {int(n)}
"""
