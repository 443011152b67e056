"""Embedding similarity search: brute-force cosine top-k (baseline)
and sign-LSH banded ANN (the 100 TB scale path), plus embedding-cosine
near-duplicate pairs (the fifth dedup family of operators/dedup.py).

Everything is a NATIVE Spark column expression (zip_with / aggregate
higher-order functions — JVM-side fold, no Python in the hot path),
with DuckDB-SQL twin builders for the driver's oracle comparison.

Engine-portability notes:
- dot products fold left-to-right over doubles in BOTH engines
  (Spark `aggregate` with 0.0 init; DuckDB `list_reduce` whose
  implicit init is the first element — IEEE-identical since
  0.0 + x == x), so scores match bitwise; outputs are additionally
  rounded to 6 dp so the driver's value-hash is robust.
- LSH hyperplanes are ±1 vectors derived from md5(j:d) computed ONCE
  driver-side (hashlib) and embedded as literals in both the Spark
  expression and the SQL twin — the two engines share the exact
  planes without needing random state.

Scale notes (100 TB): brute-force top-k is one map + one global top-k
(Spark's TakeOrderedAndProject — partial per-partition heaps, no full
sort, no shuffle of vectors). The ANN path buckets vectors by banded
hyperplane signs; candidate generation joins only within buckets
(shuffle keys are short strings, vectors stay columnar) — the standard
sign-LSH design from Charikar (STOC 2002). The near-dup pair operator
reuses the banded buckets so the pair join never goes quadratic.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import persisted

N_PLANES = 16
N_BANDS = 4  # 4 sign bits per band

# ------------------------------------------------------------ planes


def plane_sign(j: int, d: int) -> float:
    """Deterministic ±1 hyperplane component from md5 — identical on
    any engine/host, no RNG state to ship."""
    h = hashlib.md5(f"{j}:{d}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) >= 8 else -1.0


def hyperplanes(n_planes: int, dim: int) -> List[List[float]]:
    return [[plane_sign(j, d) for d in range(dim)] for j in range(n_planes)]


# ------------------------------------------------------- dot / cosine


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double fold of the elementwise product."""
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` — same fold order."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def cosine(a: Column, b: Column) -> Column:
    na, nb = F.sqrt(dot(a, a)), F.sqrt(dot(b, b))
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(
        F.lit(0.0)
    )


def cosine_sql(a: str, b: str) -> str:
    na, nb = f"sqrt({dot_sql(a, a)})", f"sqrt({dot_sql(b, b)})"
    return (
        f"CASE WHEN {na} > 0 AND {nb} > 0 "
        f"THEN ({dot_sql(a, b)}) / (({na}) * ({nb})) ELSE 0.0 END"
    )


# ------------------------------------------------- brute-force top-k


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector.

    Plan: map-only scoring + TakeOrderedAndProject (per-partition
    partial top-k, driver merge) — no shuffle, no global sort. Rank on
    the 6-dp-rounded score with id tie-break so the result set is
    deterministic and engine-portable.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_topk_sql(
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
) -> str:
    q = "[" + ", ".join(repr(float(v)) for v in query_vec) + "]"
    return (
        f"SELECT {id_col}, round({cosine_sql(vec_col, q)}, 6) AS cos_sim "
        f"FROM {table} ORDER BY cos_sim DESC, {id_col} ASC LIMIT {k}"
    )


# ------------------------------------------------------ sign-LSH ANN


def lsh_sign_bits(vec: Column, planes: List[List[float]]) -> List[Column]:
    """One '0'/'1' sign column per hyperplane (dot >= 0)."""
    bits = []
    for p in planes:
        pc = F.array(*[F.lit(v) for v in p])
        bits.append(F.when(dot(vec, pc) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return bits


def lsh_band_keys(vec: Column, planes: List[List[float]],
                  n_bands: int = N_BANDS) -> Column:
    """array<string> of banded sign-bucket keys ('band:bits')."""
    bits = lsh_sign_bits(vec, planes)
    per = len(bits) // n_bands
    keys = [
        F.concat_ws("", F.lit(f"{b}:"), *bits[b * per:(b + 1) * per])
        for b in range(n_bands)
    ]
    return F.array(*keys)


def _lsh_bits_sql(vec: str, planes: List[List[float]]) -> List[str]:
    out = []
    for p in planes:
        pc = "[" + ", ".join(repr(v) for v in p) + "]"
        out.append(
            f"CASE WHEN {dot_sql(vec, pc)} >= 0 THEN '1' ELSE '0' END"
        )
    return out


def lsh_band_keys_sql(vec: str, planes: List[List[float]],
                      n_bands: int = N_BANDS) -> List[str]:
    bits = _lsh_bits_sql(vec, planes)
    per = len(bits) // n_bands
    return [
        f"'{b}:' || " + " || ".join(bits[b * per:(b + 1) * per])
        for b in range(n_bands)
    ]


def ann_lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    dim: int = 64,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing >= 1 LSH band
    with the query. The band keys of the constant query are computed
    driver-side, so candidate selection is a map-side array-overlap
    filter (no join, no shuffle) followed by the same partial top-k
    as the brute-force path. At 100 TB the filter prunes ~(1 - recall)
    of the corpus before any scoring work."""
    planes = hyperplanes(n_planes, dim)
    qbits = [
        "1" if sum(q * p for q, p in zip(query_vec, pl)) >= 0 else "0"
        for pl in planes
    ]
    per = n_planes // n_bands
    qkeys = [
        f"{b}:" + "".join(qbits[b * per:(b + 1) * per]) for b in range(n_bands)
    ]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = df.where(
        F.arrays_overlap(
            lsh_band_keys(F.col(vec_col), planes, n_bands),
            F.array(*[F.lit(s) for s in qkeys]),
        )
    )
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ann_lsh_topk_sql(
    query_vec: Sequence[float],
    k: int = 10,
    dim: int = 64,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
) -> str:
    planes = hyperplanes(n_planes, dim)
    qbits = [
        "1" if sum(q * p for q, p in zip(query_vec, pl)) >= 0 else "0"
        for pl in planes
    ]
    per = n_planes // n_bands
    qkeys = [
        f"{b}:" + "".join(qbits[b * per:(b + 1) * per]) for b in range(n_bands)
    ]
    keys = lsh_band_keys_sql(vec_col, planes, n_bands)
    qset = "[" + ", ".join(f"'{s}'" for s in qkeys) + "]"
    overlap = (
        "len(list_intersect([" + ", ".join(keys) + f"], {qset})) > 0"
    )
    q = "[" + ", ".join(repr(float(v)) for v in query_vec) + "]"
    return (
        f"SELECT {id_col}, round({cosine_sql(vec_col, q)}, 6) AS cos_sim "
        f"FROM {table} WHERE {overlap} "
        f"ORDER BY cos_sim DESC, {id_col} ASC LIMIT {k}"
    )


# ------------------------------------------- embedding near-dup pairs


#: bucket-size cap for the near-dup pair fan-out — a sign-LSH band
#: bucket holding millions of near-identical embeddings (boilerplate
#: pages, the normal crawl case) would otherwise materialize one giant
#: array and a quadratic pair explosion in a single task. Mirrors
#: operators.dedup.MAX_BUCKET.
MAX_BUCKET = 1000


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cosine >= threshold) found
    via the banded LSH buckets: ONE shuffle on the band key (groupBy →
    sorted member list → native pair fan-out → distinct) and exact
    cosine verification. Only (band key, id) crosses the candidate
    shuffle; vectors are re-read for the verify join. Buckets larger
    than `max_bucket` are dropped BEFORE member collection (count-first
    semi-join on the same shuffle key — one reused Exchange), so the
    degenerate array is never built."""
    planes = hyperplanes(n_planes, dim)
    # the 16 hyperplane dot-products per vector run ONCE: persisted
    # before the count gate + member collection consumers (AQE's
    # broadcast conversion would otherwise recompute the keys)
    keyed = persisted(df.select(
        F.col(id_col),
        F.explode(lsh_band_keys(F.col(vec_col), planes, n_bands)).alias("bk"),
    ))  # registered cache — loop callers release via caching.release_cached()
    ok_keys = (
        keyed.groupBy("bk").agg(F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("bk")
    )
    buckets = (
        keyed.join(ok_keys, "bk", "left_semi")
        .groupBy("bk")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("ids"))
    )
    cand = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                            lambda y: F.struct(x.alias("id_a"),
                                               y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_neardup_pairs_sql(
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
    max_bucket: int = MAX_BUCKET,
) -> str:
    planes = hyperplanes(n_planes, dim)
    keys = lsh_band_keys_sql(vec_col, planes, n_bands)
    keys_arr = "[" + ", ".join(keys) + "]"
    return f"""
WITH keyed AS (
  SELECT {id_col}, unnest({keys_arr}) AS bk FROM {table}
), ok AS (
  SELECT bk FROM keyed GROUP BY bk
  HAVING COUNT(*) > 1 AND COUNT(*) <= {max_bucket}
), cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM keyed a JOIN keyed b USING (bk) JOIN ok USING (bk)
  WHERE a.{id_col} < b.{id_col}
)
SELECT id_a, id_b, round({cosine_sql('va.' + vec_col, 'vb.' + vec_col)}, 6) AS cos_sim
FROM cand
JOIN {table} va ON va.{id_col} = cand.id_a
JOIN {table} vb ON vb.{id_col} = cand.id_b
WHERE round({cosine_sql('va.' + vec_col, 'vb.' + vec_col)}, 6) >= {threshold}
"""


# --------------------------------------------------- IVF-flat ANN

#: codebook size / probe count for the IVF demo defaults
IVF_K = 8
IVF_NPROBE = 2


def ivf_codebook(df: DataFrame, k: int = IVF_K,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id"):
    """Deterministic IVF codebook: the k member vectors whose
    md5(id) sorts first (engine-portable pseudo-random sample — no RNG
    state, identical in Spark and DuckDB). Returns a driver-side list
    of (centroid_index, vector); k is tiny so collecting it is the
    same driver-side cost as a query vector.

    A production IVF refines the codebook with Lloyd iterations; the
    partition/probe mechanics below are identical either way, and a
    deterministic codebook is what makes the oracle comparison exact.
    """
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    return [(i + 1, list(r[1])) for i, r in enumerate(rows)]


def ivf_assign(df: DataFrame, codebook, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """Map-only cell assignment: nearest centroid by cosine (ties →
    lowest centroid index). k dot products per row, all native —
    at 100 TB this is the embarrassingly-parallel build pass of the
    IVF index; the output (id, cell) is the partition key for
    cell-local search.

    Expression-size discipline: the row norm is PROJECTED once and
    centroid norms are plain Python floats (same left-to-right fold as
    the engines, so doubles match bitwise) — inlining full cosine()
    per centroid made Catalyst analyze/codegen a tree ~3x larger and
    dominated wall time at small scale."""
    norms = [
        sum(x * x for x in vec) ** 0.5 for _, vec in codebook
    ]
    staged = df.select(
        F.col(id_col), F.col(vec_col),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("_norm"),
    )
    coss = F.array(*[
        F.when(
            (F.col("_norm") > 0) & F.lit(nc > 0),
            F.round(
                dot(F.col(vec_col),
                    F.array(*[F.lit(float(v)) for v in vec]))
                / (F.col("_norm") * F.lit(float(nc))), 6),
        ).otherwise(F.lit(0.0))
        for (_, vec), nc in zip(codebook, norms)
    ])
    # array_position returns the FIRST index of the max → lowest
    # centroid index wins ties, matching the oracle's row_number order
    cell = F.array_position(coss, F.array_max(coss)).cast("int")
    return staged.select(F.col(id_col), F.col(vec_col),
                         cell.alias("cell"))


def _cos_py(a, b) -> float:
    d = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    return d / (na * nb) if na > 0 and nb > 0 else 0.0


class IvfIndex:
    """A built IVF-flat index: the (refined) driver-side codebook plus
    the PERSISTED (id, vector, cell) assignment table. Build once,
    search many — the assignment pass (the only full-corpus work) never
    reruns per query. At 100 TB `assigned` would be a written table
    partitioned by `cell` so a probe reads only its cells' files; here
    it is a registered cache (caching.release_cached() frees it)."""

    def __init__(self, codebook, assigned: DataFrame,
                 vec_col: str, id_col: str):
        self.codebook = codebook
        self.assigned = assigned
        self.vec_col = vec_col
        self.id_col = id_col

    def probe_cells(self, query_vec, nprobe: int = IVF_NPROBE):
        """Driver-side: the nprobe centroid indexes nearest the query
        (rounded-cosine order, lowest index tie-break — matches the
        SQL twin's row_number order)."""
        probes = sorted(
            self.codebook,
            key=lambda c: (-round(_cos_py(query_vec, c[1]), 6), c[0]),
        )[:nprobe]
        return [c[0] for c in probes]


def ivf_lloyd_step(assigned: DataFrame, codebook, dim: int,
                   vec_col: str = "embedding"):
    """One Lloyd iteration: per-cell elementwise centroid means (one
    shuffle of k×dim partial aggregates — map-side combine, k rows
    out), rounded to 6 dp for engine portability. Cells that lost all
    members keep their previous centroid (standard k-means practice;
    also what the SQL twin's left join + coalesce encodes)."""
    means = (
        assigned.groupBy("cell")
        .agg(*[
            F.round(F.avg(F.col(vec_col).getItem(i)), 6).alias(f"m{i}")
            for i in range(dim)
        ])
        .collect()
    )
    by_cell = {r["cell"]: [float(r[f"m{i}"]) for i in range(dim)]
               for r in means}
    return [(cidx, by_cell.get(cidx, vec)) for cidx, vec in codebook]


def ivf_build(
    df: DataFrame,
    k: int = IVF_K,
    lloyd_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> IvfIndex:
    """Build the IVF index ONCE: deterministic seed codebook →
    `lloyd_iters` refinement passes (each = one assignment map + one
    k×dim mean aggregate) → final assignment persisted. This is the
    build/search split a 100 TB deployment needs — ivf_search touches
    only probed cells of the prebuilt assignment and never rescans the
    corpus. lloyd_iters=0 keeps the raw md5-seeded codebook (exactly
    the oracle-checked `ivf_topk` semantics); 2-3 iterations give the
    FAISS-style refined coarse quantizer."""
    codebook = ivf_codebook(df, k, vec_col, id_col)
    if not codebook:
        raise ValueError("cannot build an IVF index over an empty corpus")
    dim = len(codebook[0][1])
    for _ in range(lloyd_iters):
        assigned = ivf_assign(df, codebook, vec_col, id_col)
        codebook = ivf_lloyd_step(assigned, codebook, dim, vec_col)
    assigned = persisted(ivf_assign(df, codebook, vec_col, id_col))
    return IvfIndex(codebook, assigned, vec_col, id_col)


def ivf_search(
    index: IvfIndex,
    query_vec,
    k: int = 10,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Search a prebuilt IVF index: probe-cell filter on the persisted
    assignment (no join, no shuffle, no rebuild) → exact cosine →
    TakeOrderedAndProject. The probe filter prunes ~(1 - nprobe/k) of
    the corpus before any scoring work."""
    probe_cells = index.probe_cells(query_vec, nprobe)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        index.assigned.where(F.col("cell").isin(probe_cells))
        .select(
            F.col(index.id_col),
            F.round(cosine(F.col(index.vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(index.id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate top-k = ivf_build + ivf_search (one-shot
    convenience; a session answering many queries should hold the
    IvfIndex and call ivf_search directly). lloyd_iters=0 is the
    deterministic-codebook path the DuckDB oracle mirrors exactly;
    lloyd_iters>=1 is the refined path (ivf_refined_topk_sql mirrors
    it with unrolled k-means iterations)."""
    index = ivf_build(df, n_centroids, lloyd_iters, vec_col, id_col)
    return ivf_search(index, query_vec, k, nprobe)


def ivf_topk_sql(
    k: int = 10,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
    query_id: int = 0,
) -> str:
    """DuckDB twin: same deterministic codebook, same rounded-cosine /
    lowest-index tie-breaks, query = the embedding of `query_id`."""
    cos_ec = cosine_sql(f"e.{vec_col}", "c.cvec")
    cos_eq = cosine_sql(f"e.{vec_col}", "q.qvec")
    return f"""
WITH cent AS (
  SELECT {vec_col} AS cvec,
         row_number() OVER (
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
         ) AS cidx
  FROM {table}
  ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} LIMIT {n_centroids}
),
assign AS (
  SELECT e.{id_col} AS vid, c.cidx,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY round({cos_ec}, 6) DESC, c.cidx ASC
         ) AS rn
  FROM {table} e CROSS JOIN cent c
),
cells AS (SELECT vid, cidx FROM assign WHERE rn = 1),
qprobe AS (
  SELECT cidx FROM assign WHERE vid = {query_id} AND rn <= {nprobe}
),
q AS (SELECT {vec_col} AS qvec FROM {table} WHERE {id_col} = {query_id})
SELECT e.{id_col}, round({cos_eq}, 6) AS cos_sim
FROM {table} e
JOIN cells ON cells.vid = e.{id_col}
JOIN qprobe ON qprobe.cidx = cells.cidx, q
ORDER BY cos_sim DESC, e.{id_col} ASC LIMIT {k}
"""


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = IVF_K,
    lloyd_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the IVF coarse
    quantizer, then inside each cluster drop every document that has a
    LOWER-id neighbour with cosine >= threshold — the deterministic
    relational relaxation of the paper's greedy within-cluster sweep
    (the paper keeps one member per duplicate group picked by
    centroid-distance; min-id dominance keeps the same groups
    decidable by a single self-join with no sequential state).

    Returns (id, cell, is_dup) for every input row.

    Scale design (100 TB): the only quadratic work is WITHIN a cell —
    that is the entire point of the clustering pass; pick
    n_centroids ~ n / target_cell_size so cells stay bounded (FAISS
    guidance sqrt(n)..n/256), after which the self-join shuffles each
    cell once on the cell key. The dominated-id list is id-only, and
    the final marker join is a narrow left join on the persisted
    assignment — vectors cross exactly one Exchange. This is the
    sixth dedup family beside md5-exact / MinHash / SimHash /
    n-gram-Jaccard / embedding-LSH (operators/dedup.py), the one that
    catches paraphrases sharing no n-grams.
    """
    index = ivf_build(df, n_centroids, lloyd_iters, vec_col, id_col)
    a = index.assigned.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"),
        F.col("cell"),
    )
    b = index.assigned.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"),
        F.col("cell"),
    )
    dominated = (
        a.join(b, "cell")
        .where(F.col("b_id") < F.col("a_id"))
        .where(F.round(cosine(F.col("va"), F.col("vb")), 6)
               >= F.lit(threshold))
        .select(F.col("a_id").alias(id_col))
        .distinct()
    )
    return (
        index.assigned.join(
            dominated.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col), F.col("cell"),
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
    )


def semdedup_sql(
    threshold: float = 0.95,
    n_centroids: int = IVF_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`semdedup` (lloyd_iters=0): same
    deterministic codebook / rounded-cosine / lowest-index assignment
    as ivf_topk_sql, dominance via EXISTS."""
    cos_ec = cosine_sql(f"e.{vec_col}", "c.cvec")
    cos_ab = cosine_sql(f"ea.{vec_col}", "eb.{0}".format(vec_col))
    return f"""
WITH cent AS (
  SELECT {vec_col} AS cvec,
         row_number() OVER (
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
         ) AS cidx
  FROM {table}
  ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} LIMIT {n_centroids}
),
assign AS (
  SELECT e.{id_col} AS vid, c.cidx,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY round({cos_ec}, 6) DESC, c.cidx ASC
         ) AS rn
  FROM {table} e CROSS JOIN cent c
),
cells AS (SELECT vid, cidx AS cell FROM assign WHERE rn = 1)
SELECT ca.vid AS {id_col}, ca.cell,
       EXISTS (
         SELECT 1 FROM cells cb
         JOIN {table} ea ON ea.{id_col} = ca.vid
         JOIN {table} eb ON eb.{id_col} = cb.vid
         WHERE cb.cell = ca.cell AND cb.vid < ca.vid
           AND round({cos_ab}, 6) >= {threshold}
       ) AS is_dup
FROM cells ca
"""


def ivf_refined_topk_sql(
    k: int = 10,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    lloyd_iters: int = 2,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
    query_id: int = 0,
) -> str:
    """DuckDB twin of ivf_topk(lloyd_iters=N): the k-means refinement
    is UNROLLED — one (assign, elementwise-mean, coalesce) CTE triple
    per iteration, generated here by the same loop that drives the
    Spark side. Means are rounded to 6 dp in both engines (the only
    cross-engine float hazard is aggregation order inside avg(), ~1e-15
    relative — far below the rounding grain), and empty cells keep the
    previous centroid via LEFT JOIN + coalesce, mirroring
    ivf_lloyd_step's dict fallback."""
    ctes = [
        f"""cent0 AS (
  SELECT {vec_col} AS cvec,
         row_number() OVER (
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
         ) AS cidx
  FROM {table}
  ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} LIMIT {n_centroids}
)"""
    ]
    cos_ec = cosine_sql(f"e.{vec_col}", "c.cvec")
    for t in range(1, lloyd_iters + 1):
        ctes.append(f"""assign{t} AS (
  SELECT e.{id_col} AS vid, c.cidx,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY round({cos_ec}, 6) DESC, c.cidx ASC
         ) AS rn
  FROM {table} e CROSS JOIN cent{t - 1} c
)""")
        ctes.append(f"""mean{t} AS (
  SELECT cidx, list(v ORDER BY i) AS cvec FROM (
    SELECT a.cidx, gs.i, round(avg(e.{vec_col}[gs.i]), 6) AS v
    FROM assign{t} a
    JOIN {table} e ON e.{id_col} = a.vid,
         generate_series(1, {dim}) gs(i)
    WHERE a.rn = 1
    GROUP BY a.cidx, gs.i
  ) GROUP BY cidx
)""")
        ctes.append(f"""cent{t} AS (
  SELECT p.cidx, coalesce(m.cvec, p.cvec) AS cvec
  FROM cent{t - 1} p LEFT JOIN mean{t} m USING (cidx)
)""")
    fin = lloyd_iters
    cos_eq = cosine_sql(f"e.{vec_col}", "q.qvec")
    ctes.append(f"""assignF AS (
  SELECT e.{id_col} AS vid, c.cidx,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY round({cos_ec}, 6) DESC, c.cidx ASC
         ) AS rn
  FROM {table} e CROSS JOIN cent{fin} c
)""")
    ctes.append("cells AS (SELECT vid, cidx FROM assignF WHERE rn = 1)")
    ctes.append(
        f"qprobe AS (SELECT cidx FROM assignF "
        f"WHERE vid = {query_id} AND rn <= {nprobe})"
    )
    ctes.append(
        f"q AS (SELECT {vec_col} AS qvec FROM {table} "
        f"WHERE {id_col} = {query_id})"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT e.{id_col}, round({cos_eq}, 6) AS cos_sim
FROM {table} e
JOIN cells ON cells.vid = e.{id_col}
JOIN qprobe ON qprobe.cidx = cells.cidx, q
ORDER BY cos_sim DESC, e.{id_col} ASC LIMIT {k}
"""
    )


# ------------------------------------------------- product quantization

#: PQ demo defaults: 8 subspaces x 8 centroids over the 64-dim test
#: embeddings -> 8-byte codes (64x smaller than the float32 vectors)
PQ_M = 8
PQ_KSUB = 8


def _l2sq(sub: Column, centroid: Sequence[float]) -> Column:
    """Squared L2 distance between a sliced subvector column and a
    literal centroid — left-to-right double fold from 0.0, matching
    the DuckDB twin's list_reduce(list_prepend(0.0, ...)) bitwise."""
    lits = F.array(*[F.lit(float(v)) for v in centroid])
    diffs = F.zip_with(sub, lits, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def pq_codebooks(df: DataFrame, m_sub: int = PQ_M, ksub: int = PQ_KSUB,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Deterministic PQ codebooks (Jégou et al., TPAMI 2011): ONE
    md5(id)-ordered scan yields m_sub*ksub seed rows; seed j trains
    subspace j // ksub with centroid index j % ksub + 1, taking the
    seed vector's OWN slice for that subspace (so subspace codebooks
    come from disjoint rows — independent-ish without RNG state, and
    bit-reproducible in both engines). Returns a driver-side dict
    {(sub, cidx): subvector}; m_sub*ksub rows is the same driver-side
    footprint class as the IVF codebook.

    A production build refines with :func:`pq_lloyd_step`; the
    deterministic seed set is what makes the oracle comparison exact
    (exactly the ivf_codebook tradeoff)."""
    need = m_sub * ksub
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(need)
        .collect()
    )
    if len(rows) < need:
        raise ValueError(
            f"PQ needs >= m_sub*ksub = {need} rows to seed codebooks, "
            f"corpus has {len(rows)}"
        )
    dim = len(rows[0][1])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    books = {}
    for j, r in enumerate(rows):
        sub, cidx = j // ksub, j % ksub + 1
        vec = list(r[1])
        books[(sub, cidx)] = [float(v) for v in
                              vec[sub * dsub:(sub + 1) * dsub]]
    return books


def _pq_codes_expr(books, m_sub: int, ksub: int, dsub: int,
                   vec_col: str) -> Column:
    """codes column: per subspace, argmin centroid by 6-dp-rounded
    squared L2 (ties -> lowest centroid index via array_position's
    first-match rule, matching the twin's row_number order)."""
    v = F.col(vec_col).cast("array<double>")
    codes = []
    for s in range(m_sub):
        sl = F.slice(v, s * dsub + 1, dsub)
        dists = F.array(*[
            F.round(_l2sq(sl, books[(s, c)]), 6)
            for c in range(1, ksub + 1)
        ])
        codes.append(
            F.array_position(dists, F.array_min(dists)).cast("int")
        )
    return F.array(*codes)


def pq_encode(df: DataFrame, books, m_sub: int = PQ_M,
              ksub: int = PQ_KSUB, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Map-only PQ encoding: (id, codes array<int>, 1-based). The
    codes table is the WHOLE searchable index — m_sub small ints per
    document (8 bytes at the defaults vs 256 bytes of float32), which
    is what lets a 100 TB corpus' ANN index fit a cluster's memory.
    The m_sub*ksub interpreted HOF folds per row are the honest cost
    of engine-portable centroids (same tradeoff as ann_lsh_topk); a
    throughput-first deployment swaps this one projection for an
    Arrow-batched pandas UDF without touching the index layout."""
    dsub = len(next(iter(books.values())))
    return df.select(
        F.col(id_col),
        _pq_codes_expr(books, m_sub, ksub, dsub, vec_col).alias("codes"),
    )


def pq_lloyd_step(df: DataFrame, books, m_sub: int = PQ_M,
                  ksub: int = PQ_KSUB, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """One Lloyd iteration over every subspace in ONE pass: encode,
    posexplode (subvector, code) pairs, per-(sub, code) elementwise
    means rounded to 6 dp (one shuffle of <= m_sub*ksub*dsub partial
    aggregates — map-side combine, m_sub*ksub rows out). Cells that
    lost all members keep their previous centroid, as in
    ivf_lloyd_step."""
    dsub = len(next(iter(books.values())))
    v = F.col(vec_col).cast("array<double>")
    subs = F.array(*[F.slice(v, s * dsub + 1, dsub) for s in range(m_sub)])
    codes = _pq_codes_expr(books, m_sub, ksub, dsub, vec_col)
    ex = df.select(
        F.posexplode(F.arrays_zip(subs.alias("sv"), codes.alias("code")))
    ).select(
        F.col("pos").alias("sub"),
        F.col("col.code").alias("cidx"),
        F.col("col.sv").alias("sv"),
    )
    means = (
        ex.groupBy("sub", "cidx")
        .agg(*[
            F.round(F.avg(F.col("sv").getItem(i)), 6).alias(f"m{i}")
            for i in range(dsub)
        ])
        .collect()
    )
    got = {(r["sub"], r["cidx"]): [float(r[f"m{i}"]) for i in range(dsub)]
           for r in means}
    return {key: got.get(key, old) for key, old in books.items()}


class PqIndex:
    """A built PQ index: driver-side codebooks plus the PERSISTED
    (id, codes) table. Build once, search many — ADC queries touch
    only the code table (never the vectors), so the per-query cost is
    a broadcast-free map over m_sub-byte rows + a top-k."""

    def __init__(self, books, codes: DataFrame, m_sub: int, ksub: int,
                 id_col: str):
        self.books = books
        self.codes = codes
        self.m_sub = m_sub
        self.ksub = ksub
        self.id_col = id_col


def pq_build(df: DataFrame, m_sub: int = PQ_M, ksub: int = PQ_KSUB,
             lloyd_iters: int = 0, vec_col: str = "embedding",
             id_col: str = "vec_id") -> PqIndex:
    """Build the PQ index: deterministic seed codebooks ->
    `lloyd_iters` one-pass refinements -> final encode persisted.
    lloyd_iters=0 keeps the raw seeded codebooks (exactly the
    oracle-checked `pq_topk` semantics)."""
    books = pq_codebooks(df, m_sub, ksub, vec_col, id_col)
    for _ in range(lloyd_iters):
        books = pq_lloyd_step(df, books, m_sub, ksub, vec_col, id_col)
    codes = persisted(pq_encode(df, books, m_sub, ksub, vec_col, id_col))
    return PqIndex(books, codes, m_sub, ksub, id_col)


def pq_search(index: PqIndex, query_vec, k: int = 10) -> DataFrame:
    """Asymmetric-distance (ADC) search: the query's m_sub x ksub
    distance table is computed driver-side (the same left-to-right
    fold as the engines) and baked in as literal arrays; each code
    row scores with m_sub element_at lookups + adds — pure codegen,
    no join, no shuffle, TakeOrderedAndProject cut. Returns
    (id, adc_dist), ascending (squared-L2 approximation)."""
    m_sub, ksub = index.m_sub, index.ksub
    dsub = len(next(iter(index.books.values())))
    dt = {}
    for s in range(m_sub):
        qs = [float(v) for v in query_vec[s * dsub:(s + 1) * dsub]]
        for c in range(1, ksub + 1):
            w = index.books[(s, c)]
            d = 0.0
            for a, b in zip(qs, w):
                d += (a - b) * (a - b)
            dt[(s, c)] = round(d, 6)
    score = F.lit(0.0)
    for s in range(m_sub):
        lut = F.array(*[F.lit(dt[(s, c)]) for c in range(1, ksub + 1)])
        score = score + F.element_at(lut, F.col("codes").getItem(s))
    return (
        index.codes.select(
            F.col(index.id_col),
            F.round(score, 6).alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc(index.id_col))
        .limit(int(k))
    )


def pq_topk(df: DataFrame, k: int = 10, m_sub: int = PQ_M,
            ksub: int = PQ_KSUB, vec_col: str = "embedding",
            id_col: str = "vec_id", query_id: int = 0) -> DataFrame:
    """One-shot oracle query: build (lloyd_iters=0), query = the
    vector of `query_id`, ADC top-k."""
    index = pq_build(df, m_sub, ksub, 0, vec_col, id_col)
    qrow = df.where(F.col(id_col) == query_id).select(vec_col).first()
    if qrow is None:
        raise ValueError(f"query_id {query_id} not in corpus")
    return pq_search(index, list(qrow[0]), k)


def _l2sq_sql(elem_a: str, elem_b: str, n: str) -> str:
    """DuckDB squared-L2 fold over i = 1..n; `elem_a`/`elem_b` are
    expressions in i. Same 0.0-seeded left fold as :func:`_l2sq`."""
    diff = f"(({elem_a}) - ({elem_b}))"
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {n}), i -> {diff} * {diff})), "
        f"(acc, v) -> acc + v)"
    )


def pq_topk_sql(
    k: int = 10,
    m_sub: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
    query_id: int = 0,
) -> str:
    """DuckDB twin of :func:`pq_topk`: same seed rows, same rounded
    squared-L2 argmin with lowest-centroid tie-break, same per-cell
    rounded distance table, same ascending (dist, id) cut."""
    dsub = dim // m_sub
    ord_ = f"md5(CAST({id_col} AS VARCHAR)), {id_col}"
    doc_elem = f"CAST(e.{vec_col}[c.sub * {dsub} + i] AS DOUBLE)"
    q_elem = f"CAST(q.qvec[c.sub * {dsub} + i] AS DOUBLE)"
    c_elem = "c.csub[i]"
    d_doc = _l2sq_sql(doc_elem, c_elem, str(dsub))
    d_q = _l2sq_sql(q_elem, c_elem, str(dsub))
    return f"""
WITH seeds AS (
  SELECT {vec_col} AS cvec,
         row_number() OVER (ORDER BY {ord_}) - 1 AS j
  FROM {table} ORDER BY {ord_} LIMIT {m_sub * ksub}
),
cent AS (
  SELECT CAST(j // {ksub} AS INT) AS sub,
         CAST(j % {ksub} + 1 AS INT) AS cidx,
         list_transform(generate_series(1, {dsub}),
           i -> CAST(cvec[(j // {ksub}) * {dsub} + i] AS DOUBLE)) AS csub
  FROM seeds
),
dist AS (
  SELECT e.{id_col} AS vid, c.sub, c.cidx, round({d_doc}, 6) AS d
  FROM {table} e CROSS JOIN cent c
),
codes AS (
  SELECT vid, sub, cidx FROM (
    SELECT vid, sub, cidx,
           row_number() OVER (
             PARTITION BY vid, sub ORDER BY d ASC, cidx ASC
           ) AS rn
    FROM dist
  ) WHERE rn = 1
),
q AS (SELECT {vec_col} AS qvec FROM {table} WHERE {id_col} = {query_id}),
qd AS (
  SELECT c.sub, c.cidx, round({d_q}, 6) AS qdist
  FROM cent c, q
)
SELECT codes.vid AS {id_col}, round(sum(qd.qdist), 6) AS adc_dist
FROM codes JOIN qd ON qd.sub = codes.sub AND qd.cidx = codes.cidx
GROUP BY codes.vid
ORDER BY adc_dist ASC, vid ASC LIMIT {k}
"""


# ---------------------------------------------------------- IVF + PQ

def ivfpq_topk(
    df: DataFrame,
    k: int = 10,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    m_sub: int = PQ_M,
    ksub: int = PQ_KSUB,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: int = 0,
) -> DataFrame:
    """The composed FAISS-style index: IVF coarse cells prune the
    corpus (~1 - nprobe/n_centroids skipped before ANY scoring), then
    PQ asymmetric distance ranks the survivors over m_sub-byte codes —
    at 100 TB this is the deployment shape: the (id, cell, codes)
    table is the whole index, written partitioned by cell so a probe
    reads only its cells' files, and vectors are touched exactly once
    (at build). This demo variant encodes raw vectors, not
    cell-residuals (IVFADC's optional refinement); both components
    keep their oracle-exact deterministic codebooks.

    Ranking is identical to :func:`pq_search` restricted to the probed
    cells (tests pin this), so accuracy is PQ's with IVF's read
    pruning on top."""
    icb = ivf_codebook(df, n_centroids, vec_col, id_col)
    books = pq_codebooks(df, m_sub, ksub, vec_col, id_col)
    dsub = len(next(iter(books.values())))
    assigned = persisted(
        ivf_assign(df, icb, vec_col, id_col).select(
            F.col(id_col), F.col("cell"),
            _pq_codes_expr(books, m_sub, ksub, dsub, vec_col)
            .alias("codes"),
        )
    )
    qrow = df.where(F.col(id_col) == query_id).select(vec_col).first()
    if qrow is None:
        raise ValueError(f"query_id {query_id} not in corpus")
    qvec = list(qrow[0])
    probes = sorted(
        icb, key=lambda c: (-round(_cos_py(qvec, c[1]), 6), c[0])
    )[:nprobe]
    probe_cells = [c[0] for c in probes]
    index = PqIndex(books, assigned.where(F.col("cell").isin(probe_cells)),
                    m_sub, ksub, id_col)
    return pq_search(index, qvec, k)


def ivfpq_topk_sql(
    k: int = 10,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    m_sub: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
    query_id: int = 0,
) -> str:
    """DuckDB twin of :func:`ivfpq_topk`: the ivf_topk_sql cell/probe
    CTEs compose with the pq_topk_sql code/distance-table CTEs; the
    final cut is the PQ ADC ranking restricted to probed cells."""
    dsub = dim // m_sub
    ord_ = f"md5(CAST({id_col} AS VARCHAR)), {id_col}"
    cos_ec = cosine_sql(f"e.{vec_col}", "c.cvec")
    doc_elem = f"CAST(e.{vec_col}[c.sub * {dsub} + i] AS DOUBLE)"
    q_elem = f"CAST(q.qvec[c.sub * {dsub} + i] AS DOUBLE)"
    c_elem = "c.csub[i]"
    d_doc = _l2sq_sql(doc_elem, c_elem, str(dsub))
    d_q = _l2sq_sql(q_elem, c_elem, str(dsub))
    return f"""
WITH icent AS (
  SELECT {vec_col} AS cvec,
         row_number() OVER (ORDER BY {ord_}) AS cidx
  FROM {table} ORDER BY {ord_} LIMIT {n_centroids}
),
iassign AS (
  SELECT e.{id_col} AS vid, c.cidx,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY round({cos_ec}, 6) DESC, c.cidx ASC
         ) AS rn
  FROM {table} e CROSS JOIN icent c
),
cells AS (SELECT vid, cidx FROM iassign WHERE rn = 1),
qprobe AS (
  SELECT cidx FROM iassign WHERE vid = {query_id} AND rn <= {nprobe}
),
survivors AS (
  SELECT cells.vid FROM cells JOIN qprobe ON qprobe.cidx = cells.cidx
),
seeds AS (
  SELECT {vec_col} AS cvec,
         row_number() OVER (ORDER BY {ord_}) - 1 AS j
  FROM {table} ORDER BY {ord_} LIMIT {m_sub * ksub}
),
cent AS (
  SELECT CAST(j // {ksub} AS INT) AS sub,
         CAST(j % {ksub} + 1 AS INT) AS cidx,
         list_transform(generate_series(1, {dsub}),
           i -> CAST(cvec[(j // {ksub}) * {dsub} + i] AS DOUBLE)) AS csub
  FROM seeds
),
dist AS (
  SELECT e.{id_col} AS vid, c.sub, c.cidx, round({d_doc}, 6) AS d
  FROM {table} e CROSS JOIN cent c
  WHERE e.{id_col} IN (SELECT vid FROM survivors)
),
codes AS (
  SELECT vid, sub, cidx FROM (
    SELECT vid, sub, cidx,
           row_number() OVER (
             PARTITION BY vid, sub ORDER BY d ASC, cidx ASC
           ) AS rn
    FROM dist
  ) WHERE rn = 1
),
q AS (SELECT {vec_col} AS qvec FROM {table} WHERE {id_col} = {query_id}),
qd AS (
  SELECT c.sub, c.cidx, round({d_q}, 6) AS qdist
  FROM cent c, q
)
SELECT codes.vid AS {id_col}, round(sum(qd.qdist), 6) AS adc_dist
FROM codes JOIN qd ON qd.sub = codes.sub AND qd.cidx = codes.cidx
GROUP BY codes.vid
ORDER BY adc_dist ASC, vid ASC LIMIT {k}
"""
