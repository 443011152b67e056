"""Deduplication operators for the training-data pipeline tier.

Five dedup families, each as composable DataFrame transforms with
DuckDB-SQL twins where the math is portable (md5 is the shared
primitive — bit-identical in Spark and DuckDB, so signatures match
across engines exactly):

- exact:        md5(text) groupBy                      (one shuffle)
- minhash+LSH:  word-shingles → k minhashes (min of md5-hex per seed)
                → banded keys → bucket join for candidates
- simhash:      32-bit hex-nibble-majority signature (explode+agg)
- ngram-jaccard: shingle self-join → pairwise Jaccard
- embedding near-dup lives in operators/similarity.py

Scale notes (100 TB): exact/minhash/simhash are linear with one or two
shuffles on bounded-width keys (signatures are ≤ 16×16-byte strings,
never full text). The candidate self-joins shuffle on shingle/band
keys whose cardinality is huge (good spread); hot shingles (common
phrases) are the skew risk — `ngram_jaccard_pairs` therefore drops
shingles with document-frequency > max_df before joining, the standard
stop-shingle defusal. AQE skew-join handles the residue.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persisted

# --------------------------------------------------------------- exact


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Content-hash groups: fingerprint, n_docs, keeper (min id).
    Returns only groups (fingerprints) — never collects texts."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(F.col(id_col)).alias("keeper"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct text. Window-free plan: a
    groupBy on (hash) with min-id then semi-join back — two narrow
    shuffles, no sort, skew-safe (hash keys are uniform)."""
    keepers = exact_dup_groups(df, text_col, id_col).select(
        F.col("keeper").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


# ------------------------------------------------------------ shingles


def word_shingles(col: Column, n: int = 5) -> Column:
    """Word n-gram shingles as array<string>; [] if < n words.

    Native expression: split → transform over a sequence of start
    offsets → concat slices. Stays in codegen, no UDF.
    """
    words = F.split(F.trim(col), r"\s+")
    k = F.size(words) - (n - 1)
    return F.when(
        (F.trim(col) == "") | (k <= 0), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def word_shingles_sql(col: str, n: int = 5) -> str:
    words = f"string_split_regex(trim({col}), '\\s+')"
    k = f"(len({words}) - {n - 1})"
    return (
        f"CASE WHEN trim({col}) = '' OR {k} <= 0 THEN [] "
        f"ELSE list_transform(generate_series(1, {k}), "
        f"i -> array_to_string(list_slice({words}, i, i + {n - 1}), ' ')) END"
    )


# ------------------------------------------------------------- minhash

N_HASHES = 16
N_BANDS = 4  # rows per band = N_HASHES // N_BANDS = 4

#: universal-hash modulus (Mersenne prime 2^31-1): products a_j*h stay
#: below 2^62, so the arithmetic never overflows int64 in any engine.
MINHASH_PRIME = 2_147_483_647


def _perm_coeffs(n_hashes: int = N_HASHES) -> List[tuple]:
    """Deterministic (a_j, b_j) pairs derived from md5 — identical on
    every host/engine, no RNG state to ship."""
    import hashlib

    out = []
    for j in range(n_hashes):
        a = int(hashlib.md5(f"a{j}".encode()).hexdigest()[:7], 16) % (
            MINHASH_PRIME - 1
        ) + 1
        b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:7], 16) % MINHASH_PRIME
        out.append((a, b))
    return out


def shingle_hashes(col: Column, shingle_n: int = 5) -> Column:
    """array<bigint> of base hashes, ONE md5 per shingle: the top 60
    bits of md5 reduced mod the Mersenne prime."""
    return F.transform(
        word_shingles(col, shingle_n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("long") % MINHASH_PRIME,
    )


def shingle_hashes_sql(col: str, shingle_n: int = 5) -> str:
    sh = word_shingles_sql(col, shingle_n)
    return (
        f"list_transform({sh}, s -> "
        f"CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) % {MINHASH_PRIME})"
    )


def minhash_signature(col: Column, n_hashes: int = N_HASHES,
                      shingle_n: int = 5) -> Column:
    """k-permutation minhash as array<bigint>.

    Classic universal hashing over ONE base hash per shingle:
    sig_j = min over shingles of (a_j*h + b_j) mod P. Computed in a
    single `aggregate` fold so md5 runs exactly once per shingle (16x
    less hash work than hashing per permutation), all JVM-side.
    Empty shingle set -> all-P sentinel signature.
    """
    coeffs = _perm_coeffs(n_hashes)
    A = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    B = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    P = F.lit(MINHASH_PRIME).cast("long")
    init = F.array_repeat(P, n_hashes)
    return F.aggregate(
        shingle_hashes(col, shingle_n),
        init,
        # outer lambda: (accumulator, shingle hash); inner lambda uses
        # the two-arg (element, index) form of transform DELIBERATELY
        # to pick the per-permutation coefficients.
        lambda acc, h: F.transform(
            acc,
            lambda m, j: F.least(
                m,
                (F.element_at(A, j + 1) * h + F.element_at(B, j + 1)) % P,
            ),
        ),
    )


def minhash_signature_sql(col: str, n_hashes: int = N_HASHES,
                          shingle_n: int = 5) -> str:
    """DuckDB twin (expression form). Evaluates the base-hash array
    per permutation — fine for oracle-scale data."""
    coeffs = _perm_coeffs(n_hashes)
    hs = shingle_hashes_sql(col, shingle_n)
    P = MINHASH_PRIME
    elems = [
        f"coalesce(list_min(list_transform({hs}, "
        f"h -> ({a} * h + {b}) % {P})), {P})"
        for a, b in coeffs
    ]
    return "[" + ", ".join(elems) + "]"


def lsh_band_keys(sig: Column, n_bands: int = N_BANDS,
                  rows_per_band: int = N_HASHES // N_BANDS) -> Column:
    """Banded LSH keys: md5 of each band's signature slice, prefixed
    with the band index so buckets from different bands never merge."""
    keys = [
        F.concat_ws(
            ":",
            F.lit(str(b)),
            F.md5(F.concat_ws("|", F.slice(
                F.transform(sig, lambda v: v.cast("string")),
                b * rows_per_band + 1, rows_per_band,
            ))),
        )
        for b in range(n_bands)
    ]
    return F.array(*keys)


#: LSH bucket-size cap. A band key shared by more than this many docs
#: is a degenerate bucket (boilerplate-identical content — the NORMAL
#: case in a web crawl): one collect_list row would hold millions of
#: ids and the pair fan-out would go quadratic in a single task. Such
#: buckets carry no ranking information anyway (everything in them is
#: a duplicate of everything else), so they are dropped — the same
#: stop-shingle defusal ngram_jaccard_pairs applies via max_df. Exact
#: dedup (md5 groups) catches the identical-text mass separately.
MAX_BUCKET = 1000


def band_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """(id, band_key) rows — the reusable dedup index relation: one
    row per (document, LSH band). Map-only (one md5 per shingle via
    the single-fold signature); docs with no shingles (< shingle_n
    words) are dropped here, at the source — at web scale the
    empty-shingle sentinel bucket would otherwise go quadratic.
    jobs/dedup_index.py materializes exactly this relation."""
    has_shingles = (F.trim(F.col(text_col)) != "") & (
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= shingle_n
    )
    sig = df.where(has_shingles).select(
        F.col(id_col),
        lsh_band_keys(minhash_signature(F.col(text_col), shingle_n=shingle_n))
        .alias("bands"),
    )
    return sig.select(id_col, F.explode("bands").alias("band_key"))


def pairs_from_band_table(
    exploded: DataFrame, id_col: str = "doc_id",
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Candidate pairs from an (id, band_key) relation: count-first
    bucket gate BEFORE collect_list (the oversized member array is
    never materialized), sorted members, native in-bucket pair
    fan-out, distinct. ONE shuffle on 16-byte keys."""
    ok_keys = (
        exploded.groupBy("band_key").agg(F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("band_key")
    )
    buckets = (
        exploded.join(ok_keys, "band_key", "left_semi")
        .groupBy("band_key")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    # two-arg (element, index) transform: pair each id
                    # with every LATER id in the sorted bucket
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def minhash_lsh_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 5, max_bucket: int = MAX_BUCKET,
    index: DataFrame = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH band.

    Plan shape: signature (map-only, one md5 per shingle) → explode
    band keys → groupBy band key collecting member ids → emit in-bucket
    pairs with a native nested transform → distinct (band_table +
    pairs_from_band_table). Signatures are computed exactly once (no
    self-join recomputation), and full texts never cross the wire.
    Buckets larger than `max_bucket` are dropped entirely (see
    MAX_BUCKET); the count of dropped buckets is observable via
    `lsh_dropped_buckets` on the same input.

    `index`: a previously MATERIALIZED (id, band_key) relation (see
    jobs/dedup_index.py) — when given, the signature pass is skipped
    entirely and candidates come straight off the index, which is how
    a 100 TB deployment amortizes the per-shingle hash work across
    many dedup runs.
    """
    if index is not None:
        return pairs_from_band_table(index, id_col, max_bucket)
    # the signature map runs ONCE: (id, band_key) is persisted before
    # the two consumers (count gate + member collection) — without
    # this, AQE's broadcast conversion of the semi-join removes the
    # shared Exchange and the md5-per-shingle work runs twice. The
    # durable equivalent is the materialized index above.
    exploded = persisted(band_table(df, text_col, id_col, shingle_n))
    # registered cache — loop callers release via caching.release_cached()
    return pairs_from_band_table(exploded, id_col, max_bucket)


def lsh_dropped_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 5, max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Observability companion to :func:`minhash_lsh_candidates`: one
    row per band bucket dropped by the `max_bucket` cap, with its
    member count — so a pipeline can log how much degenerate mass the
    cap removed (at crawl scale this number is the boilerplate story,
    not an error)."""
    has_shingles = (F.trim(F.col(text_col)) != "") & (
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= shingle_n
    )
    sig = df.where(has_shingles).select(
        F.col(id_col),
        lsh_band_keys(minhash_signature(F.col(text_col), shingle_n=shingle_n))
        .alias("bands"),
    )
    return (
        sig.select(id_col, F.explode("bands").alias("band_key"))
        .groupBy("band_key").agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
    )


# ---------------------------------------------------------- clustering


def dedup_clusters(pairs: DataFrame, id_col_a: str = "id_a",
                   id_col_b: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Connected components over near-dup candidate pairs →
    (doc_id, cluster_id) with cluster_id = min doc id in the component
    (the canonical keeper). Runs min-label propagation TO CONVERGENCE
    — the true component semantics, not a fixed round count (the
    DuckDB twin is an exact recursive-reachability CTE, so the oracle
    validates the semantics, not the iteration schedule).

    Pointer-jumping acceleration: each round takes the min over BOTH
    the neighbors' labels and the label-of-own-label (the large-star
    half of Kiveris et al.'s star contractions), so convergence needs
    O(log diameter) rounds, not O(diameter) — a 1000-link chain of
    near-dups converges in ~10 rounds. Each round is a few shuffles on
    8-byte ids; texts never move; `localCheckpoint` truncates lineage
    so total work stays O(rounds). `max_iter` is a hard safety bound:
    if it is ever hit before the fixpoint a warning reports how many
    labels were still moving.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = (
        pairs.select(F.col(id_col_a).alias("a"), F.col(id_col_b).alias("b"))
        .union(pairs.select(F.col(id_col_b).alias("a"),
                            F.col(id_col_a).alias("b")))
        .distinct()
        .persist()   # candidate generation (LSH) runs ONCE, not per round
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iter):
        neigh = (
            edges.join(labels.withColumnRenamed("id", "b")
                       .withColumnRenamed("label", "nb_label"), "b")
            .groupBy("a").agg(F.min("nb_label").alias("min_nb"))
        )
        # label-of-label lookup (pointer jumping): my label's current
        # label — shrinks label chains exponentially
        lol = labels.select(F.col("id").alias("label"),
                            F.col("label").alias("ll"))
        upd = (
            labels.join(neigh.withColumnRenamed("a", "id"), "id", "left")
            .join(lol, "label", "left")
            .select(
                "id",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("min_nb"), F.col("label")),
                    F.coalesce(F.col("ll"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()  # ONE job materializes the round; the
            # convergence probe below scans the cached result only
        )
        # existence probe (limit-1 short-circuit) on the cached round —
        # the exact changed count is only needed for the rare
        # non-convergence warning below
        changed = (
            upd.where(F.col("label") != F.col("old_label")).limit(1).count()
        )
        labels = upd.select("id", "label")
        if changed == 0:
            break
    if changed != 0:  # pragma: no cover - safety bound, not expected
        import warnings

        n_moving = upd.where(F.col("label") != F.col("old_label")).count()
        warnings.warn(
            f"dedup_clusters: {n_moving} labels still changing after "
            f"{max_iter} rounds; components may be split"
        )
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def dedup_clusters_sql(pairs_sql: str) -> str:
    """DuckDB twin: EXACT connected components via recursive
    reachability (min reachable node id = cluster id) — validates the
    converged semantics of :func:`dedup_clusters`, independent of its
    iteration schedule."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(id, node) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT id AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY id
"""


# ------------------------------------------------------------- simhash

_HI_NIBBLES = ["8", "9", "a", "b", "c", "d", "e", "f"]
SIMHASH_BITS = 32


def simhash32(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash per document (Charikar 2002 shape).

    Bit j is the majority vote over tokens of the j-th hex digit of
    md5(token): digit ≥ '8' votes +1, else −1; ties → 0 (bit off).
    Formulated as explode → single groupBy with 32 conditional sums →
    weighted recombination. One shuffle on id; all JVM-side; the hex
    formulation is DuckDB-portable (twin in __spark_entry__).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
            ).otherwise(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    votes = [
        F.sum(
            F.when(
                F.substring("h", j + 1, 1).isin(_HI_NIBBLES), 1
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash32_sql(text_col: str = "text", id_col: str = "doc_id",
                  table: str = "documents") -> str:
    words = (
        f"CASE WHEN trim({text_col}) = '' THEN [] "
        f"ELSE string_split_regex(trim(lower({text_col})), '\\s+') END"
    )
    votes = ", ".join(
        (
            "SUM(CASE WHEN substring(md5(tok), {p}, 1) IN "
            "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{j}"
        ).format(p=j + 1, j=j)
        for j in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        f"SELECT {id_col}, CAST({sim} AS BIGINT) AS simhash FROM ("
        f"SELECT {id_col}, {votes} FROM ("
        f"SELECT {id_col}, unnest({words}) AS tok FROM {table}"
        f") GROUP BY {id_col})"
    )


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR — native bit ops only."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)


def simhash_neardup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming(simhash) <= max_hamming)
    via BANDED byte buckets (Manku et al., WWW'07 shape): the 32-bit
    simhash splits into 4 byte-bands; by pigeonhole any pair within
    hamming 3 shares at least one untouched band, so the bucket join
    is EXACT for max_hamming <= 3 — no all-pairs scan. One shuffle on
    (band, byte) keys with the count-first degenerate-bucket cap;
    verification is a native xor/popcount on 8-byte signatures."""
    sims = persisted(simhash32(df, text_col, id_col))  # signature agg
    # runs once across the 4 band fan-outs and the verify joins;
    # registered cache — loop callers release via caching.release_cached()
    bands = sims.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(b)),
                        F.shiftright(F.col("simhash"), 8 * b)
                        .bitwiseAND(F.lit(255)).cast("string"))
            for b in range(4)
        ])).alias("bk"),
    )
    ok_keys = (
        bands.groupBy("bk").agg(F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("bk")
    )
    buckets = (
        bands.join(ok_keys, "bk", "left_semi")
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
    sa = sims.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"))
    sb = sims.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("hamming", hamming_distance(F.col("ha"), F.col("hb")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_neardup_pairs_sql(
    text_col: str = "text", id_col: str = "doc_id", table: str = "documents",
    max_hamming: int = 3, max_bucket: int = MAX_BUCKET,
) -> str:
    sims = simhash32_sql(text_col, id_col, table)
    return f"""
WITH sims AS ({sims}),
bands AS (
  SELECT {id_col}, CAST(b AS VARCHAR) || ':' ||
         CAST((simhash >> (8 * b)) & 255 AS VARCHAR) AS bk
  FROM sims, (SELECT unnest([0, 1, 2, 3]) AS b) t
),
ok AS (
  SELECT bk FROM bands GROUP BY bk
  HAVING COUNT(*) > 1 AND COUNT(*) <= {max_bucket}
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM bands a JOIN bands b USING (bk) JOIN ok USING (bk)
  WHERE a.{id_col} < b.{id_col}
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
FROM cand
JOIN sims sa ON sa.{id_col} = id_a
JOIN sims sb ON sb.{id_col} = id_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
"""


# -------------------------------------------------------- ngram jaccard


def _shingle_intersections(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int,
    max_df: int,
):
    """Shared machinery of the exact set-overlap pair family
    (:func:`ngram_jaccard_pairs`, :func:`ngram_overlap_pairs`):
    per-doc distinct shingle hashes → (inter, sizes), where `inter`
    is (id_a, id_b, n_common) with id_a < id_b and `sizes` the
    per-doc set sizes. Expressions identical to the original
    ngram_jaccard_pairs body (plan-preserving extraction)."""
    shing = df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_shingles(F.col(text_col), shingle_n))
        ).alias("sh"),
    )
    shing = persisted(shing.withColumn("sh", F.md5(F.col("sh"))))
    # shingling runs once, not once per downstream consumer (sizes /
    # hot-set / pair fan-out); registered cache — release_cached()
    sizes = shing.groupBy(id_col).agg(
        F.count(F.col("sh")).alias("n_sh")
    )
    # one shuffle on the shingle hash: per-shingle member lists, with
    # the stop-shingle (df > max_df) defusal applied COUNT-FIRST so a
    # corpus-wide shingle's member array is never materialized (the
    # semi-join shares the shuffle key → one reused Exchange); pairs
    # fan out natively from the sorted member array
    ok_sh = (
        shing.groupBy("sh").agg(F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_df))
        .select("sh")
    )
    buckets = (
        shing.join(ok_sh, "sh", "left_semi")
        .groupBy("sh")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("ids"))
    )
    inter = (
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
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return inter, sizes


def _with_sizes(inter: DataFrame, sizes: DataFrame, id_col: str) -> DataFrame:
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return inter.join(sa, "id_a").join(sb, "id_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingle SETS
    (id_a < id_b), keeping pairs ≥ threshold.

    jaccard = |A∩B| / (|A| + |B| − |A∩B|): intersection counts come
    from ONE shuffle on the shingle hash (groupBy → sorted member
    list → native pair fan-out → count per pair), sizes from a
    per-doc count — full texts never cross the wire, only
    (shingle_hash, id). Buckets with document frequency > max_df are
    dropped in the same aggregation (stop-shingle skew defusal: a
    corpus-wide phrase would otherwise fan out quadratically; near-dup
    semantics are unaffected at these thresholds).
    """
    inter, sizes = _shingle_intersections(
        df, text_col, id_col, shingle_n, max_df
    )
    return (
        _with_sizes(inter, sizes, id_col)
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def ngram_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """Containment detection: pairs ranked by the Szymkiewicz-Simpson
    OVERLAP COEFFICIENT |A∩B| / min(|A|, |B|) — the asymmetric
    measure that catches a document CONTAINED in another (a quoted
    article inside a boilerplate wrapper, a syndicated story with an
    appended footer), which symmetric Jaccard structurally misses:
    a 10x-longer superset caps Jaccard at ~0.1 while containment
    is 1.0. Same single-shuffle machinery as
    :func:`ngram_jaccard_pairs` (shared `_shingle_intersections`);
    output adds both one-sided containments (n_common/n_a,
    n_common/n_b) so the consumer can tell which side is the
    subset."""
    inter, sizes = _shingle_intersections(
        df, text_col, id_col, shingle_n, max_df
    )
    return (
        _with_sizes(inter, sizes, id_col)
        .withColumn(
            "overlap", F.col("n_common") / F.least("n_a", "n_b")
        )
        .where(F.col("overlap") >= threshold)
        .select(
            "id_a", "id_b", "n_common", "n_a", "n_b",
            F.round("overlap", 6).alias("overlap"),
            F.round(F.col("n_common") / F.col("n_a"), 6).alias("cont_a"),
            F.round(F.col("n_common") / F.col("n_b"), 6).alias("cont_b"),
        )
    )


def ngram_overlap_pairs_sql(
    text_col: str = "text", id_col: str = "doc_id", table: str = "documents",
    shingle_n: int = 3, threshold: float = 0.8, max_df: int = 1000,
) -> str:
    """DuckDB twin of :func:`ngram_overlap_pairs`."""
    sh_expr = word_shingles_sql(text_col, shingle_n)
    return f"""
WITH shing AS (
  SELECT {id_col}, md5(sh) AS sh FROM (
    SELECT {id_col}, unnest(list_distinct({sh_expr})) AS sh FROM {table}
  )
), sizes AS (
  SELECT {id_col}, COUNT(sh) AS n_sh FROM shing GROUP BY {id_col}
), ok AS (
  SELECT sh FROM shing GROUP BY sh
  HAVING COUNT(*) > 1 AND COUNT(*) <= {max_df}
), inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, COUNT(*) AS n_common
  FROM shing a JOIN shing b USING (sh) JOIN ok USING (sh)
  WHERE a.{id_col} < b.{id_col}
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       round(CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
         AS overlap,
       round(CAST(n_common AS DOUBLE) / sa.n_sh, 6) AS cont_a,
       round(CAST(n_common AS DOUBLE) / sb.n_sh, 6) AS cont_b
FROM inter
JOIN sizes sa ON sa.{id_col} = id_a
JOIN sizes sb ON sb.{id_col} = id_b
WHERE CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= {threshold}
"""


def ngram_jaccard_pairs_sql(
    text_col: str = "text", id_col: str = "doc_id", table: str = "documents",
    shingle_n: int = 3, threshold: float = 0.5, max_df: int = 1000,
) -> str:
    sh_expr = word_shingles_sql(text_col, shingle_n)
    return f"""
WITH shing AS (
  SELECT {id_col}, md5(sh) AS sh FROM (
    SELECT {id_col}, unnest(list_distinct({sh_expr})) AS sh FROM {table}
  )
), sizes AS (
  SELECT {id_col}, COUNT(sh) AS n_sh FROM shing GROUP BY {id_col}
), ok AS (
  SELECT sh FROM shing GROUP BY sh
  HAVING COUNT(*) > 1 AND COUNT(*) <= {max_df}
), inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, COUNT(*) AS n_common
  FROM shing a JOIN shing b USING (sh) JOIN ok USING (sh)
  WHERE a.{id_col} < b.{id_col}
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.{id_col} = id_a
JOIN sizes sb ON sb.{id_col} = id_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
"""


# -------------------------------------------------- edit-distance verify


def edit_verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.8,
    max_dist: int = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact edit-similarity verify over CANDIDATE pairs (id_a, id_b)
    — the ground-truth stage behind every probabilistic family:
    LSH/simhash/winnowing nominate, this confirms. edit_sim =
    1 − lev(a, b) / max(len_a, len_b) (the Lee et al. 2022 NearDup
    definition), kept when ≥ threshold.

    Scale design: pairs are the (count-first-capped) candidate
    output, so the two text joins here are the ONLY place texts move
    — and only candidate texts. ``max_dist`` engages Spark's banded
    levenshtein (the 3-arg form computes a |len_a − len_b| ≤ k band
    and answers -1 beyond it, turning O(n·m) into O(k·max(n,m)) per
    pair). A band answer of -1 equals "below threshold" only when
    the band is at least ceil((1 − threshold)·max_len) wide for the
    pair; when a caller's ``max_dist`` is narrower than that, the
    exact DP runs for JUST those rows (a lazily-evaluated CASE
    branch), so the result always equals the plain-levenshtein
    semantics — no silently lost near-dups (round-4 advisor).
    """
    ta = docs.select(F.col(id_col).alias("id_a"),
                     F.col(text_col).alias("_ta"))
    tb = docs.select(F.col(id_col).alias("id_b"),
                     F.col(text_col).alias("_tb"))
    j = pairs.select("id_a", "id_b").join(ta, "id_a").join(tb, "id_b")
    if max_dist is None:
        lev = F.levenshtein(F.col("_ta"), F.col("_tb"))
    else:
        banded = F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist)
        need = F.ceil(
            F.lit(1.0 - threshold)
            * F.greatest(F.length("_ta"), F.length("_tb"))
        )
        lev = (
            F.when(banded >= 0, banded)
            .when(F.lit(int(max_dist)) >= need, F.lit(-1))
            .otherwise(F.levenshtein(F.col("_ta"), F.col("_tb")))
        )
    j = j.select(
        "id_a", "id_b", lev.alias("lev"),
        F.greatest(F.length("_ta"), F.length("_tb")).alias("max_len"),
    ).where(F.col("lev") >= 0)
    return j.select(
        "id_a", "id_b", "lev", "max_len",
        F.round(
            F.lit(1.0) - F.col("lev") / F.col("max_len"), 6
        ).alias("edit_sim"),
    ).where(F.col("edit_sim") >= threshold)


def edit_verify_pairs_sql(
    docs_table: str,
    pairs_sql: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`edit_verify_pairs` (plain levenshtein —
    both engines implement the classic integer DP, so lev matches
    exactly; the band form equals it wherever it answers)."""
    return f"""
WITH p AS (SELECT id_a, id_b FROM ({pairs_sql})),
j AS (
  SELECT p.id_a, p.id_b,
         levenshtein(a.{text_col}, b.{text_col}) AS lev,
         greatest(length(a.{text_col}), length(b.{text_col})) AS max_len
  FROM p
  JOIN {docs_table} a ON a.{id_col} = p.id_a
  JOIN {docs_table} b ON b.{id_col} = p.id_b
)
SELECT id_a, id_b, lev, max_len,
       round(1.0 - CAST(lev AS DOUBLE) / max_len, 6) AS edit_sim
FROM j
WHERE round(1.0 - CAST(lev AS DOUBLE) / max_len, 6) >= {threshold}"""


# ----------------------------------------------------- canonical filter


def keep_canonical(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """The dedup FILTER step: drop every near-duplicate except its
    cluster's canonical keeper (min doc id in the connected component,
    the `dedup_clusters` label), keep all unpaired documents.

    This is the operator a pipeline actually ships — candidates and
    clusters are diagnostics; the corpus that proceeds to training is
    `keep_canonical(docs, candidate_pairs)`.

    Plan shape at 100 TB: `dedup_clusters` runs over ids only (texts
    never enter); the drop-list (members whose label != own id) is a
    further subset, and the final step is ONE anti-join of the full
    documents table against that id-only list — shuffle carries just
    the 8-byte keys on the small side, and AQE converts the anti-join
    to broadcast whenever the drop-list fits (typical dup rates keep
    it far below the corpus size).
    """
    labels = dedup_clusters(pairs)
    drop = labels.where(F.col("cluster_id") != F.col(id_col)) \
                 .select(id_col)
    return docs.join(drop, id_col, "left_anti")


def keep_canonical_sql(docs_table: str, pairs_sql: str,
                       id_col: str = "doc_id",
                       columns: str = "*") -> str:
    """DuckDB twin: exact recursive-reachability clusters → anti-join."""
    clusters = dedup_clusters_sql(pairs_sql)
    return f"""
SELECT {columns} FROM {docs_table}
WHERE {id_col} NOT IN (
  SELECT doc_id FROM ({clusters}) WHERE cluster_id != doc_id
)
"""


def keep_best(docs: DataFrame, pairs: DataFrame, score_col: str,
              id_col: str = "doc_id") -> DataFrame:
    """Quality-keyed canonical selection: like :func:`keep_canonical`
    but each near-dup cluster keeps its HIGHEST-``score_col`` member
    (ties → lowest id) instead of the lowest id — the rule real
    pipelines want when near-duplicates differ in quality (the
    boilerplate-wrapped syndication copy loses to the clean
    original; compose the score from gopher_gate / quality_classifier
    / lm perplexity).

    Plan shape matches keep_canonical: clusters over ids only; the
    per-cluster argmax is a window over CLUSTER MEMBERS only (the
    tiny labels relation joined to an (id, score) projection — texts
    never enter); the final step is ONE id-only anti-join against
    the losers. NULL scores rank last on both engines (explicit
    NULLS LAST — Spark and DuckDB default differently on ASC)."""
    labels = dedup_clusters(pairs)
    scored = labels.join(
        docs.select(F.col(id_col), F.col(score_col).alias("_score")),
        id_col,
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc_nulls_last("_score"), F.asc(id_col)
    )
    losers = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def keep_best_sql(docs_table: str, pairs_sql: str, score_col: str,
                  id_col: str = "doc_id", columns: str = "*") -> str:
    """DuckDB twin of :func:`keep_best`."""
    clusters = dedup_clusters_sql(pairs_sql)
    return f"""
SELECT {columns} FROM {docs_table}
WHERE {id_col} NOT IN (
  SELECT {id_col} FROM (
    SELECT c.{id_col},
           row_number() OVER (
             PARTITION BY c.cluster_id
             ORDER BY d.{score_col} DESC NULLS LAST, c.{id_col} ASC
           ) AS rn
    FROM ({clusters}) c
    JOIN {docs_table} d USING ({id_col})
  ) WHERE rn > 1
)
"""


# ----------------------------------------------------- line-level dedup


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 15,
) -> DataFrame:
    """Corpus-WIDE exact line deduplication (the CCNet/Dolma paragraph
    dedup stage): every distinct trimmed line of >= `min_len` chars is
    kept only at its globally FIRST occurrence (min (id, position)),
    and every later instance is removed from its document's text.
    This is the boilerplate killer — cookie banners, nav menus, and
    license footers repeat across millions of pages and survive
    document-level dedup because the surrounding text differs.

    Returns `df` with `text_col` rewritten and an added `n_dropped`
    (lines removed). Lines shorter than `min_len` (after trim) are
    never dedup candidates and always survive.

    Plan shape at 100 TB: candidate lines reduce to (md5, id, pos)
    triples — texts themselves never enter the dedup shuffles. One
    groupBy on the 16-byte line hash with map-side partial min/count
    (a line duplicated 10^9 times — "Home" — partially aggregates per
    partition, so the hot key is skew-safe); the drop-list derivation
    re-joins the triples on the same hash key (Exchange reuse / AQE);
    drops collapse to one (id, positions[]) row per AFFECTED document
    and join back to the table on its id (broadcast when the dup rate
    is low, and Exchange-free when the documents table is bucketed by
    id — compose with jobs/bucketize.py). The rewrite itself is a
    map-only native filter over the split array by position.
    """
    lines = df.select(
        F.col(id_col).alias("__did"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__pos", "__line"
        ),
    ).where(F.length(F.trim(F.col("__line"))) >= min_len)
    keyed = lines.select(
        "__did", "__pos", F.md5(F.trim(F.col("__line"))).alias("__lh")
    )
    firsts = keyed.groupBy("__lh").agg(
        F.min(F.struct("__did", "__pos")).alias("__first"),
        F.count("*").alias("__cnt"),
    )
    drops = (
        keyed.join(firsts.where(F.col("__cnt") > 1), "__lh")
        .where(F.struct("__did", "__pos") != F.col("__first"))
        .groupBy("__did")
        .agg(F.collect_set("__pos").alias("__drop"))
    )
    joined = df.join(
        drops, df[id_col] == drops["__did"], "left"
    )
    rewritten = F.when(
        F.col("__drop").isNull(), F.col(text_col)
    ).otherwise(
        F.array_join(
            F.filter(
                F.split(F.col(text_col), "\n"),
                lambda x, i: ~F.array_contains(F.col("__drop"), i),
            ),
            "\n",
        )
    )
    n_dropped = F.coalesce(
        F.size("__drop"), F.lit(0)
    ).cast("long").alias("n_dropped")
    keep_cols = [c for c in df.columns if c != text_col]
    return joined.select(
        *keep_cols, rewritten.alias(text_col), n_dropped
    )


def dedup_lines_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 15,
    columns: str = "",
) -> str:
    """DuckDB twin of :func:`dedup_lines` (window row_number stands in
    for the min-struct arg-min; identical first-occurrence order).
    `columns` = extra passthrough columns, comma-led."""
    return f"""
WITH src AS MATERIALIZED (
  SELECT {id_col} AS did, {text_col} AS t{columns} FROM {table}
), lines AS (
  SELECT did, unnest(generate_series(1, len(ls))) - 1 AS pos,
         unnest(ls) AS line
  FROM (SELECT did, string_split(t, chr(10)) AS ls FROM src)
), ranked AS (
  SELECT did, pos,
         row_number() OVER (
           PARTITION BY md5(trim(line)) ORDER BY did, pos
         ) AS rn,
         count(*) OVER (PARTITION BY md5(trim(line))) AS cnt
  FROM lines WHERE length(trim(line)) >= {min_len}
), drops AS (
  SELECT did, list(pos) AS dl FROM ranked
  WHERE rn > 1 AND cnt > 1 GROUP BY did
)
SELECT s.did AS {id_col}{columns},
  CASE WHEN d.dl IS NULL THEN s.t
       ELSE coalesce(array_to_string(
            list_filter(string_split(s.t, chr(10)),
            (x, i) -> NOT list_contains(d.dl, i - 1)), chr(10)), '') END
    AS {text_col},
  CAST(coalesce(len(d.dl), 0) AS BIGINT) AS n_dropped
FROM src s LEFT JOIN drops d USING (did)
"""
