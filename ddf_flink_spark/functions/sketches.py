"""Mergeable cardinality sketches: the KMV (k-minimum-values) estimator.

The production approximate-distinct path is Spark's built-in
HyperLogLog++ (``approx_count_distinct``, registry q77) — constant
memory, JVM-side, but engine-specific (its estimate is not reproducible
outside Spark). KMV is the interchange/verification member of the same
family: hash every value with the cross-engine 60-bit md5 hash
(:func:`~ddf_flink_spark.functions.dedup.md5_long`), keep the k smallest
DISTINCT hash fractions u ∈ (0,1), and estimate D ≈ (k-1)/u_(k)
[Bar-Yossef et al. 2002, "Counting distinct elements in a data stream"].
Any md5-capable engine reproduces the identical k values and therefore
the identical estimate — so the sketch itself is oracle-checkable, not
just its error bound.

Scale shape: the hash projection is a map-only pass; the distinct on the
60-bit hash is the one shuffle (carrying 8-byte values, never the raw
column); the k-smallest selection is a TakeOrdered heap (per-partition
top-k, driver merge of k values), never a global sort. The sketch state
is k doubles, trivially mergeable across partitions/days by keeping the
k smallest of the union — the property that makes KMV the right shape
for incremental 100 TB cardinality tracking.

Reference parity: the reference has no sketch surface at all; its only
distinct path is exact GROUP BY (``AggregationHandler.scala``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

__all__ = [
    "kmv_fractions",
    "kmv_distinct",
    "countmin_counters",
    "countmin_estimate",
    "countmin_bucket_rows",
    "bloom_build_words",
    "bloom_member",
    "bloom_filter_members",
    "BLOOM_WORD_BITS",
]

# Bloom words pack 60 bits each so every mask 1<<b stays a positive
# BIGINT in any engine (bit 63 would go negative in Spark and overflow
# DuckDB's signed shift).
BLOOM_WORD_BITS = 60

# Fraction denominator. float(2^60 + 1) rounds to exactly 2^60 in double,
# so u = (h+1)/2^60 with h ∈ [0, 2^60): u > 0 always (no divide-by-zero in
# the estimator) and u = 1.0 is reachable only for the single hash value
# 2^60−1 (probability 2^-60 per element), where (k-1)/u degrades to the
# harmless estimate k−1 — not a failure mode worth a biased denominator.
_KMV_DENOM = float(2**60 + 1)


def kmv_fractions(df: DataFrame, col: str | Column, k: int = 256) -> DataFrame:
    """The k smallest distinct hash fractions of ``col`` — the sketch
    itself, as a k-row DataFrame (u DOUBLE). Mergeable: union two
    sketches and keep the k smallest. NULLs are excluded before
    hashing: a NULL hashes to a NULL fraction, which would sort first
    under Spark's ASC NULLS FIRST and occupy a sketch slot (and order
    differently in engines defaulting to NULLS LAST).

    DISTINCT and the k-smallest selection run on the EXACT 60-bit
    BIGINT hash — never on doubles, whose 53-bit mantissa would collapse
    distinct hashes and bias the estimator; only the k surviving values
    are converted to fractions at the end (the DuckDB oracle, registry
    q174, replays the same exact-integer discipline)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        df.filter(c.isNotNull())
        .select(md5_long(c.cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .select(
            ((F.col("h") + F.lit(1)).cast("double") / F.lit(_KMV_DENOM)).alias("u")
        )
    )


def kmv_distinct(df: DataFrame, col: str | Column, k: int = 256) -> DataFrame:
    """One-row (k, est_distinct) cardinality estimate from the KMV
    sketch. When the sketch is FULL (≥ k distinct values seen) the
    estimator is D ≈ (k-1) / u_(k); when it is not full it holds every
    distinct hash, so the sketch size IS the exact answer and the
    estimator is bypassed — applying (k-1)/max(u) to a non-full sketch
    would report ~k regardless of the true cardinality (a ~100×
    overestimate on a 3-distinct column)."""
    return kmv_fractions(df, col, k).agg(
        F.lit(k).cast("long").alias("k"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
            .otherwise((F.lit(k) - 1) / F.max("u")),
            4,
        ).alias("est_distinct"),
    )


def _cm_bucket_col(base_mod_p: Column, r: int, width: int) -> Column:
    """Row-r bucket: the MinHash affine family reapplied, then % width."""
    from .dedup import MINHASH_MERSENNE_P, _minhash_a, _minhash_b

    return (
        (F.lit(_minhash_a(r)) * base_mod_p + F.lit(_minhash_b(r)))
        % F.lit(MINHASH_MERSENNE_P)
    ) % F.lit(width)


def countmin_bucket_rows(
    df: DataFrame, col: str | Column, depth: int = 4, width: int = 1024
) -> DataFrame:
    """One (r, bucket) row per (record, hash-row) — the map-side
    codegen'd expansion shared by the batch grid and the streaming
    state-store grid (streaming/stateful.countmin_grid_stateful). Works
    on batch AND streaming frames (pure column expressions)."""
    from .dedup import MINHASH_MERSENNE_P, md5_long

    c = F.col(col) if isinstance(col, str) else col
    base = md5_long(c.cast("string")) % F.lit(MINHASH_MERSENNE_P)
    rows = F.array(*[_cm_bucket_col(base, r, width) for r in range(depth)])
    return df.select(F.posexplode(rows).alias("r", "bucket"))


def countmin_counters(
    df: DataFrame, col: str | Column, depth: int = 4, width: int = 1024
) -> DataFrame:
    """COUNT-MIN SKETCH counter table [Cormode & Muthukrishnan 2005]:
    ``depth`` independent hash rows of ``width`` counters each;
    counter(r, c) = #items whose row-r hash lands in bucket c. Point
    estimate for any key = min over rows of its counters — always an
    OVERestimate (collisions only add), with ε ≈ e/width relative to
    the stream mass at δ ≈ e^-depth confidence.

    Cross-engine by construction: base = md5_long(key) once, row hashes
    from the same affine mod-Mersenne family as the MinHash md5 path —
    DuckDB rebuilds the identical counter table. The sketch is depth×width
    integers, trivially mergeable by cell-wise addition (the property
    that makes CMS the per-partition/per-day heavy-hitter accumulator
    at 100 TB: sketch each shard, add the grids).

    Execution shape: occurrences are pre-aggregated per DISTINCT key
    first (one map-side-combining groupBy over the raw rows), so the
    md5 runs once per distinct key instead of once per row and the
    explode emits depth rows per KEY, not per row; the grid cell is
    then the weighted sum. On sf0.1 lineitem.l_partkey (6M rows, 200k
    keys) this cut the md5+conv work 30× (measured 7.7 s → sub-second
    warm); counter values are identical by construction. q108's exact
    groupBy heavy-hitters is the small-corpus twin."""
    from .dedup import MINHASH_MERSENNE_P, md5_long

    c = F.col(col) if isinstance(col, str) else col
    per_key = (
        df.select(c.cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = md5_long(F.col("k")) % F.lit(MINHASH_MERSENNE_P)
    rows = F.array(*[_cm_bucket_col(base, r, width) for r in range(depth)])
    return (
        per_key.select("n", F.posexplode(rows).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.sum("n").alias("c"))
    )


def countmin_estimate(
    spark,
    counters: DataFrame,
    probe_keys: list[str],
    depth: int = 4,
    width: int = 1024,
    hash_keys: list[str] | None = None,
) -> DataFrame:
    """Point-frequency estimates for ``probe_keys`` from a
    :func:`countmin_counters` table: min over the key's depth counters
    (missing counter cell → 0). The probe buckets are computed
    DRIVER-SIDE with hashlib's md5 (bit-identical to ``md5_long``; see
    test_md5_long_matches_hashlib) so the probe frame is a tiny literal
    broadcast — the counter table is never rescanned per key.

    KEY CONTRACT: the grid hashed ``CAST(col AS STRING)``, so each probe
    must be the ENGINE's string rendering of the value — for string and
    integer columns that's the value itself, but e.g. a double 1 renders
    as ``'1.0'`` and a probe of ``'1'`` would silently read collision
    noise from the wrong buckets. ``hash_keys`` (parallel to
    ``probe_keys``) supplies those renderings when they differ;
    ``DDF.frequency_estimates`` normalizes automatically by round-
    tripping each probe through the column's type engine-side."""
    import hashlib

    from .dedup import MINHASH_MERSENNE_P, _minhash_a, _minhash_b

    hks = hash_keys if hash_keys is not None else probe_keys
    if len(hks) != len(probe_keys):
        raise ValueError("hash_keys must be parallel to probe_keys")
    rows = []
    for k, hk in zip(probe_keys, hks):
        base = int(hashlib.md5(hk.encode()).hexdigest()[:15], 16) % MINHASH_MERSENNE_P
        for r in range(depth):
            b = ((_minhash_a(r) * base + _minhash_b(r)) % MINHASH_MERSENNE_P) % width
            rows.append((k, r, b))
    from .exprs import values_df

    # VALUES LocalRelation, not createDataFrame: a 20-row probe frame
    # is model state — building it must not launch 32 Python-worker
    # tasks (see exprs.values_df; measured 1.4 s/invocation on local[32])
    probes = values_df(spark, rows, "key string, r int, bucket int")
    return (
        probes.join(counters, ["r", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def _bloom_positions(base_mod_p: Column, k: int, m_bits: int) -> list[Column]:
    """k bit positions from the shared affine mod-Mersenne family (the
    same plan-time-literal (a_i, b_i) members MinHash/CMS use) — any
    md5-capable engine recomputes them exactly."""
    from .dedup import MINHASH_MERSENNE_P, _minhash_a, _minhash_b

    return [
        (
            (F.lit(_minhash_a(i)) * base_mod_p + F.lit(_minhash_b(i)))
            % F.lit(MINHASH_MERSENNE_P)
        )
        % F.lit(m_bits)
        for i in range(k)
    ]


def bloom_build_words(
    df: DataFrame, col: str | Column, m_bits: int = 16384, k: int = 4
) -> DataFrame:
    """BLOOM FILTER [Bloom 1970] over the values of ``col`` as a packed
    word table: (word int, bits long) with ``bits`` the BIT_OR of
    ``1 << (pos % 60)`` for every of the k positions landing in that
    60-bit word. Cross-engine by construction (md5 base + the affine
    family + integer shifts — DuckDB rebuilds the identical words,
    registry q207).

    Scale shape: one explode (k rows per value) + one groupBy over at
    most ⌈m/60⌉ words — the filter is O(m) bits REGARDLESS of input
    cardinality, mergeable by cell-wise BIT_OR, and small enough to
    broadcast (16384 bits = 274 longs). This is the membership twin of
    the counting CMS: CMS answers "how often", Bloom answers "possibly
    present" with zero false negatives — the decontamination /
    blocklist primitive at 100 TB (the filter rides the closure of a
    map-only corpus scan; the corpus never shuffles)."""
    from .dedup import MINHASH_MERSENNE_P

    c = F.col(col) if isinstance(col, str) else col
    base = md5_long(c.cast("string")) % F.lit(MINHASH_MERSENNE_P)
    cells = F.array(
        *[
            F.struct(
                (p / F.lit(BLOOM_WORD_BITS)).cast("int").alias("word"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (p % F.lit(BLOOM_WORD_BITS)).cast("int"),
                ).alias("mask"),
            )
            for p in _bloom_positions(base, k, m_bits)
        ]
    )
    # NULLs hash to NULL positions, which would occupy a junk NULL-word
    # row in the table (same discipline as kmv_fractions: exclude them —
    # NULL is not a member of any set)
    return (
        df.filter(c.isNotNull())
        .select(F.explode(cells).alias("cell"))
        .select("cell.word", "cell.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_member(
    col: str | Column, words: dict[int, int], m_bits: int = 16384, k: int = 4
) -> Column:
    """Membership test as a PURE COLUMN EXPRESSION against a collected
    words dict {word: bits} (the filter is model state — O(m) bits —
    so collecting it to the driver and inlining it as a plan-time
    literal array is the broadcast-free, join-free probe shape: the
    probing scan stays map-only at any corpus size). True ⟺ all k bits
    set; no false negatives by construction."""
    from .dedup import MINHASH_MERSENNE_P

    n_words = (m_bits + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    arr = F.array(
        *[F.lit(int(words.get(w, 0))).cast("long") for w in range(n_words)]
    )
    c = F.col(col) if isinstance(col, str) else col
    base = md5_long(c.cast("string")) % F.lit(MINHASH_MERSENNE_P)
    cond = F.lit(True)
    for p in _bloom_positions(base, k, m_bits):
        word = (p / F.lit(BLOOM_WORD_BITS)).cast("int")
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (p % F.lit(BLOOM_WORD_BITS)).cast("int"),
        )
        cond = cond & (F.element_at(arr, word + 1).bitwiseAND(mask) == mask)
    return cond


def bloom_filter_members(
    df: DataFrame,
    col: str | Column,
    words_df: DataFrame,
    m_bits: int,
    k: int = 4,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` is POSSIBLY in the Bloom filter (all
    k bits set; no false negatives). For filters too large to inline as
    a plan literal (``bloom_member``'s shape), the probe is k BROADCAST
    hash joins against the (word, bits) table — one per hash function —
    so the probed corpus never shuffles and gains no groupBy: each join
    attaches one word's bits and the membership conjunction is a plain
    column predicate. Output columns = input columns."""
    from .dedup import MINHASH_MERSENNE_P

    c = F.col(col) if isinstance(col, str) else col
    base = md5_long(c.cast("string")) % F.lit(MINHASH_MERSENNE_P)
    out = df
    cond = F.lit(True)
    for i, p in enumerate(_bloom_positions(base, k, m_bits)):
        wname, bname, mname = f"_bw{i}", f"_bb{i}", f"_bm{i}"
        out = out.withColumn(wname, (p / F.lit(BLOOM_WORD_BITS)).cast("int"))
        out = out.withColumn(
            mname,
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (p % F.lit(BLOOM_WORD_BITS)).cast("int"),
            ),
        )
        out = out.join(
            F.broadcast(
                words_df.select(
                    F.col("word").alias(wname), F.col("bits").alias(bname)
                )
            ),
            wname,
            "left",
        )
        cond = cond & (
            F.coalesce(F.col(bname), F.lit(0).cast("long")).bitwiseAND(F.col(mname))
            == F.col(mname)
        )
    return out.filter(cond).select(*df.columns)
