"""Sampling & cross-validation splits.

Reference: ``flink/src/main/scala/io/ddf/flink/analytics/CrossValidation.
scala`` — CVRandom = k independent seeded train/test filters (``:39-49,
67-100``), CVKFold = same-seed random bucket partitioning (``:56-65,
102-132``). Fraction/exact sampling lives in views (``content/ViewHandler.
scala:17-41``).

Spark build: k-fold assigns each row a bucket and carves k train/test
filter pairs from it. With an ``id_col`` the bucket is
``md5_long(seed || id) % k`` — a pure column expression, deterministic
under ANY partitioning/recomputation (executor loss, AQE re-plan) and
reproducible cross-engine, so fold membership is part of the data, not
of the execution. Without an id the bucket falls back to ``F.rand(seed)``
and the bucketed frame is ``.cache()``-materialized: ``rand(seed)`` is
only deterministic per (partition, row-position), so an uncached plan
that recomputes the scan under different partitioning would silently
break train/test disjointness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "random_split",
    "cv_random",
    "cv_k_fold",
    "sample_weighted",
    "sample_weighted_deterministic",
    "sample_by_deterministic",
    "sample_to_budget",
]


def sample_by_deterministic(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """``sampleBy`` (per-stratum Bernoulli) with the RNG replaced by an
    md5-keyed uniform: keep a row iff
    ``md5_long(seed:id) / 2^60 < fractions[stratum]`` — selection is a
    property of the data, so the SAME rows are chosen by any engine, any
    run, any partition layout (the reproducible class-rebalancing
    contract; ``df.sampleBy`` stays as the engine-native seeded path).
    Strata absent from ``fractions`` are dropped (sampleBy semantics).
    Pure column expressions — a pushable filter, zero shuffle."""
    from ..functions.dedup import md5_long

    u = md5_long(F.col(id_col).cast("string"), salt=seed).cast("double") / F.lit(
        float(2**60)
    )
    frac = F.lit(None).cast("double")
    for k, v in fractions.items():
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return df.filter(frac.isNotNull() & (u < frac))


def random_split(df: DataFrame, weights: list[float], seed: int = 42) -> list[DataFrame]:
    """Weighted random split (Spark built-in; Bernoulli per row)."""
    return df.randomSplit(list(weights), seed=seed)


def cv_random(
    df: DataFrame, k: int, train_size: float = 0.75, seed: int = 42
) -> list[tuple[DataFrame, DataFrame]]:
    """k independent random train/test splits (``CrossValidation.scala:39-49``)."""
    out = []
    for i in range(k):
        train, test = df.randomSplit([train_size, 1 - train_size], seed=seed + i)
        out.append((train, test))
    return out


def cv_k_fold(
    df: DataFrame, k: int, seed: int = 42, id_col: str | None = None
) -> list[tuple[DataFrame, DataFrame]]:
    """k-fold pairwise-disjoint splits (``CrossValidation.scala:56-65,102-132``).

    One bucket column, k filters: fold i's test = bucket i, train = the rest.
    With ``id_col``, bucket = ``md5_long(seed || id) % k`` — deterministic
    under recomputation/repartitioning and identical in any engine
    (DuckDB mirror of :func:`~ddf_flink_spark.functions.dedup.md5_long`),
    so folds are stable without materialization. Without an id the bucket
    is ``rand(seed)`` and the frame is cached: ``rand`` pins values only
    per (partition, row-position), so recomputation under a different
    split would otherwise break disjointness.
    """
    if id_col is not None:
        from ..functions.dedup import md5_long

        bucket = F.pmod(md5_long(F.col(id_col).cast("string"), salt=seed), F.lit(k))
        with_bucket = df.withColumn("__fold", bucket)
    else:
        with_bucket = df.withColumn(
            "__fold", (F.rand(seed) * k).cast("int")
        ).cache()
    out = []
    for i in range(k):
        test = with_bucket.filter(F.col("__fold") == i).drop("__fold")
        train = with_bucket.filter(F.col("__fold") != i).drop("__fold")
        out.append((train, test))
    return out


def sample_weighted(
    df: DataFrame, weight_col: str, n: int, seed: int = 42
) -> DataFrame:
    """Weighted random sample of ``n`` rows without replacement
    (Efraimidis-Spirakis A-ES): each row draws u ~ U(0,1) and keys on
    u^(1/w); the n largest keys realize n successive weight-proportional
    draws without replacement. (Inclusion probabilities are therefore
    only approximately proportional to weight — exact proportional
    inclusion is strict πps sampling, a different scheme; the
    approximation tightens as n/N shrinks.)

    The data-mixing primitive of a training pipeline ("sample sources
    proportional to quality×size caps"). Distributed as a top-n
    (TakeOrdered: per-partition heap + driver merge of n candidates) —
    no global sort, no per-partition reservoir state, no driver loop.
    Rows with weight ≤ 0 are excluded (their inclusion probability is 0).
    """
    key = F.pow(F.rand(seed), F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"))
        .limit(n)
        .drop("__wkey")
    )


def sample_weighted_deterministic(
    df: DataFrame, weight_col: str, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """``sample_weighted`` with the randomness replaced by an md5-keyed
    uniform — u(row) = (md5_long(id) + 1) / (2^60 + 1) — so the SAME rows
    are selected by any engine, any run, any partitioning: the
    reproducible-data-mixing contract (rerun the pipeline next quarter,
    or in a different engine, and the training mix is identical).

    Ranking uses ln(u)/w, monotone-equivalent to the A-ES key u^(1/w),
    ROUNDED to 8 digits with an id tie-break so libm ulp differences
    between engines cannot reorder the frontier. Same distributed shape
    as ``sample_weighted``: a top-n heap, no global sort. Rows with
    weight <= 0 are excluded."""
    from ..functions.dedup import md5_long

    u = (md5_long(F.col(id_col).cast("string")) + F.lit(1)).cast("double") / F.lit(
        float(2**60 + 1)
    )
    key = F.round(F.log(u) / F.col(weight_col), 8)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), F.col(id_col))
        .limit(n)
        .drop("__wkey")
    )


def sample_to_budget(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: float,
    order_col: str,
) -> DataFrame:
    """Budget-capped per-group selection — the corpus-mixing primitive:
    keep each group's rows, in deterministic ``order_col`` order, until
    the group's cumulative ``weight_col`` (chars/tokens/bytes) exceeds
    ``budget``.

    One hash-partitioned window per group (running sum + filter): a
    single shuffle on the group key, no driver-side state, and the
    per-group sort is bounded by group size — at 100 TB with per-source
    groups this is exactly the shape the sort-based window operator
    spills gracefully on. Deterministic (no RNG): the same inputs always
    select the same rows, which is what makes training mixes
    reproducible and oracle-checkable (vs fraction sampling's
    engine-specific RNG).

    PRECONDITION: ``order_col`` must be unique within each group (a doc
    id, not a timestamp with ties) — with ties the running sum's order,
    and therefore the selected prefix, would depend on shuffle arrival
    order, which is exactly the nondeterminism this operator exists to
    rule out."""
    w = Window.partitionBy(group_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("__cum_weight", F.sum(weight_col).over(w))
        .filter(F.col("__cum_weight") <= budget)
        .drop("__cum_weight")
    )
