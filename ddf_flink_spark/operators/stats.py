"""Statistics operators — the reference's "R data.frame" surface.

Reference: ``flink/src/main/scala/io/ddf/flink/analytics/StatisticsHandler.
scala`` — one-pass per-column summary via a custom Flink accumulator
(``:46-54,221-254``), five-num / quantiles via per-partition TDigest merge
(``:56-90,124-160``), plus covariance (``utils/package.scala:34-119``) and
fixed-bin histogram (``analytics/BinningHandler.scala:184-225``,
``utils/HistogramForDouble.java``).

Spark build: each scalar surface is ONE ``df.agg`` job — Catalyst's partial
aggregation replaces the accumulator machinery; quantiles use the built-in
Greenwald-Khanna sketch (``approx_percentile``/``approxQuantile``), the same
mergeable-sketch strategy as the reference's TDigest (tail values differ
within eps — SURVEY §7.3). At 100 TB each of these is a single scan with
map-side partials; nothing collects more than a few rows to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "summary",
    "simple_summary",
    "five_num_summary",
    "vector_quantiles",
    "vector_mean",
    "vector_variance",
    "vector_covariance",
    "vector_histogram",
    "histogram_quantile_sketch",
    "histogram_quantile_sketch_grouped",
    "factor_level_counts",
]

_NUMERIC = {"int", "integer", "long", "bigint", "float", "double", "short", "decimal"}


def _numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if f.dataType.typeName() in _NUMERIC]


def summary(df: DataFrame) -> dict[str, dict]:
    """Per-column {mean, stdev, variance, count, na_count, min, max} in ONE
    pass (``StatisticsHandler.scala:46-54,221-254``).

    NA counting follows the reference quirk: for string columns the literal
    string "NA" counts as missing (``:244-249``); numeric columns count SQL
    nulls. Numeric stats only exist for numeric columns (non-numeric get
    count/na_count).
    """
    num = set(_numeric_columns(df))
    aggs = []
    for c in df.columns:
        if c in num:
            aggs += [
                F.avg(c).alias(f"{c}__mean"),
                F.stddev_samp(c).alias(f"{c}__stdev"),
                F.var_samp(c).alias(f"{c}__variance"),
                F.count(c).alias(f"{c}__count"),
                F.sum(F.isnull(c).cast("long")).alias(f"{c}__na"),
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
            ]
        else:
            aggs += [
                F.count(c).alias(f"{c}__count"),
                F.sum((F.isnull(c) | (F.col(c).cast("string") == "NA")).cast("long")).alias(f"{c}__na"),
            ]
    row = df.agg(*aggs).first().asDict()
    out: dict[str, dict] = {}
    for c in df.columns:
        if c in num:
            out[c] = {
                "mean": row[f"{c}__mean"],
                "stdev": row[f"{c}__stdev"],
                "variance": row[f"{c}__variance"],
                "count": row[f"{c}__count"],
                "na_count": row[f"{c}__na"] or 0,
                "min": row[f"{c}__min"],
                "max": row[f"{c}__max"],
            }
        else:
            out[c] = {"count": row[f"{c}__count"], "na_count": row[f"{c}__na"] or 0}
    return out


def simple_summary(df: DataFrame, factor_columns: list[str] | None = None) -> dict:
    """Distinct values for factor cols; min/max for numeric cols
    (``StatisticsHandler.scala:162-204``)."""
    factor_columns = factor_columns or [
        f.name for f in df.schema.fields if f.dataType.typeName() in ("string", "boolean")
    ]
    num_cols = [c for c in _numeric_columns(df) if c not in factor_columns]
    out: dict[str, dict] = {}
    if num_cols:
        aggs = [F.min(c).alias(f"{c}__min") for c in num_cols]
        aggs += [F.max(c).alias(f"{c}__max") for c in num_cols]
        row = df.agg(*aggs).first().asDict()
        for c in num_cols:
            out[c] = {"min": row[f"{c}__min"], "max": row[f"{c}__max"]}
    for c in factor_columns:
        vals = [r[0] for r in df.select(c).distinct().collect()]
        out[c] = {"values": sorted(v for v in vals if v is not None)}
    return out


def five_num_summary(df: DataFrame, columns: list[str] | None = None, eps: float = 0.001) -> dict:
    """min/max/Q1/median/Q3 per numeric column
    (``StatisticsHandler.scala:56-90``) via one multi-column GK sketch pass."""
    cols = columns or _numeric_columns(df)
    qs = df.approxQuantile(cols, [0.0, 0.25, 0.5, 0.75, 1.0], eps)
    return {
        c: {"min": q[0], "q1": q[1], "median": q[2], "q3": q[3], "max": q[4]}
        for c, q in zip(cols, qs)
    }


def vector_quantiles(
    df: DataFrame, column: str, probabilities: list[float], eps: float = 0.01
) -> list[float]:
    """Arbitrary percentiles on one column (``StatisticsHandler.scala:124-160``).
    Integral columns floor the result, matching the reference."""
    vals = df.approxQuantile(column, list(probabilities), eps)
    typ = dict(df.dtypes)[column]
    if typ in ("int", "bigint", "smallint", "tinyint"):
        return [float(math.floor(v)) for v in vals]
    return vals


def vector_mean(df: DataFrame, column: str) -> float:
    """AVG with null guard (``StatisticsHandler.scala:101-110``)."""
    return df.agg(F.avg(column)).first()[0]


def vector_variance(df: DataFrame, column: str) -> list[float]:
    """[variance, stdev] (``StatisticsHandler.scala:92-99``)."""
    row = df.agg(F.var_samp(column), F.stddev_samp(column)).first()
    return [row[0], row[1]]


def vector_covariance(df: DataFrame, col_a: str, col_b: str) -> float:
    """Sample covariance — the reference hand-rolls the Chan et al. merge
    (``utils/package.scala:34-119``); Spark's ``df.stat.cov`` is the same
    one-pass co-moment algorithm."""
    return df.stat.cov(col_a, col_b)


def vector_histogram(df: DataFrame, column: str, num_bins: int) -> list[tuple[float, int]]:
    """Fixed-bin histogram (``BinningHandler.scala:184-221``): compute
    min/max, build equal-width boundaries, count per bin.

    One agg for min/max + one JVM-side bucket groupBy — no RDD, no
    accumulator. Returns [(bin_left_edge, count)] including empty bins.
    """
    lo, hi = df.agg(F.min(column), F.max(column)).first()
    if lo is None:
        return []
    lo, hi = float(lo), float(hi)
    if lo == hi:
        return [(lo, df.filter(F.col(column).isNotNull()).count())]
    width = (hi - lo) / num_bins
    bucket = F.least(
        F.floor((F.col(column) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(num_bins - 1),
    )
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(column).isNotNull())
        .groupBy(bucket.alias("b"))
        .count()
        .collect()
    }
    return [(lo + i * width, counts.get(i, 0)) for i in range(num_bins)]


def factor_level_counts(df: DataFrame, columns: list[str]) -> dict[str, dict]:
    """All-columns level→count maps in one distributed pass
    (``content/SchemaHandler.scala:90-185`` GetMultiFactor).

    Spark shape: explode each requested column to (col_name, value) pairs,
    one groupBy — a single shuffle for any number of factor columns.
    """
    if not columns:
        return {}
    pairs = df.select(
        F.explode(
            F.array(*[F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("val")) for c in columns])
        ).alias("p")
    ).select("p.col", "p.val")
    rows = pairs.filter(F.col("val").isNotNull()).groupBy("col", "val").count().collect()
    out: dict[str, dict] = {c: {} for c in columns}
    for r in rows:
        out[r["col"]][r["val"]] = r["count"]
    return out


def histogram_quantile_sketch(
    df: DataFrame,
    column: str,
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    bins: int = 512,
) -> DataFrame:
    """MERGEABLE fixed-boundary histogram quantile estimates (registry
    q209 is the oracle-checked instance): two linear passes — global
    (min, max, n), then ``bins`` equal-width counts (map-side
    combinable; shards/days merge by cell-wise ADD since the boundaries
    are global) — then each quantile interpolates linearly inside the
    first bin whose cumulative count reaches q·n. Error ≤ one bin width
    = range/bins. Returns (q, est_quantile) DOUBLE rows.

    NULLs are excluded up front (same discipline as kmv_fractions /
    bloom_build_words): otherwise n = count(*) counts NULL rows while
    min/max ignore them, and the NULL-bin row sorts FIRST in the
    cumulative window (ASC NULLS FIRST), silently inflating every
    cumulative count.

    This is the cross-engine-replayable member of the quantile family:
    ``vector_quantiles`` is exact (small corpora), ``five_num_summary``
    rides the engine-native GK sketch. The cumulative window runs over
    ≤ ``bins`` rows — O(B) state, not a data-sized funnel."""
    from pyspark.sql import Window

    df = df.filter(F.col(column).isNotNull())
    mm = df.agg(
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    counts = (
        df.crossJoin(F.broadcast(mm))
        .select(
            # constant column (hi == lo) → zero-width bins would divide
            # by zero under ANSI; every row lands in bin 0 and the
            # interpolation term multiplies by width 0, yielding lo
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col(column) - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / bins)
                    ),
                    F.lit(bins - 1),
                )
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("c").over(wcum))
    spark = df.sparkSession
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(x)) for x in quantiles])).alias("q")
    )
    tgt = qs.crossJoin(F.broadcast(mm)).select(
        "q", (F.col("q") * F.col("n")).alias("target"), "lo", "hi"
    )
    pick = (
        tgt.join(cum, cum["cum"].cast("double") >= F.col("target"))
        .groupBy("q", "target", "lo", "hi")
        .agg(F.min("bin").alias("bin"))
    )
    w_ = (F.col("hi") - F.col("lo")) / bins
    return (
        pick.join(cum.select("bin", "c", "cum"), "bin")
        .select(
            "q",
            (
                F.col("lo")
                + F.col("bin") * w_
                + (
                    (F.col("target") - (F.col("cum") - F.col("c")).cast("double"))
                    / F.col("c").cast("double")
                )
                * w_
            ).alias("est_quantile"),
        )
        .orderBy("q")
    )


def histogram_quantile_sketch_grouped(
    df: DataFrame,
    group_col: str,
    column: str,
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.9),
    bins: int = 256,
) -> DataFrame:
    """PER-GROUP mergeable quantile estimates with GLOBAL bin boundaries
    (registry q236 is the oracle-checked instance): (lo, hi) come from
    the whole column, so every group's histogram shares the same grid —
    which is what makes the sketch mergeable across BOTH shards and
    groups (cell-wise adds), the property a per-source latency/length
    dashboard needs when sources are appended daily. Per-group counts →
    per-group cumulative window over ≤ bins rows → linear interpolation
    inside the bin where q·n lands. NULLs excluded up front (the
    histogram_quantile_sketch discipline). Error ≤ one global bin width.
    Returns (group, q, est_quantile)."""
    from pyspark.sql import Window

    df = df.filter(F.col(column).isNotNull()).select(
        F.col(group_col).alias("grp"), F.col(column).alias("v")
    )
    mm = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    counts = (
        df.crossJoin(F.broadcast(mm))
        .select(
            "grp",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("v") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / bins)
                    ),
                    F.lit(bins - 1),
                )
            )
            .cast("long")
            .alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy("grp").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = counts.withColumn("cum", F.sum("c").over(wcum))
    totals = counts.groupBy("grp").agg(F.sum("c").alias("n"))
    spark = df.sparkSession
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(x)) for x in quantiles])).alias("q")
    )
    tgt = (
        totals.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(mm))
        .select("grp", "q", (F.col("q") * F.col("n")).alias("target"), "lo", "hi")
    )
    pick = (
        tgt.join(
            cum,
            (tgt["grp"] == cum["grp"]) & (cum["cum"].cast("double") >= tgt["target"]),
        )
        .drop(cum["grp"])
        .groupBy("grp", "q", "target", "lo", "hi")
        .agg(F.min("bin").alias("bin"))
    )
    w_ = (F.col("hi") - F.col("lo")) / bins
    return (
        pick.join(cum.select(F.col("grp").alias("g2"), "bin", "c", "cum"),
                  (F.col("grp") == F.col("g2")) & (pick["bin"] == cum["bin"]))
        .select(
            F.col("grp").alias(group_col),
            "q",
            (
                F.col("lo")
                + pick["bin"] * w_
                + (
                    (F.col("target") - (F.col("cum") - F.col("c")).cast("double"))
                    / F.col("c").cast("double")
                )
                * w_
            ).alias("est_quantile"),
        )
        .orderBy(group_col, "q")
    )
