"""Transformation surface: scaling, expression transforms, partition-level
and grouped map/reduce (the pandas replacement for the reference's Rserve
stack).

Reference: ``flink/src/main/scala/io/ddf/flink/etl/TransformationHandler.
scala`` — ``transformNativeRserve`` ships each partition to a local R
process as a data.frame (``:68-124``); ``transformMapReduceNative`` runs an
R map → shuffle → R reduce with a keyval protocol (``:16-66,168-454``).
Scaling handlers are core (``ddf.ini:70``), pinned by
``TransformationHandlerSpec.scala:35-49``.

Spark build: the whole JVM→R boundary collapses into Arrow-batched pandas
UDFs — ``mapInPandas`` for per-partition transforms, ``groupBy().
applyInPandas`` for the map-reduce shape. Scaling stays fully JVM-side: one
agg for the statistics, one projection for the rescale (never a UDF).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "scale_min_max",
    "scale_standard",
    "transform_expressions",
    "map_partitions",
    "map_reduce",
]

_NUMERIC = {"int", "integer", "long", "bigint", "float", "double", "short"}


def _numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if f.dataType.typeName() in _NUMERIC]


def scale_min_max(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col-min)/(max-min) for all numeric cols (core transformScaleMinMax,
    pinned ``TransformationHandlerSpec.scala:35-43``). One agg + one select."""
    cols = columns or _numeric_columns(df)
    aggs = [F.min(c).alias(f"{c}__min") for c in cols] + [F.max(c).alias(f"{c}__max") for c in cols]
    row = df.agg(*aggs).first().asDict()
    proj = []
    for c in df.columns:
        if c in cols:
            lo, hi = row[f"{c}__min"], row[f"{c}__max"]
            if lo is None or hi is None or hi == lo:
                proj.append(F.col(c).cast("double").alias(c))
            else:
                proj.append(((F.col(c) - F.lit(lo)) / F.lit(hi - lo)).alias(c))
        else:
            proj.append(F.col(c))
    return df.select(*proj)


def scale_standard(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col-mean)/stddev z-score (core transformScaleStandard, pinned
    ``TransformationHandlerSpec.scala:45-49``)."""
    cols = columns or _numeric_columns(df)
    aggs = [F.avg(c).alias(f"{c}__mean") for c in cols] + [
        F.stddev_samp(c).alias(f"{c}__sd") for c in cols
    ]
    row = df.agg(*aggs).first().asDict()
    proj = []
    for c in df.columns:
        if c in cols:
            mu, sd = row[f"{c}__mean"], row[f"{c}__sd"]
            if mu is None or sd is None or sd == 0:
                proj.append(F.col(c).cast("double").alias(c))
            else:
                proj.append(((F.col(c) - F.lit(mu)) / F.lit(sd)).alias(c))
        else:
            proj.append(F.col(c))
    return df.select(*proj)


def transform_expressions(df: DataFrame, expressions: dict[str, str]) -> DataFrame:
    """Add/replace columns by SQL expression — the declarative equivalent of
    the reference's R ``transform(df, name=expr)`` (``TransformationHandler.
    scala:68-124``): stays in Catalyst, no process boundary at all."""
    out = df
    for name, expr in expressions.items():
        out = out.withColumn(name, F.expr(expr))
    return out


def map_partitions(
    df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema
) -> DataFrame:
    """Per-partition pandas transform — replaces the per-partition R
    data.frame shipping (``TransformationHandler.scala:68-124``) with
    Arrow-batched ``mapInPandas``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield fn(batch)

    return df.mapInPandas(gen, schema=schema)


def map_reduce(
    df: DataFrame,
    map_fn: Callable[[pd.DataFrame], pd.DataFrame],
    map_schema,
    key_cols: list[str],
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    reduce_schema,
) -> DataFrame:
    """map → shuffle on key → grouped reduce, the reference's R keyval
    protocol (``TransformationHandler.scala:16-66,168-454``) as
    ``mapInPandas`` + ``groupBy().applyInPandas``.

    The shuffle carries the *mapped* rows (Spark adds map-side combine only
    inside declarative aggs — for custom reduce_fn the full group ships, as
    in the reference's reduceGroup)."""
    mapped = map_partitions(df, map_fn, map_schema)
    return mapped.groupBy(*key_cols).applyInPandas(
        lambda pdf: reduce_fn(pdf), schema=reduce_schema
    )
