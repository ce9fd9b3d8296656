"""Missing-data operators: dropNA (row/column axis), fillNA.

Reference: ``flink/src/main/scala/io/ddf/flink/etl/MissingDataHandler.scala``
— row-axis drop with ANY/ALL/threshold (``:63-117``), column-axis drop via
per-column null counts (``:35-61``), fill with constant / per-column dict /
column aggregate with typed coercion (``:119-193``). ffill/bfill throw in the
reference (``:122-127``) — implemented here as the window-function extension.

Spark build: row-axis = ``df.na.drop`` (JVM-side); column-axis = ONE agg row
of null counts then a projection (two jobs total, no per-column scans);
aggregate-fill = one agg + ``na.fill`` dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["drop_na", "fill_na", "fill_directional"]

_NUMERIC = {"int", "integer", "long", "bigint", "float", "double", "short"}


def drop_na(
    df: DataFrame,
    axis: str = "row",
    how: str = "any",
    thresh: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """dropNA over rows or columns (``MissingDataHandler.scala:35-117``).

    Row axis: ANY = drop rows with any null; ALL = drop all-null rows;
    ``thresh`` = keep rows with at least ``thresh`` non-nulls (Spark
    convention; the reference phrases it as max-null-count — callers adapt).
    Column axis: drop columns whose null count exceeds the threshold
    (ANY → any null disqualifies, ALL → only all-null columns drop).
    """
    axis = axis.lower()
    if axis in ("row", "0"):
        if thresh is not None:
            return df.na.drop(thresh=thresh, subset=columns)
        return df.na.drop(how=how.lower(), subset=columns)
    # column axis — one agg pass for all null counts
    cols = columns or df.columns
    counts_row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.isnull(c).cast("long")).alias(c) for c in cols],
    ).first()
    n = counts_row["__n"]
    max_nulls = 0 if how.lower() == "any" else (n - 1 if how.lower() == "all" else None)
    if thresh is not None:
        # keep columns with at least `thresh` non-null values
        survivors = [c for c in df.columns if c not in cols or (n - counts_row[c]) >= thresh]
    else:
        survivors = [c for c in df.columns if c not in cols or counts_row[c] <= max_nulls]
    return df.select(*survivors)


def fill_na(
    df: DataFrame,
    value=None,
    column_values: dict | None = None,
    agg_function: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """fillNA with constant / dict / column-aggregate
    (``MissingDataHandler.scala:119-193``).

    Aggregate mode (e.g. MEAN): one ``df.agg`` computes the fill value per
    numeric column, then one ``na.fill`` applies the dict — two jobs
    regardless of column count.
    """
    if column_values is not None:
        return df.na.fill(column_values)
    if agg_function is not None:
        fn = {"mean": F.avg, "avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
              "median": F.median}[agg_function.lower()]
        cols = columns or [f.name for f in df.schema.fields if f.dataType.typeName() in _NUMERIC]
        row = df.agg(*[fn(c).alias(c) for c in cols]).first().asDict()
        return df.na.fill({c: v for c, v in row.items() if v is not None})
    if value is None:
        raise ValueError("fill_na needs value, column_values, or agg_function")
    if columns:
        return df.na.fill(value, subset=columns)
    return df.na.fill(value)


def fill_directional(
    df: DataFrame, column: str, order_by, method: str = "ffill",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """ffill/bfill — unimplemented in the reference
    (``MissingDataHandler.scala:122-127`` throws); here via window functions.

    ``order_by`` may be one column or a list — pass enough keys to make
    the order total, or tie rows make the fill nondeterministic.

    NOTE scale caveat: without ``partition_by`` this is a single global
    window (one partition) — callers at scale must partition.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    if method == "ffill":
        frame = (Window.unboundedPreceding, 0)
        fill = F.last(column, ignorenulls=True)
    elif method == "bfill":
        frame = (0, Window.unboundedFollowing)
        fill = F.first(column, ignorenulls=True)
    else:
        raise ValueError(f"unknown method {method!r}")
    w = Window.partitionBy(*(partition_by or [])).orderBy(*order_cols).rowsBetween(*frame)
    return df.withColumn(column, fill.over(w))
