"""Time-series operators: fixed-interval resampling with gap-fill
("hypertable rollup"), and wide/long reshaping helpers.

The reference is batch-only with no date functions at all (SURVEY §2.9,
§2.15 — ``content/SqlSupport.scala:246-257`` wires no temporal functions),
so this module is a capability extension aimed at the events stream table.

Scale posture: the bucket grid is generated *per key* with
``F.sequence(min_bucket, max_bucket, interval)`` — grid size is bounded by
``span / interval`` per key, never a driver-side loop; the gap-fill window
is partitioned by key, so state per task = one key's grid. On a 100 TB
events table the shuffle carries one aggregated row per (key, bucket) —
the raw events are reduced map-side by the bucket groupBy before any
windowing happens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_gapfill"]


def resample_gapfill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    interval: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Resample ``df`` to fixed ``interval`` buckets per key and
    forward-fill buckets that saw no events with the last observed value.

    Per (key, bucket) the representative value is the latest *non-null*
    observation (``max_by`` on event time, tie-broken by ``tiebreak_col``
    so the result is deterministic) — matching pandas
    ``resample(...).last().ffill()``, where ``last()`` takes the last
    valid value and a bucket with only nulls forward-fills through. Empty
    buckets between a key's first and last bucket are materialized via
    ``sequence`` + ``explode`` and filled with the most recent preceding
    value (window ``last(ignorenulls=True)``).

    Returns columns: ``key_cols..., bucket, filled_value, n_obs``.
    """
    order: Column = (
        F.struct(ts_col, tiebreak_col) if tiebreak_col is not None else F.col(ts_col)
    )
    # null-valued rows get a null ordering key => max_by skips them
    valid_order = F.when(F.col(value_col).isNotNull(), order)
    bucket = F.window(F.col(ts_col), interval)["start"].alias("bucket")
    observed = df.groupBy(*key_cols, bucket).agg(
        F.max_by(F.col(value_col), valid_order).alias("__last"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    bounds = observed.groupBy(*key_cols).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    step = F.expr(f"INTERVAL {interval}")
    grid = bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias("bucket"),
    )
    joined = grid.join(observed, [*key_cols, "bucket"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "bucket",
        F.last("__last", ignorenulls=True).over(w).alias("filled_value"),
        F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias("n_obs"),
    )
