"""Incremental materialized view: a continuously-maintained windowed
rollup written through ``foreachBatch`` to plain parquet.

The reference has no streaming at all (SURVEY §2.15); this is the
continuous counterpart of the batch hypertable rollup
(``operators/timeseries.resample_gapfill`` / q83).

Without a table format that supports upsert (no Delta/Iceberg in this
container), the exactly-once-per-key contract is built from two halves:

* **append-only epoch log** — each micro-batch appends its UPDATED
  (window, key) aggregate rows stamped with the batch epoch. Appends are
  atomic per file; a replayed epoch after a crash rewrites the same
  logical rows with the same epoch, and the read side takes one row per
  key, so replays are harmless (idempotent at the read).
* **merge-on-read + compaction** — readers take the max-epoch row per
  (window, key); ``compact_rollup`` rewrites the log to latest-only when
  the log-to-live ratio grows.

Scale posture: the stream side is a watermarked windowed aggregation
(state = O(active windows), update-mode emits only changed keys); the log
grows by |changed keys| per batch, not |events|; merge-on-read is a
window-function scan of the log (small relative to the raw stream), and
compaction bounds it.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["windowed_rollup_updates", "run_incremental_rollup", "read_rollup", "compact_rollup"]

_KEYS = ["window_start", "event_type"]


def windowed_rollup_updates(
    events: DataFrame, window: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling rollup emitting UPDATED rows per micro-batch
    (update output mode): (window_start, event_type, n_events, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def run_incremental_rollup(
    updates: DataFrame, path: str, checkpoint: str | None = None
) -> None:
    """Drive the update stream to completion over available input,
    appending each micro-batch's changed rows to the epoch log at
    ``path``. Re-running with the same checkpoint processes only NEW
    input files — the incremental contract."""
    ckpt = checkpoint or tempfile.mkdtemp(prefix="ckpt_rollup_")

    def write_batch(bdf: DataFrame, epoch: int) -> None:
        bdf.withColumn("_epoch", F.lit(epoch)).write.mode("append").parquet(path)

    q = (
        updates.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .queryName(f"rollup_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Merge-on-read: latest epoch per (window, key)."""
    log = spark.read.parquet(path)
    w = Window.partitionBy(*_KEYS).orderBy(F.col("_epoch").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_epoch")
    )


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Compact the epoch log: append a latest-only snapshot, then prune
    the files it supersedes. Run when log size ≫ live keys.

    Crash-safe by construction — the snapshot is APPENDED before anything
    is deleted, so at no point is the log missing data: a crash after the
    append leaves a larger-but-correct log (snapshot rows carry the
    current max epoch, so merge-on-read still resolves every key), and a
    crash mid-prune leaves some superseded files behind, which the next
    compaction removes. Epochs appended concurrently by the stream use
    new file names, are never in the prune list, and carry higher epochs
    than the snapshot — they win merge-on-read either way. Do NOT run two
    compactions concurrently (single-compactor contract), and expect
    readers racing the prune step to need a retry; a real table format
    (Delta/Iceberg) makes this swap transactional in production."""
    import os

    files_before = {
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
    }
    log = spark.read.parquet(path)
    max_epoch = log.agg(F.max("_epoch")).first()[0]
    w = Window.partitionBy(*_KEYS).orderBy(F.col("_epoch").desc())
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_epoch", F.lit(max_epoch))
    )
    latest.write.mode("append").parquet(path)
    for f in files_before:
        os.remove(f)
