"""Structured Streaming over the events table (SURVEY §2.15 extension).

The reference is batch-only (``FlinkDDFManager.scala:21,94-109`` —
``ExecutionEnvironment``/``DataSet``; no watermarks, windows, or state
anywhere). This module is the capability extension the north star asks
for: the same events table consumed as a stream with event-time
semantics — watermarked tumbling/sliding/session windows and stateful
deduplication — expressed entirely in Structured Streaming built-ins so
state lives in the executor-side state store, never the driver.

Scale notes (100 TB posture):
* Every aggregation here is keyed on (window, key) — state is
  hash-partitioned across executors and RocksDB-spillable; nothing
  accumulates on the driver.
* ``withWatermark`` bounds state: closed windows / expired dedup keys are
  evicted, so state size is O(active windows), not O(stream length).
* The file source is used for tests (replayable, deterministic); the same
  DataFrame graph binds unchanged to Kafka/Kinesis sources in production.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "events_stream",
    "documents_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "dedup_stream",
    "run_available_now",
]


def _stage_stream_dir(path: str) -> str:
    """File-stream sources monitor a DIRECTORY; the testdata tables are
    single files, so stage a per-path symlink directory (idempotent,
    concurrent-safe). Production points at a real landing directory."""
    import hashlib
    import os

    if os.path.isdir(path):
        return path
    tag = hashlib.md5(path.encode()).hexdigest()[:12]
    stream_dir = os.path.join(tempfile.gettempdir(), f"ddf_stream_{tag}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, os.path.basename(path))
    if os.path.islink(link) and not os.path.exists(link):
        os.unlink(link)  # repair dangling link from a deleted sf_dir
    try:
        os.symlink(path, link)
    except FileExistsError:
        pass
    return stream_dir


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the documents parquet — the corpus-as-a-stream
    source for incremental curation operators (streaming LSH dedup q225,
    Bloom blocklist q214). Same staging contract as ``events_stream``."""
    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(_stage_stream_dir(path))


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the embeddings parquet — the vector-ingest
    stream for incremental index maintenance (streaming IVF assignment
    q246). Same staging contract as ``documents_stream``."""
    path = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(_stage_stream_dir(path))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet (TIMESTAMP(NANOS) handled the
    same way as the batch path — read nanos as long, convert JVM-side;
    see ``registry.events_table``).

    The file stream source requires a *directory* (it monitors for new
    files — the replayable-log contract); the testdata table is a single
    file, so it is staged into a per-path symlink directory. Production
    points this at a real landing directory or swaps in a Kafka source."""
    import hashlib
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    if os.path.isdir(path):
        stream_dir = path
    else:
        tag = hashlib.md5(path.encode()).hexdigest()[:12]
        stream_dir = os.path.join(tempfile.gettempdir(), f"ddf_events_stream_{tag}")
        os.makedirs(stream_dir, exist_ok=True)
        link = os.path.join(stream_dir, "events.parquet")
        if os.path.islink(link) and not os.path.exists(link):
            os.unlink(link)  # repair dangling link from a deleted sf_dir
        try:
            os.symlink(path, link)
        except FileExistsError:
            pass  # another process staged it concurrently
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    # ts has shipped as TIMESTAMP(NANOS) (read as long under the legacy
    # conf) and as a plain timestamp, generator-version dependent.
    from pyspark.sql.types import LongType

    if isinstance(schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Equivalent batch semantics: GROUP BY time_bucket(ts, window),
    event_type — which is exactly what the DuckDB oracle pins."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window counts: each event lands in window/slide overlapping
    windows (2 for 1h/30m)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-based): a session closes after ``gap``
    of inactivity. The state store merges adjacent session fragments;
    watermark finalizes + evicts closed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Stateful exact-once dedup on ``keys`` within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    evicts it once the watermark passes — bounded state, unlike a global
    ``dropDuplicates`` which would grow forever on an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the currently
    available input (Trigger.AvailableNow) and return the result as a
    batch DataFrame read from the memory sink.

    Test/driver harness only — production binds ``writeStream`` to a real
    sink. AvailableNow processes all existing files then stops, so
    ``complete``-mode aggregations equal their batch counterparts."""
    qname = name or f"ddf_stream_{uuid.uuid4().hex[:8]}"
    spark = sdf.sparkSession
    ckpt = checkpoint or tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)
