"""Structured Streaming semantics tests (SURVEY §2.15 extension).

The oracle suite already pins complete-mode window aggregates against
batch SQL; these tests pin the *streaming-only* semantics: append-mode
finalization and watermark-based late-data dropping across micro-batches.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from ddf_flink_spark.streaming.core import (
    dedup_stream,
    events_stream,
    run_available_now,
    tumbling_counts,
)

from .conftest import SF_DIR


def test_append_mode_emits_only_finalized_windows(spark):
    """In append mode a windowed aggregate emits a window only once the
    watermark passes its end — with AvailableNow the trailing windows
    (within the watermark horizon of max ts) must be withheld."""
    ev = events_stream(spark, SF_DIR)
    complete = run_available_now(tumbling_counts(ev), "complete")
    append = run_available_now(tumbling_counts(ev), "append")
    n_complete, n_append = complete.count(), append.count()
    assert n_append < n_complete
    # everything except the un-finalized tail must agree with complete mode
    tail_start = append.agg(F.max("window_start")).first()[0]
    joined = (
        complete.filter(F.col("window_start") <= tail_start)
        .alias("c")
        .join(
            append.alias("a"),
            ["window_start", "event_type", "n_events", "sum_value"],
            "left_anti",
        )
    )
    assert joined.count() == 0


def test_watermark_drops_late_data_across_runs(spark, tmp_path):
    """Three sequential runs sharing one checkpoint (watermark persists in
    the commit log): run 1 sees recent data and advances the watermark to
    11:01; run 2 delivers ~11h-late events, which must be dropped; run 3
    delivers fresh data that finalizes the 12:00 window — whose count must
    exclude the late rows."""
    import pandas as pd

    d = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)

    def write(name, ids, when):
        df = pd.DataFrame(
            {
                "event_id": list(ids),
                "ts": pd.to_datetime(when) + pd.to_timedelta(range(len(list(ids))), "s"),
                "event_type": ["click"] * len(list(ids)),
                "value": [1.0] * len(list(ids)),
            }
        )
        df.assign(ts=df["ts"].astype("datetime64[us]")).to_parquet(f"{d}/{name}.parquet")

    def agg_stream():
        schema = spark.read.parquet(d).schema
        return (
            spark.readStream.schema(schema)
            .parquet(d)
            .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → event-time type
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
        )

    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            agg_stream()
            .writeStream.format("parquet")  # file sink supports checkpoint recovery
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).toPandas()

    write("a", range(100), "2024-06-10 12:00:00")
    run_once()

    write("b", range(100, 110), "2024-06-10 01:00:00")  # ~11h late
    out2 = run_once()
    assert "2024-06-10 01:00:00" not in set(out2["window_start"].astype(str))

    write("c", range(200, 210), "2024-06-10 14:00:00")  # advances watermark past 13:00
    finalized = run_once()
    noon = finalized[finalized["window_start"].astype(str) == "2024-06-10 12:00:00"]
    assert len(noon) == 1
    assert int(noon["n"].iloc[0]) == 100  # late rows excluded
    assert "2024-06-10 01:00:00" not in set(finalized["window_start"].astype(str))


def test_dedup_is_stateful_across_batches(spark, tmp_path):
    """Duplicate event_ids arriving in *different* micro-batches are still
    deduplicated — the state store carries keys across batches."""
    import pandas as pd

    d = str(tmp_path / "dedup_src")
    os.makedirs(d)
    base = pd.DataFrame(
        {
            "event_id": range(50),
            "ts": pd.to_datetime("2024-06-10 12:00:00") + pd.to_timedelta(range(50), "s"),
            "event_type": ["click"] * 50,
            "value": [1.0] * 50,
        }
    )
    base.assign(ts=base["ts"].astype("datetime64[us]")).to_parquet(f"{d}/a.parquet")
    time.sleep(1.1)
    base.assign(ts=base["ts"].astype("datetime64[us]")).to_parquet(f"{d}/b.parquet")  # identical replay

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = run_available_now(dedup_stream(stream, ["event_id"], watermark="2 hours"), "append")
    assert out.count() == 50


def test_events_stream_schema_matches_batch(spark):
    from ddf_flink_spark.registry import events_table

    sdf = events_stream(spark, SF_DIR)
    bdf = events_table(spark, SF_DIR)
    assert sdf.schema == bdf.schema
    assert sdf.isStreaming


def test_stateful_totals_accumulate_across_runs(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across checkpointed
    runs: user 1 appears in both files, so the second run's emission for
    user 1 must carry the first run's totals forward."""
    import pandas as pd

    from ddf_flink_spark.streaming.stateful import running_totals

    d = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    collected: list = []

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "value"])
        pdf["user_id"] = pdf["user_id"].astype("int64")
        pdf.to_parquet(f"{d}/{name}.parquet")

    def run_once():
        schema = spark.read.parquet(d).schema
        stream = spark.readStream.schema(schema).parquet(d)
        q = (
            running_totals(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _id: collected.append(df.toPandas()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write("a", [(1, 10.0), (1, 5.0), (2, 1.0)])
    run_once()
    write("b", [(1, 2.0), (3, 7.0)])
    run_once()

    final = pd.concat(collected).groupby("user_id").last()
    assert final.loc[1, "n_events"] == 3 and final.loc[1, "sum_value"] == 17.0
    assert final.loc[2, "n_events"] == 1
    assert final.loc[3, "sum_value"] == 7.0


def test_incremental_rollup_mv(spark, tmp_path):
    """Incremental materialized view (streaming/sink.py): two runs sharing
    one checkpoint process only new files; after each run the merge-on-read
    view must equal a full batch recompute, and compaction must preserve it
    while shrinking the log."""
    import pandas as pd

    from ddf_flink_spark.streaming.sink import (
        compact_rollup,
        read_rollup,
        run_incremental_rollup,
        windowed_rollup_updates,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    mv = str(tmp_path / "mv")
    os.makedirs(src)

    def write(name, start, n, etypes):
        df = pd.DataFrame(
            {
                "event_id": range(n),
                "ts": pd.to_datetime(start) + pd.to_timedelta(range(n), "min"),
                "event_type": [etypes[i % len(etypes)] for i in range(n)],
                "value": [float(i % 7) for i in range(n)],
            }
        )
        df.assign(ts=df["ts"].astype("datetime64[us]")).to_parquet(f"{src}/{name}.parquet")

    def stream():
        schema = spark.read.parquet(src).schema
        raw = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        return windowed_rollup_updates(raw, window="1 hour", watermark="30 minutes")

    def batch_expected():
        raw = spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
        return {
            (str(r["window_start"]), r["event_type"]): (r["n"], r["s"])
            for r in raw.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "s")
            .collect()
        }

    def mv_view():
        return {
            (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
            for r in read_rollup(spark, mv).collect()
        }

    # run 1: first 5 hours of data
    write("part1", "2024-06-10 00:00:00", 300, ["click", "view"])
    run_incremental_rollup(stream(), mv, ckpt)
    assert mv_view() == batch_expected()

    # run 2: later data only (watermark-safe), one overlapping window key
    write("part2", "2024-06-10 04:30:00", 120, ["click", "purchase"])
    run_incremental_rollup(stream(), mv, ckpt)
    assert mv_view() == batch_expected()

    # log holds superseded epochs for updated keys; compaction shrinks it
    log_rows = spark.read.parquet(mv).count()
    live_rows = len(mv_view())
    assert log_rows > live_rows
    before = mv_view()
    compact_rollup(spark, mv)
    assert spark.read.parquet(mv).count() == live_rows
    assert mv_view() == before


def test_stream_lsh_dedup_multibatch_equals_batch(spark, tmp_path):
    """The stateful LSH operator must accumulate bucket state ACROSS
    micro-batches: the corpus is split into three files streamed one
    file per trigger, and the union of per-arrival emissions must equal
    the batch LSH candidate set (cross-batch pairs only exist if state
    survived the batch boundary)."""
    from pyspark.sql import functions as F

    from ddf_flink_spark.functions.dedup import (
        MINHASH_MERSENNE_P,
        _minhash_a,
        _minhash_b,
        minhash_lsh_candidates,
        word_shingles,
    )
    from ddf_flink_spark.streaming.core import run_available_now
    from ddf_flink_spark.streaming.stateful import lsh_bucket_pairs_stateful

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    # three slices written as separate files -> three micro-batches
    land = str(tmp_path / "land")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(land)

    p = MINHASH_MERSENNE_P
    sh = word_shingles("text", 3)
    base = F.transform(
        sh,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        % F.lit(p),
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    doc = stream.select(F.col("doc_id").alias("id"), base.alias("bb")).filter(
        F.size("bb") > 0
    )
    hcols = [
        F.array_min(
            F.transform(
                F.col("bb"),
                lambda b: (F.lit(_minhash_a(i)) * b + F.lit(_minhash_b(i)))
                % F.lit(p),
            )
        ).alias(f"h{i}")
        for i in range(16)
    ]
    sig = doc.select("id", *hcols)
    bands = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                ",", *[F.col(f"h{bi * 4 + j}").cast("string") for j in range(4)]
            ).alias("bucket"),
        )
        for bi in range(4)
    ]
    banded = sig.select("id", F.explode(F.array(*bands)).alias("s")).select(
        "id", F.col("s.band").alias("band"), F.col("s.bucket").alias("bucket")
    )
    streamed = {
        (r["id_a"], r["id_b"])
        for r in run_available_now(
            lsh_bucket_pairs_stateful(banded), output_mode="append"
        )
        .distinct()
        .collect()
    }
    batch = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, num_hashes=16, bands=4, hash_family="md5"
        ).collect()
    }
    assert streamed == batch and len(batch) > 0
