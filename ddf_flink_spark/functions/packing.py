"""Sequence packing for pretraining: concatenate the corpus token stream
in a deterministic document order and cut it into fixed-size context
windows — the token-packing step that turns a cleaned corpus into
training examples.

Extension beyond the reference surface. The core primitive is a
DISTRIBUTED EXCLUSIVE PREFIX SUM over a deterministic order — the
scan-class operation Spark has no built-in for at scale (a global
``Window.orderBy`` funnels everything through one partition). The
implementation here is the textbook two-phase parallel scan:

1. range-partition by the order key and sort within partitions (so the
   global order is partition-major), materialize once;
2. per-partition totals → exclusive partition offsets (one tiny
   collect, bounded by the partition count);
3. one Arrow-batched ``mapInPandas`` pass adds the partition offset to
   the partition-local running sum.

Wall-clock is two linear passes over the (small, one-row-per-document)
count table and never a single-partition funnel — the shape that holds
at any corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exclusive_prefix_sum", "pack_sequences"]


def exclusive_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over ``order_col`` order
    (first row gets 0), distributed as a two-phase scan — see module
    docstring. ``order_col`` must be unique (it defines THE order)."""
    parts = df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), F.col(order_col)
    ).sortWithinPartitions(order_col)
    parts = parts.withColumn("__pid", F.spark_partition_id()).localCheckpoint()

    totals = {
        r["__pid"]: r["t"]
        for r in parts.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in parts.schema)
    out_schema = f"{fields}, {out_col} bigint"

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = running.get(pid, offsets.get(pid, 0))
            vals = pdf[value_col].astype("int64")
            cum = vals.cumsum()
            out = pdf.copy()
            out[out_col] = base + cum - vals  # exclusive: offset before each row
            running[pid] = base + int(cum.iloc[-1])
            yield out

    return parts.mapInPandas(scan, schema=out_schema).drop("__pid")


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    context: int = 512,
) -> DataFrame:
    """Assign every document's tokens to fixed-size context windows of
    the concatenated corpus stream (documents in ``id_col`` order,
    windows cut every ``context`` tokens — the standard
    concatenate-and-chunk pretraining packing).

    Returns one row per (document, window) intersection:
    (id, window_id, tok_start, tok_end, n_tokens) where tok_start/end
    are 0-based positions WITHIN the document (end exclusive) — exactly
    the slice a loader feeds into window ``window_id``. Pure integer
    arithmetic end to end, so any engine reproduces the layout."""
    counts = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n"),
    )
    with_off = exclusive_prefix_sum(counts, "n", "id")
    spans = with_off.select(
        "id",
        "n",
        "offset",
        F.explode(
            F.sequence(
                (F.col("offset") / context).cast("long"),
                ((F.col("offset") + F.col("n") - 1) / context).cast("long"),
            )
        ).alias("window_id"),
    )
    w_start = F.col("window_id") * context
    w_end = w_start + context
    tok_start = F.greatest(w_start - F.col("offset"), F.lit(0))
    tok_end = F.least(w_end - F.col("offset"), F.col("n"))
    return (
        spans.filter(F.col("n") > 0)
        .select(
            "id",
            "window_id",
            tok_start.cast("long").alias("tok_start"),
            tok_end.cast("long").alias("tok_end"),
            (tok_end - tok_start).cast("long").alias("n_tokens"),
        )
        .orderBy("id", "window_id")
    )
