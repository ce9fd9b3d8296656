"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.15); this is the
"custom stateful operator" extension: arbitrary per-key state maintained
in the executor state store across micro-batches, with the user logic in
Arrow-batched pandas.

Scale posture: state is keyed (hash-partitioned across executors), one
state row per key, and the pandas function sees one key-group at a time —
nothing driver-side, nothing proportional to stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_totals", "countmin_grid_stateful"]


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    Emits one row per key per batch with the cumulative totals — the
    minimal "custom aggregate the engine doesn't ship" shape. The closure
    is self-contained (imports pandas inside) so it unpickles on workers
    regardless of the driver's cwd.
    """
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "sum_value": [round(s, 4)]})

    prepared = events.selectExpr(f"{key_col}", f"{value_col} as value")
    return prepared.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def countmin_grid_stateful(keyed: DataFrame, width: int = 1024) -> DataFrame:
    """Count-min sketch maintained IN THE STATE STORE: input is a
    streaming frame of pre-hashed (r, bucket) rows (the per-record
    bucket expansion runs map-side as codegen'd column expressions —
    see functions/sketches._cm_bucket_col); each CMS row r is a state
    key whose value is its ``width``-long counter array. Per batch the
    update is one ``np.bincount`` add; the emitted row carries the
    cumulative cells plus a generation counter so the sink's LATEST row
    per r is the final grid.

    This is the executor-side replacement for a driver-side grid
    accumulator (q184's foreachBatch form): sketch state is keyed,
    checkpointed with the stream, RocksDB-spillable, and never touches
    the driver — the same state discipline as every other stateful
    operator here. Parallelism note: there are only ``depth`` state
    keys, but the heavy per-record hashing happens BEFORE the groupBy
    at full map parallelism; the keyed reduce adds ~width longs per
    batch per key.
    """
    out_schema = "r int, gen long, cells array<long>"
    state_schema = "gen long, cells array<long>"

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            gen, cells = state.get
            cells = np.asarray(cells, dtype=np.int64)
        else:
            gen, cells = 0, np.zeros(width, dtype=np.int64)
        for pdf in pdfs:
            cells = cells + np.bincount(
                pdf["bucket"].to_numpy(), minlength=width
            ).astype(np.int64)
        gen += 1
        state.update((int(gen), [int(x) for x in cells]))
        yield pd.DataFrame(
            {"r": [key[0]], "gen": [gen], "cells": [[int(x) for x in cells]]}
        )

    return keyed.groupBy("r").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
