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

__all__ = ["running_totals", "countmin_grid_stateful", "lsh_bucket_pairs_stateful"]


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


def lsh_bucket_pairs_stateful(banded: DataFrame) -> DataFrame:
    """INCREMENTAL LSH dedup: candidate pairs emitted AS DOCUMENTS ARRIVE.

    Input is a streaming frame of (band, bucket, id) rows (the banded
    MinHash signature, computed map-side as column expressions — see
    registry q225). Each (band, bucket) is a state key holding the
    sorted id list of every document previously filed in that bucket;
    when new documents land, each pairs against all stored members plus
    the earlier-arriving documents of its own batch, and the state
    absorbs the batch. Emitted rows are (id_a, id_b) with id_a < id_b.

    Arrival-order INDEPENDENCE by construction: an unordered pair
    {x, y} in the same bucket is emitted exactly once — when the later
    of the two arrives — so the union of emissions over ANY replay
    order or batch partitioning equals the batch LSH candidate set
    (after the cross-band DISTINCT the caller applies), which is
    exactly what the q225 oracle (the batch q31/q144 SQL) checks.

    Scale posture: state is one sorted id list per occupied bucket —
    hash-partitioned, RocksDB-spillable; per-batch work per bucket is
    |new| × (|stored| + |new|)/2 pair emissions, the same pair space
    the batch join would materialize for that bucket.
    """
    out_schema = "id_a long, id_b long"
    state_schema = "members array<long>"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        members = list(state.get[0]) if state.exists else []
        new_ids = []
        for pdf in pdfs:
            new_ids.extend(int(x) for x in pdf["id"])
        new_ids.sort()
        a_out, b_out = [], []
        for nid in new_ids:
            for old in members:
                if old == nid:
                    continue
                lo, hi = (old, nid) if old < nid else (nid, old)
                a_out.append(lo)
                b_out.append(hi)
            members.append(nid)
        state.update((sorted(set(members)),))
        yield pd.DataFrame({"id_a": a_out, "id_b": b_out})

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
