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

__all__ = ["running_totals"]


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
