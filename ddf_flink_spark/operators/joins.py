"""Join and set operators.

Reference: every join is a single Flink ``coGroup`` with hand-written
per-join-type iterator logic (``flink/src/main/scala/io/ddf/flink/utils/
package.scala:232-317``), API ``etl/JoinHandler.scala:19-61``. Output schema
is left-columns ++ right-minus-left (``utils/package.scala:250-256``).

Spark build: declare the join, let Catalyst + AQE pick broadcast /
shuffled-hash / sort-merge and split skewed partitions at runtime — the
physical-strategy selection the reference delegated to Flink's optimizer.
We additionally expose ANTI join and a ``broadcast_hint`` for known-small
dimensions (at 100 TB, every fact×dim join should be a broadcast, never a
shuffle of the fact table).

Divergence (documented): the reference's LEFT SEMI has a multiplicity bug —
it crosses matching groups, duplicating left rows (``utils/package.scala:
296-305`` with the left-schema projection ``:255-256``). We implement true
semi-join semantics (each left row at most once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["join", "merge", "JOIN_TYPES"]

JOIN_TYPES = {
    "inner": "inner",
    "left": "left",
    "leftouter": "left",
    "right": "right",
    "rightouter": "right",
    "full": "full",
    "fullouter": "full",
    "leftsemi": "left_semi",
    "semi": "left_semi",
    "leftanti": "left_anti",
    "anti": "left_anti",
}


def join(
    left: DataFrame,
    right: DataFrame,
    join_type: str = "inner",
    by_columns: list[str] | None = None,
    by_left_columns: list[str] | None = None,
    by_right_columns: list[str] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join on column lists, reference signature
    ``join(otherDDF, joinType, byColumns, byLeftColumns, byRightColumns)``
    (``etl/JoinHandler.scala:19-24``).

    Output schema follows the reference rule (left ++ right-minus-left,
    ``utils/package.scala:250-256``): with ``by_columns`` Spark's
    USING-style join already emits one copy of the key and appends
    right-only columns; with distinct left/right key names both key columns
    survive, matching the reference's name-keyed row merge
    (``utils/package.scala:320-351``).
    """
    jt = JOIN_TYPES[join_type.replace("_", "").lower()]
    r = F.broadcast(right) if broadcast_right else right
    if by_columns:
        return left.join(r, on=list(by_columns), how=jt)
    if not by_left_columns or not by_right_columns:
        raise ValueError("need by_columns or both by_left_columns/by_right_columns")
    if len(by_left_columns) != len(by_right_columns):
        raise ValueError("by_left_columns and by_right_columns must align")
    cond = None
    for lc, rc in zip(by_left_columns, by_right_columns):
        c = left[lc] == r[rc]
        cond = c if cond is None else (cond & c)
    joined = left.join(r, on=cond, how=jt)
    if jt in ("left_semi", "left_anti"):
        return joined  # left schema only — Spark already does this
    # de-duplicate any same-named non-key columns per the reference rule:
    # left wins, right duplicate is dropped (utils/package.scala:250-256).
    left_cols = set(left.columns)
    keep = [left[c] for c in left.columns]
    keep += [r[c] for c in right.columns if c not in left_cols]
    return joined.select(*keep)


def merge(left: DataFrame, right: DataFrame) -> DataFrame:
    """UNION ALL requiring identical column lists
    (``etl/JoinHandler.scala:42-61``)."""
    if [c.lower() for c in left.columns] != [c.lower() for c in right.columns]:
        raise ValueError(
            f"merge requires identical columns: {left.columns} vs {right.columns}"
        )
    return left.unionByName(right)
