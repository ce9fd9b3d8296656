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

__all__ = ["join", "merge", "asof_join", "JOIN_TYPES"]

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    allow_exact: bool = True,
) -> DataFrame:
    """As-of (backward) join: each left row picks the latest right row with
    ``right_time <= left_time`` (``<`` when ``allow_exact=False``) within
    the same ``by`` keys — the time-series enrichment operator neither the
    reference nor vanilla SQL-92 has (DuckDB's ASOF JOIN is the oracle).

    Scale formulation: tag + union + one window ``last(ignorenulls)`` over
    (key, time) — a single shuffle on the key and one partition-local sort,
    never a per-key collect or a range cross-join. Skewed keys follow the
    same mitigation as any window: salt the key or bound the lookback.

    The carried payload is ONE struct per right row (never per-column), so
    (a) a matched right row whose value is genuinely NULL yields NULL —
    not a stale older value — exactly like DuckDB ASOF / pandas
    merge_asof, and (b) multiple value_cols always come from the same
    right row (no row tearing).

    Returns all left columns plus ``value_cols`` from the right (null
    where no prior right row exists).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != right_time
    ]
    overlap = [c for c in value_cols if c in left.columns]
    if overlap:
        raise ValueError(f"value_cols {overlap} collide with left columns; rename first")

    left_only = [c for c in left.columns if c not in by and c != left_time]
    payload = F.struct(*[F.col(c) for c in value_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType
    l_tagged = left.select(
        *by,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tagged = right.select(
        *by,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        payload.alias("__payload"),
    )
    u = l_tagged.unionByName(r_tagged)
    # at equal time: right rows order before left rows iff exact matches count
    tiebreak = F.col("__is_left").asc() if allow_exact else F.col("__is_left").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *by,
        "__t",
        "__is_left",
        *left_only,
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *by,
        F.col("__t").alias(left_time),
        *left_only,
        *[F.col(f"__payload.{c}").alias(c) for c in value_cols],
    )
