"""Slowly-changing-dimension (SCD type 2) batch upsert.

The reference's mutability story is in-place overwrite
(``setMutable(true)`` re-binding the DDF's contents, core
``MutabilityHandler``, ``ddf-conf/ddf.ini:67``) — history is lost. This
operator is the warehouse-grade alternative: applying an update batch to
a versioned dimension EXPIRES the changed current rows (closing their
validity interval) and APPENDS the new versions, so every historical
state stays queryable with an as-of filter.

Scale shape: three hash-joins on the business key (changed-detection,
expire, carry-forward) + a union — all shuffle on the same key, so one
exchange is reused; no window over the full dimension, no driver-side
state. At 100 TB the dimension is the small side: updates join against
it broadcast or co-partitioned, and the output is written
partition-by-validity for time-travel scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "merge_upsert"]


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    eff_col: str = "eff_date",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply ``updates`` to a type-2 dimension.

    ``dim`` holds the versioned dimension: business key(s), tracked
    attributes, ``from_col``/``to_col`` validity interval (``to_col`` NULL
    = current). ``updates`` carries the same non-temporal columns plus
    ``eff_col``, one row per business key.

    Rules (null-safe comparison on ``compare_cols``):
      * update differing from the key's current row → current row expires
        at ``eff_col``; the update becomes the new current row;
      * update equal to the current row (or keyless) → no-op;
      * update whose ``eff_col`` is at or before the current row's
        ``from_col`` (stale / out-of-order) → ignored, never an inverted
        interval; late-arriving history needs an explicit rewrite;
      * historical (already-closed) rows pass through untouched.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    attr_cols = [c for c in dim.columns if c not in (from_col, to_col)]
    missing = set(attr_cols + [eff_col]) - set(updates.columns)
    if missing:
        raise ValueError(f"updates missing columns: {sorted(missing)}")

    cur = dim.filter(F.col(to_col).isNull())
    hist = dim.filter(F.col(to_col).isNotNull())

    # qualified-name aliases: dim and updates routinely share lineage
    # (updates derived from the dimension), which makes unqualified
    # column objects ambiguous in the self-join
    u = updates.select(*attr_cols, eff_col).alias("__u")
    d = cur.alias("__d")
    differs: Column = reduce(
        lambda a, b: a | b,
        [~F.col(f"__u.{c}").eqNullSafe(F.col(f"__d.{c}")) for c in compare_cols],
    )
    key_match = reduce(
        lambda a, b: a & b,
        [F.col(f"__u.{k}") == F.col(f"__d.{k}") for k in key_cols],
    )
    # an update effective at or before the current row's start would
    # produce an inverted interval (valid_to < valid_from) and overlap
    # closed history; such stale/out-of-order updates are ignored —
    # late-arriving history requires an explicit rewrite, not an upsert
    in_order = F.col(f"__u.{eff_col}") > F.col(f"__d.{from_col}")
    changed = (
        u.join(d, key_match)
        .filter(differs & in_order)
        .select(*[F.col(f"__u.{c}") for c in attr_cols], F.col(f"__u.{eff_col}"))
    )

    changed_keys = changed.select(*key_cols)
    expired = (
        cur.join(changed.select(*key_cols, eff_col), key_cols, "inner")
        .select(*[F.col(c) for c in attr_cols], F.col(from_col), F.col(eff_col))
        .withColumnRenamed(eff_col, to_col)
    )
    unchanged_cur = cur.join(changed_keys, key_cols, "left_anti")
    new_cur = changed.select(
        *[F.col(c) for c in attr_cols],
        F.col(eff_col).alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    )
    cols = attr_cols + [from_col, to_col]
    return (
        hist.select(*cols)
        .unionByName(expired.select(*cols))
        .unionByName(unchanged_cur.select(*cols))
        .unionByName(new_cur.select(*cols))
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE-INTO semantics as a batch transform (SCD type 1 + delete):
    ``changes`` carries the key columns, the full payload, and an
    ``op_col`` in {'U' upsert, 'D' delete}. Matched 'U' rows REPLACE the
    base row, unmatched 'U' rows INSERT, 'D' keys are removed; base rows
    untouched by any change pass through. The relational identity:

        result = (base ANTI JOIN change_keys) UNION ALL (changes WHERE op='U')

    — ONE anti-join on the key plus a union, no window, no driver state;
    the anti-join shuffles on the same key the upserts arrive keyed by,
    so at 100 TB the change batch (small side) broadcasts and the base
    table is never reshuffled. Duplicate keys within one change batch
    are the caller's contract to resolve first (latest-wins upstream);
    this operator asserts nothing about them. Registry q232 is the
    oracle-checked instance."""
    payload_cols = [c for c in changes.columns if c != op_col]
    if sorted(payload_cols) != sorted(base.columns):
        raise ValueError(
            f"merge_upsert: changes payload {sorted(payload_cols)} must match "
            f"base columns {sorted(base.columns)}"
        )
    change_keys = changes.select(*key_cols).distinct()
    survivors = base.join(change_keys, key_cols, "left_anti")
    upserts = changes.filter(F.col(op_col) == "U").select(*base.columns)
    return survivors.unionByName(upserts)
