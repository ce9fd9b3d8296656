"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting (on in session.py) handles skewed *joins*;
skewed *aggregation* keys — one key holding a large fraction of all rows,
the classic hot-key problem at 100 TB — are handled here by salting:

    stage 1: group by (key, salt) — the hot key's rows spread over
             ``n_salts`` reducers, each producing a partial aggregate;
    stage 2: group by key — combines ≤ n_salts partials per key.

Only algebraic aggregates can be recombined (sum/count/min/max, and avg
as sum÷count); holistic ones (median, distinct) need sketches instead.

The salt is ``spark_partition_id() % n_salts`` — deterministic for a
fixed layout and, crucially, constant within a partition, so stage 1's
map-side combine still collapses each partition's rows before the
shuffle (a random salt would also work but defeats no-op partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_join"]

_ALGEBRAIC = {"sum", "count", "min", "max", "avg"}


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name → (column, fn) with fn in
    sum/count/min/max/avg. Result equals ``df.groupBy(group_cols)
    .agg(...)`` exactly (avg is recombined as total sum / total count,
    not an average of partial averages).
    """
    bad = {fn for _c, fn in aggs.values()} - _ALGEBRAIC
    if bad:
        raise ValueError(f"non-algebraic aggregate(s) {sorted(bad)}; use sketches instead")

    salted = df.withColumn("__salt", F.spark_partition_id() % n_salts)

    partials: list[Column] = []
    finals: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partials.append(F.count(col).alias(f"__p_{out}"))
            finals.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partials.append(F.sum(col).alias(f"__p_{out}"))
            finals.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partials.append(F.min(col).alias(f"__p_{out}"))
            finals.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partials.append(F.max(col).alias(f"__p_{out}"))
            finals.append(F.max(f"__p_{out}").alias(out))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"__ps_{out}"))
            partials.append(F.count(col).alias(f"__pc_{out}"))
            finals.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
    stage1 = salted.groupBy(*group_cols, "__salt").agg(*partials)
    return stage1.groupBy(*group_cols).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Manually salted equi-join for pathological key skew.

    AQE skew-join splitting (on by default in session.py) is the first
    line of defense — it splits oversized partitions at runtime. This is
    the explicit fallback for the cases AQE cannot fix, e.g. ONE join key
    holding 30% of a 100 TB fact table (AQE can split the partition, but
    every split still matches the same right-side rows through one sorted
    stream) or when the skew is known ahead of time and the extra
    planning pass is unwanted:

      * left (big, skewed) rows get a deterministic salt in [0, n_salts)
        hashed from the full row, so a hot key's rows spread over
        ``n_salts`` reducers;
      * right rows are REPLICATED once per salt value via a literal-array
        explode (never a cartesian join);
      * the join runs on (key, salt) — same result, n_salts-way spread.

    Result is bit-identical to ``left.join(right, key)`` for inner/left
    joins (each left row joins exactly the right rows of its key, in
    exactly one salt bucket). Right/full joins would need a second
    dedup pass on the replicated side and are refused.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    # monotonically_increasing_id is unique PER ROW, so even bit-identical
    # rows of a hot key round-robin across salt buckets (a row-content
    # hash would send duplicate rows — the classic hot-key shape — to one
    # bucket and defeat the spread). The salt value never affects the
    # result: the right side is replicated for every salt.
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (l[left_key] == r[right_key]) & (l["__salt"] == r["__salt"])
    return l.join(r, cond, how).drop("__salt")
