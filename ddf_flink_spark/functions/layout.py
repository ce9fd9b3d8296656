"""Space-filling-curve layout keys for multi-dimensional data clustering.

At 100 TB, a table sorted by ONE key prunes row groups only for
predicates on that key; a table sorted by a Morton (Z-order) interleave
of two keys keeps parquet min/max row-group statistics tight on BOTH
dimensions at once, so 2-D box predicates (time × tenant, partkey ×
suppkey, lat × lon) skip most of the file in either axis. This is the
technique behind Delta/Iceberg Z-ORDER clustering — here as a plain
column expression usable with ``df.repartitionByRange(...).sortWithinPartitions``
before any parquet write.

The interleave is a fixed composition of ``&``/``<<``/``|`` — one
whole-stage-codegen expression per row, no UDF — and the identical
formula is emitted as ANSI SQL (`morton_key_sql`) so external engines
(and the DuckDB oracle) compute bit-identical keys.

The reference has no layout operators at all (its ORDER BY forces
parallelism=1, ``utils/package.scala:369-378``); this is a pure
capability extension for the 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["morton_key", "morton_key_sql", "zorder_key_n"]


def morton_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Z-order key: interleave the low ``bits`` bits of two non-negative
    integer columns (x → even bit positions, y → odd). Inputs must fit in
    ``bits`` bits (mask-truncated otherwise, like every Z-order impl);
    2·bits ≤ 62 keeps the key in a signed long."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        # x's bit i (still at position i after masking) shifts to 2i;
        # y's bit i shifts to 2i+1.
        key = key.bitwiseOR(F.shiftleft(xc.bitwiseAND(F.lit(1 << i)), i))
        key = key.bitwiseOR(F.shiftleft(yc.bitwiseAND(F.lit(1 << i)), i + 1))
    return key


def zorder_key_n(cols: "list[Column]", bits: int = 8) -> Column:
    """Generalized Z-order key: round-robin interleave the low ``bits``
    bits of ``k ≥ 2`` non-negative integer columns — column ``j``'s bit
    ``i`` lands at position ``i·k + j``, so every column contributes to
    the key's high bits equally and a sort by the key gives EVERY
    column locality (the k-dimensional curve behind multi-column
    Z-ORDER clustering; :func:`morton_key` is the k=2, x-first special
    case with the two operands swapped). Inputs are mask-truncated to
    ``bits`` bits like every Z-order implementation; ``k·bits ≤ 62``
    keeps the key in a signed long. Same whole-stage-codegen
    ``&``/``<<``/``|`` composition as :func:`morton_key` — no UDF."""
    k = len(cols)
    if k < 2:
        raise ValueError(f"zorder_key_n needs ≥ 2 columns, got {k}")
    if not 1 <= bits or k * bits > 62:
        raise ValueError(
            f"k·bits must be in [k, 62] for a signed-long key: "
            f"k={k}, bits={bits}"
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            # the column's bit i (still at position i after the mask)
            # shifts left to its interleaved slot i·k + j
            key = key.bitwiseOR(
                F.shiftleft(
                    c.cast("long").bitwiseAND(F.lit(1 << i)),
                    i * (k - 1) + j,
                )
            )
    return key


def morton_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL expression string (DuckDB,
    Trino, ... compatible) — the cross-engine contract for the layout key."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        # Operands are parenthesized so arbitrary expressions (e.g. 'a | b',
        # comparisons) can never re-associate with the surrounding & / <<.
        terms.append(f"((({x}) & {1 << i}) << {i})")
        terms.append(f"((({y}) & {1 << i}) << {i + 1})")
    return " | ".join(terms)
