"""Binning: numeric column → R-style interval-label factor column.

Reference: ``flink/src/main/scala/io/ddf/flink/analytics/BinningHandler.
scala:23-132`` (dispatch, label generation, break computation) + row rewrite
``utils/package.scala:177-227`` (Misc.getBinned). Semantics are R ``cut()``:

* types: CUSTOM (given breaks), EQUALFREQ (quantile breaks), EQUALINTERVAL
  (linear breaks);
* ``right=True`` → intervals ``(a,b]``, else ``[a,b)``;
* ``include_lowest`` closes the boundary end (first interval ``[a,b]`` when
  right, last when not);
* out-of-range rows are DROPPED (the reference filters them out).

Spark build: breaks via ``approxQuantile`` (equal-freq) or min/max linspace
(equal-interval); the labeling is one chained ``F.when`` expression —
JVM-side, codegen'd, no UDF — so at 100 TB this is a pure map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["binning", "compute_breaks", "compute_breaks_exact", "interval_labels"]


def _fmt(x: float) -> str:
    """R-ish break label formatting: ints render bare."""
    return str(int(x)) if float(x) == int(x) else str(round(float(x), 6))


def interval_labels(breaks: list[float], include_lowest: bool, right: bool) -> list[str]:
    """Interval labels per R cut() (reference ``BinningHandler.scala:64-92``)."""
    labels = []
    n = len(breaks) - 1
    for i in range(n):
        lo, hi = _fmt(breaks[i]), _fmt(breaks[i + 1])
        if right:
            lbrack = "[" if (i == 0 and include_lowest) else "("
            labels.append(f"{lbrack}{lo},{hi}]")
        else:
            rbrack = "]" if (i == n - 1 and include_lowest) else ")"
            labels.append(f"[{lo},{hi}{rbrack}")
    return labels


def compute_breaks(
    df: DataFrame, column: str, binning_type: str, num_bins: int
) -> list[float]:
    """EQUALFREQ → quantile breaks; EQUALINTERVAL → linear breaks
    (``BinningHandler.scala:95-132``)."""
    t = binning_type.upper()
    if t in ("EQUALFREQ", "EQUAL_FREQ"):
        probs = [i / num_bins for i in range(num_bins + 1)]
        breaks = sorted(df.approxQuantile(column, probs, 0.0001))
        if len(breaks) < 2 or breaks[0] == breaks[-1]:
            raise ValueError(f"degenerate breaks for column {column!r}: {breaks}")
        # a duplicated quantile break (heavily repeated value) is KEPT as
        # ONE point interval — e.g. breaks [1,1,11] make [1,1] its own
        # level, matching the reference's behavior on skewed columns
        # (BinningHandler.scala:112-132 feeds raw quantiles to the
        # labeler); runs longer than 2 are collapsed so interval labels
        # (= factor levels) stay unique
        collapsed: list[float] = []
        for b in breaks:
            if collapsed.count(b) < 2:
                collapsed.append(b)
        return collapsed
    elif t in ("EQUALINTERVAL", "EQUAL_INTERVAL"):
        lo, hi = df.agg(F.min(column), F.max(column)).first()
        lo, hi = float(lo), float(hi)
        step = (hi - lo) / num_bins
        breaks = [lo + i * step for i in range(num_bins)] + [hi]
    else:
        raise ValueError(f"unknown binning type {binning_type!r}")
    dedup = sorted(set(breaks))
    if len(dedup) < 2:
        raise ValueError(f"degenerate breaks for column {column!r}: {breaks}")
    return dedup


def compute_breaks_exact(
    df: DataFrame, column: str, num_bins: int, tiebreak_cols: list[str]
) -> list[float]:
    """EXACT equal-frequency breaks with NO quantile-convention
    ambiguity: rank every row by ``(column, *tiebreak_cols)`` (the
    tiebreaks make the order total), deal rows into ``num_bins`` tiles
    with NTILE, and cut at the tile boundaries — break_0 = global min,
    break_i = max(column) within tile i. Only integer rank arithmetic
    and comparisons, so ANY engine reproduces the identical break list
    (DuckDB replays it verbatim in the q64 oracle); the GK-sketch path
    (:func:`compute_breaks` EQUALFREQ) has no such cross-engine
    contract and stays the 100 TB default.

    Scale note: the global NTILE is one full sort through a single
    window partition — this is the exactness path for small/medium
    tables, same trade as q90."""
    from pyspark.sql import Window

    w = Window.orderBy(column, *tiebreak_cols)
    tiled = df.select(F.col(column).alias("__v"), F.ntile(num_bins).over(w).alias("__t"))
    rows = (
        tiled.groupBy("__t")
        .agg(F.min("__v").alias("lo"), F.max("__v").alias("hi"))
        .orderBy("__t")
        .collect()
    )
    if not rows:
        raise ValueError(f"compute_breaks_exact: no rows for column {column!r}")
    breaks = [float(rows[0]["lo"])] + [float(r["hi"]) for r in rows]
    dedup = sorted(set(breaks))
    if len(dedup) < 2:
        raise ValueError(f"degenerate breaks for column {column!r}: {breaks}")
    return dedup


def _bin_expr(
    col: Column, breaks: list[float], labels: list[str], include_lowest: bool, right: bool
) -> Column:
    """Chained CASE WHEN mapping value → interval label; out-of-range → null."""
    expr = F.lit(None).cast("string")
    n = len(labels)
    # build from last interval backwards so the first-match-wins order holds
    for i in range(n - 1, -1, -1):
        lo, hi = F.lit(breaks[i]), F.lit(breaks[i + 1])
        if right:
            lo_ok = (col >= lo) if (i == 0 and include_lowest) else (col > lo)
            hi_ok = col <= hi
        else:
            lo_ok = col >= lo
            hi_ok = (col <= hi) if (i == n - 1 and include_lowest) else (col < hi)
        expr = F.when(lo_ok & hi_ok, F.lit(labels[i])).otherwise(expr)
    return expr


def binning(
    df: DataFrame,
    column: str,
    binning_type: str = "EQUALINTERVAL",
    num_bins: int = 5,
    breaks: list[float] | None = None,
    include_lowest: bool = False,
    right: bool = True,
) -> tuple[DataFrame, list[str]]:
    """Replace ``column`` with its interval label; drop out-of-range rows
    (``BinningHandler.scala:23-62``, ``utils/package.scala:177-227``).

    Returns (binned frame, labels) — labels become the factor levels
    (``BinningHandler.scala:59-61``).
    """
    if breaks is not None:
        if sorted(breaks) != list(breaks):
            raise ValueError("custom breaks must be sorted ascending")
        use_breaks = [float(b) for b in breaks]
    else:
        use_breaks = compute_breaks(df, column, binning_type, num_bins)
    labels = interval_labels(use_breaks, include_lowest, right)
    lab = _bin_expr(F.col(column), use_breaks, labels, include_lowest, right)
    out = df.withColumn(column, lab).filter(F.col(column).isNotNull())
    return out, labels
