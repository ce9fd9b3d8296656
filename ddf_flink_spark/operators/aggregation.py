"""Aggregation handler: field-spec parsing, grouped aggregates, xtabs,
correlation.

Reference: ``flink/src/main/scala/io/ddf/flink/analytics/AggregationHandler.
scala`` — ``aggregate(fields)`` mixed group/agg spec returning a keyed map
(``:104-130``), supported functions AVG/MEAN/MAX/MIN/SUM/COUNT only
(``:55-64``), ``groupBy(cols, aggExprs)`` with ``name=fn(col)`` aliases and
auto-names ``FN_col`` (``:139-184``), 2-step group-then-agg (``:203-226``),
xtabs aliased to aggregate (``:163-165``), Pearson correlation as a one-pass
map-reduce (``:19-43,186-201``), and a null-pre-cleaning step that drops rows
with nulls in any referenced column (``:96-102``).

Spark build: everything compiles to ``groupBy().agg()`` — Catalyst performs
partial (map-side) aggregation automatically, which is the scale story: a
100 TB groupBy shuffles only the partially-aggregated keyspace, not rows.
Correlation/covariance use Spark's built-in one-pass co-moment
implementations (``df.stat.corr/cov``) instead of a hand-rolled accumulator.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_field_specs",
    "aggregate",
    "group_by",
    "aggregate_on_column",
    "xtabs",
    "correlation",
]

# AVG and MEAN are synonyms (AggregationHandler.scala:55-64); anything else throws.
_AGG_FNS = {
    "avg": F.avg,
    "mean": F.avg,
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "count": F.count,
    "stddev": F.stddev,  # extension beyond reference parity
    "variance": F.variance,  # extension
    "median": F.median,  # extension
}

_CALL_RE = re.compile(r"^\s*(?:(?P<alias>\w+)\s*=\s*)?(?P<fn>\w+)\s*\(\s*(?P<arg>[^)]*)\s*\)\s*$")


def parse_field_specs(fields: list[str]) -> tuple[list[str], list[Column]]:
    """Split a mixed spec like ``["V1", "V2", "min(V15)", "m=avg(V16)"]``
    into (group columns, aggregate Columns).

    Alias rules follow the reference: ``name=fn(col)`` uses ``name``;
    unnamed aggregates get ``fn_col`` (reference emits upper ``FN_col``,
    ``AggregationHandler.scala:139-171`` — we keep lowercase for SQL-oracle
    friendliness and document the divergence).
    """
    group_cols: list[str] = []
    agg_cols: list[Column] = []
    for spec in fields:
        m = _CALL_RE.match(spec)
        if not m:
            group_cols.append(spec.strip())
            continue
        fn = m.group("fn").lower()
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported aggregate function: {fn!r}")
        arg = m.group("arg").strip()
        alias = m.group("alias") or f"{fn}_{arg if arg != '*' else 'all'}"
        col = F.count(F.lit(1)) if (fn == "count" and arg == "*") else _AGG_FNS[fn](arg)
        agg_cols.append(col.alias(alias))
    return group_cols, agg_cols


def _clean(df: DataFrame, columns: list[str]) -> DataFrame:
    """Reference aggregations silently drop rows with null in any referenced
    column (``AggregationHandler.scala:96-102`` getCleanTable)."""
    return df.na.drop(subset=[c for c in columns if c in df.columns])


def group_by(df: DataFrame, group_cols: list[str], agg_specs: list[str]) -> DataFrame:
    """``groupBy(cols, ["mean=avg(V15)"])`` → grouped frame
    (``AggregationHandler.scala:173-184``)."""
    _, agg_cols = parse_field_specs(agg_specs)
    if not agg_cols:
        raise ValueError("no aggregate expressions in group_by spec")
    return df.groupBy(*group_cols).agg(*agg_cols)


def aggregate(df: DataFrame, fields: str | list[str], match_reference_nulls: bool = True):
    """``aggregate("V1, V2, min(V15)")`` → dict keyed by comma-joined group
    values (``AggregationHandler.scala:104-130``)."""
    specs = [s.strip() for s in fields.split(",")] if isinstance(fields, str) else fields
    group_cols, agg_cols = parse_field_specs(specs)
    if match_reference_nulls:
        referenced = group_cols + _referenced_columns(specs, df.columns)
        df = _clean(df, referenced)
    result = df.groupBy(*group_cols).agg(*agg_cols) if group_cols else df.agg(*agg_cols)
    n_group = len(group_cols)
    out = {}
    for row in result.collect():
        vals = list(row)
        key = ",".join(str(v) for v in vals[:n_group])
        out[key] = vals[n_group:]
    return out


def _referenced_columns(specs: list[str], existing: list[str]) -> list[str]:
    refs = []
    for spec in specs:
        m = _CALL_RE.match(spec)
        if m and m.group("arg").strip() in existing:
            refs.append(m.group("arg").strip())
    return refs


def aggregate_on_column(df: DataFrame, function: str, column: str):
    """Single scalar aggregate (``AggregationHandler.scala:132-137``)."""
    fn = _AGG_FNS[function.lower()]
    return df.agg(fn(column)).first()[0]


def xtabs(df: DataFrame, fields: str | list[str]):
    """Cross-tabulation — aliased to aggregate in the reference
    (``AggregationHandler.scala:163-165``)."""
    return aggregate(df, fields)


def correlation(df: DataFrame, col_a: str, col_b: str) -> float:
    """Pearson r (``AggregationHandler.scala:19-43,186-201``) via Spark's
    one-pass ``df.stat.corr``."""
    return df.stat.corr(col_a, col_b)
