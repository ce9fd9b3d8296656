"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 (plus
the LLM-pipeline extensions) for the sf0.01 DuckDB-oracle correctness gate.
Implementation lives in the ``ddf_flink_spark`` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ddf_flink_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Exports ONLY oracle-backed queries: every name returned here has a
    matching ``oracle_sql()`` entry, so any driver sample of this dict is
    fully hash-checkable. The handful of engine-native production twins
    (seeded-xxhash64 / float variants whose exact bits DuckDB cannot
    reproduce: q201/q202/q102/q113) are deliberately excluded — each
    one's algorithm is hash-proven through a deterministic md5/integer
    twin that IS exported (q31/q33/q152/q153). Since round 7 the
    float-SRP (q203, seeded planes embedded as oracle literals) and
    k-means‖ (q204, q77-style contract oracle) twins ARE exported.
    Use ``production_queries()``
    for the full surface incl. those twins (bench and the local test suite
    run all of them).
    """
    return {name: fn for name, fn in QUERIES.items() if name in ORACLES}


def production_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full registry, including engine-native rows-only twins."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return dict(ORACLES)
