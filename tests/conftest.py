"""Shared fixtures: one SparkSession per test run + DuckDB oracle harness.

The oracle harness mirrors the driver's t2 gate: run the Spark query and the
DuckDB SQL on the same parquet tables, then compare row count, column names
and an order-insensitive view of the values.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from ddf_flink_spark.session import get_spark

    s = get_spark("ddf_flink_spark_tests")
    yield s


@pytest.fixture(scope="session")
def manager(spark):
    from ddf_flink_spark.manager import DDFManager

    return DDFManager(spark)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        path = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if pd.isna(v):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_canon(x)) for x in v) + "]"
    return str(v)


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "query"):
    actual = _normalize(spark_df.toPandas())
    expected = _normalize(duck_con.execute(sql).fetchdf())
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: column mismatch {list(actual.columns)} vs {list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}"
    )
    if not actual.equals(expected):
        diff_rows = (actual != expected).any(axis=1)
        sample = pd.concat(
            [actual[diff_rows].head(5).add_prefix("spark_"),
             expected[diff_rows].head(5).add_prefix("duck_")],
            axis=1,
        )
        raise AssertionError(f"{name}: value mismatch\n{sample}")
