"""The local mirror of the driver's t2 gate: every registry query that has
an oracle must hash-match DuckDB at sf0.01."""

from __future__ import annotations

import pytest

from ddf_flink_spark.registry import ORACLES, QUERIES

from .conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # Rotation-proof gate invariant: every exported query is oracle-backed,
    # so ANY driver sample of queries() is fully hash-checkable. The
    # engine-native rows-only twins live in production_queries() only.
    assert set(e.queries()) == set(e.oracle_sql())
    assert set(e.production_queries()) >= set(e.queries())
    assert set(e.production_queries()) == set(QUERIES)
