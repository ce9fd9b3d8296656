"""Simulate the driver correctness gate: run every registry query at sf0.01,
collect rows, run the DuckDB oracle, and report per-query wall time.

Usage: python tools/simulate_gate.py [--sf SF_DIR] [--only q...] [--skip-oracle]
Prints a sorted timing table and a JSON summary at the end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")  # conftest._normalize (driver compare)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    from ddf_flink_spark.registry import ORACLES, QUERIES

    # Rotation-proof gate invariant: the driver samples __spark_entry__
    # .queries(), so that export must contain ZERO rows-only names — any
    # rotation is then fully hash-checkable. Fail loudly if it regresses.
    import __spark_entry__ as entry_mod

    exported = set(entry_mod.queries())
    rows_only_exported = sorted(exported - set(ORACLES))
    assert not rows_only_exported, (
        f"__spark_entry__.queries() exports rows-only names: {rows_only_exported}"
    )
    print(
        f"gate export: {len(exported)} queries, all oracle-backed; "
        f"{len(set(QUERIES) - set(ORACLES))} engine-native twins excluded "
        f"(run here via the full registry)"
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("simulate-gate")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.only or list(QUERIES)
    timings: dict[str, dict] = {}
    t_total = time.time()
    for name in names:
        fn = QUERIES[name]
        rec: dict = {}
        t0 = time.time()
        actual = None
        try:
            df = fn(spark, args.sf)
            # ONE execution: the pandas frame serves both the row count
            # and the value comparison below
            import conftest  # tests/conftest via the path insert above

            actual = conftest._normalize(df.toPandas())
            rec["spark_s"] = round(time.time() - t0, 2)
            rec["rows"] = len(actual)
        except Exception as e:  # noqa: BLE001
            rec["spark_s"] = round(time.time() - t0, 2)
            rec["err"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(limit=3)
        if not args.skip_oracle and name in ORACLES and "err" not in rec:
            t1 = time.time()
            try:
                # full driver semantics: rows + schema + VALUES
                # (column-sorted, row-sorted, null-safe normalization)
                expected = conftest._normalize(con.execute(ORACLES[name]).fetchdf())
                rec["duck_s"] = round(time.time() - t1, 2)
                rec["oracle_rows"] = len(expected)
                rec["rows_match"] = len(expected) == rec["rows"]
                if list(actual.columns) != list(expected.columns):
                    rec["err"] = "schema mismatch vs oracle"
                elif len(actual) != len(expected):
                    pass  # rows_match already records it
                elif not actual.equals(expected):
                    rec["err"] = "value mismatch vs oracle"
                else:
                    rec["values_match"] = True
            except Exception as e:  # noqa: BLE001
                rec["duck_s"] = round(time.time() - t1, 2)
                rec["err"] = f"oracle {type(e).__name__}: {e}"
        # free the dead frame's checkpoint/cache blocks before the next
        # query (storage accumulation degraded late-suite queries)
        from ddf_flink_spark.storage import release_all_storage

        release_all_storage(spark)
        timings[name] = rec
        tot = rec.get("spark_s", 0) + rec.get("duck_s", 0)
        flag = " ERR" if "err" in rec else (
            "" if rec.get("rows_match", True) else " ROWS-MISMATCH")
        print(f"{name:45s} {tot:7.2f}s  rows={rec.get('rows', '-')}{flag}", flush=True)

    wall = round(time.time() - t_total, 1)
    slow = sorted(
        timings, key=lambda n: -(timings[n].get("spark_s", 0) + timings[n].get("duck_s", 0))
    )[:15]
    errs = [n for n in timings if "err" in timings[n]]
    mismatch = [n for n in timings if timings[n].get("rows_match") is False]
    values_ok = sum(1 for n in timings if timings[n].get("values_match"))
    print(json.dumps({
        "wall_s": wall, "n": len(names), "errors": errs, "rows_mismatch": mismatch,
        "values_match": values_ok,
        "slowest": {n: timings[n] for n in slow},
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
