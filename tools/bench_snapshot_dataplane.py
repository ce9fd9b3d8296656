"""Snapshot-store DATA-plane scaling rung (round-11 verdict #7).

The metadata plane has measured flat-in-N tables (bench_manifest.py);
the DATA plane's 10× behavior was asserted from design only. This tool
measures the four maintenance operations on the SAME store shape at
two scales a decade apart — the sf0.1 events table (100k rows) and a
10× replication (1M rows) — with an IDENTICAL file layout (same
partition count, same files per partition; only bytes/rows per file
grow 10×), so each wall ratio isolates the operation's true bound:

* ``optimize``  — claim: cost ∝ TARGETED partitions' bytes, never
                  table size. Measured two ways: one partition of 5
                  vs all 5 within a scale (≈1/5), and the same one
                  partition across the decade (≈10× — it IS that
                  partition's bytes).
* ``compact``   — claim: cost ∝ the AFFECTED partitions' bytes (probe
                  ∝ admitting files is spy-pinned in tests). A delete
                  confined to one partition folds at ≈ the cost of
                  optimizing that one partition, ≪ the full rewrite.
* ``changes``   — claim: cost ∝ the COMMIT's delta, table-size-free:
                  the same small append diffs flat across the decade.
* ``vacuum``    — claim: cost ∝ files DROPPED (+ a header diff):
                  dropping the same number of pre-optimize files is
                  flat across the decade.

Each op runs ``repeats`` times on a fresh store state where needed;
the MIN is reported (the bound, noise-free side). One JSON line at the
end; PERF.md records the table.

Usage: python tools/bench_snapshot_dataplane.py [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_store(spark, base: str, ev, n_commits: int = 4):
    """Partitioned store committed in interleaved appends — every file
    spans the full user_id domain (the streaming-arrival shape)."""
    from ddf_flink_spark.functions.manifest import (
        snapshot_append, snapshot_create,
    )
    from pyspark.sql import functions as F

    shutil.rmtree(base, ignore_errors=True)
    snapshot_create(
        ev.filter(F.col("event_id") % n_commits == 0).repartition(2),
        base, part_col="event_type", id_col="event_id",
        stats_cols=["user_id"],
    )
    for r in range(1, n_commits):
        snapshot_append(
            ev.filter(F.col("event_id") % n_commits == r).repartition(2),
            base,
        )


def timed(fn, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--scales", type=int, nargs="*", default=[1, 10],
        help="replication factors over sf0.1 events (decade ladder)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddf_flink_spark.functions.manifest import (
        snapshot_changes,
        snapshot_append,
        snapshot_compact,
        snapshot_delete,
        snapshot_optimize,
        snapshot_vacuum,
        snapshot_versions,
    )
    from ddf_flink_spark.session import get_spark

    spark = get_spark("bench_snapshot_dataplane")
    spark.range(1000).count()  # JVM warm-up

    ev1 = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", "event_type", "user_id", "value"
    )
    # 10× replication with disjoint ids — same schema, same partition
    # values, 10× rows/bytes per file
    n1 = ev1.count()

    def replicate(k_total: int):
        ev = ev1
        for k in range(1, k_total):
            ev = ev.unionByName(
                ev1.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * n1 * 100)
                )
            )
        return ev

    scales = [(f"s{k}", replicate(k)) for k in args.scales]
    tmp = tempfile.mkdtemp(prefix="snap_dataplane_")
    out: dict = {
        "rows": {t: n1 * k for (t, _), k in zip(scales, args.scales)},
        "repeats": args.repeats,
    }
    try:
        for tag, ev in scales:
            res: dict = {}
            base = os.path.join(tmp, f"store_{tag}")

            # --- optimize: one targeted partition vs all partitions
            def opt(parts=None):
                build_store(spark, base, ev)
                return timed(
                    lambda: snapshot_optimize(
                        spark, base, min_files=2, parts=parts,
                        max_records_per_file=200_000,
                    ),
                    1,  # optimize folds on first call; rebuild per rep
                )

            res["optimize_one_part_s"] = min(
                opt(parts=["click"]) for _ in range(args.repeats)
            )
            res["optimize_all_parts_s"] = min(
                opt(parts=None) for _ in range(args.repeats)
            )

            # --- compact: delete confined to ONE partition, then fold
            def comp():
                build_store(spark, base, ev)
                ids = (
                    ev.filter(F.col("event_type") == "click")
                    .select("event_id")
                    .limit(100)
                )
                snapshot_delete(ids, base)
                return timed(lambda: snapshot_compact(spark, base), 1)

            res["compact_one_part_delete_s"] = min(
                comp() for _ in range(args.repeats)
            )

            # --- changes: the same SMALL commit's delta at any scale
            build_store(spark, base, ev)
            small = ev.limit(500).withColumn(
                "event_id", F.col("event_id") + F.lit(10_000_000)
            )
            snapshot_append(small.repartition(1), base)
            vs = snapshot_versions(base)
            res["changes_small_commit_s"] = timed(
                lambda: snapshot_changes(
                    spark, base, vs[-2], vs[-1]
                ).count(),
                args.repeats,
            )

            # --- vacuum: drop the pre-optimize files (same COUNT of
            # dropped files at both scales)
            def vac():
                build_store(spark, base, ev)
                snapshot_optimize(
                    spark, base, min_files=2, max_records_per_file=200_000
                )
                return timed(
                    lambda: snapshot_vacuum(
                        base, retain_last=1, orphan_grace_seconds=None
                    ),
                    1,
                )

            res["vacuum_dropped_s"] = min(vac() for _ in range(args.repeats))
            out[tag] = res
        tags = [t for t, _ in scales]
        for op in (
            "optimize_one_part_s",
            "optimize_all_parts_s",
            "compact_one_part_delete_s",
            "changes_small_commit_s",
            "vacuum_dropped_s",
        ):
            a, b = out[tags[0]][op], out[tags[-1]][op]
            out.setdefault(f"ratio_{tags[-1]}_vs_{tags[0]}", {})[op] = (
                round(b / a, 2) if a else None
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
