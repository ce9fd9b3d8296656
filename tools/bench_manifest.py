"""Manifest commit-cost microbench: per-commit metadata cost vs table
file count, new segmented layout vs the old complete-listing layout.

The round-9 layout serialized the COMPLETE file listing into every
snapshot JSON, making each commit an O(total-files) driver rewrite.
The segmented layout (manifests/seg-*.json + tiny headers) claims
O(files-touched) commits. This tool measures both at 10^2..10^5 file
entries:

* ``append_s``     — wall time of a REAL ``snapshot_append`` of a tiny
                     DataFrame onto a store already holding N file
                     entries (Spark write + footer scan + segment write
                     + header publish). Flat in N is the claim.
* ``meta_commit_s``— the isolated metadata leg (child header build +
                     atomic publish), averaged over 20 commits.
* ``header_bytes`` — size of the published snapshot header.
* ``legacy_commit_s`` / ``legacy_bytes`` — what the OLD layout would
                     pay for the same commit: json-serialize + fsync
                     the complete materialized listing (exactly the old
                     ``_publish`` body). Linear in N.
* ``log_s``        — ``snapshot_log`` over the whole store (header-only
                     on the new layout).
* ``rewrite_s``    — ``snapshot_rewrite_manifests`` at a threshold that
                     classifies the fabricated 5000-entry segments as
                     already-consolidated: the fold materializes only
                     the handful of small appended refs, so the time is
                     flat in UNFOLDED mass (the round-11 incremental
                     fold claim).

The N-file table is fabricated from synthetic file ENTRIES (segments
written through the real ``_seg_write``); the appended data is real.
That is the honest shape for a METADATA bench — the data plane cost is
identical across layouts and constant in N.

Usage: python tools/bench_manifest.py [--sizes 100 1000 10000 100000]
Prints one JSON line at the end.
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


def fabricate(base: str, n_files: int, schema_json: str, seg_size: int = 5000):
    """A v1 header referencing n_files synthetic entries across
    ceil(n/seg_size) segments, via the real segment writer."""
    from ddf_flink_spark.functions.manifest import _publish, _seg_write

    refs = []
    i = 0
    while i < n_files:
        chunk = [
            {
                "commit": "c000001_synth000",
                "path": f"part-{j:07d}.parquet",
                "part": None,
                "rows": 1000,
                "stats": {"id": [j * 1000, j * 1000 + 999]},
            }
            for j in range(i, min(i + seg_size, n_files))
        ]
        refs.append(_seg_write(base, chunk))
        i += seg_size
    _publish(
        base,
        {
            "version": 1,
            "parent": None,
            "op": "create",
            "part_col": None,
            "id_col": "id",
            "stats_cols": ["id"],
            "bloom_cols": [],
            "schema": schema_json,
            "file_segs": refs,
            "tomb_segs": [],
            "batch_tags": [],
            "rows_added": n_files * 1000,
            "rows_removed": 0,
            "meta": {},
        },
    )


def legacy_commit_cost(base: str) -> "tuple[float, int]":
    """What the old layout's _publish paid: serialize + fsync the
    COMPLETE materialized listing."""
    from ddf_flink_spark.functions.manifest import _load_manifest

    m = _load_manifest(base)  # materialize all entries (read cost not timed)
    t0 = time.perf_counter()
    fd, tmp = tempfile.mkstemp(dir=os.path.join(base, "manifests"))
    with os.fdopen(fd, "w") as fh:
        json.dump(m, fh)
        fh.flush()
        os.fsync(fh.fileno())
    cost = time.perf_counter() - t0
    size = os.path.getsize(tmp)
    os.unlink(tmp)
    return cost, size


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", nargs="*", type=int, default=[100, 1000, 10000, 100000]
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bench-manifest")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ddf_flink_spark.functions.manifest import (
        _apply_with_retry,
        _child,
        _load_header,
        snapshot_append,
        snapshot_log,
    )

    tiny = spark.range(0, 1000).withColumn("val", 3 * __import__("pyspark").sql.functions.col("id"))
    schema_json = tiny.schema.json()
    root = tempfile.mkdtemp(prefix="bench_manifest_")
    results = []
    for n in args.sizes:
        base = os.path.join(root, f"n{n}")
        shutil.rmtree(base, ignore_errors=True)
        fabricate(base, n, schema_json)
        # real append (data write + metadata), median of 3
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            snapshot_append(tiny, base)
            walls.append(time.perf_counter() - t0)
        append_s = sorted(walls)[1]
        # isolated metadata leg: child-from-header + publish, x20
        t0 = time.perf_counter()
        for _ in range(20):
            _apply_with_retry(base, lambda p: _child(p, "noop"), retries=0)
        meta_commit_s = (time.perf_counter() - t0) / 20
        header = _load_header(base)
        hpath = os.path.join(
            base, "manifests", f"v{header['version']:06d}.json"
        )
        header_bytes = os.path.getsize(hpath)
        legacy_s, legacy_bytes = legacy_commit_cost(base)
        t0 = time.perf_counter()
        snapshot_log(spark, base).collect()
        log_s = time.perf_counter() - t0
        from ddf_flink_spark.functions.manifest import (
            snapshot_rewrite_manifests,
        )

        t0 = time.perf_counter()
        snapshot_rewrite_manifests(base, max_entries_per_seg=5000)
        rewrite_s = time.perf_counter() - t0
        row = {
            "n_files": n,
            "append_s": round(append_s, 4),
            "meta_commit_s": round(meta_commit_s, 5),
            "header_bytes": header_bytes,
            "legacy_commit_s": round(legacy_s, 4),
            "legacy_bytes": legacy_bytes,
            "log_s": round(log_s, 4),
            "rewrite_s": round(rewrite_s, 4),
        }
        results.append(row)
        print(row, flush=True)
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "manifest_commit_cost", "rows": results}))
    spark.stop()


if __name__ == "__main__":
    main()
