"""Per-stage empirical profile of registry queries (guide §1.1/§7.1).

Usage: python tools/profile_query.py q275_chunk_pq_build_persist [q244...]

Runs each query once cold + once warm through the noop sink with the
Spark UI enabled, then scrapes the UI REST API (localhost:4040) for the
warm run's jobs and stages, printing them sorted by executor run time:
stage id, wall, task time, GC, shuffle read/write bytes, input bytes and
the stage's name/callsite. This is the "open the Spark UI, find the
slowest stage" loop from the optimization guide, captured for a headless
box. Nothing here feeds the bench artifact — measurement tooling only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    from ddf_flink_spark.registry import QUERIES
    from ddf_flink_spark.session import get_spark
    from ddf_flink_spark.storage import release_all_storage

    spark = get_spark("profile-query", **{"spark.ui.enabled": "true"})
    spark.range(1000).count()
    app_id = _api("/applications")[0]["id"]

    for name in names:
        fn = QUERIES[name]
        # cold run (not profiled: pays codegen/JIT/footer reads)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        release_all_storage(spark)
        jobs_before = {j["jobId"] for j in _api(f"/applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        release_all_storage(spark)

        jobs = [
            j
            for j in _api(f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for s in _api(f"/applications/{app_id}/stages?status=complete"):
            if s["stageId"] in stage_ids:
                stages.append(s)
        stages.sort(key=lambda s: -s["executorRunTime"])
        print(f"\n=== {name}: cold {cold:.2f}s warm {warm:.2f}s "
              f"jobs={len(jobs)} stages={len(stages)} ===")
        print(f"{'stage':>6} {'wall_s':>7} {'task_s':>7} {'gc_s':>6} "
              f"{'in_MB':>7} {'sh_r_MB':>8} {'sh_w_MB':>8} {'tasks':>5}  name")
        for s in stages[:14]:
            wall = (s.get("completionTime") and s.get("firstTaskLaunchedTime")) and (
                _ts(s["completionTime"]) - _ts(s["firstTaskLaunchedTime"])
            ) or 0.0
            print(
                f"{s['stageId']:>6} {wall:>7.2f} "
                f"{s['executorRunTime']/1e3:>7.2f} "
                f"{s['jvmGcTime']/1e3:>6.2f} "
                f"{s['inputBytes']/1e6:>7.1f} "
                f"{s['shuffleReadBytes']/1e6:>8.2f} "
                f"{s['shuffleWriteBytes']/1e6:>8.2f} "
                f"{s['numCompleteTasks']:>5}  {s['name'][:60]}"
            )
        total_task = sum(s["executorRunTime"] for s in stages) / 1e3
        print(f"   sum of stage task time: {total_task:.2f}s over "
              f"{len(stages)} stages; driver/gap time = "
              f"{warm - total_task/32:.2f}s est")


def _ts(s: str) -> float:
    from datetime import datetime

    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


if __name__ == "__main__":
    main()
