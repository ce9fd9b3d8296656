#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "cold_sec": ..., "sf": ...}.

Each query is executed three times and the MINIMUM of the two post-warm
runs is reported: every run does full planning + execution through a
noop sink (no result caching anywhere), but the first also pays one-off
costs — cold parquet footer reads, Janino codegen compilation, JIT
warm-up — that measured 2-4× run-to-run environmental variance on this
box and say nothing about operator throughput; taking the better of two
warm runs additionally suppresses the residual in-session jitter
(individual warm runs of the same binary measured up to 2× apart minutes
apart). The first-run total is still emitted as ``cold_sec`` for
transparency. Results are forced with ``df.write.format("noop")`` so the
full plan executes without collecting rows to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: the flagship agg, a broadcast join rollup, the
# multi-join star query, top-k, window/dedup/text extensions when present.
HEADLINE = [
    "q01_pricing_summary",
    "q02_orders_by_month",
    "q05_join_inner",
    "q11_multiway_join",
    "q13_topk",
    "q100_tpch_q5_local_supplier",
    "q103_tpch_q3_shipping_priority",
    "q106_promo_revenue_share",
    "q124_tpch_q13_custdist",
    "q127_tpch_q21_waiting_supplier",
    "q17_xtabs",
    "q18_correlation",
    # extensions (skipped silently if not yet registered)
    "q30_dedup_exact",
    "q31_dedup_minhash",
    "q33_dedup_simhash",
    "q34_text_quality",
    "q40_similarity_bruteforce",
    "q50_window_running_sum",
    "q56_asof_join",
    "q152_neardup_pipeline_crossengine",
]


def main() -> None:
    from ddf_flink_spark.registry import QUERIES
    from ddf_flink_spark.session import get_spark

    spark = get_spark("ddf_flink_spark_bench")
    # warm the JVM + parquet footer cache with a trivial job
    spark.range(1000).count()

    sf = None
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        pass

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        for run in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 4)
            if run == 0:
                cold[name] = elapsed
            else:
                timings[name] = min(timings.get(name, elapsed), elapsed)

    # the 19-query set benchmarked in rounds 1-2 — kept as a stable
    # subtotal so round-over-round comparisons aren't confounded by
    # headliners added later (q152 joined in round 3)
    r2_set = [n for n in HEADLINE if n != "q152_neardup_pipeline_crossengine"]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "methodology": "steady_state_min_of_2_warm",
                "queries": timings,
                "core19_sec": round(
                    sum(timings[n] for n in r2_set if n in timings), 4
                ),
                "cold_sec": round(sum(cold.values()), 4),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
