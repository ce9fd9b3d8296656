"""Per-query CPU regression gate (round-7 directive #7).

Wall time on the shared box drifts with load (r4→r6 history: ±20% on
identical code), so round-over-round adjudication anchors on
CPU-seconds — load-insensitive user+sys of driver + JVM + python
workers, measured per query by bench.py since round 6. This script
fails when any ANCHORED query's steady-state cpu min exceeds its
committed anchor (tools/cpu_anchors.json — r6 values for the long-lived
members, r8 quiet-box values for later additions, per the in-file
notes) by more than 25%, automating the discipline instead of
re-litigating it in prose each round.

Usage:
    python bench.py | tee /tmp/bench_out.txt
    python tools/bench_check.py /tmp/bench_out.txt [more_runs.txt ...]

Accepts raw bench.py stdout files (parses the LAST JSON line, the
compact summary whose "cpu" map is keyed by the unique qNN prefix)
and/or driver BENCH_r*.json wrappers (reads their "tail"). With
multiple files the per-query BEST (min) across runs is compared —
single-run min-of-3 CPU is spiky for sub-2s queries (measured: q56
0.58 vs 1.55 across two same-day runs). Exits 1 on regression.
A non-quiet box (1-minute loadavg at bench start above CPUS/4) can hide
JIT-steady-state in noise, so regressions there are reported but
downgraded to a warning (exit 0) — rerun on a quiet box to adjudicate.

A failure here is a tripwire, not a verdict: the decisive protocol is
the same-session INTERLEAVED A/B (old/new code alternated in one JVM,
>=4 runs each, compare mins — see PERF.md round-7 addendum). Anchors
are recalibrated, with a note in cpu_anchors.json, only after an
interleaved A/B adjudicates a trip as flat.
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ANCHORS = os.path.join(HERE, "cpu_anchors.json")
TOLERANCE = 1.25
ABS_SLACK = 0.3  # cpu-s; sub-second queries jitter by scheduling, not code


def _core19() -> list[str]:
    src = open(os.path.join(HERE, "..", "bench.py")).read()
    m = re.search(r"CORE19 = (\[[^\]]*\])", src, re.S)
    import ast

    return ast.literal_eval(m.group(1))


def _load_summary(path: str) -> dict:
    text = open(path).read()
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
    except json.JSONDecodeError:
        pass
    # last parseable JSON object line that carries a per-query cpu map
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "cpu" in obj or "cpu_s" in obj:
            return obj
    raise SystemExit(f"no bench summary JSON with a cpu map found in {path}")


def main() -> int:
    paths = sys.argv[1:] or ["/tmp/bench_out.txt"]
    summaries = [_load_summary(p) for p in paths]
    anchors = json.load(open(ANCHORS))["cpu_min"]
    core19 = set(_core19())

    by_prefix = {name.split("_", 1)[0]: name for name in anchors}
    measured: dict[str, float] = {}
    start_load = 0.0
    # Round-12 rule: an artifact stamped contended by bench.py's own
    # load gate (15-min loadavg above threshold at start) can never
    # pass — the committed file IS the claim, and round 11 proved a
    # busy-box capture misstates the round even when the code is flat.
    for summary in summaries:
        if summary.get("contended"):
            print(
                "bench_check: FAIL — artifact is stamped contended "
                f"(15-min load {summary.get('load15', '?')} at start); "
                "re-run on a quiet box"
            )
            return 1
    for summary in summaries:
        cpu = summary.get("cpu_s") or summary.get("cpu") or {}
        for key, val in cpu.items():
            name = key if key in anchors else by_prefix.get(key.split("_", 1)[0])
            if name and float(val) >= 0:  # negative = dropped cohort sample
                measured[name] = min(measured.get(name, 1e18), float(val))
        load = summary.get("load") or summary.get("loadavg_start") or [0.0]
        start_load = max(start_load, float(load[0]))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    quiet = start_load <= cpus / 4

    failures = []
    # Round 8: every anchored query that was measured is checked (the
    # anchors file is the source of truth), not just CORE19 — the ANN
    # build/serve legs (q258/q259) and the post-r6 headliners get the
    # same regression tripwire. CORE19 membership no longer gates.
    for name, anchor in sorted(anchors.items()):
        if name not in measured:
            continue
        limit = max(anchor * TOLERANCE, anchor + ABS_SLACK)
        if measured[name] > limit:
            failures.append(
                f"{name}: cpu_min {measured[name]:.2f} > limit {limit:.2f} "
                f"(anchor {anchor:.2f} +25%)"
            )

    checked = sorted(n for n in anchors if n in measured)
    print(
        f"bench_check: {len(checked)} anchored queries checked "
        f"({len([n for n in checked if n in core19])} core19), "
        f"start load {start_load:.2f} ({'quiet' if quiet else 'BUSY'})"
    )
    if failures:
        for f in failures:
            print("REGRESSION:", f)
        if not quiet:
            print(
                "box not quiet (load > cpus/4) — regressions are advisory; "
                "rerun on a quiet box to adjudicate"
            )
            return 0
        return 1
    print("bench_check: OK — no anchored CPU regression past 25%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
