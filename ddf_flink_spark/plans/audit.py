"""Physical-plan scale auditor — the automated form of PERF.md's manual
audit. ``audit_plan(df)`` inspects the formatted physical plan and
returns findings for the patterns that break at 100 TB even though they
pass every small-scale test:

* ``cartesian-product`` — O(n·m) pair explosion (`CartesianProduct` /
  `BroadcastNestedLoopJoin`); fine only for deliberately bounded seed
  sets (the brute-force-cosine exemption in PERF.md).
* ``single-partition`` — an `Exchange SinglePartition` funnels the whole
  dataset through ONE task: a global window (`OVER ()` without
  PARTITION BY), a global non-limited sort, or a 1-row aggregate over
  everything. The reference's `parallelism=1` sort
  (utils/package.scala:369-378) is exactly this cliff; our q46/q47 keep
  the 1-row-agg form deliberately (O(1) output — flagged as info, the
  caller decides).
* ``python-row-udf`` — `BatchEvalPython` (row-at-a-time Python) in the
  plan; 10-100× slower than Arrow (`ArrowEvalPython`) or built-ins.
* ``unpushed-filter`` — a parquet scan whose `PushedFilters` is empty
  while a `Filter` sits directly above it: the predicate is evaluated
  post-scan, so row groups can't be skipped.
* ``global-limit-sort`` — `Sort` feeding `GlobalLimit` instead of
  `TakeOrderedAndProject` (full sort where a heap suffices).

This is a *linter*, not a gate: the findings are strings for a human (or
a test) to judge. `tests/test_plans.py` pins that the TPC-H headliners
audit clean and that seeded hazard plans are each caught.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = ["audit_plan", "formatted_plan"]


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_plan(df: DataFrame) -> list[str]:
    """Return scale-hazard findings ("<kind>: <detail>") for the
    DataFrame's physical plan; empty list = no known hazards."""
    plan = formatted_plan(df)
    findings: list[str] = []

    if "CartesianProduct" in plan:
        findings.append(
            "cartesian-product: CartesianProduct in plan — O(n*m) pair "
            "explosion; bound one side or add an equi-join key"
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            "cartesian-product: BroadcastNestedLoopJoin — non-equi join "
            "re-scans the broadcast side per row; acceptable only for "
            "deliberately bounded seed/range sides"
        )
    # formatted plans list the partitioning in an Arguments line below the
    # Exchange node, so match the token anywhere
    if "SinglePartition" in plan:
        findings.append(
            "single-partition: Exchange SinglePartition — the full "
            "dataset funnels through one task (global window/sort or "
            "1-row aggregate; the latter is fine when the OUTPUT is O(1))"
        )
    if "BatchEvalPython" in plan:
        findings.append(
            "python-row-udf: BatchEvalPython — row-at-a-time Python in "
            "the hot path; use built-ins or an Arrow pandas UDF"
        )
    # Parquet scan with an empty pushdown list whose DIRECT parent in the
    # numbered plan tree is a Filter (a Filter elsewhere in a multi-scan
    # plan — e.g. above the OTHER, pushed scan — is not a finding).
    empty_pushdown_ids = {
        m.group(1)
        for m in re.finditer(
            r"^\((\d+)\) Scan parquet[^\n]*\n(?:(?!^\(\d+\))[^\n]*\n){0,12}?"
            r"\s*PushedFilters: \[\]",
            plan,
            re.M,
        )
    }
    if empty_pushdown_ids:
        tree = plan.split("\n\n", 1)[0].splitlines()
        for sid in empty_pushdown_ids:
            scan_ix = next(
                (
                    i
                    for i, ln in enumerate(tree)
                    if re.search(rf"Scan parquet\s*\({sid}\)", ln)
                ),
                None,
            )
            if scan_ix is None:
                continue

            def _indent(ln: str) -> int:
                stripped = ln.lstrip(" :+|-")
                return len(ln) - len(stripped)

            depth = _indent(tree[scan_ix])
            parent = next(
                (
                    tree[i]
                    for i in range(scan_ix - 1, -1, -1)
                    if _indent(tree[i]) < depth
                ),
                "",
            )
            if re.search(r"\bFilter \(\d+\)", parent):
                findings.append(
                    f"unpushed-filter: parquet scan ({sid}) has PushedFilters: "
                    "[] while its parent Filter runs above it — predicate not "
                    "reaching the scan (cast/UDF around the column?)"
                )
    if re.search(r"GlobalLimit", plan) and re.search(r"\(\d+\) Sort\b", plan) and "TakeOrderedAndProject" not in plan:
        findings.append(
            "global-limit-sort: Sort feeding GlobalLimit instead of "
            "TakeOrderedAndProject — full sort where a top-k heap suffices"
        )
    return findings
