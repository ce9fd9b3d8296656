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


def measure_bounded_hazards(df: DataFrame) -> list[tuple[str, str, int]]:
    """EXECUTE the frame and return runtime row counts for every plan
    node an audit exemption claims is bounded, as ``(kind, node, rows)``
    triples:

    * ``single-partition`` — rows = shuffle records written into a
      SinglePartition exchange (the claim: O(1)/O(k) funnel, not the
      dataset);
    * ``cartesian-product`` — rows = the BROADCAST side's size for a
      BroadcastNestedLoopJoin (the claim: one side is a fixed seed set /
      k centroids / 1-row scalar — the output of such a join is
      input-sized, which is fine; the hazard would be a LARGE broadcast
      side), or output rows for a true CartesianProduct.

    The runtime audit (tests/test_plans.py::
    test_audit_exemptions_are_bounded_at_runtime) asserts these stay
    small at sf0.1, turning the AUDIT_EXEMPT prose ("bounded", "1-row",
    "k rows") into measured invariants.

    Executes via ``collect()`` — NOT a noop write — because a write
    spawns its own QueryExecution and would leave this frame's plan
    metrics at zero; collect() runs (and instruments) the frame's own
    execution. Exempted queries have small outputs by definition, so the
    driver-side collect is bounded."""
    df.collect()
    qe = df._jdf.queryExecution()

    out: list[tuple[str, str, int]] = []

    def metric(node, key: str) -> int | None:
        m = node.metrics()
        if m.contains(key):
            return int(m.apply(key).value())
        return None

    def unwrap(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return unwrap(node.executedPlan())
        if "QueryStageExec" in cls:
            return unwrap(node.plan())
        # pure pass-through wrappers (codegen plumbing / exchange reuse)
        if cls in ("InputAdapter", "WholeStageCodegenExec", "ReusedExchangeExec"):
            return unwrap(node.child())
        return node

    def broadcast_side_rows(join_node) -> int | None:
        ch = join_node.children()
        for i in range(ch.size()):
            c = unwrap(ch.apply(i))
            if c.getClass().getSimpleName() == "BroadcastExchangeExec":
                return metric(c, "numOutputRows")
        return None

    def walk(node) -> None:
        node = unwrap(node)
        cls = node.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec":
            part = node.outputPartitioning().toString()
            if "SinglePartition" in part:
                rows = metric(node, "shuffleRecordsWritten")
                out.append(("single-partition", cls, rows if rows is not None else -1))
        elif cls == "BroadcastNestedLoopJoinExec":
            rows = broadcast_side_rows(node)
            if rows is None:
                rows = metric(node, "numOutputRows")
            out.append(("cartesian-product", cls, rows if rows is not None else -1))
        elif cls == "CartesianProductExec":
            rows = metric(node, "numOutputRows")
            out.append(("cartesian-product", cls, rows if rows is not None else -1))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(qe.executedPlan())
    return out
