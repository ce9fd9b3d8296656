"""Deterministic fixed-iteration Lloyd's k-means over an embedding column.

The production clustering path is ``pyspark.ml.clustering.KMeans``
(k-means|| init — see registry q62, which replaces the reference's 615-LoC
vendored KMeans, flink/src/main/scala/org/apache/flink/ml/clustering/
KMeans.scala:1-615). That path is seeded-deterministic but NOT
cross-engine-reproducible, so it can only be rows-only checked.

This module is the *verification* variant: init and every update are
fully deterministic and expressible in plain SQL, so an external engine
(the DuckDB oracle in registry q146) reproduces the entire iteration
bit-for-bit:

* init — the k lowest-id vectors, coordinates rounded to ``round_digits``;
* assignment — squared-L2 argmin, ranked on the distance ROUNDED to 6
  digits with cluster-id tie-break (knife-edge float orderings can't
  diverge across engines);
* update — per-dimension mean, rounded to ``round_digits`` (rounding each
  iteration re-synchronizes engines whose summation order differs).

Scale shape: assignment is a pure map — k·d literal doubles folded into
an ``array_min`` argmin per row, no explode, no shuffle of vectors; the
update is one posexplode + (cluster, dim) partial-aggregated groupBy per
iteration.
Centroids (k·d values — model state, not data) are the only thing
collected to the driver, matching the collect() discipline in PERF.md.
The per-element HOF distance is acceptable here because k is small and
this variant targets verification corpora; q62 is the throughput path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_lloyd"]


def _assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(id, v, cluster, dist) — nearest centroid per row, deterministic.

    Pure MAP: per-centroid distances land in an array and ``array_min``
    over (rounded dist, cluster id) structs picks the argmin with the
    tie-break in the ordering — no explode, no groupBy, so assignment
    never shuffles the vectors (the earlier explode+min_by form
    re-shuffled the corpus by id every iteration).

    Built as ONE ``F.expr`` SQL text instead of k·dim Column-API calls
    (the Column form cost one synchronous py4j round-trip per
    ``F.lit``/HOF node, which dominated every Lloyd pass), and as a
    LAMBDA over a single centroid-table literal instead of k inlined
    distance trees (the expanded form re-paid O(k·dim) analysis +
    codegen on every iteration, and its 'dist' extra re-evaluated each
    fold a second time; the lambda binds each distance once — see
    exprs.argmin_lambda_sql for the measured numbers). Same
    zip_with/aggregate fold, same 0.0 seed, same round-6 + cluster-id
    tie-break — bit-identical values (pinned by
    tests/test_operators.py::TestExprSql)."""
    from ..functions.exprs import argmin_lambda_sql

    best = F.expr(argmin_lambda_sql(cents, "v", with_dist=True))
    return emb.select(
        "id", "v", best["cluster"].alias("cluster"), best["dist"].alias("dist")
    )


# Round-13 adjudication: a FUSED one-job variant of this trainer (init +
# every iteration's means chained in-plan through broadcast one-row
# centroid frames, one final collect — commit aecb6dd,
# parity-pinned bit-for-bit there) was built, verified
# (17/17 sf0.01 oracles, 7/7 sf0.1, 6/6 at 8 cores) and then REJECTED
# on measurement: each iteration's subtree is referenced twice (by the
# next assignment and by the emptied-cluster fallback), so the logical
# tree grows ~2^iters and Catalyst's optimizer pays ~0.4-0.5 s per
# training on the nested plan, while the fused collect still fires one
# AQE stage-job per exchange — interleaved A/B (min-of-2 per arm):
# q265 1.96 s stepwise vs 3.34 s fused, q258 3.16 vs 3.33, q244 4.12
# vs 4.89. One driver barrier per Lloyd round is CHEAPER than the
# optimizer tax of a multi-iteration nested plan on PySpark classic;
# the stepwise loop stays the production path.


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
    round_digits: int = 4,
    return_centroids: bool = False,
    assume_materialized: bool = False,
) -> "DataFrame | tuple[DataFrame, list[list[float]]]":
    """Run ``iters`` deterministic Lloyd iterations; returns the final
    (id, cluster, dist) assignment — or, with ``return_centroids``, the
    tuple (assignment, centroids) so downstream quantizer users (IVF —
    registry q155) can probe cells. A cluster that loses every member
    keeps its previous centroid (mirrored by the oracle's LEFT JOIN +
    COALESCE).

    ``assume_materialized``: the caller guarantees ``df`` is already a
    materialization boundary (a localCheckpoint or an in-memory scan),
    so the internal checkpoint — whose only purpose is to stop the
    iterations re-executing expensive upstream lineage — would copy the
    rows a second time for nothing. Each iteration then re-reads the
    caller's checkpoint through a cheap projection instead. Values are
    identical either way (a checkpoint is an execution boundary, never
    a computation); callers that train over raw lineage keep the
    default."""
    emb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if not assume_materialized:
        # read per iteration — never re-execute upstream lineage
        emb = emb.localCheckpoint()
    init_rows = (
        emb.orderBy("id")
        .limit(k)
        .select(F.transform("v", lambda x: F.round(x, round_digits)).alias("c"))
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans_lloyd: k={k} but the input has only {len(init_rows)} rows; "
            "need at least k rows to seed k centroids"
        )
    cents: list[list[float]] = [list(r["c"]) for r in init_rows]
    for _ in range(iters):
        assigned = _assign(emb, cents)
        mean_rows = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("x"), round_digits).alias("c"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["c"]
        cents = [
            [by_cluster[ci][d] for d in range(len(cents[ci]))]
            if ci in by_cluster
            else cents[ci]
            for ci in range(k)
        ]
    final = _assign(emb, cents).select("id", "cluster", "dist")
    if return_centroids:
        return final, cents
    return final
