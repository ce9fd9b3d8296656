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

    FUSED (round 13, guide §1.2/§2.4): the whole training — init scan,
    every iteration's assignment + mean aggregation, and the chain of
    centroid tables between them — executes as ONE Spark job whose
    single collect returns the final centroids. Iteration i's rounded
    means feed iteration i+1's assignment IN-PLAN: each centroid table
    is a one-row frame broadcast into the next assignment pass, so the
    per-iteration driver barriers (init collect + one collect per
    round — the dominant cost of every index build at small scale, and
    a driver round-trip per iteration at any scale) disappear. The
    VALUE-CRITICAL subtrees are unchanged: the assignment fold is
    ``argmin_lambda_over_sql`` — character-identical to the literal
    form's lambda — and the mean aggregation is the same
    posexplode → groupBy(cluster, dim) → ROUND(AVG(x), r) exchange
    (same partitioning, same partial aggregation), so every
    intermediate centroid is bit-equal to the stepwise loop's (pinned
    by test_kmeans_lloyd_fused_matches_stepwise and the q146/q155
    oracle family). Reconstruction of the k×D table from the means is
    exact-value plumbing only: the ROUNDED means ride a
    map_from_entries gather (order-free), an emptied cluster falls
    back to its previous centroid via try_element_at + coalesce —
    the driver-side dict merge, in-plan.

    ``assume_materialized``: the caller guarantees ``df`` is already a
    materialization boundary (a localCheckpoint or an in-memory scan),
    so the internal checkpoint — whose only purpose is to stop the
    passes re-executing expensive upstream lineage — would copy the
    rows a second time for nothing. Values are identical either way (a
    checkpoint is an execution boundary, never a computation); callers
    that train over raw lineage keep the default."""
    from ..functions.exprs import argmin_lambda_over_sql

    emb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if not assume_materialized:
        # read per pass — never re-execute upstream lineage
        emb = emb.localCheckpoint()
    # cents₀: the k lowest-id vectors rounded IN-ENGINE (HALF_UP, like
    # every round here), gathered into one array<array<double>> row in
    # id order (array_sort on (id, c) structs restores the order
    # collect_list loses). n_init rides along so the under-k guard
    # needs no separate job.
    init = (
        emb.orderBy("id")
        .limit(k)
        .select(
            "id", F.transform("v", lambda x: F.round(x, round_digits)).alias("c")
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(id, c))), e -> e.c)"
            ).alias("cents"),
            F.count(F.lit(1)).alias("n_init"),
        )
    )
    # Key packing for the (cluster, dim) → mean map: dims fit well
    # under 1e6 (the widest embedding here is 64; a million-dim vector
    # would be a different engine). BIGINT arithmetic, no collision.
    _KD = 1_000_000
    cur = init
    for _ in range(iters):
        best = argmin_lambda_over_sql("cents", k, "v")
        means = (
            emb.crossJoin(F.broadcast(cur.select("cents")))
            .select(F.expr(f"{best}.cluster").alias("cluster"), "v")
            .select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("x"), round_digits).alias("c"))
        )
        gather = means.agg(
            F.expr(
                f"map_from_entries(collect_list(struct("
                f"cast(cluster as bigint) * {_KD} + dim, c)))"
            ).alias("mp")
        )
        # try_element_at (not element_at): under ANSI semantics a
        # missing map key / short array must yield NULL for the
        # coalesce fallback (emptied cluster keeps its previous
        # centroid; the under-k init case flows junk to the final
        # collect where n_init raises the same ValueError as before)
        cur = gather.crossJoin(F.broadcast(cur)).select(
            F.expr(
                f"transform(sequence(0, {k - 1}), ci -> "
                f"transform(sequence(0, greatest("
                f"size(try_element_at(cents, 1)), 1) - 1), d -> "
                f"coalesce(try_element_at(mp, cast(ci as bigint) * {_KD} + d), "
                f"try_element_at(try_element_at(cents, ci + 1), d + 1))))"
            ).alias("cents"),
            "n_init",
        )
    row = cur.collect()[0]  # ONE job: init + all passes + reconstruction
    if row["n_init"] < k:
        raise ValueError(
            f"kmeans_lloyd: k={k} but the input has only {row['n_init']} rows; "
            "need at least k rows to seed k centroids"
        )
    cents: list[list[float]] = [list(c) for c in row["cents"]]
    final = _assign(emb, cents).select("id", "cluster", "dist")
    if return_centroids:
        return final, cents
    return final


def _kmeans_lloyd_stepwise(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
    round_digits: int = 4,
    return_centroids: bool = False,
    assume_materialized: bool = False,
) -> "DataFrame | tuple[DataFrame, list[list[float]]]":
    """The pre-round-13 driver-stepped loop (init collect + one mean
    collect per iteration) — kept as the DEFINITIONAL reference the
    fused trainer is parity-pinned against
    (test_kmeans_lloyd_fused_matches_stepwise). Not used by any query
    path."""
    emb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if not assume_materialized:
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
