"""Iterative graph algorithms over DataFrames (beyond-parity extension).

Cluster formation for dedup lives in ``functions/dedup.connected_components``
(min-label propagation); this module adds PageRank — the canonical
iterative-fixpoint shape the reference cannot express at all (its dialect
is single-block SELECT, ``SqlSupport.scala:133-150``; no iteration,
no recursion).

Design for scale: each superstep is one join + one aggregation on
DataFrames (Catalyst plans both; AQE sizes the shuffles). Lineage is
truncated every superstep with ``localCheckpoint`` so the plan doesn't
grow with iterations. The per-superstep dangling-mass term is a single
scalar aggregate collected to the driver — the same global-coordination
step GraphX/Pregel performs between supersteps, O(1) bytes per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_count"]


def triangle_count(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Exact triangle count by DEGREE-ORDERED ORIENTATION [Schank &
    Wagner 2005; the compact-forward algorithm]: orient every undirected
    edge from its lower-(degree, id) endpoint to the higher, then count
    directed paths a→b→c closed by a→c. The orientation makes the wedge
    join's fan-out per node O(√m) instead of O(max-degree) — the step
    that keeps the join volume bounded on power-law graphs, where an
    unoriented wedge enumeration explodes on hub nodes (the 100 TB
    skew story: a hub with degree 10⁶ contributes 10¹² unoriented
    wedges but only ~m^{1/2}-bounded oriented ones).

    ``edges`` must carry each undirected edge ONCE (u < v, deduped).
    Two shuffles (degree agg + orientation join), then two self-joins of
    the oriented edge list. Returns one row (n_nodes, n_edges,
    n_triangles). Spark-side twin of the DuckDB oracle in registry q178."""
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = deg.agg(F.count(F.lit(1)).alias("n_nodes")).crossJoin(
        F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges")))
    )
    return counts.crossJoin(F.broadcast(tri)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 8,
    damping: float = 0.85,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int | None = None,
) -> DataFrame:
    """Power-iteration PageRank with dangling-mass redistribution.

    rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )

    where ``dangling`` is the total rank held by nodes without out-edges
    (redistributed uniformly, the standard formulation — total rank mass
    stays 1 every iteration). Returns (id, rank).

    ``edges`` are directed (pass both directions for a similarity graph).
    Nodes absent from ``edges`` still receive the base + dangling terms.

    ``round_digits`` rounds every node's rank after each iteration (and
    the dangling scalar to ``round_digits + 2``): float-summation order
    then can't leak into the next iteration, so an external engine
    replaying the same rounded recurrence (registry q153's DuckDB oracle)
    reproduces every rank exactly — the same re-synchronization trick as
    ``ml/kmeans`` centroid rounding. None (default) = full precision.
    """
    n_total = nodes.count()
    if n_total == 0:
        return nodes.select(F.col(id_col).alias("id"), F.lit(0.0).alias("rank"))

    from ..storage import release_checkpoint, tracked_local_checkpoint

    ids = tracked_local_checkpoint(nodes.select(F.col(id_col).alias("id")))
    # degrees and weighted edges are BOTH checkpointed: every superstep
    # reads them (the dangling-mass anti-join reads out_deg too), and
    # their upstream lineage — e.g. a whole candidate-pair pipeline —
    # must not re-execute per iteration
    out_deg = tracked_local_checkpoint(
        edges.groupBy(F.col(src_col).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    )
    edges_w = tracked_local_checkpoint(
        edges.select(F.col(src_col).alias("esrc"), F.col(dst_col).alias("edst"))
        .join(out_deg, F.col("esrc") == out_deg.id)
        .select("esrc", "edst", "deg")
    )
    from ..storage import observed_local_checkpoint

    ranks = ids.withColumn("rank", F.lit(1.0 / n_total))
    # rank mass sitting on dangling nodes (no out-edges) — one scalar per
    # superstep, the Pregel-style global coordination. Superstep 0 pays a
    # dedicated aggregation job over the (lazy) uniform init; every later
    # superstep's dangling sum rides the SAME job that materializes that
    # superstep's rank checkpoint via observe() (a left join with the
    # already-checkpointed degree table marks danglers), so the loop runs
    # ONE Spark job per iteration instead of two — same float-sum + round
    # discipline, just fused into the checkpoint's CollectMetrics.
    dangling = (
        ranks.join(out_deg, "id", "left_anti").agg(F.sum("rank")).first()[0]
        or 0.0
    )
    prev_cp = None
    for it in range(iterations):
        if round_digits is not None:
            dangling = round(dangling, round_digits + 2)
        contribs = (
            edges_w.join(ranks, edges_w.esrc == ranks.id)
            .select(
                F.col("edst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        base = (1.0 - damping) / n_total + damping * dangling / n_total
        new_rank = F.lit(base) + F.lit(damping) * F.coalesce(
            F.col("in_mass"), F.lit(0.0)
        )
        if round_digits is not None:
            new_rank = F.round(new_rank, round_digits)
        cp3, observed_dangling = observed_local_checkpoint(
            ids.join(contribs, "id", "left")
            .select("id", new_rank.alias("rank"))
            .join(out_deg, "id", "left")
            .select(
                "id",
                "rank",
                F.when(F.col("deg").isNull(), F.col("rank")).alias("__dangling"),
            ),
            "pagerank_dangling",
            F.sum("__dangling").alias("dangling"),
        )
        # the projection would drop the tracked-checkpoint ids — carry
        # them over so the generation release below still frees blocks
        from ..storage import propagate_checkpoint_ids

        ranks = propagate_checkpoint_ids(cp3.select("id", "rank"), cp3)
        # superstep i's rank blocks die once i+1 is materialized; the
        # final iteration's checkpoint is the returned frame and stays
        release_checkpoint(prev_cp)
        prev_cp = ranks
        dangling = observed_dangling or 0.0
    if prev_cp is not None:
        # the returned ranks frame is itself a materialized checkpoint,
        # so the loop-only inputs (ids / degrees / weighted edges) are
        # dead; with zero iterations ranks still derives from ids — keep
        for loop_cp in (ids, out_deg, edges_w):
            release_checkpoint(loop_cp)
    return ranks
