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

Scale shape: assignment is a broadcast of k·d literal doubles into a
map-side explode+min_by (no shuffle of vectors); the update is one
posexplode + (cluster, dim) partial-aggregated groupBy per iteration.
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
    """(id, v, cluster, dist) — nearest centroid per row, deterministic."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(ci).alias("cluster"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for ci, c in enumerate(cents)
        ]
    )
    scored = emb.select("id", "v", F.explode(cent_arr).alias("k")).select(
        "id",
        "v",
        F.col("k.cluster").alias("cluster"),
        F.sqrt(
            F.aggregate(
                F.zip_with("v", F.col("k.c"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("dist"),
    )
    best = scored.groupBy("id").agg(
        F.min_by(
            F.struct("cluster", "dist", "v"),
            F.struct(F.round("dist", 6).alias("rd"), F.col("cluster")),
        ).alias("b")
    )
    return best.select(
        "id",
        F.col("b.v").alias("v"),
        F.col("b.cluster").alias("cluster"),
        F.col("b.dist").alias("dist"),
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """Run ``iters`` deterministic Lloyd iterations; returns the final
    (id, cluster, dist) assignment. A cluster that loses every member
    keeps its previous centroid (mirrored by the oracle's LEFT JOIN +
    COALESCE)."""
    emb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    init_rows = (
        emb.orderBy("id")
        .limit(k)
        .select(F.transform("v", lambda x: F.round(x, round_digits)).alias("c"))
        .collect()
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
    return _assign(emb, cents).select("id", "cluster", "dist")
