"""Persisted ANN-index lifecycle: persist / load / delete / compact.

The q245 layout made durable as a small API: PQ codes as parquet
partitioned BY list_id (probes become partition-pruned reads) plus
coarse-centroid and codebook sidecars. This module adds the two
operations every RETAINED corpus eventually runs (round-7 verdict's
"beyond-parity" list):

* **delete-by-id** (:func:`index_delete_ids`) — the GDPR-shaped
  operation: ids are appended to a TOMBSTONE table next to the codes;
  nothing is rewritten at delete time (an O(|ids|) append, never an
  O(corpus) rewrite). Serving reads the codes ANTI-JOINED against the
  tombstones (:func:`load_index` does this by default), so a delete is
  visible at the very next query. Tombstone semantics: deleted vectors
  leave the SERVING set; the model (coarse centroids, codebooks) keeps
  its historical training — re-training is a rebuild or a targeted
  :func:`~.similarity.ivfadc_rebalance`, not a side effect of deletion.
* **compaction** (:func:`index_compact`) — folds the tombstones in by
  REWRITING ONLY THE AFFECTED PARTITIONS: the tombstoned rows' distinct
  list_ids are a bounded collect (≤ n_lists ints), survivors of those
  cells are staged to fresh partition directories, and the affected
  directories are swapped (a cell whose rows are all deleted is simply
  removed). Untouched partitions keep their files byte-identical — the
  rewrite is partition-pruned (plan-locked in tests), proportional to
  the affected cells' rows, never corpus size. After the swap the
  tombstones are retired. The stage-then-swap here is a directory
  rename; on an object store the same shape rides the table format's
  atomic commit (e.g. a transactional catalog) — the plan is identical.

The same tombstone-and-anti-join discipline applies unchanged to any
id-keyed persisted corpus (the dedup fingerprint tables): the anti-join
key is the id column, the compaction unit is whatever the table is
partitioned by.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "persist_index",
    "load_index",
    "index_delete_ids",
    "index_compact",
]


def persist_index(
    index: DataFrame, coarse: list, codebooks: list, base: str
) -> None:
    """Write the composite IVFADC index (q245's layout): codes
    partitioned by list_id + coarse/codebook parquet sidecars."""
    spark = index.sparkSession
    m, k = len(codebooks), len(codebooks[0])
    index.write.mode("overwrite").partitionBy("list_id").parquet(f"{base}/codes")
    spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(coarse)],
        "list_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{base}/coarse")
    spark.createDataFrame(
        [(j, c, list(codebooks[j][c])) for j in range(m) for c in range(k)],
        "j int, code int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{base}/codebooks")


def load_index(
    spark: SparkSession, base: str, apply_tombstones: bool = True
) -> "tuple[DataFrame, list, list]":
    """Reload (codes, coarse, codebooks) from a :func:`persist_index`
    layout. With ``apply_tombstones`` (default) the codes frame is
    anti-joined against the tombstone table, so deleted ids are
    invisible to every downstream search — the anti-join's build side
    is the (small) tombstone set, broadcast by AQE."""
    codes = spark.read.parquet(f"{base}/codes")
    if apply_tombstones and os.path.isdir(f"{base}/tombstones"):
        codes = codes.join(
            spark.read.parquet(f"{base}/tombstones"), "id", "left_anti"
        )
    coarse = [
        list(r["centroid"])
        for r in spark.read.parquet(f"{base}/coarse").orderBy("list_id").collect()
    ]
    cb_rows = spark.read.parquet(f"{base}/codebooks").orderBy("j", "code").collect()
    m = 1 + max(r["j"] for r in cb_rows)
    codebooks = [
        [list(r["centroid"]) for r in cb_rows if r["j"] == j] for j in range(m)
    ]
    return codes, coarse, codebooks


def index_delete_ids(spark: SparkSession, base: str, ids: DataFrame) -> None:
    """Tombstone ``ids`` (a one-column ``id`` frame): append-only, no
    read or rewrite of the codes — O(|ids|) regardless of index size."""
    ids.select(F.col(ids.columns[0]).alias("id")).write.mode("append").parquet(
        f"{base}/tombstones"
    )


def index_compact(
    spark: SparkSession,
    base: str,
    table: str = "codes",
    part_col: str = "list_id",
) -> "dict[str, int]":
    """Fold tombstones into the ``table`` layout by rewriting ONLY the
    affected partitions, then retire the tombstones. Returns
    ``{"affected_cells": n, "dropped_rows": n}``. The survivors scan is
    partition-pruned (``part_col IN affected`` reaches PartitionFilters
    — plan-locked in tests); untouched partitions keep their files.
    ``table``/``part_col`` default to the IVFADC codes layout; any
    id-keyed table partitioned by a bounded-cardinality column compacts
    the same way (q261 runs it on the dedup fingerprint corpus,
    partitioned by fingerprint bucket)."""
    tomb_dir = f"{base}/tombstones"
    if not os.path.isdir(tomb_dir):
        return {"affected_cells": 0, "dropped_rows": 0}
    tomb = spark.read.parquet(tomb_dir)
    rows = spark.read.parquet(f"{base}/{table}")
    hit = rows.join(tomb, "id", "left_semi")
    affected = sorted(
        int(r[part_col])
        for r in hit.select(part_col).distinct().collect()  # bounded: ≤ n_parts
    )
    dropped = hit.count()
    if affected:
        survivors = rows.filter(F.col(part_col).isin(affected)).join(
            tomb, "id", "left_anti"
        )
        staging = f"{base}/{table}_compact_staging"
        survivors.write.mode("overwrite").partitionBy(part_col).parquet(staging)
        for c in affected:
            dst = f"{base}/{table}/{part_col}={c}"
            src = f"{staging}/{part_col}={c}"
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                shutil.move(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(tomb_dir, ignore_errors=True)
    return {"affected_cells": len(affected), "dropped_rows": int(dropped)}
