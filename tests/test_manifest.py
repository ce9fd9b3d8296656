"""Snapshot-versioned manifest store (functions/manifest.py): atomic
commits, time travel, merge-on-read deletes, partition-pruned
compaction, manifest-level file pruning, vacuum GC, concurrency."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ddf_flink_spark.functions.manifest import (
    SnapshotConflict,
    _child,
    _load_manifest,
    _publish,
    snapshot_append,
    snapshot_compact,
    snapshot_create,
    snapshot_delete,
    snapshot_log,
    snapshot_read,
    snapshot_restore,
    snapshot_vacuum,
    snapshot_versions,
)


def _mkbase(tmp_path, name):
    base = str(tmp_path / name)
    shutil.rmtree(base, ignore_errors=True)
    return base


def _frame(spark, lo, hi, n_parts=4):
    return (
        spark.range(lo, hi)
        .withColumn("cell", (F.col("id") % n_parts).cast("int"))
        .withColumn("val", (F.col("id") * 3 + 1).cast("long"))
    )


def _paths(manifest):
    return {(e["commit"], e["path"]) for e in manifest["files"]}


class TestLifecycle:
    def test_create_append_read(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m1")
        assert snapshot_create(_frame(spark, 0, 100), base, part_col="cell") == 1
        assert snapshot_read(spark, base).count() == 100
        assert snapshot_append(_frame(spark, 100, 150), base) == 2
        got = snapshot_read(spark, base)
        assert got.count() == 150
        assert set(got.columns) == {"id", "cell", "val"}
        # appended rows actually present with correct values
        row = got.filter(F.col("id") == 149).collect()[0]
        assert row["val"] == 149 * 3 + 1 and row["cell"] == 149 % 4

    def test_create_on_existing_store_conflicts(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m2")
        snapshot_create(_frame(spark, 0, 10), base)
        with pytest.raises(SnapshotConflict):
            snapshot_create(_frame(spark, 0, 10), base)

    def test_idempotent_append_by_batch_tag(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m3")
        snapshot_create(_frame(spark, 0, 10), base, part_col="cell")
        v = snapshot_append(_frame(spark, 10, 20), base, batch_tag="b1")
        assert v == 2
        # replaying the same micro-batch is a no-op: same version, no dup rows
        assert snapshot_append(_frame(spark, 10, 20), base, batch_tag="b1") == 2
        assert snapshot_read(spark, base).count() == 20
        # a different tag commits
        assert snapshot_append(_frame(spark, 20, 25), base, batch_tag="b2") == 3
        assert snapshot_read(spark, base).count() == 25

    def test_unpartitioned_table(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m4")
        snapshot_create(_frame(spark, 0, 50), base)  # no part_col
        snapshot_delete(spark.range(0, 10), base)
        assert snapshot_read(spark, base).count() == 40
        snapshot_compact(spark, base)
        assert snapshot_read(spark, base).count() == 40
        assert _load_manifest(base)["tombstones"] == []


class TestDeleteTimeTravel:
    def test_merge_on_read_and_time_travel(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m5")
        snapshot_create(_frame(spark, 0, 100), base, part_col="cell")
        v_pre = snapshot_versions(base)[-1]
        snapshot_delete(spark.range(0, 100).filter(F.col("id") % 5 == 0), base)
        assert snapshot_read(spark, base).count() == 80
        # the pre-delete snapshot still serves every row
        assert snapshot_read(spark, base, version=v_pre).count() == 100

    def test_tombstone_ids_missing_from_table(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m6")
        snapshot_create(_frame(spark, 0, 20), base, part_col="cell")
        snapshot_delete(spark.range(1000, 1100), base)  # all miss
        assert snapshot_read(spark, base).count() == 20
        v = snapshot_compact(spark, base)  # retires them, rewrites nothing
        m = _load_manifest(base, v)
        assert m["tombstones"] == [] and m["op"] == "compact"
        assert snapshot_read(spark, base).count() == 20

    def test_restore_rolls_forward(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m7")
        snapshot_create(_frame(spark, 0, 30), base, part_col="cell")
        snapshot_delete(spark.range(0, 15), base)
        snapshot_compact(spark, base)
        assert snapshot_read(spark, base).count() == 15
        v = snapshot_restore(base, 1)
        assert v == 4
        assert snapshot_read(spark, base).count() == 30
        # history stayed linear: v3 still reads the compacted state
        assert snapshot_read(spark, base, version=3).count() == 15


class TestCompaction:
    def test_untouched_partition_entries_carried_verbatim(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m8")
        snapshot_create(_frame(spark, 0, 400, n_parts=8), base, part_col="cell")
        pre = _load_manifest(base)
        # tombstones confined to cells 0 and 1
        snapshot_delete(
            spark.range(0, 400).filter(F.col("id") % 8 <= 1), base
        )
        v = snapshot_compact(spark, base)
        post = _load_manifest(base, v)
        assert sorted(post["compacted_parts"]) == ["0", "1"]
        pre_untouched = {t for t in _paths(pre) if not _is_cell(t, (0, 1))}
        post_untouched = {t for t in _paths(post) if not _is_cell(t, (0, 1))}
        # untouched partitions: the SAME immutable files, not copies
        assert pre_untouched == post_untouched
        # affected partitions: all-new files in the new commit dir
        assert all(
            t[0].startswith(f"c{v:06d}")
            for t in _paths(post)
            if _is_cell(t, (0, 1))
        )
        assert snapshot_read(spark, base).count() == 300

    def test_all_rows_of_a_partition_deleted(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m9")
        snapshot_create(_frame(spark, 0, 40), base, part_col="cell")
        snapshot_delete(
            spark.range(0, 40).filter(F.col("id") % 4 == 2), base
        )
        v = snapshot_compact(spark, base)
        got = snapshot_read(spark, base)
        assert got.count() == 30
        assert got.filter(F.col("cell") == 2).count() == 0
        assert all(e["part"] != "2" for e in _load_manifest(base, v)["files"])

    def test_whole_table_deleted_stays_readable(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m10")
        snapshot_create(_frame(spark, 0, 20), base, part_col="cell")
        snapshot_delete(spark.range(0, 20), base)
        snapshot_compact(spark, base)
        got = snapshot_read(spark, base)
        assert got.count() == 0
        assert set(got.columns) == {"id", "cell", "val"}

    def test_pinned_reader_unaffected_by_concurrent_maintenance(
        self, spark, tmp_path
    ):
        """A reader that resolved its snapshot BEFORE maintenance keeps
        serving identical data afterwards — the isolation the in-place
        directory swap can't give."""
        base = _mkbase(tmp_path, "m11")
        snapshot_create(_frame(spark, 0, 200), base, part_col="cell")
        pinned = snapshot_read(spark, base, version=1)
        before = sorted(r["id"] for r in pinned.collect())
        snapshot_delete(spark.range(0, 100), base)
        snapshot_compact(spark, base)
        snapshot_append(_frame(spark, 200, 300), base)
        # re-execute the pinned plan from scratch: old files still there
        assert sorted(r["id"] for r in pinned.collect()) == before
        assert snapshot_read(spark, base).count() == 200  # 100 del + 100 new


def _is_cell(t, cells):
    return any(t[1].startswith(f"cell={c}/") for c in cells)


class TestPruning:
    def test_partition_pruning_reads_fewer_files(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m12")
        snapshot_create(_frame(spark, 0, 400, n_parts=8), base, part_col="cell")
        pruned = snapshot_read(spark, base, parts=[3, 5])
        full = snapshot_read(spark, base)
        assert pruned.count() == full.filter(F.col("cell").isin(3, 5)).count()
        assert len(pruned.inputFiles()) < len(full.inputFiles())

    def test_zone_map_pruning_exact_and_skips_files(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m13")
        # range-cluster by id so per-file min/max are disjoint
        df = (
            _frame(spark, 0, 10000)
            .repartitionByRange(16, "id")
            .sortWithinPartitions("id")
        )
        snapshot_create(df, base, stats_cols=["id"])
        got = snapshot_read(spark, base, between=("id", 1000, 1200))
        assert got.count() == 201
        assert sorted(r["id"] for r in got.collect()) == list(range(1000, 1201))
        full = snapshot_read(spark, base)
        assert len(got.inputFiles()) < len(full.inputFiles())

    def test_zone_map_keeps_files_without_stats(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m14")
        snapshot_create(_frame(spark, 0, 100), base)  # no stats recorded
        got = snapshot_read(spark, base, between=("id", 10, 20))
        assert got.count() == 11  # row-level filter still exact

    def test_morton_zorder_composition(self, spark, tmp_path):
        """Z-ORDER + zone map: cluster by the Morton interleave of two
        dimensions, record its stats, and a box predicate on EITHER
        dimension prunes files through the morton-range read."""
        from ddf_flink_spark.functions.layout import morton_key

        base = _mkbase(tmp_path, "m15")
        df = (
            spark.range(0, 4096)
            .withColumn("x", (F.col("id") % 64).cast("long"))
            .withColumn("y", (F.col("id") / 64).cast("long"))
            .withColumn("mk", morton_key("x", "y", bits=6))
            .repartitionByRange(16, "mk")
            .sortWithinPartitions("mk")
        )
        snapshot_create(df, base, stats_cols=["mk"])
        # box query x∈[0,7], y∈[0,7] → morton keys all < 2^6
        got = snapshot_read(spark, base, between=("mk", 0, 63)).filter(
            (F.col("x") < 8) & (F.col("y") < 8)
        )
        assert got.count() == 64
        full = snapshot_read(spark, base)
        assert len(got.inputFiles()) < len(full.inputFiles())


class TestConcurrencyAndGC:
    def test_version_race_loser_gets_conflict(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m16")
        snapshot_create(_frame(spark, 0, 10), base)
        parent = _load_manifest(base)
        _publish(base, _child(parent, "append"))
        with pytest.raises(SnapshotConflict):
            _publish(base, _child(parent, "append"))

    def test_aborted_commit_is_invisible_and_vacuumed(self, spark, tmp_path):
        """Crash BEFORE manifest publication: data files exist, no
        manifest references them — readers are unaffected, vacuum
        reclaims."""
        base = _mkbase(tmp_path, "m17")
        snapshot_create(_frame(spark, 0, 50), base)
        # simulate: a writer wrote its commit dir then died pre-publish
        _frame(spark, 50, 99).write.parquet(f"{base}/data/c000099_deadbeef")
        assert snapshot_read(spark, base).count() == 50
        assert snapshot_versions(base) == [1]
        # an orphan YOUNGER than the grace window is protected: it may
        # be an in-flight commit that has not linked its header yet
        res = snapshot_vacuum(base, retain_last=1)
        assert res["files_deleted"] == 0
        assert os.path.isdir(f"{base}/data/c000099_deadbeef")
        # past the grace window (grace=0) the orphan is reclaimed
        res = snapshot_vacuum(base, retain_last=1, orphan_grace_seconds=0)
        assert res["files_deleted"] > 0
        assert not os.path.isdir(f"{base}/data/c000099_deadbeef")
        assert snapshot_read(spark, base).count() == 50

    def test_vacuum_retention(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m18")
        snapshot_create(_frame(spark, 0, 100), base, part_col="cell")
        snapshot_delete(spark.range(0, 50), base)
        snapshot_compact(spark, base)
        res = snapshot_vacuum(base, retain_last=1)
        assert res["manifests_deleted"] == 2
        assert snapshot_versions(base) == [3]
        assert snapshot_read(spark, base).count() == 50
        with pytest.raises(FileNotFoundError):
            snapshot_read(spark, base, version=1)

    def test_manifest_publication_is_atomic_no_temp_left(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m19")
        snapshot_create(_frame(spark, 0, 10), base)
        snapshot_append(_frame(spark, 10, 20), base)
        leftovers = [
            f for f in os.listdir(f"{base}/manifests") if f.endswith(".tmp")
        ]
        assert leftovers == []

    def test_log_metadata_only(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m20")
        snapshot_create(_frame(spark, 0, 100), base, part_col="cell")
        snapshot_append(_frame(spark, 100, 130), base)
        snapshot_delete(spark.range(0, 10), base)
        snapshot_compact(spark, base)
        rows = {r["version"]: r for r in snapshot_log(spark, base).collect()}
        assert rows[1]["op"] == "create" and rows[1]["rows_added"] == 100
        assert rows[2]["rows_added"] == 30 and rows[2]["visible_rows"] == 130
        # outstanding tombstones → visible count deferred (NULL)
        assert rows[3]["rows_removed"] == 10 and rows[3]["visible_rows"] is None
        assert rows[4]["visible_rows"] == 120 and rows[4]["n_tombstone_files"] == 0

    def test_stats_survive_compaction(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m21")
        df = (
            _frame(spark, 0, 1000)
            .repartitionByRange(8, "id")
            .sortWithinPartitions("id")
        )
        snapshot_create(df, base, part_col="cell", stats_cols=["id"])
        snapshot_delete(spark.range(0, 100), base)
        v = snapshot_compact(spark, base)
        m = _load_manifest(base, v)
        assert any("stats" in e and "id" in e["stats"] for e in m["files"])


class TestReplaceAndChanges:
    def test_replace_partitions_carries_others_verbatim(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m22")
        snapshot_create(_frame(spark, 0, 200, n_parts=4), base, part_col="cell")
        pre = _load_manifest(base)
        from ddf_flink_spark.functions.manifest import (
            snapshot_replace_partitions,
        )

        # rewrite cells 1 and 2 with doubled vals
        replacement = (
            _frame(spark, 0, 200, n_parts=4)
            .filter(F.col("cell").isin(1, 2))
            .withColumn("val", F.col("val") * 2)
        )
        v = snapshot_replace_partitions(
            replacement, base, parts=[1, 2], op="rebalance",
            meta={"note": "doubled"},
        )
        post = _load_manifest(base, v)
        assert post["op"] == "rebalance" and post["meta"]["note"] == "doubled"
        pre_other = {t for t in _paths(pre) if not _is_cell(t, (1, 2))}
        post_other = {t for t in _paths(post) if not _is_cell(t, (1, 2))}
        assert pre_other == post_other  # untouched cells: same files
        got = snapshot_read(spark, base)
        assert got.count() == 200
        assert (
            got.filter(F.col("cell") == 1)
            .filter(F.col("val") != (F.col("id") * 3 + 1) * 2)
            .count()
            == 0
        )
        # rows outside the listed partitions in the replacement frame
        # would be filtered, and v1 still serves the original values
        old = snapshot_read(spark, base, version=1)
        assert old.filter(F.col("cell") == 1).filter(
            F.col("val") != F.col("id") * 3 + 1
        ).count() == 0

    def test_changes_insert_delete_compact_restore(self, spark, tmp_path):
        from ddf_flink_spark.functions.manifest import snapshot_changes

        base = _mkbase(tmp_path, "m23")
        snapshot_create(_frame(spark, 0, 100), base, part_col="cell")
        snapshot_append(_frame(spark, 100, 140), base)          # v2
        snapshot_delete(spark.range(0, 20), base)               # v3
        snapshot_compact(spark, base)                           # v4
        snapshot_restore(base, 2)                               # v5

        c12 = snapshot_changes(spark, base, 1, 2)
        assert c12.filter(F.col("_change") == "delete").count() == 0
        assert sorted(
            r["id"] for r in c12.filter(F.col("_change") == "insert").collect()
        ) == list(range(100, 140))

        # tombstone-only span: deletes surface from UNCHANGED files
        c23 = snapshot_changes(spark, base, 2, 3)
        assert c23.filter(F.col("_change") == "insert").count() == 0
        assert sorted(
            r["id"] for r in c23.filter(F.col("_change") == "delete").collect()
        ) == list(range(0, 20))

        # compaction: physical rewrite, zero logical change
        assert snapshot_changes(spark, base, 3, 4).count() == 0

        # restore: the deleted rows resurrect as inserts
        c45 = snapshot_changes(spark, base, 4, 5)
        assert c45.filter(F.col("_change") == "delete").count() == 0
        assert sorted(
            r["id"] for r in c45.filter(F.col("_change") == "insert").collect()
        ) == list(range(0, 20))

        # end-to-end span collapses to the net difference
        c15 = snapshot_changes(spark, base, 1, 5)
        assert c15.filter(F.col("_change") == "delete").count() == 0
        assert sorted(
            r["id"] for r in c15.filter(F.col("_change") == "insert").collect()
        ) == list(range(100, 140))


class TestOptimizeAndEvolution:
    def test_optimize_packs_small_files_with_zero_logical_change(
        self, spark, tmp_path
    ):
        from ddf_flink_spark.functions.manifest import (
            snapshot_changes,
            snapshot_optimize,
        )

        base = _mkbase(tmp_path, "m24")
        snapshot_create(_frame(spark, 0, 40), base, part_col="cell")
        for lo in (40, 80, 120):  # streaming-shaped: one small commit each
            snapshot_append(_frame(spark, lo, lo + 40), base)
        pre = _load_manifest(base)
        pre_counts = {}
        for e in pre["files"]:
            pre_counts[e["part"]] = pre_counts.get(e["part"], 0) + 1
        assert all(n >= 4 for n in pre_counts.values())
        v = snapshot_optimize(spark, base)
        post = _load_manifest(base, v)
        post_counts = {}
        for e in post["files"]:
            post_counts[e["part"]] = post_counts.get(e["part"], 0) + 1
        assert all(n == 1 for n in post_counts.values())
        assert snapshot_read(spark, base).count() == 160
        # physical rewrite, zero logical change
        assert snapshot_changes(spark, base, v - 1, v).count() == 0
        # idempotent: nothing qualifies now
        assert snapshot_optimize(spark, base) == v

    def test_optimize_scoped_to_parts_carries_others_verbatim(
        self, spark, tmp_path
    ):
        from ddf_flink_spark.functions.manifest import snapshot_optimize

        base = _mkbase(tmp_path, "m25")
        snapshot_create(_frame(spark, 0, 40), base, part_col="cell")
        snapshot_append(_frame(spark, 40, 80), base)
        pre = _load_manifest(base)
        v = snapshot_optimize(spark, base, parts=[0])
        post = _load_manifest(base, v)
        pre_other = {t for t in _paths(pre) if not _is_cell(t, (0,))}
        post_other = {t for t in _paths(post) if not _is_cell(t, (0,))}
        assert pre_other == post_other
        assert sum(1 for e in post["files"] if e["part"] == "0") == 1

    def test_schema_evolution_add_column(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m26")
        snapshot_create(_frame(spark, 0, 50), base, part_col="cell")
        batch = _frame(spark, 50, 70).withColumn(
            "extra", (F.col("id") * 10).cast("long")
        )
        with pytest.raises(ValueError, match="merge_schema"):
            snapshot_append(batch, base)
        snapshot_append(batch, base, merge_schema=True)
        got = snapshot_read(spark, base)
        assert got.columns == ["id", "cell", "val", "extra"]
        assert got.filter(F.col("extra").isNull()).count() == 50
        assert got.filter(F.col("extra") == F.col("id") * 10).count() == 20
        # time travel reads the OLD schema
        assert "extra" not in snapshot_read(spark, base, version=1).columns

    def test_schema_type_change_rejected(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m27")
        snapshot_create(_frame(spark, 0, 10), base)
        bad = _frame(spark, 10, 20).withColumn("val", F.col("val").cast("string"))
        with pytest.raises(ValueError, match="type changes"):
            snapshot_append(bad, base, merge_schema=True)

    def test_missing_columns_in_append_read_as_null(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m28")
        snapshot_create(_frame(spark, 0, 10), base)
        snapshot_append(spark.range(10, 15).select("id"), base)
        got = snapshot_read(spark, base)
        assert got.count() == 15
        assert got.filter(F.col("val").isNull()).count() == 5


class TestBloomPointLookup:
    def _store(self, spark, tmp_path, name):
        base = _mkbase(tmp_path, name)
        # val is a scrambled high-cardinality column: every file's
        # [min,max] spans ~the whole domain, so min/max stats alone
        # cannot prune a point lookup — the Bloom has to
        df = (
            spark.range(0, 5000)
            .withColumn("val", (F.col("id") * 2654435761 % 100003).cast("long"))
            .repartition(16)
        )
        snapshot_create(df, base, stats_cols=["val"], bloom_cols=["val"])
        return base

    def test_point_lookup_exact_and_prunes(self, spark, tmp_path):
        base = self._store(spark, tmp_path, "m29")
        probe = (4242 * 2654435761) % 100003
        got = snapshot_read(spark, base, point=("val", probe))
        rows = got.collect()
        assert [r["id"] for r in rows] == [4242]
        full = snapshot_read(spark, base)
        # the Bloom prunes most of the 16 files; min/max could not
        assert len(got.inputFiles()) < len(full.inputFiles()) / 2

    def test_absent_value_reads_nothing(self, spark, tmp_path):
        base = self._store(spark, tmp_path, "m30")
        got = snapshot_read(spark, base, point=("val", 100002))
        assert got.count() == 0

    def test_bloom_survives_append_and_compact(self, spark, tmp_path):
        from ddf_flink_spark.functions.manifest import _load_manifest as lm

        base = self._store(spark, tmp_path, "m31")
        snapshot_append(
            spark.range(5000, 6000)
            .withColumn("val", (F.col("id") * 2654435761 % 100003).cast("long"))
            .repartition(4),
            base,
        )
        m = lm(base)
        assert all("bloom" in e and "val" in e["bloom"] for e in m["files"])
        probe = (5500 * 2654435761) % 100003
        got = snapshot_read(spark, base, point=("val", probe))
        assert [r["id"] for r in got.collect()] == [5500]

    def test_bloomless_files_conservatively_kept(self, spark, tmp_path):
        base = _mkbase(tmp_path, "m32")
        snapshot_create(spark.range(0, 100).withColumn("val", F.col("id") * 7), base)
        got = snapshot_read(spark, base, point=("val", 77))
        assert [r["id"] for r in got.collect()] == [11]


class TestUpsertAndTombstoneScope:
    def test_upsert_updates_and_inserts_atomically(self, spark, tmp_path):
        from ddf_flink_spark.functions.manifest import snapshot_upsert

        base = _mkbase(tmp_path, "m33")
        snapshot_create(_frame(spark, 0, 100), base, part_col="cell")
        # update ids 90..99 (val -> id*1000), insert ids 100..109
        batch = (
            spark.range(90, 110)
            .withColumn("cell", (F.col("id") % 4).cast("int"))
            .withColumn("val", (F.col("id") * 1000).cast("long"))
        )
        v = snapshot_upsert(batch, base, batch_tag="u1")
        assert v == 2
        got = snapshot_read(spark, base)
        assert got.count() == 110  # 100 - 10 replaced + 20 batch
        assert got.filter((F.col("id") == 95) & (F.col("val") == 95000)).count() == 1
        assert got.filter((F.col("id") == 95) & (F.col("val") != 95000)).count() == 0
        assert got.filter(F.col("id") == 105).count() == 1
        # replay is a no-op
        assert snapshot_upsert(batch, base, batch_tag="u1") == 2
        assert snapshot_read(spark, base).count() == 110
        # time travel: pre-upsert values intact
        old = snapshot_read(spark, base, version=1)
        assert old.filter((F.col("id") == 95) & (F.col("val") == 95 * 3 + 1)).count() == 1

    def test_upsert_then_compact_folds_cleanly(self, spark, tmp_path):
        from ddf_flink_spark.functions.manifest import snapshot_upsert

        base = _mkbase(tmp_path, "m34")
        snapshot_create(_frame(spark, 0, 50), base, part_col="cell")
        batch = (
            spark.range(0, 10)
            .withColumn("cell", (F.col("id") % 4).cast("int"))
            .withColumn("val", F.lit(-1).cast("long"))
        )
        snapshot_upsert(batch, base)
        v = snapshot_compact(spark, base)
        got = snapshot_read(spark, base)
        assert got.count() == 50
        assert got.filter(F.col("val") == -1).count() == 10
        assert _load_manifest(base, v)["tombstones"] == []

    def test_delete_does_not_erase_later_append_of_same_id(self, spark, tmp_path):
        """A tombstone is scoped to the commits it was issued against:
        deleting id 7 then APPENDING a new row with id 7 must serve the
        new row (the unscoped anti-join got this wrong)."""
        base = _mkbase(tmp_path, "m35")
        snapshot_create(_frame(spark, 0, 20), base, part_col="cell")
        snapshot_delete(spark.range(7, 8), base)
        assert snapshot_read(spark, base).count() == 19
        reborn = (
            spark.range(7, 8)
            .withColumn("cell", (F.col("id") % 4).cast("int"))
            .withColumn("val", F.lit(777).cast("long"))
        )
        snapshot_append(reborn, base)
        got = snapshot_read(spark, base).filter(F.col("id") == 7).collect()
        assert len(got) == 1 and got[0]["val"] == 777
        # and compaction preserves the reborn row
        snapshot_compact(spark, base)
        got = snapshot_read(spark, base).filter(F.col("id") == 7).collect()
        assert len(got) == 1 and got[0]["val"] == 777

    def test_changes_across_upsert(self, spark, tmp_path):
        from ddf_flink_spark.functions.manifest import (
            snapshot_changes,
            snapshot_upsert,
        )

        base = _mkbase(tmp_path, "m36")
        snapshot_create(_frame(spark, 0, 30), base, part_col="cell")
        batch = (
            spark.range(25, 35)
            .withColumn("cell", (F.col("id") % 4).cast("int"))
            .withColumn("val", (F.col("id") * 1000).cast("long"))
        )
        snapshot_upsert(batch, base)
        c = snapshot_changes(spark, base, 1, 2)
        ins = {r["id"] for r in c.filter(F.col("_change") == "insert").collect()}
        dels = {r["id"] for r in c.filter(F.col("_change") == "delete").collect()}
        assert ins == set(range(25, 35))   # new current versions
        assert dels == set(range(25, 30))  # replaced old versions


class TestPlans:
    def test_tombstone_anti_join_broadcasts(self, spark, tmp_path):
        """The merge-on-read anti-join's build side is the (small)
        tombstone set — at runtime AQE must pick a broadcast join, not
        shuffle the data side (the posture that keeps deletes free at
        100 TB read time)."""
        base = _mkbase(tmp_path, "m37")
        snapshot_create(_frame(spark, 0, 2000), base, part_col="cell")
        snapshot_delete(spark.range(0, 50), base)
        df = snapshot_read(spark, base)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "SortMergeJoin" not in plan

    def test_snapshot_scan_column_pruning(self, spark, tmp_path):
        """A projection over a snapshot read must prune at the parquet
        scan (ReadSchema), exactly like a direct table read — the
        manifest layer adds no materialization barrier."""
        base = _mkbase(tmp_path, "m38")
        snapshot_create(_frame(spark, 0, 100), base, part_col="cell")
        df = snapshot_read(spark, base).select("id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "val" not in read_schema

    def test_optimize_max_records_per_file_bin_packs(self, spark, tmp_path):
        """A hot partition must bin-pack into several right-sized files,
        not serialize into one giant one."""
        from ddf_flink_spark.functions.manifest import snapshot_optimize

        base = _mkbase(tmp_path, "m39")
        snapshot_create(_frame(spark, 0, 400, n_parts=2), base, part_col="cell")
        snapshot_append(_frame(spark, 400, 800, n_parts=2), base)
        v = snapshot_optimize(spark, base, max_records_per_file=100)
        post = _load_manifest(base, v)
        counts = {}
        for e in post["files"]:
            counts[e["part"]] = counts.get(e["part"], 0) + 1
        # 400 rows/partition at <=100 rows/file -> >= 4 files each
        assert all(n >= 4 for n in counts.values())
        assert all(e["rows"] <= 100 for e in post["files"])
        assert snapshot_read(spark, base).count() == 800
        # the session conf does not leak
        assert not spark.conf.get("spark.sql.files.maxRecordsPerFile", None)

    def test_changes_across_schema_evolution(self, spark, tmp_path):
        """The change feed spans an add-column boundary: deltas come
        back in the TARGET version's schema with NULL for columns the
        old files never had."""
        from ddf_flink_spark.functions.manifest import snapshot_changes

        base = _mkbase(tmp_path, "m40")
        snapshot_create(_frame(spark, 0, 20), base, part_col="cell")
        evolved = _frame(spark, 20, 30).withColumn(
            "extra", (F.col("id") + 5).cast("long")
        )
        snapshot_append(evolved, base, merge_schema=True)
        c = snapshot_changes(spark, base, 1, 2)
        assert "extra" in c.columns
        ins = c.filter(F.col("_change") == "insert").collect()
        assert sorted(r["id"] for r in ins) == list(range(20, 30))
        assert all(r["extra"] == r["id"] + 5 for r in ins)
        assert c.filter(F.col("_change") == "delete").count() == 0
        # and a delete AFTER evolution diffs old-file rows as v_to rows
        snapshot_delete(spark.range(0, 5), base)
        c23 = snapshot_changes(spark, base, 2, 3)
        dels = c23.filter(F.col("_change") == "delete").collect()
        assert sorted(r["id"] for r in dels) == list(range(0, 5))
        assert all(r["extra"] is None for r in dels)

    def test_optimize_does_not_resurrect_tombstoned_rows(self, spark, tmp_path):
        """Rewritten rows land in a NEW commit, outside old tombstones'
        applies_before scope — optimize must fold the deletes for the
        partitions it touches, or deleted rows come back."""
        from ddf_flink_spark.functions.manifest import snapshot_optimize

        base = _mkbase(tmp_path, "m41")
        snapshot_create(_frame(spark, 0, 40), base, part_col="cell")
        snapshot_append(_frame(spark, 40, 80), base)
        snapshot_delete(spark.range(0, 20), base)
        assert snapshot_read(spark, base).count() == 60
        snapshot_optimize(spark, base)
        got = snapshot_read(spark, base)
        assert got.count() == 60
        assert got.filter(F.col("id") < 20).count() == 0
        # pre-delete time travel still serves everything
        assert snapshot_read(spark, base, version=2).count() == 80
        # and compaction afterwards stays clean
        snapshot_compact(spark, base)
        assert snapshot_read(spark, base).count() == 60

    def test_string_columns_get_no_zone_map(self, spark, tmp_path):
        """String min/max can be writer-truncated — the manifest must
        not record them (blooms are the string path)."""
        base = _mkbase(tmp_path, "m42")
        df = spark.range(0, 100).withColumn(
            "s", F.concat(F.lit("k"), F.col("id"))
        )
        snapshot_create(df, base, stats_cols=["s", "id"])
        m = _load_manifest(base)
        assert all("s" not in e.get("stats", {}) for e in m["files"])
        assert any("id" in e.get("stats", {}) for e in m["files"])

    def test_racing_writers_never_share_a_data_dir(self, spark, tmp_path):
        """Version-name data dirs let the publish-race LOSER clobber
        the winner's files before the manifest link decides; attempt-
        unique dirs make the loser's files harmless orphans."""
        from ddf_flink_spark.functions.manifest import _next_commit_dir

        base = _mkbase(tmp_path, "m43")
        assert _next_commit_dir(base, 3) != _next_commit_dir(base, 3)
