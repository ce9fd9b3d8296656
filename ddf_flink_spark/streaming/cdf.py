"""Change-feed STREAMING source for the snapshot store: consume
``snapshot_changes`` as ordered per-version micro-batches behind a
durable version cursor — the composition Delta Lake exposes as
``readStream`` + Change Data Feed, reduced to its load-bearing core.

``functions/manifest.snapshot_changes`` is batch-only: the incremental
consumers it was built for (derived-index refresh, incremental view
maintenance q292, training-shard re-packing) had to poll versions by
hand and invent their own cursor persistence. This module closes that
produce→consume loop:

* **One micro-batch per snapshot version.** Each delivery is exactly
  ``snapshot_changes(v-1, v)`` — the row-level delta of ONE commit,
  with the ``_change`` ('insert' | 'delete') column. Metadata-only
  commits (optimize, rewrite_manifests, manifest compaction) deliver
  an EMPTY batch by the feed's own construction: physical rewrites are
  invisible to consumers.
* **Durable cursor, atomic advance.** The consumer directory holds one
  ``cursor.json`` written via temp-file + ``os.rename`` AFTER the
  handler returns, so delivery is at-least-once per version with the
  version number as the replay key: a crash between the handler and
  the cursor write redelivers that version. End-to-end exactly-once is
  the standard idempotent-sink discipline — hand the version to
  ``snapshot_append/upsert(..., txn=("<consumer>", version))`` (or any
  idempotent sink) and a redelivery is a no-op. This is Structured
  Streaming's own batch-id contract, applied to table versions.
* **Composable with Structured Streaming.** ``process_available`` is
  driver-side and cheap (header reads to find new versions; Spark jobs
  only for versions that exist), so a ``foreachBatch`` ingest can pump
  its OWN downstream consumers in the same trigger, or a scheduled
  ticker can poll — the same shapes q271/q294 use for maintenance.

At 100 TB: finding new versions is O(1) header listing; each delivered
delta is bounded by the files that actually differ in that one commit
(the segment-level diff inside ``snapshot_changes``), so a consumer
that keeps up does O(commit-touched-files) work per trigger regardless
of table size. Retention contract (same as Delta CDF): vacuum must
retain versions at least as old as the slowest consumer's cursor —
``snapshot_vacuum(retain_hours=...)`` against a lag SLO; a consumer
whose cursor fell behind retention gets ``FileNotFoundError`` and must
re-seed from a full snapshot read.

Reference: the reference engine has no persistence lifecycle at all
(``utils/package.scala:418-427``); parity target is Delta/Iceberg
change-feed streaming.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SnapshotChangeStream"]


class SnapshotChangeStream:
    """A durable-cursor consumer of one snapshot store's change feed.

    ``start_version=N`` declares "my state already incorporates the
    table as of version N" — the natural seed is
    ``snapshot_read(spark, base, version=N)`` — and deliveries begin
    with the delta N→N+1. Default: the latest version at attach time
    (changes from now on). The cursor persists in ``consumer_dir``;
    reattaching with the same directory resumes where the last run
    left off and ``start_version`` is ignored."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        consumer_dir: str,
        start_version: "int | None" = None,
    ):
        from ..functions.manifest import snapshot_versions

        self.spark = spark
        self.base = base
        os.makedirs(consumer_dir, exist_ok=True)
        self._cursor_path = os.path.join(consumer_dir, "cursor.json")
        if not os.path.exists(self._cursor_path):
            if start_version is None:
                versions = snapshot_versions(base)
                if not versions:
                    raise FileNotFoundError(f"no snapshots at {base}")
                start_version = versions[-1]
            self._write_cursor(int(start_version))

    def cursor(self) -> int:
        """The last version this consumer has fully processed."""
        with open(self._cursor_path) as fh:
            return int(json.load(fh)["version"])

    def _write_cursor(self, version: int) -> None:
        # atomic: a crash mid-write can never corrupt the cursor (the
        # old value survives and the version is simply redelivered)
        d = os.path.dirname(self._cursor_path)
        tmp = os.path.join(d, f".cursor.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": int(version)}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._cursor_path)

    def pending(self) -> "list[int]":
        """Versions committed upstream and not yet processed here —
        header listing only, no data touched."""
        from ..functions.manifest import snapshot_versions

        cur = self.cursor()
        return [v for v in snapshot_versions(self.base) if v > cur]

    def process_available(self, fn) -> int:
        """Deliver ``fn(delta_df, version)`` once per unprocessed
        version, IN ORDER, advancing the durable cursor after each
        handler returns (at-least-once per version; see module
        docstring for the exactly-once discipline). ``delta_df`` is
        ``snapshot_changes(version - 1, version)`` — empty for
        metadata-only commits. Returns the number of versions
        delivered. Mirrors ``Trigger.AvailableNow``: processes what
        exists, then returns."""
        from ..functions.manifest import snapshot_changes

        delivered = 0
        for v in self.pending():
            delta = snapshot_changes(self.spark, self.base, v - 1, v)
            fn(delta, v)
            self._write_cursor(v)
            delivered += 1
        return delivered

    def read_pending(self) -> "DataFrame | None":
        """All unprocessed deltas COALESCED into one frame via
        ``snapshot_changes(cursor, latest)`` (cross-version
        insert/delete pairs cancel — cheaper than per-version replay
        for a consumer that only needs the net effect), tagged with
        ``_commit_version = latest``. Does NOT advance the cursor;
        call ``commit(latest)`` after the downstream write lands.
        Returns None when the consumer is caught up."""
        from pyspark.sql import functions as F

        from ..functions.manifest import snapshot_changes

        pend = self.pending()
        if not pend:
            return None
        cur, latest = self.cursor(), pend[-1]
        return snapshot_changes(self.spark, self.base, cur, latest).withColumn(
            "_commit_version", F.lit(latest).cast("long")
        )

    def commit(self, version: int) -> None:
        """Advance the cursor to ``version`` (for the
        :meth:`read_pending` two-step; ``process_available`` advances
        itself). Rejects a version beyond the table's latest commit —
        a caller typo (``commit(latest + 10)``) would otherwise
        silently skip every delivery up to the phantom version."""
        from ..functions.manifest import snapshot_versions

        if int(version) < self.cursor():
            raise ValueError(
                f"cursor moves forward only (at {self.cursor()}, "
                f"got {version})"
            )
        versions = snapshot_versions(self.base)
        if versions and int(version) > versions[-1]:
            raise ValueError(
                f"cannot commit v{version}: the table's latest commit "
                f"is v{versions[-1]} — committing past it would "
                "silently skip future deliveries"
            )
        self._write_cursor(int(version))
