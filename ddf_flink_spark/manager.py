"""DDFManager: session owner + name→DDF catalog + SQL entry point.

Reference: ``FlinkDDFManager`` creates the execution environment, loads
files with sample-based inference, and registers DDFs by generated name
(``flink/src/main/scala/io/ddf/flink/FlinkDDFManager.scala:21-109``); the
SQL entry dispatches CREATE/LOAD/SELECT (``etl/SqlHandler.scala:29-104``).

Spark build: the catalog is the session's temp-view namespace plus a
python-side dict for wrapper metadata; SELECT goes straight to
``spark.sql`` (Catalyst = the optimizer the reference never had).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .ddf import DDF
from .session import get_spark
from .sources.csv import load_declared, load_file
from .sql.preparser import CreateTable, Load, parse_statement

__all__ = ["DDFManager"]


class DDFManager:
    """Owns a SparkSession and a name→DDF catalog."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self.catalog: dict[str, DDF] = {}
        self._declared: dict[str, list[tuple[str, str]]] = {}

    # ---------------------------------------------------------------- create
    def new_ddf(self, df: DataFrame, name: str | None = None) -> DDF:
        return DDF(self, df, name=name)

    def get_ddf(self, name: str) -> DDF:
        """``getDDFByName`` (``FlinkDDFManager``/core catalog)."""
        return self.catalog[name]

    def set_ddf_name(self, ddf: DDF, name: str) -> DDF:
        """``setDDFName`` (core manager; used e.g.
        ``content/ViewHandlerSpec.scala:46``): re-register the DDF under a
        new catalog name + temp view. Refuses to clobber a different DDF
        already registered under ``name``; temp views are case-insensitive,
        so a case-only rename must not drop the view it just created."""
        existing = self.catalog.get(name)
        if existing is not None and existing is not ddf:
            raise ValueError(f"a different DDF is already registered as {name!r}")
        old = ddf.name
        ddf.name = name
        ddf._register()
        if old.lower() != name.lower():
            self.catalog.pop(old, None)
            self.spark.catalog.dropTempView(old)
        elif old != name:
            self.catalog.pop(old, None)  # same view, different catalog key
        return ddf

    # ----------------------------------------------------------------- loads
    def load_file(self, path: str, delimiter: str = ",", name: str | None = None) -> DDF:
        """``loadFile(fileURL, fieldSeparator)`` (``FlinkDDFManager.scala:30-59``):
        5-row sample inference, ``V1..Vn`` names."""
        return self.new_ddf(load_file(self.spark, path, delimiter), name=name)

    def load_parquet(self, path: str, name: str | None = None) -> DDF:
        """Parquet source — the scale-path format (columnar, predicate
        pushdown, partition pruning); not in the reference (CSV-only)."""
        return self.new_ddf(self.spark.read.parquet(path), name=name)

    def load_table(self, sf_dir: str, table: str) -> DDF:
        """Convenience: load one of the driver's testdata tables."""
        return self.load_parquet(f"{sf_dir.rstrip('/')}/{table}.parquet", name=table)

    def load_json(self, path: str, name: str | None = None, multiline: bool = False) -> DDF:
        """JSON source (the reference ships JSON samples under
        ``resources/test/`` but never wired a reader); full-scan schema
        inference via Spark's native JSON datasource."""
        reader = self.spark.read
        if multiline:
            reader = reader.option("multiLine", "true")
        return self.new_ddf(reader.json(path), name=name)

    # ------------------------------------------------------------------- sql
    def sql2ddf(self, command: str) -> DDF:
        """CREATE / LOAD / SELECT dispatcher (``SqlHandler.scala:29-104``,
        parser ``SqlSupport.scala:353-368``)."""
        stmt = parse_statement(command)
        if isinstance(stmt, CreateTable):
            self._declared[stmt.table] = stmt.columns
            schema = ", ".join(f"{n} {t}" for n, t in stmt.columns)
            empty = self.spark.createDataFrame([], schema=schema)
            return self.new_ddf(empty, name=stmt.table)
        if isinstance(stmt, Load):
            if stmt.table not in self._declared:
                raise KeyError(f"LOAD into undeclared table {stmt.table!r}; CREATE TABLE first")
            df = load_declared(
                self.spark,
                stmt.url,
                self._declared[stmt.table],
                delimiter=stmt.delimiter,
                null_value=stmt.null_value,
                empty_value=stmt.empty_value,
                use_defaults=stmt.use_defaults,
            )
            return self.new_ddf(df, name=stmt.table)
        return self.new_ddf(self.spark.sql(stmt))

    def sql(self, command: str, limit: int = 1000) -> tuple[list[str], list[str]]:
        """Interactive entry returning tab-joined strings, capped at
        DEFAULT_LIMIT=1000 like the reference (``SqlHandler.scala:217-255``)."""
        ddf = self.sql2ddf(command)
        res = ddf.df.limit(limit)
        rows = ["\t".join("null" if v is None else str(v) for v in row) for row in res.collect()]
        return res.columns, rows

    def release_storage(self, only_tracked: bool = False) -> int:
        """Free executor-storage blocks pinned by checkpointing/
        caching operators (k-fold caches, connected-components /
        PageRank / k-means / PCA / prefix-filter checkpoints). Call at
        batch boundaries in long-lived sessions; frames built BEFORE
        the release must not be re-executed afterwards (their truncated
        lineage cannot recompute). ``only_tracked=True`` releases only
        the blocks this library's operators created (the session
        ledger), leaving the user's own ``cache()``/``persist()``
        frames intact — but it still invalidates LIVE library frames
        built before the call, not just dropped ones (the ledger can't
        tell them apart): the boundary discipline is identical to
        ``only_tracked=False``, only the block scope differs. Returns
        the number of released RDDs.
        See ``ddf_flink_spark/storage.py``."""
        from .storage import release_all_storage, release_session_storage

        if only_tracked:
            return release_session_storage(self.spark)
        return release_all_storage(self.spark)

    # ------------------------------------------------------------ snapshots
    def snapshot_table(
        self,
        base: str,
        version: "int | None" = None,
        parts: "list | None" = None,
        between: "tuple | None" = None,
        point: "tuple | None" = None,
        name: "str | None" = None,
        as_of_ts=None,
    ) -> DDF:
        """Read one version of a snapshot-versioned table
        (functions/manifest.py) as a DDF — latest by default,
        ``version=N`` for time travel, ``as_of_ts=<datetime | epoch
        seconds>`` for AS-OF-timestamp time travel (newest commit at
        or before that wall-clock; a NAIVE datetime is interpreted as
        UTC — commit timestamps are recorded in UTC, so pass a
        tz-aware datetime or epoch seconds to be explicit, NOT a bare
        ``datetime.now()`` local wall-clock on a non-UTC machine);
        ``parts``/``between``/``point``
        prune files at the manifest (partition values / zone-map stats
        / per-file Bloom filters) before Spark sees a path. Commit with
        :meth:`DDF.snapshot_create` / :meth:`DDF.snapshot_append`."""
        from .functions.manifest import snapshot_read

        return self.new_ddf(
            snapshot_read(self.spark, base, version=version, parts=parts,
                          between=between, point=point, as_of_ts=as_of_ts),
            name,
        )

    def snapshot_history(self, base: str) -> DDF:
        """The snapshot log (version, op, rows added/removed, visible
        rows) as a DDF — answered from manifest metadata alone."""
        from .functions.manifest import snapshot_log

        return self.new_ddf(snapshot_log(self.spark, base))

    def snapshot_delete(
        self,
        base: str,
        ids: "DDF | DataFrame",
        retries: int = 0,
        isolation: str = "lww",
    ) -> int:
        """Merge-on-read delete: tombstone ``ids`` (O(|ids|), no data
        rewrite); reads anti-join until :meth:`snapshot_compact`.
        ``retries`` rebase a lost publish race (tombstones written
        once; header-only retry). Rebase contract: with the default
        ``isolation='lww'`` a retried delete is LAST-WRITER-WINS — its
        tombstones' scope moves past commits published during the
        race, so matching ids a concurrent writer just appended are
        deleted too (CDC-apply semantics); ``isolation='strict'``
        aborts the rebase when a raced commit could touch this
        delete's ids (metadata-bounded stats/Bloom check);
        ``retries=0`` aborts on ANY race."""
        from .functions.manifest import snapshot_delete as _delete

        return _delete(
            ids.df if isinstance(ids, DDF) else ids, base, retries=retries,
            isolation=isolation,
        )

    def snapshot_delete_where(
        self,
        base: str,
        where: "str | None" = None,
        between: "tuple | None" = None,
        point: "tuple | None" = None,
        retries: int = 0,
        isolation: str = "lww",
        batch_tag: "str | None" = None,
        txn: "tuple | None" = None,
    ) -> int:
        """DELETE WHERE (registry q302) — the retention job's call:
        resolve the matching ids via a MANIFEST-PRUNED scan
        (``between=(col, lo, hi)`` / ``point=(col, v)`` ride the
        zone-map/Bloom file admission, so an age-based delete on a
        ts-clustered table scans O(matching files), not O(table);
        ``where="<sql>"`` adds an arbitrary row predicate on top),
        then tombstone them through the ordinary merge-on-read delete.
        A no-match call returns the current version WITHOUT burning a
        commit. ``batch_tag``/``txn`` make a scheduled fire
        replay-idempotent."""
        from .functions.manifest import snapshot_delete_where as _dw

        return _dw(
            self.spark, base, where=where, between=between, point=point,
            retries=retries, isolation=isolation, batch_tag=batch_tag,
            txn=txn,
        )

    def snapshot_rename_column(self, base: str, old: str, new: str) -> int:
        """RENAME a column header-only (registry q304): no data file is
        touched — readers reverse-map each file's physical column name
        from its commit version, old snapshots time-travel with their
        old names, and zone-map/Bloom pruning keeps working across the
        boundary. Renaming the id or a partition column is rejected
        (that is a rewrite), as is renaming onto a dropped or
        previously-renamed-away name (old files still carry that
        physical column — stale values would resurrect)."""
        from .functions.manifest import snapshot_rename_column as _rn

        return _rn(base, old, new)

    def snapshot_drop_column(self, base: str, col: str) -> int:
        """DROP a column header-only (registry q304): the schema
        shrinks, readers stop selecting it (column pruning — the
        dropped pages are never read), time travel still serves it,
        and re-adding the name is rejected so old files' stale values
        can never resurrect. Dropping the id or a partition column is
        rejected."""
        from .functions.manifest import snapshot_drop_column as _dc

        return _dc(base, col)

    def snapshot_compact(self, base: str) -> int:
        """Fold tombstones in, rewriting only affected partitions as a
        new version; prior snapshots stay readable until vacuum."""
        from .functions.manifest import snapshot_compact as _compact

        return _compact(self.spark, base)

    def snapshot_restore(self, base: str, version: int) -> int:
        """Roll back by rolling forward to a new version that copies
        ``version``'s file listing."""
        from .functions.manifest import snapshot_restore as _restore

        return _restore(base, version)

    def snapshot_changes(self, base: str, v_from: int, v_to: int) -> DDF:
        """Row-level change feed between two snapshot versions
        (``_change`` ∈ {'insert','delete'}) — the incremental-consumer
        read path; scan bounded by the files that differ."""
        from .functions.manifest import snapshot_changes as _changes

        return self.new_ddf(_changes(self.spark, base, v_from, v_to))

    def snapshot_rewrite_manifests(self, base: str) -> int:
        """Fold the snapshot's accumulated segment refs into fresh
        consolidated segments (metadata only — no data file touched;
        empty change feed by construction). Bounds header width after
        long streaming-ingest histories."""
        from .functions.manifest import snapshot_rewrite_manifests as _rw

        return _rw(base)

    def snapshot_change_stream(
        self,
        base: str,
        consumer_dir: str,
        start_version: "int | None" = None,
    ):
        """The snapshot table's change feed as a STREAMING source
        (streaming/cdf.py; registry q298): a durable-cursor consumer
        delivering one micro-batch per new version via
        ``process_available(fn)`` — at-least-once per version, with
        the version number as the replay key for idempotent sinks
        (``txn=(app, version)``). ``start_version=N`` means the
        consumer's state already incorporates version N (seed with
        :meth:`snapshot_table`); default is the latest at attach."""
        from .streaming.cdf import SnapshotChangeStream

        return SnapshotChangeStream(
            self.spark, base, consumer_dir, start_version=start_version
        )

    def snapshot_vacuum(
        self,
        base: str,
        retain_last: int = 1,
        orphan_grace_seconds: "float | None" = 7 * 24 * 3600.0,
        retain_hours: "float | None" = None,
    ) -> "dict[str, int]":
        """Delete files unreferenced by the retention set — the newest
        ``retain_last`` manifests plus, with ``retain_hours=``, every
        version committed within that window (the age-based "keep 7
        days" policy). The only destructive operation in the store.
        The deletion set derives from manifest diffs; orphans of
        aborted commits are swept only once their commit directory has
        been quiet for ``orphan_grace_seconds`` (default 7 days, Delta
        parity; pass None to skip the orphan walk entirely)."""
        from .functions.manifest import snapshot_vacuum as _vacuum

        return _vacuum(
            base,
            retain_last=retain_last,
            orphan_grace_seconds=orphan_grace_seconds,
            retain_hours=retain_hours,
        )

    def shutdown(self) -> None:
        self.spark.stop()
