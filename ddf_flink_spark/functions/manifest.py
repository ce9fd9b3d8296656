"""Snapshot-versioned table store: atomic manifest commits, time
travel, merge-on-read deletes, partition-pruned compaction, GC.

The on-disk lifecycle ops (functions/index_store) mutate partition
directories in place — crash-safe locally via a two-rename swap, but a
reader that lists directories DURING a swap can still observe a
partition mid-flight, there is no history, and object-store directory
listings are the scalability anti-pattern every table format exists to
kill. This module is the architecture-level answer, the same shape as
Iceberg/Delta's metadata layer (Armbrust et al., VLDB 2020, "Delta
Lake: High-Performance ACID Table Storage over Cloud Object Stores")
reduced to its load-bearing core:

* **Immutable data files** — every commit writes a fresh
  ``data/c{N}/`` directory; nothing under ``data/`` is ever modified
  or renamed afterwards (vacuum deletes, never rewrites).
* **Atomic manifest commit** — a snapshot is ONE JSON file
  ``manifests/v{N}.json`` holding the COMPLETE file listing (plus
  per-file row counts and min/max column stats read from the parquet
  footers). Publication is ``os.link(tmp, final)``, which atomically
  fails if the version already exists — optimistic concurrency: the
  loser of a race gets :class:`SnapshotConflict`, never a corrupt
  table. A crash at ANY point before the link leaves the store
  exactly at its previous version (orphaned data files are reclaimed
  by vacuum); there is no crash window in which a reader can observe
  a partial commit.
* **Readers pin a snapshot** — :func:`snapshot_read` resolves one
  manifest and reads exactly its files; a concurrent compaction or
  append is invisible (old files are retained until vacuum), so
  maintenance never races serving. Time travel is reading an older
  version number.
* **Merge-on-read deletes** — :func:`snapshot_delete` commits
  tombstone files (O(|ids|), no data rewrite); reads anti-join them.
  :func:`snapshot_compact` folds tombstones by rewriting ONLY the
  partitions that contain tombstoned rows (file entries of untouched
  partitions are carried into the new manifest verbatim — same paths,
  byte-identical by construction).
* **Manifest-level pruning** — the reader never lists a directory:
  partition pruning (``parts=[...]``) and min/max stat pruning
  (``between=("col", lo, hi)``) select file entries from the manifest
  before Spark sees a path. Composed with a Morton-key layout
  (functions/layout.py) this is Z-ORDER + zone-map data skipping:
  cluster by the interleaved key at write time, prune files by the
  key range at read time, on BOTH dimensions at once.

At 100 TB: commits are O(files-touched) metadata + one atomic rename;
reads are O(manifest) planning with zero listing round-trips; deletes
are O(|ids|); compaction rewrites only affected partitions; GC is an
explicit, versioned retention decision. The reference has no
persistence lifecycle at all (its sink is a fire-and-forget TextOutput,
``utils/package.scala:418-427``); this is a pure capability extension
for the retained-corpus posture.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "SnapshotConflict",
    "snapshot_create",
    "snapshot_append",
    "snapshot_delete",
    "snapshot_compact",
    "snapshot_restore",
    "snapshot_vacuum",
    "snapshot_read",
    "snapshot_log",
    "snapshot_versions",
    "snapshot_replace_partitions",
    "snapshot_changes",
    "snapshot_optimize",
    "snapshot_upsert",
]


class SnapshotConflict(RuntimeError):
    """Another writer published this version first (optimistic
    concurrency): retry against the new latest."""


# ---------------------------------------------------------------- I/O


def _manifest_dir(base: str) -> str:
    return os.path.join(base, "manifests")


def _data_dir(base: str) -> str:
    return os.path.join(base, "data")


def _manifest_path(base: str, version: int) -> str:
    return os.path.join(_manifest_dir(base), f"v{version:06d}.json")


def snapshot_versions(base: str) -> "list[int]":
    """All published snapshot versions, ascending."""
    mdir = _manifest_dir(base)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _load_manifest(base: str, version: "int | None" = None) -> dict:
    versions = snapshot_versions(base)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {base}")
    v = max(versions) if version is None else int(version)
    if v not in versions:
        raise FileNotFoundError(
            f"snapshot v{v} not found at {base} (have {versions}) — "
            "it may have been vacuumed"
        )
    with open(_manifest_path(base, v)) as fh:
        return json.load(fh)


def _publish(base: str, manifest: dict) -> int:
    """Atomically publish ``manifest`` as its version. The manifest is
    fully written and fsynced to a temp name first; ``os.link`` then
    either creates the final name or fails with EEXIST — the only two
    outcomes. No reader can ever see a partial manifest."""
    os.makedirs(_manifest_dir(base), exist_ok=True)
    v = int(manifest["version"])
    final = _manifest_path(base, v)
    tmp = os.path.join(_manifest_dir(base), f".v{v}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise SnapshotConflict(
            f"snapshot v{v} at {base} was published by a concurrent writer"
        ) from None
    finally:
        os.unlink(tmp)
    return v


# Per-file Bloom parameters: m bits packed into 64-bit words, k probes
# via double hashing over the md5 of the value's canonical string form.
# False-positive rate at m=1024, k=5 is < 1% up to ~100 values/file and
# degrades gracefully — a false positive only costs reading one file.
_BLOOM_M = 1024
_BLOOM_K = 5


def _bloom_hashes(value) -> "list[int]":
    """The k bit positions for ``value`` — canonical string encoding so
    the write side and the read-side probe agree for int/str alike."""
    import hashlib

    h = hashlib.md5(str(value).encode()).digest()
    h1 = int.from_bytes(h[:8], "big")
    h2 = int.from_bytes(h[8:], "big") | 1
    return [(h1 + i * h2) % _BLOOM_M for i in range(_BLOOM_K)]


def _bloom_words(values) -> "list[int]":
    words = [0] * (_BLOOM_M // 64)
    for v in values:
        if v is None:
            continue
        for pos in _bloom_hashes(v):
            words[pos // 64] |= 1 << (pos % 64)
    return words


def _bloom_maybe_contains(words: "list[int]", value) -> bool:
    return all(
        words[pos // 64] >> (pos % 64) & 1 for pos in _bloom_hashes(value)
    )


def _scan_files(
    commit_dir: str,
    part_col: "str | None",
    stats_cols: "list[str]",
    bloom_cols: "list[str] | None" = None,
) -> "tuple[list[dict], int]":
    """Enumerate the parquet files Spark just wrote under
    ``commit_dir`` and read row counts + min/max stats for
    ``stats_cols`` from the footers (pyarrow metadata only — no data
    pages touched). ``bloom_cols`` additionally builds a per-file
    Bloom filter over each listed column — the ONE write-side step
    that reads data (that single column, via pyarrow), the trade every
    bloom index makes: point lookups on an UNCLUSTERED high-cardinality
    column can then prune files min/max stats cannot (on a column the
    layout isn't sorted by, every file's [min,max] spans the domain).
    Honesty note for scale: this driver-side pass is bounded by one
    column of one commit's files (a commit is a micro-batch or a few
    partitions, never the table) — a production writer would fold the
    same hashing into the executor-side write path (a custom committer
    emitting the words alongside each file) so nothing funnels through
    the driver. Returns (entries, total_rows)."""
    import pyarrow.parquet as pq

    commit = os.path.basename(commit_dir.rstrip("/"))
    entries: list[dict] = []
    total = 0
    for root, _dirs, files in os.walk(commit_dir):
        part = None
        if part_col is not None:
            rel = os.path.relpath(root, commit_dir)
            if rel != "." and rel.startswith(f"{part_col}="):
                part = rel.split("=", 1)[1].split(os.sep)[0]
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            full = os.path.join(root, fname)
            md = pq.ParquetFile(full).metadata
            rows = md.num_rows
            total += rows
            stats: dict[str, list] = {}
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            for col in stats_cols:
                if col not in names:
                    continue
                ci = names.index(col)
                lo = hi = None
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                # numeric only: parquet writers may TRUNCATE string
                # min/max (an understated max would make the superset
                # prune wrongly skip a file), and bools/timestamps
                # would need an encoding scheme. Blooms, not zone maps,
                # are the string path.
                if (
                    ok
                    and isinstance(lo, (int, float))
                    and isinstance(hi, (int, float))
                    and not isinstance(lo, bool)
                    and not isinstance(hi, bool)
                ):
                    stats[col] = [lo, hi]
            blooms: dict[str, list[int]] = {}
            for col in bloom_cols or []:
                if col not in names:
                    continue
                vals = pq.read_table(full, columns=[col])[col].to_pylist()
                blooms[col] = _bloom_words(vals)
            entries.append(
                {
                    "commit": commit,
                    "path": os.path.relpath(full, commit_dir),
                    "part": part,
                    "rows": rows,
                    **({"stats": stats} if stats else {}),
                    **({"bloom": blooms} if blooms else {}),
                }
            )
    return entries, total


def _next_commit_dir(base: str, version: int) -> str:
    """Unique per ATTEMPT, not just per version: two writers racing for
    the same version must never share a data directory (the manifest
    link decides the winner; the loser's orphaned files wait for
    vacuum). The version prefix keeps the tombstone-scope parse
    (:func:`_commit_version`) and human debuggability."""
    return os.path.join(
        _data_dir(base), f"c{version:06d}_{uuid.uuid4().hex[:8]}"
    )


# ------------------------------------------------------------ commits


def snapshot_create(
    df: DataFrame,
    base: str,
    part_col: "str | None" = None,
    id_col: str = "id",
    stats_cols: "list[str] | None" = None,
    bloom_cols: "list[str] | None" = None,
    meta: "dict | None" = None,
) -> int:
    """Commit v1 of a new snapshot store at ``base``. ``part_col``
    becomes the table's physical partitioning (compaction unit and
    ``parts=`` pruning key); ``id_col`` is the key tombstones match on;
    ``stats_cols`` get per-file min/max recorded in every future
    manifest (the zone map); ``bloom_cols`` get a per-file Bloom
    filter for ``point=`` lookups on columns the layout is NOT sorted
    by. Returns the version (1)."""
    if snapshot_versions(base):
        raise SnapshotConflict(f"snapshot store already exists at {base}")
    stats_cols = list(stats_cols or [])
    bloom_cols = list(bloom_cols or [])
    commit_dir = _next_commit_dir(base, 1)
    shutil.rmtree(commit_dir, ignore_errors=True)
    w = df.write.mode("overwrite")
    if part_col is not None:
        w = w.partitionBy(part_col)
    w.parquet(commit_dir)
    entries, rows = _scan_files(commit_dir, part_col, stats_cols, bloom_cols)
    return _publish(
        base,
        {
            "version": 1,
            "parent": None,
            "op": "create",
            "part_col": part_col,
            "id_col": id_col,
            "stats_cols": stats_cols,
            "bloom_cols": bloom_cols,
            "schema": df.schema.json(),
            "files": entries,
            "tombstones": [],
            "batch_tags": [],
            "rows_added": rows,
            "rows_removed": 0,
            "meta": meta or {},
        },
    )


def _child(parent: dict, op: str) -> dict:
    return {
        "version": int(parent["version"]) + 1,
        "parent": int(parent["version"]),
        "op": op,
        "part_col": parent["part_col"],
        "id_col": parent["id_col"],
        "stats_cols": parent["stats_cols"],
        "bloom_cols": parent.get("bloom_cols", []),
        "schema": parent["schema"],
        "files": list(parent["files"]),
        "tombstones": list(parent["tombstones"]),
        "tomb_schema": parent.get("tomb_schema"),
        "batch_tags": list(parent["batch_tags"]),
        "rows_added": 0,
        "rows_removed": 0,
        "meta": dict(parent.get("meta", {})),
    }


def snapshot_append(
    df: DataFrame,
    base: str,
    batch_tag: "str | None" = None,
    meta: "dict | None" = None,
    merge_schema: bool = False,
) -> int:
    """Append ``df`` as a new snapshot. ``batch_tag`` makes the append
    IDEMPOTENT: a tag already present in the lineage is a no-op
    returning the current version — so a streaming ``foreachBatch``
    writer that tags each micro-batch with its batch id gets
    exactly-once table contents under Structured Streaming's
    batch-replay recovery, the standard idempotent-sink discipline.

    ``merge_schema=True`` enables ADD-COLUMN evolution: new fields in
    ``df`` extend the recorded table schema (appended after the
    existing fields); readers of any version fill the columns missing
    from older data files with NULL — the explicit-schema parquet read
    does this for free, so no old file is ever rewritten. Changing an
    existing column's type is rejected (that is a rewrite, not an
    append); without the flag a schema mismatch is an error rather
    than a silent drift."""
    parent = _load_manifest(base)
    if batch_tag is not None and batch_tag in parent["batch_tags"]:
        return int(parent["version"])
    m = _child(parent, "append")
    recorded = StructType.fromJson(json.loads(parent["schema"]))
    by_name = {f.name: f for f in recorded.fields}
    new_fields = []
    for f in df.schema.fields:
        old = by_name.get(f.name)
        if old is None:
            new_fields.append(f)
        elif old.dataType != f.dataType:
            raise ValueError(
                f"snapshot_append: column '{f.name}' is {old.dataType} in the "
                f"table but {f.dataType} in the append — type changes are a "
                "rewrite, not an append"
            )
    if new_fields:
        if not merge_schema:
            raise ValueError(
                "snapshot_append: new columns "
                f"{[f.name for f in new_fields]} — pass merge_schema=True "
                "to evolve the table schema"
            )
        evolved = StructType(list(recorded.fields) + new_fields)
        m["schema"] = evolved.json()
    commit_dir = _next_commit_dir(base, m["version"])
    shutil.rmtree(commit_dir, ignore_errors=True)
    w = df.write.mode("overwrite")
    if m["part_col"] is not None:
        w = w.partitionBy(m["part_col"])
    w.parquet(commit_dir)
    entries, rows = _scan_files(
        commit_dir, m["part_col"], m["stats_cols"], m["bloom_cols"]
    )
    m["files"] += entries
    m["rows_added"] = rows
    if batch_tag is not None:
        m["batch_tags"].append(batch_tag)
    if meta:
        m["meta"].update(meta)
    return _publish(base, m)


def snapshot_delete(ids: DataFrame, base: str) -> int:
    """Merge-on-read delete: commit ``ids`` (any one-column frame) as
    tombstone files — O(|ids|), no data rewrite. Reads anti-join the
    tombstones until :func:`snapshot_compact` folds them in. Time
    travel to the pre-delete version still serves the rows (erasure of
    HISTORY is :func:`snapshot_vacuum` retention policy, the same
    split GDPR tooling makes)."""
    parent = _load_manifest(base)
    m = _child(parent, "delete")
    commit_dir = _next_commit_dir(base, m["version"])
    shutil.rmtree(commit_dir, ignore_errors=True)
    keyed = ids.select(F.col(ids.columns[0]).alias(m["id_col"]))
    keyed.write.mode("overwrite").parquet(commit_dir)
    entries, rows = _scan_files(commit_dir, None, [])
    for e in entries:
        # applies only to data commits older than this delete: a
        # same-id row appended LATER is a new row, not a deleted one
        e["applies_before"] = m["version"]
    m["tombstones"] += entries
    m["tomb_schema"] = m.get("tomb_schema") or keyed.schema.json()
    m["rows_removed"] = rows
    return _publish(base, m)


def snapshot_upsert(
    df: DataFrame, base: str, batch_tag: "str | None" = None
) -> int:
    """MERGE-shaped UPSERT in ONE atomic commit: every row of ``df``
    REPLACES any existing row with the same id (tombstone on the
    batch's ids — merge-on-read, no data rewrite) and is appended as
    the new current version of that key. Because both the tombstone
    files and the data files ride a single manifest publication, no
    reader can ever observe the delete without the insert (the
    delete-then-append two-version sequence has exactly that torn
    state between commits). New ids insert, existing ids update —
    MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT, the CDC-apply
    operation every warehouse sink runs. ``batch_tag`` gives the same
    exactly-once replay discipline as :func:`snapshot_append`.
    Tombstones fold at the next :func:`snapshot_compact` as usual.

    Subtlety a naive upsert gets wrong: the batch's OWN rows must not
    be anti-joined away by the tombstones they shipped with — the
    read path applies tombstones only to files from STRICTLY OLDER
    commits (each file entry knows its commit; the tombstone commit
    id rides the tombstone entries)."""
    parent = _load_manifest(base)
    if batch_tag is not None and batch_tag in parent["batch_tags"]:
        return int(parent["version"])
    m = _child(parent, "upsert")
    commit_dir = _next_commit_dir(base, m["version"])
    shutil.rmtree(commit_dir, ignore_errors=True)
    id_col = m["id_col"]
    w = df.write.mode("overwrite")
    if m["part_col"] is not None:
        w = w.partitionBy(m["part_col"])
    w.parquet(os.path.join(commit_dir, "rows"))
    df.select(id_col).distinct().write.mode("overwrite").parquet(
        os.path.join(commit_dir, "tomb")
    )
    row_entries, rows = _scan_files(
        os.path.join(commit_dir, "rows"), m["part_col"], m["stats_cols"],
        m["bloom_cols"],
    )
    tomb_entries, removed = _scan_files(os.path.join(commit_dir, "tomb"), None, [])
    commit_name = os.path.basename(commit_dir)
    for e in row_entries:
        e["commit"] = f"{commit_name}/rows"
    for e in tomb_entries:
        e["commit"] = f"{commit_name}/tomb"
        e["applies_before"] = m["version"]
    m["files"] += row_entries
    m["tombstones"] += tomb_entries
    m["tomb_schema"] = m.get("tomb_schema") or df.select(id_col).schema.json()
    m["rows_added"] = rows
    m["rows_removed"] = removed
    if batch_tag is not None:
        m["batch_tags"].append(batch_tag)
    return _publish(base, m)


def snapshot_restore(base: str, version: int) -> int:
    """Roll back by rolling FORWARD: publish a new snapshot whose
    listing is a copy of ``version``'s. History stays linear and
    append-only; nothing is deleted."""
    parent = _load_manifest(base)
    old = _load_manifest(base, version)
    m = _child(parent, "restore")
    m["files"] = list(old["files"])
    m["tombstones"] = list(old["tombstones"])
    m["meta"] = dict(old.get("meta", {}))
    m["restored_from"] = int(version)
    return _publish(base, m)


def _read_entries(
    spark: SparkSession,
    base: str,
    entries: "list[dict]",
    schema_json: str,
    part_col: "str | None",
    tag_commit_version: bool = False,
) -> DataFrame:
    """Materialize a manifest file listing as one DataFrame. Files are
    grouped per commit so Spark's partition-value resolution sees each
    commit's own basePath; groups are unioned by name and projected to
    the recorded schema's column order (deterministic regardless of
    which commits survive pruning). The RECORDED schema is handed to
    every reader — planning never opens a footer for inference, so the
    plan cost is O(manifest), not O(files) of metadata round-trips
    (at 100 TB on an object store, inference is thousands of GETs)."""
    schema = StructType.fromJson(json.loads(schema_json))
    cols = [f.name for f in schema.fields]
    if tag_commit_version:
        cols = cols + ["_cv"]
    if not entries:
        out = spark.createDataFrame([], schema)
        if tag_commit_version:
            out = out.withColumn("_cv", F.lit(0).cast("long"))
        return out.select(*cols)
    by_commit: dict[str, list[str]] = {}
    for e in entries:
        by_commit.setdefault(e["commit"], []).append(e["path"])
    parts_frames = []
    for commit, paths in sorted(by_commit.items()):
        cdir = os.path.join(_data_dir(base), commit)
        reader = spark.read.schema(schema)
        if part_col is not None:
            reader = reader.option("basePath", cdir)
        grp = reader.parquet(*[os.path.join(cdir, p) for p in paths])
        if tag_commit_version:
            grp = grp.withColumn(
                "_cv", F.lit(_commit_version(commit)).cast("long")
            )
        parts_frames.append(grp)
    df = parts_frames[0]
    for other in parts_frames[1:]:
        df = df.unionByName(other)
    return df.select(*cols)


def _commit_version(commit: str) -> int:
    """'c000004' or 'c000004/rows' → 4."""
    import re

    return int(re.match(r"c(\d+)", commit).group(1))


# Tombstones apply only to data files from commits STRICTLY OLDER than
# their applies_before bound: a delete at version V must not erase a
# same-id row appended at V+1, and an upsert's own rows must survive
# the tombstones they shipped with. Entries without a bound (none are
# written anymore, kept for robustness) apply to everything.
_AB_UNBOUNDED = 1 << 62


def _tomb_frame(spark: SparkSession, base: str, m: dict) -> DataFrame:
    """Tombstones of manifest ``m`` as (id_col, _ab) — grouped by their
    applies_before bound so each group carries its bound as a literal."""
    schema_json = m.get("tomb_schema") or StructType().add(
        m["id_col"], "long"
    ).json()
    by_ab: dict[int, list[dict]] = {}
    for e in m["tombstones"]:
        by_ab.setdefault(int(e.get("applies_before", _AB_UNBOUNDED)), []).append(e)
    frames = []
    for ab, entries in sorted(by_ab.items()):
        frames.append(
            _read_entries(spark, base, entries, schema_json, None).withColumn(
                "_ab", F.lit(ab).cast("long")
            )
        )
    if not frames:
        return _read_entries(spark, base, [], schema_json, None).withColumn(
            "_ab", F.lit(_AB_UNBOUNDED).cast("long")
        )
    df = frames[0]
    for other in frames[1:]:
        df = df.unionByName(other)
    return df


def _anti_tombstones(df: DataFrame, tomb: DataFrame, id_col: str) -> DataFrame:
    """Scoped merge-on-read anti-join: drop rows whose id matches a
    tombstone whose bound admits the row's commit (_cv < _ab). The
    equality key keeps the join hash-based; the bound is a residual
    condition. Input ``df`` must carry _cv; it is dropped on the way
    out."""
    t = tomb.select(F.col(id_col).alias("_tid"), "_ab")
    return df.join(
        t, (df[id_col] == t["_tid"]) & (df["_cv"] < t["_ab"]), "left_anti"
    ).drop("_cv")


def snapshot_read(
    spark: SparkSession,
    base: str,
    version: "int | None" = None,
    parts: "list | None" = None,
    between: "tuple | None" = None,
    point: "tuple | None" = None,
    apply_tombstones: bool = True,
) -> DataFrame:
    """Read one snapshot (latest by default; ``version=N`` is time
    travel). Planning is manifest-only — no directory listing:

    * ``parts=[v, ...]`` keeps only entries of those partition values.
    * ``between=(col, lo, hi)`` keeps files whose recorded [min, max]
      for ``col`` overlaps [lo, hi] — zone-map skipping; files without
      stats for ``col`` are conservatively kept. The predicate is ALSO
      applied row-level (the manifest prunes files, the filter prunes
      rows), so the result is exact, not file-granular.
    * ``point=(col, value)`` is the POINT-LOOKUP path: files are kept
      only if the recorded [min, max] admits the value AND the
      per-file Bloom filter (``bloom_cols`` at create time) possibly
      contains it — on a column the layout is NOT sorted by, min/max
      spans the domain in every file and the Bloom is what turns
      "scan the table" into "read ~1 file" (false positives only cost
      reading one extra file; the row-level equality filter keeps the
      result exact). Files without a Bloom are conservatively kept.
    * tombstones (if any, and ``apply_tombstones``) are anti-joined on
      the table's id column — merge-on-read.
    """
    m = _load_manifest(base, version)
    entries = m["files"]
    if parts is not None:
        want = {str(p) for p in parts}
        entries = [e for e in entries if e["part"] in want]
    if between is not None:
        col, lo, hi = between
        entries = [
            e
            for e in entries
            if col not in e.get("stats", {})
            or (e["stats"][col][0] <= hi and lo <= e["stats"][col][1])
        ]
    if point is not None:
        col, value = point
        entries = [
            e
            for e in entries
            if (
                col not in e.get("stats", {})
                or (e["stats"][col][0] <= value <= e["stats"][col][1])
            )
            and (
                col not in e.get("bloom", {})
                or _bloom_maybe_contains(e["bloom"][col], value)
            )
        ]
    scoped = bool(apply_tombstones and m["tombstones"])
    df = _read_entries(
        spark, base, entries, m["schema"], m["part_col"],
        tag_commit_version=scoped,
    )
    if between is not None:
        col, lo, hi = between
        df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
    if point is not None:
        col, value = point
        df = df.filter(F.col(col) == value)
    if scoped:
        df = _anti_tombstones(df, _tomb_frame(spark, base, m), m["id_col"])
    return df


def snapshot_compact(spark: SparkSession, base: str) -> int:
    """Fold tombstones into the data by rewriting ONLY the partitions
    that contain tombstoned rows, as a NEW commit: survivors of the
    affected partitions are scanned partition-pruned (``parts=``
    manifest pruning, so the scan reads only those partitions' files)
    and written to a fresh commit dir; the new manifest carries every
    unaffected partition's file entries VERBATIM (same immutable paths
    — byte-identical by construction, no copy, no rename) and drops
    the tombstones. The pre-compaction snapshot remains readable until
    vacuum. No-op (returns current version) when there is nothing to
    fold."""
    parent = _load_manifest(base)
    if not parent["tombstones"]:
        return int(parent["version"])
    part_col, id_col = parent["part_col"], parent["id_col"]
    tomb = _tomb_frame(spark, base, parent)
    t = tomb.select(F.col(id_col).alias("_tid"), "_ab")

    def read_tagged(parts=None):
        return _read_entries(
            spark,
            base,
            parent["files"]
            if parts is None
            else [e for e in parent["files"] if e["part"] in set(parts)],
            parent["schema"],
            part_col,
            tag_commit_version=True,
        )

    full = read_tagged()
    if part_col is None:
        affected_parts: "list[str] | None" = None
        survivors = _anti_tombstones(full, tomb, id_col)
        keep = []
    else:
        # column-pruned: the affected-partition probe only needs
        # (id, part, _cv) — Spark's scan reads just those columns
        probe = full.select(id_col, part_col, "_cv")
        hit = probe.join(
            t, (probe[id_col] == t["_tid"]) & (probe["_cv"] < t["_ab"]),
            "left_semi",
        )
        affected_parts = sorted(
            str(r[part_col])
            for r in hit.select(part_col).distinct().collect()  # ≤ n_parts
        )
        if not affected_parts:
            # every tombstoned id misses the table: just retire them
            m = _child(parent, "compact")
            m["tombstones"] = []
            return _publish(base, m)
        survivors = _anti_tombstones(
            read_tagged(affected_parts), tomb, id_col
        )
        keep = [e for e in parent["files"] if e["part"] not in set(affected_parts)]
    m = _child(parent, "compact")
    commit_dir = _next_commit_dir(base, m["version"])
    shutil.rmtree(commit_dir, ignore_errors=True)
    w = survivors.write.mode("overwrite")
    if part_col is not None:
        w = w.partitionBy(part_col)
    w.parquet(commit_dir)
    entries, rows = _scan_files(
        commit_dir, part_col, m["stats_cols"], m["bloom_cols"]
    )
    m["files"] = keep + entries
    m["tombstones"] = []
    m["compacted_parts"] = affected_parts
    return _publish(base, m)


def snapshot_replace_partitions(
    df: DataFrame,
    base: str,
    parts: "list",
    op: str = "replace",
    meta: "dict | None" = None,
) -> int:
    """MAINTENANCE AS A COMMIT: publish a new snapshot in which the
    listed partitions' contents are exactly ``df`` (which must hold
    only rows of those partitions — enforced by filter) and every
    other partition's file entries carry over verbatim. This is the
    versioned replacement for the in-place two-rename directory swap
    (functions/index_store._swap_partitions): a rebalance, hot-cell
    split or small-file compaction becomes ordinary history — pinned
    readers are isolated, the pre-maintenance snapshot stays
    readable, and a bad rebalance is one :func:`snapshot_restore`
    away from undone. ``meta`` updates the manifest's side-model
    metadata (e.g. the refreshed coarse centroids riding along with
    the cells they describe, so model and membership version
    TOGETHER — the atomicity the sidecar-file layout cannot give).

    Contract: ``df`` is the listed partitions' new FULL contents. The
    rewritten rows land in a NEW commit, outside the applies_before
    scope of any OUTSTANDING tombstone — so if deletes are pending on
    these partitions, the caller must provide post-delete contents
    (read with tombstones applied, as :func:`snapshot_optimize` does)
    or compact first; including a tombstoned row here resurrects it."""
    parent = _load_manifest(base)
    part_col = parent["part_col"]
    if part_col is None:
        raise ValueError("snapshot_replace_partitions needs a partitioned table")
    want = {str(p) for p in parts}
    m = _child(parent, op)
    commit_dir = _next_commit_dir(base, m["version"])
    shutil.rmtree(commit_dir, ignore_errors=True)
    df.filter(
        F.col(part_col).cast("string").isin(list(want))
    ).write.mode("overwrite").partitionBy(part_col).parquet(commit_dir)
    entries, rows = _scan_files(
        commit_dir, part_col, m["stats_cols"], m["bloom_cols"]
    )
    m["files"] = [e for e in parent["files"] if e["part"] not in want] + entries
    m["rows_added"] = rows
    m["replaced_parts"] = sorted(want)
    if meta:
        m["meta"].update(meta)
    return _publish(base, m)


def snapshot_changes(
    spark: SparkSession, base: str, v_from: int, v_to: int
) -> DataFrame:
    """ROW-LEVEL CHANGE FEED between two snapshots — what an
    incremental downstream consumer (a training-data pipeline
    re-sharding only what moved, a derived index, a cache) reads
    instead of re-scanning the table. Because data files are
    immutable, rows can only change visibility through (a) the file
    diff — entries present in one manifest and not the other — and
    (b) the tombstone diff over files common to both. The scan is
    therefore bounded by the files that actually differ (plus the
    common files only when the tombstone set changed), never table
    size: the manifest IS the change index. Returns the ``v_to``
    schema plus a ``_change`` column ('insert' | 'delete'); a row
    rewritten byte-identically into a new file (compaction survivor)
    cancels out via EXCEPT ALL and does not appear. Across a SCHEMA
    EVOLUTION boundary both sides are read in ``v_to``'s schema — old
    files fill the added columns with NULL (the same rule the plain
    read applies), so the diff is well-typed and an unchanged row
    still cancels."""
    mf = _load_manifest(base, v_from)
    mt = _load_manifest(base, v_to)
    key = lambda e: (e["commit"], e["path"])  # noqa: E731
    from_keys = {key(e) for e in mf["files"]}
    to_keys = {key(e) for e in mt["files"]}
    added = [e for e in mt["files"] if key(e) not in from_keys]
    removed = [e for e in mf["files"] if key(e) not in to_keys]
    common = [e for e in mf["files"] if key(e) in to_keys]
    part_col = mt["part_col"]
    id_col = mt["id_col"]
    if not mf.get("tomb_schema"):
        mf = dict(mf, tomb_schema=mt.get("tomb_schema"))
    tf = _tomb_frame(spark, base, mf)
    tt = _tomb_frame(spark, base, mt)
    vis_to = _anti_tombstones(
        _read_entries(
            spark, base, added, mt["schema"], part_col, tag_commit_version=True
        ),
        tt,
        id_col,
    )
    vis_from = _anti_tombstones(
        _read_entries(
            spark, base, removed, mt["schema"], part_col,
            tag_commit_version=True,
        ),
        tf,
        id_col,
    )
    inserted = vis_to.exceptAll(vis_from)
    deleted = vis_from.exceptAll(vis_to)
    # visibility flips on UNCHANGED files: net-new tombstones delete,
    # net-dropped tombstones (a restore) resurrect — each within its
    # applies_before scope (a tombstone never flips rows of commits it
    # does not cover)
    new_t = tt.exceptAll(tf).distinct()
    dropped_t = tf.exceptAll(tt).distinct()

    def scoped_semi(rows: DataFrame, bounds: DataFrame) -> DataFrame:
        b = bounds.select(F.col(id_col).alias("_tid"), "_ab")
        return rows.join(
            b, (rows[id_col] == b["_tid"]) & (rows["_cv"] < b["_ab"]),
            "left_semi",
        ).drop("_cv")

    if common and (mf["tombstones"] or mt["tombstones"]):
        common_rows = _read_entries(
            spark, base, common, mt["schema"], part_col, tag_commit_version=True
        )
        deleted = deleted.unionByName(scoped_semi(common_rows, new_t))
        inserted = inserted.unionByName(scoped_semi(common_rows, dropped_t))
    return inserted.withColumn("_change", F.lit("insert")).unionByName(
        deleted.withColumn("_change", F.lit("delete"))
    )


def snapshot_optimize(
    spark: SparkSession,
    base: str,
    min_files: int = 2,
    parts: "list | None" = None,
    max_records_per_file: "int | None" = None,
) -> int:
    """SMALL-FILE COMPACTION (the OPTIMIZE of the table formats) as an
    ordinary commit: every partition holding at least ``min_files``
    files (all of them, or just ``parts``) is rewritten as ONE file per
    partition via :func:`snapshot_replace_partitions`; partitions
    already at one file carry over verbatim, and the change feed
    between the two versions is EMPTY by construction — a physical
    rewrite with zero logical change (pinned in tests through
    :func:`snapshot_changes`). The streaming-ingest counterpart of
    compaction: a ``foreachBatch`` writer commits one small file per
    partition per micro-batch, and read amplification grows with every
    batch until this folds them. Returns the new version (or the
    current one when nothing qualifies). At 100 TB, run per hot
    partition on a schedule; the rewrite budget is the listed
    partitions' bytes, never table size — and set
    ``max_records_per_file`` so a hot partition bin-packs into several
    right-sized files instead of serializing into one giant one (the
    writer splits at that row count; "one file per partition" is the
    small-table default, not the scale posture). Folding commits also
    bounds the reader's union width: every optimized partition's files
    land in ONE commit directory."""
    parent = _load_manifest(base)
    part_col = parent["part_col"]
    if part_col is None:
        raise ValueError("snapshot_optimize needs a partitioned table")
    counts: dict[str, int] = {}
    for e in parent["files"]:
        counts[e["part"]] = counts.get(e["part"], 0) + 1
    want = None if parts is None else {str(p) for p in parts}
    targets = sorted(
        p for p, n in counts.items() if n >= min_files and (want is None or p in want)
    )
    if not targets:
        return int(parent["version"])
    # survivors only: rewritten rows land in a NEW commit, OUTSIDE the
    # scope of outstanding tombstones (applies_before < new version) —
    # carrying a tombstoned row into the rewrite would RESURRECT it.
    # Optimize therefore folds deletes for the partitions it touches
    # (the tombstones stay on the manifest for every other partition).
    packed = snapshot_read(
        spark, base, parts=targets, apply_tombstones=True
    ).repartition(part_col)
    if max_records_per_file is None:
        return snapshot_replace_partitions(packed, base, targets, op="optimize")
    spark.conf.set(
        "spark.sql.files.maxRecordsPerFile", str(int(max_records_per_file))
    )
    try:
        return snapshot_replace_partitions(packed, base, targets, op="optimize")
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")


def snapshot_vacuum(base: str, retain_last: int = 1) -> "dict[str, int]":
    """Garbage-collect: delete every data/tombstone file not referenced
    by the newest ``retain_last`` manifests, drop the older manifests,
    and remove orphaned files from aborted commits. This is the ONLY
    operation that deletes anything; until it runs, every retained
    snapshot (and any pinned reader on one) is fully intact. Returns
    ``{"files_deleted": n, "manifests_deleted": n}``."""
    versions = snapshot_versions(base)
    if not versions:
        return {"files_deleted": 0, "manifests_deleted": 0}
    retained = versions[-max(1, int(retain_last)) :]
    referenced: set[str] = set()
    for v in retained:
        m = _load_manifest(base, v)
        for e in m["files"] + m["tombstones"]:
            referenced.add(os.path.join(e["commit"], e["path"]))
    ddir = _data_dir(base)
    files_deleted = 0
    if os.path.isdir(ddir):
        for root, _dirs, files in os.walk(ddir, topdown=False):
            for fname in files:
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, ddir)
                if rel not in referenced:
                    os.unlink(full)
                    files_deleted += 1
            if not os.listdir(root):
                os.rmdir(root)
    manifests_deleted = 0
    for v in versions:
        if v not in retained:
            os.unlink(_manifest_path(base, v))
            manifests_deleted += 1
    return {"files_deleted": files_deleted, "manifests_deleted": manifests_deleted}


def snapshot_log(spark: SparkSession, base: str) -> DataFrame:
    """The snapshot history as a DataFrame — one row per retained
    version: (version, op, parent, rows_added, rows_removed, n_files,
    n_tombstone_files, visible_rows). ``visible_rows`` is summed from
    the manifests' per-file footer counts — a metadata-only answer (no
    data file is opened), which is exactly what makes the manifest the
    100 TB bookkeeping layer. While tombstones are OUTSTANDING the
    visible count is not knowable from metadata (a tombstoned id may
    miss the table or match several rows), so it is NULL until the
    next compaction folds them in — merge-on-read defers that work by
    design."""
    rows = []
    for v in snapshot_versions(base):
        m = _load_manifest(base, v)
        rows.append(
            (
                v,
                m["op"],
                m["parent"],
                int(m.get("rows_added", 0)),
                int(m.get("rows_removed", 0)),
                len(m["files"]),
                len(m["tombstones"]),
                None
                if m["tombstones"]
                else int(sum(e["rows"] for e in m["files"])),
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, op string, parent int, rows_added long, "
        "rows_removed long, n_files int, n_tombstone_files int, "
        "visible_rows long",
    )
