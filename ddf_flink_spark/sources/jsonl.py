"""JSONL (newline-delimited JSON) source/sink — the de facto LLM corpus
interchange format.

Extension beyond the reference surface (the reference loads only
delimited text — ``content/PersistenceHandler.scala`` / ``loadFile``);
this applies the same load discipline to JSONL:

* **Bounded schema inference.** Spark's native ``spark.read.json``
  without a schema runs a FULL extra pass over the corpus to infer types
  — a non-starter at 100 TB. ``read_jsonl`` instead samples the first
  ``sample_rows`` lines of the first file driver-side (exactly the
  reference's 5-row ``loadFile`` sample, ``Utils.java:97-150``) and maps
  them through the same int < double < string lattice
  (:func:`~ddf_flink_spark.sources.csv.infer_column_types` semantics on
  JSON natives). Callers with a known contract pass ``schema`` and skip
  even that.
* **Compression.** ``.gz``/``.zst`` files read transparently, but gzip
  is NOT splittable — one task per file. At scale prefer many shard
  files (the standard corpus layout) or recompress to parquet; the
  docstring is the warning.
"""

from __future__ import annotations

import glob
import gzip
import json
from itertools import islice

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_jsonl", "write_jsonl", "infer_jsonl_schema"]


def _sample_lines(path: str, n: int) -> list[str]:
    files = sorted(glob.glob(f"{path}/part-*") + glob.glob(f"{path}/*.json*")) or [path]
    out: list[str] = []
    for f in files:  # skip empty shards (Spark writes one per empty partition)
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt") as fh:
            out.extend(islice(fh, n - len(out)))
        if len(out) >= n:
            break
    return out


def infer_jsonl_schema(lines: list[str]) -> str:
    """Schema DDL from sampled JSONL lines: per-key type lattice
    int < double < string (bool only if every value is bool; nulls skip;
    arrays of numbers -> array<double>), keys in first-seen order."""
    order: list[str] = []
    seen: dict[str, set[str]] = {}
    for line in lines:
        if not line.strip():
            continue
        obj = json.loads(line)
        for k, v in obj.items():
            if k not in seen:
                seen[k] = set()
                order.append(k)
            if v is None:
                continue
            if isinstance(v, bool):
                seen[k].add("boolean")
            elif isinstance(v, int):
                seen[k].add("int")
            elif isinstance(v, float):
                seen[k].add("double")
            elif isinstance(v, list):
                seen[k].add("array<double>")
            else:
                seen[k].add("string")

    def resolve(types: set[str]) -> str:
        if not types:
            return "string"
        if types <= {"boolean"}:
            return "boolean"
        if types <= {"int"}:
            return "bigint"
        if types <= {"int", "double"}:
            return "double"
        if types <= {"array<double>"}:
            return "array<double>"
        return "string"

    return ", ".join(f"{k} {resolve(seen[k])}" for k in order)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sample_rows: int = 5,
) -> DataFrame:
    """Read JSONL with an explicit schema, or a driver-side
    ``sample_rows``-line inference (never Spark's full-scan inference —
    see module docstring)."""
    if schema is None:
        schema = infer_jsonl_schema(_sample_lines(path, sample_rows))
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write JSONL shards (one file per partition — the standard corpus
    layout; pass ``compression='gzip'`` for .gz shards)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
