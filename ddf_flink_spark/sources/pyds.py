"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The reference's only extensibility path for new inputs was writing a new
Flink ``InputFormat`` in Scala/Java (``utils/package.scala:401-442``'s
univocity CSV format is the lone example). Spark 4 exposes source
authoring to Python with real planner integration:

* ``partitions()`` — the source declares split boundaries, so reads are
  PARALLEL (one task per ``InputPartition``), exactly like a file scan;
* ``pushFilters()`` (Spark 4.1) — the source sees the query's predicates
  BEFORE planning partitions and can prune work server-side — the same
  contract parquet scans use (``PushedFilters`` in PERF.md audits).

``SynthRowsDataSource`` is a deterministic arithmetic table (linear
congruential values), so an external engine reproduces it exactly — the
DuckDB oracle (registry q150) recomputes the identical rows from
``generate_series`` and hash-checks a query that pushes an id-range
filter into the source. Range filters on ``id`` prune entire partitions
before any task launches; residual filters are applied row-side.

At 100 TB the same four methods wrap any sharded backend (a REST shard
list, a key-range store, a proprietary format): partitions ↔ shards,
pushFilters ↔ server-side predicates. Python-per-row throughput is the
known cost (PERF.md) — for raw bytes on disk, parquet + the JVM scan
remains the fast path; this API is for systems Spark has no connector
for.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["SynthRowsDataSource", "LCG_A", "LCG_C", "LCG_M", "register"]

# Classic glibc LCG constants — simple enough for any engine to mirror.
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SynthReader(DataSourceReader):
    """Rows (id, val, bucket) for id in [0, n): val = LCG(id),
    bucket = id % n_buckets. Range predicates on ``id`` are consumed at
    planning time and shrink the candidate range → whole partitions are
    never scheduled (partition pruning, Python-source edition)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("numpartitions", 8))
        self.n_buckets = int(options.get("buckets", 16))
        self.lo = 0
        self.hi = self.n  # exclusive

    def pushFilters(self, filters):  # noqa: N802 — API name
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f  # unsupported → Spark keeps the filter row-side

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        span = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        parts = []
        s = lo
        while s < hi:
            parts.append(_RangePartition(s, min(s + span, hi)))
            s += span
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        a, c, m, nb = LCG_A, LCG_C, LCG_M, self.n_buckets
        for i in range(partition.start, partition.end):
            yield (i, (i * a + c) % m, i % nb)


class SynthRowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthrows"

    def schema(self) -> str:
        return "id bigint, val bigint, bucket int"

    def reader(self, schema) -> _SynthReader:
        return _SynthReader(self.options)


def register(spark) -> None:
    """Register the source (idempotent) for ``spark.read.format("synthrows")``."""
    spark.dataSource.register(SynthRowsDataSource)
