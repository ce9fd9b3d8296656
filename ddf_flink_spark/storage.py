"""Executor-storage lifetime management for checkpointed/cached frames.

``DataFrame.localCheckpoint`` materializes blocks in executor storage
that are only reclaimed when the JVM garbage-collects the backing RDD —
and with a large driver heap a long session may not GC for hours, so
iterative operators (connected components, PageRank, Lloyd k-means, the
prefix-filter candidate set) slowly pin storage and degrade later
queries (measured: a 25-query bench session drove one query from ~4 s to
minutes once enough dead checkpoint blocks accumulated). The reference
has no equivalent concern — its engine materializes intermediates per
job and frees them with the job.

Two tools, both explicit:

* :func:`tracked_local_checkpoint` — a ``localCheckpoint`` that records
  which persistent-RDD ids it created, so :func:`release_checkpoint`
  can free EXACTLY those blocks the moment the frame is dead (the
  in-loop pattern: iterative operators release iteration i's labels as
  soon as iteration i+1 is materialized, holding at most two
  generations instead of all of them).
* :func:`release_all_storage` — unpersist EVERYTHING (checkpoints and
  caches). Only safe at workload boundaries where no live DataFrame
  will be re-executed: a localCheckpoint's lineage is truncated, so
  re-running one after its blocks are gone raises rather than silently
  recomputing. ``bench.py`` and ``tools/simulate_gate.py`` call it
  between queries; long-lived library users should call it at their own
  batch boundaries (or use ``DDFManager.release_storage``).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

__all__ = [
    "tracked_local_checkpoint",
    "observed_local_checkpoint",
    "propagate_checkpoint_ids",
    "release_checkpoint",
    "release_all_storage",
    "persistent_rdd_ids",
]

_CP_IDS_ATTR = "_ddf_checkpoint_rdd_ids"
_FINALIZER_ATTR = "_ddf_cp_finalizer"


def _release_ids_in_session(session_ref, ids) -> None:
    """GC-finalizer body: unpersist ``ids`` if the session is still
    alive. Takes a WEAK session reference (a finalizer holding the
    session strongly would keep it alive forever) and swallows
    everything — it may run during interpreter teardown or after
    ``SparkContext.stop()``, where the py4j gateway is gone. RDD ids are
    never reused within a SparkContext, so releasing an id that was
    already freed (explicit :func:`release_checkpoint`, blanket
    :func:`release_all_storage`) is a structural no-op."""
    spark = session_ref()
    if spark is None:
        return
    try:
        sc = spark.sparkContext
        if sc is None or sc._jsc is None:
            return
        m = sc._jsc.getPersistentRDDs()
        for k in list(m.keySet()):
            if int(k) in ids:
                m.get(k).unpersist(False)
    except Exception:
        pass


def _detach_finalizer(df: DataFrame) -> None:
    f = getattr(df, _FINALIZER_ATTR, None)
    if f is not None:
        f.detach()
        setattr(df, _FINALIZER_ATTR, None)


def _attach_finalizer(df: DataFrame, spark, ids) -> None:
    """Auto-release ``ids`` when ``df``'s Python wrapper is collected.
    Explicit release stays primary: :func:`release_checkpoint` detaches
    the finalizer, and the finalizer itself is a liveness-guarded no-op
    after any explicit release (ids gone from the persistent-RDD map).
    ``atexit=False``: at interpreter shutdown the JVM gateway may
    already be down, and the storage dies with the JVM anyway."""
    _detach_finalizer(df)
    f = weakref.finalize(df, _release_ids_in_session, weakref.ref(spark), frozenset(ids))
    f.atexit = False
    setattr(df, _FINALIZER_ATTR, f)


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of all currently-persisted RDDs (checkpoint blocks + caches)."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet()}


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint()`` that records the persistent-RDD id the
    checkpoint created on the returned frame, for a later exact
    :func:`release_checkpoint`.

    The id is read directly off the returned frame's plan: a
    checkpointed DataFrame's analyzed plan is a ``LogicalRDD`` wrapping
    exactly the persisted internal RDD, so ``analyzed().rdd().id()`` IS
    the block id — no global persistent-RDD set diff, hence no race
    where a concurrent thread's ``cache()``/checkpoint lands inside a
    diff window and gets wrongly captured (and later wrongly released,
    truncating a live frame's lineage). Falls back to a before/after
    diff only if the plan shape is ever not a LogicalRDD."""
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    cp = df.localCheckpoint()
    try:
        created = {int(cp._jdf.queryExecution().analyzed().rdd().id())}
    except Exception:  # unexpected plan shape — legacy diff fallback
        created = persistent_rdd_ids(spark) - before
    setattr(cp, _CP_IDS_ATTR, created)
    return cp


def observed_local_checkpoint(df: DataFrame, metric_name: str, metric_col):
    """:func:`tracked_local_checkpoint` of ``df.observe(metric_name,
    metric_col)``, returning ``(cp, metric_value)``: the metric rides
    the SAME job that materializes the checkpoint (CollectMetrics), so
    iterative operators get their convergence scalar without a second
    aggregation job per round.

    Deliberately uses the NAMED ``observe(str, col)`` form and reads the
    value back from the QueryExecution's ``observedMetrics`` — NOT a
    pyspark ``Observation`` object. ``Observation`` registers with the
    session-wide ``ObservationManager`` and the registration outlives
    the query, leaving the SparkSession transitively UNSERIALIZABLE:
    any later job whose closure captures the session (e.g. pyspark.ml
    training summaries inside an evaluator) then dies with
    ``Task not serializable: ObservationManager``. Named observe is
    registration-free; the metrics row is read off the executed plan.

    The metric value arrives as the natural Python type (Decimal /
    float / int; None for an empty input).

    If the metrics row cannot be read off the pre-checkpoint frame's
    QueryExecution (e.g. a future Spark version routes
    ``Dataset.checkpoint`` through a fresh QueryExecution so the
    observed metrics land elsewhere), degrades to a one-off aggregation
    of ``metric_col`` over the checkpointed frame — the two-job shape —
    instead of failing every CC/PageRank round on a Scala
    ``NoSuchElementException``."""
    observed = df.observe(metric_name, metric_col)
    cp = tracked_local_checkpoint(observed)
    try:
        value = (
            observed._jdf.queryExecution().observedMetrics().apply(metric_name).get(0)
        )
    except Exception:
        row = cp.agg(metric_col).collect()[0]
        value = row[0]
    return cp, value


def propagate_checkpoint_ids(out: DataFrame, *sources: DataFrame) -> DataFrame:
    """Carry the tracked-checkpoint RDD ids of internal ``sources``
    frames onto a derived PUBLIC result frame, so library users can free
    the storage those internal checkpoints pinned with a single
    ``release_checkpoint(result)`` once they are done with the result.
    Operators that checkpoint during DataFrame CONSTRUCTION
    (minhash_lsh_candidates, simhash_near_duplicates,
    prefix_filter_jaccard) use this — localCheckpoint is eager, so
    merely building those frames pins executor storage that would
    otherwise only be freed by a blanket ``release_all_storage`` /
    ``DDFManager.release_storage``.

    This is an OWNERSHIP TRANSFER: the blocks now belong to ``out``.
    Besides carrying the ids, it attaches a ``weakref.finalize`` on
    ``out`` so a library user who simply drops the result frame gets
    the storage back at GC time without ever calling
    ``release_checkpoint`` (explicit release stays primary — it
    detaches the finalizer). Any finalizer previously attached to a
    ``sources`` frame is detached here: the sources are the frames
    ``out``'s lazy plan still executes through, so their wrappers going
    out of scope inside an operator must NOT free blocks ``out``
    needs."""
    ids: set[int] = set(getattr(out, _CP_IDS_ATTR, None) or set())
    for s in sources:
        ids |= getattr(s, _CP_IDS_ATTR, None) or set()
        _detach_finalizer(s)
    if ids:
        setattr(out, _CP_IDS_ATTR, ids)
        _attach_finalizer(out, out.sparkSession, ids)
    return out


def release_checkpoint(df: DataFrame | None) -> None:
    """Free the storage blocks a :func:`tracked_local_checkpoint` frame
    pinned. The frame must be DEAD: its lineage was truncated at the
    checkpoint, so executing it again after release raises. No-op for
    None or untracked frames."""
    if df is None:
        return
    ids = getattr(df, _CP_IDS_ATTR, None)
    if not ids:
        return
    m = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for k in list(m.keySet()):
        if int(k) in ids:
            m.get(k).unpersist(False)
    setattr(df, _CP_IDS_ATTR, set())
    _detach_finalizer(df)


def release_all_storage(spark) -> int:
    """Unpersist every persistent RDD (checkpoints AND caches); returns
    how many were released. Safe only at workload boundaries — see
    module docstring."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for k in list(m.keySet()):
        m.get(k).unpersist(False)
        n += 1
    return n
