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

Lifetime model (explicit release primary, GC strictly opt-in):
every tracked checkpoint id also lands in a per-session LEDGER, so a
frame dropped without release is a bounded leak reclaimed at the next
:func:`release_session_storage` / :func:`release_all_storage` boundary —
never a job-time failure. A ``weakref.finalize`` that frees blocks when
a Python wrapper dies is only attached via :func:`auto_release_on_gc`
and only safe on TERMINAL frames: derived DataFrames hold no Python
reference to their parent wrapper, so auto-attaching at every propagate
turns derive-then-drop into a nondeterministic
CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND at execution time (observed on Spark
4.1.2).

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
    "auto_release_on_gc",
    "release_checkpoint",
    "release_session_storage",
    "release_all_storage",
    "persistent_rdd_ids",
]

_CP_IDS_ATTR = "_ddf_checkpoint_rdd_ids"
_FINALIZER_ATTR = "_ddf_cp_finalizer"

# Session-level ledger of every RDD id a tracked_local_checkpoint created,
# keyed weakly by SparkSession. This is the safety net for frames whose
# wrappers are dropped without an explicit release: the ids sit here (a
# BOUNDED leak — blocks stay until a boundary release) instead of being
# freed by a GC finalizer that cannot know whether some derived lazy frame
# still executes through them. release_checkpoint / release_all_storage /
# release_session_storage all retire ids from the ledger.
_SESSION_IDS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _ledger(spark) -> set:
    s = _SESSION_IDS.get(spark)
    if s is None:
        s = set()
        _SESSION_IDS[spark] = s
    return s


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
        for k in list(m.keySet().toArray()):
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
    # one round-trip: iterating the Java set via the py4j iterator
    # protocol costs one JVM call per element plus a JVM
    # NoSuchElementException (with a full stack trace) to terminate —
    # ~65 ms per listing on this box; toArray ships the keys in one
    # reply (round 13)
    return {int(k) for k in m.keySet().toArray()}


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
    _ledger(spark).update(created)
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

    This is an OWNERSHIP TRANSFER of the *handle*, not a GC hook: the
    carried ids make ``release_checkpoint(out)`` exact, and any frame
    DERIVED from ``out`` keeps executing correctly even after ``out``'s
    wrapper is collected. Dropping ``out`` without releasing is a
    BOUNDED leak — the ids stay in the session ledger and are reclaimed
    by the next :func:`release_session_storage` /
    :func:`release_all_storage` boundary. Auto-free-at-GC is available
    but OPT-IN via :func:`auto_release_on_gc`, because a finalizer fires
    on Python wrapper death, which says nothing about whether some
    derived lazy plan still reads the blocks (a derive-then-drop under
    an auto-attached finalizer fails nondeterministically with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — reproduced on Spark 4.1.2).
    Any finalizer previously attached to a ``sources`` frame is
    detached here for the same reason: the sources are the frames
    ``out``'s lazy plan still executes through."""
    ids: set[int] = set(getattr(out, _CP_IDS_ATTR, None) or set())
    for s in sources:
        ids |= getattr(s, _CP_IDS_ATTR, None) or set()
        _detach_finalizer(s)
    if ids:
        setattr(out, _CP_IDS_ATTR, ids)
        _ledger(out.sparkSession).update(ids)
    return out


def auto_release_on_gc(df: DataFrame) -> DataFrame:
    """OPT-IN: free ``df``'s carried checkpoint blocks when its Python
    wrapper is garbage-collected. Only safe for TERMINAL frames — ones
    the caller will execute through ``df`` itself and never derive
    from: a finalizer fires on wrapper death, and a derived DataFrame
    holds no Python reference to ``df``, so deriving-then-dropping an
    auto-release frame kills the derived plan's checkpoint blocks
    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND at job time). Library users who
    chain operators should instead rely on the session ledger +
    :func:`release_session_storage` at their batch boundaries, or call
    :func:`release_checkpoint` explicitly (which detaches this
    finalizer). Returns ``df``."""
    ids = getattr(df, _CP_IDS_ATTR, None)
    if ids:
        _attach_finalizer(df, df.sparkSession, ids)
    return df


def release_session_storage(spark) -> int:
    """Unpersist every checkpoint block this module's helpers created in
    ``spark`` that has not already been explicitly released — the
    boundary reclaim for dropped-without-release frames. Unlike
    :func:`release_all_storage` it touches ONLY ledger-tracked ids, so a
    user's own ``cache()``/``persist()`` frames survive. The ledger
    CANNOT distinguish dropped from still-live library frames, so this
    also invalidates any LIVE library result built before the call —
    executing such a frame afterwards raises (its truncated lineage
    cannot recompute). Call only at batch boundaries where every
    previously-returned library frame is finished, exactly like
    :func:`release_all_storage`; the only difference is whose blocks
    are touched, not which frames stay executable. Returns how many
    ids were released."""
    ledger = _SESSION_IDS.get(spark)
    if not ledger:
        return 0
    m = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for k in list(m.keySet().toArray()):
        if int(k) in ledger:
            m.get(k).unpersist(False)
            n += 1
    ledger.clear()
    return n


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
    spark = df.sparkSession
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for k in list(m.keySet().toArray()):
        if int(k) in ids:
            m.get(k).unpersist(False)
    ledger = _SESSION_IDS.get(spark)
    if ledger:
        ledger.difference_update(ids)
    setattr(df, _CP_IDS_ATTR, set())
    _detach_finalizer(df)


def release_all_storage(spark) -> int:
    """Unpersist every persistent RDD (checkpoints AND caches); returns
    how many were released. Safe only at workload boundaries — see
    module docstring."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for k in list(m.keySet().toArray()):
        m.get(k).unpersist(False)
        n += 1
    ledger = _SESSION_IDS.get(spark)
    if ledger:
        ledger.clear()
    return n
