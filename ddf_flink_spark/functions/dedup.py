"""Deduplication operators for LLM training-data pipelines.

Extensions beyond the reference surface (SURVEY §7.2 step 9). Five
strategies, each picked for a different scale/recall trade-off:

* **exact** — fingerprint groupBy; one shuffle of (hash, id), never of text.
* **n-gram Jaccard** — inverted-index join on shingles (candidate pairs
  share ≥1 shingle), then exact Jaccard on the candidates. The join IS the
  blocking strategy: at 100 TB you never come close to the O(n²) pair
  space, only docs sharing a shingle meet.
* **MinHash + LSH** — k independent min-hashes over shingles, banded into
  b buckets; docs sharing a band-bucket are candidates. Shuffle carries
  (band, bucket-hash, id) — constant bytes/doc regardless of doc size.
* **SimHash** — 64-bit signature from per-token hash bit-votes; near-dups
  have small Hamming distance. Constant-size signature per doc.
* **embedding cosine** — near-dup by semantic similarity (see
  ``similarity.py`` for the ANN machinery).

All of it is declarative DataFrame ops (explode / groupBy / join) — no
Python in the row path. MinHash/SimHash use xxhash64 (one JVM call per
shingle); the cross-engine-stable fingerprint path uses MD5 (see
``text.fingerprint``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint

__all__ = [
    "ensure_compute_parallelism",
    "exact_duplicates",
    "dedup_exact",
    "word_shingles",
    "exploded_shingles",
    "jaccard_candidates",
    "jaccard_verify_pairs",
    "prefix_filter_jaccard",
    "fuzzy_near_duplicates",
    "md5_long",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "simhash",
    "simhash_near_duplicates",
    "connected_components",
]


def md5_long(col: Column | str, salt: int | None = None) -> Column:
    """Cross-engine 60-bit hash: the first 15 hex chars of MD5, parsed as a
    bigint. Unlike xxhash64 (JVM-specific), ANY engine with md5 computes
    the identical value — DuckDB mirror:
    ``CAST(('0x' || SUBSTRING(md5(expr), 1, 15)) AS BIGINT)``.
    ``salt`` prepends ``"<salt>:"`` to derive independent hash-family
    members (mirror: ``md5(CAST(i AS VARCHAR) || ':' || expr)``).

    ~3-4× more expensive per value than xxhash64, so the xx family is the
    default scale path; this is the interchange/verification path."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# Cross-engine MinHash rehash family: affine maps mod the Mersenne prime
# 2^31 - 1 over base = md5_long(shingle) % P. All operands stay < 2^62,
# so BIGINT arithmetic is exact (no overflow) in any engine. The (a, b)
# constants are plan-time literals derived from Knuth/Numerical-Recipes
# multipliers; a_i is never 0 mod P.
MINHASH_MERSENNE_P = 2**31 - 1


def _minhash_a(i: int) -> int:
    return ((2 * i + 1) * 2654435761) % MINHASH_MERSENNE_P


def _minhash_b(i: int) -> int:
    return (i * 1013904223) % MINHASH_MERSENNE_P


# ------------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of identical (normalized) documents: fingerprint → groupBy.
    Returns (fingerprint, n_docs, keep_id=min id, member_ids)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per fingerprint — the actual dedup.
    Window-free formulation: a semi-join of the frame against the winning
    (fp, min_id) pairs, so the text column is never shuffled."""
    winners = (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, on=id_col, how="left_semi")


def ensure_compute_parallelism(
    df: DataFrame,
    min_partitions: int | None = None,
    min_bytes: int = 2 * 1024 * 1024,
) -> DataFrame:
    """Decouple compute-dense stage parallelism from the source file
    layout. A small parquet file (one rowgroup) plans as 1-2 scan
    partitions, and because scan + explode fuse into ONE stage, the most
    expensive per-token work (shingle explode, signature hashing) then
    runs on 1-2 of the cluster's cores — measured 2× end-to-end on the
    50k-doc sf1 corpus (prefix-filter 23.4→12.7 s, SimHash 7.0→3.4 s)
    just by repartitioning the input to core count first.

    Doubly conditional, so it can only fire where it pays:

    * partitions < default parallelism — at real scale (thousands of
      input splits) and on shuffled intermediates (≥ shuffle
      partitions) this is false and the function is a no-op;
    * Catalyst's size estimate ≥ 2 MiB — below that the serialized
      explode finishes in well under a second and the extra exchange +
      32-task scheduling costs MORE than it saves (interleaved A/B on
      q234 at sf0.1, ~580 KB estimated: guard-on 5.3–5.7 s vs
      guard-off 4.5–5.2 s; at sf1's ~5.6 MiB the same guard is a
      2.2–2.4× end-to-end WIN — prefix-filter 22.0→9.1 s, passage
      windows 5.1→2.3 s, SimHash 7.0→3.4 s).

    ``min_bytes`` tunes the size guard per consumer density: the 2 MiB
    default is calibrated for shingle explodes; a consumer whose
    per-byte compute is an order denser (the chunk-embedding pass —
    dim md5-bit folds per token across overlapping windows) passes a
    lower threshold, because its break-even input is correspondingly
    smaller (q257 at sf0.1: 580 KB of documents is ~25 s of single-task
    hashing).

    The repartition round-robins rows; every consumer keys on content
    (explode → groupBy/join), so results are partitioning-invariant."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        if int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ) < min_bytes:
            return df
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    return df.repartition(target)


# ------------------------------------------------------------- n-gram sets
def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-grams (shingles) of the lowercased text — a single
    transform over the token array, no UDF. Documents shorter than ``n``
    words yield an empty array (``sequence`` with a negative end would
    otherwise throw)."""
    toks = F.split(F.lower(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, g) rows of distinct word n-grams — the hot-path form.

    Produces exactly the same shingle set as ``word_shingles`` but with
    ZERO higher-order functions: the gram array is built by zipping n
    shifted slices of the token array (``arrays_zip`` — a plain codegen'd
    expression), deduped at the struct level, exploded, and only then
    concatenated row-wise (codegen'd). The HOF form (per-element
    interpreted ``slice``+``concat_ws`` lambda) measured ~4.7× slower at
    sf0.1 — the same interpreted-lambda trap as the SimHash fold.

    Guard threshold note (round 12): a 256 KB threshold was A/B'd here
    — it cut WALL 15-32% at sf0.1 (q220 4.54→3.10 s, q33 3.29→2.72 s)
    by spreading the single-task explode funnel, but on this
    host-overcommitted sandbox the 32-way spread inflates measured
    CPU-seconds 2-3× (q220 cpu 3.6→11.7; vCPUs share host cores, so
    parallel phases tick slower per thread), tripping the committed
    per-query CPU anchors that adjudicate round-over-round regressions.
    The 2 MiB default stays: it is the right trade wherever CPU
    accounting is honest, and above it (real scale) the guard fires
    anyway."""
    df = ensure_compute_parallelism(df)
    toks = F.split(F.lower(text_col), " ")
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.array_distinct(
        F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    )
    return df.select(F.col(id_col).alias("id"), F.explode(zipped).alias("z")).select(
        "id",
        F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(n)]).alias("g"),
    )


def jaccard_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, candidates generated by
    an inverted-index self-join on shingles.

    Pipeline: explode distinct shingles → (optionally drop shingles more
    frequent than ``max_shingle_freq`` — stop-shingle suppression, the skew
    guard at scale) → self-join on shingle with id< id → count shared
    shingles per pair → Jaccard = shared / (|a| + |b| - shared) → filter.

    Returns (id_a, id_b, jaccard).
    """
    sh = exploded_shingles(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("f")).filter(F.col("f") <= max_shingle_freq)
        sh = sh.join(freq.select("g"), on="g", how="left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN candidate pair list — the
    verify stage of every LSH→verify pipeline (q152/q234 shape),
    shaped so work is ∝ the pair list, never the candidate-doc
    posting lists.

    The composition it replaces ran :func:`jaccard_candidates` over
    the candidate DOCS (an inverted-index self-join that re-derives
    ALL pairs those docs form — on a near-dup-dense corpus far more
    pairs than LSH emitted) and then semi-joined back to ``pairs``.
    Here each candidate doc's distinct-shingle array is gathered once
    (explode + collect_list bounded by pair-member docs), each pair
    picks up both arrays by two id-equi-joins, and the shared count is
    one ``array_intersect`` per pair — Σ_pairs(|a|+|b|) work, the
    prefix_filter_jaccard verify discipline (guide §1.2: don't compute
    pairs you throw away).

    Values are identical to the old composition: ``exploded_shingles``
    yields each doc's DISTINCT shingles, so |sets| and |intersection|
    are the same integers, the Jaccard the same round-4 double, and
    restricting computation to ``pairs`` before thresholding equals
    thresholding the superset then semi-joining (pairs not in the LSH
    list were discarded by the semi-join anyway; pairs with zero
    shared shingles fail any positive threshold in both forms).
    Returns (id_a, id_b, jaccard) with jaccard ≥ ``threshold``."""
    cdocs = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = df.join(cdocs, id_col, "left_semi")
    tarr = (
        exploded_shingles(cand_docs, text_col, id_col, n)
        .groupBy("id")
        .agg(F.collect_list("g").alias("gs"))
    )
    return (
        pairs.select("id_a", "id_b")
        .join(tarr.select(F.col("id").alias("id_a"), F.col("gs").alias("ga")), "id_a")
        .join(tarr.select(F.col("id").alias("id_b"), F.col("gs").alias("gb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ga", "gb")).alias("shared"),
            F.size("ga").alias("sz_a"),
            F.size("gb").alias("sz_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_filter_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_n: int = 1,
) -> DataFrame:
    """Exact token-set Jaccard join with PREFIX FILTERING [Chaudhuri et
    al. 2006 SSJoin; Xiao et al. 2008 PPJoin]: order each document's
    distinct tokens by global rarity (corpus frequency asc, token asc)
    and index only its PREFIX of length |d| − ⌈t·|d|⌉ + 1 — any pair
    with Jaccard ≥ t must share at least one prefix token, so the
    inverted index shrinks from every posting to the rare head of each
    document while remaining lossless. The candidate-space win scales
    with the VOCABULARY'S FREQUENCY SKEW — the rarest tokens have the
    shortest postings and only those are joined. On a Zipfian corpus
    with doc-specific rare tokens the cut is dramatic (unit test:
    1830 → 1 candidate pairs, identical output); on the synthetic
    testdata corpus, whose ~100-word vocabulary has NO rare tokens,
    the measured cut is only ~1% (124,745 → 123,582 pairs at t=0.7) —
    prefix filtering is the natural-text scale path, not a win on
    skew-free vocabularies.

    No global token rank is materialized: the per-document ordering
    uses the (freq, token) key directly in a per-doc window, so the
    vocabulary is never funneled through one partition.

    VERIFY runs per candidate PAIR, never over postings: candidate
    docs' distinct-token arrays are gathered once (bounded by the
    candidate set), each (id_a, id_b) pair picks up both arrays by two
    id-equi-joins, and the shared count is one ``array_intersect`` per
    pair — so verify cost is Σ_pairs(|a|+|b|), proportional to the
    candidate space the prefix filter just pruned. (The earlier
    formulation self-joined the full posting lists of all candidate
    docs on raw token — on a corpus where most docs are candidates
    that re-did the unfiltered join's work, exploding on stop tokens;
    locked out by the single-token-join plan assertion in
    tests/test_llm_ops.py.)

    ``shingle_n > 1`` runs the SAME algorithm over distinct word
    n-gram sets instead of token sets (set element = shingle). This is
    the scale configuration when the raw vocabulary is small/skew-free:
    the n-gram space is |V|^n, so rare set elements exist even where
    rare words don't, and the prefix filter regains its pruning power
    (token-level on the synthetic corpus: every doc collides with every
    doc through the ~100-word vocabulary — O(n²) pairs by construction,
    for ANY exact algorithm; 3-gram-level: the measured candidate space
    collapses to the near-dup pairs). Registry: q186 = token sets
    (correctness demo vs the unfiltered oracle), q205 = 3-gram sets
    (the bench/scale path).

    Returns (id_a, id_b, jaccard) — identical output to the unfiltered
    exact join, which is what the registry oracle (q186) computes.

    Storage note: building this frame eagerly checkpoints the candidate
    pair set; the ids ride on the returned frame — call
    ``storage.release_checkpoint(result)`` when done (or
    ``DDFManager.release_storage()`` at a workload boundary)."""
    if shingle_n > 1:
        toks = exploded_shingles(df, text_col, id_col, shingle_n).select(
            "id", F.col("g").alias("tok")
        )
    else:
        toks = df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
            ).alias("tok"),
        )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    # sz = the doc's distinct-element count, computed as COUNT(*) OVER
    # (PARTITION BY id) in the SAME window pass that ranks the prefix —
    # the earlier groupBy-then-join form re-evaluated the full shingle
    # explode a second time for the sizes aggregate and paid a third
    # shuffle to join it back (guide §2.4 remove-shuffles: same
    # partitioning ⇒ one exchange). Equal by construction: the freq
    # join is inner on tok and every tok has tf ≥ 1, so the window
    # counts exactly the doc's distinct elements.
    wdoc = Window.partitionBy("id").orderBy(F.col("tf").asc(), F.col("tok").asc())
    wsz = Window.partitionBy("id")
    ranked = (
        toks.join(freq, "tok")
        .withColumn("pos", F.row_number().over(wdoc))
        .withColumn("sz", F.count(F.lit(1)).over(wsz))
    )
    # Prefix-length bound with two safety margins, both erring LONGER
    # (longer prefixes only add candidates — never lose one):
    # (a) the final filter accepts ROUND(J, 4) >= t, i.e. true J down to
    #     t - 5e-5, so the lossless bound must be computed at that
    #     effective threshold, not t itself;
    # (b) IEEE t*sz can land epsilon ABOVE the exact product (e.g.
    #     0.56*25 = 14.000000000000002), overshooting the exact ceil by
    #     one and shortening the prefix below the lossless bound — the
    #     subtracted 1e-9 guards it (worst case: one extra prefix token).
    t_eff = threshold - 5e-5
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.lit(t_eff) * F.col("sz") - F.lit(1e-9)) + 1
    ).select("id", "tok", "pos", "sz")
    # PPJoin's two additional LOSSLESS pruners, applied inside the
    # candidate join (before the distinct) so false candidates never
    # reach the dedup shuffle:
    # * length filter — J ≥ t forces min(sz) ≥ t·max(sz);
    # * positional filter — the FIRST common token of a qualifying pair
    #   lies in both prefixes (prefix-theorem corollary), and overlap
    #   o ≤ 1 + min(sz_a − pos_a, sz_b − pos_b) at it, which must reach
    #   α = ⌈t/(1+t)·(sz_a+sz_b)⌉; a pair is kept if ANY shared prefix
    #   token passes, so the first common token always rescues true
    #   pairs. Both bounds take the −1e-9 ceil guard ERRING KEEPING
    #   (same IEEE discipline as the prefix-length bound above).
    sz_a, sz_b = F.col("a.sz"), F.col("b.sz")
    alpha = F.ceil(
        F.lit(t_eff / (1.0 + t_eff)) * (sz_a + sz_b) - F.lit(1e-9)
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .filter(
            (F.least(sz_a, sz_b) >= F.lit(t_eff) * F.greatest(sz_a, sz_b) - F.lit(1e-9))
            & (
                F.lit(1)
                + F.least(sz_a - F.col("a.pos"), sz_b - F.col("b.pos"))
                >= alpha
            )
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # cand feeds THREE plan branches (the pair verify + both sides of
    # the candidate-doc gather); checkpointing the bounded id-pair set
    # runs the prefix join once instead of three times and truncates
    # the verify plan's lineage — the zero-token-joins-after-candidates
    # assertion in tests/test_llm_ops.py reads this boundary.
    # The explicit repartition matters: a candidate-pair row is two
    # ints, so AQE coalesces the distinct output to ~1 partition by
    # byte size — but each row EXPANDS to two full token arrays plus an
    # intersect in the verify stage (high compute per byte), and the
    # verify join inherits cand's partitioning (the array side
    # broadcasts). Without it the entire verify ran on ONE task
    # (observed: minutes instead of seconds at sf0.1).
    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    cand = tracked_local_checkpoint(cand.repartition(parallelism))
    cdocs = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # per-candidate-doc distinct-token arrays: semi-join the DOCUMENT
    # rows first, then explode only the survivors' elements. The
    # earlier form semi-joined the exploded corpus (toks ⋉ cdocs) —
    # re-running the full-corpus shingle explode just to keep the
    # candidate docs' rows; this way the explode + collect_list shuffle
    # are both ∝ candidate docs, never corpus (guide §2.3 shuffle
    # fewer bytes / §1.2 don't compute what you throw away). Same
    # tokens per doc (identical explode expression over the same
    # rows), so array_intersect sees identical sets.
    cand_docs = df.join(
        cdocs.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    if shingle_n > 1:
        ctoks = exploded_shingles(cand_docs, text_col, id_col, shingle_n).select(
            "id", F.col("g").alias("tok")
        )
    else:
        ctoks = cand_docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
            ).alias("tok"),
        )
    tarr = ctoks.groupBy("id").agg(F.collect_list("tok").alias("tset"))
    out = (
        cand.join(
            tarr.select(F.col("id").alias("id_a"), F.col("tset").alias("ta")), "id_a"
        )
        .join(
            tarr.select(F.col("id").alias("id_b"), F.col("tset").alias("tb")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).alias("sh"),
            F.size("ta").alias("sz_a"),
            F.size("tb").alias("sz_b"),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("sh") / (F.col("sz_a") + F.col("sz_b") - F.col("sh")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return propagate_checkpoint_ids(out, cand)


def fuzzy_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 5,
    prefix_len: int = 120,
    threshold: float = 0.8,
) -> DataFrame:
    """Record-linkage fuzzy join: inverted-index blocking + edit-distance
    verification — the classic two-stage linkage pipeline (block cheaply,
    verify expensively on candidates only).

    Stage 1 (blocking): pairs sharing ≥ ``min_shared`` word n-grams, via
    the same inverted-index self-join as :func:`jaccard_candidates` — the
    pair space is bounded by co-occurring shingles, never O(n²).
    Stage 2 (verify): normalized Levenshtein similarity on a bounded
    ``prefix_len``-char prefix of each candidate's text —
    ``1 - lev(pa, pb) / max(len(pa), len(pb))`` — computed by the
    codegen'd JVM ``levenshtein`` expression. Bounding the prefix bounds
    the O(m·n) DP cost per pair to a constant, which is what makes the
    verify stage safe at corpus scale; candidates are joined back to the
    prefix projection (two hash joins on id), so full text never rides
    the pair shuffle.

    Returns (id_a, id_b, edit_sim) with edit_sim rounded to 4 digits and
    ≥ ``threshold``. Reference has no string-distance surface at all
    (grep itself throws: ``TableHandler.scala`` refuses regex rows)."""
    sh = exploded_shingles(df, text_col, id_col, n)
    a, b = sh.alias("a"), sh.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    pre = df.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("p"),
    )
    pa = pre.select(F.col("id").alias("id_a"), F.col("p").alias("pa"))
    pb = pre.select(F.col("id").alias("id_b"), F.col("p").alias("pb"))
    # two empty prefixes → 0/0 would be NULL and the pair would silently
    # vanish at the threshold filter; define them as identical (sim=1).
    # Unreachable via this blocking (empty texts have no n-grams) but a
    # live trap for callers composing with other candidate generators.
    sim = F.round(
        F.when(
            F.greatest(F.length("pa"), F.length("pb")) == 0, F.lit(1.0)
        ).otherwise(
            1
            - F.levenshtein(F.col("pa"), F.col("pb"))
            / F.greatest(F.length("pa"), F.length("pb"))
        ),
        4,
    )
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .withColumn("edit_sim", sim)
        .filter(F.col("edit_sim") >= threshold)
        .select("id_a", "id_b", "edit_sim")
    )


# ----------------------------------------------------------------- MinHash
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    hash_family: str = "xx",
) -> DataFrame:
    """k min-hash values per document: h_i(doc) = min over shingles of
    xxhash64(i, base) where base = xxhash64(shingle). One explode + one
    groupBy; the aggregate state is k longs per doc regardless of document
    size.

    The shingle *string* is hashed exactly once; the k family members are
    derived by re-hashing the fixed-width 64-bit base (integer-input
    xxhash64 is ~10× cheaper than string hashing, so signature cost is
    ~O(shingles) rather than O(k·shingles) string hashes).

    ``hash_family="md5"`` switches to the cross-engine family: ONE
    ``md5_long`` per shingle, then k affine integer rehashes
    ``h_i = (a_i·(base mod P) + b_i) mod P`` with P = 2³¹−1 and
    plan-time literal (a_i, b_i) — pure BIGINT arithmetic any engine
    replays exactly (the same one-string-hash discipline as the xx
    family; the earlier k-md5s-per-shingle formulation measured ~2.4×
    slower at sf0.1 on the full q152 pipeline). Use md5 for interchange
    and verification, xx for production scale."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n)
    # ONE SQL-text struct aggregate (round 13): round 12 already parsed
    # each min() as text, but still issued one py4j round-trip (and one
    # eager re-analysis) per aggregate column — k of them per call.
    # Wrapping all k mins in a single named struct parses and analyzes
    # once; ``s.*`` restores the identical h0..h{k-1} columns (the
    # optimizer collapses the struct projection back onto the aggregate
    # references — same exchange, same exact-BIGINT values).
    if hash_family == "md5":
        p = MINHASH_MERSENNE_P
        base = f"(cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % {p})"
        fields = ", ".join(
            f"min(({_minhash_a(i)} * {base} + {_minhash_b(i)}) % {p}) as h{i}"
            for i in range(num_hashes)
        )
    else:
        sh = sh.select("id", F.xxhash64("g").alias("hg"))
        fields = ", ".join(
            f"min(xxhash64({i}, hg)) as h{i}" for i in range(num_hashes)
        )
    return (
        sh.groupBy("id")
        .agg(F.expr(f"struct({fields})").alias("s"))
        .select("id", "s.*")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "xx",
) -> DataFrame:
    """LSH banding: split the k-signature into ``bands`` rows of k/bands
    hashes; docs agreeing on ALL hashes of any band become a candidate
    pair. With r = k/b rows per band, P(candidate) ≈ 1-(1-j^r)^b — the
    classic S-curve; 32/8 targets j ≳ 0.6.

    Shuffle profile at scale: (band_id, band_hash, id) triples — constant
    per doc — then groupBy bucket. Returns distinct (id_a, id_b) pairs.

    ``hash_family="md5"`` uses the cross-engine signature family and a
    comma-joined band key (instead of an xxhash64 of the band's hashes)
    so external engines reproduce the buckets exactly.

    Storage note: building this frame eagerly checkpoints the banded
    rows (localCheckpoint pins executor storage). The ids ride on the
    returned frame — call ``storage.release_checkpoint(result)`` when
    done with it (or ``DDFManager.release_storage()`` at a workload
    boundary) in long-lived sessions.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, hash_family)

    def bucket_key_sql(bi: int) -> str:
        members = [f"h{bi * r + j}" for j in range(r)]
        if hash_family == "md5":
            return (
                "concat_ws(',', "
                + ", ".join(f"cast({m} as string)" for m in members)
                + ")"
            )
        return f"cast(xxhash64({', '.join(members)}) as string)"

    from ..storage import tracked_local_checkpoint

    # materialize the banded rows ONCE: without this, BOTH sides of the
    # bucket self-join re-run the whole signature pipeline (shingle
    # explode + hashing + k-min aggregation — the dominant cost) because
    # Spark plans the join as broadcast(side B) and never reuses side
    # A's exchange (verified in tests/test_plans.py: the pre-fix plan
    # carried two hashpartitioning(id) exchanges). Banded rows are
    # O(bands) per doc — far smaller than the shingle stage they replace.
    # The band array is ONE parsed text (round 13): the per-band
    # Column loop cost ~4 py4j round-trips per band; identical structs.
    band_array = ", ".join(
        f"named_struct('band', {bi}, 'bucket', {bucket_key_sql(bi)})"
        for bi in range(bands)
    )
    band_rows = tracked_local_checkpoint(
        sig.select(
            "id", F.explode(F.expr(f"array({band_array})")).alias("bb")
        ).select("id", "bb.band", "bb.bucket")
    )
    left = band_rows.alias("a")
    right = band_rows.alias("b")
    from ..storage import propagate_checkpoint_ids

    out = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return propagate_checkpoint_ids(out, band_rows)


# ----------------------------------------------------------------- SimHash
def _sig_from_bit_counts(n_sql: str, bits: int = 64) -> Column:
    """OR together the per-bit majority masks given columns b0..b{bits-1}
    and shingle count ``n_sql`` (ties → bit set, matching the ≥ vote).

    One ``F.expr`` text (round-12, functions/exprs.py) instead of ~8
    py4j calls per bit: the same left-associated bitwise-OR chain over
    the same CASE masks — exact integer arithmetic, identical values.
    ``shiftleft(1L, i)`` replaces the python-side mask literal (for
    i = 63 both are the sign bit, −2⁶³)."""
    terms = [
        f"(case when b{i} * 2 >= {n_sql} "
        f"then shiftleft(cast(1 as bigint), {i}) "
        "else cast(0 as bigint) end)"
        for i in range(bits)
    ]
    return F.expr("cast(0 as bigint) | " + " | ".join(terms))


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    hash_family: str = "xx",
) -> DataFrame:
    """(id, sig) 64-bit SimHash per document — per-shingle xxhash64,
    per-bit majority vote, reassembled into one long.

    Same distributed shape as MinHash: explode → one hash per shingle →
    64 plain integer SUM aggregates (whole-stage codegen, map-side partial
    aggregation; the shuffle carries 65 longs per doc). Earlier
    expression-tree formulations (64 unrolled array filters / a single
    HOF fold) ran 10-20× slower — higher-order array functions are
    interpreted per element, never codegen'd.

    Documents with no shingles (shorter than ``shingle_n`` words) get the
    all-ones signature, matching the ≥-tie vote on an empty set.

    ``hash_family="md5"`` uses the cross-engine 60-bit ``md5_long`` hash
    (so the signature is 60 bits and any md5-capable engine reproduces it
    exactly); the default xx family is the cheaper 64-bit scale path."""
    bits = 60 if hash_family == "md5" else 64
    sh = exploded_shingles(df, text_col, id_col, shingle_n)
    if hash_family == "md5":
        sh = sh.select("id", md5_long(F.col("g")).alias("h"))
    else:
        sh = sh.select("id", F.xxhash64("g").alias("h"))
    # ONE SQL-text struct aggregate (round 13, same rationale as
    # minhash_signatures): 65 aggregate columns parse and analyze once;
    # ``s.*`` restores the identical n/b0..b{bits-1} columns feeding the
    # same bit-OR reassembly.
    fields = ", ".join(
        ["count(1) as n"]
        + [
            f"sum(cast(shiftrightunsigned(h, {i}) & 1 as bigint)) as b{i}"
            for i in range(bits)
        ]
    )
    agg = (
        sh.groupBy("id")
        .agg(F.expr(f"struct({fields})").alias("s"))
        .select("id", "s.*")
    )
    sigs = agg.select("id", _sig_from_bit_counts("n", bits).alias("sig"))
    empty_sig = -1 if bits == 64 else (1 << bits) - 1
    # re-attach shingle-less docs (explode dropped them): empty vote → all ones
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(sigs, "id", "left").select(
        "id", F.coalesce("sig", F.lit(empty_sig).cast("long")).alias("sig")
    )


def simhash(text_col: str, shingle_n: int = 2) -> Column:
    """Column-expression SimHash (one fold over the hashed-shingle array).

    Convenience form for small/interactive frames; ``simhash_signatures``
    is the scale path (codegen'd aggregation instead of interpreted
    higher-order lambdas) and is what ``simhash_near_duplicates`` uses.
    Both compute the identical signature."""
    masks = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    grams = word_shingles(text_col, shingle_n)
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    n = F.size(hashes)
    zero64 = F.array_repeat(F.lit(0), 64)
    counts = F.aggregate(
        hashes,
        zero64,
        lambda acc, h: F.zip_with(
            acc, masks, lambda c, m: c + F.when(h.bitwiseAND(m) != 0, 1).otherwise(0)
        ),
    )
    sig_terms = F.zip_with(
        counts, masks, lambda c, m: F.when(c * 2 >= n, m).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(
        sig_terms, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
    hash_family: str = "xx",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on signature
    sub-blocks. Pigeonhole: splitting the signature's bits into
    ``max_hamming + 1`` blocks guarantees any pair within ``max_hamming``
    agrees on at least one whole block — the block join is lossless
    blocking, so the result equals the brute-force Hamming join (which is
    exactly how the DuckDB oracle verifies it, registry q33).

    (Trade-off at scale: larger ``max_hamming`` ⇒ narrower blocks ⇒ more
    random bucket collisions; keep max_hamming small for huge corpora.)

    ``hash_family="md5"`` blocks over the 60-bit cross-engine signature
    (``simhash_signatures`` md5 family) so any md5-capable engine
    reproduces pairs AND distances exactly; "xx" is the cheaper 64-bit
    production path.

    Returns (id_a, id_b, hamming).

    Storage note: building this frame eagerly checkpoints the blocked
    signature rows; the ids ride on the returned frame — call
    ``storage.release_checkpoint(result)`` when done (or
    ``DDFManager.release_storage()`` at a workload boundary).
    """
    bits = 60 if hash_family == "md5" else 64
    n_blocks = max_hamming + 1
    base, rem = divmod(bits, n_blocks)
    widths = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    starts = [sum(widths[:i]) for i in range(n_blocks)]
    sigs = simhash_signatures(df, text_col, id_col, shingle_n, hash_family)
    blocks = []
    for q, (start, width) in enumerate(zip(starts, widths)):
        piece = F.shiftrightunsigned("sig", start)
        if width < 64:
            piece = piece.bitwiseAND(F.lit((1 << width) - 1).cast("long"))
        blocks.append(F.struct(F.lit(q).alias("q"), piece.alias("qv")))
    from ..storage import tracked_local_checkpoint

    # same double-compute trap as the MinHash banding join: both sides
    # of the block self-join would re-run the 60/64-SUM signature
    # aggregation; materialize the O(blocks)-per-doc rows once
    quarters = tracked_local_checkpoint(
        sigs.select(
            "id", "sig", F.explode(F.array(*blocks)).alias("qq")
        ).select("id", "sig", "qq.q", "qq.qv")
    )
    a, b = quarters.alias("a"), quarters.alias("b")
    # hamming is computed in the join projection and filtered BEFORE the
    # distinct: the dedup shuffle then carries only surviving (id_a, id_b,
    # hamming) triples instead of every blocked candidate with both
    # 64-bit signatures (hamming is a function of the pair, so
    # distinct-after-filter equals filter-after-distinct)
    from ..storage import propagate_checkpoint_ids

    out = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q")) & (F.col("a.qv") == F.col("b.qv")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return propagate_checkpoint_ids(out, quarters)


# ------------------------------------------------- cluster formation (CC)
def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the
    cluster-formation step after any candidate-pair generator (exact /
    MinHash / SimHash / Jaccard): A~B and B~C put A,B,C in one cluster
    even when A,C never paired.

    Iterative min-label propagation: each round every node adopts the
    minimum label among itself and its neighbors; converges in
    O(graph diameter) rounds — near-dup clusters are shallow (pairs share
    content), so a handful of rounds suffices at any scale. Each round is
    one join + one groupBy; ``localCheckpoint`` truncates the lineage so
    plans don't grow with iterations. Returns (id, cluster) where cluster
    is the minimum member id — deterministic.

    Scale shape: the loop runs ONLY over edge-endpoint nodes (for
    near-dup graphs a small fraction of the corpus — candidates already
    survived LSH banding); isolated nodes join back with label = id in
    one final pass, so per-round cost tracks the candidate subgraph, not
    the corpus. Convergence is detected by the label sum (labels only
    ever decrease under min-propagation, so an unchanged DECIMAL(38,0)
    sum ⟺ a fixpoint). The sum rides the SAME job that materializes the
    round's checkpoint via ``observe()`` (CollectMetrics), so each round
    is exactly ONE Spark job — no separate convergence aggregation, and
    no initial-sum job either (round 0 always runs). On shallow near-dup
    graphs the loop is fixed-overhead-dominated; halving the job count
    measurably halves CC wall time at small SF and removes a per-round
    driver barrier at scale.
    """
    from ..storage import (
        observed_local_checkpoint,
        release_checkpoint,
        tracked_local_checkpoint,
    )

    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # materialize the loop-invariant edge set ONCE: every iteration joins
    # against it, and its upstream is typically an expensive candidate
    # pipeline (LSH + verification) that must not re-execute per round.
    # The edge COUNT rides the same job (observe) to gate the driver
    # fast path below — no extra count job.
    bidir, n_bidir = observed_local_checkpoint(
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ),
        "cc_edge_rows",
        F.count(F.lit(1)).alias("n"),
    )
    all_nodes = nodes.select(F.col(id_col).alias("id"))

    # DRIVER FAST PATH (round 13, guide §2.4/§3.1 — the same size-gated
    # reasoning as a broadcast join): when the verified edge set is tiny,
    # min-label propagation's per-round join+groupBy jobs are pure fixed
    # cost — a bounded collect + union-find on the driver produces the
    # IDENTICAL (id, cluster=min member id) labelling (min-label
    # propagation converges to the component minimum; union-find computes
    # it directly), returned as a VALUES LocalRelation so the final
    # isolated-node join broadcasts with zero extra jobs. Near-dup edge
    # sets are post-verification SURVIVORS — at any corpus scale the
    # threshold (env SPARK_GRAFT_CC_DRIVER_EDGES, default 4096 directed
    # edges ≈ 64 KB of longs) keeps the collect bounded; above it the
    # distributed loop below runs unchanged. Null endpoints (never
    # produced by the dedup generators, but possible via the public API)
    # fall back to the loop, whose join semantics drop them.
    max_driver_edges = int(os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "4096"))
    if n_bidir is not None and int(n_bidir) <= 2 * max_driver_edges:
        rows = bidir.collect()
        if not rows:
            release_checkpoint(bidir)
            # empty graph — every node is its own cluster (what the loop
            # returns after its two no-op rounds)
            return all_nodes.select("id", F.col("id").alias("cluster"))
        if all(r["src"] is not None and r["dst"] is not None for r in rows):
            id_ddl = bidir.schema["src"].dataType.simpleString()
            release_checkpoint(bidir)
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in rows:
                a, b = r["src"], r["dst"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
            comp_min: dict = {}
            for node in parent:
                root = find(node)
                cur = comp_min.get(root)
                if cur is None or node < cur:
                    comp_min[root] = node
            from .exprs import values_df

            lab = values_df(
                edges.sparkSession,
                [(node, comp_min[find(node)]) for node in parent],
                f"id {id_ddl}, label {id_ddl}",
            )
            return all_nodes.join(lab, "id", "left").select(
                "id", F.coalesce("label", "id").alias("cluster")
            )
        # null endpoints: fall through to the loop (bidir still live)
    edge_nodes = (
        bidir.select(F.col("src").alias("id"))
        .unionByName(bidir.select(F.col("dst").alias("id")))
        .distinct()
    )
    # labels₀ stays LAZY: round 0's checkpoint computes the distinct from
    # the in-memory bidir blocks (both uses inside one job share the
    # exchange), so no separate materialization job is spent on it
    labels = edge_nodes.select("id", F.col("id").alias("label"))
    prev_sum: object = object()  # sentinel ≠ any sum incl. None (empty graph)
    for _ in range(max_iter):
        neighbor_labels = (
            bidir.join(labels, bidir.dst == labels.id)
            .select(F.col("src").alias("id"), "label")
        )
        new_labels, cur_sum = observed_local_checkpoint(
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label")),
            "cc_label_sum",
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
        )
        # iteration i's blocks die the moment i+1 is materialized —
        # the loop holds at most two label generations in storage
        release_checkpoint(labels)
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # the edge set is loop-only — the returned frame joins labels to the
    # UNCHECKPOINTED nodes side, so bidir's blocks are dead here
    release_checkpoint(bidir)
    from ..storage import propagate_checkpoint_ids

    # isolated nodes (never in any edge) are their own cluster; the
    # result executes through the final labels checkpoint, so its ids
    # ride along for an exact release_checkpoint(result)
    return propagate_checkpoint_ids(
        all_nodes.join(labels, "id", "left").select(
            "id", F.coalesce("label", "id").alias("cluster")
        ),
        labels,
    )
