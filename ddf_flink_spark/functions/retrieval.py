"""Lexical retrieval: inverted-index BM25 scoring over the corpus.

The retrieval-side companion to the embedding ANN family
(functions/similarity.py): rank documents for a bag-of-terms query with
Okapi BM25 [Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond"] —

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                  (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)

Scale shape: document length comes from ``size(split(...))`` — a
map-only expression, no explode for the length pass; only the QUERY
TERMS' postings are exploded and shuffled (filter before the explode's
groupBy, so the inverted index materializes for |q| terms, not the
vocabulary); df and the (N, total_tokens) corpus scalars are tiny
aggregates broadcast back into the scoring join; the final top-k is a
TakeOrdered heap, never a global sort. At 100 TB the shuffled volume is
the query-term postings only — the same bound a search engine's posting
lists give.

Cross-engine determinism: per-(doc, term) partial scores are rounded to
6 digits and summed in DECIMAL(18,6) (exact, order-independent), the
q162 discipline, so libm ``ln`` ulp noise and float summation order
cannot flip the hash; the final score rounds to 4.

Reference parity: the reference's only text surface is LIKE/grep
(refused at that — ``TableHandler.scala``); retrieval is an extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bm25_topk",
    "hash_chunk_embeddings",
    "maxsim_topk",
    "maxsim_ivf_topk",
    "build_chunk_index",
    "maxsim_persisted_topk",
    "build_chunk_pq_index",
    "maxsim_adc_topk",
    "maxsim_adc_rerank_topk",
]


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """Top-k (doc_id, bm25) for a bag-of-terms query. Ties broken by
    doc id so the selected rows are engine-independent."""
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    toks = F.split(F.lower(F.col(text_col)), " ")
    dl = df.select(F.col(id_col).alias("id"), F.size(toks).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    norm_len = 1 - b + b * F.col("dl") * F.col("n_docs") / F.col("total_tokens")
    partial = F.round(
        idf * F.col("tf") * (k1 + 1) / (F.col("tf") + k1 * norm_len), 6
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(totals))
        .withColumn("s", partial.cast("decimal(18,6)"))
        .groupBy(F.col("id").alias(id_col))
        .agg(F.round(F.sum("s").cast("double"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(topk)
    )


def hash_chunk_embeddings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
    dim: int = 16,
) -> DataFrame:
    """Per-chunk FEATURE-HASHED embeddings (Weinberger et al. 2009,
    "Feature Hashing for Large Scale Multitask Learning"): split each
    document into :func:`~.text.token_chunks` windows, then embed every
    chunk as the SIGNED token-count projection e_d = Σ_tokens
    (±1 per bit d of md5_long(token)) — exact BIGINT sums, so the
    embedding is engine-independent (DuckDB replays it verbatim) and
    the norms/dots downstream are integer arithmetic until one final
    sqrt/divide. In production the chunk encoder is a model
    (mapInPandas over a batch scorer — q43's plumbing); feature hashing
    keeps the RETRIEVAL maths oracle-checkable with the same shapes.

    SHUFFLE-FREE: every chunk's embedding is computed inside its own
    document's row — the window starts are a ``sequence``, each window's
    token hashes a ``transform`` over a ``slice``, each component an
    ``aggregate`` fold — then one ``posexplode`` emits a row per chunk.
    A pure map with row expansion, no groupBy: the earlier formulation
    exploded token occurrences and shuffled them back, paying a
    corpus-tokens-sized exchange that this shape never creates. Being a
    stateless map is also what lets the SAME expression run on a
    Structured Streaming frame (q264's chunk-ingest). Returns
    (id, chunk_id, e0..e{dim-1}, n2) where n2 is the exact squared
    norm."""
    # Two Generate stages so each token hashes EXACTLY ONCE and the
    # component sums materialize EXACTLY ONCE. Both matter:
    # * posexplode materializes the per-chunk hash array (hvs) as a
    #   physical column — folding over an inline subexpression instead
    #   would re-run the interpreted md5 transform once PER COMPONENT
    #   (no CSE across higher-order lambdas; measured 16× the CPU);
    # * inline(array(struct(e0..e15))) materializes the dim folds behind
    #   a second Generate. Left as Project expressions, Catalyst's
    #   CollapseProject substitutes each fold into EVERY downstream
    #   reference (n2, dots, cosines…), growing the expression tree
    #   multiplicatively per projection level — observed as a
    #   plan-time driver OOM at sf0.1. Generate is a collapse barrier,
    #   shuffle-free, and legal on streaming frames (q264).
    #
    # Round-12: the expressions are emitted as SQL text (one F.expr
    # parse apiece) instead of per-node Column-API calls — the Column
    # form cost one synchronous py4j round-trip per node and dominated
    # the chunk-path constructions (functions/exprs.py rationale). The
    # parsed trees are the same operators in the same order, so every
    # hash, fold and sum is bit-identical (integer arithmetic
    # throughout; pinned by the unchanged q257/q263/q275-q277 oracles).
    #
    # Round-12 (opt): SWAR bit-packed folds. e_d = Σ(2·bit_d(h) − 1)
    # = 2·Σbit_d(h) − size(hvs), and the 16 per-bit counts fit in TWO
    # 64-bit accumulators of eight 8-bit fields (a chunk holds ≤ `size`
    # ≤ 255 tokens, so no field can carry into its neighbour and the
    # top field never reaches the sign bit). The interpreted HOF
    # traverses each chunk's hash array 2× instead of 16×; the per-bit
    # counts come back out with shift/mask and the SAME integers e_d
    # are reassembled exactly (all BIGINT arithmetic, no rounding
    # anywhere — bit-parity pinned by
    # test_hash_chunk_embeddings_swar_matches_per_component_folds and
    # the unchanged q257/q263/q265/q275-q277 oracles). The middle
    # inline() materializes a0/a1/n behind a Generate so the two folds
    # run once each — left as Project expressions, CollapseProject
    # would substitute (and re-run) each fold into all 8 of its e_d
    # consumers.
    if size > 255:  # pragma: no cover — 8-bit SWAR fields would carry
        raise ValueError("hash_chunk_embeddings: size must be <= 255")
    if dim > 16:  # pragma: no cover — a0/a1 hold 16 per-bit counters
        raise ValueError("hash_chunk_embeddings: dim must be <= 16")
    toks = f"split(`{text_col}`, ' ')"
    starts = f"sequence(1, greatest(size({toks}) - {size} + {stride}, 1), {stride})"
    hv_t = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.expr(
                f"transform({starts}, s -> transform(slice({toks}, s, {size}), "
                f"t -> {hv_t}))"
            )
        ).alias("chunk_id", "hvs"),
    )

    def packed(base):
        terms = " + ".join(
            f"shiftleft(shiftright(h, {base + j}) & 1, {8 * j})"
            for j in range(min(8, dim - base))
        )
        return f"aggregate(hvs, cast(0 as bigint), (acc, h) -> acc + ({terms}))"

    accs = [f"'a0', {packed(0)}"]
    if dim > 8:
        accs.append(f"'a1', {packed(8)}")
    accs.append("'n', cast(size(hvs) as bigint)")
    acc_fields = ", ".join(accs)
    packed_df = hashed.select(
        "id",
        "chunk_id",
        F.inline(F.expr(f"array(named_struct({acc_fields}))")),
    )

    def comp(d):
        acc = "a0" if d < 8 else "a1"
        return f"cast(2 * (shiftright({acc}, {8 * (d % 8)}) & 255) - n as bigint)"

    fields = ", ".join(f"'e{d}', {comp(d)}" for d in range(dim))
    emb = packed_df.select(
        "id",
        "chunk_id",
        F.inline(F.expr(f"array(named_struct({fields}))")),
    )
    n2 = " + ".join(f"e{d} * e{d}" for d in range(dim))
    return emb.withColumn("n2", F.expr(f"cast({n2} as bigint)"))


def maxsim_topk(
    queries: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    size: int = 64,
    stride: int = 48,
    dim: int = 16,
) -> DataFrame:
    """CHUNK-LEVEL LATE-INTERACTION RETRIEVAL (the MaxSim shape of
    Khattab & Zaharia 2020, ColBERT §3.1, one vector per query): rank
    corpus documents by max over the document's CHUNKS of
    cosine(query, chunk) — the passage-retrieval scoring RAG pipelines
    run, where a long document matches if its BEST passage matches,
    not its average. Query docs are embedded whole (one hashed vector
    each); corpus docs are chunked (:func:`hash_chunk_embeddings`).

    Scale shape: the Q query vectors broadcast into one pass over the
    chunk-embedding frame (pair work is Q × chunks × O(dim), map-side);
    the per-doc MAX is a partial-aggregating groupBy and the per-query
    top-k a window rank — no global sort, no driver loop. Cosine =
    round(int_dot / sqrt(int_norm², ...), 6): exact integers until one
    sqrt + one divide on identical operands, so DuckDB replays every
    score bit-for-bit (q40's rounding discipline). Zero-norm chunks or
    queries are excluded BEFORE the divide (ANSI-safe). Self-pairs are
    excluded. Returns (query_id, doc_id, maxsim): the ROUND-6 max itself
    — bit-identical across engines, so no second rounding (a round-4 of
    a round-6 value double-rounds at 4-decimal midpoints), per-query
    rank ≤ k by (maxsim DESC, doc_id)."""
    from .dedup import ensure_compute_parallelism, md5_long

    # decouple chunk-hashing parallelism from the corpus FILE layout
    # (one parquet file would otherwise serialize the whole Generate
    # chain onto one task — the round-6 explode-parallelism lesson).
    # CONDITIONAL (dedup.py's doubly-guarded helper), never a blanket
    # repartition: at real scale the corpus arrives in thousands of
    # splits and an unconditional repartition would both pay a full
    # exchange of raw text AND COLLAPSE the compute-dense chunk-hashing
    # pass down to defaultParallelism tasks (round-8 verdict). The byte
    # threshold is lowered to match this consumer's density: dim md5
    # folds per token across overlapping windows break even far below
    # the shingle-explode default.
    corpus = ensure_compute_parallelism(corpus, min_bytes=256 * 1024)
    c_emb = hash_chunk_embeddings(
        corpus, text_col, id_col, size=size, stride=stride, dim=dim
    )
    qtok = queries.select(
        F.col(id_col).alias("qid"), F.explode(F.split(text_col, " ")).alias("t")
    ).withColumn("hv", md5_long("t"))
    # SQL-text construction (round-12, see functions/exprs.py): same
    # integer expressions as the Column-API loops they replace.
    qsums = [
        F.expr(
            f"sum(cast((((shiftright(hv, {d}) & 1) * 2) - 1) as bigint))"
        ).alias(f"q{d}")
        for d in range(dim)
    ]
    q_emb = qtok.groupBy("qid").agg(*qsums)
    qn2_sql = " + ".join(f"q{d} * q{d}" for d in range(dim))
    q_emb = q_emb.withColumn("qn2", F.expr(f"cast({qn2_sql} as bigint)"))

    dot = F.expr(" + ".join(f"e{d} * q{d}" for d in range(dim)))
    pairs = (
        c_emb.join(F.broadcast(q_emb), F.col("id") != F.col("qid"))
        .filter((F.col("n2") > 0) & (F.col("qn2") > 0))
        .select(
            "qid",
            "id",
            F.round(
                dot.cast("double")
                / F.sqrt((F.col("n2") * F.col("qn2")).cast("double")),
                6,
            ).alias("cos"),
        )
    )
    ms = pairs.groupBy("qid", "id").agg(F.max("cos").alias("m"))
    wnd = Window.partitionBy("qid").orderBy(F.desc("m"), "id")
    return (
        ms.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("id").alias("doc_id"),
            F.col("m").alias("maxsim"),
        )
    )


def _query_embeddings(
    queries: DataFrame, text_col: str, id_col: str, dim: int
) -> DataFrame:
    """Whole-document feature-hashed query embeddings: (qid, q0..q{dim-1},
    qn2) — the query side of every MaxSim variant (exact BIGINT sums,
    one row per query, broadcast downstream)."""
    from .dedup import md5_long

    qtok = queries.select(
        F.col(id_col).alias("qid"), F.explode(F.split(text_col, " ")).alias("t")
    ).withColumn("hv", md5_long("t"))
    # SQL-text construction (round-12, see functions/exprs.py): same
    # integer expressions as the Column-API loops they replace.
    qsums = [
        F.expr(
            f"sum(cast((((shiftright(hv, {d}) & 1) * 2) - 1) as bigint))"
        ).alias(f"q{d}")
        for d in range(dim)
    ]
    q_emb = qtok.groupBy("qid").agg(*qsums)
    qn2_sql = " + ".join(f"q{d} * q{d}" for d in range(dim))
    return q_emb.withColumn("qn2", F.expr(f"cast({qn2_sql} as bigint)"))


def build_chunk_index(
    corpus: DataFrame,
    base: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_lists: int = 8,
    size: int = 64,
    stride: int = 48,
    dim: int = 16,
) -> list:
    """BUILD LEG of the chunk-level MaxSim lifecycle (the q258/q259
    discipline applied to the retrieval corpus — round-8 verdict #1):
    chunk + feature-hash the corpus (:func:`hash_chunk_embeddings`,
    shuffle-free), train the chunk coarse quantizer (deterministic
    Lloyd over the chunk vectors, the q39 discipline), assign every
    chunk its cell, and PERSIST the layout via
    :func:`~.index_store.persist_chunk_index` — chunk rows partitioned
    by ``list_id`` + the coarse sidecar. Returns the coarse centroids.

    The embedding pipeline executes ONCE: the chunk frame is
    checkpointed before training, Lloyd's iterations and the persist
    write both read the checkpoint. Cell assignment uses
    ``argmin_pos`` against the FINAL centroids — bit-equal to the
    training assignment (final Lloyd assignment is defined against the
    final centroids), and the exact expression q264's streaming ingest
    files new arrivals with, so batch build and stream ingest produce
    one consistent index. At 100 TB this is the offline job a
    deployment schedules; the serve path never re-trains."""
    from ..ml.kmeans import kmeans_lloyd
    from ..storage import release_checkpoint, tracked_local_checkpoint
    from .dedup import ensure_compute_parallelism
    from .index_store import persist_chunk_index
    from .similarity import argmin_pos

    corpus = ensure_compute_parallelism(corpus, min_bytes=256 * 1024)
    c_emb = hash_chunk_embeddings(
        corpus, text_col, id_col, size=size, stride=stride, dim=dim
    )
    chv = tracked_local_checkpoint(
        c_emb.select(
            (F.col("id") * 1000000 + F.col("chunk_id")).alias("ck"),
            F.col("id").alias("doc"),
            *[F.col(f"e{d}") for d in range(dim)],
            "n2",
            F.expr("array(" + ", ".join(f"cast(e{d} as double)" for d in range(dim)) + ")").alias(
                "v"
            ),
        )
    )
    trained, cents = kmeans_lloyd(
        chv,
        "v",
        "ck",
        k=n_lists,
        iters=2,
        return_centroids=True,
        # chv is the checkpoint above — skip the trainer's second copy
        assume_materialized=True,
    )
    release_checkpoint(trained)  # membership re-derives from the centroids
    idx = chv.withColumn(
        "list_id", argmin_pos("v", cents).cast("int")
    ).drop("v")
    persist_chunk_index(idx, cents, base)
    release_checkpoint(chv)
    return cents


def _probe_frame(q_emb: DataFrame, coarse: list, nprobe: int) -> DataFrame:
    """Per-query probe frontier: rank the coarse centroids (model
    literals — a map over the query frame, no shuffle) and explode the
    top ``nprobe`` cell ids. Shared by the persisted serve path and
    :func:`chunk_probe_cells`, so any consumer computes the exact same
    frontier (round-6 negated dot, cell-id tiebreak)."""
    from .exprs import probe_sql

    return q_emb.select(
        "qid",
        "qv",
        "qn2",
        F.explode(
            F.expr(f"{probe_sql(coarse, 'qv', nprobe)}.list_id")
        ).alias("list_id"),
    )


def chunk_probe_cells(
    queries: DataFrame,
    coarse: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    nprobe: int = 3,
    dim: int = 16,
) -> "list[int]":
    """The batch's DISTINCT probe frontier as plain ints (bounded
    collect: ≤ Q·nprobe) — computed BEFORE any chunk-table read, so a
    manifest-backed chunk index can be opened with
    ``snapshot_read(parts=cells)`` and the probe is pruned at the
    MANIFEST (no directory listing, no partition filter needed in the
    plan): the two-phase serve q290 runs. Identical frontier maths to
    :func:`maxsim_persisted_topk`'s ``static_probe``."""
    q_emb = _query_embeddings(queries, text_col, id_col, dim).select(
        "qid",
        F.expr("array(" + ", ".join(f"cast(q{d} as double)" for d in range(dim)) + ")").alias("qv"),
        "qn2",
    )
    probe = _probe_frame(q_emb, coarse, nprobe)
    return sorted(
        {int(r["list_id"]) for r in probe.select("list_id").distinct().collect()}
    )


def maxsim_persisted_topk(
    queries: DataFrame,
    chunks: DataFrame,
    coarse: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    nprobe: int = 3,
    dim: int = 16,
    static_probe: bool = False,
    exclude_self: bool = True,
) -> DataFrame:
    """SERVE LEG of the chunk-level MaxSim lifecycle: rank documents
    for Q queries against a PERSISTED chunk index
    (:func:`~.index_store.load_chunk_index` output — tombstoned
    documents already anti-joined out), in ONE lazy plan. No training,
    no corpus embedding: the per-query work is ranking the coarse
    centroids (model literals, a map), probing ``nprobe`` cells, exact
    integer cosines over candidate chunks, per-doc MAX, window top-k —
    identical maths to :func:`maxsim_ivf_topk`'s serve tail, so a
    persisted-reload serve is bit-equal to the fused build+serve
    (q266's oracle is q263's replay).

    ``static_probe=True`` collects the batch's distinct probe frontier
    (≤ Q·nprobe ints — the one bounded driver action) and pushes it as
    a literal ``list_id IN (...)`` filter so the list_id-partitioned
    chunk parquet is read PARTITION-PRUNED (PartitionFilters —
    plan-locked in tests); the default join path stays fully lazy for
    large Q. ``exclude_self`` drops corpus docs whose id equals the
    query id (the self-query shape); pass False for external query
    ids."""
    q_emb = _query_embeddings(queries, text_col, id_col, dim)
    q_emb = q_emb.select(
        "qid",
        F.expr("array(" + ", ".join(f"cast(q{d} as double)" for d in range(dim)) + ")").alias("qv"),
        "qn2",
    )
    probe = _probe_frame(q_emb, coarse, nprobe)
    idx = chunks
    if static_probe:
        cells = sorted(
            {
                int(r["list_id"])
                for r in probe.select("list_id").distinct().collect()
            }  # bounded: ≤ Q·nprobe ints
        )
        idx = chunks.filter(F.col("list_id").isin(cells))
    cand = probe.join(idx, "list_id")
    if exclude_self:
        cand = cand.filter(F.col("doc") != F.col("qid"))
    dot = None
    for d in range(dim):
        term = F.col(f"e{d}") * F.element_at("qv", d + 1)
        dot = term if dot is None else dot + term
    pairs = cand.filter((F.col("n2") > 0) & (F.col("qn2") > 0)).select(
        "qid",
        "doc",
        F.round(
            dot / F.sqrt((F.col("n2") * F.col("qn2")).cast("double")),
            6,
        ).alias("cos"),
    )
    ms = pairs.groupBy("qid", "doc").agg(F.max("cos").alias("m"))
    wnd = Window.partitionBy("qid").orderBy(F.desc("m"), "doc")
    return (
        ms.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("doc").alias("doc_id"),
            F.col("m").alias("maxsim"),
        )
    )


def maxsim_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 3,
    size: int = 64,
    stride: int = 48,
    dim: int = 16,
) -> DataFrame:
    """IVF-PRUNED MaxSim — :func:`maxsim_topk`'s scale path: instead of
    scoring every (query, chunk) pair, the CHUNK embeddings are coarse-
    quantized (deterministic Lloyd over chunk vectors, exactly the q39
    IVF discipline) and each query scores only the chunks in its
    ``nprobe`` nearest cells; the per-doc MAX and per-query top-k then
    run over candidates alone. At 100 TB the chunk table is the big
    side (every doc × every window) — the probe bounds pair work to
    ~nprobe/n_lists of it, the same economics IVF gives whole-doc ANN,
    and the chunk-cell assignment persists/partitions exactly like the
    q245 codes layout. Recall loss is the standard IVF trade: a doc is
    found if its BEST-matching chunk lands in a probed cell (per-chunk
    probing preserves the late-interaction property that only the best
    passage must match).

    All arithmetic stays cross-engine exact: chunk/query vectors are
    integer-valued (feature hashing), so dots and norms are exact BIGINT
    sums even as doubles; centroid means are round-4; probe and cosine
    ranks are round-6 (q40/q39 disciplines). Chunk key = id·10⁶ +
    chunk_id (window index) keeps the Lloyd seed order engine-
    independent. Returns (query_id, doc_id, maxsim) — the round-6
    max itself (see :func:`maxsim_topk` on why there is no second
    rounding)."""
    from ..ml.kmeans import kmeans_lloyd
    from .dedup import ensure_compute_parallelism, md5_long
    from .similarity import dot as _dot

    # see maxsim_topk: parallelize chunk hashing past the file layout —
    # conditionally, so an already-parallel corpus pays no exchange
    corpus = ensure_compute_parallelism(corpus, min_bytes=256 * 1024)
    c_emb = hash_chunk_embeddings(
        corpus, text_col, id_col, size=size, stride=stride, dim=dim
    )
    # checkpoint the chunk frame ONCE (round 12): both the Lloyd
    # training AND the candidate join read it. Unchecked, the trainer
    # made its own internal copy but the ``idx`` join still re-ran the
    # whole embedding pass a second time (guide §1.2 — the q263 serve
    # stage was paying a full duplicate chunk-hash); now embed once,
    # train over the checkpoint (assume_materialized skips the
    # trainer's copy), join against the same blocks.
    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    chv = tracked_local_checkpoint(
        c_emb.select(
            (F.col("id") * 1000000 + F.col("chunk_id")).alias("ck"),
            F.col("id").alias("doc"),
            F.expr("array(" + ", ".join(f"cast(e{d} as double)" for d in range(dim)) + ")").alias("v"),
            "n2",
        )
    )
    _, cents = kmeans_lloyd(
        chv, "v", "ck", k=n_lists, iters=2, return_centroids=True,
        assume_materialized=True,
    )
    # cell membership re-derives per row from the FINAL centroids —
    # bit-equal to the final Lloyd assignment (build_chunk_index's
    # established rule, pinned by the q264 stream-ingest consistency
    # oracle). Round 12: the previous ``chv.join(assigned, "ck")``
    # shuffled the full chunk frame AND the assignment map through an
    # id-equi join just to attach a column this map computes in place
    # (guide §2.4 — the assignment was being executed either way as
    # the join's build side).
    from .similarity import argmin_pos

    idx = chv.withColumn("list_id", argmin_pos("v", cents).cast("int"))

    q_emb = _query_embeddings(queries, text_col, id_col, dim).select(
        "qid",
        F.expr("array(" + ", ".join(f"cast(q{d} as double)" for d in range(dim)) + ")").alias("qv"),
        "qn2",
    )
    probe = _probe_frame(q_emb, cents, nprobe)
    cand = probe.join(idx, "list_id").filter(F.col("doc") != F.col("qid"))
    pairs = cand.filter((F.col("n2") > 0) & (F.col("qn2") > 0)).select(
        "qid",
        "doc",
        F.round(
            _dot(F.col("qv"), F.col("v"))
            / F.sqrt((F.col("n2") * F.col("qn2")).cast("double")),
            6,
        ).alias("cos"),
    )
    ms = pairs.groupBy("qid", "doc").agg(F.max("cos").alias("m"))
    wnd = Window.partitionBy("qid").orderBy(F.desc("m"), "doc")
    return propagate_checkpoint_ids(
        ms.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("doc").alias("doc_id"),
            F.col("m").alias("maxsim"),
        ),
        chv,
    )


def build_chunk_pq_index(
    corpus: DataFrame,
    base: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_lists: int = 8,
    m: int = 4,
    k: int = 4,
    size: int = 64,
    stride: int = 48,
    dim: int = 16,
) -> "tuple[list, list]":
    """PQ-COMPRESSED chunk index — the storage story that makes a
    100 TB chunk table servable: :func:`build_chunk_index` persists the
    raw integer components (dim longs per chunk); THIS build quantizes
    them through the residual-IVFADC machinery (coarse cell + per-
    subspace PQ codes over the residual, ``ivfadc_index_build`` applied
    verbatim to the CHUNK vectors keyed by ck) and persists only
    (ck, doc, code0..code{m-1}, n2) — m small ints plus the EXACT
    squared norm — in the standard q245 layout (codes partitioned by
    list_id + coarse/codebook sidecars), so the whole persisted-index
    lifecycle (delete/compact/rebalance/split, q255/q269) applies to
    the chunk family's compressed form unchanged. Keeping the exact
    ``n2`` is what lets the ADC serve (:func:`maxsim_adc_topk`) form a
    cosine whose DENOMINATOR is exact — only the dot is quantized.
    Returns ``(coarse, codebooks)``."""
    from ..storage import release_checkpoint, tracked_local_checkpoint
    from .dedup import ensure_compute_parallelism
    from .index_store import persist_index
    from .similarity import ivfadc_index_build

    corpus = ensure_compute_parallelism(corpus, min_bytes=256 * 1024)
    c_emb = hash_chunk_embeddings(
        corpus, text_col, id_col, size=size, stride=stride, dim=dim
    )
    chv = tracked_local_checkpoint(
        c_emb.select(
            (F.col("id") * 1000000 + F.col("chunk_id")).alias("ck"),
            F.col("id").alias("doc"),
            "n2",
            F.expr("array(" + ", ".join(f"cast(e{d} as double)" for d in range(dim)) + ")").alias(
                "v"
            ),
        )
    )
    # exact_means: chunk residual codebook means use the order-
    # independent round-6 DECIMAL-sum form — shuffle-partitioning must
    # not change the persisted model (see _train_pq_codebooks)
    index, coarse, cents = ivfadc_index_build(
        chv,
        "v",
        "ck",
        n_lists=n_lists,
        m=m,
        k=k,
        iters=2,
        exact_means=True,
        # chv is the checkpoint above — skip the builder's second copy
        # of the vectors and its dim-probe job (dim is a build param)
        assume_materialized=True,
        dim=dim,
        # (doc, n2) ride the builder's residual checkpoint onto the
        # index (round 12) — the previous ``index.join(chv, "id")``
        # re-shuffled the full chunk frame solely to re-attach two
        # columns the build's own input carried (guide §2.4/§8)
        carry_cols=("doc", "n2"),
    )
    persist_index(index, coarse, cents, base)
    release_checkpoint(index)
    release_checkpoint(chv)
    return coarse, cents


def maxsim_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    coarse: list,
    codebooks: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    nprobe: int = 3,
    dim: int = 16,
    static_probe: bool = False,
    exclude_self: bool = True,
) -> DataFrame:
    """ASYMMETRIC-DISTANCE MaxSim — late-interaction retrieval served
    entirely from the PQ-COMPRESSED chunk index
    (:func:`build_chunk_pq_index`'s layout): the corpus side never
    materializes a vector. Per chunk, the reconstruction
    ĉ = coarse[cell] + r̂ gives

        dot(q, ĉ) = dot(q, coarse[cell]) + Σ_j dot(q_j, codebook_j[code_j])

    — the first term is one value per (query, probed cell), the second
    is an m-lookup into a (query × m·k)-row DOT-PRODUCT LUT (simpler
    than L2-ADC: no per-cell query residual). Both terms are round-6
    values summed in DECIMAL(18,6) (exact, order-independent), and the
    cosine divides by sqrt(n2·qn2) with the EXACT stored norms — only
    the numerator is quantized, so the approximation error is purely
    the PQ reconstruction of the dot. Scores are deterministic and the
    oracle replays them bit-for-bit (q276). Per-doc MAX + window top-k
    as in every MaxSim variant; ``static_probe`` partition-prunes the
    codes scan. At 100 TB the probe touches nprobe/n_lists of a codes
    table that is ~dim·8/m bytes-per-chunk SMALLER than the raw index
    — the Jégou et al. 2011 memory economics applied to passages."""
    from .similarity import dot as _dot

    spark = codes.sparkSession
    m = len(codebooks)
    w = len(codebooks[0][0])
    q_emb = _query_embeddings(queries, text_col, id_col, dim)
    q_emb = q_emb.select(
        "qid",
        F.expr("array(" + ", ".join(f"cast(q{d} as double)" for d in range(dim)) + ")").alias("qv"),
        "qn2",
    )
    from .exprs import darray2, dot_sql

    cents_sql = darray2(coarse)
    probe = _probe_frame(q_emb, coarse, nprobe).withColumn(
        "qcdot",
        F.expr(
            f"cast(round({dot_sql('qv', f'element_at({cents_sql}, list_id + 1)')}, 6) "
            "as decimal(18,6))"
        ),
    )
    n_codes = len(codebooks[0])
    # Round-13 (guide §2.4 / §3.3): the dot-product LUT is a PURE
    # PROJECTION on the probe frame — one array of m·k round-6 DECIMAL
    # dots per probe row, each dot the exact fold the former
    # (qid, j, code)-keyed LUT frame computed (codebooks are model
    # literals, so no crossJoin frame, no per-(qid,j,code) equi-join,
    # and — because each chunk can now INDEX the array with its own
    # code columns — no m-way posexplode of the candidate rows and no
    # re-grouping exchange to undo it). The former shape multiplied
    # every candidate chunk row m× and paid a groupBy exchange purely
    # to reassemble values that one projection indexes in place.
    cb_flat = darray2(
        [[float(x) for x in codebooks[j][c]] for j in range(m) for c in range(n_codes)]
    )
    lut_dot = dot_sql(
        f"slice(qv, (i div {n_codes}) * {w} + 1, {w})",
        f"element_at({cb_flat}, i + 1)",
    )
    luts_sql = (
        f"transform(sequence(0, {m * n_codes - 1}), "
        f"i -> cast(round({lut_dot}, 6) as decimal(18,6)))"
    )
    idx = codes
    if static_probe:
        cells = sorted(
            {
                int(r["list_id"])
                for r in probe.select("list_id").distinct().collect()
            }  # bounded: ≤ Q·nprobe ints
        )
        idx = codes.filter(F.col("list_id").isin(cells))
    # The probe side (Q·nprobe rows + their LUT arrays) is the BUILD
    # side of an explicit broadcast join: the codes table is never
    # shuffled (the 100 TB economics), and the broadcast exchange
    # materializes the luts projection once per probe row, so the m
    # element_at consumers below index a physical column instead of
    # re-running the transform per reference.
    probe = probe.withColumn("luts", F.expr(luts_sql))
    cand = F.broadcast(probe).join(idx.withColumnRenamed("id", "ck"), "list_id")
    if exclude_self:
        cand = cand.filter(F.col("doc") != F.col("qid"))
    cand = cand.filter((F.col("n2") > 0) & (F.col("qn2") > 0))
    # sr = Σ_j lut[j][code_j] as one DECIMAL addition chain — decimal
    # addition is exact, so the chain equals the former F.sum over the
    # joined LUT rows bit-for-bit (same round-6 decimal terms)
    sr_sql = " + ".join(
        f"element_at(luts, {j * n_codes} + code{j} + 1)" for j in range(m)
    )
    per_chunk = cand.select(
        "qid",
        "doc",
        F.round(
            F.expr(f"cast(qcdot + {sr_sql} as double)")
            / F.sqrt((F.col("n2") * F.col("qn2")).cast("double")),
            6,
        ).alias("acos"),
    )
    ms = per_chunk.groupBy("qid", "doc").agg(F.max("acos").alias("m"))
    wnd = Window.partitionBy("qid").orderBy(F.desc("m"), "doc")
    return (
        ms.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("doc").alias("doc_id"),
            F.col("m").alias("maxsim_adc"),
        )
    )


def maxsim_adc_rerank_topk(
    queries: DataFrame,
    codes: DataFrame,
    coarse: list,
    codebooks: list,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    shortlist: int = 20,
    nprobe: int = 3,
    size: int = 64,
    stride: int = 48,
    dim: int = 16,
) -> DataFrame:
    """TWO-STAGE MaxSim — q250's shortlist-then-exact-rerank pattern
    applied to late interaction, the production remedy for PQ
    reconstruction error: stage 1 runs :func:`maxsim_adc_topk` over the
    COMPRESSED index for a ``shortlist``-deep candidate list per query
    (memory-bounded: the corpus-wide pass touches only m-byte codes);
    stage 2 re-embeds ONLY the shortlisted documents' chunks (a
    semi-join — work ∝ Q·shortlist documents, never corpus) and ranks
    them with the EXACT integer cosine, final top-k. Results within the
    shortlist are bit-equal to brute MaxSim, so quality loss reduces to
    shortlist recall — the knob a deployment tunes with
    shortlist/nprobe (q274's measurement shape). Returns
    (query_id, doc_id, maxsim) with q257's exact scoring."""
    short = maxsim_adc_topk(
        queries,
        codes,
        coarse,
        codebooks,
        text_col,
        id_col,
        k=shortlist,
        nprobe=nprobe,
        dim=dim,
    ).select("query_id", "doc_id")
    sdocs = short.select(F.col("doc_id").alias(id_col)).distinct()
    sub = corpus.join(sdocs, id_col, "left_semi")
    c_emb = hash_chunk_embeddings(
        sub, text_col, id_col, size=size, stride=stride, dim=dim
    )
    q_emb = _query_embeddings(queries, text_col, id_col, dim)
    dot = F.expr(" + ".join(f"e{d} * q{d}" for d in range(dim)))
    pairs = (
        short.join(c_emb, short["doc_id"] == c_emb["id"])
        .join(F.broadcast(q_emb), short["query_id"] == q_emb["qid"])
        .filter((F.col("n2") > 0) & (F.col("qn2") > 0))
        .select(
            "qid",
            F.col("id").alias("doc"),
            F.round(
                dot.cast("double")
                / F.sqrt((F.col("n2") * F.col("qn2")).cast("double")),
                6,
            ).alias("cos"),
        )
    )
    ms = pairs.groupBy("qid", "doc").agg(F.max("cos").alias("m"))
    wnd = Window.partitionBy("qid").orderBy(F.desc("m"), "doc")
    return (
        ms.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("doc").alias("doc_id"),
            F.col("m").alias("maxsim"),
        )
    )
