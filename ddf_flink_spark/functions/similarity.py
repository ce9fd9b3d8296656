"""Similarity search over embedding columns (``array<float>``).

Extensions beyond the reference surface (SURVEY §7.2 step 9):

* **brute-force cosine top-k** — the exact baseline: query×corpus join,
  dot product as a single ``F.aggregate``/``zip_with`` expression
  (JVM-side — no Python in the pair loop; note higher-order array
  functions are INTERPRETED per element, not codegen'd, which is fine
  on the bounded candidate sets here), ranked per query. When candidate
  sets per query grow past ~10³, pass ``rerank="arrow"`` to score
  candidates in a vectorized Pandas UDF over numpy/BLAS instead.
* **random-hyperplane LSH** — the scale path: sign-bit signatures from
  deterministic pseudo-random hyperplanes (seeded, reproducible across
  runs and executors), candidates meet only within a signature bucket.
  At 1B vectors the bucket join touches ~n/2^bits of the pair space.
* **IVF (inverted file)** — k-means-style coarse quantizer (trained via
  ``pyspark.ml`` KMeans on a sample), probe the nearest ``nprobe``
  centroids only.

Vectors stay as ``array<float>`` columns; norms are precomputed once per
side (never inside the pair loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .exprs import darray2

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "brute_force_topk",
    "hyperplane_signature",
    "lsh_topk",
    "lsh_multiprobe_topk",
    "srp_lsh_topk_crossengine",
    "ivf_build",
    "ivf_topk",
    "quantize_embeddings",
    "pca_power_iteration",
    "pq_search",
    "ivfpq_search",
    "ivfadc_search",
    "ivfadc_batch_search",
    "ivfadc_index_build",
    "ivfadc_index_search",
    "ivfadc_encode",
    "ivfadc_encode_two_level",
    "ivfadc_rebalance",
    "ivfadc_split_cell",
    "argmin_pos",
]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns as one JVM expression (double acc)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _score_pairs(cand: DataFrame, rerank: str) -> DataFrame:
    """Candidate pairs (query_id, neighbor_id, qv, qn, cv, cn) → scored
    (query_id, neighbor_id, cos).

    ``rerank="jvm"`` (default): one ``zip_with``/``aggregate`` expression
    per pair — JVM-side but INTERPRETED per array element (higher-order
    functions don't enter whole-stage codegen), which is the right trade
    while candidate sets per query stay small (LSH buckets, IVF probe
    lists, bounded brute-force witnesses).

    ``rerank="arrow"``: dot products computed in a vectorized Pandas UDF
    over numpy (BLAS ``einsum`` on a stacked float64 matrix, one Arrow
    batch at a time) — the honest scale answer once candidate sets per
    query grow past ~10³, where per-element interpretation dominates.
    Callers project ``qv``/``cv`` as ``array<double>`` (cast once at
    projection, before any pair fan-out), so BOTH engines see identical
    float64 inputs and per-product values — float32 sources are upcast
    exactly, never multiplied in native width. The only remaining
    divergence is summation order (einsum pairwise vs sequential fold),
    which the round-6 rank discipline downstream absorbs."""
    if rerank == "arrow":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _cos_arrow(qv, cv, qn, cn):
            import numpy as _np
            import pandas as _pd

            a = _np.stack([_np.asarray(v, dtype=_np.float64) for v in qv])
            b = _np.stack([_np.asarray(v, dtype=_np.float64) for v in cv])
            s = _np.einsum("ij,ij->i", a, b)
            return _pd.Series(s / (qn.to_numpy() * cn.to_numpy()))

        score = _cos_arrow("qv", "cv", "qn", "cn")
    elif rerank == "jvm":
        score = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    else:
        raise ValueError(f"rerank must be 'jvm' or 'arrow', got {rerank!r}")
    return cand.select("query_id", "neighbor_id", score.alias("cos"))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_rank: bool = False,
    rerank: str = "jvm",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Norms are projected once per side before the join so the pair loop
    computes only the dot product (``rerank`` picks the scoring engine —
    see :func:`_score_pairs`). The per-query ranking is a window over
    the join output — with Q queries this is a Q-partition shuffle, the
    natural distribution. Self-matches (same id) are excluded.

    Returns (query_id, neighbor_id, cos) — plus the internal round-6
    rank as ``rn`` when ``keep_rank`` is set (rank consumers like RRF
    fusion must use THIS rank: the output ``cos`` is rounded to 4, so
    re-ranking on it would break ties differently than the 6-digit
    ranking that selected the top-k).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = _score_pairs(pairs, rerank)
    w = Window.partitionBy("query_id").orderBy(F.round("cos", 6).desc(), F.col("neighbor_id"))
    out_cols = ["query_id", "neighbor_id", F.round("cos", 4).alias("cos")]
    if keep_rank:
        out_cols.append(F.col("rn"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*out_cols)
    )


def _planes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (numpy PRNG, fixed seed) —
    identical on every executor because they ship as literals."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit i = sign(<v, plane_i>), packed into a long.
    One expression tree per vector — no UDF, no shuffle."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    rerank: str = "jvm",
) -> DataFrame:
    """Approximate top-k: candidates must share a full ``bits``-bit
    signature in at least one of ``tables`` independent hash tables, then
    exact cosine re-rank within candidates (``rerank`` picks the scoring
    engine — see :func:`_score_pairs`).

    Scale: each side computes ``tables`` signatures (map-only), the join
    key is (table, signature) — expected bucket size n/2^bits, so the pair
    space shrinks by ~2^bits per table.
    """
    sig_structs = []
    for ti in range(tables):
        planes = _planes(dim, bits, seed + ti)
        sig_structs.append(
            lambda col, p=planes, t=ti: F.struct(
                F.lit(t).alias("tbl"), hyperplane_signature(col, p).alias("sig")
            )
        )

    def with_sigs(df: DataFrame, idn: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(idn),
            F.col(vec_col).cast("array<double>").alias(f"{idn}_v"),
            l2_norm(F.col(vec_col)).alias(f"{idn}_n"),
            F.explode(F.array(*[s(F.col(vec_col)) for s in sig_structs])).alias("ts"),
        ).select(idn, f"{idn}_v", f"{idn}_n", "ts.tbl", "ts.sig")

    q = with_sigs(queries, "query_id")
    c = with_sigs(corpus, "neighbor_id")
    cand = (
        q.join(c, on=["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("query_id_v").alias("qv"),
            F.col("query_id_n").alias("qn"),
            F.col("neighbor_id_v").alias("cv"),
            F.col("neighbor_id_n").alias("cn"),
        )
        .distinct()
    )
    scored = _score_pairs(cand, rerank)
    w = Window.partitionBy("query_id").orderBy(F.round("cos", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"))
    )


def ivf_build(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    quantizer: str = "ml",
    iters: int = 2,
):
    """Train a coarse quantizer and assign every vector to its nearest
    centroid list. Returns (assigned_df, centroids) where assigned_df has
    an extra ``list_id`` column.

    ``quantizer="ml"`` (default) trains pyspark.ml KMeans (k-means||
    init — the engine-native quality path). ``quantizer="lloyd"`` runs
    the DETERMINISTIC rounded Lloyd iterations (``ml/kmeans
    .kmeans_lloyd``, ``iters`` rounds): centroids are then a pure
    function of the data, reproducible by any engine — the cross-engine
    family the q39 oracle replays (same switch as q31/q33's md5 move).

    At 100 TB: train on a sample, assign in one map pass; the assignment
    becomes the partition key for the index layout."""
    if quantizer == "lloyd":
        from ..ml.kmeans import kmeans_lloyd

        assign, centroids = kmeans_lloyd(
            corpus,
            vec_col=vec_col,
            id_col=id_col,
            k=n_lists,
            iters=iters,
            return_centroids=True,
        )
        assigned = corpus.join(
            assign.select(
                F.col("id").alias(id_col), F.col("cluster").alias("list_id")
            ),
            id_col,
        )
        return assigned, centroids
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = corpus.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__v", predictionCol="list_id")
    model = km.fit(vecs)
    assigned = model.transform(vecs).drop("__v")
    centroids = [list(c) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: str = "jvm",
) -> DataFrame:
    """Probe the ``nprobe`` nearest centroid lists per query, exact cosine
    re-rank within the probed lists only (``rerank`` picks the scoring
    engine — see :func:`_score_pairs`).

    The centroid distance computation is a literal-array expression
    (centroid count is small by construction); the candidate join hits
    ~nprobe/n_lists of the corpus."""
    cent_arr = F.expr(darray2(centroids))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        cent_arr.alias("cents"),
    )
    # rank centroids by dot(q, c): build (list_id, score) structs, sort,
    # take nprobe. The sort key is ROUND-6 with the list_id as the struct
    # tiebreak — the cross-engine rank discipline (libm/summation ulps
    # can't reorder the probe frontier), same as the re-rank below.
    scored_lists = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            F.round(
                -dot(F.col("qv"), F.element_at(F.col("cents"), i + 1)), 6
            ).alias("neg"),
            i.alias("list_id"),
        ),
    )
    probe = q.select(
        "query_id",
        "qv",
        "qn",
        F.slice(F.array_sort(scored_lists), 1, nprobe).alias("probed"),
    ).select(
        "query_id", "qv", "qn", F.explode(F.col("probed.list_id")).alias("list_id")
    )
    c = assigned_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
        "list_id",
    )
    cand = probe.join(c, on="list_id").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = _score_pairs(
        cand.select("query_id", "neighbor_id", "qv", "qn", "cv", "cn"), rerank
    )
    w = Window.partitionBy("query_id").orderBy(F.round("cos", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"))
    )


def srp_signature_crossengine(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    dims: int = 64,
    scale: int = 10000,
) -> DataFrame:
    """Sign-random-projection (cosine SimHash) signature that ANY engine
    reproduces bit-for-bit:

    * hyperplane signs are md5-derived, not RNG-derived — sign(i, d) =
      +1 if ``md5_long(f"{i}:{d}")`` is even else -1 — so the "random"
      planes are a pure function any md5-capable engine regenerates;
    * components are quantized to integers (``round(x * scale)``) BEFORE
      the dot product, so the projection arithmetic is exact bigint math
      — no float summation-order knife edges at the sign threshold;
    * bit i = (dot_i >= 0); signature = Σ bit_i << i.

    Execution shape: the signs are plan-time literals (computed in Python
    with hashlib — same md5 contract), so each plane's projection is one
    JVM-side ``zip_with``/``aggregate`` over the quantized vector
    (higher-order functions are interpreted per element, not
    codegen'd): a single map pass, no explode, no shuffle — linear scan at any corpus
    size. ``hyperplane_signature`` is the seeded xxhash-flavored
    production variant; this is the interchange/verification form
    (same trade as dedup.md5_long vs xxhash64)."""
    out = _srp_prep(df, vec_col, id_col, n_planes, dims, scale)
    return out.select("id", "sig")


def _srp_sign(i: int, d: int) -> int:
    """+1/-1 hyperplane component — the md5 contract both engines share."""
    import hashlib

    h = int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def _srp_prep(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_planes: int,
    dims: int,
    scale: int,
) -> DataFrame:
    """(id, qv, sig): integer-quantized vector + md5-SRP signature in ONE
    JVM-side map pass — interpreted HOF expressions, no Python, no
    shuffle (shared by ``srp_signature_crossengine`` and
    ``srp_lsh_topk_crossengine``)."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("long"),
    )
    # zip_with null-pads on length mismatch, which would silently zero
    # bits (short vector) or drop components (long vector) — fail loudly.
    dim_check = F.when(
        F.size(F.col(vec_col)) == dims, qv
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"srp_signature_crossengine: expected {dims}-dim vector, got "),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    out = df.select(F.col(id_col).alias("id"), dim_check.alias("qv"))
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        signs = F.array(*[F.lit(_srp_sign(i, d)) for d in range(dims)])
        dot_i = F.aggregate(
            F.zip_with("qv", signs, lambda x, s: x * s.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot_i >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return out.select("id", "qv", sig.alias("sig"))


def srp_lsh_topk_crossengine(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    table_bits: int = 8,
    dims: int = 64,
    scale: int = 10000,
) -> DataFrame:
    """LSH approximate top-k whose EVERY step an external engine replays
    bit-for-bit (DuckDB oracle: registry q42):

    * signatures — md5-derived hyperplanes over integer-quantized
      components (``_srp_prep``: exact BIGINT dots, no float knife
      edges);
    * blocking — ``n_planes // table_bits`` hash tables, table t's bucket
      = bits [t·table_bits, (t+1)·table_bits) of the signature; candidates
      share a bucket in ≥1 table;
    * re-rank — cosine over the SAME quantized integers:
      cos = Σ(qa·qb) / (√Σqa² · √Σqb²). The sums are exact int64 (≤6.4e9
      for 64 dims at scale=1e4, well inside double's 2^53), and sqrt/mul/
      div are single correctly-rounded IEEE ops — so the double is
      bit-identical on any engine and the (cos DESC, neighbor_id) rank
      can't diverge.

    Scale shape: two map passes (signatures), a bucket equi-join whose
    expected pair space is n·(n/2^table_bits)·tables, distinct on bare id
    pairs (arrays never ride the dedup shuffle), then an id-join back for
    the bounded candidate re-rank. ``lsh_topk`` is the float/xxhash
    production variant (same trade as dedup.md5_long vs xxhash64)."""
    if n_planes % table_bits:
        raise ValueError("n_planes must divide evenly into table_bits-wide tables")
    n_tables = n_planes // table_bits
    mask = (1 << table_bits) - 1
    qp = _srp_prep(queries, vec_col, id_col, n_planes, dims, scale)
    cp = _srp_prep(corpus, vec_col, id_col, n_planes, dims, scale)

    def tabs(df: DataFrame, idn: str) -> DataFrame:
        return df.select(
            F.col("id").alias(idn),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            F.shiftrightunsigned("sig", t * table_bits)
                            .bitwiseAND(F.lit(mask).cast("long"))
                            .alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(idn, "tb.tbl", "tb.bucket")

    cand = (
        tabs(qp, "query_id")
        .join(tabs(cp, "neighbor_id"), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    norm = F.sqrt(
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    qside = qp.select(F.col("id").alias("query_id"), F.col("qv").alias("qa"), norm.alias("na"))
    cside = cp.select(F.col("id").alias("neighbor_id"), F.col("qv").alias("qb"), norm.alias("nb"))
    pair_dot = F.aggregate(
        F.zip_with("qa", "qb", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(qside, "query_id")
        .join(cside, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (pair_dot.cast("double") / (F.col("na") * F.col("nb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"))
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_levels: int = 127,
) -> DataFrame:
    """Symmetric per-dimension int8 quantization of an embedding column —
    the 4× memory/bandwidth cut that makes billion-vector ANN fit in
    executor memory (scan int8 codes, rerank survivors at full
    precision). scale_d = max|x_d| / n_levels (one bounded-output
    aggregation: dims rows, whatever the corpus size); code =
    clamp(floor(x/scale + 0.5), ±n_levels).

    Everything is cross-engine exact: max is order-independent,
    floor(x/s + 0.5) has no round-half tie ambiguity (unlike ROUND,
    whose half-even/half-up convention differs across engines), and the
    scales ride into the map stage as plan-time literals — the quantize
    pass itself is a zero-shuffle JVM-side projection (interpreted HOF
    transform). Returns (id, codes array<int>).
    """
    from pyspark.sql import Row

    dims_scales = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"))
        .groupBy("dim")
        .agg((F.max(F.abs("x")) / n_levels).alias("sc"))
        .orderBy("dim")
        .collect()
    )
    scales = [r["sc"] for r in dims_scales]  # bounded: one value per dimension
    sc_arr = F.array(*[F.lit(float(s)) for s in scales])
    codes = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        sc_arr,
        # scale 0 ⟺ the dimension is all-zero ⟹ every code is 0 (guards
        # the ANSI divide-by-zero on degenerate dimensions)
        lambda x, s: F.when(s == 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.least(F.floor(x / s + 0.5), F.lit(n_levels)), F.lit(-n_levels)
            )
        )
        .cast("int"),
    )
    return df.select(F.col(id_col).alias("id"), codes.alias("codes"))


def pca_power_iteration(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 2,
) -> DataFrame:
    """Top principal component of the embedding cloud by POWER ITERATION
    — the spectral member of the embedding-analytics family (centroids,
    ANN, quantization): v ← normalize(Xᶜᵀ(Xᶜ v)), Xᶜ the centered data,
    started from the uniform unit vector. Each iteration is TWO linear
    passes (per-vector score s = xᶜ·v, then per-dimension y = Σ s·xᶜ) —
    the covariance matrix is NEVER materialized, which is the point at
    scale: O(n·d) work and O(d) state per round instead of O(d²)
    anything; the exploded (id, dim, value) frame is loop-invariant and
    localCheckpointed once.

    Cross-engine determinism (the q146/q162 discipline, applied to
    every float reduction): inputs are pre-rounded to 6 digits, all
    sums (mean, dot, projection, norm) run over round-9 products in
    DECIMAL — exact and order-independent — and v re-rounds to 6 after
    each normalization, so any engine replays the identical trajectory.
    The O(d) centroid-style driver collect per round is the bounded
    exception the kmeans path documents.

    Returns d rows: (dim, loading, eigval) — loading the round-6
    component, eigval the Rayleigh estimate ‖Xᶜᵀ Xᶜ v‖/n of the top
    covariance eigenvalue (round 4), identical on every row."""
    dim_n = len(df.select(vec_col).first()[0])
    n_rows = df.count()

    from ..storage import release_checkpoint, tracked_local_checkpoint

    exploded = tracked_local_checkpoint(
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
        ).select("id", "dim", F.round(F.col("x"), 6).alias("xr"))
    )
    mu = exploded.groupBy("dim").agg(
        (
            F.sum(F.col("xr").cast("decimal(18,6)")).cast("double") / F.lit(n_rows)
        ).alias("mu")
    )
    centered = tracked_local_checkpoint(
        exploded.join(F.broadcast(mu), "dim")
        .select("id", "dim", (F.col("xr") - F.col("mu")).alias("c"))
    )
    # `centered` is materialized, so the raw exploded blocks are dead now
    release_checkpoint(exploded)

    v = [round(1.0 / dim_n**0.5, 6)] * dim_n
    eigval = None
    for _ in range(iters):
        v_arr = F.array(*[F.lit(float(x)) for x in v])
        s = (
            centered.withColumn("v_d", F.element_at(v_arr, F.col("dim") + 1))
            .groupBy("id")
            .agg(
                F.sum(
                    F.round(F.col("c") * F.col("v_d"), 9).cast("decimal(30,9)")
                )
                .cast("double")
                .alias("s")
            )
        )
        y = (
            centered.join(s, "id")
            .groupBy("dim")
            .agg(
                F.sum(
                    F.round(F.col("c") * F.col("s"), 9).cast("decimal(30,9)")
                )
                .cast("double")
                .alias("y")
            )
        )
        norm = y.agg(
            F.sqrt(
                F.sum(F.round(F.col("y") * F.col("y"), 9).cast("decimal(38,9)"))
                .cast("double")
            ).alias("nrm")
        )
        # nrm rides the same projection — a separate norm.collect() would
        # re-run the whole s→y→norm chain as a second job per iteration
        rows = (
            y.crossJoin(F.broadcast(norm))
            .select(
                "dim", F.round(F.col("y") / F.col("nrm"), 6).alias("vd"), "nrm"
            )
            .collect()
        )
        eigval = round(rows[0]["nrm"] / n_rows, 4)
        v = [0.0] * dim_n
        for r in rows:
            v[r["dim"]] = r["vd"]

    # the result is driver-side literals — nothing references the
    # centered blocks anymore, release before returning
    release_checkpoint(centered)
    out = [(d_, float(v[d_]), float(eigval)) for d_ in range(dim_n)]
    spark = df.sparkSession
    from .exprs import values_df

    # VALUES LocalRelation (exprs.values_df): dim rows of model output,
    # zero tasks to build instead of 32 Python-worker slices
    return values_df(spark, out, "dim int, loading double, eigval double")


def pq_search(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    topk: int = 5,
) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN [Jégou et al. 2011]: split each vector
    into ``m`` subspaces, learn a tiny per-subspace codebook (the
    deterministic-Lloyd quantizer — q146 machinery — per slice), encode
    every vector as m small codes, and answer a query by ASYMMETRIC
    DISTANCE: per-subspace squared distances from the query to each
    codeword are precomputed into an m×k lookup table, so scoring a
    corpus vector is m table lookups + adds — no float math per
    candidate. This is the memory-bound ANN shape: the index is m
    log2(k)-bit codes per vector (here 4 codes vs 64 floats, a 64×
    compression), the LUT is m·k cells broadcast to every executor, and
    the scan is a codes-join-LUT aggregation — at 100 TB the codes
    table replaces the raw vectors entirely. Completes the index family
    (brute q40 / SRP-LSH q42 / IVF q39).

    Determinism (the q185 discipline): the query is the lowest-id
    vector rounded to 6; LUT cells are DECIMAL sums of round-9 squared
    differences computed IN-ENGINE (no Python arithmetic, so engine
    rounding semantics match the oracle exactly); ADC totals are exact
    DECIMAL sums of LUT cells. Returns topk (neighbor_id, pq_dist2)
    ranked ascending with id tie-break, query excluded."""
    from ..ml.kmeans import kmeans_lloyd

    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    spark = df.sparkSession
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"pq_search: dim {dim} not divisible by m={m}")
    w = dim // m
    # tracked: the result frame carries the checkpoint ids (ownership
    # transfer; session ledger reclaims if dropped), instead of pinning
    # blocks until a blanket release_all_storage — the one bare
    # localCheckpoint this module still had
    emb = tracked_local_checkpoint(
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
    )

    # joint training: one Spark job per Lloyd round for all m subspaces
    # (bit-identical to m sequential kmeans_lloyd chains — parity-pinned)
    codes, cents = _train_pq_codebooks(emb, m, w, k, iters)

    qrow = (
        emb.orderBy("id")
        .limit(1)
        .select("id", F.transform("v", lambda x: F.round(x, 6)).alias("q"))
        .collect()[0]
    )
    qid, qv = qrow["id"], list(qrow["q"])

    lut_rows = []
    for j in range(m):
        for c in range(k):
            for dpos in range(w):
                lut_rows.append(
                    (j, c, float(qv[j * w + dpos]), float(cents[j][c][dpos]))
                )
    from .exprs import values_df

    lut = (
        # VALUES LocalRelation (exprs.values_df): m*k*w literal rows,
        # no Python-worker tasks, broadcastable without a job
        values_df(spark, lut_rows, "j int, code int, qd double, cd double")
        .groupBy("j", "code")
        .agg(
            F.sum(
                F.round(
                    (F.col("qd") - F.col("cd")) * (F.col("qd") - F.col("cd")), 9
                ).cast("decimal(30,9)")
            ).alias("sq")
        )
    )
    codes_long = codes.select(
        "id",
        F.posexplode(F.expr("array(" + ", ".join(f"code{j}" for j in range(m)) + ")")).alias(
            "j", "code"
        ),
    )
    return propagate_checkpoint_ids(
        codes_long.join(F.broadcast(lut), ["j", "code"])
        .groupBy("id")
        .agg(F.round(F.sum("sq").cast("double"), 6).alias("pq_dist2"))
        .filter(F.col("id") != qid)
        .orderBy("pq_dist2", "id")
        .limit(topk)
        .select(F.col("id").alias("neighbor_id"), "pq_dist2"),
        emb,
    )


def ivfpq_search(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 8,
    nprobe: int = 3,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    topk: int = 5,
) -> DataFrame:
    """IVF-PQ composite index [Jégou et al. 2011] — the canonical
    billion-scale ANN layout: an IVF coarse quantizer prunes the corpus
    to ``nprobe`` cells, then PQ ASYMMETRIC DISTANCE (m table lookups
    per candidate, no float math) ranks only the candidates inside the
    probed cells. Composes the two verified halves exactly: the coarse
    quantizer and probe rule are q39's (deterministic rounded-Lloyd
    cells, probe frontier ranked by ROUND(-dot, 6) with list-id
    tiebreak, computed IN-ENGINE), the codebooks/LUT/ADC are q188's
    (per-subspace Lloyd, round-6 query, round-9 DECIMAL LUT cells,
    exact DECIMAL ADC sums). PQ encodes RAW vectors, not residuals —
    the residual refinement is a quality (not scale) knob and raw-PQ
    keeps every stage cross-engine replayable.

    At 100 TB: codes (m·log2(k) bits/vector) replace raw vectors, cells
    are the partition layout (q233 persists exactly this), the LUT is
    m·k broadcast cells, and the scan touches ~nprobe/n_lists of the
    codes table — ADC over a partition-pruned read.

    Returns topk (neighbor_id, pq_dist2) ascending, id tie-break,
    query (lowest id, q188 discipline) excluded."""
    from ..ml.kmeans import kmeans_lloyd
    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    spark = df.sparkSession
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"ivfpq_search: dim {dim} not divisible by m={m}")
    w = dim // m
    emb = tracked_local_checkpoint(
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
    )

    # coarse quantizer: deterministic Lloyd cells (q39/q155 machinery)
    assign, coarse = kmeans_lloyd(
        emb.select("id", F.col("v").alias("embedding")),
        "embedding",
        "id",
        k=n_lists,
        iters=iters,
        return_centroids=True,
        # emb is the checkpoint above — skip the trainer's second copy
        assume_materialized=True,
    )
    cells = assign.select("id", F.col("cluster").alias("list_id"))

    # per-subspace PQ codebooks (q188 machinery)
    codes, cents = _train_pq_codebooks(emb, m, w, k, iters)

    # query: lowest id; LUT uses its ROUND-6 values (q188), the probe
    # uses the raw vector with round-6 RANKS (q39) — both in-engine
    qrow = (
        emb.orderBy("id")
        .limit(1)
        .select("id", "v", F.transform("v", lambda x: F.round(x, 6)).alias("q"))
        .collect()[0]
    )
    qid, qv6 = qrow["id"], list(qrow["q"])

    cent_arr = F.expr(darray2(coarse))
    scored_lists = F.transform(
        F.sequence(F.lit(0), F.lit(n_lists - 1)),
        lambda i: F.struct(
            F.round(-dot(F.col("v"), F.element_at(F.col("cents"), i + 1)), 6).alias(
                "neg"
            ),
            i.alias("list_id"),
        ),
    )
    probe_row = (
        emb.filter(F.col("id") == qid)
        .select(cent_arr.alias("cents"), "v")
        .select(F.slice(F.array_sort(scored_lists), 1, nprobe).alias("p"))
        .collect()[0]
    )
    probed = [int(s["list_id"]) for s in probe_row["p"]]

    lut_rows = []
    for j in range(m):
        for c in range(k):
            for dpos in range(w):
                lut_rows.append(
                    (j, c, float(qv6[j * w + dpos]), float(cents[j][c][dpos]))
                )
    from .exprs import values_df

    lut = (
        # VALUES LocalRelation (exprs.values_df): m*k*w literal rows,
        # no Python-worker tasks, broadcastable without a job
        values_df(spark, lut_rows, "j int, code int, qd double, cd double")
        .groupBy("j", "code")
        .agg(
            F.sum(
                F.round(
                    (F.col("qd") - F.col("cd")) * (F.col("qd") - F.col("cd")), 9
                ).cast("decimal(30,9)")
            ).alias("sq")
        )
    )

    cand = cells.filter(
        F.col("list_id").isin(probed) & (F.col("id") != qid)
    ).select("id")
    codes_long = codes.join(cand, "id", "left_semi").select(
        "id",
        F.posexplode(F.expr("array(" + ", ".join(f"code{j}" for j in range(m)) + ")")).alias(
            "j", "code"
        ),
    )
    out = (
        codes_long.join(F.broadcast(lut), ["j", "code"])
        .groupBy("id")
        .agg(F.round(F.sum("sq").cast("double"), 6).alias("pq_dist2"))
        .orderBy("pq_dist2", "id")
        .limit(topk)
        .select(F.col("id").alias("neighbor_id"), "pq_dist2")
    )
    return propagate_checkpoint_ids(out, emb)


def ivfadc_search(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 8,
    nprobe: int = 3,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    topk: int = 5,
) -> DataFrame:
    """FULL residual IVFADC [Jégou et al. 2011 §III] — :func:`ivfpq_
    search` with the residual refinement that makes the composite the
    production-grade index: PQ codebooks are trained on RESIDUALS
    r = v − coarse_centroid(cell), which concentrates the quantizer's
    budget on the within-cell variance, and the query builds ONE LUT
    PER PROBED CELL (the query's residual differs per cell: r_q(c) =
    q − centroid(c)), so ADC scores candidates against the residual
    geometry of their own cell.

    Cross-engine discipline end to end: residuals are single IEEE
    subtractions of the round-4 centroid from the raw vector (bit-
    identical in any engine), the per-cell query residuals are rounded
    to 6 IN-ENGINE before leaving the plan, LUT cells are round-9
    DECIMAL sums, ADC is an exact DECIMAL sum — the DuckDB oracle
    (registry q243) replays the coarse chain, the residual transform,
    the m residual codebook chains, the per-cell LUTs, and every ADC
    value.

    Scale shape is q242's plus one broadcast: codes replace vectors,
    the per-cell LUTs are nprobe·m·k broadcast cells, candidates come
    from a partition-pruned read of the probed cells."""
    from ..ml.kmeans import kmeans_lloyd
    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    spark = df.sparkSession
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"ivfadc_search: dim {dim} not divisible by m={m}")
    w = dim // m
    emb = tracked_local_checkpoint(
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
    )

    # coarse quantizer + cells (q39 chain)
    assign, coarse = kmeans_lloyd(
        emb.select("id", F.col("v").alias("embedding")),
        "embedding",
        "id",
        k=n_lists,
        iters=iters,
        return_centroids=True,
        # emb is the checkpoint above — skip the trainer's second copy
        assume_materialized=True,
    )
    cells = assign.select("id", F.col("cluster").alias("list_id"))

    # residuals: v − coarse[cell], a single IEEE subtract per component
    coarse_arr = F.expr(darray2(coarse))
    remb = tracked_local_checkpoint(
        emb.join(cells, "id").select(
            "id",
            "list_id",
            F.zip_with(
                "v",
                F.element_at(coarse_arr, F.col("list_id") + 1),
                lambda a, b: a - b,
            ).alias("v"),
        )
    )

    # PQ codebooks per subspace, trained on residuals (q188 chain).
    # list_id rides the codes from the residual frame (round 12): the
    # serve leg below then filters the codes directly instead of
    # re-running the coarse assignment map into ``cells`` and paying
    # two id-equi joins to attach a column codes' input already held.
    codes, cents = _train_pq_codebooks(remb, m, w, k, iters, carry=("list_id",))

    # query (lowest id) + probe frontier (q39 rule, in-engine)
    qid = emb.orderBy("id").limit(1).collect()[0]["id"]
    scored_lists = F.transform(
        F.sequence(F.lit(0), F.lit(n_lists - 1)),
        lambda i: F.struct(
            F.round(-dot(F.col("v"), F.element_at(F.col("cents"), i + 1)), 6).alias(
                "neg"
            ),
            i.alias("list_id"),
        ),
    )
    qf = emb.filter(F.col("id") == qid).select(coarse_arr.alias("cents"), "v")
    probe_row = qf.select(
        F.slice(F.array_sort(scored_lists), 1, nprobe).alias("p")
    ).collect()[0]
    probed = [int(s["list_id"]) for s in probe_row["p"]]

    # per-probed-cell query residuals, ROUND-6 IN-ENGINE (the q188
    # discipline — engine rounding semantics must match the oracle)
    qres_rows = (
        qf.select(
            F.explode(F.array(*[F.lit(c) for c in probed])).alias("cell"), "v", "cents"
        )
        .select(
            "cell",
            F.zip_with(
                "v",
                F.element_at(F.col("cents"), F.col("cell") + 1),
                lambda a, b: F.round(a - b, 6),
            ).alias("q"),
        )
        .collect()
    )
    lut_rows = []
    for row in qres_rows:
        cell, qr = int(row["cell"]), list(row["q"])
        for j in range(m):
            for c in range(k):
                for dpos in range(w):
                    lut_rows.append(
                        (cell, j, c, float(qr[j * w + dpos]), float(cents[j][c][dpos]))
                    )
    from .exprs import values_df

    lut = (
        # VALUES LocalRelation (exprs.values_df): see pq_search
        values_df(spark, lut_rows, "cell int, j int, code int, qd double, cd double")
        .groupBy("cell", "j", "code")
        .agg(
            F.sum(
                F.round(
                    (F.col("qd") - F.col("cd")) * (F.col("qd") - F.col("cd")), 9
                ).cast("decimal(30,9)")
            ).alias("sq")
        )
    )

    codes_long = (
        codes.filter(F.col("list_id").isin(probed) & (F.col("id") != qid))
        .select(
            "id",
            F.col("list_id").alias("cell"),
            F.posexplode(
                F.expr("array(" + ", ".join(f"code{j}" for j in range(m)) + ")")
            ).alias("j", "code"),
        )
    )
    out = (
        codes_long.join(F.broadcast(lut), ["cell", "j", "code"])
        .groupBy("id")
        .agg(F.round(F.sum("sq").cast("double"), 6).alias("pq_dist2"))
        .orderBy("pq_dist2", "id")
        .limit(topk)
        .select(F.col("id").alias("neighbor_id"), "pq_dist2")
    )
    return propagate_checkpoint_ids(out, emb, remb)


def ivfadc_index_build(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 8,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    exact_means: bool = False,
    assume_materialized: bool = False,
    dim: "int | None" = None,
    carry_cols: "tuple[str, ...]" = (),
):
    """Train the residual-IVFADC index ONCE and return it as data:
    ``(index, coarse, codebooks)`` where ``index`` is a DataFrame
    (id, list_id, code0..code{m-1}) — the per-cell PQ codes table, the
    thing a 100 TB deployment persists partitioned BY list_id so probes
    become partition-pruned reads — ``coarse`` is the n_lists coarse
    centroids and ``codebooks`` the m per-subspace residual codebooks
    (model parameters, driver-resident lists exactly like a persisted
    sidecar). Training is the q243 chain verbatim: deterministic-Lloyd
    coarse quantizer, residuals r = v − coarse[cell] as single IEEE
    subtracts, per-subspace deterministic-Lloyd codebooks on the
    residuals. Build once here, then serve any number of query batches
    with :func:`ivfadc_index_search` — fresh-build and
    persisted-reload results are hash-equal (q245).

    ``assume_materialized``: the caller guarantees ``df`` is already an
    execution boundary (a localCheckpoint, e.g. the chunk-PQ build's
    ``chv``), so the internal checkpoint — whose only purpose is to
    stop every Lloyd pass re-running upstream lineage — would copy the
    vectors a second time for nothing (one full extra materialization
    job per build chain; guide §1.2 don't compute what you throw
    away). Values are identical either way (a checkpoint is an
    execution boundary, never a computation). ``dim``: callers that
    know the vector width (it is a build parameter for the chunk
    family) pass it to skip the one-row ``first()`` probe job — a
    driver barrier that exists only to infer what the caller already
    knows; a mismatch surfaces as the same slice/zip_with errors the
    probe would have prevented. ``carry_cols``: extra ``df`` columns to
    thread through the residual checkpoint onto the returned index
    (appended after the code columns) — the chunk build carries
    (doc, n2) this way instead of re-joining the corpus-sized chunk
    frame onto the finished codes (guide §2.4/§8: attach by carrying,
    not by a second shuffle over the payload's key space). Requires
    the order-independent ``exact_means`` path (see below).

    Round-12 join removals (guide §2.4), values bit-identical:

    * the index no longer re-joins the (id → list_id) assignment onto
      the codes — the residual frame carried ``list_id`` from the
      moment it was built, so the old ``cells.join(codes, "id")`` both
      RE-EXECUTED the coarse argmin map over the corpus and paid a
      corpus-sized Exchange pair, purely to attach a column the codes'
      own input already held; now list_id rides
      ``_train_pq_codebooks``'s ``carry`` and the index is a pure map
      over the residual checkpoint.
    * with ``exact_means=True`` the residual frame itself is built
      JOINLESS: list_id is re-derived per row with ``argmin_pos``
      against the FINAL coarse centroids — bit-equal to the final
      Lloyd assignment by definition (``build_chunk_index``'s
      established rule, pinned by
      test_ivfadc_encode_matches_index_build and the q264
      stream-ingest consistency oracle) — instead of shuffling
      corpus + assignment through an id-equi join. This changes the
      residual frame's PARTITIONING (map over the caller's checkpoint
      vs join output), which is only value-safe when the PQ mean
      update is summation-order-independent — exactly what
      ``exact_means`` guarantees (round-6 DECIMAL sums). The plain-AVG
      path keeps the join (its committed whole-doc oracles replay
      plain AVG, whose double summation is partition-order-sensitive
      in the last ulp — the round-11 q276 incident) so its mean
      aggregation stays partitioned by spark.sql.shuffle.partitions,
      NOT by the scan layout, which varies with the driver's
      core-count sweeps."""
    from ..ml.kmeans import kmeans_lloyd
    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    if carry_cols and not exact_means:
        raise ValueError(
            "ivfadc_index_build: carry_cols requires exact_means=True "
            "(the joinless residual path; see docstring)"
        )
    # Reserved-name guard (round-13 ADVICE): a carried column named like
    # the index's own layout would produce a duplicate/ambiguous column
    # deep inside the build (an opaque analysis error, or a silently
    # shadowed column) — reject it at the API boundary instead.
    reserved = {"id", "v", "list_id", *(f"code{j}" for j in range(m))}
    clash = [c for c in carry_cols if c in reserved]
    if clash:
        raise ValueError(
            f"ivfadc_index_build: carry_cols {clash} collide with reserved "
            f"index columns ({sorted(reserved)}); rename them before the build"
        )
    if dim is not None and dim % m:
        raise ValueError(f"ivfadc_index_build: dim {dim} not divisible by m={m}")
    emb = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *[F.col(c) for c in carry_cols],
    )
    if not assume_materialized:
        emb = tracked_local_checkpoint(emb)
    assign, coarse = kmeans_lloyd(
        emb.select("id", F.col("v").alias("embedding")),
        "embedding",
        "id",
        k=n_lists,
        iters=iters,
        return_centroids=True,
        # emb is the checkpoint above — skip the trainer's second copy
        assume_materialized=True,
    )
    if dim is None:
        # the coarse centroids kmeans just collected ARE corpus vectors
        # (init = k lowest-id rows; means preserve the width), so the
        # vector width is already on the driver — the old one-row
        # ``first()`` probe job is free here (round 13, guide §1.2)
        dim = len(coarse[0])
        if dim % m:
            raise ValueError(
                f"ivfadc_index_build: dim {dim} not divisible by m={m}"
            )
    w = dim // m
    coarse_arr = F.expr(darray2(coarse))

    def _residual() -> Column:
        return F.zip_with(
            "v",
            F.element_at(coarse_arr, F.col("list_id") + 1),
            lambda a, b: a - b,
        ).alias("v")

    if exact_means:
        # joinless: re-derive the final assignment per row (bit-equal —
        # see docstring) instead of shuffling emb + cells through a join
        remb = tracked_local_checkpoint(
            emb.withColumn("list_id", argmin_pos("v", coarse).cast("int")).select(
                "id", "list_id", _residual(), *carry_cols
            )
        )
    else:
        cells = assign.select("id", F.col("cluster").alias("list_id"))
        remb = tracked_local_checkpoint(
            emb.join(cells, "id").select("id", "list_id", _residual())
        )
    codes, cents = _train_pq_codebooks(
        remb, m, w, k, iters, exact_means=exact_means,
        carry=("list_id", *carry_cols),
    )
    if carry_cols:
        # keep the documented index column order: carried payload last
        codes = codes.select(
            "id", "list_id", *[f"code{j}" for j in range(m)], *carry_cols
        )
    index = propagate_checkpoint_ids(codes, emb, remb)
    return index, coarse, cents


def ivfadc_index_search(
    index: DataFrame,
    coarse: list,
    codebooks: list,
    queries: DataFrame,
    q_vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    nprobe: int = 3,
    topk: int = 5,
    static_probe: bool = False,
    exclude_self: bool = True,
) -> DataFrame:
    """Serve a batch of queries from a residual-IVFADC index — built
    this session by :func:`ivfadc_index_build` or RELOADED from its
    persisted parquet layout (codes partitioned by list_id + model
    sidecars). All per-query work is IN-ENGINE:

    * probe assignment: each query ranks the coarse centroids (model
      literals) by ROUND(-dot, 6), list-id tiebreak — one map pass;
    * per-cell query residuals: ``zip_with`` against the probed
      centroid, ROUND-6 in-engine;
    * ADC LUTs: query-residual frame × BROADCAST m·k codebook frame,
      each cell an exact DECIMAL fold of round-9 squared diffs (equal
      to a SUM — decimal addition is exact, order-independent);
    * candidates: the probed cells of the codes table; ADC is m LUT
      lookups per candidate; per-query top-k is a window rank.

    ``static_probe=True`` collects the batch's distinct probe frontier
    (≤ Q·nprobe ints — the one bounded driver action) and pushes it as
    a LITERAL ``list_id IN (...)`` filter, so a list_id-partitioned
    parquet index is read PARTITION-PRUNED (PartitionFilters in the
    scan — plan-locked in tests). The default join path keeps the plan
    fully lazy for large Q, where the probe set approaches all cells
    anyway.

    ``exclude_self=True`` (the default) assumes queries SHARE the
    corpus id space (the self-query serving shape: q243/q244) and drops
    candidates whose index id equals the query id. When serving an
    EXTERNAL query frame whose ids are unrelated to the corpus, a
    numerically colliding id would silently drop a true neighbor — pass
    ``exclude_self=False`` there (round-7 ADVICE). Returns (query_id,
    neighbor_id, pq_dist2), per-query rank ≤ topk, ascending distance,
    id tie-break."""
    from ..storage import propagate_checkpoint_ids

    m = len(codebooks)
    k = len(codebooks[0])
    w = len(codebooks[0][0])
    n_lists = len(coarse)
    # SQL-text construction (round-12, functions/exprs.py): same probe
    # ranking, residual and LUT folds as the Column forms they replace,
    # parsed in a handful of py4j round-trips instead of hundreds.
    from .exprs import probe_sql

    cents_sql = darray2(coarse)
    q = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.col(q_vec_col).cast("array<double>").alias("qv"),
    )
    probed = q.select(
        "query_id",
        "qv",
        F.explode(F.expr(probe_sql(coarse, "qv", nprobe))).alias("s"),
    ).select("query_id", "qv", F.col("s.list_id").alias("cell"))
    # Round-13 (guide §2.4 / §3.3): the per-(query, cell) residual LUT
    # is a PURE PROJECTION on the probe frame — one array of m·k
    # DECIMAL(30,9) subspace distances per probe row, each the exact
    # fold the former (query_id, cell, j, code)-keyed LUT frame
    # computed against the broadcast codebook frame. Because every
    # candidate row can INDEX the array with its own code columns, the
    # m-way posexplode of the candidates, the 4-key LUT equi-join AND
    # the groupBy exchange that reassembled the exploded rows all
    # disappear; the codes table itself is never shuffled (the probe
    # side broadcasts).
    cb_flat = darray2(
        [[float(x) for x in codebooks[j][c]] for j in range(m) for c in range(k)]
    )
    sq_fold = (
        f"aggregate(zip_with(slice(q, (i div {k}) * {w} + 1, {w}), "
        f"element_at({cb_flat}, i + 1), "
        "(x, y) -> cast(round((x - y) * (x - y), 9) as decimal(30,9))), "
        "cast(0 as decimal(30,9)), "
        "(acc, x) -> cast(acc + x as decimal(30,9)))"
    )
    qres = probed.select(
        "query_id",
        "cell",
        F.expr(
            f"zip_with(qv, element_at({cents_sql}, cell + 1), "
            "(a, b) -> round(a - b, 6))"
        ).alias("q"),
    ).withColumn(
        "luts",
        F.expr(f"transform(sequence(0, {m * k - 1}), i -> {sq_fold})"),
    )

    idx = index
    if static_probe:
        probe_cells = sorted(
            {int(r["cell"]) for r in probed.select("cell").distinct().collect()}
        )
        idx = index.filter(F.col("list_id").isin(probe_cells))
    cand = F.broadcast(qres.select("query_id", "cell", "luts")).join(
        idx.withColumnRenamed("list_id", "cell"), "cell"
    )
    if exclude_self:
        cand = cand.filter(F.col("id") != F.col("query_id"))
    # Σ_j lut[j][code_j] as one DECIMAL addition chain — decimal
    # addition is exact, so this equals the former F.sum over the m
    # joined LUT rows bit-for-bit (same round-9 decimal terms)
    sq_sum = " + ".join(f"element_at(luts, {j * k} + code{j} + 1)" for j in range(m))
    adc = cand.select(
        "query_id",
        "id",
        F.expr(f"round(cast({sq_sum} as double), 6)").alias("pq_dist2"),
    )
    wnd = Window.partitionBy("query_id").orderBy("pq_dist2", "id")
    out = (
        adc.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= topk)
        .select("query_id", F.col("id").alias("neighbor_id"), "pq_dist2")
    )
    return propagate_checkpoint_ids(out, index)


def ivfadc_batch_search(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str | None = None,
    q_id_col: str | None = None,
    n_lists: int = 8,
    nprobe: int = 3,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    topk: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """BATCH residual IVFADC serving — :func:`ivfadc_search` generalized
    to a ``queries`` DataFrame of Q query vectors with every per-query
    step IN-ENGINE: :func:`ivfadc_index_build` (train once, O(iters·m)
    driver actions independent of Q) composed with
    :func:`ivfadc_index_search` (one lazy serving plan — probe map
    pass, in-engine per-cell residual LUTs against a broadcast codebook
    frame, window top-k). This is the operator a retrieval/dedup
    pipeline runs at 100 TB (millions of queries against one index);
    the single-query :func:`ivfadc_search` stays as the oracle-checked
    demo, and for any query vector the batch rows replay its
    (neighbor_id, pq_dist2) exactly (parity-pinned in tests; q244 vs
    q243 in the registry). ``exclude_self=True`` assumes the query ids
    live in the corpus id space — pass False for external query frames
    (see :func:`ivfadc_index_search`)."""
    index, coarse, cents = ivfadc_index_build(
        df, vec_col=vec_col, id_col=id_col, n_lists=n_lists, m=m, k=k, iters=iters
    )
    return ivfadc_index_search(
        index,
        coarse,
        cents,
        queries,
        q_vec_col=q_vec_col or vec_col,
        q_id_col=q_id_col or id_col,
        nprobe=nprobe,
        topk=topk,
        exclude_self=exclude_self,
    )


# Round-13 adjudication (same verdict as ml/kmeans.kmeans_lloyd): a
# FUSED one-job variant of this trainer — init + every joint Lloyd
# round chained in-plan through broadcast one-row codebook frames, one
# final collect (commit aecb6dd) — was built, parity-pinned and
# oracle-verified (sf0.01/sf0.1/8-core), then REJECTED on measurement:
# the per-iteration subtree duplication (~2^iters logical tree) costs
# more in Catalyst optimization than the removed driver barriers save,
# e.g. q275 5.99 s stepwise vs 6.75 s fused (interleaved min-of-2).
# The stepwise loop below stays the production path.
def _train_pq_codebooks(
    remb: DataFrame, m: int, w: int, k: int, iters: int,
    exact_means: bool = False,
    carry: "tuple[str, ...]" = (),
) -> "tuple[DataFrame, list[list[list[float]]]]":
    """Train the m per-subspace PQ codebooks JOINTLY — one Spark job per
    Lloyd round for ALL subspaces, instead of m independent
    ``kmeans_lloyd`` chains (m·(iters+2) driver barriers → iters+2).
    At production PQ widths (m=16) the sequential form's per-chain
    collect/checkpoint barriers dominate training latency; jointly the
    update step is a single groupBy over (subspace, cluster, dim).

    Semantics are ``kmeans_lloyd``'s verbatim, applied per subspace to
    ``slice(v, j·w+1, w)``: init = the k lowest-id rows' slices rounded
    to 4; assignment = argmin of round-6 L2 with cluster tie-break
    (``ml/kmeans._assign``'s exact expression); update = per-dimension
    AVG rounded to 4; an emptied cluster keeps its previous centroid.
    Each subspace's arithmetic touches only its own slice, so the
    jointly-trained codebooks and codes equal the sequential chains'
    (parity-pinned in tests; the q188/q242-q245 oracles pin the values
    end-to-end). ``remb`` must already be materialized (checkpointed)
    by the caller — this trainer adds no storage.

    ``carry``: extra ``remb`` columns to ride the final codes frame
    (between ``id`` and the code columns), e.g. the ``list_id`` the
    residual frame already holds — the consumer then never re-joins
    the corpus-sized assignment map back onto the codes (guide §2.4:
    the attach is a column that was already there; see
    ``ivfadc_index_build``). Pure projection — training is untouched.

    Returns (codes, cents): codes = (id, *carry, code0..code{m-1}),
    cents[j][c] = list of w floats. NOTE: consumers may reorder the
    carried columns — ``ivfadc_index_build`` re-projects carried payload
    LAST (id, list_id, code0.., *carry_cols) for its documented index
    layout — so read positions from the consumer you call, not from
    this trainer's internal order (round-13 ADVICE)."""
    spark = remb.sparkSession
    # Init rounding happens IN-ENGINE (F.round = HALF_UP), exactly like
    # kmeans_lloyd's seed step — Python round() is HALF_EVEN and would
    # diverge from the sequential chains and the DuckDB ROUND oracles
    # at exact decimal midpoints (round-7 ADVICE).
    init_rows = (
        remb.orderBy("id")
        .limit(k)
        .select(F.transform("v", lambda x: F.round(x, 4)).alias("c"))
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(
            f"_train_pq_codebooks: k={k} but the input has only "
            f"{len(init_rows)} rows; need at least k rows per codebook"
        )
    cents: list[list[list[float]]] = [
        [list(r["c"])[j * w : (j + 1) * w] for r in init_rows] for j in range(m)
    ]

    def assign_all(cur: list[list[list[float]]]) -> DataFrame:
        """(id, j, cluster, vs=slice_j) — every subspace's argmin in one
        map pass (mirrors ml/kmeans._assign per subspace). Emitted as
        ONE ``F.expr`` SQL text: the Column form built m·k
        zip_with/aggregate trees through py4j (hundreds of synchronous
        round-trips per training pass — the measured q275 bottleneck);
        the parsed text is the same fold, same round-6 + cluster-id
        tie-break, bit-identical (tests/test_operators.py::TestExprSql).
        Each subspace's argmin is a LAMBDA over its codebook literal
        (exprs.argmin_lambda_sql) — m O(1)-node trees instead of m·k
        inlined distance trees, so the per-iteration analysis/codegen
        cost no longer scales with the codebook size."""
        from .exprs import argmin_lambda_sql

        per_j = []
        for j in range(m):
            sub = f"slice(v, {j * w + 1}, {w})"
            best = argmin_lambda_sql(cur[j], sub)
            per_j.append(
                f"named_struct('j', {j}, 'cluster', {best}.cluster, 'vs', {sub})"
            )
        return remb.select(
            "id", F.explode(F.expr(f"array({', '.join(per_j)})")).alias("a")
        ).select("id", "a.j", "a.cluster", "a.vs")

    # ``exact_means``: per-dimension mean as a round-6 DECIMAL(18,6)
    # SUM (exact, summation-ORDER-independent) cast to double and
    # divided by the count, instead of F.avg — the repo's
    # round-then-DECIMAL-sums discipline. Plain double avg over
    # NON-integer residuals is partition-order dependent in the last
    # ulp, and ROUND(·, 4) amplifies a reorder ulp at a 4-decimal
    # midpoint into a different centroid (observed: the q276 chunk
    # build matched DuckDB under 8 shuffle partitions and diverged
    # under 32). Whole-doc callers keep the default (their committed
    # oracles replay plain AVG); the chunk-PQ build opts in, with its
    # oracle replaying the same decimal-sum expression.
    if exact_means:
        mean_expr = F.round(
            F.sum(F.round("x", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        )
    else:
        mean_expr = F.round(F.avg("x"), 4)
    for _ in range(iters):
        mean_rows = (
            assign_all(cents)
            .select("j", "cluster", F.posexplode("vs").alias("dim", "x"))
            .groupBy("j", "cluster", "dim")
            .agg(mean_expr.alias("c"))
            .collect()
        )
        by_jc: dict[tuple[int, int], dict[int, float]] = {}
        for r in mean_rows:
            by_jc.setdefault((r["j"], r["cluster"]), {})[r["dim"]] = r["c"]
        cents = [
            [
                [by_jc[(j, ci)][d] for d in range(w)]
                if (j, ci) in by_jc
                else cents[j][ci]
                for ci in range(k)
            ]
            for j in range(m)
        ]

    # Final per-subspace codes as ONE direct projection (round-12 guide
    # §2.4 remove-shuffles): m argmin columns evaluated in a single map
    # over ``remb`` — :func:`ivfadc_encode`'s exact shape — instead of
    # the long-form explode → groupBy("id").pivot(j) round-trip, which
    # re-shuffled every (id, j) assignment row just to reshape values
    # that were computed side-by-side in the first place (measured: the
    # pivot job was the single heaviest stage of the q275 build, ~21
    # task-seconds at sf0.1; the map form removes that Exchange
    # entirely). Values are the identical argmin expressions per (id,
    # j), so codes are bit-equal; only the plan shape changes (pinned
    # by the PQ-parity unit tests and the q188/q242-q245 oracles).
    from .exprs import argmin_lambda_sql

    code_cols = [
        F.expr(
            f"{argmin_lambda_sql(cents[j], f'slice(v, {j * w + 1}, {w})')}.cluster"
        ).alias(f"code{j}")
        for j in range(m)
    ]
    codes = remb.select("id", *carry, *code_cols)
    return codes, cents


def argmin_pos(vec_sql: str, cents_py: list) -> Column:
    """Position of the nearest centroid in ``cents_py``: round-6
    euclidean rank, position tiebreak — ``ml/kmeans._assign``'s exact
    rule as one JVM expression (shared by :func:`ivfadc_encode`,
    :func:`ivfadc_rebalance`, :func:`ivfadc_split_cell`, and the
    retrieval / index-store consumers — public since round 13, when
    three modules already depended on it).

    ``vec_sql`` is SQL text (a column name or e.g. ``slice(r, 1, 4)``):
    the whole argmin parses as ONE ``F.expr`` instead of one py4j
    round-trip per centroid×element Column node, and iterates ONE
    distance lambda over a single centroid-table literal instead of
    k inlined trees (O(1) analysis/codegen instead of O(k·dim) per
    job — exprs.argmin_lambda_sql has the measured numbers). Same
    fold, same round-6 + position tie-break, bit-identical values
    (pinned by tests/test_operators.py::TestExprSql)."""
    from .exprs import argmin_lambda_sql

    return F.expr(f"{argmin_lambda_sql(cents_py, vec_sql)}.cluster")


# Backward-compatible alias (tests and older callers import the
# underscore name; the public name is argmin_pos — round-13 ADVICE).
_argmin_pos = argmin_pos


def ivfadc_encode(
    df: DataFrame,
    coarse: list,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode vectors into the residual-IVFADC index layout — a PURE
    MAP (no shuffle, no state), so it runs identically on a batch frame
    and on a Structured Streaming frame (q248's incremental ingest):

    1. coarse cell = argmin over the coarse centroids of the round-6 L2
       distance, cluster tie-break (``ml/kmeans._assign``'s exact rule,
       so streamed assignments equal the batch build's bit-for-bit);
    2. residual = v − coarse[cell], one IEEE subtract per component;
    3. code_j = argmin over codebook j of the round-6 L2 distance of
       residual slice j, cluster tie-break — ``_train_pq_codebooks``'s
       final-assignment rule.

    ``coarse``/``codebooks`` are the persisted model sidecars
    (:func:`ivfadc_index_build` / q245's parquet layout). Returns
    (id, list_id, code0..code{m-1}) — exactly the codes-table schema,
    ready to append to the list_id-partitioned index."""
    m = len(codebooks)
    k = len(codebooks[0])
    w = len(codebooks[0][0])
    coarse_arr = F.expr(darray2(coarse))

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("list_id", argmin_pos("v", coarse).cast("int"))
    res = base.withColumn(
        "r",
        F.zip_with(
            "v", F.element_at(coarse_arr, F.col("list_id") + 1), lambda a, b: a - b
        ),
    )
    code_cols = [
        argmin_pos(f"slice(r, {j * w + 1}, {w})", codebooks[j])
        .cast("int")
        .alias(f"code{j}")
        for j in range(m)
    ]
    return res.select("id", "list_id", *code_cols)


def _group_centroids(
    coarse: list, n_groups: int, iters: int = 2
) -> "tuple[list, list]":
    """Cluster the coarse CENTROIDS themselves into ``n_groups`` groups
    (driver-side: the centroid table is model state, n_lists ≤ ~10⁵
    rows — the one place a Python loop is the right tool). Deterministic
    by the package's Lloyd discipline (seeds = the first ``n_groups``
    centroids by index, round-4 means, round-6 distance rank with index
    tiebreak), so the grouping is reproducible run-to-run; it affects
    only WHICH cells a partial probe visits, never the argmin maths.
    Returns (group_reps, members) with ``members[g]`` the sorted coarse
    indices assigned to group g (an emptied group keeps its rep and an
    empty member list)."""
    import math

    dim = len(coarse[0])
    vecs = [[float(x) for x in c] for c in coarse]

    def _d6(v, c):
        return round(math.sqrt(sum((a - b) * (a - b) for a, b in zip(v, c))), 6)

    reps = [[round(x, 4) for x in vecs[g]] for g in range(n_groups)]
    members: list[list[int]] = []
    for it in range(iters + 1):
        members = [[] for _ in range(n_groups)]
        for i, v in enumerate(vecs):
            best = min(range(n_groups), key=lambda g: (_d6(v, reps[g]), g))
            members[best].append(i)
        if it == iters:
            break
        reps = [
            [
                round(sum(vecs[i][d] for i in members[g]) / len(members[g]), 4)
                for d in range(dim)
            ]
            if members[g]
            else reps[g]
            for g in range(n_groups)
        ]
    return reps, members


def ivfadc_encode_two_level(
    df: DataFrame,
    coarse: list,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_groups: "int | None" = None,
    probe_groups: "int | None" = None,
) -> DataFrame:
    """SCALABLE COARSE ASSIGNMENT — :func:`ivfadc_encode`'s ingest
    bottleneck removed (round-8 verdict #2): the brute argmin ranks ALL
    n_lists centroids per vector, so encode cost grows linearly with
    n_lists (PERF.md addendum 3 measured it; production n_lists is
    10⁴-10⁵). This is the standard two-level remedy (the coarse
    quantizer of the coarse quantizer — Jégou et al. 2011 §V's
    inverted-multi-index family shape): the centroids are clustered
    into ``n_groups`` groups ONCE (driver-side — model state, not
    data), and each vector ranks only the ``n_groups`` group reps plus
    the member centroids of its ``probe_groups`` nearest groups —
    per-vector cost n_groups + probe_groups·(n_lists/n_groups) instead
    of n_lists (√n_lists·(1+probe_groups) at the balanced point).

    Exactness contract: within the probed candidate set the argmin uses
    EXACTLY the brute rule (round-6 L2 rank, ORIGINAL centroid-index
    tiebreak — ``array_min`` over (rd, idx) structs), so with
    ``probe_groups = n_groups`` the candidate set is every centroid and
    the output is BIT-EQUAL to :func:`ivfadc_encode` (q267's oracle
    pins this end-to-end through DuckDB's full replay). With a partial
    probe the assignment is approximate in the same sense IVF search
    is: a vector files into the best cell of its probed groups.
    Residuals and PQ codes then follow the brute path unchanged.
    Defaults: ``n_groups = ceil(sqrt(n_lists))``, ``probe_groups = 1``
    (the production ingest setting); everything stays a PURE MAP —
    stream-legal, no shuffle, no state."""
    import math

    m = len(codebooks)
    w = len(codebooks[0][0])
    n_lists = len(coarse)
    if n_groups is None:
        n_groups = max(1, math.ceil(math.sqrt(n_lists)))
    if probe_groups is None:
        probe_groups = 1
    probe_groups = min(probe_groups, n_groups)
    reps, members = _group_centroids(coarse, n_groups)

    coarse_arr = F.expr(darray2(coarse))
    reps_arr = F.expr(darray2(reps))
    members_arr = F.array(
        *[F.array(*[F.lit(int(i)) for i in ms]) for ms in members]
    )

    def _d6(vec, cent):
        return F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # level 1: rank the n_groups reps, keep the probe_groups nearest
    rep_scored = F.transform(
        F.sequence(F.lit(0), F.lit(n_groups - 1)),
        lambda g: F.struct(
            _d6(F.col("v"), F.element_at(reps_arr, g + 1)).alias("rd"),
            g.alias("g"),
        ),
    )
    probed = F.slice(F.array_sort(rep_scored), 1, probe_groups).getField("g")
    # level 2: brute argmin restricted to the probed groups' members —
    # round-6 rank, ORIGINAL index tiebreak (the argmin_pos rule)
    cand = F.flatten(
        F.transform(probed, lambda g: F.element_at(members_arr, g + 1))
    )
    best = F.array_min(
        F.transform(
            cand,
            lambda idx: F.struct(
                _d6(F.col("v"), F.element_at(coarse_arr, idx + 1)).alias("rd"),
                idx.alias("pos"),
            ),
        )
    )
    assigned = base.withColumn("list_id", best["pos"].cast("int"))
    res = assigned.withColumn(
        "r",
        F.zip_with(
            "v", F.element_at(coarse_arr, F.col("list_id") + 1), lambda a, b: a - b
        ),
    )
    code_cols = [
        argmin_pos(f"slice(r, {j * w + 1}, {w})", codebooks[j])
        .cast("int")
        .alias(f"code{j}")
        for j in range(m)
    ]
    return res.select("id", "list_id", *code_cols)


def ivfadc_rebalance(
    df: DataFrame,
    index: DataFrame,
    coarse: list,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_cells: "list[int] | None" = None,
    top_n: int = 2,
    iters: int = 1,
) -> "tuple[DataFrame, list, DataFrame]":
    """INDEX MAINTENANCE: re-balance drifted/hot cells of a residual-
    IVFADC index IN PLACE — the lifecycle step q248's streaming ingest
    makes necessary (arrivals file into cells trained once; hot cells
    grow unboundedly and their residual variance drifts away from the
    codebooks' training distribution).

    Targeted, not global: ``target_cells`` (default: the ``top_n`` most
    populated cells, count-desc / cell-id-asc — the census is a
    ``groupBy(list_id)`` over codes, n_lists rows) are re-clustered
    among THEMSELVES with ``iters`` deterministic Lloyd rounds seeded
    from their CURRENT centroids (each round: per-cell round-4 mean of
    the current membership — an emptied cell keeps its centroid — then
    reassignment among the updated target centroids by round-6 L2 rank,
    target-position tiebreak). Members are then RE-ENCODED against
    their new centroid with the UNCHANGED codebooks. Untargeted cells
    are untouched BYTES: same centroid, same codes rows — so a query
    whose probe frontier avoids the targets before and after serves
    bit-equal results (contract-pinned in tests), and a partitioned
    index rewrites only the target partitions. Movement work is
    proportional to target-cell rows, never corpus size. Restricting
    reassignment to the target set (rather than a global argmin) is
    what keeps non-target partitions immutable; IVF list membership is
    an approximation by construction (Jégou et al. 2011 §III), and the
    restricted move preserves it exactly as well as a full retrain
    preserves its own. At extreme scale the round-4 mean can be taken
    over a deterministic id-hash sample of each target cell instead of
    full membership — same machinery, cheaper update.

    Returns ``(new_index, new_coarse, moves)``: ``new_index`` has the
    codes-table schema (id, list_id, code0..code{m-1});``new_coarse``
    is ``coarse`` with target entries replaced; ``moves`` is
    (id, old_cell, new_cell, code0..code{m-1}) for every target-cell
    member (``new_cell != old_cell`` rows are the reassignments —
    q254's oracle pins this frame end-to-end). Both frames share ONE
    internal checkpoint whose tracked ids ride ``moves`` alone —
    ``release_checkpoint(moves)`` exactly once, after both frames are
    dead."""
    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    m = len(codebooks)
    k = len(codebooks[0])
    w = len(codebooks[0][0])
    if target_cells is None:
        census = (
            index.groupBy("list_id")
            .count()
            .orderBy(F.desc("count"), "list_id")
            .limit(top_n)
            .collect()  # bounded: n_lists rows ranked, top_n returned
        )
        target_cells = [int(r["list_id"]) for r in census]
    targets = sorted(int(c) for c in target_cells)
    t_arr = F.array(*[F.lit(c) for c in targets])

    emb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    members = tracked_local_checkpoint(
        emb.join(
            index.filter(F.col("list_id").isin(targets)).select(
                "id", F.col("list_id").alias("old_cell")
            ),
            "id",
        ).withColumn("pos", F.array_position(t_arr, F.col("old_cell")) - 1)
    )

    cents_t: list[list[float]] = [[float(x) for x in coarse[c]] for c in targets]
    assigned = members
    for _ in range(iters):
        mean_rows = (
            assigned.select("pos", F.posexplode("v").alias("dim", "x"))
            .groupBy("pos", "dim")
            .agg(F.round(F.avg("x"), 4).alias("c"))
            .collect()
        )
        by_pos: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_pos.setdefault(r["pos"], {})[r["dim"]] = r["c"]
        cents_t = [
            [by_pos[p][d] for d in range(len(cents_t[p]))]
            if p in by_pos
            else cents_t[p]
            for p in range(len(targets))
        ]
        assigned = members.withColumn(
            "pos", argmin_pos("v", cents_t).cast("int")
        )

    newc_arr = F.expr(darray2(cents_t))
    res = assigned.select(
        "id",
        "old_cell",
        F.element_at(t_arr, F.col("pos") + 1).alias("new_cell"),
        F.zip_with(
            "v", F.element_at(newc_arr, F.col("pos") + 1), lambda a, b: a - b
        ).alias("r"),
    )
    code_cols = [
        argmin_pos(f"slice(r, {j * w + 1}, {w})", codebooks[j])
        .cast("int")
        .alias(f"code{j}")
        for j in range(m)
    ]
    moves = res.select("id", "old_cell", "new_cell", *code_cols)
    new_index = index.filter(~F.col("list_id").isin(targets)).unionByName(
        moves.select(
            "id",
            F.col("new_cell").alias("list_id"),
            *[F.col(f"code{j}") for j in range(m)],
        )
    )
    new_coarse = [
        cents_t[targets.index(c)] if c in targets else list(coarse[c])
        for c in range(len(coarse))
    ]
    # CHECKPOINT OWNERSHIP: both returned frames derive from the ONE
    # `members` checkpoint, so its ids ride `moves` ALONE — releasing a
    # frame that does not own the blocks it shares would truncate the
    # sibling's lineage mid-flight. Release `moves` (or blanket
    # release_all_storage) only after BOTH frames are dead.
    return (new_index, new_coarse, propagate_checkpoint_ids(moves, members))


def ivfadc_split_cell(
    df: DataFrame,
    index: DataFrame,
    coarse: list,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell: "int | None" = None,
    iters: int = 1,
) -> "tuple[DataFrame, list, DataFrame]":
    """HOT-CELL SPLIT — :func:`ivfadc_rebalance`'s sibling that GROWS
    the index: the target cell (default: the most populated, count-desc
    / id-asc) is split in two with ``kmeans_lloyd``'s exact discipline
    at k=2 over its members (seeds = the 2 lowest-id members' vectors
    rounded to 4; ``iters`` × (assign → round-4 mean update), final
    assignment after the loop; emptied seed keeps its centroid).
    Sub-cluster 0 keeps the cell's id, sub-cluster 1 becomes the NEW
    cell ``len(coarse)`` — appended, so existing cell ids (and their
    partition directories) never renumber. Members re-encode against
    their sub-centroid with the UNCHANGED codebooks; every other cell
    is untouched BYTES, giving the same serve-equality contract as the
    rebalance. This is the standard remedy when one cell's population
    makes probes that hit it scan too much (inverted-list growth
    management, Jégou et al. 2011 §V): split work ∝ hot-cell rows, and
    a partitioned index writes one rewritten + one new partition.

    Returns ``(new_index, new_coarse, moves)`` with the
    :func:`ivfadc_rebalance` schemas (``new_coarse`` has one more
    entry; q260's oracle pins the moves frame end-to-end)."""
    from ..storage import propagate_checkpoint_ids, tracked_local_checkpoint

    m = len(codebooks)
    w = len(codebooks[0][0])
    if cell is None:
        census = (
            index.groupBy("list_id")
            .count()
            .orderBy(F.desc("count"), "list_id")
            .limit(1)
            .collect()  # bounded: n_lists rows ranked
        )
        cell = int(census[0]["list_id"])
    emb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    members = tracked_local_checkpoint(
        emb.join(
            index.filter(F.col("list_id") == cell).select("id"), "id"
        )
    )
    seed_rows = (
        members.orderBy("id")
        .limit(2)
        .select(F.transform("v", lambda x: F.round(x, 4)).alias("c"))
        .collect()
    )
    if len(seed_rows) < 2:
        raise ValueError(f"ivfadc_split_cell: cell {cell} has < 2 members")
    cents_s: list[list[float]] = [list(r["c"]) for r in seed_rows]
    for _ in range(iters):
        assigned = members.withColumn("pos", argmin_pos("v", cents_s))
        mean_rows = (
            assigned.select("pos", F.posexplode("v").alias("dim", "x"))
            .groupBy("pos", "dim")
            .agg(F.round(F.avg("x"), 4).alias("c"))
            .collect()
        )
        by_pos: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_pos.setdefault(r["pos"], {})[r["dim"]] = r["c"]
        cents_s = [
            [by_pos[p][d] for d in range(len(cents_s[p]))]
            if p in by_pos
            else cents_s[p]
            for p in range(2)
        ]
    new_id = len(coarse)
    cents_arr = F.expr(darray2(cents_s))
    fin = members.withColumn("pos", argmin_pos("v", cents_s).cast("int"))
    res = fin.select(
        "id",
        F.lit(cell).cast("int").alias("old_cell"),
        F.when(F.col("pos") == 0, F.lit(cell))
        .otherwise(F.lit(new_id))
        .cast("int")
        .alias("new_cell"),
        F.zip_with(
            "v", F.element_at(cents_arr, F.col("pos") + 1), lambda a, b: a - b
        ).alias("r"),
    )
    code_cols = [
        argmin_pos(f"slice(r, {j * w + 1}, {w})", codebooks[j])
        .cast("int")
        .alias(f"code{j}")
        for j in range(m)
    ]
    moves = res.select("id", "old_cell", "new_cell", *code_cols)
    new_index = index.filter(F.col("list_id") != cell).unionByName(
        moves.select(
            "id",
            F.col("new_cell").alias("list_id"),
            *[F.col(f"code{j}") for j in range(m)],
        )
    )
    new_coarse = [
        cents_s[0] if c == cell else list(coarse[c]) for c in range(len(coarse))
    ] + [cents_s[1]]
    # see ivfadc_rebalance: the `members` checkpoint is owned by `moves`
    # alone; release it only after both returned frames are dead.
    return (new_index, new_coarse, propagate_checkpoint_ids(moves, members))


def lsh_multiprobe_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 2,
    rerank: str = "jvm",
) -> DataFrame:
    """MULTI-PROBE SRP-LSH top-k [Lv et al. 2007, single-bit-flip
    variant]: the corpus is indexed exactly like :func:`lsh_topk` (one
    ``bits``-bit signature per table), but each QUERY probes its own
    bucket PLUS the ``multiprobe`` buckets reached by flipping the
    sign bits with the smallest |margin| (= |dot(v, plane)|, the bits
    most likely to disagree for a true near neighbor). Recall rises
    without more tables — i.e. without growing the INDEX — the
    production trade when memory bounds table count; probing cost is
    (1+multiprobe)× query-side bucket lookups, corpus side unchanged.

    Candidate supersets are monotone: multiprobe=0 reproduces
    :func:`lsh_topk`'s candidates exactly (property-tested). Flip
    order is deterministic cross-engine (margins ROUND-9 with bit-index
    tiebreak, and measured margins ≫ float noise), so the DuckDB
    oracle (registry q251) replays signatures, flips, probes, and the
    q40-discipline re-rank in full."""
    def sig_and_flips(vec, planes, n_flips):
        dots = [
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for plane in planes
        ]
        base = None
        for i, d in enumerate(dots):
            bit = F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
            base = bit if base is None else base.bitwiseOR(bit)
        if not n_flips:
            return F.array(base)
        margins = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.round(F.abs(d), 9).alias("m"), F.lit(i).alias("i")
                    )
                    for i, d in enumerate(dots)
                ]
            )
        )
        probes = [base]
        for p in range(n_flips):
            # column-valued shift amount → call_function (F.shiftleft
            # accepts only a Python int for numBits)
            flip_bit = F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.element_at(margins, p + 1)["i"],
            )
            probes.append(base.bitwiseXOR(flip_bit))
        return F.array(*probes)

    def with_sigs(df: DataFrame, idn: str, n_flips: int) -> DataFrame:
        per_table = [
            F.struct(
                F.lit(ti).alias("tbl"),
                sig_and_flips(
                    F.col("__v"), _planes(dim, bits, seed + ti), n_flips
                ).alias("sigs"),
            )
            for ti in range(tables)
        ]
        return (
            df.select(
                F.col(id_col).alias(idn),
                F.col(vec_col).cast("array<double>").alias("__v"),
                l2_norm(F.col(vec_col)).alias(f"{idn}_n"),
            )
            .select(
                idn,
                F.col("__v").alias(f"{idn}_v"),
                f"{idn}_n",
                F.explode(F.array(*per_table)).alias("ts"),
            )
            .select(
                idn,
                f"{idn}_v",
                f"{idn}_n",
                "ts.tbl",
                F.explode("ts.sigs").alias("sig"),
            )
        )

    q = with_sigs(queries, "query_id", multiprobe)
    c = with_sigs(corpus, "neighbor_id", 0)
    cand = (
        q.join(c, on=["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("query_id_v").alias("qv"),
            F.col("query_id_n").alias("qn"),
            F.col("neighbor_id_v").alias("cv"),
            F.col("neighbor_id_n").alias("cn"),
        )
        .distinct()
    )
    scored = _score_pairs(cand, rerank)
    wnd = Window.partitionBy("query_id").orderBy(
        F.round("cos", 6).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"))
    )
