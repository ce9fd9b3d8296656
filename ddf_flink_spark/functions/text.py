"""Text-analysis operators for LLM training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These are extensions beyond the reference surface (SURVEY §7.2 step 9) —
the reference has no text functions at all (§2.9). Everything here stays
JVM-side (``pyspark.sql.functions``, whole-stage codegen) — no Python UDFs
in any hot path, so a 100 TB documents table is one codegen'd map stage.

Design notes for oracle-ability: hashing uses MD5 (identical across
engines) rather than xxhash64 (engine-specific); regex character classes
use ASCII-literal ranges so Java regex and RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "quality_features",
    "quality_score",
    "language_id",
    "fingerprint",
    "redact_pii",
    "token_chunks",
    "cdc_chunks",
    "bigram_lm_scores",
    "word_freqs",
    "bpe_pair_counts",
    "bpe_learn",
    "STOPWORDS",
]

# Small high-frequency marker lists per language (public knowledge).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "por", "una", "con"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, lowercased. Kept deliberately simple so the DuckDB
    oracle (string_split) computes the identical list."""
    return F.split(F.lower(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-approximating token count: words + punctuation runs + digit runs
    counted separately (a common ~x0.75 chars-per-token heuristic is NOT
    used — we count actual regex matches).

    ``regexp_count`` with an ASCII pattern behaves identically in Spark
    (Java regex) and DuckDB (RE2)."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))


def _non_ascii_len(col: Column | str) -> Column:
    """Characters outside printable ASCII — the CJK/script signal.
    Oracle mirror: ``LENGTH(REGEXP_REPLACE(text, '[ -~]', '', 'g'))``."""
    return F.length(F.regexp_replace(col, "[ -~]", ""))


def language_id(col: Column | str) -> Column:
    """Heuristic language ID over {en, de, fr, es, zh}:

    1. if >30% of characters are non-ASCII → ``zh`` (CJK-script signal);
    2. else argmax of per-language marker-stopword hit counts, tie-broken
       in fixed order en > de > fr > es; no hits at all → ``und``.

    Pure expression tree (split + filter + size + CASE): codegen'd,
    shuffle-free, linear scan at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)

    def marker_hits(lang: str):
        words = STOPWORDS[lang]
        return F.size(F.filter(toks, lambda tok: tok.isin(*words)))

    hits = {lang: marker_hits(lang) for lang in STOPWORDS}
    is_zh = _non_ascii_len(c) * 10 > F.length(c) * 3
    best = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]) & (hits["en"] > 0),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]) & (hits["de"] > 0), F.lit("de"))
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] > 0), F.lit("fr"))
        .when(hits["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return F.when(is_zh, F.lit("zh")).otherwise(best)


def quality_features(col: Column | str) -> dict[str, Column]:
    """Per-document quality signals, each a single JVM expression:

    * n_chars, n_tokens
    * mean_token_len — chars per whitespace token
    * punct_ratio — punctuation chars / chars
    * stopword_ratio — English-marker tokens / tokens (content-vs-boilerplate)
    * digit_ratio — digit chars / chars
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - n_tokens + 1) / n_tokens,
        "punct_ratio": F.length(F.regexp_replace(c, "[^.,;:!?'\"-]", "")) / n_chars,
        "stopword_ratio": F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))) / n_tokens,
        "digit_ratio": F.length(F.regexp_replace(c, "[^0-9]", "")) / n_chars,
    }


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: rewards mid-length documents with low
    punctuation/digit noise and a natural stopword rate (Gopher-rule
    flavored, public heuristics)."""
    f = quality_features(col)
    length_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), F.lit(1.0)).otherwise(F.lit(0.2))
    noise = f["punct_ratio"] + f["digit_ratio"]
    noise_ok = F.when(noise < 0.2, 1.0 - noise).otherwise(F.lit(0.2))
    stop_ok = F.when(f["stopword_ratio"] > 0.01, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(length_ok * noise_ok * stop_ok, 4)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: MD5 of the
    whitespace-normalized, lowercased text. MD5 (not xxhash64) so any
    engine computes the identical fingerprint — the cross-system dedup key.
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.trim(F.lower(c)), "\\s+", " ")
    return F.md5(normalized)


# Regexes shared with the DuckDB oracles: plain ASCII classes, no
# backreferences/lookaround, so Java regex (Spark) and RE2 (DuckDB) agree.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


def redact_pii(col: Column | str) -> Column:
    """Redact PII spans (emails, IPv4 addresses) with fixed placeholder
    tokens — the scrubbing pass every training corpus gets before use.

    Pure ``regexp_replace`` composition: JVM-side, codegen'd, no UDF —
    a 100 TB corpus pays one map stage. Patterns are RE2-compatible so
    external systems (and the DuckDB oracle) compute byte-identical
    output."""
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, IPV4_RE, "<IP>")


def token_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window packing primitive for LLM training data.

    Windows start at token 1, 1+stride, 1+2·stride, … and stop as soon
    as the previous window already reaches the document end (a start is
    emitted only while ``start - stride + size - 1 < n``), so every
    token lands in ≥1 chunk, consecutive full windows overlap by
    ``size - stride`` tokens, the final window may be shorter (never
    padded), and no window is fully contained in its predecessor. One
    ``sequence`` + ``posexplode`` + ``slice`` per document: linear in
    corpus bytes, zero cross-document work, and the output inherits the
    input's partitioning (no shuffle).

    Text is whitespace-split AS-IS — chunking packages the original
    training text, so unlike the shingle/count paths (``tokens()``) it
    must NOT normalize case.

    Returns (id, chunk_id, chunk_text, chunk_tokens); chunk_id is the
    0-based window index within the document."""
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - size + stride, F.lit(1)),
        F.lit(stride),
    )
    piece = F.slice(F.col("ts"), F.col("start"), size)
    return (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("ts"),
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .select(
            "id",
            "chunk_id",
            F.concat_ws(" ", piece).alias("chunk_text"),
            F.size(piece).alias("chunk_tokens"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    divisor: int = 8,
) -> DataFrame:
    """CONTENT-DEFINED CHUNKING: split each document at positions where
    the rolling hash of the trailing ``window`` tokens is ≡ 0 mod
    ``divisor`` — the dedup-friendly chunking discipline (rsync/LBFS
    lineage): because boundaries depend only on LOCAL content, inserting
    a paragraph shifts at most the chunks it touches, so unchanged
    regions keep their fingerprints — unlike fixed-stride chunks
    (:func:`token_chunks`/q164), where one inserted token re-fingerprints
    every downstream chunk of the document.

    Expected chunk length is ``divisor`` tokens. The "rolling hash" is
    the cross-engine md5 of each token 4-gram (built shingle-style via
    zipped shifted slices — zero HOFs), a boundary cut AFTER the gram's
    last token; chunk membership is a per-document prefix sum of
    boundary flags (window frame ending 1 PRECEDING), and chunk text
    reassembles via ``array_sort(collect_list(struct(pos, tok)))`` +
    field extraction — all codegen'd. Work is linear in corpus tokens;
    the only shuffles are the per-document window and the (id, chunk)
    groupBy, both partitioned by doc — no cross-document traffic.

    Returns (id, chunk_id, chunk_text, n_toks, fp) — fp is the md5 hex
    of the chunk text, the cross-document dedup key (registry q180 rolls
    shared-chunk stats from it)."""
    from pyspark.sql.window import Window

    from .dedup import md5_long

    toks = F.split(F.lower(F.col(text_col)), " ")
    m = F.greatest(F.size(toks) - (window - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(window)])
    grams = df.select(
        F.col(id_col).alias("id"), F.posexplode(zipped).alias("j", "z")
    ).select(
        "id",
        (F.col("j") + window - 1).alias("pos"),
        F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(window)]).alias("g"),
    )
    flags = grams.select(
        "id", "pos", (md5_long(F.col("g")) % divisor == 0).cast("int").alias("b")
    )
    tokrows = df.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok")
    )
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    assigned = (
        tokrows.join(flags, ["id", "pos"], "left")
        .withColumn("chunk_id", F.coalesce(F.sum("b").over(w), F.lit(0)))
    )
    ordered = F.array_sort(F.collect_list(F.struct("pos", "tok")))
    return (
        assigned.groupBy("id", "chunk_id")
        .agg(
            F.array_join(ordered.getField("tok"), " ").alias("chunk_text"),
            F.count(F.lit(1)).alias("n_toks"),
        )
        .withColumn("fp", F.md5("chunk_text"))
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document bigram language-model perplexity — the classic
    corpus-LM quality filter of LLM data pipelines (CCNet-style: train a
    cheap LM on the corpus, flag documents the model finds surprising).
    The model IS the corpus: add-one-smoothed bigram probabilities

        P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)

    and each document scores perplexity = exp(mean -ln P over its
    bigrams). Returns (id, n_bigrams, ppl).

    Distribution: tokenize → one explode for unigram counts, one
    zip_with+explode for bigrams; counts are two hash aggregations;
    scoring joins the exploded bigrams back to the two count tables on
    their natural keys. At 100 TB the count tables are Zipf-shaped but
    BOUNDED by vocabulary (≪ corpus), and every join key is a token —
    no driver state, no per-doc Python.

    Oracle-ability: nll is rounded to 6 digits and summed as
    DECIMAL(28,6) — exact, order-independent — so any engine reproduces
    the identical perplexity despite double-summation order differing
    (the q154 round-sync discipline applied to float reductions)."""
    from pyspark.sql.types import DecimalType

    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    uni = base.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    vocab = uni.select(F.countDistinct("w")).collect()[0][0]
    pairs = F.zip_with(
        "t",
        F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        base.select("id", F.explode(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    bcnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    nll = F.round(
        -F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.lit(float(vocab)))), 6
    )
    scored = (
        bg.join(bcnt, ["w1", "w2"])
        .join(ucnt, bg.w1 == ucnt.w)
        .select("id", nll.cast(DecimalType(28, 6)).alias("nll"))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.exp(F.sum("nll").cast("double") / F.count(F.lit(1))), 4
        ).alias("ppl"),
    )


# ------------------------------------------------------------------- BPE
def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) corpus word-frequency table — BPE's working set.
    One explode + one groupBy; every later BPE round operates on
    DISTINCT words weighted by freq, so per-round cost is O(|vocab|)
    not O(corpus)."""
    from .dedup import ensure_compute_parallelism

    df = ensure_compute_parallelism(df)
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols_col(word: Column) -> Column:
    """Initial BPE symbol sequence: characters + the terminal '</w>'."""
    return F.concat(F.split(word, ""), F.array(F.lit("</w>")))


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, pair_count) — adjacent-symbol pair frequencies over
    a (word, freq, symbols?) table (the statistic BPE greedily maximizes
    [Sennrich et al. 2016]). Weighted by word freq; symbols default to
    chars + '</w>'. Shape: zip of two shifted slices (codegen'd, the
    exploded_shingles trick), explode, one groupBy — map-side
    combinable, shuffle carries (pair, partial count)."""
    syms = (
        F.col("symbols")
        if "symbols" in words.columns
        else _symbols_col(F.col("word"))
    )
    n = F.size(syms)
    pairs = F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("l"), F.slice(syms, 2, n - 1).alias("r")
    )
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .select("freq", F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> "tuple[list[tuple[str, str]], DataFrame]":
    """Byte-pair-encoding vocabulary learning [Sennrich et al. 2016],
    distributed: returns (merge list in order, final (word, freq,
    symbols) table). Each round: adjacent-pair counts over the weighted
    vocab (one explode + groupBy), greedy argmax with (count DESC,
    left, right) tie-break — fully deterministic — then the merge is
    applied to every word's symbol array in an Arrow-batched
    mapInPandas (left-to-right non-overlapping, the standard BPE
    semantics; a per-row pure function, embarrassingly parallel).

    Scale: the state is the DISTINCT-word table (vocab-sized, not
    corpus-sized); each round is one bounded aggregation + one map
    pass; the vocab frame is checkpointed per round (lineage would
    otherwise grow by two stages per merge) and the previous round's
    checkpoint is released immediately. The first-round statistic is
    oracle-checked cross-engine (registry q211); the merge loop is
    pinned by a golden test against a pure-Python reference
    implementation (tests/test_llm_ops.py)."""
    from ..storage import release_checkpoint, tracked_local_checkpoint

    words = tracked_local_checkpoint(
        word_freqs(df, text_col).select(
            "word", "freq", _symbols_col(F.col("word")).alias("symbols")
        )
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            bpe_pair_counts(words)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))

        def apply_merge(batches, _l=left, _r=right):
            import pandas as pd

            for pdf in batches:
                out_syms = []
                for syms in pdf["symbols"]:
                    syms = list(syms)
                    merged, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == _l
                            and syms[i + 1] == _r
                        ):
                            merged.append(_l + _r)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    out_syms.append(merged)
                yield pd.DataFrame(
                    {"word": pdf["word"], "freq": pdf["freq"], "symbols": out_syms}
                )

        new_words = tracked_local_checkpoint(
            words.mapInPandas(
                apply_merge, schema="word string, freq long, symbols array<string>"
            )
        )
        release_checkpoint(words)
        words = new_words
    return merges, words


def passage_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens: int = 8,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Explode every ``n_tokens``-token window (stride 1) of each doc to
    one row with its cross-engine 60-bit hash: (id, *extra, h). The
    passage-granularity index under q220's duplication report — shuffle
    carries hashes, never window text; O(tokens) rows."""
    from .dedup import ensure_compute_parallelism, md5_long

    df = ensure_compute_parallelism(df)
    extra = list(extra_cols or [])
    toks = df.select(
        F.col(id_col).alias("id"), *extra, tokens(text_col).alias("ts")
    ).filter(F.size("ts") >= n_tokens)
    return toks.select(
        "id",
        *extra,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - (n_tokens - 1)),
                lambda i: F.concat_ws(" ", F.slice("ts", i, n_tokens)),
            )
        ).alias("w"),
    ).select("id", *extra, md5_long(F.col("w")).alias("h"))


def passage_duplication(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_tokens: int = 8,
) -> DataFrame:
    """Per-group duplicated-passage rate (Lee et al. 2022 exact-substring
    dedup at window granularity): a window is duplicated when its hash
    occurs in >1 distinct doc. Returns (group, n_windows, n_dup_windows,
    dup_rate). Registry q220 is the oracle-checked instance."""
    wins = passage_windows(df, text_col, id_col, n_tokens, [group_col])
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h", F.lit(1).alias("is_dup"))
    )
    return (
        wins.join(dup, "h", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_dup_windows"),
            F.round(
                F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy(group_col)
    )


def repetition_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-doc within-document repetition: 1 − distinct/total over
    ``n``-gram windows — the degenerate-text signal (loops, stuffing).
    Returns (id, n_grams, rep). Registry q221 rolls it up per language
    with the exact-int-sum mean discipline."""
    from .dedup import ensure_compute_parallelism

    df = ensure_compute_parallelism(df)
    grams = (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("ts"))
        .filter(F.size("ts") >= n)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("ts", i, n)),
                )
            ).alias("g"),
        )
    )
    return grams.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        (
            F.lit(1.0) - F.countDistinct("g") / F.count(F.lit(1)).cast("double")
        ).alias("rep"),
    )


def kl_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty vs the corpus: KL(p_doc ‖ p_corpus) over
    unigram distributions — Σ_w p_d(w)·ln(p_d(w)/p_C(w)). High scores
    surface out-of-distribution documents (the curation triage signal:
    both treasure and garbage live in the tail). Every per-word term is
    ROUND(term·1e9) summed as exact int64 (the q162 discipline), so the
    score — and any ranking on it — is shuffle-order independent and
    engine-replayable despite libm ln() ulp differences. Returns
    (id, n_tokens, kl9) with kl9 the exact scaled-integer sum; divide by
    1e9 for the nats value. Shuffle profile: one token explode, keyed
    aggregations, two dimension joins (corpus word counts; doc lengths)
    — O(tokens) rows, the vocabulary table never funnels through one
    partition."""
    from .dedup import ensure_compute_parallelism

    df = ensure_compute_parallelism(df)
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("w"))
    dlen = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    corpus = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    total = toks.agg(F.count(F.lit(1)).alias("nn"))
    dw = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    pd_ = F.col("c") / F.col("n").cast("double")
    pc = F.col("cw") / F.col("nn").cast("double")
    terms = (
        dw.join(dlen, "id")
        .join(corpus, "w")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            "n",
            F.round(pd_ * F.log(pd_ / pc) * 1e9).cast("long").alias("t9"),
        )
    )
    return terms.groupBy("id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.sum("t9").cast("long").alias("kl9"),
    )
