"""Property-based tests (hypothesis) over the pure-Python surfaces, plus a
seeded pandas differential for resample_gapfill.

The reference's harness is entirely example-based (SURVEY §5); these
generate thousands of adversarial inputs per run for the parsing/inference
layers — the places where hand-picked examples miss edge cases. Spark-side
operators get seeded randomized differentials instead (one Spark job per
hypothesis example would be prohibitively slow)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ddf_flink_spark.sources.csv import infer_column_types
from ddf_flink_spark.sql.preparser import (
    TYPE_ALIASES,
    CreateTable,
    Load,
    parse_statement,
    substitute_this,
)

# --------------------------------------------------------- type inference

_int_cells = st.integers(-10**12, 10**12).map(str)
_double_cells = st.floats(
    allow_nan=False, allow_infinity=False, width=32
).map(lambda f: repr(float(f)))
_bool_cells = st.sampled_from(["T", "F", "true", "false", "TRUE", "FALSE"])
_na_cells = st.sampled_from(["NA", ""])
_string_cells = st.text(
    alphabet=st.characters(blacklist_characters=",\n\r", max_codepoint=0x2FF),
    min_size=1,
    max_size=12,
)


def _column(cells, n):
    return st.lists(cells, min_size=n, max_size=n)


@given(st.integers(1, 8).flatmap(lambda n: _column(st.one_of(_int_cells, _na_cells), n)))
def test_infer_int_columns(col):
    rows = [[c] for c in col]
    t = infer_column_types(rows)[0]
    assert t == ("string" if all(c.strip() in ("NA", "") for c in col) else "int")


@given(
    st.integers(2, 8).flatmap(
        lambda n: _column(st.one_of(_int_cells, _double_cells, _na_cells), n)
    )
)
def test_infer_numeric_lattice_soundness(col):
    """Whatever the lattice outputs must be able to represent every non-NA
    cell: int ⇒ all ints; double ⇒ all floats; never boolean."""
    rows = [[c] for c in col]
    t = infer_column_types(rows)[0]
    non_na = [c.strip() for c in col if c.strip() not in ("NA", "")]
    if t == "int":
        for c in non_na:
            int(c)  # must not raise
    elif t == "double":
        for c in non_na:
            float(c)  # must not raise
    else:
        assert t == "string" and not non_na


@given(
    st.lists(st.one_of(_int_cells, _double_cells, _bool_cells, _string_cells), min_size=1, max_size=8)
)
def test_infer_na_injection_never_changes_type(col):
    """Appending NA/empty cells never changes an inferred column type."""
    rows = [[c] for c in col]
    with_na = rows + [["NA"], [""]]
    assert infer_column_types(rows) == infer_column_types(with_na)


# -------------------------------------------------------------- preparser

_ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,15}", fullmatch=True)
_sql_type = st.sampled_from(sorted(TYPE_ALIASES))


@given(
    table=_ident,
    cols=st.lists(st.tuples(_ident, _sql_type), min_size=1, max_size=8),
    spacing=st.sampled_from([" ", "  ", "\n "]),
)
def test_create_table_parse_roundtrip(table, cols, spacing):
    body = ",".join(f"{spacing}{n}{spacing}{t}" for n, t in cols)
    stmt = f"CREATE TABLE {table} ({body})"
    ast = parse_statement(stmt)
    assert isinstance(ast, CreateTable)
    assert ast.table == table
    assert ast.columns == [(n, TYPE_ALIASES[t]) for n, t in cols]


_path_text = st.text(
    alphabet=st.characters(blacklist_characters="'\n\r", min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=20,
)


@given(
    url=_path_text,
    table=_ident,
    sep=st.sampled_from([",", ";", "|", "\t"]),
    null=st.one_of(st.none(), st.sampled_from(["NA", "null", "?"])),
    empty=st.one_of(st.none(), st.sampled_from(["", "-"])),
    nodef=st.booleans(),
)
def test_load_parse_all_option_combinations(url, table, sep, null, empty, nodef):
    stmt = f"LOAD '{url}'"
    if sep != ",":
        stmt += f" DELIMITED BY '{sep}'"
    if null is not None:
        stmt += f" WITH NULL '{null}'"
    if empty is not None:
        stmt += f" WITH EMPTY '{empty}'"
    if nodef:
        stmt += " NO DEFAULTS"
    stmt += f" INTO {table}"
    ast = parse_statement(stmt)
    assert isinstance(ast, Load)
    assert (ast.url, ast.table) == (url, table)
    assert ast.delimiter == sep
    assert ast.null_value == null
    assert ast.empty_value == empty
    assert ast.use_defaults is (not nodef)


@given(name=_ident, pre=_ident, post=_ident)
def test_substitute_this_word_boundary(name, pre, post):
    """@this substitutes as a whole token wherever it appears; @this
    followed by more word characters is a different token and untouched."""
    out = substitute_this(
        f"SELECT {pre} FROM @this JOIN {post} ON @this.id = {post}.id", name
    )
    assert out == f"SELECT {pre} FROM {name} JOIN {post} ON {name}.id = {post}.id"
    # suffix continues the word => no boundary => untouched
    untouched = f"SELECT {pre} FROM @this{post}"
    assert substitute_this(untouched, name) == untouched


@given(stmt=st.text(max_size=60))
def test_parse_statement_total(stmt):
    """parse_statement never crashes on arbitrary input: it returns an AST
    or passes the string through (ValueError only for CREATE with a bad
    column list, which requires the CREATE prefix)."""
    try:
        res = parse_statement(stmt)
    except ValueError:
        assert stmt.lstrip().lower().startswith("create")
    else:
        assert isinstance(res, (CreateTable, Load, str))


# ---------------------------------- resample_gapfill pandas differential


def test_resample_gapfill_matches_pandas(spark):
    """Seeded randomized differential: resample_gapfill vs
    pandas resample('...').last().ffill() per key."""
    import numpy as np
    import pandas as pd

    from ddf_flink_spark.operators.timeseries import resample_gapfill

    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(5, 80))
        v = rng.normal(size=n).round(4)
        v[rng.random(n) < 0.3] = np.nan  # exercise null-value buckets
        pdf = pd.DataFrame(
            {
                "k": rng.integers(0, 3, n).astype("int64"),
                "ts": pd.to_datetime(
                    rng.choice(np.arange(0, 3_000_000, 1), n, replace=False), unit="s"
                ),
                "eid": np.arange(n, dtype="int64"),
                "v": v,
            }
        )
        rows = [
            (int(r.k), r.ts.to_pydatetime(), int(r.eid),
             None if pd.isna(r.v) else float(r.v))
            for r in pdf.itertuples()
        ]
        got = resample_gapfill(
            spark.createDataFrame(rows, "k long, ts timestamp, eid long, v double"),
            ts_col="ts",
            key_cols=["k"],
            interval="1 day",
            value_col="v",
            tiebreak_col="eid",
        ).toPandas()
        for k, grp in pdf.groupby("k"):
            exp = (
                grp.sort_values(["ts", "eid"])
                .set_index("ts")["v"]
                .resample("1D")
                .last()
                .ffill()
            )
            sub = got[got.k == k].set_index("bucket").sort_index()
            assert len(sub) == len(exp), f"trial {trial} key {k}"
            a, b = sub["filled_value"].to_numpy(), exp.to_numpy()
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), (
                f"trial {trial} key {k}"
            )


def test_token_chunks_matches_python_reference(spark):
    """Seeded randomized differential: token_chunks vs a transparent
    pure-Python re-derivation of the window rule (starts every `stride`
    while the previous window hasn't reached the end; slices clamp)."""
    import numpy as np

    from ddf_flink_spark.functions.text import token_chunks

    rng = np.random.default_rng(7)
    docs = []
    for i in range(40):
        n = int(rng.integers(0, 40))
        docs.append((i, " ".join(f"T{int(rng.integers(0, 9))}x{j}" for j in range(n))))
    size = int(rng.integers(3, 12))
    stride = int(rng.integers(1, size + 1))

    def py_chunks(text):
        toks = text.split(" ")
        n = len(toks)
        out, s = [], 1
        stop = max(n - size + stride, 1)
        while s <= stop:
            piece = toks[s - 1 : s - 1 + size]
            out.append((" ".join(piece), len(piece)))
            s += stride
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["chunk_id"]): (r["chunk_text"], r["chunk_tokens"])
        for r in token_chunks(df, "text", "doc_id", size=size, stride=stride).collect()
    }
    expect = {
        (i, ci): ch
        for i, text in docs
        for ci, ch in enumerate(py_chunks(text))
    }
    assert got == expect


def test_sample_to_budget_matches_pandas(spark):
    """Seeded randomized differential: sample_to_budget vs pandas
    groupby-cumsum prefix selection on a unique order key."""
    import numpy as np
    import pandas as pd

    from ddf_flink_spark.operators.sampling import sample_to_budget

    rng = np.random.default_rng(23)
    for _trial in range(3):
        n = int(rng.integers(10, 120))
        pdf = pd.DataFrame(
            {
                "g": rng.integers(0, 4, n).astype("int64"),
                "key": rng.permutation(n).astype("int64"),
                "w": rng.integers(1, 50, n).astype("int64"),
            }
        )
        budget = int(rng.integers(20, 200))
        got = sample_to_budget(
            spark.createDataFrame(pdf), "g", "w", budget, "key"
        ).toPandas()
        srt = pdf.sort_values(["g", "key"])
        keep = srt[srt.groupby("g")["w"].cumsum() <= budget]
        assert sorted(map(tuple, got[["g", "key", "w"]].values.tolist())) == sorted(
            map(tuple, keep[["g", "key", "w"]].values.tolist())
        )


# ---------------------------------------------------------------- round 3
def test_bigram_lm_matches_pure_python_on_random_corpus(spark):
    """Differential: bigram_lm_scores vs an independent pure-Python LM on
    a seeded random corpus (same add-one smoothing, same round-sync)."""
    import math
    import random

    from ddf_flink_spark.functions.text import bigram_lm_scores

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # pure-python reference
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _, text in docs:
        ws = text.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    expect = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        nlls = [
            round(-math.log((bi[(a, b)] + 1) / (uni[a] + V)), 6)
            for a, b in zip(ws, ws[1:])
        ]
        if nlls:
            expect[doc_id] = (len(nlls), round(math.exp(sum(nlls) / len(nlls)), 4))

    got = {
        r["id"]: (r["n_bigrams"], float(r["ppl"]))
        for r in bigram_lm_scores(df, "text", "doc_id").collect()
    }
    assert got == expect


def test_quantize_dequantize_error_bound(spark):
    """Property: |x - code*scale| <= scale/2 for every in-range component
    (quantization error of round-to-nearest is at most half a step)."""
    import random

    from ddf_flink_spark.functions.similarity import quantize_embeddings

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-3, 3) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = {r["id"]: r["codes"] for r in quantize_embeddings(df).collect()}
    maxabs = [max(abs(v[d]) for _, v in rows) for d in range(8)]
    scales = [m / 127 for m in maxabs]
    for i, vec in rows:
        for d, x in enumerate(vec):
            err = abs(x - codes[i][d] * scales[d])
            assert err <= scales[d] / 2 + 1e-12, (i, d, x, codes[i][d])


def test_jsonl_inference_lattice_hypothesis():
    """infer_jsonl_schema: the resolved type always admits every sampled
    value (soundness) and never widens past string (lattice top)."""
    import json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ddf_flink_spark.sources.jsonl import infer_jsonl_schema

    scalar = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**31), max_value=2**31),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(alphabet="abcXYZ09_", max_size=8),
    )
    rows = st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b", "c"]), scalar, min_size=1, max_size=3
        ),
        min_size=1,
        max_size=6,
    )

    @given(rows)
    @settings(max_examples=60, deadline=None)
    def check(objs):
        lines = [json.dumps(o) for o in objs]
        schema = infer_jsonl_schema(lines)
        resolved = {}
        for part in (schema.split(", ") if schema else []):
            k, t = part.split(" ", 1)
            resolved[k] = t
        for o in objs:
            for k, v in o.items():
                t = resolved[k]
                if v is None:
                    continue  # any type admits null
                if isinstance(v, bool):
                    assert t in ("boolean", "string")
                elif isinstance(v, int):
                    assert t in ("bigint", "double", "string")
                elif isinstance(v, float):
                    assert t in ("double", "string")
                else:
                    assert t == "string"

    check()


def test_cdc_chunks_matches_python_reference(spark):
    """cdc_chunks equals a direct Python re-implementation of the
    boundary rule on a random corpus: same chunk count, same texts,
    same fingerprints — and chunk boundaries depend only on local
    4-gram content."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from ddf_flink_spark.functions.text import cdc_chunks

    rng = random.Random(23)
    words = [f"w{i}" for i in range(12)]
    docs = [
        (d, " ".join(rng.choice(words) for _ in range(rng.randint(1, 120))))
        for d in range(30)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id, r.chunk_id): (r.chunk_text, r.n_toks)
        for r in cdc_chunks(df, window=4, divisor=8).collect()
    }

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expected = {}
    for d, text in docs:
        toks = text.lower().split(" ")
        flags = [0] * len(toks)
        for j in range(len(toks) - 3):
            g = " ".join(toks[j : j + 4])
            if md5_long(g) % 8 == 0:
                flags[j + 3] = 1
        chunks = {}
        for pos, tok in enumerate(toks):
            # chunk id = boundaries strictly before pos
            chunks.setdefault(sum(flags[:pos]), []).append(tok)
        for cid, ts in chunks.items():
            expected[(d, cid)] = (" ".join(ts), len(ts))
    assert got == expected


def test_kmv_estimate_monotone_in_true_cardinality(spark):
    """KMV sketch: distinct fractions are a subset of the hash image,
    the estimate is positive, and adding MORE distinct values never
    shrinks the sketch (k smallest of a superset are <= pointwise)."""
    from pyspark.sql import functions as F

    from ddf_flink_spark.functions.sketches import kmv_fractions

    small = spark.range(500).select(F.col("id").alias("v"))
    big = spark.range(2000).select(F.col("id").alias("v"))
    fs = [r.u for r in kmv_fractions(small, "v", k=64).collect()]
    fb = [r.u for r in kmv_fractions(big, "v", k=64).collect()]
    assert len(fs) == len(fb) == 64
    # superset's k-th smallest is <= subset's k-th smallest, pointwise
    assert all(b <= s for b, s in zip(fb, fs))


def test_bpe_merge_invariants(spark):
    """BPE structural invariants on a random-ish corpus: (1) stripping
    '</w>' and concatenating the final symbols reconstructs every word
    exactly; (2) the total symbol count never increases round over
    round (each applied merge strictly shrinks some word or the merge
    list ends); (3) merges are unique."""
    from ddf_flink_spark.functions.text import bpe_learn
    from ddf_flink_spark.storage import release_all_storage

    docs = [
        "abab abab baba ab ab ba",
        "cedar cedar cede ceded cedar",
        "aa bb aa bb cc aa",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    merges, words = bpe_learn(df, n_merges=8)
    rows = words.collect()
    for r in rows:
        rebuilt = "".join(s for s in r.symbols).replace("</w>", "")
        assert rebuilt == r.word, (r.word, list(r.symbols))
        assert r.symbols[-1].endswith("</w>")
    assert len(set(merges)) == len(merges)
    release_all_storage(spark)


def test_histogram_quantile_sketch_merge_equals_whole(spark):
    """Mergeability, the property that makes the sketch a sketch: bin
    counts built on two disjoint halves, cell-wise ADDED, equal the
    single-pass bin counts of the union (same global boundaries)."""
    from pyspark.sql import functions as F

    df = spark.range(10000).select(
        (F.col("id") % 977).cast("double").alias("v")
    )
    mm = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    B = 64

    def bins_of(frame):
        return {
            r.bin: r.c
            for r in frame.crossJoin(F.broadcast(mm))
            .select(
                F.least(
                    F.floor((F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / B)),
                    F.lit(B - 1),
                )
                .cast("long")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    whole = bins_of(df)
    h1 = bins_of(df.filter(F.col("id") < 5000))
    h2 = bins_of(df.filter(F.col("id") >= 5000))
    merged: dict = {}
    for h in (h1, h2):
        for b, c in h.items():
            merged[b] = merged.get(b, 0) + c
    assert merged == whole


def test_prefix_filter_lossless_on_random_corpora(spark):
    """PROPERTY: prefix filtering + PPJoin positional/length pruning is
    LOSSLESS — on randomly generated corpora (random vocab mixes, dup
    planting, varying thresholds) the filtered join's result equals the
    unfiltered exact token-set join, pair for pair, jaccard for
    jaccard. Catches any future pruning-bound regression the fixed
    corpora might miss."""
    import random

    from ddf_flink_spark.functions.dedup import (
        jaccard_candidates,
        prefix_filter_jaccard,
    )
    from ddf_flink_spark.storage import release_all_storage

    rng = random.Random(1234)
    vocab_rare = [f"r{i}" for i in range(200)]
    vocab_common = [f"c{i}" for i in range(6)]
    for trial, threshold in enumerate([0.5, 0.56, 0.7, 0.85]):
        docs = []
        for d in range(25):
            n_common = rng.randint(2, 10)
            n_rare = rng.randint(0, 6)
            toks = [rng.choice(vocab_common) for _ in range(n_common)] + [
                rng.choice(vocab_rare) for _ in range(n_rare)
            ]
            rng.shuffle(toks)
            docs.append((d, " ".join(toks)))
        # plant exact + near dups
        docs.append((25, docs[trial][1]))
        docs.append((26, docs[trial + 1][1] + " extra"))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_filter_jaccard(df, threshold=threshold).collect()
        }
        want = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_candidates(df, threshold=threshold, n=1).collect()
        }
        assert got == want, (threshold, got.keys() ^ want.keys())
        assert (trial, 25) in got and got[(trial, 25)] == 1.0
    release_all_storage(spark)


def test_passage_duplication_matches_python_reference(spark):
    """passage_duplication's per-source duplicated-window rate must equal
    a pure-Python recomputation on random small corpora (windows built by
    hand, duplication = window string in >1 distinct doc)."""
    import random

    from ddf_flink_spark.functions.text import passage_duplication
    from ddf_flink_spark.storage import release_all_storage

    rng = random.Random(225)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        n_tok = 8
        docs = []
        for did in range(14):
            words = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
            docs.append((did, "src" + str(did % 3), " ".join(words)))
        # plant one guaranteed shared passage across two docs/sources
        shared = " ".join(rng.choice(vocab) for _ in range(n_tok + 2))
        docs.append((100, "src0", f"{shared} tail{trial}"))
        docs.append((101, "src1", f"head{trial} {shared}"))

        # python reference
        win_docs: dict[str, set[int]] = {}
        per_doc_windows: dict[int, list[str]] = {}
        for did, _src, text in docs:
            toks = text.lower().split(" ")
            wins = [
                " ".join(toks[i : i + n_tok])
                for i in range(len(toks) - n_tok + 1)
            ] if len(toks) >= n_tok else []
            per_doc_windows[did] = wins
            for w in wins:
                win_docs.setdefault(w, set()).add(did)
        want: dict[str, list[int]] = {}
        for did, src, _text in docs:
            wins = per_doc_windows[did]
            dup = sum(1 for w in wins if len(win_docs[w]) > 1)
            tot, d0 = want.get(src, [0, 0])
            want[src] = [tot + len(wins), d0 + dup]
        want = {s: (t, d) for s, (t, d) in want.items() if t > 0}

        df = spark.createDataFrame(docs, "doc_id long, source string, text string")
        got = {
            r["source"]: (r["n_windows"], r["n_dup_windows"])
            for r in passage_duplication(df, n_tokens=n_tok).collect()
        }
        assert got == want, (trial, got, want)
        release_all_storage(spark)


def test_repetition_ratio_matches_python_reference(spark):
    """repetition_ratio must equal 1 - distinct/total 3-grams recomputed
    in pure Python on random corpora."""
    import random

    from ddf_flink_spark.functions.text import repetition_ratio

    rng = random.Random(226)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (did, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for did in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: (r["n_grams"], round(r["rep"], 9)) for r in repetition_ratio(df).collect()}
    for did, text in docs:
        toks = text.split(" ")
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        want = (len(grams), round(1.0 - len(set(grams)) / len(grams), 9))
        assert got[did] == want, (did, got[did], want)


def test_jpeg_truncated_stream_raises(spark):
    """A JPEG cut off mid-entropy-stream must raise, not return garbage
    stats (IndexError/AssertionError both acceptable — loud, not wrong)."""
    import numpy as np
    import pytest as _pytest

    from ddf_flink_spark.functions.multimodal import (
        jpeg_decode_baseline,
        jpeg_encode_baseline,
    )

    y = np.random.default_rng(9).integers(0, 256, (16, 16), dtype=np.uint8)
    blob = jpeg_encode_baseline(y, y, y)
    with _pytest.raises((AssertionError, IndexError)):
        jpeg_decode_baseline(blob[: len(blob) // 2])


def test_grouped_quantile_sketch_merge_and_error_bound(spark):
    """Grouped sketch invariants: (a) per-group estimates sit within one
    GLOBAL bin width of the exact per-group percentile; (b) summing two
    disjoint shards' per-(group,bin) counts and re-deriving quantiles
    equals sketching the union — the mergeability the shared grid buys."""
    import numpy as np
    from pyspark.sql import functions as F

    from ddf_flink_spark.operators.stats import histogram_quantile_sketch_grouped

    rng = np.random.default_rng(236)
    rows = [
        (f"s{g}", float(v))
        for g in range(3)
        for v in rng.uniform(g * 100, g * 100 + 500, 400)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    bins = 128
    lo = min(v for _, v in rows)
    hi = max(v for _, v in rows)
    width = (hi - lo) / bins
    got = {
        (r["grp"], r["q"]): r["est_quantile"]
        for r in histogram_quantile_sketch_grouped(df, "grp", "v", bins=bins).collect()
    }
    by_grp = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for (g, q), est in got.items():
        exact = float(np.quantile(np.array(by_grp[g]), q))
        assert abs(est - exact) <= width + 1e-9, (g, q, est, exact)
    # mergeability: estimates from the union equal estimates from the
    # sketch built over shard-1 + shard-2 unioned as raw rows (the grid
    # is global, so cell-wise count addition == union sketch)
    half = len(rows) // 2
    df_union = spark.createDataFrame(rows[:half] + rows[half:], "grp string, v double")
    got2 = {
        (r["grp"], r["q"]): r["est_quantile"]
        for r in histogram_quantile_sketch_grouped(df_union, "grp", "v", bins=bins).collect()
    }
    assert got == got2


def test_merge_upsert_matches_python_reference(spark):
    """merge_upsert on random base/change batches must equal the plain
    dict-semantics reference: delete 'D' keys, replace/insert 'U' rows,
    pass everything else through."""
    import random

    from ddf_flink_spark.operators.scd import merge_upsert

    rng = random.Random(232)
    for trial in range(3):
        base = {k: (f"v{rng.randint(0, 9)}", float(rng.randint(0, 99)))
                for k in rng.sample(range(50), 30)}
        ops = {}
        for k in rng.sample(range(60), 25):
            ops[k] = ("D" if rng.random() < 0.3 else "U",
                      f"n{rng.randint(0, 9)}", float(rng.randint(100, 199)))
        want = dict(base)
        for k, (op, v, x) in ops.items():
            if op == "D":
                want.pop(k, None)
            else:
                want[k] = (v, x)

        base_df = spark.createDataFrame(
            [(k, v, x) for k, (v, x) in base.items()], "k long, v string, x double"
        )
        chg_df = spark.createDataFrame(
            [(k, op, v, x) for k, (op, v, x) in ops.items()],
            "k long, op string, v string, x double",
        )
        got = {r["k"]: (r["v"], r["x"])
               for r in merge_upsert(base_df, chg_df, ["k"]).collect()}
        assert got == want, (trial, set(got) ^ set(want))


# ------------------------------------------------ engine-native twin quality
# The remaining rows-only registry entries are engine-specific xx-hash /
# float twins (q201 xx-MinHash, q202 xx-SimHash, q102 xx-pipeline, q113
# float-PageRank) of oracle-backed md5 families; round 7 moved q203
# (float SRP — planes embed as oracle literals) and q204 (k-means‖ —
# q77-style contract oracle) into the value-matched set. The md5 twins
# hash-verify the PIPELINE; these seeded randomized differentials give
# the engine-native families STATISTICAL evidence — pair recall/
# precision vs exact ground truth on random corpora, within each
# family's S-curve band — so "rows-only" never means "unchecked".


def test_minhash_xx_recall_precision_on_random_corpora(spark):
    """q201's production family (xxhash64, 32 hashes / 8 bands): on
    random corpora with planted near-dups, LSH candidates must (a) find
    ≥90% of pairs with exact 3-gram Jaccard ≥ 0.8 (banding S-curve at
    J=0.85, r=4, b=8 gives P≈0.997; the band allows hash-family
    variance) and (b) stay precise — no candidate pair with exact
    J < 0.2 (random word-salad pairs must not collide through 4-hash
    bands)."""
    import random

    from ddf_flink_spark.functions.dedup import minhash_lsh_candidates
    from ddf_flink_spark.storage import release_all_storage

    def shingles(text, n=3):
        toks = text.lower().split(" ")
        return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))}

    def jacc(a, b):
        return len(a & b) / len(a | b)

    rng = random.Random(201)
    vocab = [f"w{i}" for i in range(120)]
    found_tot = truth_tot = 0
    for trial in range(3):
        docs = []
        for d in range(40):
            docs.append((d, " ".join(rng.choice(vocab) for _ in range(rng.randint(30, 60)))))
        # plant near-dups: one substitution in a long doc keeps J >= ~0.85
        for k in range(8):
            base_id = rng.randrange(40)
            words = docs[base_id][1].split(" ")
            words[rng.randrange(len(words))] = rng.choice(vocab)
            docs.append((100 + k, " ".join(words)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        cands = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_candidates(df, num_hashes=32, bands=8).collect()
        }
        sh = {d: shingles(t) for d, t in docs}
        ids = sorted(sh)
        truth = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if jacc(sh[a], sh[b]) >= 0.8
        }
        truth_tot += len(truth)
        found_tot += len(truth & cands)
        low_j = [(p, jacc(sh[p[0]], sh[p[1]])) for p in cands if jacc(sh[p[0]], sh[p[1]]) < 0.2]
        assert not low_j, f"imprecise candidates (J<0.2): {low_j}"
        release_all_storage(spark)
    assert truth_tot >= 20, "corpus generation must plant enough true pairs"
    recall = found_tot / truth_tot
    assert recall >= 0.9, f"xx-MinHash recall {recall:.3f} over {truth_tot} true pairs"


def test_simhash_xx_blocking_lossless_on_random_corpora(spark):
    """q202's production family (64-bit xxhash64 SimHash, Hamming ≤ 3,
    pigeonhole blocks): on random corpora the BLOCKED join must equal
    the brute-force Hamming join over the same signatures — pigeonhole
    blocking is lossless by construction, and exact-dup docs must
    always surface at hamming 0."""
    import random

    from ddf_flink_spark.functions.dedup import (
        simhash_near_duplicates,
        simhash_signatures,
    )
    from ddf_flink_spark.storage import release_all_storage

    rng = random.Random(202)
    vocab = [f"w{i}" for i in range(60)]
    for trial in range(3):
        docs = []
        for d in range(45):
            docs.append((d, " ".join(rng.choice(vocab) for _ in range(rng.randint(15, 40)))))
        # exact dup + one light perturbation
        docs.append((100, docs[trial][1]))
        words = docs[trial + 1][1].split(" ")
        words[0] = rng.choice(vocab)
        docs.append((101, " ".join(words)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])

        blocked = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_near_duplicates(df, max_hamming=3).collect()
        }
        sigs = {r.id: r.sig for r in simhash_signatures(df).collect()}
        ids = sorted(sigs)
        brute = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    brute[(a, b)] = h
        assert blocked == brute, (
            f"pigeonhole blocking diverged from brute force: "
            f"{set(blocked) ^ set(brute)}"
        )
        assert blocked.get((trial, 100)) == 0, "exact dup must pair at hamming 0"
        release_all_storage(spark)


def test_srp_float_topk_recall_on_random_vectors(spark):
    """q203's production family (float hyperplane SRP-LSH): on random
    gaussian corpora with planted near-neighbors (cos ≈ 0.95+), lsh_topk
    must recover the planted neighbor as the top-1 for ≥80% of queries
    (hyperplane LSH at 6 bits × 4 tables: collision P for θ≈18° is
    ≈ (1-θ/π)^6 ≈ 0.53/table → ≥95% over 4 tables; the band leaves room
    for the re-rank tie behavior), and every reported neighbor's cosine
    must match the exact brute-force value for that pair (the re-rank is
    exact, only the candidate set is approximate)."""
    import random

    from ddf_flink_spark.functions.similarity import brute_force_topk, lsh_topk
    from ddf_flink_spark.storage import release_all_storage

    rng = random.Random(203)
    dim = 16
    for trial in range(2):
        corpus = []
        for i in range(60):
            corpus.append((i, [rng.gauss(0, 1) for _ in range(dim)]))
        # planted near-neighbors of the first 10 vectors
        for q in range(10):
            base = corpus[q][1]
            corpus.append((1000 + q, [x + rng.gauss(0, 0.12) for x in base]))
        df = spark.createDataFrame(corpus, ["vec_id", "embedding"])
        queries = df.filter("vec_id < 10")
        approx = {
            r.query_id: r.neighbor_id
            for r in lsh_topk(queries, df, k=1, bits=6, tables=4, dim=dim).collect()
        }
        hits = sum(1 for q in range(10) if approx.get(q) == 1000 + q)
        assert hits >= 8, f"SRP-LSH found planted neighbor for only {hits}/10 queries"
        # exact re-rank: reported cosines equal brute-force cosines pairwise
        exact = {
            (r.query_id, r.neighbor_id): r.cos
            for r in brute_force_topk(queries, df, k=59).collect()
        }
        got = {
            (r.query_id, r.neighbor_id): r.cos
            for r in lsh_topk(queries, df, k=3, bits=6, tables=4, dim=dim).collect()
        }
        wrong = {p: (c, exact.get(p)) for p, c in got.items() if exact.get(p) != c}
        assert not wrong, f"re-ranked cosines diverge from exact: {wrong}"
        release_all_storage(spark)


def test_lsh_multiprobe_monotone_recall(spark):
    """Multi-probe SRP-LSH (q251): multiprobe=0 reproduces lsh_topk's
    output exactly, and the CANDIDATE SET grows monotonically with the
    probe count (each extra probe only adds buckets) — so recall vs the
    exact top-k is non-decreasing in multiprobe. Seeded random corpora,
    the q203-family differential."""
    import random

    from pyspark.sql import functions as F

    from ddf_flink_spark.functions.similarity import (
        brute_force_topk,
        lsh_multiprobe_topk,
        lsh_topk,
    )

    rng = random.Random(31)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 15)
    kw = dict(k=4, bits=6, tables=3, dim=16, seed=7)

    base = sorted(map(tuple, lsh_topk(q, df, **kw).collect()))
    mp0 = sorted(map(tuple, lsh_multiprobe_topk(q, df, multiprobe=0, **kw).collect()))
    assert mp0 == base, "multiprobe=0 must reproduce lsh_topk exactly"

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(q, df, k=4).collect()
    }

    def hits(mp):
        got = {
            (r.query_id, r.neighbor_id)
            for r in lsh_multiprobe_topk(q, df, multiprobe=mp, **kw).collect()
        }
        return len(got & exact)

    h0, h2, h4 = hits(0), hits(2), hits(4)
    assert h0 <= h2 <= h4, f"recall must be monotone in probes: {h0},{h2},{h4}"


def test_srp_embedded_plane_oracle_margin_premise():
    """The q203/q251 value-matched oracles are valid ONLY while every
    |dot(v, plane_i)| on the gate corpus clears cross-engine
    summation-order noise (~1e-13 relative; measured corpus margin
    3.3e-6 at sf0.1): a sign bit that close to zero could flip in one
    engine and fail the gate with a bare hash mismatch. This test
    asserts the PREMISE directly, so a regenerated or larger-sf
    embeddings table that invalidates it fails HERE with a clear
    message instead (round-7 ADVICE)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ddf_flink_spark.functions.similarity import _planes
    from tests.conftest import SF_DIR

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    assert vecs.shape[1] == 64, f"corpus dim changed: {vecs.shape}"
    min_margin = np.inf
    for ti in range(4):  # q203/q251: 4 tables, 8 bits, seed 42+ti
        planes = np.array(_planes(64, 8, 42 + ti), dtype=np.float64)
        dots = vecs @ planes.T
        min_margin = min(min_margin, float(np.abs(dots).min()))
    assert min_margin > 1e-9, (
        f"embedded-plane oracle premise violated: min |dot(v, plane)| = "
        f"{min_margin:.3e} <= 1e-9 on {SF_DIR} — a sign bit may flip "
        f"between Spark and DuckDB; re-derive the q203/q251 oracles (or "
        f"demote them to rows-only) before trusting the gate"
    )


# ---------------------------------------------------------------------------
# Snapshot-manifest pruning invariants (functions/manifest.py): the two
# facts file skipping rests on. Pure Python — no Spark session needed.
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.one_of(st.integers(-(2**62), 2**62), st.text(max_size=40)),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative(values):
    """A Bloom filter may keep a file it needn't, NEVER skip one it
    must read: every inserted value probes positive."""
    from ddf_flink_spark.functions.manifest import (
        _bloom_maybe_contains,
        _bloom_words,
    )

    words = _bloom_words(values)
    assert all(_bloom_maybe_contains(words, v) for v in values)


@given(
    st.integers(0, 63), st.integers(0, 63), st.integers(0, 63),
    st.integers(0, 63), st.data(),
)
@settings(max_examples=200, deadline=None)
def test_morton_corner_keys_bound_the_box(x0, x1, y0, y1, data):
    """The zone-map read for a 2-D box uses the Morton range
    [z(xlo,ylo), z(xhi,yhi)] as a SUPERSET prune (q281/q286): because
    the interleave is monotone in each coordinate separately, the
    box's corner keys bound every key in the box — a file skipped by
    that range can hold no box row."""
    xlo, xhi = sorted((x0, x1))
    ylo, yhi = sorted((y0, y1))

    def z(x, y, bits=6):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    x = data.draw(st.integers(xlo, xhi))
    y = data.draw(st.integers(ylo, yhi))
    assert z(xlo, ylo) <= z(x, y) <= z(xhi, yhi)
