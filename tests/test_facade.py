"""End-to-end facade tests: the workflows a ddf-flink user runs today,
replayed against DDFManager/DDF (the reference's demo + spec flows —
``docs/demo.md``, ``BaseSpec.scala``, handler specs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def mgr(spark):
    from ddf_flink_spark.manager import DDFManager

    return DDFManager(spark)


@pytest.fixture(scope="module")
def orders_ddf(mgr):
    return mgr.load_table(SF_DIR, "orders")


def test_load_file_v_names_and_inference(mgr, tmp_path_factory):
    """loadFile: headerless CSV → V1..Vn names + sample-based types
    (``FlinkDDFManager.scala:30-92``)."""
    p = str(tmp_path_factory.mktemp("csv") / "data.csv")
    with open(p, "w") as fh:
        fh.write("1,1.5,true,hello\n2,2.5,false,world\n3,NA,true,x\n")
    ddf = mgr.load_file(p)
    assert ddf.columns == ["V1", "V2", "V3", "V4"]
    types = [f.dataType.typeName() for f in ddf.schema.fields]
    assert types == ["integer", "double", "boolean", "string"]
    assert ddf.num_rows() == 3


def test_create_load_select_roundtrip(mgr, tmp_path_factory):
    """The reference's first demo flow: CREATE TABLE → LOAD → sql
    (``SqlHandlerSpec.scala:16-104``)."""
    p = str(tmp_path_factory.mktemp("csv") / "t.csv")
    with open(p, "w") as fh:
        fh.write("a,1\nb,2\nb,3\n")
    mgr.sql2ddf("CREATE TABLE demo_t (k STRING, v INT)")
    mgr.sql2ddf(f"LOAD '{p}' INTO demo_t")
    out = mgr.sql2ddf("SELECT k, SUM(v) AS s FROM demo_t GROUP BY k")
    got = {r["k"]: r["s"] for r in out.df.collect()}
    assert got == {"a": 1, "b": 5}


def test_views_project_remove_head_top(orders_ddf):
    proj = orders_ddf.project("o_orderkey", "o_totalprice")
    assert proj.columns == ["o_orderkey", "o_totalprice"]
    removed = orders_ddf.remove_columns("o_orderpriority")
    assert "o_orderpriority" not in removed.columns
    assert len(orders_ddf.head(7)) == 7
    top3 = orders_ddf.top(3, "o_totalprice").df.collect()
    prices = [r["o_totalprice"] for r in top3]
    assert prices == sorted(prices, reverse=True)


def test_subset_and_grep(orders_ddf, mgr):
    sub = orders_ddf.subset("o_totalprice > 100000")
    assert sub.num_rows() == orders_ddf.df.filter("o_totalprice > 100000").count()
    cust = mgr.load_table(SF_DIR, "customer")
    g = cust.grep("c_name", "0001", ignore_case=True)
    assert g.num_rows() == cust.df.filter(F.col("c_name").rlike("(?i)0001")).count()


def test_join_merge_facades(mgr):
    o = mgr.load_table(SF_DIR, "orders")
    c = mgr.load_table(SF_DIR, "customer")
    j = o.join(c, "inner", by_left_columns=["o_custkey"], by_right_columns=["c_custkey"])
    # reference schema rule: left columns ++ right-minus-left
    assert j.columns[: len(o.columns)] == o.columns
    m = o.merge(o)
    assert m.num_rows() == 2 * o.num_rows()


def test_aggregate_map_and_group_by(orders_ddf):
    agg = orders_ddf.aggregate("o_orderstatus, count(o_orderkey), max(o_totalprice)")
    assert set(agg) == {r["o_orderstatus"] for r in orders_ddf.df.select("o_orderstatus").distinct().collect()}
    g = orders_ddf.group_by(["o_orderstatus"], ["n=count(o_orderkey)"])
    assert set(g.columns) == {"o_orderstatus", "n"}
    scalar = orders_ddf.aggregate_on_column("avg", "o_totalprice")
    assert scalar == pytest.approx(
        orders_ddf.df.agg(F.avg("o_totalprice")).first()[0]
    )


def test_summary_and_stats(orders_ddf):
    s = orders_ddf.summary()
    ok = s["o_totalprice"]
    exact = orders_ddf.df.agg(
        F.avg("o_totalprice"), F.min("o_totalprice"), F.max("o_totalprice"), F.count("o_totalprice")
    ).first()
    assert ok["mean"] == pytest.approx(exact[0])
    assert ok["min"] == exact[1] and ok["max"] == exact[2] and ok["count"] == exact[3]
    var = orders_ddf.vector_variance("o_totalprice")
    assert var[0] == pytest.approx(
        orders_ddf.df.agg(F.var_samp("o_totalprice")).first()[0]
    )
    five = orders_ddf.five_num_summary(["o_totalprice"])["o_totalprice"]
    assert five["min"] == exact[1] and five["max"] == exact[2]
    assert five["min"] <= five["q1"] <= five["median"] <= five["q3"] <= five["max"]


def test_binning_to_factor(orders_ddf):
    b = orders_ddf.binning("o_totalprice", "EQUALINTERVAL", num_bins=4, include_lowest=True)
    assert "o_totalprice" in b.factors
    levels = b.factor_levels("o_totalprice")
    assert len(levels) == 4
    counts = b.factor_level_counts(["o_totalprice"])["o_totalprice"]
    assert sum(counts.values()) == orders_ddf.num_rows()


def test_missing_data_facades(mgr, spark):
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, 5.0, None), (3, None, None)], "id int, a double, b double"
    )
    ddf = mgr.new_ddf(df, name="na_demo")
    assert ddf.drop_na(how="any").num_rows() == 0
    assert ddf.drop_na(how="all").num_rows() == 3
    filled = ddf.fill_na(agg_function="mean")
    got = {r["id"]: (r["a"], r["b"]) for r in filled.df.collect()}
    assert got[1][0] == pytest.approx(5.0) and got[2][1] == pytest.approx(1.0)


def test_mutability_identity(mgr, spark):
    ddf = mgr.new_ddf(spark.range(10).withColumnRenamed("id", "v"), name="mut_demo")
    ddf.set_mutable(True)
    same = ddf.subset("v > 4")
    assert same is ddf  # identity preserved, contents changed
    assert ddf.num_rows() == 5
    assert mgr.get_ddf("mut_demo") is ddf


def test_transforms_and_cv(orders_ddf):
    scaled = orders_ddf.project("o_orderkey", "o_totalprice").transform_scale_min_max()
    lo, hi = scaled.df.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    assert lo == pytest.approx(0.0) and hi == pytest.approx(1.0)
    derived = orders_ddf.transform_native({"bucket": "o_totalprice > 200000"})
    assert "bucket" in derived.columns
    splits = orders_ddf.random_split([0.5, 0.5], seed=1)
    assert sum(s.num_rows() for s in splits) == orders_ddf.num_rows()


def test_persist_roundtrip(orders_ddf, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("persist"))
    target = orders_ddf.persist(base)
    assert os.path.exists(target)
    back = orders_ddf.spark.read.parquet(target)
    assert back.count() == orders_ddf.num_rows()


def test_sql2list_tab_joined(orders_ddf):
    cols, rows = orders_ddf.sql2list(
        "SELECT o_orderkey, o_orderstatus FROM @this ORDER BY o_orderkey LIMIT 3"
    )
    assert cols == ["o_orderkey", "o_orderstatus"]
    assert len(rows) == 3 and all("\t" in r for r in rows)


def test_set_ddf_name_and_json(mgr, spark, tmp_path_factory):
    """setDDFName re-registers under the new catalog + view name
    (ViewHandlerSpec.scala:46); JSON source infers schema natively."""
    ddf = mgr.new_ddf(spark.range(5).withColumnRenamed("id", "v"), name="before_rename")
    mgr.set_ddf_name(ddf, "after_rename")
    assert mgr.get_ddf("after_rename") is ddf
    assert "before_rename" not in mgr.catalog
    assert spark.sql("SELECT COUNT(*) AS n FROM after_rename").first()["n"] == 5

    p = str(tmp_path_factory.mktemp("json") / "d.jsonl")
    with open(p, "w") as fh:
        fh.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    j = mgr.load_json(p)
    assert sorted(j.columns) == ["a", "b"]
    assert j.num_rows() == 2


def test_set_ddf_name_guards(mgr, spark):
    """Case-only rename keeps the (case-insensitive) temp view; renaming
    onto a different DDF's name raises instead of clobbering it."""
    a = mgr.new_ddf(spark.range(5).withColumnRenamed("id", "v"), name="guard_a")
    b = mgr.new_ddf(spark.range(7).withColumnRenamed("id", "v"), name="guard_b")
    mgr.set_ddf_name(a, "Guard_A")  # case-only rename
    assert spark.sql("SELECT COUNT(*) AS n FROM guard_a").first()["n"] == 5
    assert mgr.get_ddf("Guard_A") is a
    with pytest.raises(ValueError):
        mgr.set_ddf_name(b, "Guard_A")
    assert mgr.get_ddf("Guard_A") is a  # untouched


def test_manager_sql_default_limit(mgr):
    """manager.sql caps interactive results at 1000 rows
    (DEFAULT_LIMIT, SqlHandler.scala:255)."""
    mgr.load_table(SF_DIR, "orders")
    cols, rows = mgr.sql("SELECT o_orderkey FROM orders")
    assert cols == ["o_orderkey"]
    assert len(rows) == 1000
    _cols2, rows2 = mgr.sql("SELECT o_orderkey FROM orders", limit=5)
    assert len(rows2) == 5


def test_pivot_unpivot_roundtrip(mgr, spark):
    """pivot → unpivot recovers the long-form aggregates."""
    rows = [("u1", "click", 1.0), ("u1", "view", 2.0), ("u2", "click", 3.0)]
    ddf = mgr.new_ddf(
        spark.createDataFrame(rows, "user string, etype string, v double")
    )
    wide = ddf.pivot("user", "etype", ["click", "view"], value_col="v", agg="sum")
    assert set(wide.columns) == {"user", "click", "view"}
    got = {r.user: (r.click, r.view) for r in wide.df.collect()}
    assert got == {"u1": (1.0, 2.0), "u2": (3.0, None)}
    long = wide.unpivot(["user"], ["click", "view"], "etype", "v")
    assert long.df.filter("v IS NOT NULL").count() == 3


def test_resample_and_fill_directional_facades(mgr, spark):
    from datetime import datetime

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0), 1, 1.0),
        ("a", datetime(2024, 1, 1, 3, 0), 2, None),
        ("a", datetime(2024, 1, 1, 6, 0), 3, 3.0),
    ]
    ddf = mgr.new_ddf(
        spark.createDataFrame(rows, "k string, ts timestamp, eid int, v double")
    )
    filled = ddf.fill_directional("v", order_by=["ts"], partition_by=["k"])
    assert [r.v for r in filled.df.orderBy("ts").collect()] == [1.0, 1.0, 3.0]

    res = ddf.resample_gapfill(
        ts_col="ts", key_cols=["k"], interval="1 hour",
        value_col="v", tiebreak_col="eid",
    )
    out = res.df.orderBy("bucket").collect()
    assert len(out) == 7  # 00:00..06:00 hourly grid
    assert sum(r.n_obs for r in out) == 3


def test_llm_op_facades(mgr, spark):
    """dedup_exact / near_duplicates / similarity_topk exposed on DDF."""
    import pytest as _pytest

    docs = mgr.load_table(SF_DIR, "documents")
    kept = docs.dedup_exact()
    assert 0 < kept.num_rows() <= docs.num_rows()
    assert set(kept.columns) == set(docs.columns)

    pairs = docs.near_duplicates(method="jaccard", threshold=0.5)
    assert pairs.columns == ["id_a", "id_b", "jaccard"]
    with _pytest.raises(ValueError, match="unknown near-dup"):
        docs.near_duplicates(method="bogus")

    emb = mgr.load_table(SF_DIR, "embeddings")
    queries = mgr.new_ddf(emb.df.limit(3))
    nn = emb.similarity_topk(queries, k=2)
    rows = nn.df.collect()
    assert len(rows) == 6  # 3 queries x k=2
    assert nn.columns == ["query_id", "neighbor_id", "cos"]


def test_salted_join_and_scd2_facades(mgr):
    """salted_join / scd2_apply exposed on DDF, result-equivalent to the
    plain operations."""
    li = mgr.load_table(SF_DIR, "lineitem")
    o = mgr.load_table(SF_DIR, "orders")
    sj = li.salted_join(o, "l_orderkey", "o_orderkey", n_salts=4)
    plain = li.df.join(o.df, li.df.l_orderkey == o.df.o_orderkey)
    assert sj.num_rows() == plain.count()
    assert set(sj.columns) == set(plain.columns)

    from pyspark.sql import functions as F

    c = mgr.load_table(SF_DIR, "customer")
    dim = mgr.new_ddf(
        c.df.select(
            "c_custkey",
            "c_acctbal",
            F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    upd = mgr.new_ddf(
        c.df.limit(10).select(
            "c_custkey",
            (F.col("c_acctbal") + 1).alias("c_acctbal"),
            F.lit("2000-01-01").cast("timestamp").alias("eff"),
        )
    )
    versioned = dim.scd2_apply(upd, ["c_custkey"], ["c_acctbal"], eff_col="eff")
    assert versioned.num_rows() == dim.num_rows() + 10
    assert versioned.df.filter("valid_to IS NOT NULL").count() == 10


def test_sample_to_budget_facade(mgr):
    """Budget-capped mixing: per-source cumulative chars never exceed the
    budget, selection is prefix-closed in doc_id order, and the facade
    preserves schema."""
    docs = mgr.load_table(SF_DIR, "documents")
    kept = docs.sample_to_budget("source", "n_chars", 5000, "doc_id")
    assert set(kept.columns) == set(docs.columns)
    rows = kept.df.toPandas().sort_values(["source", "doc_id"])
    for _src, grp in rows.groupby("source"):
        assert grp["n_chars"].sum() <= 5000
    # prefix-closed: every kept doc's predecessors (same source, smaller id,
    # still within budget) are also kept
    all_rows = docs.df.toPandas()[["doc_id", "source", "n_chars"]]
    for src, grp in all_rows.sort_values("doc_id").groupby("source"):
        cum = grp["n_chars"].cumsum()
        expect = set(grp.loc[cum <= 5000, "doc_id"])
        got = set(rows.loc[rows["source"] == src, "doc_id"])
        assert got == expect


def test_ddf_scale_audit(mgr):
    """DDF.scale_audit lints the wrapped plan: clean on a pushed-filter
    aggregate, flags a deliberate cross join."""
    lineitem = mgr.load_table(SF_DIR, "lineitem")
    clean = lineitem.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM @this "
        "WHERE l_quantity > 45 GROUP BY l_returnflag"
    )
    assert clean.scale_audit() == []
    crossed = mgr.new_ddf(
        lineitem.df.limit(5).crossJoin(lineitem.df.limit(5).selectExpr("l_orderkey AS r"))
    )
    assert any(f.startswith("cartesian-product") for f in crossed.scale_audit())


def test_round3_llm_facades(mgr, spark):
    docs = mgr.new_ddf(
        spark.createDataFrame(
            [(1, "a b c d e f g h i j k l"), (2, "a b c d e f g h i j k l"), (3, "x y z")],
            "doc_id long, text string",
        )
    )
    ppl = docs.lm_perplexity().df
    assert {"id", "n_bigrams", "ppl"} <= set(ppl.columns)
    assert ppl.count() == 3

    packed = docs.pack_sequences(context=8).df
    assert packed.filter("n_tokens > 0").count() >= 3

    boiler = docs.paragraph_boilerplate(chunk_tokens=4).df.collect()
    by_id = {r["id"]: r for r in boiler}
    assert by_id[1]["n_boiler"] == 3  # doc1 and doc2 are identical: all chunks repeat
    assert by_id[3]["n_boiler"] == 0

    emb = mgr.new_ddf(
        spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 2.0])], "vec_id long, embedding array<double>"
        )
    )
    codes = {r["id"]: r["codes"] for r in emb.quantize_embeddings().df.collect()}
    assert codes[1] == [127, 0] and codes[2] == [0, 127]


def test_new_analytics_facades(mgr, spark):
    docs = mgr.new_ddf(
        spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "alpha beta gamma delta epsilon zeta eta thetb"),
                (3, "spark spark spark query engine"),
            ],
            "doc_id long, text string",
        )
    )
    fuzzy = docs.near_duplicates(
        method="fuzzy", min_shared=2, prefix_len=100, threshold=0.5
    ).df.collect()
    assert [(r.id_a, r.id_b) for r in fuzzy] == [(1, 2)]

    sk = docs.distinct_sketch("doc_id", k=16).df.collect()[0]
    assert sk.k == 16 and sk.est_distinct > 0

    hits = docs.search_bm25(["spark"], topk=5).df.collect()
    assert [r.doc_id for r in hits] == [3]

    edges = mgr.new_ddf(
        spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)], "u long, v long")
    )
    tri = edges.triangle_count().df.collect()[0]
    assert (tri.n_edges, tri.n_triangles) == (4, 1)


def test_round3_sketch_and_spectral_facades(mgr, spark):
    docs = mgr.new_ddf(
        spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta eta theta " * 3)
             for i in range(4)],
            "doc_id long, text string",
        )
    )
    chunks = docs.cdc_chunks().df
    assert {"id", "chunk_id", "chunk_text", "n_toks", "fp"} <= set(chunks.columns)
    assert chunks.count() >= 4

    est = {
        r.key: r.est
        for r in docs.frequency_estimates("doc_id", ["0", "3", "99"]).df.collect()
    }
    assert est["0"] == 1 and est["3"] == 1

    emb = mgr.new_ddf(
        spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(8)],
            "vec_id long, embedding array<float>",
        )
    )
    pc = emb.pca_top_component().df.collect()
    assert abs(abs(pc[0].loading) - 1.0) < 1e-3


def test_prefix_and_pq_facades(mgr, spark):
    docs = mgr.new_ddf(
        spark.createDataFrame(
            [(0, "aa bb cc dd ee"), (1, "aa bb cc dd ee"), (2, "xx yy zz ww vv")],
            "doc_id long, text string",
        )
    )
    pairs = docs.near_duplicates(method="prefix", threshold=0.9).df.collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(0, 1, 1.0)]

    emb = mgr.new_ddf(
        spark.createDataFrame(
            [(i, [float(i % 5)] * 8) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
    )
    top = emb.pq_search(m=2, k=3, topk=3).df.collect()
    assert len(top) == 3 and top[0].neighbor_id == 5  # same residue as query id 0


def test_triangle_count_normalizes_bidirectional_edges(mgr, spark):
    """Edges stored in both directions, with duplicates and a self
    loop, still count each triangle exactly once."""
    raw = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (0, 0), (0, 1)]
    edges = mgr.new_ddf(spark.createDataFrame(raw, "u long, v long"))
    r = edges.triangle_count().df.collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)


def test_decontaminate_exact_and_bloom(mgr, spark):
    """DDF.decontaminate drops every doc sharing a 5-gram with the
    benchmark (exact and bloom methods agree here; bloom is allowed
    false positives but never false negatives)."""
    bench = mgr.new_ddf(
        spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
    )
    corpus = mgr.new_ddf(
        spark.createDataFrame(
            [
                (0, "prefix words alpha beta gamma delta epsilon and a tail"),
                (1, "totally unrelated content with many distinct tokens here"),
                (2, "another clean document that keeps its own vocabulary safe"),
            ],
            "doc_id long, text string",
        )
    )
    clean_exact = {r.doc_id for r in corpus.decontaminate(bench, n=5).df.collect()}
    assert clean_exact == {1, 2}  # doc 0 shares 'alpha beta gamma delta epsilon'
    clean_bloom = {
        r.doc_id
        for r in corpus.decontaminate(bench, n=5, method="bloom", m_bits=4096).df.collect()
    }
    assert 0 not in clean_bloom  # no false negatives ever
    assert clean_bloom <= clean_exact


def test_similarity_topk_srp_method(mgr, spark):
    """The cross-engine SRP method routes through
    srp_lsh_topk_crossengine and finds the planted identical vector."""
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    rows.append((99, list(rows[0][1])))  # clone of vector 0
    emb = mgr.new_ddf(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    q = mgr.new_ddf(emb.df.filter("vec_id = 0"))
    top = emb.similarity_topk(q, k=3, method="srp").df.collect()
    best = max(top, key=lambda r: r.cos)  # row order isn't part of the contract
    assert best.neighbor_id == 99 and abs(best.cos - 1.0) < 1e-6


def test_quantile_sketch_facade(mgr, spark):
    """DDF.quantile_sketch estimates sit within one bin width of the
    exact percentile."""
    df = spark.range(20000).select((F.col("id") % 1009).cast("double").alias("v"))
    ddf = mgr.new_ddf(df)
    est = {r.q: r.est_quantile for r in ddf.quantile_sketch("v", bins=256).df.collect()}
    exact = df.agg(
        *[F.expr(f"percentile(v, {q})").alias(str(q)) for q in (0.25, 0.5, 0.75, 0.9, 0.99)]
    ).first()
    bin_w = 1008.0 / 256
    for i, q in enumerate((0.25, 0.5, 0.75, 0.9, 0.99)):
        assert abs(est[q] - exact[i]) <= bin_w + 1e-9, (q, est[q], exact[i])


def test_filter_funnel_facade(mgr, spark):
    """Cumulative survivor counts per stage, per group and overall."""
    df = spark.createDataFrame(
        [("a", 10), ("a", 60), ("a", 120), ("b", 200), ("b", 5)],
        "src string, n int",
    )
    ddf = mgr.new_ddf(df)
    rows = {
        r.src: r
        for r in ddf.filter_funnel(
            [("gte50", "n >= 50"), ("lt150", "n < 150")], group_col="src"
        ).df.collect()
    }
    assert (rows["a"].n_docs, rows["a"].after_gte50, rows["a"].after_lt150) == (3, 2, 2)
    assert (rows["b"].n_docs, rows["b"].after_gte50, rows["b"].after_lt150) == (2, 1, 0)
    assert rows["b"].retention == 0.0 and rows["a"].retention == round(2 / 3, 4)
    total = ddf.filter_funnel([("gte50", "n >= 50")]).df.collect()
    assert len(total) == 1 and total[0].after_gte50 == 3


def test_text_pipeline_facades(mgr, spark):
    """Round-5 facade additions: passage_duplication / repetition_ratio /
    kl_novelty delegate to functions/text with the DDF-in, DDF-out shape."""
    docs = mgr.new_ddf(
        spark.createDataFrame(
            [
                (0, "a", "the shared boilerplate sentence appears in both documents here"),
                (1, "b", "prefix words then the shared boilerplate sentence appears in both documents here"),
                (2, "b", "totally different content with unique words nobody repeats"),
            ],
            "doc_id long, source string, text string",
        )
    )
    dup = {r["source"]: r for r in docs.passage_duplication(n_tokens=8).df.collect()}
    assert dup["a"]["n_dup_windows"] > 0 and dup["b"]["n_dup_windows"] > 0
    rep = {r["id"]: r["rep"] for r in docs.repetition_ratio(n=3).df.collect()}
    assert set(rep) == {0, 1, 2} and all(0.0 <= v <= 1.0 for v in rep.values())
    kl = {r["id"]: r["kl9"] for r in docs.kl_novelty().df.collect()}
    assert set(kl) == {0, 1, 2}
    # doc 2's vocabulary is rarest corpus-wide -> highest novelty
    assert kl[2] == max(kl.values())


def test_semantic_dedup_facade(mgr, spark):
    """semantic_dedup keeps one canonical member per within-cell cosine
    group: two identical vectors collapse, the distinct one survives."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),      # exact duplicate of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (3, [0.99, 0.1, 0.0, 0.0]),     # near-dup of 0 (cos ~0.995)
    ]
    emb = mgr.new_ddf(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    kept = sorted(r["vec_id"] for r in emb.semantic_dedup(k=2, tau=0.99).df.collect())
    assert 0 in kept and 2 in kept
    assert 1 not in kept  # duplicate collapsed to canonical id 0


def test_grouped_sketch_and_shard_facades(mgr, spark):
    from pyspark.sql import functions as F

    docs = mgr.new_ddf(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    gq = docs.quantile_sketch_grouped("source", "n_chars", quantiles=[0.5], bins=64)
    rows = gq.df.collect()
    n_sources = docs.df.select("source").distinct().count()
    assert len(rows) == n_sources
    sharded = docs.shard(8)
    counts = {r["shard"]: r["n"] for r in
              sharded.df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= set(range(8)) and sum(counts.values()) == docs.num_rows()
    # determinism: re-derive and compare assignments exactly
    again = {r["doc_id"]: r["shard"] for r in docs.shard(8).df.select("doc_id", "shard").collect()}
    first = {r["doc_id"]: r["shard"] for r in sharded.df.select("doc_id", "shard").collect()}
    assert again == first


def test_embedding_drift_facade(mgr, spark):
    """DDF.embedding_drift mirrors q235: per-source centroid distance,
    one row per source, non-negative."""
    emb = mgr.new_ddf(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    docs = mgr.new_ddf(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    out = emb.embedding_drift(docs).df.collect()
    n_sources = docs.df.select("source").distinct().count()
    assert len(out) == n_sources
    assert all(r["centroid_drift"] >= 0 for r in out)


def test_ivfpq_facade(mgr, spark):
    emb = mgr.new_ddf(
        spark.createDataFrame(
            [(i, [float(i % 5)] * 8) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
    )
    top = emb.ivfpq_search(n_lists=4, nprobe=4, m=2, k=3, topk=3).df.collect()
    assert len(top) == 3 and top[0].neighbor_id == 5  # same residue as query id 0


def test_ivfadc_facade(mgr, spark):
    emb = mgr.new_ddf(
        spark.createDataFrame(
            [(i, [float(i % 5)] * 8) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
    )
    top = emb.ivfadc_search(n_lists=4, nprobe=4, m=2, k=3, topk=3).df.collect()
    assert len(top) == 3 and top[0].neighbor_id == 5  # same residue as query id 0


def test_ivfadc_batch_and_index_facades(mgr, spark):
    """The round-7 index-lifecycle facades: build → (persistable) index
    DDF + model sidecars; serve a query DDF against it; the one-call
    batch facade agrees with build+search composition."""
    raw = spark.createDataFrame(
        [(i, [float(i % 5)] * 8) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    emb = mgr.new_ddf(raw)
    idx, coarse, cents = emb.ivfadc_index_build(n_lists=4, m=2, k=3, iters=2)
    assert set(idx.df.columns) == {"id", "list_id", "code0", "code1"}

    q = mgr.new_ddf(raw.orderBy("vec_id").limit(2))
    served = q.ivfadc_index_search(idx, coarse, cents, nprobe=4, topk=3).df.collect()
    assert len(served) == 6 and all(r.neighbor_id != r.query_id for r in served)

    batch = emb.ivfadc_batch_search(
        raw.orderBy("vec_id").limit(2), n_lists=4, nprobe=4, m=2, k=3, topk=3
    ).df.collect()
    assert sorted((r.query_id, r.neighbor_id, r.pq_dist2) for r in batch) == sorted(
        (r.query_id, r.neighbor_id, r.pq_dist2) for r in served
    )


def test_chunk_retrieval_facades(mgr, spark, tmp_path):
    """DDF.maxsim_topk / build_chunk_index / maxsim_serve (q257/q265/
    q266): the planted-passage document ranks top-1 with maxsim 1.0 on
    both the brute and the persisted-serve path, and full-probe serve
    equals brute."""
    import random

    rng = random.Random(266)
    vocab = [f"w{i}" for i in range(300)]
    qtoks = [rng.choice(vocab) for _ in range(64)]
    corpus = [(10, " ".join(qtoks + [rng.choice(vocab) for _ in range(32)]))]
    for i in range(11, 31):
        corpus.append((i, " ".join(rng.choice(vocab) for _ in range(90))))
    docs = mgr.new_ddf(spark.createDataFrame(corpus, "doc_id long, text string"))
    qddf = mgr.new_ddf(
        spark.createDataFrame([(0, " ".join(qtoks))], "doc_id long, text string")
    )

    brute = docs.maxsim_topk(qddf, k=3).df.collect()
    top = max(brute, key=lambda r: (r.maxsim, -r.doc_id))
    assert (top.doc_id, top.maxsim) == (10, 1.0)

    base = str(tmp_path / "chunkidx")
    coarse = docs.build_chunk_index(base, n_lists=4)
    assert len(coarse) == 4
    served = qddf.maxsim_serve(base, k=3, nprobe=4).df.collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, brute)), (
        "full-probe persisted serve must equal brute maxsim"
    )


def test_snapshot_facades(mgr, spark, tmp_path):
    """DDF.snapshot_create/append + DDFManager.snapshot_table/history/
    delete/compact/restore/vacuum (q278-q283): the full lifecycle
    through the library surface."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "snapstore")
    d1 = mgr.new_ddf(
        spark.range(0, 100)
        .withColumn("cell", (F.col("id") % 4).cast("int"))
        .withColumn("val", (F.col("id") * 2).cast("long"))
    )
    assert d1.snapshot_create(base, part_col="cell") == 1
    d2 = mgr.new_ddf(
        spark.range(100, 130)
        .withColumn("cell", (F.col("id") % 4).cast("int"))
        .withColumn("val", (F.col("id") * 2).cast("long"))
    )
    assert d2.snapshot_append(base, batch_tag="b1") == 2
    assert d2.snapshot_append(base, batch_tag="b1") == 2  # idempotent
    assert mgr.snapshot_table(base).num_rows() == 130
    assert mgr.snapshot_table(base, parts=[0]).num_rows() == 33

    mgr.snapshot_delete(base, mgr.new_ddf(spark.range(0, 50)))
    assert mgr.snapshot_table(base).num_rows() == 80
    assert mgr.snapshot_table(base, version=2).num_rows() == 130  # time travel
    mgr.snapshot_compact(base)
    assert mgr.snapshot_table(base).num_rows() == 80
    mgr.snapshot_restore(base, 2)
    assert mgr.snapshot_table(base).num_rows() == 130

    hist = {r["version"]: r["op"] for r in mgr.snapshot_history(base).df.collect()}
    assert hist == {1: "create", 2: "append", 3: "delete", 4: "compact",
                    5: "restore"}
    res = mgr.snapshot_vacuum(base, retain_last=1)
    assert res["manifests_deleted"] == 4
    assert mgr.snapshot_table(base).num_rows() == 130


def test_snapshot_merge_and_ddl_facades(mgr, spark, tmp_path):
    """Round-12 surface: DDF.snapshot_merge, DDFManager.
    snapshot_delete_where / snapshot_rename_column /
    snapshot_drop_column through the library API."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "snapstore12")
    d1 = mgr.new_ddf(
        spark.range(0, 100)
        .withColumn("val", (F.col("id") * 2).cast("long"))
        .withColumn("note", F.lit("x"))
    )
    assert d1.snapshot_create(base, id_col="id", stats_cols=["id"]) == 1

    # conditional merge: delete 0-4, update val of 5-9, insert 200-204
    src = mgr.new_ddf(
        spark.range(0, 5).withColumn("op", F.lit("d"))
        .withColumn("val", F.lit(None).cast("long"))
        .unionByName(
            spark.range(5, 10).withColumn("op", F.lit("u"))
            .withColumn("val", F.lit(-1).cast("long"))
        )
        .unionByName(
            spark.range(200, 205).withColumn("op", F.lit("i"))
            .withColumn("val", F.lit(7).cast("long"))
        )
    )
    assert src.snapshot_merge(
        base, when_matched_update=["val"], when_matched_delete="op = 'd'",
        txn=("t", 1),
    ) == 2
    cur = mgr.snapshot_table(base)
    assert cur.num_rows() == 100
    row = cur.df.filter(F.col("id") == 7).collect()[0]
    assert row["val"] == -1 and row["note"] == "x"

    # delete_where: manifest-pruned predicate delete, no-op tick safe
    assert mgr.snapshot_delete_where(base, between=("id", 200, 204)) == 3
    assert mgr.snapshot_delete_where(base, between=("id", 200, 204)) == 3
    assert mgr.snapshot_table(base).num_rows() == 95

    # header-only rename + drop
    assert mgr.snapshot_rename_column(base, "val", "value") == 4
    assert mgr.snapshot_drop_column(base, "note") == 5
    cur = mgr.snapshot_table(base)
    assert cur.df.columns == ["id", "value"]
    assert cur.df.filter(F.col("id") == 7).collect()[0]["value"] == -1
    # time travel serves the old shape
    assert "note" in mgr.snapshot_table(base, version=1).df.columns
