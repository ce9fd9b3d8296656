"""Reference-parity tests: the reference's OWN spec assertions, replayed
through this engine against the reference's OWN test fixtures.

Fixtures are read in place from ``/root/reference/flink/src/test/resources``
(never copied into this repo). Golden values cite the spec that asserts
them. Where this engine deliberately diverges from a reference bug, the
divergence is asserted and documented inline.
"""

from __future__ import annotations

import os

import pytest

REF_RES = "/root/reference/flink/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_RES), reason="reference fixtures not available"
)

AIRLINE_COLUMNS = (
    "Year int, Month int, DayofMonth int, DayOfWeek int, DepTime int, "
    "CRSDepTime int, ArrTime int, CRSArrTime int, UniqueCarrier string, "
    "FlightNum int, TailNum string, ActualElapsedTime int, CRSElapsedTime int, "
    "AirTime int, ArrDelay int, DepDelay int, Origin string, Dest string, "
    "Distance int, TaxiIn int, TaxiOut int, Cancelled int, CancellationCode string, "
    "Diverted string, CarrierDelay int, WeatherDelay int, NASDelay int, "
    "SecurityDelay int, LateAircraftDelay int"
)  # BaseSpec.scala:48-52 airlineColumns


@pytest.fixture(scope="module")
def mgr(spark):
    from ddf_flink_spark.manager import DDFManager

    return DDFManager(spark)


@pytest.fixture(scope="module")
def airline_v(mgr):
    """loadFile path: V1..Vn names, sample inference (BaseSpec loadDDF)."""
    return mgr.load_file(f"{REF_RES}/airline.csv", name="airline_v")


@pytest.fixture(scope="module")
def airline(mgr):
    """Declared-schema CREATE + LOAD path (BaseSpec loadAirlineDDF)."""
    mgr.sql2ddf(f"CREATE TABLE airline ({AIRLINE_COLUMNS})")
    return mgr.sql2ddf(f"LOAD '{REF_RES}/airline.csv' DELIMITED BY ',' WITH NULL 'NA' NO DEFAULTS INTO airline")


@pytest.fixture(scope="module")
def airline_na(mgr):
    """airlineWithNA without defaults (BaseSpec loadAirlineNADDF)."""
    mgr.sql2ddf(f"CREATE TABLE airline_na ({AIRLINE_COLUMNS})")
    # WITH EMPTY '' keeps empty string fields as "" (the reference's
    # univocity reader does the same); only literal "NA" marks a null
    return mgr.sql2ddf(
        f"LOAD '{REF_RES}/airlineWithNA.csv' WITH NULL 'NA' WITH EMPTY '' NO DEFAULTS INTO airline_na"
    )


@pytest.fixture(scope="module")
def mtcars(mgr):
    """BaseSpec.scala:81-88 loadMtCarsDDF (space-delimited)."""
    mgr.sql2ddf(
        "CREATE TABLE mtcars (mpg double, cyl int, disp double, hp int, drat double, "
        "wt double, qsec double, vs int, am int, gear int, carb int)"
    )
    return mgr.sql2ddf(f"LOAD '{REF_RES}/mtcars' DELIMITED BY ' ' INTO mtcars")


@pytest.fixture(scope="module")
def year_names(mgr):
    mgr.sql2ddf("CREATE TABLE year_names (Year_num int, Name string)")
    return mgr.sql2ddf(f"LOAD '{REF_RES}/year_names.csv' INTO year_names")


def test_load_airline_shape_and_summary(airline_v):
    """SqlHandlerSpec.scala:16-30: 29 columns, 31 rows, Year max 2010,
    FlightNum (V10) variance 998284.8 ±1."""
    assert len(airline_v.columns) == 29
    assert airline_v.num_rows() == 31
    s = airline_v.summary()
    assert s["V1"]["max"] == 2010
    assert s["V10"]["variance"] == pytest.approx(998284.8, abs=1.0)


def test_sql_where(airline):
    """SqlHandlerSpec.scala:43-55: Year>2008 AND Month>1 → exactly one
    row, Year 2010."""
    out = airline.sql("SELECT Year, Month FROM @this WHERE Year > 2008 AND Month > 1")
    rows = out.df.collect()
    assert len(rows) == 1
    assert rows[0]["Year"] == 2010


def test_sql_orderby_limit(airline):
    """SqlHandlerSpec.scala:78-98: order by Year DESC limit 2."""
    out = airline.sql("SELECT Year, Month FROM @this ORDER BY Year DESC LIMIT 2")
    rows = out.df.collect()
    assert len(rows) == 2
    assert rows[0]["Year"] == 2010 and len(rows[0]) == 2


def test_join_goldens(airline, year_names):
    """JoinHandlerSpec.scala:17-60 shape goldens: inner output is 31
    columns (29 left + 2 right), schema gains Name; left semi keeps only
    the 29 left columns; left outer preserves all 31 left rows.

    Row counts are computed differentially from the fixtures (the spec's
    literal '2 rows' golden predates the current 31-row airline.csv —
    with this fixture, matching years 2008/2010 contribute one row per
    airline row, which is also what the reference's group-crossing
    coGroup emits)."""
    import pandas as pd

    pdf = pd.read_csv(f"{REF_RES}/airline.csv", header=None, na_values=["NA"])
    years = pd.read_csv(f"{REF_RES}/year_names.csv", header=None)
    n_matching = pdf[0].isin(set(years[0])).sum()

    inner = airline.join(year_names, "inner", by_left_columns=["Year"], by_right_columns=["Year_num"])
    assert inner.num_rows() == n_matching
    assert len(inner.columns) == 31
    assert "Year" in inner.columns and "Name" in inner.columns

    semi = airline.join(year_names, "leftsemi", by_left_columns=["Year"], by_right_columns=["Year_num"])
    assert semi.num_rows() == n_matching  # one output row per LEFT row — the
    # correct semi multiplicity (the reference impl crosses groups,
    # utils/package.scala:296-305 — same count here since right is unique)
    assert len(semi.columns) == 29
    assert "Name" not in semi.columns

    left = airline.join(year_names, "left", by_left_columns=["Year"], by_right_columns=["Year_num"])
    assert left.num_rows() == 31


def test_aggregate_goldens(airline_v):
    """AggregationHandlerSpec.scala:11-47: keyed aggregate map, scalar
    max, grouped means, correlation 0.8977."""
    agg = airline_v.aggregate("V1, V2, min(V15), max(V16)")
    assert len(agg["2010,3"]) == 2
    assert airline_v.aggregate_on_column("max", "V1") == 2010

    import pandas as pd

    pdf = pd.read_csv(f"{REF_RES}/airline.csv", header=None, na_values=["NA"])
    g = airline_v.group_by(["V3"], ["mean(V16)"])
    mean_col = [c for c in g.columns if c != "V3"][0]
    got = {r["V3"]: r[mean_col] for r in g.df.collect()}
    exp = pdf.groupby(2)[15].mean()  # V3 = col idx 2, V16 = idx 15
    for k, v in exp.items():
        assert got[k] == pytest.approx(v)
    # AggregationHandlerSpec:28 golden row "21,3": Flink's Table avg over
    # INT columns truncates to int (21 = int(21.645)); we keep the honest
    # double mean and check the truncation reproduces the golden
    assert int(got[3]) == 21

    two_step = airline_v.group_by(["V3"], ["mean=avg(V15)"])
    got15 = {r["V3"]: r["mean"] for r in two_step.df.collect()}
    # AggregationHandlerSpec:36 golden "9,3" — same truncation (9 = int(9.x))
    assert int(got15[3]) == 9
    assert got15[3] == pytest.approx(pdf.groupby(2)[14].mean()[3])

    # AggregationHandlerSpec:45 asserts correlation 0.89 ± 1 (tolerance 1.0!);
    # the exact Pearson r on this fixture is 0.9188 — pin to pandas
    cor = airline_v.correlation("V15", "V16")
    assert cor == pytest.approx(pdf[14].corr(pdf[15]))
    assert cor == pytest.approx(0.89, abs=1.0)  # the spec's own (loose) bound


def test_quantiles_goldens(airline_v, mgr, mtcars):
    """StatisticsHandlerSpec.scala:42-62: V5 quantiles [801,1416,1644]
    ±20.01 (TDigest there, GK here); mtcars mpg within interpolation gap."""
    q = airline_v.vector_quantiles("V5", [0.3, 0.5, 0.7])
    for got, exp in zip(q, [801.0, 1416.0, 1644.0]):
        assert got == pytest.approx(exp, abs=20.01)

    mq = mgr.get_ddf("mtcars").vector_quantiles("mpg", [0.0, 0.3, 0.5, 0.3, 1.0])
    # reference golden [10.4, 15.68, 18.95, 15.68, 33.9] is TDigest-
    # interpolated; GK returns order statistics — allow the adjacent gap
    for got, exp in zip(mq, [10.4, 15.68, 18.95, 15.68, 33.9]):
        assert got == pytest.approx(exp, abs=0.5)


def test_histogram_golden(airline_v):
    """StatisticsHandlerSpec.scala:64-70: V15 (ArrDelay), 5 bins — first
    bin starts at -24 with 10 rows."""
    bins = airline_v.vector_histogram("V15", 5)
    assert len(bins) == 5
    x0, y0 = bins[0]
    assert x0 == pytest.approx(-24.0)
    assert y0 == 10


def test_binning_goldens(airline):
    """BinningHandlerSpec.scala:16-98 level-count maps."""
    # equal interval, include_lowest, right: {[1,6]: 26, (6,11]: 5}
    b = airline.binning("Month", "EQUALINTERVAL", num_bins=2, include_lowest=True, right=True)
    counts = b.factor_level_counts(["Month"])["Month"]
    assert counts == {"[1,6]": 26, "(6,11]": 5}

    # exclude lowest, right: {(1,6]: 9, (6,11]: 5} — Month=1 rows dropped
    b2 = airline.binning("Month", "EQUALINTERVAL", num_bins=2, include_lowest=False, right=True)
    counts2 = b2.factor_level_counts(["Month"])["Month"]
    assert counts2 == {"(1,6]": 9, "(6,11]": 5}

    # custom breaks [2,4,6,8]: {[2,4]: 6, (4,6]: 3, (6,8]: 2}, 11 rows kept
    b3 = airline.binning("Month", breaks=[2, 4, 6, 8], include_lowest=True, right=True)
    counts3 = b3.factor_level_counts(["Month"])["Month"]
    assert counts3 == {"[2,4]": 6, "(4,6]": 3, "(6,8]": 2}
    assert b3.num_rows() == 11

    # equal frequency, 2 bins: the Month column is ~55% ones, so the
    # median break duplicates the minimum → point interval [1,1]
    # (BinningHandlerSpec:31-41 golden {[1,1]: 17, (1,11]: 14})
    b4 = airline.binning("Month", "EQUALFREQ", num_bins=2, include_lowest=True, right=True)
    counts4 = b4.factor_level_counts(["Month"])["Month"]
    assert counts4 == {"[1,1]": 17, "(1,11]": 14}

    # DOCUMENTED DIVERGENCE (include_lowest with right=False): the
    # reference labels middle/low intervals "(lo,hi)" open-open
    # (BinningHandler.scala:64-92), silently dropping boundary values —
    # its golden is {[1,6): 24, [6,11): 6} with Month=11 lost. We follow
    # R cut(): contiguous [lo,hi) with include.lowest closing the top —
    # every in-range row lands in exactly one bin.
    b5 = airline.binning("Month", "EQUALINTERVAL", num_bins=2, include_lowest=True, right=False)
    counts5 = b5.factor_level_counts(["Month"])["Month"]
    assert counts5 == {"[1,6)": 24, "[6,11]": 7}
    assert sum(counts5.values()) == 31  # no rows silently lost


def test_missing_data_goldens(airline_na, airline_v):
    """MissingDataHandlerSpec.scala:16-87: drop 9/31 rows, 22/29 columns;
    fill-by-value and fill-by-dict both give sum(V29|2008) = 282."""
    assert airline_na.drop_na(how="any").num_rows() == 9
    assert airline_na.drop_na(how="all").num_rows() == 31
    kept = airline_na.drop_na(axis="column", how="any")
    assert len(kept.columns) == 22

    proj = airline_v.project("V1", "V29")
    filled = proj.fill_na(value=0)
    assert filled.aggregate("V1, sum(V29)")["2008"][0] == pytest.approx(282.0, abs=0.1)

    proj3 = airline_v.project("V1", "V28", "V29")
    filled_d = proj3.fill_na(column_values={"V1": 2000, "V28": 0, "V29": 1})
    # MissingDataHandlerSpec:72-79 asserts 282 for the dict fill too, but
    # that golden is insensitive: filling V29 nulls with 1 must ADD one per
    # formerly-null 2008 row (pandas: fillna(1) → 302); the reference only
    # sees 282 because its aggregate pre-drops null rows (getCleanTable)
    # whether or not the fill happened.
    import pandas as pd

    pdf = pd.read_csv(f"{REF_RES}/airline.csv", header=None, na_values=["NA"])
    expected = pdf[pdf[0] == 2008][28].fillna(1).sum()
    assert filled_d.aggregate("V1, sum(V29)")["2008"][0] == pytest.approx(expected, abs=0.1)


def test_views_goldens(airline, mtcars):
    """ViewHandlerSpec.scala:12-48: remove-column arities, head sizes,
    exact-n sample."""
    assert len(airline.remove_columns("Year").columns) == 28
    assert len(airline.remove_columns("DepTime").columns) == 28
    assert len(airline.remove_columns("Year", "DepTime", "Month").columns) == 26
    assert len(airline.head(3)) == 3

    sample = mtcars.sample_n(10, seed=1)
    assert len(sample) == 10
    assert airline.sample(0.5, seed=1).num_rows() > 0


def test_factor_goldens(mtcars, airline_na):
    """SchemaHandlerSpec.scala:32-90: mtcars factor level counts for
    vs/am/gear/carb (levels keyed by string value, as the reference's
    levelCounts maps are); Origin has 3 levels in airlineWithNA."""
    for c in ("vs", "am", "gear", "carb"):
        mtcars.set_as_factor(c)
    counts = mtcars.factor_level_counts(["vs", "am", "gear", "carb"])
    assert counts["vs"]["1"] == 14 and counts["vs"]["0"] == 18
    assert counts["am"]["1"] == 13
    assert counts["gear"]["4"] == 12 and counts["gear"]["3"] == 15 and counts["gear"]["5"] == 5
    assert counts["carb"]["1"] == 7 and counts["carb"]["2"] == 10

    origin_levels = airline_na.set_as_factor("Origin").factor_levels("Origin")
    assert len(origin_levels) == 3


def test_ml_smoke_goldens(mgr, mtcars):
    """MLSupporterSpec.scala:8-48 shapes: kmeans on mtcars mpg/hp predicts
    for every row; linear regression on regressionData trains and scores."""
    from ddf_flink_spark.ml.facade import MLFacade

    facade = MLFacade(mtcars.df)
    km = facade.kmeans(["mpg", "hp"], k=2)
    preds = facade.apply_model(km, feature_cols=["mpg", "hp"])
    assert preds.count() == 32
    assert "yPredict" in preds.columns

    # the fixture has a trailing comma per line (a 3rd, empty field); the
    # reference's univocity reader silently ignored it — we declare it
    mgr.sql2ddf("CREATE TABLE regression_data (col1 double, col2 double, trail string)")
    reg = mgr.sql2ddf(f"LOAD '{REF_RES}/regressionData.csv' INTO regression_data")
    reg = reg.project("col1", "col2")
    rf = MLFacade(reg.df)
    model = rf.linear_regression(["col1"], "col2", max_iter=10)
    out = rf.apply_model(model, feature_cols=["col1"])
    assert out.count() == reg.num_rows()


def test_transform_goldens(airline_v):
    """TransformationHandlerSpec.scala:13-50 replayed pandas-side:
    expression transform appends the new column in position; map/reduce
    keyval protocol produces (key, val); scaling summaries match."""
    derived = airline_v.transform_native({"newcol": "V5 / V7"})
    assert derived.columns[29] == "newcol"

    subset = airline_v.project("V1", "V4")

    def map_fn(pdf):
        return pdf.rename(columns={"V1": "key", "V4": "val"})

    def reduce_fn(pdf):
        import pandas as pd

        return pd.DataFrame({"key": [pdf["key"].iloc[0]], "val": [int(pdf["val"].sum())]})

    mr = subset.transform_map_reduce(
        map_fn, "key int, val int", ["key"], reduce_fn, "key int, val long"
    )
    assert mr.columns == ["key", "val"]
    got = {r["key"]: r["val"] for r in mr.df.collect()}
    import pandas as pd

    pdf = pd.read_csv(f"{REF_RES}/airline.csv", header=None, na_values=["NA"])
    exp = pdf.groupby(0)[3].sum()
    assert got == {int(k): int(v) for k, v in exp.items()}

    num = airline_v.project(*[c for c in ("V1", "V2", "V3", "V4", "V5", "V6", "V7", "V8")])
    scaled = num.transform_scale_min_max()
    s = scaled.summary()
    assert s["V1"]["min"] < 1.0 and s["V1"]["max"] == 1.0  # Spec:40-44

    z = num.transform_scale_standard()
    assert z.num_rows() == 31
    assert len(z.summary()) == 8  # Spec:46-50


def test_left_semi_multiplicity_divergence_pinned(mgr, airline, spark):
    """PINS the documented LEFT SEMI divergence (utils/package.scala:
    296-305): the reference's coGroup crosses matching groups, so a
    DUPLICATED right key multiplies left rows — semi(left, right) there
    returns |left ⋉| × (right-key multiplicity). This engine emits the
    CORRECT semi multiplicity: exactly one output row per matching LEFT
    row, independent of right-side duplication. The earlier join golden
    (unique right keys) can't distinguish the two; this one can."""
    import pandas as pd

    pdf = pd.read_csv(f"{REF_RES}/airline.csv", header=None, na_values=["NA"])
    # right side with DUPLICATED keys: every matching year appears twice
    dup = spark.createDataFrame(
        [(2008, "a"), (2008, "b"), (2010, "x"), (2010, "y")],
        "Year_num int, Name string",
    )
    dup_ddf = mgr.new_ddf(dup, name="year_names_dup")
    n_matching = int(pdf[0].isin({2008, 2010}).sum())

    semi = airline.join(
        dup_ddf, "leftsemi", by_left_columns=["Year"], by_right_columns=["Year_num"]
    )
    assert semi.num_rows() == n_matching, (
        "semi must emit one row per matching LEFT row"
    )
    # the reference's group-crossing coGroup would have emitted 2x that
    reference_would_emit = 2 * n_matching
    assert semi.num_rows() != reference_would_emit
    # and the inner join DOES multiply — proving the right side really
    # carries duplicate keys (the divergence is in semi semantics only)
    inner = airline.join(
        dup_ddf, "inner", by_left_columns=["Year"], by_right_columns=["Year_num"]
    )
    assert inner.num_rows() == reference_would_emit


def test_bigint_stays_exact_not_double_divergence_pinned(mgr, spark):
    """PINS the documented BIGINT divergence (Column2RowTypeInfo.scala:29:
    ``case ColumnType.BIGINT => BasicTypeInfo.DOUBLE_TYPE_INFO`` — the
    reference materializes BIGINT columns as Java doubles, so any value
    beyond 2^53 silently loses precision: 2^53 + 1 as a double IS 2^53).
    This engine keeps BIGINT as a true 64-bit long end-to-end: the two
    values stay distinct through SQL, aggregation and collect."""
    big = 2**53 + 1
    df = spark.createDataFrame([(1, big), (2, 2**53)], "id int, v long")
    ddf = mgr.new_ddf(df, name="bigint_exact")
    rows = ddf.sql("SELECT id, v FROM @this ORDER BY id").df.collect()
    assert rows[0]["v"] == big and rows[1]["v"] == 2**53
    assert rows[0]["v"] != rows[1]["v"]  # the reference's double cast
    # would collapse these: float(2^53 + 1) == float(2^53)
    assert float(big) == float(2**53)  # the collapse the reference bakes in
    distinct = ddf.sql("SELECT COUNT(DISTINCT v) AS n FROM @this").df.collect()
    assert distinct[0]["n"] == 2
    assert dict(ddf.df.dtypes)["v"] == "bigint"


def test_demo_flow_end_to_end(mgr, airline):
    """Replay the reference's user-facing demo script
    (``/root/reference/docs/demo.md``) END TO END as one flow —
    CREATE+LOAD → sql2ddf → project → @this filter → groupBy+top →
    summary / five-num → binning + factor levels → transformScaleMinMax
    → mutable dropNA → named-DDF colab → ML k-means — asserting each
    step's output against goldens computed INDEPENDENTLY from the csv
    with pandas (never from this engine's own output)."""
    import math

    import pandas as pd

    cols = [c.split()[0] for c in AIRLINE_COLUMNS.split(", ")]
    ref = pd.read_csv(
        f"{REF_RES}/airline.csv", names=cols, na_values=["NA"], keep_default_na=False
    )

    # --- Table like ---------------------------------------------------
    table = mgr.sql2ddf("select * from airline")
    assert table.num_rows() == len(ref) == 31
    assert len(table.columns) == 29
    assert table.columns == cols

    table2 = table.project("ArrDelay", "DepDelay", "Origin", "DayOfWeek", "Cancelled")
    assert table2.columns == ["ArrDelay", "DepDelay", "Origin", "DayOfWeek", "Cancelled"]

    _, isp_rows = table2.sql2list("select * from @this where Origin='ISP'")
    assert len(isp_rows) == int((ref["Origin"] == "ISP").sum())

    table4 = table2.group_by(["Origin"], ["adelay=avg(ArrDelay)"])
    assert table4.num_rows() == ref["Origin"].nunique()
    top2 = table4.top(2, "adelay", ascending=True).df.collect()
    golden_top = (
        ref.groupby("Origin")["ArrDelay"].mean().sort_values().head(2)
    )
    assert [r["Origin"] for r in top2] == list(golden_top.index)
    for r, (_, v) in zip(top2, golden_top.items()):
        assert math.isclose(r["adelay"], v, rel_tol=1e-9)

    # --- R-dataframe-like: summary, five-num, binning, rescale --------
    stats_table = table2.project("ArrDelay", "DepDelay", "DayOfWeek", "Cancelled")
    s = stats_table.summary()
    assert math.isclose(s["ArrDelay"]["mean"], ref["ArrDelay"].mean(), rel_tol=1e-9)
    assert s["ArrDelay"]["count"] == int(ref["ArrDelay"].notna().sum())
    assert s["ArrDelay"]["max"] == ref["ArrDelay"].max()

    fns = stats_table.five_num_summary(["DayOfWeek"])["DayOfWeek"]
    assert fns["min"] == ref["DayOfWeek"].min() and fns["max"] == ref["DayOfWeek"].max()

    table5 = table.binning("Distance", "EQUALINTERVAL", 3, include_lowest=True)
    levels = table5.factor_level_counts(["Distance"])["Distance"]
    lo, hi = ref["Distance"].min(), ref["Distance"].max()
    step = (hi - lo) / 3
    golden_bins = pd.cut(
        ref["Distance"],
        [lo, lo + step, lo + 2 * step, hi],
        include_lowest=True,
    ).value_counts()
    assert sorted(levels.values()) == sorted(int(x) for x in golden_bins.values)
    assert sum(levels.values()) == len(ref)

    rescaled = table2.transform_scale_min_max()
    rs = rescaled.summary()
    assert rs["ArrDelay"]["min"] == 0.0 and rs["ArrDelay"]["max"] == 1.0

    # --- Not MR: mutable dropNA --------------------------------------
    stats_table.set_mutable(True)
    before = stats_table.num_rows()
    dropped = stats_table.drop_na()
    golden_complete = len(ref[["ArrDelay", "DepDelay", "DayOfWeek", "Cancelled"]].dropna())
    assert dropped.num_rows() == golden_complete <= before

    # --- Data colab: named DDFs --------------------------------------
    mgr.set_ddf_name(table2, "flightInfo")
    flight = mgr.get_ddf("flightInfo")
    assert flight.columns == table2.columns

    # --- ML: k-means on (ArrDelay, DepDelay) -------------------------
    from ddf_flink_spark.ml.facade import MLFacade

    ml_data = table.project("ArrDelay", "DepDelay").drop_na()
    facade = MLFacade(ml_data.df)
    model = facade.kmeans(["ArrDelay", "DepDelay"], k=3, max_iter=5)
    preds = facade.apply_model(
        model, ml_data.df, feature_cols=["ArrDelay", "DepDelay"]
    ).collect()
    assert len(preds) == ml_data.num_rows()
    assert {r["yPredict"] for r in preds} <= {0, 1, 2}
