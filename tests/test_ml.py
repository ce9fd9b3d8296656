"""ML facade tests (SURVEY §2.16) — svm/mlr/als/kmeans smoke in the shapes
of ``ml/MLSupporterSpec.scala:8-48``, plus the metrics the reference left
unimplemented (``MLMetricsSupporter.scala:6-8``) pinned against closed-form
DuckDB REGR_* aggregates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ddf_flink_spark.ml.facade import MLFacade, confusion_matrix

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_linreg_matches_closed_form_ols(spark, duck, lineitem):
    model = MLFacade(lineitem).linear_regression(["l_quantity"], "l_extendedprice")
    slope, intercept, r2 = duck.execute(
        "SELECT REGR_SLOPE(l_extendedprice, l_quantity),"
        "       REGR_INTERCEPT(l_extendedprice, l_quantity),"
        "       REGR_R2(l_extendedprice, l_quantity) FROM lineitem"
    ).fetchone()
    assert float(model.coefficients[0]) == pytest.approx(slope, rel=1e-6)
    assert float(model.intercept) == pytest.approx(intercept, rel=1e-6)
    assert float(model.summary.r2) == pytest.approx(r2, rel=1e-6)


def test_svm_smoke_and_apply_model(spark, lineitem):
    df = lineitem.select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        "l_quantity", "l_discount", "l_tax",
    )
    facade = MLFacade(df)
    model = facade.svm(["l_quantity", "l_discount", "l_tax"], "label", max_iter=5)
    preds = facade.apply_model(model, feature_cols=["l_quantity", "l_discount", "l_tax"])
    assert "yPredict" in preds.columns
    assert preds.count() == df.count()
    auc = facade.roc_auc(preds, "label")
    assert 0.0 <= auc <= 1.0


def test_kmeans_deterministic(spark):
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    f = MLFacade(emb)
    m1 = f.kmeans(["features"], k=4)
    m2 = f.kmeans(["features"], k=4)
    c1 = [list(c) for c in m1.clusterCenters()]
    c2 = [list(c) for c in m2.clusterCenters()]
    assert c1 == c2
    preds = m1.transform(emb)
    assert preds.select("prediction").distinct().count() == 4
    assert preds.count() == emb.count()


def test_als_smoke(spark):
    from ddf_flink_spark.registry import events_table

    events = events_table(spark, SF_DIR)
    ratings = events.select(
        F.col("user_id").cast("int").alias("user"),
        (F.abs(F.hash("event_type")) % 50).cast("int").alias("item"),
        F.col("value").cast("float").alias("rating"),
    ).limit(5000)
    model = MLFacade(ratings).als("user", "item", "rating", rank=4, max_iter=3)
    preds = model.transform(ratings)
    assert "prediction" in preds.columns
    assert preds.count() > 0


def test_confusion_matrix_golden(spark, duck, lineitem):
    df = lineitem.select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        (F.col("l_discount") > 0.05).cast("double").alias("prediction"),
    )
    mat = confusion_matrix(df, "label", "prediction")
    rows = duck.execute(
        "SELECT CAST(l_returnflag='R' AS INT), CAST(l_discount>0.05 AS INT), COUNT(*) "
        "FROM lineitem GROUP BY 1,2"
    ).fetchall()
    expected = [[0, 0], [0, 0]]
    for yt, yp, n in rows:
        expected[yt][yp] = n
    assert mat == expected


def test_rmse_r2_evaluators(spark, lineitem):
    from ddf_flink_spark.ml.facade import _assemble

    df = lineitem.select("l_quantity", "l_extendedprice")
    facade = MLFacade(df)
    model = facade.linear_regression(["l_quantity"], "l_extendedprice")
    preds = model.transform(_assemble(df, ["l_quantity"]))
    r2 = facade.r2(preds, "l_extendedprice")
    rmse = facade.rmse(preds, "l_extendedprice")
    assert 0.0 <= r2 <= 1.0
    assert rmse > 0
    assert r2 == pytest.approx(model.summary.r2, rel=1e-9)


def test_train_string_key_dispatch(spark, lineitem):
    # the reference's train(methodKey, params) entry point
    # (FlinkMLSupporter.scala:26-36, ddf-conf/ddf.ini:74-77)
    facade = MLFacade(lineitem)
    m = facade.train(
        "mlr", {"feature_cols": ["l_quantity"], "label_col": "l_extendedprice"}
    )
    assert hasattr(m, "coefficients")
    # kMeans key is case-insensitive like the ini key "kMeans"
    m2 = facade.train("kMeans", {"feature_cols": ["l_quantity", "l_discount"], "k": 2})
    assert len(m2.clusterCenters()) == 2
    with pytest.raises(KeyError, match="unknown train method"):
        facade.train("gradientBoost")


def test_ml_after_iterative_operators_session_not_poisoned(spark, lineitem):
    """REGRESSION (round 5): the iterative operators' convergence metric
    briefly used a pyspark Observation, whose registration with the
    session-wide ObservationManager outlives the query and leaves the
    SparkSession transitively unserializable — any later ML evaluation
    whose closure captures the session (LinearSVC training summaries)
    died with 'Task not serializable: ObservationManager'. The metric
    now rides a NAMED observe() read from observedMetrics
    (storage.observed_local_checkpoint, registration-free). This test
    runs CC + PageRank first, then trains/evaluates in the SAME session."""
    from pyspark.sql import functions as F

    from ddf_flink_spark.functions.dedup import connected_components
    from ddf_flink_spark.functions.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    connected_components(edges, nodes).collect()
    pagerank(edges, nodes, iterations=2).collect()

    df = lineitem.select(
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
        "l_quantity", "l_discount", "l_tax",
    )
    facade = MLFacade(df)
    model = facade.svm(["l_quantity", "l_discount", "l_tax"], "label", max_iter=3)
    preds = facade.apply_model(model, feature_cols=["l_quantity", "l_discount", "l_tax"])
    auc = facade.roc_auc(preds, "label")
    assert 0.0 <= auc <= 1.0


def test_quality_classifier_recovers_planted_boundary(spark):
    """q247's trained head: pyspark.ml LogisticRegression on the raw
    quality features must recover the deterministic twin's planted 0.5
    decision boundary (linearly separable in z by construction) — both
    contract flags TRUE — and the score-decile rollup must partition
    the corpus exactly."""
    from ddf_flink_spark.registry import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    rows = QUERIES["q247_quality_classifier"](spark, sf_dir).collect()
    assert rows, "decile rollup must be non-empty"
    assert all(r.trained_acc_ok for r in rows), "accuracy contract must hold"
    assert all(r.trained_auc_ok for r in rows), "AUC contract must hold"
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs, "deciles must partition corpus"
    assert all(0 <= r.bucket <= 10 for r in rows)
