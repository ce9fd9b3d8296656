"""ML facade: the reference's ML surface on pyspark.ml.

Reference: ``flink/src/main/scala/io/ddf/flink/ml/`` — reflective
``train(methodKey, params)`` + DataSet conversion (``FlinkMLSupporter.
scala:26-56``, ``ReflectHelper.scala``), typed facades svm/mlr/als/kMeans
(``FlinkMLFacade.scala:56-157``), a fully vendored KMeans
(``org/apache/flink/ml/clustering/KMeans.scala``, 615 LoC — deleted here:
``pyspark.ml.clustering.KMeans`` with ``initMode="k-means||"`` is the same
algorithm, distributed), confusion matrix via bit-packed map-reduce
(``FlinkMLSupporter.scala:71-100``), and the metrics the reference left
unimplemented (``MLMetricsSupporter.scala:6-8``, ``README.md:80``) —
implemented here for real via pyspark.ml evaluators.

Feature columns are assembled once (VectorAssembler) — the Spark
equivalent of the reference's representation conversion to
``DataSet[LabeledVector]`` (SURVEY §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MLFacade", "confusion_counts", "confusion_matrix"]


def _assemble(df: DataFrame, feature_cols: list[str], out: str = "features") -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    if out in df.columns:
        if feature_cols == [out]:
            return df  # caller already assembled the vector column
        raise ValueError(
            f"column {out!r} already exists; pass feature_cols=[{out!r}] to use it "
            "as the assembled vector, or drop/rename it first"
        )
    return VectorAssembler(inputCols=feature_cols, outputCol=out).transform(df)


class MLFacade:
    """``ddf.ml`` — train/apply in the reference's shapes.

    Each ``*_fit`` returns (model, predictions_fn); ``apply_model`` mirrors
    the reference's ``applyModel`` (appends ``yPredict``,
    ``FlinkModel.scala:9-29``).
    """

    def __init__(self, df: DataFrame):
        self.df = df

    # ------------------------------------------------------------- dispatch
    #: methodKey → facade, mirroring the reference's config-string
    #: indirection (``ddf-conf/ddf.ini:74-77``: svm / mlr / als / kMeans →
    #: Flink class names, resolved reflectively by
    #: ``FlinkMLSupporter.scala:26-36`` + ``ReflectHelper``). Spark build:
    #: the keys resolve to the typed facades below — no reflection needed,
    #: and unknown keys fail loudly instead of a ClassNotFoundException.
    _TRAIN_KEYS = {
        "svm": "svm",
        "mlr": "linear_regression",
        "linearregression": "linear_regression",
        "als": "als",
        "collaborativefiltering": "als",
        "kmeans": "kmeans",
    }

    def train(self, method_key: str, params: dict | None = None):
        """``train(methodKey, params)`` — the reference's string-key entry
        point (``FlinkMLSupporter.scala:26-36``): the key is looked up in
        config (``ddf.ini:74-77``) and dispatched. ``params`` maps to the
        typed facade's kwargs (the ParameterMap equivalent)."""
        name = self._TRAIN_KEYS.get(method_key.replace("_", "").lower())
        if name is None:
            raise KeyError(
                f"unknown train method key {method_key!r}; "
                f"known: {sorted(set(self._TRAIN_KEYS))}"
            )
        return getattr(self, name)(**(params or {}))

    # -------------------------------------------------------------- facades
    def kmeans(self, feature_cols: list[str], k: int = 2, max_iter: int = 20, seed: int = 42):
        """KMeans (replaces the vendored Flink KMeans; k-means|| init)."""
        from pyspark.ml.clustering import KMeans

        data = _assemble(self.df, feature_cols)
        model = KMeans(k=k, maxIter=max_iter, seed=seed, initMode="k-means||").fit(data)
        return model

    def linear_regression(
        self, feature_cols: list[str], label_col: str, max_iter: int = 20, reg_param: float = 0.0
    ):
        """mlr facade (``FlinkMLFacade.scala`` multiple-linear-regression)."""
        from pyspark.ml.regression import LinearRegression

        data = _assemble(self.df, feature_cols)
        return LinearRegression(
            maxIter=max_iter, regParam=reg_param, labelCol=label_col, featuresCol="features"
        ).fit(data)

    def svm(self, feature_cols: list[str], label_col: str, max_iter: int = 20, reg_param: float = 0.01):
        """svm facade → LinearSVC (hinge loss, the same linear classifier)."""
        from pyspark.ml.classification import LinearSVC

        data = _assemble(self.df, feature_cols)
        return LinearSVC(
            maxIter=max_iter, regParam=reg_param, labelCol=label_col, featuresCol="features"
        ).fit(data)

    def als(
        self, user_col: str, item_col: str, rating_col: str, rank: int = 10,
        max_iter: int = 10, reg_param: float = 0.1, seed: int = 42,
    ):
        """ALS collaborative filtering (``FlinkMLFacade.scala`` als)."""
        from pyspark.ml.recommendation import ALS

        return ALS(
            rank=rank, maxIter=max_iter, regParam=reg_param, seed=seed,
            userCol=user_col, itemCol=item_col, ratingCol=rating_col,
            coldStartStrategy="drop",
        ).fit(self.df)

    # ---------------------------------------------------------------- apply
    def apply_model(self, model, df: DataFrame | None = None, feature_cols: list[str] | None = None,
                    prediction_col: str = "yPredict") -> DataFrame:
        """``applyModel`` — predict and append ``yPredict``
        (``FlinkMLSupporter.scala:38-56``)."""
        data = df if df is not None else self.df
        if feature_cols:
            data = _assemble(data, feature_cols)
        out = model.transform(data)
        pred_col = model.getPredictionCol() if hasattr(model, "getPredictionCol") else "prediction"
        return out.withColumnRenamed(pred_col, prediction_col)

    # -------------------------------------------------------------- metrics
    def r2(self, predictions: DataFrame, label_col: str, prediction_col: str = "prediction") -> float:
        """R² — unimplemented in the reference (``README.md:80``)."""
        from pyspark.ml.evaluation import RegressionEvaluator

        return RegressionEvaluator(
            labelCol=label_col, predictionCol=prediction_col, metricName="r2"
        ).evaluate(predictions)

    def rmse(self, predictions: DataFrame, label_col: str, prediction_col: str = "prediction") -> float:
        from pyspark.ml.evaluation import RegressionEvaluator

        return RegressionEvaluator(
            labelCol=label_col, predictionCol=prediction_col, metricName="rmse"
        ).evaluate(predictions)

    def roc_auc(self, predictions: DataFrame, label_col: str, raw_col: str = "rawPrediction") -> float:
        from pyspark.ml.evaluation import BinaryClassificationEvaluator

        return BinaryClassificationEvaluator(
            labelCol=label_col, rawPredictionCol=raw_col, metricName="areaUnderROC"
        ).evaluate(predictions)


def confusion_counts(
    predictions: DataFrame, label_col: str, prediction_col: str = "prediction", threshold: float = 0.5
) -> DataFrame:
    """Grouped (yt, yp, n) confusion counts — the distributed core of
    ``getConfusionMatrix`` (``FlinkMLSupporter.scala:71-100``). One
    partial+final hash aggregation; no driver-side loop."""
    yt = (F.col(label_col) > threshold).cast("int")
    yp = (F.col(prediction_col) > threshold).cast("int")
    return (
        predictions.select(yt.alias("yt"), yp.alias("yp"))
        .groupBy("yt", "yp")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def confusion_matrix(
    predictions: DataFrame, label_col: str, prediction_col: str = "prediction", threshold: float = 0.5
) -> list[list[int]]:
    """2×2 confusion counts (``FlinkMLSupporter.scala:71-100`` bit-packed
    map-reduce) as one declarative groupBy: [[TN, FP], [FN, TP]]."""
    counts = {
        (r["yt"], r["yp"]): r["n"]
        for r in confusion_counts(predictions, label_col, prediction_col, threshold).collect()
    }
    return [
        [counts.get((0, 0), 0), counts.get((0, 1), 0)],
        [counts.get((1, 0), 0), counts.get((1, 1), 0)],
    ]
