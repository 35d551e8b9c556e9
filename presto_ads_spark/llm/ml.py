"""ML function parity: learn_classifier / classify / learn_regressor /
regress (reference: presto-ml/.../MLFunctions.java,
LearnClassifierAggregation.java — SVM via libsvm inside an aggregate).

Spark-first equivalent: MLlib estimators over the embeddings table. The
Presto shape (an *aggregate* producing a model value, then a scalar applying
it) maps onto fit()/transform(); these wrappers keep the same two-step call
pattern so a presto-ads user's workflow translates 1:1. Training is
distributed (MLlib's L-BFGS), inference is a vectorized transform — both
scale with executors, unlike the reference's single-node libsvm fit.
"""

from __future__ import annotations

from pyspark.ml.classification import LinearSVC, OneVsRest
from pyspark.ml.functions import array_to_vector
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _vectorize(df: DataFrame, features_col: str) -> DataFrame:
    return df.withColumn("__features", array_to_vector(F.col(features_col)))


def learn_classifier(df: DataFrame, features_col: str, label_col: str):
    """Presto learn_classifier(label, features) — returns a fitted model.

    LinearSVC matches the reference's model family (libsvm C_SVC with a
    LINEAR kernel, LibSvmUtils.java:34); OneVsRest extends it past two
    classes the same way the SQL-surface trainer does."""
    vec = _vectorize(df, features_col)
    svc = LinearSVC(featuresCol="__features", labelCol=label_col, maxIter=50)
    n_classes = vec.select(label_col).distinct().count()
    if n_classes > 2:
        return OneVsRest(
            classifier=svc, featuresCol="__features", labelCol=label_col
        ).fit(vec)
    return svc.fit(vec)


def classify(df: DataFrame, model, features_col: str) -> DataFrame:
    """Presto classify(features, model) — adds a ``prediction`` column."""
    return (
        model.transform(_vectorize(df, features_col))
        .withColumn("prediction", F.col("prediction").cast("int"))
        .drop("__features", "rawPrediction", "probability")
    )


def learn_regressor(df: DataFrame, features_col: str, label_col: str):
    """Presto learn_regressor — linear regression flavor."""
    lr = LinearRegression(
        featuresCol="__features", labelCol=label_col, maxIter=25
    )
    return lr.fit(_vectorize(df, features_col))


def regress(df: DataFrame, model, features_col: str) -> DataFrame:
    return model.transform(_vectorize(df, features_col)).drop("__features")
