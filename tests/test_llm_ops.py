"""LLM/ML operator unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_ads_spark.queries._util import t
from tests.conftest import SF_DIR


def test_learn_classify_pipeline(spark):
    from presto_ads_spark.llm import ml

    emb = t(spark, SF_DIR, "embeddings")
    # learnable target: label derived from the embedding itself
    data = emb.withColumn(
        "target",
        (F.element_at(F.transform("embedding", lambda x: x.cast("double")), 1) > 0).cast("int"),
    )
    model = ml.learn_classifier(data, "embedding", "target")
    scored = ml.classify(data, model, "embedding")
    acc = (
        scored.select(
            (F.col("prediction") == F.col("target")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc > 0.9, f"separable target should be learnable, acc={acc}"
    assert scored.count() == emb.count()


def test_learn_regress_pipeline(spark):
    from presto_ads_spark.llm import ml

    emb = t(spark, SF_DIR, "embeddings")
    data = emb.withColumn(
        "y",
        F.aggregate(
            F.slice(F.transform("embedding", lambda x: x.cast("double")), 1, 4),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    model = ml.learn_regressor(data, "embedding", "y")
    out = ml.regress(data, model, "embedding")
    err = (
        out.select(F.abs(F.col("prediction") - F.col("y")).alias("e"))
        .agg(F.max("e"))
        .collect()[0][0]
    )
    assert err < 0.01, f"linear target should fit exactly, max err={err}"
