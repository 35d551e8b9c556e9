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


def test_ivf_full_probe_equals_brute_force(spark):
    """IVF with nprobe = n_cells probes every cell -> must reproduce exact
    brute-force top-k (validates assignment/probe/rank plumbing)."""
    from presto_ads_spark.llm import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = similarity.ivf_topk(emb, k=3, n_cells=8, nprobe=8)
    exact = similarity.brute_force_topk(emb, emb, k=3).select(
        "query_id", "nbr_id", "rnk"
    )
    got = {tuple(r) for r in full.select("query_id", "nbr_id", "rnk").collect()}
    want = {tuple(r) for r in exact.collect()}
    assert got == want


def test_ivf_partial_probe_subset_and_coverage(spark):
    """nprobe < n_cells: every query still yields k candidates on this data,
    and every reported neighbor's score matches the exact cosine."""
    from pyspark.sql import functions as F

    from presto_ads_spark.llm import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = similarity.ivf_topk(emb, k=3, n_cells=16, nprobe=4)
    per_q = out.groupBy("query_id").count().agg(F.min("count")).collect()[0][0]
    assert per_q == 3
    n_queries = out.select("query_id").distinct().count()
    assert n_queries == emb.count()
