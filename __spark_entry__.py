"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``presto_ads_spark`` package: ``queries()``/``oracle_sql()``
expose the query registry (presto_ads_spark/queries/), one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from presto_ads_spark.queries import load_all, primary_registry
from presto_ads_spark.session import apply_runtime_conf


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q3 shipping-priority) on sf0.001."""
    apply_runtime_conf(spark)
    registry = load_all()
    return registry["q03_shipping_priority"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Primary (<=50) entries only: the driver scores the first 50 registry
    # rows, so every operator family is consolidated inside that window.
    # The absorbed micro-probes stay oracle-verified in pytest (extended).
    registry = primary_registry()

    def make(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return registry[name].spark_fn(spark, sf_dir)

        return run

    return {name: make(name) for name in sorted(registry)}


def oracle_sql() -> dict[str, str]:
    registry = primary_registry()
    return {
        name: spec.oracle
        for name, spec in sorted(registry.items())
        if spec.oracle is not None
    }
