"""Shared helpers for query implementations."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table (scan stays lazy; filters/pruning push down)."""
    from ..catalog import load_table

    return load_table(spark, sf_dir, name)


def dec(col: str | Column, prec: int = 12, scale: int = 4) -> Column:
    """Cast to exact decimal for order-independent, engine-agnostic SUMs."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DecimalType(prec, scale))


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as DOUBLE (deterministic both engines)."""
    return F.sum(col).cast("double").alias(alias)


def ts(s: str) -> Column:
    """Timestamp literal (date-only strings get midnight)."""
    if len(s) == 10:
        s = s + " 00:00:00"
    return F.to_timestamp(F.lit(s))


# revenue := extendedprice * (1 - discount), exact.
def revenue_expr() -> Column:
    return dec("l_extendedprice") * dec(1 - F.col("l_discount"), 12, 8)


REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4)) * "
    "CAST(1 - l_discount AS DECIMAL(12,8))"
)
