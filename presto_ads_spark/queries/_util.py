"""Shared helpers for query implementations."""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table (scan stays lazy; filters/pruning push down)."""
    from ..catalog import load_table

    return load_table(spark, sf_dir, name)


# Fallback for spark.sql.files.maxPartitionBytes when no session is
# active (Spark's default input split size).
_DEFAULT_MAX_PARTITION_BYTES = 128 << 20

_BYTE_SUFFIXES = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-string conf value ("134217728b", "128m", "1g")."""
    s = str(v).strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, suffix = s[:i], s[i:].strip()
    return int(num) * _BYTE_SUFFIXES[suffix]


def max_partition_bytes(session: SparkSession | None = None) -> int:
    """Effective spark.sql.files.maxPartitionBytes — read at call time
    (r13 verdict item 6: a hardcoded 128 MB silently diverges from
    Spark's real split count whenever the conf is tuned, making
    ``spread`` fire — or not — wrongly).

    Pass the session that will RUN the query when you have it: the
    active-session fallback reads the wrong conf when several sessions
    with diverged runtime confs coexist (e.g. ``spark.newSession()`` in
    the same JVM — caught by the full test suite's session mix)."""
    from pyspark.sql import SparkSession

    s = session or SparkSession.getActiveSession()
    if s is not None:
        try:
            return _parse_bytes(s.conf.get("spark.sql.files.maxPartitionBytes"))
        except Exception:
            pass
    return _DEFAULT_MAX_PARTITION_BYTES


def scan_parts(
    sf_dir: str, *names: str, session: SparkSession | None = None
) -> int:
    """Estimated number of scan partitions Spark will give the named
    tables combined: ceil(file_size / maxPartitionBytes) per file. An
    unreadable path returns a huge count so ``spread`` stays a no-op.

    Caveat (r13 advice): the estimate is bytes-based. A single-row-group
    parquet file just over the split size estimates 2 parts but still
    yields one non-empty scan task, so ``spread`` under-fires there; the
    fixtures this estimate was tuned on are single-row-group files well
    under one split."""
    mpb = max_partition_bytes(session)
    total = 0
    for name in names:
        try:
            size = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
        except OSError:
            return 1 << 20
        total += max(1, math.ceil(size / mpb))
    return total


def spread(df: DataFrame, est_parts: int) -> DataFrame:
    """Scale-adaptive parallelism fix for unsplittable SERIAL scans
    (optimization guide §2.5, input skew): the bench fixtures are
    single-row-group parquet files, so every scan is ONE task and all
    downstream narrow work (HOF projections, broadcast-join probes,
    partial aggregates) serializes on one core. When the estimated scan
    partition count is exactly 1, round-robin repartition immediately
    after the read so the compute above the exchange fans out across
    the session's parallelism. Past one split this is a NO-OP — an
    interleaved sf1 A/B on q01 (lineitem at 2 natural splits) read the
    exchange as a net LOSS (1.47 s natural vs 1.96 s spread: the full-
    table shuffle costs more than doubling an already-parallel partial
    agg recovers), while the single-split sf0.1 A/Bs all read it as a
    win — so the predicate is "fix serial scans", never "add exchanges
    to parallel ones". At 100 TB every scan has many splits and the
    plan is untouched."""
    if os.environ.get("SPARK_GRAFT_SPREAD") == "0":  # A/B toggle (r13)
        return df
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if est_parts == 1 and p > 1:
        return df.repartition(p)
    return df


def t_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``t()`` + ``spread`` keyed on the table's own file size."""
    return spread(
        t(spark, sf_dir, name), scan_parts(sf_dir, name, session=spark)
    )


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
