"""Aggregate-function compat builders (FunctionRegistry.java:430-471).

SQL temp functions can't define aggregates, so Presto aggregates that Spark
lacks are exposed as *Column builders*: Spark-native expression compositions
usable in ``df.agg(...)`` / ``F.expr`` contexts. Everything stays JVM-side.

Direct Spark natives (no shim needed, documented for the coverage matrix):
``count_if, bool_and→every, bool_or→some, max_by/min_by, any_value,
skewness, kurtosis, corr, covar_samp/pop, var_samp/pop, stddev_samp/pop,
regr_slope/regr_intercept (Spark 3.4+), collect_list→array_agg,
bit_and/bit_or/bit_xor``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def geometric_mean(col: str | Column) -> Column:
    """Presto geometric_mean (GeometricMeanAggregations.java): exp(avg(ln))."""
    return F.exp(F.avg(F.ln(_c(col))))


def map_agg(key: str | Column, value: str | Column) -> Column:
    """Presto map_agg(k, v) → map (sorted entries: deterministic order)."""
    return F.map_from_entries(
        F.array_sort(F.collect_list(F.struct(_c(key), _c(value))))
    )


def multimap_agg(key: str | Column, value: str | Column) -> Column:
    """Presto multimap_agg(k, v) → map<k, array<v>>."""
    entries = F.array_sort(
        F.collect_list(F.struct(_c(key).alias("k"), _c(value).alias("v")))
    )
    keys = F.array_distinct(F.transform(entries, lambda e: e["k"]))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(entries, lambda e: e["k"] == k), lambda e: e["v"]
            ),
        ),
    )


def map_union(col: str | Column) -> Column:
    """Presto map_union: merge maps across rows (last-wins on key clash,
    made deterministic by sorting entries)."""
    all_entries = F.flatten(F.collect_list(F.map_entries(_c(col))))
    return F.map_from_entries(F.array_sort(all_entries))


def histogram(col: str | Column) -> Column:
    """Presto histogram(x) → map<x, count>. Composition: per-value counts
    then map_from_entries — but as a *single* aggregate expression we pivot
    through a sorted entry list. For large cardinality use the two-level
    groupBy form (queries/functions_sql.py agg_histogram_map)."""
    vals = F.array_sort(F.collect_list(_c(col)))
    distinct = F.array_distinct(vals)
    return F.map_from_arrays(
        distinct,
        F.transform(distinct, lambda v: F.size(F.filter(vals, lambda x: x == v))),
    )


def numeric_histogram(col: str | Column, buckets: int, lo: float, hi: float) -> Column:
    """Presto numeric_histogram(buckets, x) approximation with fixed bounds:
    map<bucket_floor, count>. (Presto's adapts bounds per-group; fixed
    bounds keep the result deterministic and mergeable at scale.)"""
    width = (hi - lo) / buckets
    bucket = F.floor((_c(col) - F.lit(lo)) / F.lit(width))
    clamped = F.least(F.greatest(bucket, F.lit(0)), F.lit(buckets - 1))
    entries = F.array_sort(
        F.collect_list(F.lit(lo) + clamped.cast("double") * F.lit(width))
    )
    distinct = F.array_distinct(entries)
    return F.map_from_arrays(
        distinct,
        F.transform(distinct, lambda v: F.size(F.filter(entries, lambda x: x == v))),
    )


def checksum(col: str | Column) -> Column:
    """Presto checksum: order-independent hash of a column
    (ChecksumAggregationFunction) — xor of per-row xxhash64."""
    return F.bit_xor(F.xxhash64(_c(col)))


def reduce_agg(col: str | Column, initial, input_fn, combine_fn) -> Column:
    """Presto reduce_agg (ReduceAggregationFunction.java): fold rows through
    a lambda. Spark has no lambda-aggregate; the faithful shim collects then
    folds with the ``aggregate`` HOF (exact for modest groups; for huge
    groups write a custom Aggregator instead — documented limitation)."""
    return F.aggregate(F.collect_list(_c(col)), initial, input_fn, lambda acc: acc)


def approx_percentile_array(col: str | Column, percentages: list[float]) -> Column:
    """Presto approx_percentile(x, ARRAY[...]) → array of estimates."""
    return F.percentile_approx(
        _c(col), F.array(*[F.lit(p) for p in percentages]), F.lit(10000)
    )
