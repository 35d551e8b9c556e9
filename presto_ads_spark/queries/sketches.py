"""Mergeable-sketch queries (Presto qdigest family, SURVEY.md §2.4 M6).

Sketch estimates differ across engines by construction, so — like the HLL
entries — each query emits *error-bound checks* (booleans) and the DuckDB
oracle emits the same shape with TRUE: the gate then verifies that Spark's
sketch answers sit inside the documented rank-error bound against the exact
distribution computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import qdigest as qd
from ..functions import setdigest as sd
from . import q
from ._util import t

# Two compression passes (partial build + merge) at K=200 bound the rank
# error by ~2/K = 1%; 0.015 adds slack for data discreteness at small SF.
_TOL = 0.015


def _rank_checks(spark, sf_dir, sketches, key):
    """Join sketch quantile answers back to orders and verify each answer's
    true rank: frac(o_totalprice <= value_at_quantile(q)) must be within
    _TOL of q. The sketch side is tiny -> broadcast join, no extra shuffle
    of the fact table beyond its one groupBy."""
    quants = sketches.select(
        key,
        qd.value_at_quantile("qdigest", 0.5).alias("p50"),
        qd.value_at_quantile("qdigest", 0.9).alias("p90"),
        qd.value_at_quantile("qdigest", 0.99).alias("p99"),
        qd.total_weight("qdigest").alias("tw"),
    )
    o = t(spark, sf_dir, "orders")
    joined = o.join(F.broadcast(quants), key)
    ranks = joined.groupBy(key).agg(
        F.avg((F.col("o_totalprice") <= F.col("p50")).cast("double")).alias("r50"),
        F.avg((F.col("o_totalprice") <= F.col("p90")).cast("double")).alias("r90"),
        F.avg((F.col("o_totalprice") <= F.col("p99")).cast("double")).alias("r99"),
        F.first("tw").alias("tw"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    return ranks.select(
        key,
        (F.abs(F.col("r50") - 0.5) <= _TOL).alias("p50_ok"),
        (F.abs(F.col("r90") - 0.9) <= _TOL).alias("p90_ok"),
        (F.abs(F.col("r99") - 0.99) <= _TOL).alias("p99_ok"),
        (F.abs(F.col("tw") - F.col("n")) < F.lit(1e-6)).alias("weight_ok"),
    )


@q(
    "qdigest_quantiles",
    extended=True,
    tags=("functions", "approx", "sketch"),
    doc="Presto qdigest_agg + value_at_quantile "
    "(QuantileDigestAggregationFunction.java / QuantileDigestFunctions.java): "
    "two-phase mergeable quantile sketch over orders.o_totalprice per "
    "o_orderpriority; emits rank-error-bound checks, oracle emits TRUE.",
    oracle="""
SELECT o_orderpriority,
  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok, TRUE AS weight_ok
FROM orders GROUP BY o_orderpriority
""",
)
def qdigest_quantiles(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    sk = qd.qdigest_agg(o, ["o_orderpriority"], "o_totalprice")
    return _rank_checks(spark, sf_dir, sk, "o_orderpriority")


@q(
    "qdigest_merge_rollup",
    extended=True,
    tags=("functions", "approx", "sketch"),
    doc="Presto merge(qdigest) mergeability: fine-grained sketches per "
    "(o_orderpriority, o_orderstatus) — the persisted-rollup pattern — are "
    "merged up to per-priority WITHOUT re-reading raw rows, and the merged "
    "sketch's quantiles must still sit inside the rank-error bound.",
    oracle="""
SELECT o_orderpriority,
  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok, TRUE AS weight_ok
FROM orders GROUP BY o_orderpriority
""",
)
def qdigest_merge_rollup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    fine = qd.qdigest_agg(
        o, ["o_orderpriority", "o_orderstatus"], "o_totalprice"
    )
    merged = qd.merge_qdigest(fine, ["o_orderpriority"])
    return _rank_checks(spark, sf_dir, merged, "o_orderpriority")


@q(
    "setdigest_jaccard",
    extended=True,
    tags=("functions", "approx", "sketch"),
    doc="Presto SetDigest family (SetDigestFunctions.java: make_set_digest, "
    "merge, cardinality, jaccard_index, intersection_cardinality) as a "
    "minhash+HLL struct column. Pairwise priority-vs-priority customer-set "
    "similarity; every estimate checked against the exact value computed on "
    "the same data, oracle emits TRUE.",
    oracle="""
SELECT a.o_orderpriority AS pa, b.o_orderpriority AS pb,
  TRUE AS card_ok, TRUE AS jaccard_ok, TRUE AS inter_ok
FROM (SELECT DISTINCT o_orderpriority FROM orders) a
JOIN (SELECT DISTINCT o_orderpriority FROM orders) b
  ON a.o_orderpriority < b.o_orderpriority
""",
)
def setdigest_jaccard(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    digs = o.groupBy("o_orderpriority").agg(
        sd.make_set_digest("o_custkey").alias("d"),
        F.countDistinct("o_custkey").alias("exact_nd"),
    )
    a = digs.select(
        F.col("o_orderpriority").alias("pa"),
        F.col("d").alias("da"),
        F.col("exact_nd").alias("nda"),
    )
    b = digs.select(
        F.col("o_orderpriority").alias("pb"),
        F.col("d").alias("db"),
        F.col("exact_nd").alias("ndb"),
    )
    pairs = a.join(b, F.col("pa") < F.col("pb"))

    sets = o.select("o_orderpriority", "o_custkey").distinct()
    sa = sets.select(F.col("o_orderpriority").alias("pa"), "o_custkey")
    sb = sets.select(F.col("o_orderpriority").alias("pb"), "o_custkey")
    exact = (
        sa.join(sb, "o_custkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )

    out = pairs.join(exact, ["pa", "pb"], "left").select(
        "pa",
        "pb",
        # HLL cardinality within 5% of exact distinct count
        (
            F.abs(sd.cardinality_setdigest("da") - F.col("nda"))
            <= 0.05 * F.col("nda")
        ).alias("card_ok"),
        # minhash jaccard within 2.5 sigma of K=64 (~0.16 absolute)
        (
            F.abs(
                sd.jaccard_index("da", "db")
                - F.coalesce(F.col("exact_inter"), F.lit(0))
                / (F.col("nda") + F.col("ndb") - F.coalesce(F.col("exact_inter"), F.lit(0)))
            )
            <= 0.16
        ).alias("jaccard_ok"),
        # intersection estimate within 20% of the union size
        (
            F.abs(
                sd.intersection_cardinality("da", "db")
                - F.coalesce(F.col("exact_inter"), F.lit(0))
            )
            <= 0.20
            * (F.col("nda") + F.col("ndb") - F.coalesce(F.col("exact_inter"), F.lit(0)))
        ).alias("inter_ok"),
    )
    return out
