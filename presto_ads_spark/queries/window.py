"""Window-function coverage (SURVEY.md §2.4 "Window functions", M3).

Reference: WindowOperator (operator/WindowOperator.java:47), the 11
ranking/value functions in operator/window/, frames via FrameInfo.java:28
(ROWS/RANGE), and the TopNRowNumber pushdown
(optimizations/WindowFilterPushDown.java:62 → Spark's WindowGroupLimitExec).

Determinism: every ORDER BY inside a window ends with a unique tiebreaker;
windowed SUMs over doubles go through exact decimals.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import q
from ._util import dec, t


@q(
    "window_ranking",
    extended=True,
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER w AS rn,
  RANK() OVER w2 AS rk,
  DENSE_RANK() OVER w2 AS drk,
  NTILE(4) OVER w AS nt
FROM orders WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
""",
)
def window_ranking(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w2).alias("rk"),
        F.dense_rank().over(w2).alias("drk"),
        F.ntile(4).over(w).alias("nt"),
    )


@q(
    "window_offset_values",
    extended=True,
    tags=("window",),
    oracle="""
SELECT event_id, user_id, value,
  LAG(value) OVER w AS prev_v,
  LAG(value, 2, -1.0) OVER w AS prev2_v,
  LEAD(value) OVER w AS next_v,
  FIRST_VALUE(value) OVER w AS first_v,
  LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
  NTH_VALUE(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_v
FROM events WHERE user_id < 40
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_offset_values(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_v"),
        F.lead("value").over(w).alias("next_v"),
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(wfull).alias("last_v"),
        F.nth_value("value", 2).over(wfull).alias("second_v"),
    )


@q(
    "window_frames",
    extended=True,
    tags=("window",),
    oracle="""
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
  CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(value AS DECIMAL(12,4))
    RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS cnt_range
FROM events WHERE user_id < 40
""",
)
def window_frames(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vdec = dec("value")
    wrange = Window.partitionBy("user_id").orderBy(vdec).rangeBetween(-10, 0)
    return e.select(
        "event_id",
        "user_id",
        F.sum(vdec).over(wt.rowsBetween(-3, 0)).cast("double").alias("moving_sum"),
        F.sum(vdec)
        .over(wt.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_sum"),
        F.count(F.lit(1)).over(wrange).alias("cnt_range"),
    )


@q(
    "window_topn_per_group",
    extended=True,
    tags=("window", "topn"),
    bench=True,
    doc="TopNRowNumberOperator analogue; Spark plans WindowGroupLimit "
    "(rank pushdown) — the 100-TB-safe top-N-per-key pattern.",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) ranked WHERE rn <= 3
""",
)
def window_topn_per_group(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@q(
    "window_agg_stats",
    extended=True,
    tags=("window",),
    oracle="""
SELECT l_orderkey, l_linenumber,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_qty,
  COUNT(*) OVER (PARTITION BY l_orderkey) AS order_lines,
  PERCENT_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity, l_orderkey, l_linenumber) AS pr,
  CUME_DIST() OVER (PARTITION BY l_suppkey ORDER BY l_quantity, l_orderkey, l_linenumber) AS cd
FROM lineitem WHERE l_orderkey < 2000
""",
)
def window_agg_stats(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    wp = Window.partitionBy("l_orderkey")
    ws = Window.partitionBy("l_suppkey").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(wp).cast("double").alias("order_qty"),
        F.count(F.lit(1)).over(wp).alias("order_lines"),
        F.percent_rank().over(ws).alias("pr"),
        F.cume_dist().over(ws).alias("cd"),
    )
