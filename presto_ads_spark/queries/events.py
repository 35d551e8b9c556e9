"""Event-table queries: time rollups, sessionization, pivots — the
time-series shapes (reference: date/time function surface
DateTimeFunctions.java + window operators; sessionization is the batch twin
of the streaming module's windowed ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import q
from ._util import dec, dsum, t
from ..streaming import sessionize


@q(
    "events_time_rollup",
    extended=True,
    tags=("events", "datetime", "agg"),
    bench=True,
    oracle="""
SELECT date_trunc('hour', ts) AS hour, event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniq_users
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
GROUP BY date_trunc('hour', ts), event_type
""",
)
def events_time_rollup(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("value", 14, 4), "total"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
    )


@q(
    "events_sessionize",
    bench=True,
    tags=("events", "window", "streaming"),
    doc="Gap-based sessionization (lag + running sum of session breaks) — "
    "the oracle-checkable batch twin of streaming session windows.",
    oracle="""
SELECT event_id, user_id, ts, event_type,
  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts, event_type,
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id < 60
) marked
""",
)
def events_sessionize(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    out = sessionize(e, gap_minutes=30)
    return out.select("event_id", "user_id", "ts", "event_type", "session_id")


@q(
    "events_pivot_status",
    extended=True,
    tags=("events", "pivot", "agg"),
    doc="PIVOT (Spark relational pivot ≡ Presto's conditional-agg idiom).",
    oracle="""
SELECT user_id,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error
FROM events WHERE user_id < 50
GROUP BY user_id
""",
)
def events_pivot_status(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent combos; the FILTER oracle yields 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ("click", "view", "purchase", "signup", "error")],
    )
