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


# ===========================================================================
# Temporal join operators (presto_ads_spark/operators/): as-of join and
# banded range join — beyond-parity ops (no Presto 0.216 analog; DuckDB's
# native ASOF / inequality joins are the oracles).
# ===========================================================================


@q(
    "events_asof_join",
    extended=True,
    tags=("events", "operator", "asof"),
    bench=True,
    doc="Backward as-of join: every click gets the latest prior view of "
    "the same user (union + ordered window — one shuffle, no join node; "
    "the naive theta-join formulation nested-loops at scale).",
    oracle="""
SELECT c.event_id, c.user_id, c.ts, c.value,
       v.ts AS ts_r, v.value AS value_r
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND v.ts <= c.ts
""",
)
def events_asof_join(spark, sf_dir):
    from ..operators import asof_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, views, on="ts", by=("user_id",), value_cols=("value",)
    )


@q(
    "events_range_join",
    extended=True,
    tags=("events", "operator", "range"),
    doc="Banded range join: clicks landing inside [purchase, purchase+1h) "
    "windows of the same user — interval-bucketed equi-join (hash join on "
    "(user, bucket)), never an inequality nested loop.",
    oracle="""
SELECT c.event_id, c.user_id, c.ts,
       p.event_id AS w_id, p.ts AS w_start,
       p.ts + INTERVAL 1 HOUR AS w_end
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click') c
JOIN (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts <= c.ts AND c.ts < p.ts + INTERVAL 1 HOUR
""",
)
def events_range_join(spark, sf_dir):
    from ..operators import range_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    windows = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("w_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    return range_join(
        clicks,
        windows,
        left_time="ts",
        right_start="w_start",
        right_end="w_end",
        by=("user_id",),
        bucket_secs=3600,
    )


@q(
    "events_asof_join_bucketed",
    extended=True,
    tags=("events", "operator", "asof", "skew"),
    doc="SKEW-path as-of join (bucket_secs): windows over (user, "
    "6h-bucket) with a tiny cross-bucket seed-carry frame instead of "
    "one partition per user — a hot user spreads across its time range "
    "(window stages get no AQE skew help). Semantics-identical to "
    "events_asof_join; same DuckDB ASOF oracle.",
    oracle="""
SELECT c.event_id, c.user_id, c.ts, c.value,
       v.ts AS ts_r, v.value AS value_r
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND v.ts <= c.ts
""",
)
def events_asof_join_bucketed(spark, sf_dir):
    from ..operators import asof_join

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, views, on="ts", by=("user_id",), value_cols=("value",),
        bucket_secs=21600,
    )
