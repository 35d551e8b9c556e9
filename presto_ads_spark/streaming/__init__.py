"""Structured Streaming operators — beyond-parity surface.

The reference has NO streaming execution (SURVEY.md §2.6: Kafka is read as a
static table, KafkaRecordSet.java:53). These operators give the engine the
streaming shapes a training-data pipeline needs: windowed aggregation with
watermarked late-data handling, and event sessionization. Batch/stream
parity is tested by running the same transformation both ways
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Raw file schema: ts is TIMESTAMP(MICROS) in parquet. (Earlier testdata
# generations wrote TIMESTAMP(NANOS), which Spark reads as bigint under
# legacy.parquet.nanosAsLong — with_event_time still converts that form;
# see catalog.load_table for the batch twin's identical gate.)
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def with_event_time(df: DataFrame) -> DataFrame:
    """Normalize the event-time column to a µs timestamp: no-op for
    timestamp input, ns-long → µs for legacy nanos files (identical
    truncation to DuckDB's reader)."""
    if dict(df.dtypes).get("ts") == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def read_events_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    (In production this is the kafka source — swap ``readStream.format``;
    every transformation downstream is source-agnostic.)"""
    return with_event_time(spark.readStream.schema(EVENTS_SCHEMA).parquet(directory))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + exact decimal sums per event_type.

    The watermark bounds state: at 100 TB/day the state store only retains
    ``watermark`` worth of windows per key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, timeout_s: int = 120,
                  output_mode: str = "complete"):
    """Drain an availableNow stream into an in-memory table; returns the
    resulting batch DataFrame. Aggregations use ``complete``; stream-stream
    joins / non-aggregating pipelines need ``append``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return stream_df.sparkSession.table(name)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: right-side events within
    ``within`` AFTER the left event for the same key (click→purchase
    attribution shape). Both sides carry watermarks and the join condition
    time-bounds the match window, so Spark can evict join state — without
    the bound, stream-stream join state grows forever. §2.6 surface beyond
    the reference (its Kafka connector is batch-only)."""
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
        F.col("event_id").alias("l_id"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
        F.col("event_id").alias("r_id"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks after ``gap_minutes`` idle.

    Expressed with window functions (lag + running sum) — the batch twin of
    ``session_window`` streaming aggregation; used as the oracle-checkable
    form (events_sessionize query)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    is_new = (
        gap.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(gap)) > gap_minutes * 60)
    ).cast("int")
    sess = F.sum(is_new).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "event_id", "user_id", "ts", "event_type", sess.alias("session_id")
    )


def streaming_dedup(events: DataFrame, keys: list[str] | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop duplicate events within the watermark
    horizon (state bounded by the watermark — the streaming twin of
    llm.dedup.exact_dedup). Default key: event_id."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
