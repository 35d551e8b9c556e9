"""Message decoders for raw byte payloads (Kafka/Redis value columns).

Reference: presto-record-decoder/.../decoder/ provides csv/json/avro/raw
decoders applied to Kafka message bytes. Spark-native equivalents, applied
to a ``value: binary`` column (the shape ``sources.read_kafka`` yields):

- json  → ``from_json`` with declared schema
- csv   → ``from_csv``
- avro  → ``from_avro`` (needs spark-avro on the cluster; guarded)
- raw   → cast/slice of the raw bytes

All JVM expressions — decoding 100 TB of messages never leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_json(df: DataFrame, schema: str, value_col: str = "value") -> DataFrame:
    """Decode a binary/string JSON payload into typed columns."""
    parsed = F.from_json(F.col(value_col).cast("string"), schema)
    return df.withColumn("__rec", parsed).select("*", "__rec.*").drop("__rec", value_col)


def decode_csv(df: DataFrame, schema: str, value_col: str = "value",
               sep: str = ",") -> DataFrame:
    parsed = F.from_csv(
        F.col(value_col).cast("string"), F.lit(schema), {"sep": sep}
    )
    return df.withColumn("__rec", parsed).select("*", "__rec.*").drop("__rec", value_col)


def decode_avro(df: DataFrame, avro_schema_json: str, value_col: str = "value") -> DataFrame:
    """Avro decoder — requires the spark-avro package (not bundled in
    pyspark); raises a clear error when absent."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "avro decoding needs the spark-avro package on the cluster"
        ) from e
    parsed = from_avro(F.col(value_col), avro_schema_json)
    return df.withColumn("__rec", parsed).select("*", "__rec.*").drop("__rec", value_col)


def decode_raw(df: DataFrame, value_col: str = "value",
               as_type: str = "string") -> DataFrame:
    """Raw decoder: the payload as one typed column (string/binary slice)."""
    return df.withColumn("decoded", F.col(value_col).cast(as_type)).drop(value_col)
