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


def _raw_unsigned(value_col: str, start: int, nbytes: int) -> str:
    """Unsigned big-endian integer of ``nbytes`` at 0-based ``start`` as
    a DECIMAL(20,0) SQL expression (NULL when the payload is short —
    RawColumnDecoder's checkEnoughBytes turns such rows into nulls)."""
    return (
        f"CASE WHEN length({value_col}) >= {start + nbytes} THEN "
        f"CAST(conv(hex(substring({value_col}, {start + 1}, {nbytes})),"
        f" 16, 10) AS DECIMAL(20,0)) END"
    )


def _raw_signed(value_col: str, start: int, nbytes: int) -> str:
    """Signed (two's-complement) big-endian integer, Java ByteBuffer
    semantics (reference: RawColumnDecoder.getLong)."""
    u = _raw_unsigned(value_col, start, nbytes)
    half = 1 << (8 * nbytes - 1)
    full = 1 << (8 * nbytes)
    return (
        f"CAST(CASE WHEN ({u}) >= {half} THEN ({u}) - {full}"
        f" ELSE ({u}) END AS BIGINT)"
    )


def _raw_ieee(value_col: str, start: int, *, double: bool) -> str:
    """IEEE-754 decode of a big-endian FLOAT/DOUBLE field in pure SQL
    (no bits-to-double builtin exists): split the unsigned integer into
    sign/exponent/fraction and reassemble — every step is exact (the
    significand ≤ 2^53 and powers of two are exactly representable), so
    the decode is bit-faithful incl. denormals, ±Infinity and NaN."""
    if double:
        nbytes, ebits, fbits, bias = 8, 11, 52, 1075
    else:
        nbytes, ebits, fbits, bias = 4, 8, 23, 150
    u = _raw_unsigned(value_col, start, nbytes)
    emax = (1 << ebits) - 1
    sign_bit = 1 << (8 * nbytes - 1)
    fmask = 1 << fbits
    sign = f"(CASE WHEN ({u}) >= {sign_bit} THEN -1.0D ELSE 1.0D END)"
    mag = f"(({u}) % {sign_bit})"
    expo = f"CAST(({mag}) DIV {fmask} AS INT)"
    frac = f"CAST(({mag}) % {fmask} AS DOUBLE)"
    return (
        f"CASE WHEN ({u}) IS NULL THEN NULL"
        f" WHEN {expo} = {emax} THEN"
        f"  CASE WHEN {frac} = 0.0D THEN {sign} * CAST('Infinity' AS"
        f"   DOUBLE) ELSE CAST('NaN' AS DOUBLE) END"
        f" WHEN {expo} = 0 THEN {sign} * {frac} * power(2.0D, {1 - bias})"
        f" ELSE {sign} * (CAST({fmask} AS DOUBLE) + {frac})"
        f"  * power(2.0D, {expo} - {bias}) END"
    )


def decode_raw_fields(
    df: DataFrame,
    fields: list[tuple],
    value_col: str = "value",
) -> DataFrame:
    """Presto's byte-offset raw decoder (presto-record-decoder
    raw/RawColumnDecoder.java): each field is
    ``(name, presto_type, data_format, start[, end])`` with the Java
    ByteBuffer semantics — big-endian, signed integers, IEEE-754
    FLOAT/DOUBLE, varchar as the mapped byte range's UTF-8 text. Pure
    JVM expressions (conv/hex/substring + exact power-of-two
    arithmetic); decoding 100 TB of fixed-layout messages stays inside
    whole-stage codegen."""
    sizes = {"BYTE": 1, "SHORT": 2, "INT": 4, "LONG": 8,
             "FLOAT": 4, "DOUBLE": 8}
    cols = [F.col(c) for c in df.columns]
    for spec in fields:
        name, ptype, fmt, start = spec[0], spec[1].lower(), spec[2], spec[3]
        fmt = (fmt or "BYTE").upper()
        if ptype.startswith("varchar") or ptype == "string":
            end = spec[4] if len(spec) > 4 else None
            length = (
                f"{end - start}" if end is not None
                else f"length({value_col}) - {start}"
            )
            expr = (
                f"CAST(substring({value_col}, {start + 1}, {length})"
                f" AS STRING)"
            )
        elif ptype == "double":
            expr = _raw_ieee(value_col, start, double=(fmt == "DOUBLE"))
        elif ptype in ("real", "float"):
            expr = (
                f"CAST(({_raw_ieee(value_col, start, double=False)})"
                f" AS FLOAT)"
            )
        elif ptype == "boolean":
            expr = f"({_raw_signed(value_col, start, sizes[fmt])}) != 0"
        else:  # tinyint/smallint/integer/bigint
            expr = _raw_signed(value_col, start, sizes[fmt])
            if ptype in ("tinyint", "smallint", "integer", "int"):
                expr = f"CAST(({expr}) AS {ptype.upper()})"
        cols.append(F.expr(expr).alias(name))
    return df.select(*cols).drop(value_col)
