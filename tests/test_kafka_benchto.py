"""The reference's OWN kafka benchmark SQL, verbatim, over the message
decoders — no broker required.

The reference's kafka benchto workload (presto-benchto-benchmarks/
src/main/resources/sql/presto/kafka/*.sql + benchmarks/presto/kafka.yaml)
runs count(*) / count(column) queries over Kafka topics carrying
csv/json/raw-encoded messages at three widths (benchmark_1/_10/_100:
c_bigint_N, c_double_N, c_varchar_N columns). This environment has no
broker, so the tier reproduces the exact shape one step downstream of
the transport: synthetic message BYTES in a ``value: binary`` column —
the same frame ``sources.read_kafka`` yields — run through the
``sources.decoders`` csv/json decoders (reference:
presto-record-decoder), and every reference SQL file executes UNMODIFIED
(only the ``${database}.${schema}.${table}`` benchto placeholder
collapses to a view name) through ``Engine.sql``, with counts checked
against the generator's ground truth.

Raw leg: messages pack big-endian (LONG, DOUBLE, 12-byte varchar)
fields per column and decode through ``decoders.decode_raw_fields`` —
the byte-offset raw decoder mirroring presto-record-decoder's
RawColumnDecoder (big-endian signed integers, pure-SQL IEEE-754 double
reassembly, mapped-range UTF-8 varchar) — so all four reference queries
run on raw too.
"""

from __future__ import annotations

import json
import os
import struct

import pytest

_KAFKA_DIR = (
    "/root/reference/presto-benchto-benchmarks/src/main/resources/"
    "sql/presto/kafka/"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_KAFKA_DIR), reason="reference benchto dir absent"
)

N_ROWS = 500
# benchto kafka.yaml: schema_small/medium/large_message ↔ column width
_WIDTHS = {"benchmark_1": 1, "benchmark_10": 10, "benchmark_100": 100}


def _columns(width: int) -> list[tuple[str, str]]:
    cols = []
    for i in range(1, width + 1):
        cols += [
            (f"c_bigint_{i}", "bigint"),
            (f"c_double_{i}", "double"),
            (f"c_varchar_{i}", "varchar"),
        ]
    return cols


def _row(ri: int, width: int) -> dict:
    vals = {}
    for name, typ in _columns(width):
        i = int(name.rsplit("_", 1)[1])
        if typ == "bigint":
            vals[name] = ri * 1000 + i
        elif typ == "double":
            vals[name] = ri + i / 100.0
        else:
            vals[name] = f"v{ri}_{i}"
    return vals


def _load_sql(fname: str, view: str) -> str:
    text = open(os.path.join(_KAFKA_DIR, fname)).read()
    return text.replace("${database}.${schema}.${table}", view)


@pytest.fixture(scope="module")
def kafka_views(spark):
    """Binary message frames (value: binary — read_kafka's shape) per
    (schema, encoding), decoded through sources.decoders into views."""
    from presto_ads_spark.sources import decoders

    sub = spark.newSession()
    views = {}
    for schema, width in _WIDTHS.items():
        cols = _columns(width)
        rows = [_row(ri, width) for ri in range(N_ROWS)]
        csv_payloads = [
            (",".join(str(r[n]) for n, _ in cols).encode(),) for r in rows
        ]
        json_payloads = [(json.dumps(r).encode(),) for r in rows]
        ddl = ", ".join(
            f"{n} {'string' if t == 'varchar' else t}" for n, t in cols
        )
        for enc, payloads in (("csv", csv_payloads), ("json", json_payloads)):
            frame = sub.createDataFrame(payloads, "value: binary")
            if enc == "csv":
                decoded = decoders.decode_csv(frame, ddl)
            else:
                decoded = decoders.decode_json(frame, ddl)
            name = f"kafka_{schema}_{enc}"
            decoded.createOrReplaceTempView(name)
            views[(schema, enc)] = name
        # raw: fixed byte layout — (LONG, DOUBLE, 12-byte varchar) per
        # column index, decoded by byte-offset mapping like the
        # reference's RawRowDecoder benchmark schemas
        raw_payloads = []
        for r in rows:
            buf = b""
            for i in range(1, width + 1):
                buf += struct.pack(">q", r[f"c_bigint_{i}"])
                buf += struct.pack(">d", r[f"c_double_{i}"])
                buf += r[f"c_varchar_{i}"].encode()[:12].ljust(12)
            raw_payloads.append((buf,))
        specs = []
        off = 0
        for i in range(1, width + 1):
            specs.append((f"c_bigint_{i}", "bigint", "LONG", off))
            specs.append((f"c_double_{i}", "double", "DOUBLE", off + 8))
            specs.append(
                (f"c_varchar_{i}", "varchar", None, off + 16, off + 28)
            )
            off += 28
        frame = sub.createDataFrame(raw_payloads, "value: binary")
        name = f"kafka_{schema}_raw"
        decoders.decode_raw_fields(frame, specs).createOrReplaceTempView(
            name
        )
        views[(schema, "raw")] = name
    return sub, views


# kafka.yaml variables: count over every schema × table; count_column_N
# over the matching-width schema, all three encodings
_CASES = [
    ("count.sql", schema, enc)
    for schema in _WIDTHS
    for enc in ("csv", "json", "raw")
] + [
    (f"count_column_{w}.sql", schema, enc)
    for schema, w in _WIDTHS.items()
    for enc in ("csv", "json", "raw")
]


@pytest.mark.parametrize(
    "fname,schema,enc",
    _CASES,
    ids=[f"{f[:-4]}-{s}-{e}" for f, s, e in _CASES],
)
def test_kafka_benchto_verbatim(kafka_views, fname, schema, enc):
    from presto_ads_spark.engine import Engine

    sub, views = kafka_views
    sql = _load_sql(fname, views[(schema, enc)])
    row = Engine(sub, sf_dir=None).sql(sql).collect()[0]
    # generator ground truth: no NULLs → every count equals N_ROWS
    assert all(v == N_ROWS for v in row), (fname, schema, enc, tuple(row))


def test_raw_field_decoder_bit_faithful(spark):
    """decode_raw_fields must reproduce Java ByteBuffer semantics
    bit-for-bit: min/max signed integers, -0.0, ±Infinity, NaN, the
    smallest denormal and smallest normal double, UTF-8 text
    (reference: RawColumnDecoder.getLong/getDouble/getSlice)."""
    import math

    from presto_ads_spark.sources import decoders

    vals = [
        (123456789012345, -42, 3.141592653589793, -0.0, float("inf")),
        (-(2 ** 63), 127, float("nan"), 5e-324,
         2.2250738585072014e-308),
    ]
    rows = [
        (struct.pack(">q", a) + struct.pack(">b", b)
         + b"".join(struct.pack(">d", x) for x in (c, d, e)),)
        for a, b, c, d, e in vals
    ]
    out = decoders.decode_raw_fields(
        spark.createDataFrame(rows, "value: binary"),
        [("a", "bigint", "LONG", 0), ("b", "bigint", "BYTE", 8),
         ("c", "double", "DOUBLE", 9), ("d", "double", "DOUBLE", 17),
         ("e", "double", "DOUBLE", 25)],
    ).collect()
    for row, want in zip(out, vals):
        for g, w in zip(tuple(row), want):
            if isinstance(w, float) and math.isnan(w):
                assert math.isnan(g)
            elif isinstance(w, float):
                assert g == w and math.copysign(1, g) == math.copysign(1, w)
            else:
                assert g == w
