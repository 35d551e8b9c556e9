"""Oracle-compare harness mirroring the driver's t2 check (and the
reference's H2QueryRunner pattern — presto-tests/.../QueryAssertions.java:94:
run both engines, compare result multisets order-insensitively).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
from dataclasses import dataclass

import duckdb

from .catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'"
            )
    return con


def _canon(v):
    """Canonicalize a value for order-insensitive multiset compare."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", v + 0.0)  # -0.0 → 0.0
    if isinstance(v, _decimal.Decimal):
        return ("num", float(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("ts", _dt.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    return ("str", str(v))


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_frames(name: str, spark_df, con, oracle: str) -> CompareResult:
    """Column-name-sorted, row-order-insensitive exact compare."""
    spark_cols = sorted(spark_df.columns)
    srows = [
        tuple(_canon(row[c]) for c in spark_cols)
        for row in spark_df.collect()
    ]
    ores = con.execute(oracle)
    ocols_raw = [d[0] for d in ores.description]
    orows_raw = ores.fetchall()
    ocols_order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in ocols_order]
    orows = [tuple(_canon(r[i]) for i in ocols_order) for r in orows_raw]

    if [c.lower() for c in spark_cols] != [c.lower() for c in ocols]:
        return CompareResult(
            name, False, len(srows), len(orows),
            f"column mismatch: spark={spark_cols} oracle={ocols}",
        )
    if len(srows) != len(orows):
        return CompareResult(
            name, False, len(srows), len(orows),
            f"row count: spark={len(srows)} oracle={len(orows)}",
        )
    s_sorted, o_sorted = sorted(srows), sorted(orows)
    if s_sorted != o_sorted:
        diff_at = next(
            (i for i, (a, b) in enumerate(zip(s_sorted, o_sorted)) if a != b),
            -1,
        )
        return CompareResult(
            name, False, len(srows), len(orows),
            f"value mismatch at sorted row {diff_at}: "
            f"spark={s_sorted[diff_at]!r} oracle={o_sorted[diff_at]!r}",
        )
    return CompareResult(name, True, len(srows), len(orows))
