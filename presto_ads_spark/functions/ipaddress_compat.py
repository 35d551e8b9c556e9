"""IPADDRESS type emulation (reference: presto-main/.../type/IpAddressType.java,
type/IpAddressOperators.java, spi StandardTypes.java:43).

Presto stores IPADDRESS as a 16-byte slice — the IPv6 byte form, with IPv4
addresses widened to the IPv4-mapped range ``::ffff:a.b.c.d``
(IpAddressOperators.castFromVarcharToIpAddress:126-151). This engine uses
the identical representation as a plain Spark BINARY column, which makes
every relational operator free and JVM-side:

- ``= <> < <= > >= BETWEEN`` — Spark compares BinaryType by unsigned byte
  order, exactly the semantics of IpAddressOperators.compareUnsigned:58-107.
- GROUP BY / JOIN / ORDER BY / IS DISTINCT FROM — native binary semantics.
- ``xxhash64(ip)`` — native (IpAddressOperators.xxHash64:116).

Only the *boundary* casts need Python (Spark has no inet parser), and they
run as Arrow-vectorized pandas UDFs — never per-row, and never in a hot
relational path (parse once at ingest/literal edges, compare JVM-side):

- ``presto_ip_parse(varchar)``      strict CAST   (invalid → error, like
  Presto INVALID_CAST_ARGUMENT)
- ``presto_ip_try_parse(varchar)``  TRY_CAST      (invalid → NULL)
- ``presto_ip_format(binary)``      CAST(ip AS VARCHAR) — Guava
  ``InetAddresses.toAddrString`` behavior: IPv4-mapped renders as the
  dotted quad (Java getByAddress auto-narrows to Inet4Address), other IPv6
  in RFC 5952 compressed lowercase form — Python's ``ipaddress`` module
  implements the same RFC 5952 rules.

``rewrite._rewrite_ipaddress`` folds *literal* operands at rewrite time
(``IPADDRESS '1.2.3.4'`` becomes a 16-byte ``X'…'`` literal wrapped in the
``presto_ipaddress`` identity marker — zero runtime cost, constant-folded
by Catalyst), so the UDFs only ever run over non-literal expressions.
"""

from __future__ import annotations

import ipaddress as _ip

import pandas as pd

_V4_PREFIX = b"\x00" * 10 + b"\xff\xff"


def ip_to_bytes16(value: str) -> bytes:
    """Parse an IPv4/IPv6 string to Presto's 16-byte form; raises
    ValueError with Presto's INVALID_CAST_ARGUMENT message on junk."""
    try:
        addr = _ip.ip_address(value)
    except ValueError:
        raise ValueError(f"Cannot cast value to IPADDRESS: {value}") from None
    if addr.version == 4:
        return _V4_PREFIX + addr.packed
    return addr.packed


def bytes_to_ip_str(raw: bytes) -> str:
    """Render the 16-byte form the way Presto's varchar cast does
    (IpAddressOperators.castFromIpAddressToVarchar:155-163)."""
    raw = bytes(raw)
    if len(raw) == 4:  # defensive: pre-widened v4 (cannot arise from our casts)
        return str(_ip.IPv4Address(raw))
    if len(raw) != 16:
        raise ValueError(f"Invalid IP address binary length: {len(raw)}")
    addr = _ip.IPv6Address(raw)
    mapped = addr.ipv4_mapped
    return str(mapped) if mapped is not None else str(addr)


def register_ipaddress_udfs(spark) -> None:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def presto_ip_parse(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else ip_to_bytes16(v))

    @pandas_udf("binary")
    def presto_ip_try_parse(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return ip_to_bytes16(v)
            except ValueError:
                return None

        return s.map(one)

    @pandas_udf("string")
    def presto_ip_format(b: pd.Series) -> pd.Series:
        return b.map(lambda v: None if v is None else bytes_to_ip_str(v))

    spark.udf.register("presto_ip_parse", presto_ip_parse)
    spark.udf.register("presto_ip_try_parse", presto_ip_try_parse)
    spark.udf.register("presto_ip_format", presto_ip_format)


# JVM-side pieces: the identity marker the rewrite uses to tag ip-typed
# expressions (inlined away by Catalyst), and the varbinary→ip widening
# (IpAddressOperators.castFromVarbinaryToIpAddress:167-183 — 4-byte input
# maps into ::ffff:…, 16-byte passes through, anything else errors).
IPADDRESS_SQL_FUNCTIONS: list[str] = [
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_ipaddress(b BINARY)
       RETURNS BINARY RETURN b""",
    """CREATE OR REPLACE TEMPORARY FUNCTION ip_from_varbinary(b BINARY)
       RETURNS BINARY RETURN
         CASE
           WHEN b IS NULL THEN NULL
           WHEN length(b) = 4 THEN concat(X'00000000000000000000FFFF', b)
           WHEN length(b) = 16 THEN b
           ELSE raise_error(concat('Invalid IP address binary length: ',
                                   CAST(length(b) AS STRING)))
         END""",
]
