"""IPADDRESS type emulation parity.

Every case below is ported from the reference's operator suite
(presto-main/src/test/java/com/facebook/presto/type/
TestIpAddressOperators.java) — casts varchar/varbinary <-> IPADDRESS,
equality, ordering, BETWEEN, IS DISTINCT FROM. The engine stores the
type as Presto's own 16-byte IPv6-mapped binary form (see
functions/ipaddress_compat.py), so the relational operators are native
Spark binary comparisons; these tests pin both the boundary casts and
that the binary ordering agrees with IpAddressOperators.compareUnsigned.
"""

from __future__ import annotations

import pytest


def _one(engine, expr):
    return engine.sql(f"SELECT {expr} AS v").collect()[0][0]


# TestIpAddressOperators.testVarcharToIpAddressCast:33-41 (rendered back
# through the varchar cast, same as the reference's IPADDRESS SqlVarchar
# rendering) and testIpAddressToVarcharCast:52-61.
ROUNDTRIP = [
    ("'::ffff:1.2.3.4'", "1.2.3.4"),
    ("'1.2.3.4'", "1.2.3.4"),
    ("'192.168.0.0'", "192.168.0.0"),
    ("'2001:0db8:0000:0000:0000:ff00:0042:8329'", "2001:db8::ff00:42:8329"),
    ("'2001:db8::ff00:42:8329'", "2001:db8::ff00:42:8329"),
    ("'2001:db8:0:0:1:0:0:1'", "2001:db8::1:0:0:1"),
    ("'2001:db8:0:0:1::1'", "2001:db8::1:0:0:1"),
    ("'2001:db8::1:0:0:1'", "2001:db8::1:0:0:1"),
    ("'2001:DB8::FF00:ABCD:12EF'", "2001:db8::ff00:abcd:12ef"),
    ("'64:ff9b::10.0.0.0'", "64:ff9b::a00:0"),
]


@pytest.mark.parametrize("lit,expected", ROUNDTRIP)
def test_varchar_roundtrip(engine, lit, expected):
    assert _one(engine, f"CAST(CAST({lit} AS IPADDRESS) AS VARCHAR)") == expected
    # typed-literal spelling resolves identically (testIpAddressToVarcharCast)
    assert _one(engine, f"CAST(IPADDRESS {lit} AS VARCHAR)") == expected


# testVarcharToIpAddressCast:44-48 invalid casts
@pytest.mark.parametrize(
    "bad", ["'facebook.com'", "'localhost'", "'2001:db8::1::1'",
            "'2001:zxy::1::1'", "'789.1.1.1'"]
)
def test_invalid_cast_errors_and_try_cast_nulls(engine, bad):
    with pytest.raises(ValueError, match="Cannot cast value to IPADDRESS"):
        engine.sql(f"SELECT CAST({bad} AS IPADDRESS) AS v")
    assert _one(engine, f"TRY_CAST({bad} AS IPADDRESS)") is None


# testVarbinaryToIpAddressCast:66-70 + testIpAddressToVarbinaryCast:76-79
def test_varbinary_casts(engine):
    assert (
        _one(engine, "CAST(CAST(x'00000000000000000000ffff01020304' AS IPADDRESS) AS VARCHAR)")
        == "1.2.3.4"
    )
    assert _one(engine, "CAST(CAST(x'01020304' AS IPADDRESS) AS VARCHAR)") == "1.2.3.4"
    assert _one(engine, "CAST(CAST(x'c0a80000' AS IPADDRESS) AS VARCHAR)") == "192.168.0.0"
    assert (
        _one(engine, "CAST(CAST(x'20010db8000000000000ff0000428329' AS IPADDRESS) AS VARCHAR)")
        == "2001:db8::ff00:42:8329"
    )
    assert (
        bytes(_one(engine, "CAST(IPADDRESS '::ffff:1.2.3.4' AS VARBINARY)")).hex()
        == "00000000000000000000ffff01020304"
    )
    assert (
        bytes(_one(engine, "CAST(IPADDRESS '2001:db8::ff00:42:8329' AS VARBINARY)")).hex()
        == "20010db8000000000000ff0000428329"
    )


def test_invalid_binary_length(engine):
    with pytest.raises(Exception, match="Invalid IP address binary length: 5"):
        engine.sql("SELECT CAST(x'f000001100' AS IPADDRESS) AS v").collect()
    # non-literal path errors at runtime through ip_from_varbinary
    with pytest.raises(Exception, match="Invalid IP address binary length: 5"):
        engine.sql(
            "SELECT CAST(CAST(x'f000001100' AS VARBINARY) AS IPADDRESS) AS v"
        ).collect()


# testEquals:84-91, testNotEquals:106-113, testOrderOperators:116-135,
# testDistinctFrom:95-102 — one boolean expression per reference assert.
BOOL_CASES = [
    ("IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' = IPADDRESS '2001:db8::ff00:42:8329'", True),
    ("CAST('1.2.3.4' AS IPADDRESS) = CAST('::ffff:1.2.3.4' AS IPADDRESS)", True),
    ("IPADDRESS '192.168.0.0' = IPADDRESS '::ffff:192.168.0.0'", True),
    ("IPADDRESS '10.0.0.0' = IPADDRESS '::ffff:a00:0'", True),
    ("IPADDRESS '2001:db8::ff00:42:8329' = IPADDRESS '2001:db8::ff00:42:8300'", False),
    ("CAST('1.2.3.4' AS IPADDRESS) = IPADDRESS '1.2.3.5'", False),
    ("IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' != IPADDRESS '1.2.3.4'", True),
    ("CAST('1.2.3.4' AS IPADDRESS) <> CAST('1.2.3.5' AS IPADDRESS)", True),
    ("CAST('1.2.3.4' AS IPADDRESS) != IPADDRESS '1.2.3.4'", False),
    ("IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' <> IPADDRESS '2001:db8::ff00:42:8329'", False),
    ("CAST('1.2.3.4' AS IPADDRESS) <> CAST('::ffff:1.2.3.4' AS IPADDRESS)", False),
    ("IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' > IPADDRESS '1.2.3.4'", True),
    ("IPADDRESS '1.2.3.4' > IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329'", False),
    ("CAST('1.2.3.4' AS IPADDRESS) < CAST('1.2.3.5' AS IPADDRESS)", True),
    ("CAST('1.2.3.5' AS IPADDRESS) < CAST('1.2.3.4' AS IPADDRESS)", False),
    ("IPADDRESS '::1' <= CAST('1.2.3.5' AS IPADDRESS)", True),
    ("IPADDRESS '1.2.3.5' <= CAST('1.2.3.5' AS IPADDRESS)", True),
    ("IPADDRESS '1.2.3.6' <= CAST('1.2.3.5' AS IPADDRESS)", False),
    ("IPADDRESS '::1' >= IPADDRESS '::'", True),
    ("IPADDRESS '::1' >= IPADDRESS '::1'", True),
    ("IPADDRESS '::' >= IPADDRESS '::1'", False),
    ("IPADDRESS '::1' BETWEEN IPADDRESS '::' AND IPADDRESS '::1234'", True),
    ("IPADDRESS '::2222' BETWEEN IPADDRESS '::' AND IPADDRESS '::1234'", False),
    ("IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' IS DISTINCT FROM IPADDRESS '2001:db8::ff00:42:8329'", False),
    ("CAST(NULL AS IPADDRESS) IS DISTINCT FROM CAST(NULL AS IPADDRESS)", False),
    ("IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' IS DISTINCT FROM IPADDRESS '2001:db8::ff00:42:8328'", True),
    ("IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' IS DISTINCT FROM CAST(NULL AS IPADDRESS)", True),
    ("CAST(NULL AS IPADDRESS) IS DISTINCT FROM IPADDRESS '2001:db8::ff00:42:8328'", True),
]


@pytest.mark.parametrize("expr,expected", BOOL_CASES)
def test_operators(engine, expr, expected):
    assert _one(engine, expr) is expected


def test_relational_usage(engine):
    """The representation claim: GROUP BY / ORDER BY / JOIN on ip values
    are native binary ops — distinct collapses mapped-v4 spellings and
    ordering follows unsigned byte order ('::1' < v4-mapped range).
    An ip value routed through an alias loses the textual type marker
    (same documented limitation as char(n)), so the outer rendering uses
    ``presto_ip_format`` explicitly."""
    rows = engine.sql(
        """
        SELECT presto_ip_format(ip) AS s, n FROM (
          SELECT ip, count(*) AS n FROM (
            SELECT CAST(x AS IPADDRESS) AS ip
            FROM (VALUES '1.2.3.4', '::ffff:1.2.3.4', '::1', '10.0.0.1') t(x)
          ) GROUP BY ip
        ) ORDER BY ip
        """
    ).collect()
    assert [(r.s, r.n) for r in rows] == [
        ("::1", 1),
        ("1.2.3.4", 2),
        ("10.0.0.1", 1),
    ]


def test_null_handling(engine):
    assert _one(engine, "CAST(NULL AS IPADDRESS)") is None
    assert _one(engine, "CAST(CAST(NULL AS IPADDRESS) AS VARCHAR)") is None
    assert _one(engine, "CAST(try_cast(NULL AS VARCHAR) AS IPADDRESS)") is None


def test_alias_boundary_type_tracking(engine):
    # an ip value routed through a subquery/CTE alias keeps its type
    # for render, unwrap, re-cast, and compare (r7 README "routed
    # through a subquery alias" gap — now one level deep)
    rows = engine.sql(
        "SELECT CAST(c AS VARCHAR) AS s, CAST(c AS IPADDRESS) = "
        "IPADDRESS '1.2.3.4' AS eq FROM "
        "(SELECT CAST('::ffff:1.2.3.4' AS IPADDRESS) AS c) q"
    ).collect()
    assert rows[0].s == "1.2.3.4" and rows[0].eq is True
    vb = engine.sql(
        "SELECT CAST(c AS VARBINARY) AS vb FROM "
        "(SELECT IPADDRESS '::1' AS c) q"
    ).collect()[0].vb
    assert bytes(vb) == b"\x00" * 15 + b"\x01"
