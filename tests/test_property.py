"""Property-based tests (hypothesis) — mirrors the reference's strategy of
property-testing the error-prone translation layers (SURVEY.md §7 watch-list
#2: datetime pattern translation is 'pure lookup-table work but error-prone').
"""

from __future__ import annotations

import datetime
import random

from hypothesis import given, settings, strategies as st

from presto_ads_spark.functions.datetime_compat import translate_mysql_pattern
from presto_ads_spark.rewrite import rewrite

# MySQL token → expected rendering, computed in pure Python.
_EXPECTED = {
    "%Y": lambda d: f"{d.year:04d}",
    "%m": lambda d: f"{d.month:02d}",
    "%d": lambda d: f"{d.day:02d}",
    "%H": lambda d: f"{d.hour:02d}",
    "%i": lambda d: f"{d.minute:02d}",
    "%s": lambda d: f"{d.second:02d}",
    "%j": lambda d: f"{d.timetuple().tm_yday:03d}",
    "%T": lambda d: d.strftime("%H:%M:%S"),
}
_LITERALS = ["-", ":", "/", " "]


def _mergeable(toks):
    """Adjacent field tokens whose java letters would merge (explicit
    ValueError in the translator)."""
    prev_last = None
    for t in toks:
        if t in _EXPECTED:
            first = {"%Y": "y", "%m": "M", "%d": "d", "%H": "H", "%i": "m",
                     "%s": "s", "%j": "D", "%T": "H"}[t]
            if prev_last == first:
                return True
            prev_last = {"%Y": "y", "%m": "M", "%d": "d", "%H": "H",
                         "%i": "m", "%s": "s", "%j": "D", "%T": "s"}[t]
        else:
            prev_last = None
    return False


@settings(max_examples=60, deadline=None)
@given(
    toks=st.lists(
        st.sampled_from(sorted(_EXPECTED) + _LITERALS), min_size=1, max_size=8
    )
)
def test_translation_total_for_supported_tokens(toks):
    """Translation is deterministic; merging-adjacent fields raise an
    explicit ValueError (found by this property test — %j%j would silently
    produce an invalid java.time pattern)."""
    import pytest as _pytest

    pattern = "".join(toks)
    if _mergeable(toks):
        with _pytest.raises(ValueError, match="adjacent"):
            translate_mysql_pattern(pattern)
    else:
        assert translate_mysql_pattern(pattern) == translate_mysql_pattern(pattern)


@settings(max_examples=120, deadline=None)
@given(
    sql=st.text(
        alphabet="abcdef_(),'%YmdHis SELECTFROMCASTASVARCHARstrpos0123456789"
        "[]<>=/ALNYOMETI",  # subscript/quantified/division/TIME passes
        max_size=80,
    )
)
def test_rewrite_is_idempotent_and_total(sql):
    """rewrite() never raises and is idempotent on arbitrary-ish text —
    including unbalanced brackets, quantifier keywords, and stray slashes
    feeding the subscript/quantified/int-division passes."""
    once = rewrite(sql)
    assert rewrite(once) == once


def test_mysql_patterns_match_python_rendering(spark):
    """Seeded random pattern×timestamp matrix: Spark's rendering of the
    translated pattern equals the pure-Python expected string (one batched
    Spark query for all cases)."""
    rng = random.Random(42)
    tokens = sorted(_EXPECTED) + _LITERALS
    cases = []
    while len(cases) < 80:
        toks = [rng.choice(tokens) for _ in range(rng.randint(1, 8))]
        if _mergeable(toks):
            continue
        ts = datetime.datetime(
            rng.randint(1971, 2099), rng.randint(1, 12), rng.randint(1, 28),
            rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59),
        )
        pattern = "".join(toks)
        expected = "".join(
            _EXPECTED[t](ts) if t in _EXPECTED else t for t in toks
        )
        cases.append((pattern, ts, expected))

    exprs = []
    for i, (pattern, ts, _expected) in enumerate(cases):
        java = translate_mysql_pattern(pattern).replace("'", "''")
        exprs.append(
            f"date_format(TIMESTAMP '{ts:%Y-%m-%d %H:%M:%S}', '{java}') AS c{i}"
        )
    row = spark.sql("SELECT " + ", ".join(exprs)).collect()[0]
    for i, (pattern, ts, expected) in enumerate(cases):
        assert row[f"c{i}"] == expected, (
            f"pattern {pattern!r} at {ts}: spark={row[f'c{i}']!r} "
            f"expected={expected!r}"
        )
