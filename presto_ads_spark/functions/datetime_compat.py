"""Datetime pattern translation: Presto (MySQL-style) → Spark (java.time).

Presto's ``date_format``/``date_parse`` use MySQL ``%``-patterns
(reference: presto-main/.../scalar/DateTimeFunctions.java —
``@ScalarFunction("date_format")`` delegating to a MySQL-compatible
formatter); ``format_datetime``/``parse_datetime`` use Joda patterns, which
are close enough to java.time for the common subset. This module translates
the MySQL patterns and exposes Column-level helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MySQL %-token → java.time pattern (common subset; unknown tokens raise).
_MYSQL_TO_JAVA: dict[str, str] = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%h": "hh",
    "%I": "hh",
    "%l": "h",
    "%i": "mm",
    "%s": "ss",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%M": "MMMM",
    "%b": "MMM",
    "%a": "EEE",
    "%W": "EEEE",
    "%j": "DDD",
    "%T": "HH:mm:ss",
    "%r": "hh:mm:ss a",
    "%%": "%",
}

# Presto raises INVALID_FUNCTION_ARGUMENT for these (DateTimeFunctions
# .java:1265-1271); leaving the call untranslated makes Spark raise its
# own pattern error — both engines error, close enough.
_MYSQL_ERROR_TOKENS = frozenset({"%w", "%U", "%u", "%V", "%X", "%D"})
# ISO week number / week-year: Spark 3+ bans the java.time week-based
# letters (w/W/Y), so these can't be expressed as a pattern — the
# rewrite layer splices weekofyear()/extract(YEAROFWEEK) expressions
# instead (_rewrite_datetime_patterns %v/%x surgery).
_MYSQL_WEEK_TOKENS = frozenset({"%v", "%x"})


def translate_mysql_pattern(pattern: str) -> str:
    """Translate; raises ValueError on unsupported tokens AND on adjacent
    field tokens whose pattern letters would merge (e.g. ``%j%j`` →
    ``DDDDDD``): java.time cannot express two adjacent identical fields,
    so silent corruption is replaced by an explicit error. (Real-world
    patterns always delimit fields.)  An unknown ``%<x>`` token is the
    literal character x (DateTimeFunctions.java:1276 default case)."""
    out: list[str] = []
    i = 0
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            chunk = "".join(literal)
            # java.time treats letters as pattern chars → quote literals.
            if any(c.isalpha() for c in chunk):
                chunk = "'" + chunk.replace("'", "''") + "'"
            out.append(chunk)
            literal.clear()

    while i < len(pattern):
        if pattern[i] == "%" and i + 1 < len(pattern):
            tok = pattern[i : i + 2]
            if tok in _MYSQL_ERROR_TOKENS or tok in _MYSQL_WEEK_TOKENS:
                raise ValueError(f"unsupported MySQL datetime token: {tok}")
            if tok not in _MYSQL_TO_JAVA:
                # %<x> → the literal character x (Presto default case)
                literal.append(tok[1])
                i += 2
                continue
            flush_literal()
            java = _MYSQL_TO_JAVA[tok]
            if out and not literal and out[-1] and out[-1][-1] == java[0]:
                raise ValueError(
                    f"adjacent datetime fields merge ambiguously in "
                    f"java.time: …{tok} in {pattern!r}"
                )
            out.append(java)
            i += 2
        else:
            literal.append(pattern[i])
            i += 1
    flush_literal()
    return "".join(out)


def date_format(col: Column | str, mysql_pattern: str) -> Column:
    """Presto date_format(ts, '%Y-%m-%d') on Spark."""
    return F.date_format(col, translate_mysql_pattern(mysql_pattern))


def date_parse(col: Column | str, mysql_pattern: str) -> Column:
    """Presto date_parse(s, '%Y-%m-%d') on Spark."""
    return F.to_timestamp(col, translate_mysql_pattern(mysql_pattern))


def format_datetime(col: Column | str, joda_pattern: str) -> Column:
    """Presto format_datetime (Joda); the common subset matches java.time."""
    return F.date_format(col, joda_pattern)


def parse_datetime(col: Column | str, joda_pattern: str) -> Column:
    return F.to_timestamp(col, joda_pattern)


# --- session-locale datetime names (round 12) ------------------------------
# Presto formats/parses month, weekday and halfday NAMES with the SESSION
# locale (FunctionAssertions setLocale; DateTimeFunctions passes
# session.getLocale() into the Joda/MySQL formatters). Spark's formatters
# are locale-fixed, so non-English sessions lower the name-producing
# tokens to JVM lookups over these CLDR name tables (public CLDR data);
# rewrite.py _rewrite_locale_datetime does the pattern surgery.
LOCALE_DATETIME_NAMES: dict[str, dict] = {
    "ko": {
        # Monday-first (Spark weekday() is 0=Monday)
        "wd_short": ["월", "화", "수", "목", "금", "토", "일"],
        "wd_full": ["월요일", "화요일", "수요일", "목요일", "금요일",
                    "토요일", "일요일"],
        # CLDR Korean month names are numeral+월 for both widths
        "mon_short": [f"{i}월" for i in range(1, 13)],
        "mon_full": [f"{i}월" for i in range(1, 13)],
        "am": "오전",
        "pm": "오후",
    },
}
