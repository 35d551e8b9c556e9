"""Datetime pattern translation: Presto (MySQL-style) → Spark (java.time).

Presto's ``date_format``/``date_parse`` use MySQL ``%``-patterns
(reference: presto-main/.../scalar/DateTimeFunctions.java —
``@ScalarFunction("date_format")`` delegating to a MySQL-compatible
formatter); ``format_datetime``/``parse_datetime`` use Joda patterns, which
are close enough to java.time for the common subset. This module translates
the MySQL patterns and exposes Column-level helpers.
"""

from __future__ import annotations

import datetime
import re

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
_EN_MON_SHORT = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                 "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_EN_MON_FULL = ["January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December"]
_EN_WD_SHORT = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_EN_WD_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
               "Saturday", "Sunday"]


def parse_mysql_datetime(text: str, pattern: str):
    """Rewrite-time literal fold for ``date_parse`` corners java.time
    cannot express (DateTimeFunctions.java:1180-1290 — the reference
    builds a Joda formatter from the MySQL pattern): conflicting
    %Y + %y (Joda's LAST saved field wins), ISO-week %x%v
    (weekyear/weekOfWeekyear), variable-width %s.%f fractions
    (appendFractionOfSecond(6, 9) truncated to millis), and two-digit
    %y with the 1970 pivot (appendTwoDigitYear). Returns a naive
    ``datetime.datetime`` or None when the (text, pattern) pair is
    outside the modeled subset — the caller then leaves the call on the
    established java.time path."""
    f: dict[str, int] = {}
    pos = 0
    i = 0

    def take_num(key: str, maxlen: int) -> bool:
        nonlocal pos
        m = re.match(r"\d{1,%d}" % maxlen, text[pos:])
        if not m:
            return False
        f[key] = int(m.group())
        pos += m.end()
        return True

    def take_text(key: str, names: list[str], base: int = 1) -> bool:
        # Joda text parse is case-insensitive, longest match first
        nonlocal pos
        low = text[pos:].lower()
        best = None
        for idx, n in enumerate(names):
            if low.startswith(n.lower()) and (
                best is None or len(n) > len(names[best])
            ):
                best = idx
        if best is None:
            return False
        f[key] = best + base
        pos += len(names[best])
        return True

    toks: list[str] = []
    while i < len(pattern):
        if pattern[i] == "%" and i + 1 < len(pattern):
            t = pattern[i + 1]
            if t == "r":
                toks += ["%h", ":", "%i", ":", "%s", " ", "%p"]
            elif t == "T":
                toks += ["%H", ":", "%i", ":", "%s"]
            elif t == "%":
                toks.append("%")
            else:
                toks.append("%" + t)
            i += 2
        else:
            toks.append(pattern[i])
            i += 1

    for tok in toks:
        if len(tok) == 1:
            if pos < len(text) and text[pos] == tok:
                pos += 1
                continue
            return None
        t = tok[1]
        ok = True
        if t == "Y":
            ok = take_num("year", 4)
        elif t == "y":
            m = re.match(r"\d{1,2}", text[pos:])
            if not m:
                return None
            v = int(m.group())
            pos += m.end()
            # appendTwoDigitYear(PIVOT_YEAR=2020): 70-99 → 19xx
            f["year"] = 1900 + v if v >= 70 else 2000 + v
        elif t in ("m", "c"):
            ok = take_num("month", 2)
        elif t in ("d", "e"):
            ok = take_num("day", 2)
        elif t == "j":
            ok = take_num("doy", 3)
        elif t in ("H", "k"):
            ok = take_num("hour", 2)
        elif t in ("h", "I", "l"):
            ok = take_num("clockhour", 2)
        elif t == "i":
            ok = take_num("minute", 2)
        elif t in ("s", "S"):
            ok = take_num("second", 2)
        elif t == "f":
            m = re.match(r"\d{1,9}", text[pos:])
            if not m:
                return None
            # fraction-of-second, truncated to millis
            f["millis"] = int(
                int(m.group().ljust(9, "0")[:9]) / 1_000_000
            )
            pos += m.end()
        elif t == "p":
            m = re.match(r"(?i)(AM|PM)", text[pos:])
            if not m:
                return None
            f["pm"] = int(m.group().upper() == "PM")
            pos += m.end()
        elif t == "b":
            ok = take_text("month", _EN_MON_SHORT)
        elif t == "M":
            ok = take_text("month", _EN_MON_FULL)
        elif t == "a":
            ok = take_text("dow", _EN_WD_SHORT)
        elif t == "W":
            ok = take_text("dow", _EN_WD_FULL)
        elif t == "v":
            ok = take_num("week", 2)
        elif t == "x":
            ok = take_num("weekyear", 4)
        else:
            return None  # %w/%U/%u/%V/%X/%D error in Presto; unknown
        if not ok:
            return None
    if pos != len(text):
        return None

    try:
        if "weekyear" in f or "week" in f:
            if {"year", "month", "day", "doy"} & f.keys():
                return None  # mixed calendars — out of modeled subset
            base = datetime.date.fromisocalendar(
                f.get("weekyear", 1970), f.get("week", 1), f.get("dow", 1)
            )
        elif "doy" in f:
            if {"month", "day"} & f.keys():
                return None
            base = datetime.date(f.get("year", 1970), 1, 1) + \
                datetime.timedelta(days=f["doy"] - 1)
        else:
            base = datetime.date(
                f.get("year", 1970), f.get("month", 1), f.get("day", 1)
            )
        if "clockhour" in f:
            hour = f["clockhour"] % 12 + (12 if f.get("pm") else 0)
        else:
            hour = f.get("hour", 0)
        return datetime.datetime(
            base.year, base.month, base.day, hour, f.get("minute", 0),
            f.get("second", 0), f.get("millis", 0) * 1000,
        )
    except ValueError:
        return None


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
