"""TIMESTAMP/TIME WITH TIME ZONE compat: rewrite-time literal parsing.

Presto packs (millis, zoneKey) per VALUE (DateTimeEncoding.java,
TimestampWithTimeZoneType.java); the engine models the type as a
``named_struct('millis', BIGINT, 'zone', STRING)`` built by the rewrite
layer (rewrite.py ``_rewrite_tstz``), mirroring the ipaddress pattern:
literals fold HERE at rewrite time (zero runtime cost), and every
function/operator over a marked value lowers to inline Spark SQL on the
struct fields — JVM-side and column-capable, no Python in any plan.

This module is the Python half: parsing Presto's zone-carrying
temporal literal grammar into (epoch_millis, canonical_zone_id).

Literal grammar (TimestampWithTimeZoneType parse, Joda
ISODateTimeFormat-ish): ``yyyy-M-d[ H:m[:s[.SSS]]][ zone]`` where zone
is an offset (``+07:09``, space optional before it) or a region id
(``Europe/Berlin``, ``Asia/Oral``, ``UTC``); TIME WITH TIME ZONE is
``H:m[:s[.SSS]] zone`` anchored on 1970-01-01 (reference:
TestTimestampWithTimeZoneBase.java:61-99, TestTimeWithTimeZoneBase).
"""

from __future__ import annotations

import datetime
import re

_OFFSET_RE = re.compile(r"^(.*?)\s*([+-])(\d{1,2}):(\d{2})$")
_REGION_RE = re.compile(
    r"^(.*?)\s+([A-Za-z][A-Za-z_]*(?:/[A-Za-z0-9_+\-]+)+|UTC|GMT|UT|Z)$"
)
_TS_BODY_RE = re.compile(
    r"^(\d{4})-(\d{1,2})-(\d{1,2})"
    r"(?:[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,9}))?)?)?$"
)
_TIME_BODY_RE = re.compile(
    r"^(\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,9}))?)?$"
)


def split_zone(text: str) -> tuple[str, str] | None:
    """Split a temporal literal body into (datetime_part, zone_id), or
    None when no per-value zone is present (plain NTZ literal — not
    ours). Offsets canonicalize to ``±HH:MM`` (Presto's TimeZoneKey
    rendering for offset zones)."""
    t = text.strip()
    m = _OFFSET_RE.match(t)
    if m:
        body, sign, hh, mm = m.groups()
        if int(hh) > 14 or int(mm) > 59:
            return None
        if int(hh) == 0 and int(mm) == 0:
            # TimeZoneKey canonicalizes offset 0 to UTC
            return body.strip(), "UTC"
        return body.strip(), f"{sign}{int(hh):02d}:{mm}"
    m = _REGION_RE.match(t)
    if m:
        zone = m.group(2)
        if zone in ("Z", "UT", "GMT"):
            zone = "UTC"
        return m.group(1).strip(), zone
    return None


def _zone_info(zone: str):
    from zoneinfo import ZoneInfo

    if re.fullmatch(r"[+-]\d{2}:\d{2}", zone):
        sign = -1 if zone[0] == "-" else 1
        h, mi = int(zone[1:3]), int(zone[4:6])
        return datetime.timezone(sign * datetime.timedelta(hours=h, minutes=mi))
    return ZoneInfo(zone)


def parse_tstz_literal(
    text: str, default_zone: str | None = None
) -> tuple[int, str] | None:
    """``2001-1-22 03:04:05.321 +07:09`` → (epoch_millis, '+07:09');
    None when the text has no zone (unless ``default_zone`` is given —
    the varchar→TSWTZ cast attaches the session zone) or doesn't parse
    (caller falls back to the plain-timestamp path / lets Spark
    raise)."""
    sz = split_zone(text)
    if sz is None:
        if default_zone is None:
            return None
        body, zone = text.strip(), default_zone
    else:
        body, zone = sz
    m = _TS_BODY_RE.match(body)
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    h = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    s = int(m.group(6) or 0)
    frac = (m.group(7) or "").ljust(3, "0")[:3]
    try:
        tz = _zone_info(zone)
        dt = datetime.datetime(y, mo, d, h, mi, s, int(frac) * 1000, tzinfo=tz)
    except Exception:
        return None
    return round(dt.timestamp() * 1000), zone


def parse_ttz_literal(
    text: str, default_zone: str | None = None
) -> tuple[int, str] | None:
    """``03:04:05.321 +07:09`` → (epoch_millis on 1970-01-01 in that
    zone, zone). Presto's TIME WITH TIME ZONE is (utc_millis, zoneKey)
    with the local time anchored on the epoch day
    (SqlTimeWithTimeZone / DateTimeUtils.parseTimeWithTimeZone)."""
    sz = split_zone(text)
    if sz is None:
        if default_zone is None:
            return None
        body, zone = text.strip(), default_zone
    else:
        body, zone = sz
    m = _TIME_BODY_RE.match(body)
    if not m:
        return None
    h, mi = int(m.group(1)), int(m.group(2))
    s = int(m.group(3) or 0)
    frac = (m.group(4) or "").ljust(3, "0")[:3]
    if h > 23 or mi > 59 or s > 59:
        return None
    try:
        tz = _zone_info(zone)
        dt = datetime.datetime(1970, 1, 1, h, mi, s, int(frac) * 1000,
                               tzinfo=tz)
    except (ValueError, KeyError, Exception):
        return None
    return int(dt.timestamp() * 1000), zone


def parse_joda_datetime(
    text: str, pattern: str, default_zone: str
) -> tuple[int, str] | None:
    """Minimal Joda DateTimeFormat PARSE for rewrite-time literal folds
    of ``parse_datetime`` (DateTimeFunctions.parseDatetime → Joda
    forPattern): token runs y/Y (year), M (month), d (day-of-month),
    D (day-of-year, overrides month — Joda last-field-wins), H (hour),
    m (minute), s (second), S (millis), Z-runs (Z = ±HHmm,
    ZZ = ±HH:MM, ZZZ+ = zone id), quoted/separator literals. Returns
    (epoch_millis, zone_id) or None when the pattern uses something
    beyond this subset (caller leaves the legacy path in place)."""
    toks: list[tuple[str, object]] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c.isalpha():
            j = i
            while j < len(pattern) and pattern[j] == c:
                j += 1
            toks.append((c, j - i))
            i = j
        elif c == "'":
            j = pattern.find("'", i + 1)
            if j < 0:
                return None
            toks.append(("lit", pattern[i + 1:j] or "'"))
            i = j + 1
        else:
            toks.append(("lit", c))
            i += 1

    f: dict[str, int] = {}
    zone: str | None = None
    pos = 0

    def take_num(key, maxlen=4):
        nonlocal pos
        m = re.match(r"\d{1,%d}" % maxlen, text[pos:])
        if not m:
            return False
        f[key] = int(m.group())
        pos += m.end()
        return True

    for kind, n in toks:
        if kind == "lit":
            if not text.startswith(n, pos):
                return None
            pos += len(n)
        elif kind in ("y", "Y"):
            if not take_num("y"):
                return None
        elif kind == "M":
            if not take_num("mo", 2):
                return None
        elif kind == "d":
            if not take_num("d", 2):
                return None
        elif kind == "D":
            if not take_num("doy", 3):
                return None
        elif kind == "H":
            if not take_num("h", 2):
                return None
        elif kind == "h":
            # clockhour-of-halfday (1-12); combined with the halfday
            # field below
            if not take_num("ch", 2):
                return None
        elif kind == "a":
            m = re.match(r"(?i)(AM|PM)", text[pos:])
            if not m:
                return None
            f["pm"] = int(m.group().upper() == "PM")
            pos += m.end()
        elif kind == "m":
            if not take_num("mi", 2):
                return None
        elif kind == "s":
            if not take_num("s", 2):
                return None
        elif kind == "S":
            if not take_num("ms", 3):
                return None
        elif kind == "Z":
            if n >= 3:
                m = re.match(r"[A-Za-z][A-Za-z0-9_]*(?:/[A-Za-z0-9_+\-]+)*",
                             text[pos:])
                if not m:
                    return None
                zone = m.group()
                pos += m.end()
            else:
                m = re.match(r"([+-])(\d{2}):?(\d{2})", text[pos:])
                if not m:
                    return None
                hh, mm = int(m.group(2)), int(m.group(3))
                zone = (
                    "UTC" if hh == 0 and mm == 0
                    else f"{m.group(1)}{hh:02d}:{mm:02d}"
                )
                pos += m.end()
        else:
            return None  # unsupported token (locale text, era, …)
    if pos != len(text) or "y" not in f:
        return None
    if "ch" in f:  # clockhour 12 + AM → 0; PM adds 12 except for 12
        ch = f["ch"] % 12
        f["h"] = ch + (12 if f.get("pm") else 0)
    zone = zone or default_zone
    try:
        tz = _zone_info(zone)
        if "doy" in f:
            base = datetime.datetime(f["y"], 1, 1) + datetime.timedelta(
                days=f["doy"] - 1
            )
            y, mo, d = base.year, base.month, base.day
        else:
            y, mo, d = f["y"], f.get("mo", 1), f.get("d", 1)
        dt = datetime.datetime(
            y, mo, d, f.get("h", 0), f.get("mi", 0), f.get("s", 0),
            f.get("ms", 0) * 1000, tzinfo=tz,
        )
    except Exception:
        return None
    return round(dt.timestamp() * 1000), zone


def zone_offset_millis(zone: str, at_millis: int) -> int:
    """UTC offset of ``zone`` at the given instant, in millis (used for
    rewrite-time folds of timezone_hour/minute over literals)."""
    tz = _zone_info(zone)
    dt = datetime.datetime.fromtimestamp(at_millis / 1000.0, tz)
    off = dt.utcoffset() or datetime.timedelta(0)
    return int(off.total_seconds() * 1000)
