"""Presto color/presentation functions (reference
presto-main/.../operator/scalar/ColorFunctions.java; golden corpus
color_functions/*.sql).

``rgb``/``color``/``render``/``bar`` render ANSI-colored CLI output.
Semantics reimplemented from the function docs and the product-test
expected outputs (tests/golden_corpus.py color_functions cases):

- a color value is an int: non-negative = 0xRRGGBB truecolor (mapped to
  the xterm 6x6x6 cube on render, level = c*6/256 per channel), negative
  = -(ansi_system_code+1) for the named/system colors.
- gradient interpolation runs in HSV space (hue/sat/value linear), which
  is what produces the red→yellow→green ramp the reference's ``bar``
  gradient shows.

These are presentation helpers for CLI output — never a hot path — so
plain Python UDFs are acceptable here (same policy as HMAC in
__init__._register_python_udfs). Registered via rewrite-layer arity
dispatch (rewrite._rewrite_color_fn_arity) because Spark UDFs don't
overload: color/render/bar map to color1/color3/color5, render1/render2,
bar2/bar4.
"""

from __future__ import annotations

import colorsys

# Presto system color names → ANSI codes (ColorFunctions color(name))
_SYSTEM_COLORS = {
    "black": 0, "red": 1, "green": 2, "yellow": 3,
    "blue": 4, "magenta": 5, "cyan": 6, "white": 7,
}

_BLOCK = "█"
_ESC = "\x1b"


def _enc_rgb(r: int, g: int, b: int) -> int:
    return ((int(r) & 0xFF) << 16) | ((int(g) & 0xFF) << 8) | (int(b) & 0xFF)


def _dec_rgb(v: int) -> tuple[int, int, int]:
    return (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF


def _ansi_code(v: int) -> int:
    """Color int → xterm-256 code (6x6x6 cube for rgb, system code for
    negative)."""
    if v < 0:
        return -v - 1
    r, g, b = _dec_rgb(v)
    q = lambda c: min(5, c * 6 // 256)  # noqa: E731
    return 16 + 36 * q(r) + 6 * q(g) + q(b)


def _interpolate(fraction: float, low: int, high: int) -> int:
    """HSV-linear interpolation between two rgb color ints."""
    f = min(1.0, max(0.0, fraction))
    if low < 0 or high < 0:
        # system colors don't interpolate — snap to nearest endpoint
        return low if f < 0.5 else high
    lh, ls, lv = colorsys.rgb_to_hsv(*(c / 255.0 for c in _dec_rgb(low)))
    hh, hs, hv = colorsys.rgb_to_hsv(*(c / 255.0 for c in _dec_rgb(high)))
    h = lh + (hh - lh) * f
    s = ls + (hs - ls) * f
    v = lv + (hv - lv) * f
    r, g, b = (round(c * 255) for c in colorsys.hsv_to_rgb(h, s, v))
    return _enc_rgb(r, g, b)


def color1(s: str | None) -> int | None:
    """color('#rgb' | '#rrggbb' | name) → color int."""
    if s is None:
        return None
    t = s.strip().lower()
    if t.startswith("#"):
        hx = t[1:]
        if len(hx) == 3:
            hx = "".join(c * 2 for c in hx)
        v = int(hx, 16)
        return v
    if t in _SYSTEM_COLORS:
        return -_SYSTEM_COLORS[t] - 1
    raise ValueError(f"invalid color: {s!r}")


def color3(fraction, low, high) -> int | None:
    if fraction is None or low is None or high is None:
        return None
    return _interpolate(float(fraction), int(low), int(high))


def color5(value, lo, hi, low, high) -> int | None:
    if None in (value, lo, hi, low, high):
        return None
    span = float(hi) - float(lo)
    f = 0.0 if span == 0 else (float(value) - float(lo)) / span
    return _interpolate(f, int(low), int(high))


def _wrap(text: str, code: int) -> str:
    return f"{_ESC}[38;5;{code}m{text}{_ESC}[0m"


def render2(s, c) -> str | None:
    if s is None or c is None:
        return None
    return _wrap(str(s), _ansi_code(int(c)))


def render1(b) -> str | None:
    """render(boolean) → green ✓ / red ✗ in system colors."""
    if b is None:
        return None
    if b:
        return _wrap("✓", _SYSTEM_COLORS["green"])
    return _wrap("✗", _SYSTEM_COLORS["red"])


_RED = _enc_rgb(255, 0, 0)
_GREEN = _enc_rgb(0, 255, 0)


def bar4(fraction, width, low, high) -> str | None:
    if fraction is None or width is None or low is None or high is None:
        return None
    w = int(width)
    # reference ColorFunctions.bar:209-211 truncates then clamps:
    # count = (int)(percent * width), clamped into [0, width]
    filled = max(0, min(w, int(float(fraction) * w)))
    out = []
    for i in range(filled):
        t = i / (w - 1) if w > 1 else 0.0
        out.append(
            f"{_ESC}[38;5;{_ansi_code(_interpolate(t, int(low), int(high)))}m"
            f"{_BLOCK}"
        )
    out.append(f"{_ESC}[0m")
    out.append(" " * (w - filled))
    return "".join(out)


def bar2(fraction, width) -> str | None:
    return bar4(fraction, width, _RED, _GREEN)


def register_color_udfs(spark) -> None:
    spark.udf.register("color1", color1, "bigint")
    spark.udf.register("color3", color3, "bigint")
    spark.udf.register("color5", color5, "bigint")
    spark.udf.register("render1", render1, "string")
    spark.udf.register("render2", render2, "string")
    spark.udf.register("bar2", bar2, "string")
    spark.udf.register("bar4", bar4, "string")
    # rgb(r, g, b) has a single signature — JVM-side SQL function
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION rgb(r BIGINT, g BIGINT, b BIGINT)
           RETURNS BIGINT RETURN
             shiftleft(r & 255, 16) + shiftleft(g & 255, 8) + (b & 255)"""
    )
