"""Non-cryptographic hash + special-function emulations with no Spark
expression equivalent (reference: VarbinaryFunctions.java xxhash64 /
spooky_hash_v2_32 / spooky_hash_v2_64, MathFunctions.java
inverseBetaCdf). Pure-Python from the PUBLIC algorithm specs (xxHash by
Yann Collet, SpookyHash V2 by Bob Jenkins — both public domain).
Scalar-only compat surface, never in a relational hot path (the engine's
own dedup pipelines use Spark's native xxhash64 internally)."""

from __future__ import annotations

import math
import struct

_M64 = (1 << 64) - 1

# --- xxHash64 (seed 0) ------------------------------------------------------
# Reference result form: VarbinaryFunctions.java:270-276 returns the
# 8-byte BIG-ENDIAN encoding (Long.reverseBytes into a little-endian
# slice) of XxHash64.hash(slice).

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _XXP2) & _M64
    return (_rotl(acc, 31) * _XXP1) & _M64


def _xx_merge(acc: int, val: int) -> int:
    acc ^= _xx_round(0, val)
    return (acc * _XXP1 + _XXP4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            (a, b, c, d) = struct.unpack_from("<QQQQ", data, i)
            v1, v2 = _xx_round(v1, a), _xx_round(v2, b)
            v3, v4 = _xx_round(v3, c), _xx_round(v4, d)
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = _xx_merge(h, v)
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _xx_round(0, k)
        h = (_rotl(h, 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _XXP1) & _M64
        h = (_rotl(h, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


# --- SpookyHash V2 ----------------------------------------------------------
# Bob Jenkins' public-domain SpookyHash version 2 (seed 0, as airlift's
# SpookyHashV2.hash32/hash64 are called with seed 0 by the reference).

_SC_CONST = 0xDEADBEEFDEADBEEF


def _short_mix(h0, h1, h2, h3):
    h2 = _rotl(h2, 50) & _M64; h2 = (h2 + h3) & _M64; h0 ^= h2
    h3 = _rotl(h3, 52) & _M64; h3 = (h3 + h0) & _M64; h1 ^= h3
    h0 = _rotl(h0, 30) & _M64; h0 = (h0 + h1) & _M64; h2 ^= h0
    h1 = _rotl(h1, 41) & _M64; h1 = (h1 + h2) & _M64; h3 ^= h1
    h2 = _rotl(h2, 54) & _M64; h2 = (h2 + h3) & _M64; h0 ^= h2
    h3 = _rotl(h3, 48) & _M64; h3 = (h3 + h0) & _M64; h1 ^= h3
    h0 = _rotl(h0, 38) & _M64; h0 = (h0 + h1) & _M64; h2 ^= h0
    h1 = _rotl(h1, 37) & _M64; h1 = (h1 + h2) & _M64; h3 ^= h1
    h2 = _rotl(h2, 62) & _M64; h2 = (h2 + h3) & _M64; h0 ^= h2
    h3 = _rotl(h3, 34) & _M64; h3 = (h3 + h0) & _M64; h1 ^= h3
    h0 = _rotl(h0, 5) & _M64; h0 = (h0 + h1) & _M64; h2 ^= h0
    h1 = _rotl(h1, 36) & _M64; h1 = (h1 + h2) & _M64; h3 ^= h1
    return h0, h1, h2, h3


def _short_end(h0, h1, h2, h3):
    h3 ^= h2; h2 = _rotl(h2, 15); h3 = (h3 + h2) & _M64
    h0 ^= h3; h3 = _rotl(h3, 52); h0 = (h0 + h3) & _M64
    h1 ^= h0; h0 = _rotl(h0, 26); h1 = (h1 + h0) & _M64
    h2 ^= h1; h1 = _rotl(h1, 51); h2 = (h2 + h1) & _M64
    h3 ^= h2; h2 = _rotl(h2, 28); h3 = (h3 + h2) & _M64
    h0 ^= h3; h3 = _rotl(h3, 9); h0 = (h0 + h3) & _M64
    h1 ^= h0; h0 = _rotl(h0, 47); h1 = (h1 + h0) & _M64
    h2 ^= h1; h1 = _rotl(h1, 54); h2 = (h2 + h1) & _M64
    h3 ^= h2; h2 = _rotl(h2, 32); h3 = (h3 + h2) & _M64
    h0 ^= h3; h3 = _rotl(h3, 25); h0 = (h0 + h3) & _M64
    h1 ^= h0; h0 = _rotl(h0, 63); h1 = (h1 + h0) & _M64
    return h0, h1, h2, h3


def _spooky_short(data: bytes, seed1: int, seed2: int):
    n = len(data)
    h0, h1, h2, h3 = seed1, seed2, _SC_CONST, _SC_CONST
    i = 0
    remainder = n % 32
    if n > 15:
        while i <= n - 32:
            a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            h2 = (h2 + a) & _M64
            h3 = (h3 + b) & _M64
            h0, h1, h2, h3 = _short_mix(h0, h1, h2, h3)
            h0 = (h0 + c) & _M64
            h1 = (h1 + d) & _M64
            i += 32
        if remainder >= 16:
            a, b = struct.unpack_from("<QQ", data, i)
            h2 = (h2 + a) & _M64
            h3 = (h3 + b) & _M64
            h0, h1, h2, h3 = _short_mix(h0, h1, h2, h3)
            i += 16
            remainder -= 16
    # last 0..15 bytes into h2/h3, length folded into h3's top byte
    h3 = (h3 + (n << 56)) & _M64
    tail = data[i:]
    if len(tail) >= 8:
        (lo,) = struct.unpack_from("<Q", tail, 0)
        h2 = (h2 + lo) & _M64
        hi_bytes = tail[8:]
        hi = int.from_bytes(hi_bytes.ljust(8, b"\0"), "little")
        h3 = (h3 + hi) & _M64
    elif tail:
        lo = int.from_bytes(tail.ljust(8, b"\0"), "little")
        h2 = (h2 + lo) & _M64
    else:
        h2 = (h2 + _SC_CONST) & _M64
        h3 = (h3 + _SC_CONST) & _M64
    h0, h1, h2, h3 = _short_end(h0, h1, h2, h3)
    return h0, h1


def _spooky_mix(chunk, s):
    d = struct.unpack("<12Q", chunk)
    for j in range(12):
        s[j] = (s[j] + d[j]) & _M64
        s[(j + 2) % 12] ^= s[(j + 10) % 12]
        s[(j + 11) % 12] ^= s[j]
        s[j] = _rotl(
            s[j],
            (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)[j],
        )
        s[(j + 11) % 12] = (s[(j + 11) % 12] + s[(j + 1) % 12]) & _M64
    return s


def _spooky_end_partial(s):
    s[11] = (s[11] + s[1]) & _M64
    s[2] ^= s[11]
    s[1] = _rotl(s[1], 44)
    for j in range(1, 12):
        s[(j + 11) % 12] = (s[(j + 11) % 12] + s[(j + 1) % 12]) & _M64
        s[(j + 2) % 12] ^= s[(j + 11) % 12]
        s[(j + 1) % 12] = _rotl(
            s[(j + 1) % 12],
            (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)[j],
        )
    return s


def _spooky_long(data: bytes, seed1: int, seed2: int):
    n = len(data)
    s = [
        seed1, seed2, _SC_CONST, seed1, seed2, _SC_CONST,
        seed1, seed2, _SC_CONST, seed1, seed2, _SC_CONST,
    ]
    i = 0
    while i + 96 <= n:
        s = _spooky_mix(data[i : i + 96], s)
        i += 96
    # final partial block: zero-padded, length in the last byte
    tail = bytearray(96)
    rem = n - i
    tail[:rem] = data[i:]
    tail[95] = rem
    s = _spooky_mix(bytes(tail), s)
    s = _spooky_end_partial(s)
    s = _spooky_end_partial(s)
    s = _spooky_end_partial(s)
    return s[0], s[1]


def spooky_v2_128(data: bytes, seed1: int = 0, seed2: int = 0):
    if len(data) < 192:
        return _spooky_short(data, seed1, seed2)
    return _spooky_long(data, seed1, seed2)


# --- incomplete beta inverse -------------------------------------------------


def _log_beta(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def _betacf(x: float, a: float, b: float) -> float:
    """Continued fraction for the regularized incomplete beta
    (Lentz's method — the standard public formulation)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    return h


def reg_inc_beta(x: float, a: float, b: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        a * math.log(x) + b * math.log1p(-x) - _log_beta(a, b)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(x, a, b) / a
    return 1.0 - math.exp(
        b * math.log1p(-x) + a * math.log(x) - _log_beta(b, a)
    ) * _betacf(1.0 - x, b, a) / b


def inverse_beta_cdf(a: float, b: float, p: float) -> float:
    """Inverse regularized incomplete beta by bisection+Newton to
    machine precision (MathFunctions.inverseBetaCdf delegates to
    commons-math's solver; agreement ~1e-12)."""
    if p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0
    lo, hi = 0.0, 1.0
    x = 0.5
    for _ in range(200):
        f = reg_inc_beta(x, a, b) - p
        if f > 0:
            hi = x
        else:
            lo = x
        # Newton step with bisection fallback
        try:
            pdf = math.exp(
                (a - 1) * math.log(x)
                + (b - 1) * math.log1p(-x)
                - _log_beta(a, b)
            )
        except ValueError:
            pdf = 0.0
        nx = x - f / pdf if pdf > 1e-300 else 0.5 * (lo + hi)
        if not lo < nx < hi:
            nx = 0.5 * (lo + hi)
        if abs(nx - x) < 1e-16:
            x = nx
            break
        x = nx
    return x
