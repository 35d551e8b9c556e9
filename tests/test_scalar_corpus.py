"""Scalar-function assert corpus tier.

Runs every case emitted by ``tools/port_scalar_asserts.py --emit``
(tests/scalar_corpus.py — literal Presto expression + comparison
category + parsed expected value, ported from the reference's
``assertFunction`` sites in operator/scalar/Test*.java and
type/Test*.java) through ``Engine.sql`` in batches, comparing with the
same category-aware equality the porter used. A failure here is a real
scalar-surface regression: the emitted corpus only contains cases that
passed at port time, so any mismatch means a rewrite/function change
broke a pinned behavior.

Regenerate after intentional semantics changes with
``python tools/port_scalar_asserts.py --emit``.
"""

from __future__ import annotations

import pytest

from tests._scalar_util import eval_exprs, eval_sql, values_match

try:
    from tests.scalar_corpus import CASES, SKIPPED  # noqa: F401
except ImportError:  # corpus not emitted yet — tier is inert
    CASES, SKIPPED = [], []

BATCH = 48


@pytest.fixture(scope="module")
def scalar_engine(spark):
    from presto_ads_spark.engine import Engine

    return Engine(spark.newSession(), sf_dir=None)


@pytest.mark.parametrize("start", range(0, len(CASES), BATCH))
def test_scalar_corpus_batch(scalar_engine, start):
    chunk = CASES[start : start + BATCH]
    # zone-sensitive cases carry the source suite's session zone (the
    # TSWTZ layer's zone-less coercions read it); runs of equal tz
    # evaluate as one batch
    results = []
    i = 0

    def key(c):
        return (
            c.get("tz", "UTC"), c.get("locale", "en"), c.get("start_ms"),
            c.get("legacy", False),
        )

    while i < len(chunk):
        tz, loc, start_ms, legacy = key(chunk[i])
        j = i
        while j < len(chunk) and key(chunk[j]) == (tz, loc, start_ms,
                                                   legacy):
            j += 1
        scalar_engine.session_zone = tz
        scalar_engine.session_locale = loc
        scalar_engine.session_start_ms = start_ms
        scalar_engine.legacy_timestamp = legacy
        results.extend(
            eval_exprs(
                scalar_engine,
                [eval_sql(c["sql"], c["cat"]) for c in chunk[i:j]],
            )
        )
        i = j
    scalar_engine.session_zone = "UTC"
    scalar_engine.session_locale = "en"
    scalar_engine.session_start_ms = None
    scalar_engine.legacy_timestamp = False
    bad = []
    for c, got in zip(chunk, results):
        if isinstance(got, Exception):
            bad.append(
                f"{c['name']}: {c['sql'][:120]} -> ENGINE ERROR "
                f"{type(got).__name__}: {str(got)[:160]}"
            )
        elif not values_match(c["cat"], got, c["expected"], c["name"]):
            bad.append(
                f"{c['name']}: {c['sql'][:120]} -> {got!r} "
                f"want {c['expected']!r}"
            )
    assert not bad, "\n".join(bad[:8])


def test_scalar_corpus_emitted_and_reasoned():
    """The corpus must exist (non-inert tier) and every skip must carry
    a reason string."""
    assert CASES, "tests/scalar_corpus.py not emitted"
    assert all(s.get("reason") for s in SKIPPED)
