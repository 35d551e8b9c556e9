"""H2-oracle corpus tier: the reference's AbstractTestQueries strategy
(presto-tests — 1000+ assertQuery sites comparing the engine against an
H2 oracle on the same tables) mirrored as Engine.sql vs DuckDB over
unprefixed-column views of the driver testdata.

tools/port_h2_queries.py generates tests/h2_corpus.py; each case re-runs
BOTH sides here, so the tier is hermetic (no reference read) and robust
to testdata regeneration. Cases the harness can't represent are recorded
in h2_corpus.SKIPPED with explicit reasons (engine gaps carry README
pointers)."""

from __future__ import annotations

import pytest

import _golden_util as _gu
import h2_corpus as _hc
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def h2_engine(spark):
    from presto_ads_spark.engine import Engine

    sub = spark.newSession()
    _gu.register_h2_views(sub, SF_DIR)
    return Engine(sub, sf_dir=None)


@pytest.fixture(scope="module")
def h2_duck():
    return _gu.duckdb_h2_connection(SF_DIR)


@pytest.mark.parametrize(
    "case", _hc.CASES, ids=[c["name"] for c in _hc.CASES]
)
def test_h2_corpus(h2_engine, h2_duck, case):
    osql = case["oracle"] if case["oracle"] is not None else case["sql"]
    duck_rows = [
        tuple(r)
        for r in h2_duck.execute(
            _gu.duck_values_parens(_gu.duck_int_division(osql))
        ).fetchall()
    ]
    # DDL-fixture cases replay the reference test method's own
    # CREATE/INSERT/DELETE statements engine-side (the oracle reads
    # only base tables), then tear down — see port_h2_queries
    # FIXTURE_SITES
    try:
        for st in case.get("setup") or []:
            h2_engine.sql(st).collect()
        got = [tuple(r) for r in h2_engine.sql(case["sql"]).collect()]
    finally:
        for st in case.get("teardown") or []:
            try:
                h2_engine.sql(st).collect()
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
    if case["count_only"]:
        assert len(got) == len(duck_rows), case["sql"]
        return
    tol = case.get("tolerance")
    if tol is not None:
        diff = _gu.compare_pyrows_tol(
            got, duck_rows, tol, case.get("tol_cols")
        )
    else:
        diff = _gu.compare_pyrows(got, duck_rows)
    assert diff is None, f"{case['name']}: {case['sql'][:160]}\n{diff}"


def test_h2_corpus_skips_documented():
    assert all(s["reason"] for s in _hc.SKIPPED)


def test_h2_corpus_covered_sites_have_live_coverage():
    # every "covered" site must point at live coverage: a G-case that
    # runs in CASES, the identical SQL as another live corpus case, or
    # a verbatim PREPARE/EXECUTE engine test — the claim is checkable
    gcase_names = {c["name"] for c in _hc.CASES if c["name"].startswith("G")}
    assert gcase_names, "no G-cases in the corpus?"
    for c in _hc.COVERED:
        assert c["gcase"], c
        if "same SQL = corpus case" in c["gcase"]:
            ref = c["gcase"].split("corpus case ")[1].split(";")[0].strip()
            assert any(x["name"] == ref for x in _hc.CASES), c
        elif "PREPARE/EXECUTE" in c["gcase"]:
            import os

            t = open(os.path.join(os.path.dirname(__file__),
                                  "test_engine.py")).read()
            assert "test_execute_using" in t, c
