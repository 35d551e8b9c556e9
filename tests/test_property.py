"""Property-based tests (hypothesis) — mirrors the reference's strategy of
property-testing the error-prone translation layers (SURVEY.md §7 watch-list
#2: datetime pattern translation is 'pure lookup-table work but error-prone').
"""

from __future__ import annotations

import datetime
import os
import random
import sys

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


# --- temporal operators vs naive reference implementations -----------------


@settings(max_examples=12, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=12, unique=True,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 99)),
        min_size=0, max_size=12, unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_join_matches_naive(spark, lefts, rights):
    """Union+window as-of == per-row argmax of eligible right rows."""
    import datetime as dt

    from presto_ads_spark.operators import asof_join

    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(i, f"k{k}", ts(s)) for i, (k, s) in enumerate(lefts)],
        "id bigint, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(f"k{k}", ts(s), float(v)) for k, s, v in rights],
        "k string, ts timestamp, v double",
    )
    got = {
        r.id: (r.ts_r, r.v_r)
        for r in asof_join(
            left, right, on="ts", by=("k",), value_cols=("v",)
        ).collect()
    }
    # the skew path (bucketed windows + cross-bucket seed carry) must be
    # semantics-identical for ANY bucket width, including widths that
    # leave buckets empty between right and left rows
    got_b = {
        r.id: (r.ts_r, r.v_r)
        for r in asof_join(
            left, right, on="ts", by=("k",), value_cols=("v",),
            bucket_secs=97,
        ).collect()
    }
    for i, (k, s) in enumerate(lefts):
        elig = [(rs, rv) for rk, rs, rv in rights if rk == k and rs <= s]
        want = max(elig) if elig else None
        if want is None:
            assert got[i] == (None, None)
            assert got_b[i] == (None, None)
        else:
            assert got[i] == (ts(want[0]), float(want[1]))
            assert got_b[i] == got[i]


@settings(max_examples=12, deadline=None)
@given(
    lefts=st.lists(st.integers(0, 7200), min_size=1, max_size=10, unique=True),
    spans=st.lists(
        st.tuples(st.integers(0, 7200), st.integers(1, 5400)),
        min_size=0, max_size=6,
        unique_by=lambda r: r[0],
    ),
    bucket=st.sampled_from([60, 600, 3600]),
)
def test_range_join_matches_naive_containment(spark, lefts, spans, bucket):
    """Bucketed range join == exact containment filter for any bucket size."""
    import datetime as dt

    from presto_ads_spark.operators import range_join

    base = dt.datetime(2024, 1, 1)

    def ts(sec):
        return base + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(i, "k", ts(s)) for i, s in enumerate(lefts)],
        "id bigint, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(j, "k", ts(s), ts(s + d)) for j, (s, d) in enumerate(spans)],
        "wid bigint, k string, s timestamp, e timestamp",
    )
    got = sorted(
        (r.id, r.wid)
        for r in range_join(
            left, right, left_time="ts", right_start="s", right_end="e",
            by=("k",), bucket_secs=bucket,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, ls in enumerate(lefts)
        for j, (s, d) in enumerate(spans)
        if s <= ls < s + d
    )
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(st.integers(1, 40), min_size=1, max_size=20),
    budget=st.sampled_from([8, 64, 512]),
)
def test_pack_sequences_conservation_and_order(spark, docs, budget):
    """Packing preserves totals, bins are dense from 0, and no bin except
    possibly the last is left under-filled by more than one document."""
    from presto_ads_spark.llm.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, "s", "w " * n) for i, n in enumerate(docs)],
        "doc_id bigint, source string, text string",
    )
    rows = sorted(
        pack_sequences(df, budget=budget).collect(),
        key=lambda r: r.seq_id,
    )
    # token totals conserved ('w ' * n splits into n + 1 tokens)
    assert sum(r.seq_tokens for r in rows) == sum(n + 1 for n in docs)
    assert sum(r.n_docs for r in rows) == len(docs)
    # seq ids are the floor of the running pre-sum: monotone, start at 0
    assert rows[0].seq_id == 0
    ids = [r.seq_id for r in rows]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    # the skew path (chunked windows + chunk-base offsets) decomposes the
    # prefix sum exactly — identical output for any chunk size
    chunked = sorted(
        pack_sequences(df, budget=budget, chunk_docs=3).collect(),
        key=lambda r: r.seq_id,
    )
    assert [tuple(r) for r in chunked] == [tuple(r) for r in rows]


def test_infer_values_int_cols():
    from presto_ads_spark.rewrite import infer_values_int_cols as f

    assert f(
        "SELECT a/b FROM (VALUES (1, 2, 'x'), (3, NULL, 'y')) t(a, b, s)"
    ) == {"a", "b"}
    # typed integer literals count; DECIMAL does not
    assert f(
        "SELECT * FROM (VALUES (CAST(1 AS DECIMAL(18,0)), SMALLINT '3'))"
        " x (a, b)"
    ) == {"b"}
    # ROW constructor rows; arity mismatch drops the relation
    assert f("SELECT * FROM (VALUES ROW(1, 2), ROW(3, 4)) t(a, b)") == {
        "a",
        "b",
    }
    assert f("SELECT * FROM (VALUES (1, 2), (3,)) t(a, b)") == frozenset()
    # conflicting votes across two relations drop the name
    assert f(
        "SELECT * FROM (VALUES (1)) t(a), (VALUES (1.5)) u(a)"
    ) == frozenset()


def test_values_int_division_is_presto_truncating(spark):
    from presto_ads_spark.engine import Engine

    eng = Engine(spark.newSession(), sf_dir=None)
    rows = eng.sql(
        "SELECT a / b AS q, a % b AS r FROM (VALUES (7, 2), (-7, 2)) t(a, b)"
    ).collect()
    assert [(r.q, r.r) for r in rows] == [(3, 1), (-3, -1)]


def test_expression_fuzz_differential(spark):
    """Deterministic slice of the tools/fuzz_expressions.py grammar:
    every generated query must agree with DuckDB exactly."""
    import random

    import duckdb

    import _golden_util as gu

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fuzz_expressions import duck_dialect, gen_query, install_duck_macros
    from presto_ads_spark.engine import Engine

    eng = Engine(spark.newSession(), sf_dir=None)
    duck = duckdb.connect()
    install_duck_macros(duck)
    rng = random.Random(20260814)
    checked = 0
    for _ in range(120):
        q = gen_query(rng)
        try:
            want = [tuple(r) for r in duck.execute(duck_dialect(q)).fetchall()]
        except Exception:
            continue
        got = [tuple(r) for r in eng.sql(q).collect()]
        assert gu.compare_pyrows(got, want) is None, q
        checked += 1
    assert checked > 80
