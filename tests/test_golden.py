"""Golden-corpus tier: data-independent SQL cases with inline expected rows,
mirroring the reference's product-test format
(presto-product-tests/.../sql-tests/testcases/ — 370 .sql files with
``--!`` expected rows; e.g. set_operation/except.sql). Queries run through
``engine.sql`` (the Presto-dialect surface); expectations are exact
multisets."""

from __future__ import annotations

import pytest

# (name, presto-dialect SQL, expected rows as sorted list of tuples)
GOLDEN: list[tuple[str, str, list[tuple]]] = [
    (
        "setop_except",
        "SELECT * FROM (VALUES 1, 2, 3, 3, 4) t(x) EXCEPT SELECT * FROM (VALUES 3, 4, 5) u(y)",
        [(1,), (2,)],
    ),
    (
        "setop_except_all",
        "SELECT * FROM (VALUES 1, 3, 3, 4) t(x) EXCEPT ALL SELECT * FROM (VALUES 3, 4) u(y)",
        [(1,), (3,)],
    ),
    (
        "setop_intersect",
        "SELECT * FROM (VALUES 1, 2, 2, 3) t(x) INTERSECT SELECT * FROM (VALUES 2, 3, 4) u(y)",
        [(2,), (3,)],
    ),
    (
        "setop_union_distinct",
        "SELECT * FROM (VALUES 1, 2) t(x) UNION SELECT * FROM (VALUES 2, 3) u(y)",
        [(1,), (2,), (3,)],
    ),
    (
        "agg_empty_input",
        "SELECT count(*) AS n, sum(x) AS s, max(x) AS m FROM (VALUES 1) t(x) WHERE x > 99",
        [(0, None, None)],
    ),
    (
        "agg_distinct_literal",
        "SELECT count(DISTINCT x) AS n FROM (VALUES 1, 1, 2, NULL) t(x)",
        [(2,)],
    ),
    (
        "group_by_null_key",
        "SELECT x, count(*) AS n FROM (VALUES 1, 1, NULL, NULL, NULL) t(x) GROUP BY x",
        [(None, 3), (1, 2)],
    ),
    (
        "join_null_keys_dont_match",
        "SELECT count(*) AS n FROM (VALUES 1, NULL) a(x) JOIN (VALUES 1, NULL) b(y) ON a.x = b.y",
        [(1,)],
    ),
    (
        "in_list_null_semantics",
        # standard 3-valued IN over a literal list (2 IN (1, NULL) → NULL).
        # NOTE: the *subquery* form (x IN (SELECT ...)) returns False instead
        # of NULL in Spark's ExistenceJoin rewrite — documented deviation
        # (README "Known gaps").
        "SELECT 1 IN (1, NULL) AS a, 2 IN (1, NULL) AS b",
        [(True, None)],
    ),
    (
        "case_null_handling",
        # ANSI Spark needs the NULL condition typed (Presto coerces untyped)
        "SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'a' WHEN 1=1 THEN 'b' END AS v",
        [("b",)],
    ),
    (
        "coalesce_chain",
        "SELECT coalesce(NULL, NULL, 7, 9) AS v",
        [(7,)],
    ),
    (
        "string_concat_null",
        "SELECT concat('a', 'b') AS ok, 'x' || NULL AS n",
        [("ab", None)],
    ),
    (
        "array_basics",
        "SELECT cardinality(array(1, 2, 3)) AS n, element_at(array(10, 20), 2) AS e,"
        " array_position(array('a','b','c'), 'b') AS p",
        [(3, 20, 2)],
    ),
    (
        "array_hof",
        "SELECT transform(array(1, 2, 3), x -> x * 10) AS t,"
        " filter(array(1, 2, 3, 4), x -> x % 2 = 0) AS f,"
        " aggregate(array(1, 2, 3), 0, (a, x) -> a + x) AS r",
        [(([10, 20, 30]), [2, 4], 6)],
    ),
    (
        "map_functions",
        "SELECT map_keys(map_from_entries(array(struct(1, 'a'), struct(2, 'b')))) AS ks,"
        " element_at(map_from_entries(array(struct(1, 'a'))), 1) AS v",
        [(([1, 2]), "a")],
    ),
    (
        "unnest_ordinality_literal",
        "SELECT w, o FROM (VALUES 1) x(d) CROSS JOIN UNNEST(split('a b c', ' ')) WITH ORDINALITY AS t(w, o)",
        [("a", 1), ("b", 2), ("c", 3)],
    ),
    (
        "row_comparison",
        "SELECT (1, 'a') = (1, 'a') AS eq",
        [(True,)],
    ),
    (
        "between_and_not",
        "SELECT x FROM (VALUES 1, 5, 10) t(x) WHERE x BETWEEN 2 AND 9",
        [(5,)],
    ),
    (
        "nullif_identity",
        "SELECT nullif(3, 3) AS a, nullif(3, 4) AS b",
        [(None, 3)],
    ),
    (
        "distinct_from",
        "SELECT NULL IS DISTINCT FROM NULL AS a, 1 IS DISTINCT FROM NULL AS b",
        [(False, True)],
    ),
    (
        "window_literal",
        "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s"
        " FROM (VALUES 1, 2, 3) t(x)",
        [(1, 1), (2, 3), (3, 6)],
    ),
    (
        "grouping_sets_literal",
        "SELECT g, count(*) AS n FROM (VALUES 'a', 'a', 'b') t(g) GROUP BY GROUPING SETS ((g), ())",
        [(None, 3), ("a", 2), ("b", 1)],
    ),
    (
        "limit_order",
        "SELECT x FROM (VALUES 5, 3, 9, 1) t(x) ORDER BY x DESC LIMIT 2",
        [(5,), (9,)],
    ),
    (
        "try_cast_bad",
        "SELECT TRY(CAST('abc' AS INTEGER)) AS v",
        [(None,)],
    ),
    (
        "strpos_shim",
        "SELECT strpos('abcabc', 'c') AS p, split_part('x/y/z', '/', 3) AS sp",
        [(3, "z")],
    ),
    (
        "datetime_literals",
        "SELECT date_trunc('hour', TIMESTAMP '2024-05-06 07:08:09') AS h,"
        " year(TIMESTAMP '2024-05-06 00:00:00') AS y,"
        " TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 2 DAY AS plus2",
        [(__import__("datetime").datetime(2024, 5, 6, 7, 0),
          2024,
          __import__("datetime").datetime(2024, 1, 3, 0, 0))],
    ),
    (
        "decimal_exact_arithmetic",
        "SELECT CAST(1.10 AS DECIMAL(10,2)) + CAST(2.20 AS DECIMAL(10,2)) = CAST(3.30 AS DECIMAL(10,2)) AS exact",
        [(True,)],
    ),
    (
        "bitwise_golden",
        "SELECT bitwise_and(12, 10) AS a, bitwise_xor(12, 10) AS x, 5 & 3 AS amp",
        [(8, 6, 1)],
    ),
    (
        "regexp_golden",
        "SELECT regexp_extract('foo123bar', '([0-9]+)', 1) AS d,"
        " regexp_replace('a1b2', '[0-9]', '#') AS r,"
        " regexp_like('hello', 'ell') AS m",
        [("123", "a#b#", True)],
    ),
    (
        "json_golden",
        "SELECT json_extract_scalar('{\"a\": [1, {\"b\": 2}]}', '$.a[1].b') AS v,"
        " json_array_length('[1,2,3]') AS n",
        [("2", 3)],
    ),
    (
        "cast_coercions",
        "SELECT CAST('12' AS BIGINT) AS i, CAST(3.9 AS INTEGER) AS trunc_i, CAST(1 AS DOUBLE) / 2 AS d",
        [(12, 3, 0.5)],
    ),
    (
        "greatest_least_null",
        "SELECT greatest(1, 5, 3) AS g, least(1, 5, 3) AS l, greatest(1, NULL) AS gn",
        [(5, 1, 1)],
    ),
    (
        "interval_day_arith",
        "SELECT CAST(date_diff_unit('day', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-03-01 00:00:00') AS INT) AS days",
        [(60,)],
    ),
    (
        "array_set_ops",
        "SELECT array_intersect(array(1,2,3), array(2,3,4)) AS i,"
        " array_except(array(1,2,3), array(2)) AS e,"
        " arrays_overlap(array(1,2), array(2,9)) AS o",
        [([2, 3], [1, 3], True)],
    ),
    (
        "concat_pipe_arrays",
        "SELECT array(1,2) || array(3) AS a",
        [([1, 2, 3],)],
    ),
    (
        "exists_literal",
        "SELECT EXISTS (SELECT 1 FROM (VALUES 1) t(x) WHERE x = 1) AS e,"
        " EXISTS (SELECT 1 FROM (VALUES 1) t(x) WHERE x = 2) AS ne",
        [(True, False)],
    ),
    (
        "having_literal",
        "SELECT g, count(*) AS n FROM (VALUES 'a','a','b') t(g) GROUP BY g HAVING count(*) > 1",
        [("a", 2)],
    ),
    (
        "cube_literal",
        "SELECT g, count(*) AS n FROM (VALUES 'a','b') t(g) GROUP BY CUBE(g)",
        [(None, 2), ("a", 1), ("b", 1)],
    ),
]


def _canon_row(row):
    return tuple(list(v) if isinstance(v, (list, tuple)) else v for v in row)


def _sort_key(row):
    # None-safe, type-mixed sort for multiset comparison
    return tuple((v is None, str(type(v)), str(v)) for v in row)


@pytest.mark.parametrize("name,sql,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden(engine, name, sql, expected):
    got = sorted(
        (_canon_row(tuple(r)) for r in engine.sql(sql).collect()), key=_sort_key
    )
    want = sorted((_canon_row(r) for r in expected), key=_sort_key)
    assert got == want, f"{name}: got {got}, want {want}"


def test_golden_date_format_pattern(engine):
    got = engine.sql(
        "SELECT date_format(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%d %H:%i') AS s,"
        " date_parse('2024/03/05', '%Y/%m/%d') AS ts"
    ).collect()[0]
    import datetime

    assert got.s == "2024-03-05 07:08"
    assert got.ts == datetime.datetime(2024, 3, 5, 0, 0)


def test_golden_ignore_nulls_window(engine):
    rows = engine.sql(
        """
        SELECT x, last_value(v) IGNORE NULLS OVER
          (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM (VALUES (1, 'a'), (2, CAST(NULL AS STRING)), (3, 'c'), (4, CAST(NULL AS STRING))) t(x, v)
        """
    ).collect()
    assert [(r.x, r.filled) for r in sorted(rows)] == [
        (1, "a"), (2, "a"), (3, "c"), (4, "c"),
    ]


def test_golden_lambda_variants(engine):
    # comparator-lambda array_sort (ArraySortComparatorFunction),
    # zip_with, map_zip_with, 4-arg reduce/aggregate with finisher
    row = engine.sql(
        """
        SELECT
          array_sort(array(3, 1, 2), (x, y) -> CASE WHEN x < y THEN 1 WHEN x > y THEN -1 ELSE 0 END) AS desc_sorted,
          zip_with(array(1, 2), array(10, 20), (a, b) -> a + b) AS zipped,
          map_zip_with(map('a', 1), map('a', 10), (k, v1, v2) -> v1 + v2) AS mz,
          aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x, acc -> acc * 10) AS reduced,
          flatten(array(array(1), array(2, 3))) AS flat,
          sequence(1, 4) AS seq
        """
    ).collect()[0]
    assert row.desc_sorted == [3, 2, 1]
    assert row.zipped == [11, 22]
    assert row.mz == {"a": 11}
    assert row.reduced == 60
    assert row.flat == [1, 2, 3]
    assert row.seq == [1, 2, 3, 4]


def test_golden_show_schemas(engine):
    rows = engine.sql("SHOW SCHEMAS").collect()
    assert any(r[0] == "default" for r in rows)


def test_golden_element_at_null_semantics(engine):
    row = engine.sql(
        "SELECT element_at(map('a', 1), 'zz') AS missing_key,"
        " element_at(array(1, 2), 99) AS oob,"
        " element_at(array(1, 2), 2) AS ok,"
        " element_at(array(1, 2), -1) AS neg"
    ).collect()[0]
    assert (row.missing_key, row.oob, row.ok, row.neg) == (None, None, 2, 2)


def test_golden_repeat_array(engine):
    assert engine.sql("SELECT repeat(7, 3) AS a").collect()[0].a == [7, 7, 7]


def test_golden_intersect_all(engine):
    got = sorted(
        r.x for r in engine.sql(
            "SELECT * FROM (VALUES 1, 2, 2, 3) t(x) INTERSECT ALL "
            "SELECT * FROM (VALUES 2, 2, 4) u(y)"
        ).collect()
    )
    assert got == [2, 2]


def test_golden_map_hofs(engine):
    row = engine.sql(
        """
        SELECT
          map_filter(map('a', 1, 'b', 5), (k, v) -> v > 1) AS mf,
          transform_values(map('a', 1), (k, v) -> v * 10) AS tv,
          transform_keys(map('a', 1), (k, v) -> upper(k)) AS tk,
          map_concat(map('a', 1), map('b', 2)) AS mc,
          cardinality(map('x', 1, 'y', 2)) AS n
        """
    ).collect()[0]
    assert row.mf == {"b": 5}
    assert row.tv == {"a": 10}
    assert row.tk == {"A": 1}
    assert row.mc == {"a": 1, "b": 2}
    assert row.n == 2
