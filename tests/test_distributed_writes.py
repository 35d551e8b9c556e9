"""Write/DDL/view battery ported from the reference's
AbstractTestDistributedQueries
(presto-tests/src/main/java/com/facebook/presto/tests/
AbstractTestDistributedQueries.java) — CTAS, INSERT, DELETE, ALTER
TABLE column surgery, views, and rename round-trips, re-expressed as
step scenarios over the H2-convention views of the driver testdata
(unprefixed columns, same convention as tests/h2_corpus.py).

Step forms:
  ("u", sql)              execute through Engine.sql, no check
  ("uc", sql, expect)     execute; affected-row count must equal
                          `expect` (int, or DuckDB scalar oracle SQL);
                          counted from rows_deleted for DELETE, from
                          the target table's count delta otherwise
  ("q", sql, oracle)      engine rows vs DuckDB rows (order-insensitive)
  ("qe", sql, rows)       engine rows vs literal rows
  ("fails", sql)          statement must raise
  ("cols", table, names)  column-name check (assertTableColumnNames)
  ("exists", table, bool) catalog existence check

Deviations from the reference battery are listed in SKIPS with reasons.
"""

from __future__ import annotations

import re

import pytest

import _golden_util as _gu

# steps cite the reference test method they port
SCENARIOS: dict[str, list[tuple]] = {
    # AbstractTestDistributedQueries.java:134 testCreateTable
    "create_table": [
        ("u", "CREATE TABLE test_create (a bigint, b double, c varchar)"),
        ("exists", "test_create", True),
        ("cols", "test_create", ["a", "b", "c"]),
        ("u", "DROP TABLE test_create"),
        ("exists", "test_create", False),
        ("fails", "CREATE TABLE test_create2 (a bad_type)"),
        ("u", "CREATE TABLE test_create_table_if_not_exists"
              " (a bigint, b varchar, c double)"),
        ("exists", "test_create_table_if_not_exists", True),
        ("cols", "test_create_table_if_not_exists", ["a", "b", "c"]),
        ("u", "CREATE TABLE IF NOT EXISTS test_create_table_if_not_exists"
              " (d bigint, e varchar)"),
        ("cols", "test_create_table_if_not_exists", ["a", "b", "c"]),
        ("u", "DROP TABLE test_create_table_if_not_exists"),
        ("exists", "test_create_table_if_not_exists", False),
    ],
    # :174 testCreateTableAsSelect (assertCreateTableAsSelect :317)
    "ctas_simple": [
        ("uc", "CREATE TABLE IF NOT EXISTS test_ctas AS"
               " SELECT name, regionkey FROM nation",
         "SELECT count(*) FROM nation"),
        ("cols", "test_ctas", ["name", "regionkey"]),
        ("u", "DROP TABLE test_ctas"),
    ],
    "ctas_select": [
        ("uc", "CREATE TABLE test_select AS"
               " SELECT orderdate, orderkey, totalprice FROM orders",
         "SELECT count(*) FROM orders"),
        ("q", "SELECT * FROM test_select",
         "SELECT orderdate, orderkey, totalprice FROM orders"),
        ("u", "DROP TABLE test_select"),
    ],
    "ctas_group": [
        ("uc", "CREATE TABLE test_group AS SELECT orderstatus,"
               " sum(totalprice) x FROM orders GROUP BY orderstatus",
         "SELECT count(DISTINCT orderstatus) FROM orders"),
        ("q", "SELECT * FROM test_group",
         "SELECT orderstatus, sum(totalprice) x FROM orders"
         " GROUP BY orderstatus"),
        ("u", "DROP TABLE test_group"),
    ],
    "ctas_join": [
        ("uc", "CREATE TABLE test_join AS SELECT count(*) x FROM lineitem"
               " JOIN orders ON lineitem.orderkey = orders.orderkey",
         1),
        ("q", "SELECT * FROM test_join",
         "SELECT count(*) x FROM lineitem JOIN orders"
         " ON lineitem.orderkey = orders.orderkey"),
        ("u", "DROP TABLE test_join"),
    ],
    "ctas_limit": [
        ("uc", "CREATE TABLE test_limit AS"
               " SELECT orderkey FROM orders ORDER BY orderkey LIMIT 10",
         10),
        ("q", "SELECT * FROM test_limit",
         "SELECT orderkey FROM orders ORDER BY orderkey LIMIT 10"),
        ("u", "DROP TABLE test_limit"),
    ],
    "ctas_unicode": [
        ("uc", "CREATE TABLE test_unicode AS SELECT '☃' unicode", 1),
        ("qe", "SELECT * FROM test_unicode", [("☃",)]),
        ("u", "DROP TABLE test_unicode"),
    ],
    "ctas_with_data": [
        ("uc", "CREATE TABLE test_with_data AS"
               " SELECT * FROM orders WITH DATA",
         "SELECT count(*) FROM orders"),
        ("q", "SELECT * FROM test_with_data", "SELECT * FROM orders"),
        ("u", "DROP TABLE test_with_data"),
    ],
    "ctas_with_no_data": [
        ("uc", "CREATE TABLE test_with_no_data AS"
               " SELECT * FROM orders WITH NO DATA",
         0),
        ("q", "SELECT * FROM test_with_no_data",
         "SELECT * FROM orders LIMIT 0"),
        ("u", "DROP TABLE test_with_no_data"),
    ],
    # :223 CTAS UNION ALL (PushTableWriteThroughUnion exercise)
    "ctas_union_all": [
        ("uc", "CREATE TABLE test_union_all AS"
               " SELECT orderdate, orderkey, totalprice FROM orders"
               " WHERE orderkey % 2 = 0 UNION ALL"
               " SELECT orderdate, orderkey, totalprice FROM orders"
               " WHERE orderkey % 2 = 1",
         "SELECT count(*) FROM orders"),
        ("q", "SELECT * FROM test_union_all",
         "SELECT orderdate, orderkey, totalprice FROM orders"),
        ("u", "DROP TABLE test_union_all"),
        ("uc", "CREATE TABLE test_union_all AS"
               " SELECT CAST(orderdate AS DATE) orderdate, orderkey,"
               " totalprice FROM orders UNION ALL"
               " SELECT DATE '2000-01-01', 1234567890, 1.23",
         "SELECT count(*) + 1 FROM orders"),
        ("q", "SELECT * FROM test_union_all",
         "SELECT CAST(orderdate AS DATE) orderdate, orderkey, totalprice"
         " FROM orders UNION ALL SELECT DATE '2000-01-01', 1234567890,"
         " 1.23"),
        ("u", "DROP TABLE test_union_all"),
    ],
    # :254 testExplainAnalyze CTAS arm
    "explain_analyze_ctas": [
        ("u", "EXPLAIN ANALYZE CREATE TABLE analyze_test AS"
              " SELECT orderstatus FROM orders"),
        ("q", "SELECT * FROM analyze_test",
         "SELECT orderstatus FROM orders"),
        ("u", "DROP TABLE analyze_test"),
    ],
    # :337 testRenameTable
    "rename_table": [
        ("uc", "CREATE TABLE test_rename AS SELECT 123 x", 1),
        ("u", "ALTER TABLE test_rename RENAME TO test_rename_new"),
        ("qe", "SELECT x FROM test_rename_new", [(123,)]),
        ("exists", "test_rename", False),
        ("u", "ALTER TABLE test_rename_new RENAME TO TEST_RENAME"),
        ("qe", "SELECT x FROM test_rename", [(123,)]),
        ("exists", "test_rename_new", False),
        ("u", "DROP TABLE test_rename"),
        ("exists", "test_rename", False),
    ],
    # :357 testRenameColumn
    "rename_column": [
        ("uc", "CREATE TABLE test_rename_column AS SELECT 123 x", 1),
        ("u", "ALTER TABLE test_rename_column RENAME COLUMN x TO y"),
        ("qe", "SELECT y FROM test_rename_column", [(123,)]),
        ("u", "ALTER TABLE test_rename_column RENAME COLUMN y TO Z"),
        ("qe", "SELECT z FROM test_rename_column", [(123,)]),
        ("u", "DROP TABLE test_rename_column"),
    ],
    # :374 testDropColumn
    "drop_column": [
        ("uc", "CREATE TABLE test_drop_column AS SELECT 123 x, 111 a", 1),
        ("u", "ALTER TABLE test_drop_column DROP COLUMN x"),
        ("fails", "SELECT x FROM test_drop_column"),
        ("fails", "ALTER TABLE test_drop_column DROP COLUMN a"),
        ("u", "DROP TABLE test_drop_column"),
    ],
    # :385 testAddColumn
    "add_column": [
        ("uc", "CREATE TABLE test_add_column AS SELECT 123 x", 1),
        ("uc", "CREATE TABLE test_add_column_a AS SELECT 234 x, 111 a", 1),
        ("uc", "CREATE TABLE test_add_column_ab AS"
               " SELECT 345 x, 222 a, 33.3E0 b", 1),
        ("fails", "ALTER TABLE test_add_column ADD COLUMN x bigint"),
        ("fails", "ALTER TABLE test_add_column ADD COLUMN X bigint"),
        ("fails", "ALTER TABLE test_add_column ADD COLUMN q bad_type"),
        ("u", "ALTER TABLE test_add_column ADD COLUMN a bigint"),
        ("uc", "INSERT INTO test_add_column"
               " SELECT * FROM test_add_column_a", 1),
        ("qe", "SELECT x, a FROM test_add_column ORDER BY x",
         [(123, None), (234, 111)]),
        ("u", "ALTER TABLE test_add_column ADD COLUMN b double"),
        ("uc", "INSERT INTO test_add_column"
               " SELECT * FROM test_add_column_ab", 1),
        ("qe", "SELECT x, a, b FROM test_add_column ORDER BY x",
         [(123, None, None), (234, 111, None), (345, 222, 33.3)]),
        ("u", "DROP TABLE test_add_column"),
        ("u", "DROP TABLE test_add_column_a"),
        ("u", "DROP TABLE test_add_column_ab"),
        ("exists", "test_add_column", False),
    ],
    # :425 testInsert
    "insert": [
        ("uc", "CREATE TABLE test_insert AS SELECT orderdate, orderkey,"
               " totalprice FROM orders WITH NO DATA", 0),
        ("qe", "SELECT count(*) FROM test_insert", [(0,)]),
        ("uc", "INSERT INTO test_insert SELECT orderdate, orderkey,"
               " totalprice FROM orders",
         "SELECT count(*) FROM orders"),
        ("q", "SELECT * FROM test_insert",
         "SELECT orderdate, orderkey, totalprice FROM orders"),
        ("uc", "INSERT INTO test_insert (orderkey) VALUES (-1)", 1),
        ("uc", "INSERT INTO test_insert (orderkey) VALUES (null)", 1),
        ("uc", "INSERT INTO test_insert (orderdate) VALUES"
               " (DATE '2001-01-01')", 1),
        ("uc", "INSERT INTO test_insert (orderkey, orderdate) VALUES"
               " (-2, DATE '2001-01-02')", 1),
        ("uc", "INSERT INTO test_insert (orderdate, orderkey) VALUES"
               " (DATE '2001-01-03', -3)", 1),
        ("uc", "INSERT INTO test_insert (totalprice) VALUES (1234)", 1),
        ("q", "SELECT * FROM test_insert",
         "SELECT orderdate, orderkey, totalprice FROM orders"
         " UNION ALL SELECT null, -1, null"
         " UNION ALL SELECT null, null, null"
         " UNION ALL SELECT DATE '2001-01-01', null, null"
         " UNION ALL SELECT DATE '2001-01-02', -2, null"
         " UNION ALL SELECT DATE '2001-01-03', -3, null"
         " UNION ALL SELECT null, null, 1234"),
        # UNION produces columns in the opposite order of the schema
        ("uc", "INSERT INTO test_insert (orderkey, orderdate, totalprice)"
               " SELECT orderkey, orderdate, totalprice FROM orders"
               " UNION ALL"
               " SELECT orderkey, orderdate, totalprice FROM orders",
         "SELECT 2 * count(*) FROM orders"),
        ("u", "DROP TABLE test_insert"),
        ("u", "CREATE TABLE test_insert (a ARRAY<DOUBLE>, b ARRAY<BIGINT>)"),
        ("uc", "INSERT INTO test_insert (a) VALUES (ARRAY[null])", 1),
        ("uc", "INSERT INTO test_insert (a) VALUES (ARRAY[1234])", 1),
        ("qe", "SELECT a[1] FROM test_insert", [(None,), (1234.0,)]),
        ("u", "DROP TABLE test_insert"),
    ],
    # :474 testDelete — halves, successive ranges, constant predicate
    "delete_basic": [
        ("uc", "CREATE TABLE test_delete AS SELECT * FROM orders",
         "SELECT count(*) FROM orders"),
        ("uc", "DELETE FROM test_delete WHERE orderkey % 2 = 0",
         "SELECT count(*) FROM orders WHERE orderkey % 2 = 0"),
        ("q", "SELECT * FROM test_delete",
         "SELECT * FROM orders WHERE orderkey % 2 <> 0"),
        ("uc", "DELETE FROM test_delete",
         "SELECT count(*) FROM orders WHERE orderkey % 2 <> 0"),
        ("q", "SELECT * FROM test_delete", "SELECT * FROM orders LIMIT 0"),
        ("u", "DROP TABLE test_delete"),
    ],
    "delete_successive": [
        ("uc", "CREATE TABLE test_delete AS SELECT * FROM orders",
         "SELECT count(*) FROM orders"),
        ("uc", "DELETE FROM test_delete WHERE custkey <= 100",
         "SELECT count(*) FROM orders WHERE custkey <= 100"),
        ("q", "SELECT * FROM test_delete",
         "SELECT * FROM orders WHERE custkey > 100"),
        ("uc", "DELETE FROM test_delete WHERE custkey <= 300",
         "SELECT count(*) FROM orders WHERE custkey > 100"
         " AND custkey <= 300"),
        ("q", "SELECT * FROM test_delete",
         "SELECT * FROM orders WHERE custkey > 300"),
        ("u", "DROP TABLE test_delete"),
    ],
    "delete_constant_and_empty": [
        ("uc", "CREATE TABLE test_delete AS SELECT * FROM orders",
         "SELECT count(*) FROM orders"),
        ("uc", "DELETE FROM test_delete WHERE orderstatus = 'O'",
         "SELECT count(*) FROM orders WHERE orderstatus = 'O'"),
        ("q", "SELECT * FROM test_delete",
         "SELECT * FROM orders WHERE orderstatus <> 'O'"),
        ("u", "DROP TABLE test_delete"),
        ("uc", "CREATE TABLE test_delete AS SELECT * FROM orders",
         "SELECT count(*) FROM orders"),
        ("uc", "DELETE FROM test_delete WHERE rand() < 0", 0),
        ("uc", "DELETE FROM test_delete WHERE orderkey < 0", 0),
        ("uc", "DELETE FROM test_delete WHERE orderkey > 5"
               " AND orderkey < 4", 0),
        ("u", "DROP TABLE test_delete"),
    ],
    "delete_subquery": [
        ("uc", "CREATE TABLE test_delete AS SELECT * FROM lineitem",
         "SELECT count(*) FROM lineitem"),
        ("uc", "DELETE FROM test_delete WHERE orderkey IN"
               " (SELECT orderkey FROM orders WHERE orderstatus = 'F')",
         "SELECT count(*) FROM lineitem WHERE orderkey IN"
         " (SELECT orderkey FROM orders WHERE orderstatus = 'F')"),
        ("q", "SELECT * FROM test_delete",
         "SELECT * FROM lineitem WHERE orderkey IN"
         " (SELECT orderkey FROM orders WHERE orderstatus <> 'F')"),
        ("u", "DROP TABLE test_delete"),
    ],
    "delete_multi_semijoin": [
        ("uc", "CREATE TABLE test_delete AS SELECT * FROM lineitem",
         "SELECT count(*) FROM lineitem"),
        ("uc", "DELETE FROM test_delete WHERE orderkey IN"
               " (SELECT orderkey FROM orders WHERE orderstatus = 'F')"
               " AND orderkey IN"
               " (SELECT orderkey FROM orders WHERE custkey % 5 = 0)",
         "SELECT count(*) FROM lineitem WHERE orderkey IN"
         " (SELECT orderkey FROM orders WHERE orderstatus = 'F')"
         " AND orderkey IN"
         " (SELECT orderkey FROM orders WHERE custkey % 5 = 0)"),
        ("q", "SELECT * FROM test_delete",
         "SELECT * FROM lineitem WHERE orderkey IN"
         " (SELECT orderkey FROM orders WHERE orderstatus <> 'F')"
         " OR orderkey IN"
         " (SELECT orderkey FROM orders WHERE custkey % 5 <> 0)"),
        ("u", "DROP TABLE test_delete"),
    ],
    "delete_scalar_exists": [
        ("uc", "CREATE TABLE test_delete AS SELECT * FROM orders",
         "SELECT count(*) FROM orders"),
        ("uc", "DELETE FROM test_delete WHERE orderkey ="
               " (SELECT orderkey FROM orders ORDER BY orderkey LIMIT 1)",
         1),
        ("uc", "DELETE FROM test_delete WHERE orderkey ="
               " (SELECT orderkey FROM orders WHERE false)", 0),
        ("uc", "DELETE FROM test_delete WHERE EXISTS"
               "(SELECT 1 WHERE false)", 0),
        ("uc", "DELETE FROM test_delete WHERE EXISTS(SELECT 1)",
         "SELECT count(*) - 1 FROM orders"),
        ("u", "DROP TABLE test_delete"),
    ],
    # :600 testDropTableIfExists
    "drop_table_if_exists": [
        ("exists", "test_drop_if_exists", False),
        ("u", "DROP TABLE IF EXISTS test_drop_if_exists"),
        ("exists", "test_drop_if_exists", False),
    ],
    # :608 testView
    "view": [
        ("u", "CREATE VIEW test_view AS SELECT 123 x"),
        ("u", "CREATE OR REPLACE VIEW test_view AS SELECT orderkey,"
              " orderstatus, totalprice / 2 half FROM orders"),
        ("q", "SELECT * FROM test_view",
         "SELECT orderkey, orderstatus, totalprice / 2 half FROM orders"),
        ("q", "SELECT * FROM test_view a JOIN test_view b"
              " on a.orderkey = b.orderkey",
         "SELECT * FROM (SELECT orderkey, orderstatus, totalprice / 2 half"
         " FROM orders) a JOIN (SELECT orderkey, orderstatus,"
         " totalprice / 2 half FROM orders) b ON a.orderkey = b.orderkey"),
        # the view must not see a shadowing WITH alias from the outer query
        ("q", "WITH orders AS (SELECT * FROM orders LIMIT 0)"
              " SELECT * FROM test_view",
         "SELECT orderkey, orderstatus, totalprice / 2 half FROM orders"),
        ("u", "DROP VIEW test_view"),
    ],
    # :632 testViewCaseSensitivity
    "view_case_sensitivity": [
        ("u", "CREATE VIEW test_view_uppercase AS SELECT X FROM"
              " (SELECT 123 X)"),
        ("u", "CREATE VIEW test_view_mixedcase AS SELECT XyZ FROM"
              " (SELECT 456 XyZ)"),
        ("qe", "SELECT * FROM test_view_uppercase", [(123,)]),
        ("qe", "SELECT * FROM test_view_mixedcase", [(456,)]),
        ("u", "DROP VIEW test_view_uppercase"),
        ("u", "DROP VIEW test_view_mixedcase"),
    ],
    # :643 testCompatibleTypeChangeForView — view re-resolves the table
    "view_type_change": [
        ("uc", "CREATE TABLE test_table_1 AS SELECT 'abcdefg' a", 1),
        ("u", "CREATE VIEW test_view_1 AS SELECT a FROM test_table_1"),
        ("qe", "SELECT * FROM test_view_1", [("abcdefg",)]),
        ("u", "DROP TABLE test_table_1"),
        ("uc", "CREATE TABLE test_table_1 AS SELECT 'abc' a", 1),
        ("qe", "SELECT * FROM test_view_1", [("abc",)]),
        ("u", "DROP VIEW test_view_1"),
        ("u", "DROP TABLE test_table_1"),
    ],
    # :663 testCompatibleTypeChangeForView2
    "view_type_change_2": [
        ("uc", "CREATE TABLE test_table_2 AS SELECT BIGINT '1' v", 1),
        ("u", "CREATE VIEW test_view_2 AS SELECT * FROM test_table_2"),
        ("qe", "SELECT * FROM test_view_2", [(1,)]),
        ("u", "DROP TABLE test_table_2"),
        ("uc", "CREATE TABLE test_table_2 AS SELECT INTEGER '1' v", 1),
        ("qe", "SELECT * FROM test_view_2 WHERE v = 1", [(1,)]),
        ("u", "DROP VIEW test_view_2"),
        ("u", "DROP TABLE test_table_2"),
    ],
    # :823 testLargeQuerySuccess
    "large_query": [
        ("qe", "SELECT " + " AND ".join(["1 = 1"] * 500), [(True,)]),
    ],
    # :836 testTableSampleSystemBoundaryValues
    "tablesample_boundaries": [
        ("q", "SELECT orderkey FROM orders TABLESAMPLE SYSTEM (100)",
         "SELECT orderkey FROM orders"),
        ("qe", "SELECT orderkey FROM orders TABLESAMPLE SYSTEM (0)", []),
    ],
    # :847 testSymbolAliasing
    "symbol_aliasing": [
        ("uc", "CREATE TABLE test_symbol_aliasing AS"
               " SELECT 1 foo_1, 2 foo_2_4", 1),
        ("qe", "SELECT foo_1, foo_2_4 FROM test_symbol_aliasing",
         [(1, 2)]),
        ("u", "DROP TABLE test_symbol_aliasing"),
    ],
}

# reference battery arms not portable here, each with the reason
SKIPS = {
    "testSetSession/testResetSession":
        "covered by tests/test_engine.py session-property mapping tests",
    "testCreateTable LIKE clause":
        "CREATE TABLE (LIKE t, extra cols) hybrid column list has no Spark"
        " equivalent",
    "testCreateTableAsSelect CTAS-over-existing-view arm":
        "fixture relations are temp views; CREATE TABLE IF NOT EXISTS"
        " nation would create a shadowed catalog table, not exercise the"
        " no-op path",
    "testCreateTableAsSelect redistribute_writes session property":
        "Spark decides write distribution via AQE, property is a no-op"
        " here; the UNION ALL CTAS itself is ported",
    "testExplainAnalyze SELECT/verbose arms":
        "covered by tests/test_engine.py EXPLAIN ANALYZE tests",
    "testExplainAnalyze INSERT/DELETE arms":
        "EXPLAIN ANALYZE wraps queries, not write statements, here",
    "testInsert mismatched-array-type failure arm":
        "Spark coerces ARRAY<DOUBLE> literals into ARRAY<BIGINT> columns"
        " instead of failing (documented coercion deviation)",
    "testDelete SemiJoin-null-handling arm":
        "IN-subquery NULL semantics deviation (Spark ExistenceJoin"
        " returns false where Presto yields NULL; README Known gaps)",
    "testDelete access-control arms":
        "reference AllowAllAccessControl is the modeled behavior; GRANT/"
        "REVOKE are no-ops",
    "testView qualified catalog.schema.view reference":
        "views are session temp views here (Spark forbids permanent views"
        " over temp-view relations); qualified lookup has no target",
    "testViewMetadata":
        "information_schema.views / SHOW CREATE VIEW not synthesized for"
        " temp views; tables/columns arms covered in test_engine.py",
    "testQueryLoggingCount/testWrittenStats":
        "coordinator QueryManager/QueryInfo APIs (use Spark UI/status"
        " store)",
    "testShowSchemasFromOther":
        "no tpch catalog plugin; SHOW SCHEMAS covered in test_engine.py",
    "testNonQueryAccessControl/testViewAccessControl":
        "access-control hooks not modeled (AllowAll)",
    "testJoinWithStatefulFilterFunction":
        "exercises a test-only stateful Java function",
    "testComplexCast":
        "INTERVAL values are not first-class storable columns here"
        " (documented type edge)",
}


@pytest.fixture(scope="module")
def dw(spark):
    """Engine over H2-convention (unprefixed) views + matching DuckDB."""
    from presto_ads_spark.engine import Engine
    from tests.conftest import SF_DIR

    sub = spark.newSession()
    _gu.register_h2_views(sub, SF_DIR)
    eng = Engine(sub, sf_dir=None)
    duck = _gu.duckdb_h2_connection(SF_DIR)
    return eng, duck


_TARGET_RE = re.compile(
    r"^\s*(?:CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?|INSERT\s+INTO\s+)"
    r"([\w.]+)",
    re.IGNORECASE,
)


def _table_exists(spark, name: str) -> bool:
    return any(
        t.name == name.lower() and t.tableType != "TEMPORARY"
        for t in spark.catalog.listTables()
    )


def _count(spark, name: str) -> int:
    return spark.table(name).count() if _table_exists(spark, name) else 0


def _run_scenario(eng, duck, steps):
    spark = eng.spark
    for step in steps:
        kind = step[0]
        if kind == "u":
            eng.sql(step[1])
        elif kind == "uc":
            sql, expect = step[1], step[2]
            if isinstance(expect, str):
                expect = duck.execute(expect).fetchone()[0]
            if re.match(r"^\s*DELETE\b", sql, re.IGNORECASE):
                got = eng.sql(sql).collect()[0][0]
            else:
                target = _TARGET_RE.match(sql).group(1)
                before = _count(spark, target)
                eng.sql(sql)
                got = _count(spark, target) - before
            assert got == expect, f"{sql[:90]}: affected {got} != {expect}"
        elif kind == "q":
            got = [tuple(r) for r in eng.sql(step[1]).collect()]
            want = [tuple(r) for r in duck.execute(
                _gu.duck_int_division(step[2])).fetchall()]
            diff = _gu.compare_pyrows(got, want)
            assert diff is None, f"{step[1][:90]}: {diff}"
        elif kind == "qe":
            got = [tuple(r) for r in eng.sql(step[1]).collect()]
            diff = _gu.compare_pyrows(got, step[2])
            assert diff is None, f"{step[1][:90]}: {diff}"
        elif kind == "fails":
            with pytest.raises(Exception):
                eng.sql(step[1]).collect()
        elif kind == "cols":
            assert spark.table(step[1]).columns == step[2]
        elif kind == "exists":
            assert _table_exists(spark, step[1]) is step[2]
        else:  # pragma: no cover
            raise AssertionError(f"unknown step kind {kind}")


def _cleanup(spark):
    for t in spark.catalog.listTables():
        if t.tableType != "TEMPORARY" and (
            t.name.startswith("test_") or t.name.startswith("analyze_")
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_distributed_writes(dw, name):
    eng, duck = dw
    try:
        _run_scenario(eng, duck, SCENARIOS[name])
    finally:
        _cleanup(eng.spark)


def test_distributed_writes_skips_documented():
    assert all(reason for reason in SKIPS.values())
