"""Relational-core operator coverage (SURVEY.md §2.1/§2.2, M1).

One query per operator family the reference implements, mirroring the themes
of presto-tests/.../AbstractTestQueries.java (500 tests) and the golden
corpus presto-product-tests/.../sql-tests/testcases/ (set_operation,
aggregate, …). Each entry exercises the Spark primitive the SURVEY maps the
Presto operator to.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import q
from ._util import dec, dsum, t

# --- outer joins (LookupJoinOperator fullOuterJoin/probeOuterJoin,
#     reference operator/LookupJoinOperators.java:45-60) -------------------


@q(
    "join_full_outer",
    extended=True,
    tags=("join",),
    oracle="""
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name, o.n_orders
FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 50) c
FULL OUTER JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders WHERE o_custkey < 100 GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""",
)
def join_full_outer(spark, sf_dir):
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select("c_custkey", "c_name")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_name", "n_orders"
    )


@q(
    "join_right_outer",
    extended=True,
    tags=("join",),
    oracle="""
SELECT s_suppkey, s_name, COUNT(l_orderkey) AS n_items
FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) l
RIGHT OUTER JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
""",
)
def join_right_outer(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    s = t(spark, sf_dir, "supplier")
    return (
        l.join(s, l.l_suppkey == s.s_suppkey, "right_outer")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


# --- cross/theta join (NestedLoopJoinOperator, operator/NestedLoopJoinOperator.java:36)


@q(
    "join_cross_theta",
    extended=True,
    tags=("join",),
    oracle="""
SELECT r_name, COUNT(*) AS n
FROM region CROSS JOIN nation
WHERE n_regionkey <> r_regionkey
GROUP BY r_name
""",
)
def join_cross_theta(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- set operations (SetOperationNode: UnionNode/IntersectNode/ExceptNode;
#     rewrite ImplementIntersectAndExceptAsUnion.java:105) -----------------


@q(
    "setop_union_all",
    extended=True,
    tags=("setop",),
    oracle="""
SELECT k, src FROM (
  SELECT c_nationkey AS k, 'cust' AS src FROM customer WHERE c_acctbal > 9900
  UNION ALL
  SELECT s_nationkey AS k, 'supp' AS src FROM supplier WHERE s_acctbal > 9000
) u
""",
)
def setop_union_all(spark, sf_dir):
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("k"), F.lit("cust").alias("src"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("k"), F.lit("supp").alias("src"))
    )
    return c.unionAll(s)


@q(
    "setop_intersect_except",
    extended=True,
    tags=("setop",),
    oracle="""
SELECT k, 'both' AS tag FROM (
  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
  INTERSECT
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
) a
UNION ALL
SELECT k, 'cust_only' AS tag FROM (
  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
  EXCEPT
  SELECT s_nationkey FROM supplier
) b
""",
)
def setop_intersect_except(spark, sf_dir):
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("k"))
    )
    supp_hi = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("k"))
    )
    supp_all = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    both = cust.intersect(supp_hi).select("k", F.lit("both").alias("tag"))
    # subtract == EXCEPT DISTINCT (Presto EXCEPT; exceptAll would be EXCEPT ALL)
    cust_only = cust.subtract(supp_all).select("k", F.lit("cust_only").alias("tag"))
    return both.unionAll(cust_only)


# --- grouping sets / rollup / cube (GroupIdOperator :32, GroupIdNode) ------


@q(
    "agg_grouping_sets",
    extended=True,
    tags=("agg",),
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n, GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
""",
)
def agg_grouping_sets(spark, sf_dir):
    from .tpch import spark_sql_tables

    spark_sql_tables(spark, sf_dir)
    return spark.sql(
        """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n, CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
"""
    )


@q(
    "agg_cube",
    extended=True,
    tags=("agg",),
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dec("o_totalprice", 14, 4), "total"),
    )


@q(
    "agg_rollup",
    extended=True,
    tags=("agg",),
    oracle="""
SELECT n_regionkey, n_nationkey, COUNT(*) AS n
FROM nation GROUP BY ROLLUP (n_regionkey, n_nationkey)
""",
)
def agg_rollup(spark, sf_dir):
    return (
        t(spark, sf_dir, "nation")
        .rollup("n_regionkey", "n_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- multiple DISTINCT aggregates (MarkDistinctOperator :35) ---------------


@q(
    "agg_multi_distinct",
    extended=True,
    tags=("agg", "distinct"),
    oracle="""
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS nd_part,
  COUNT(DISTINCT l_suppkey) AS nd_supp,
  COUNT(DISTINCT l_orderkey) AS nd_order,
  COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_multi_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_part"),
            F.countDistinct("l_suppkey").alias("nd_supp"),
            F.countDistinct("l_orderkey").alias("nd_order"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- FILTER clause (ImplementFilteredAggregations.java) --------------------


@q(
    "agg_filter_clause",
    extended=True,
    tags=("agg",),
    oracle="""
SELECT o_orderstatus,
  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
FROM orders GROUP BY o_orderstatus
""",
)
def agg_filter_clause(spark, sf_dir):
    from .tpch import spark_sql_tables

    spark_sql_tables(spark, sf_dir)
    return spark.sql(
        """
SELECT o_orderstatus,
  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
FROM orders GROUP BY o_orderstatus
"""
    )


# --- min_by/max_by/arbitrary-class aggregates (TypedKeyValueHeap) ----------


@q(
    "agg_min_max_by",
    extended=True,
    tags=("agg",),
    oracle="""
SELECT l_returnflag,
  MIN_BY(l_shipdate, CAST(epoch(l_shipdate) AS BIGINT) * 100000 + l_orderkey * 10 + l_linenumber) AS first_line_ship,
  MAX_BY(l_shipdate, CAST(epoch(l_shipdate) AS BIGINT) * 100000 + l_orderkey * 10 + l_linenumber) AS last_line_ship,
  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
FROM (SELECT * FROM lineitem WHERE l_orderkey < 1000) l
GROUP BY l_returnflag
""",
    doc="min_by/max_by: the testdata has duplicate (orderkey, linenumber) "
    "pairs, so the ordering key embeds the shipdate — any remaining key tie "
    "implies an identical returned value, keeping both engines deterministic.",
)
def agg_min_max_by(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    key = (
        F.unix_timestamp("l_shipdate") * 100000
        + F.col("l_orderkey") * 10
        + F.col("l_linenumber")
    )
    return l.groupBy("l_returnflag").agg(
        F.min_by("l_shipdate", key).alias("first_line_ship"),
        F.max_by("l_shipdate", key).alias("last_line_ship"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


# --- DISTINCT + LIMIT (DistinctLimitOperator :37) --------------------------


@q(
    "distinct_limit",
    extended=True,
    tags=("distinct", "limit"),
    oracle="""
SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority LIMIT 3
""",
)
def distinct_limit(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .orderBy("o_orderpriority")
        .limit(3)
    )


# --- ORDER BY null handling: Presto default = NULLS LAST for ASC
#     (Spark default is NULLS FIRST → explicit shim; SURVEY §7 watch-list #1)


@q(
    "orderby_nulls_last",
    extended=True,
    tags=("sort",),
    oracle="""
SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS pri
FROM orders WHERE o_orderkey < 500
ORDER BY pri ASC NULLS LAST, o_orderkey
LIMIT 50
""",
)
def orderby_nulls_last(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pri"),
        )
        .orderBy(F.col("pri").asc_nulls_last(), "o_orderkey")
        .limit(50)
    )


# --- VALUES (ValuesOperator :27) -------------------------------------------


@q(
    "values_inline",
    extended=True,
    tags=("values",),
    oracle="""
SELECT t.id, t.name, r.r_name
FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, NULL)) t(id, name)
JOIN region r ON r.r_regionkey = t.id
""",
)
def values_inline(spark, sf_dir):
    vals = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, None)], "id int, name string"
    )
    r = t(spark, sf_dir, "region")
    return vals.join(F.broadcast(r), vals.id == r.r_regionkey).select(
        "id", "name", "r_name"
    )


# --- deterministic sampling (SampleNode; TABLESAMPLE BERNOULLI is
#     rand()-based → this is the hash-based reproducible variant) -----------


@q(
    "sample_hash_deterministic",
    extended=True,
    tags=("sample",),
    oracle="""
SELECT COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
FROM orders
WHERE ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) % 10 < 3
""",
)
def sample_hash_deterministic(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    bucket = F.ascii(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)) % 10
    return o.filter(bucket < 3).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dec("o_totalprice", 14, 4), "total"),
    )


# --- scalar subquery + quantified comparison (EnforceSingleRowOperator :29;
#     Presto rewrites > ALL via TransformQuantifiedComparisonApplyToLateralJoin)


@q(
    "subquery_scalar_quantified",
    extended=True,
    tags=("subquery",),
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > (SELECT MAX(p_retailprice) * 0.99 FROM part WHERE p_brand = 'Brand#4')
""",
)
def subquery_scalar_quantified(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    mx = (
        p.filter(F.col("p_brand") == "Brand#4")
        .agg((F.max("p_retailprice") * 0.99).alias("thr"))
    )
    return (
        p.join(F.broadcast(mx))
        .filter(F.col("p_retailprice") > F.col("thr"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


# --- correlated LATERAL (LateralJoinNode, sql/planner/plan/LateralJoinNode.java:37)


@q(
    "lateral_correlated",
    extended=True,
    tags=("subquery", "lateral"),
    oracle="""
SELECT o.o_orderkey, t.max_ship, t.n_items
FROM (SELECT * FROM orders WHERE o_orderkey < 200) o,
LATERAL (
  SELECT MAX(l_shipdate) AS max_ship, COUNT(*) AS n_items
  FROM lineitem WHERE l_orderkey = o.o_orderkey
) t
""",
)
def lateral_correlated(spark, sf_dir):
    from .tpch import spark_sql_tables

    spark_sql_tables(spark, sf_dir)
    return spark.sql(
        """
SELECT o.o_orderkey, t.max_ship, t.n_items
FROM (SELECT * FROM orders WHERE o_orderkey < 200) o,
LATERAL (
  SELECT MAX(l_shipdate) AS max_ship, COUNT(*) AS n_items
  FROM lineitem WHERE l_orderkey = o.o_orderkey
) t
"""
    )


# --- UNNEST (UnnestOperator :35, WITH ORDINALITY :47) ----------------------


@q(
    "unnest_ordinality",
    extended=True,
    tags=("unnest",),
    oracle="""
SELECT doc_id, tok, CAST(ord AS INT) AS ord
FROM (
  SELECT doc_id, unnest(split(text, ' ')) AS tok,
         generate_subscripts(split(text, ' '), 1) AS ord
  FROM documents WHERE doc_id < 20
) u
WHERE ord <= 5
""",
)
def unnest_ordinality(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
        )
        .select("doc_id", "tok", (F.col("pos") + 1).cast("int").alias("ord"))
        .filter(F.col("ord") <= 5)
    )


# --- IN / NOT IN subqueries (SemiJoinNode + SetBuilderOperator :36) --------


@q(
    "semijoin_in_notin",
    tags=("semijoin", "antijoin"),
    oracle="""
SELECT n_name,
  (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust
FROM nation
WHERE n_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 9500)
  AND n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -990)
""",
)
def semijoin_in_notin(spark, sf_dir):
    from .tpch import spark_sql_tables

    spark_sql_tables(spark, sf_dir)
    return spark.sql(
        """
SELECT n_name,
  (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust
FROM nation
WHERE n_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 9500)
  AND n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -990)
"""
    )


@q(
    "agg_empty_grouping_global",
    extended=True,
    tags=("agg", "groupid"),
    doc="Empty-input grouping sets emit the global-aggregation rows "
    "(AbstractTestAggregations.java:953 testGroupingSetsWithGlobal"
    "AggregationNoInput family): the engine appends NOT-EXISTS-gated "
    "UNION ALL arms (rewrite._rewrite_empty_grouping_global) — one per "
    "empty set, two here for the repeated-sets form.",
    oracle="""
SELECT l_linenumber, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS s
FROM lineitem WHERE l_quantity < 0
GROUP BY GROUPING SETS ((l_linenumber, l_suppkey), (l_suppkey), (), ())
""",
)
def agg_empty_grouping_global(spark, sf_dir):
    from ..engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
SELECT l_linenumber, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS s
FROM lineitem WHERE l_quantity < 0
GROUP BY GROUPING SETS ((l_linenumber, l_suppkey), (l_suppkey), (), ())
"""
    )
