"""TPC-H-derived query suite, adapted to the driver's star schema.

Mirrors the reference's end-to-end strategy: Presto runs the TPC-H suite via
the tpch connector against an H2 oracle
(reference: presto-tests/.../AbstractTestQueries.java, H2QueryRunner.java:88;
benchmark set presto-benchto-benchmarks/.../sql/presto/tpch/). The driver's
schema has no ``partsupp`` and fewer columns (FIXTURES.md), so q2/q11/q16/q20
are out of scope and several queries are adapted; operator shapes (join
graphs, subquery forms, agg patterns) are preserved.

All double aggregations follow the determinism rules in queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import q
from ..llm.hints import gated_broadcast
from ._util import REVENUE_SQL, dec, dsum, revenue_expr, t, t_spread, ts

# ---------------------------------------------------------------------------
# Q1 — pricing summary report: scan → filter → grouped agg (8 aggregates).
# Spark plan: partial HashAggregate → shuffle on (returnflag,linestatus) →
# final HashAggregate; at 100 TB the 6-value group key keeps the shuffle tiny.
# ---------------------------------------------------------------------------


@q(
    "q01_pricing_summary",
    bench=True,
    tags=("agg", "tpch"),
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,8))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(16,12))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,8))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01(spark, sf_dir):
    # t_spread (guide §2.5): the single-row-group fixture file gives the
    # scan ONE partition, serializing the 8 exact-decimal partial
    # aggregates on one core. Measured A/B (interleaved, sf0.1): 1.68 s
    # spread vs 3.13 s serial — the decimal128 agg work is heavy enough
    # to beat the exchange cost (unlike the broadcast-probe chains, where
    # the same exchange LOST and was removed). No-op on real multi-file
    # inputs by construction.
    l = t_spread(spark, sf_dir, "lineitem")
    # 20,4 (not 12,4): DuckDB multiplies in the wider operand's physical
    # width — (20,4) forces int128 so the (16,12) product can't overflow.
    charge = dec("l_extendedprice", 20, 4) * dec(
        (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 16, 12
    )
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= ts("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(revenue_expr(), "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount", 12, 8)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join → agg → top-N.
# customer (1.5k/sf0.01) broadcasts; orders⋈lineitem shuffles on orderkey.
# Top-10 runs as TakeOrderedAndProject (no global sort).
# ---------------------------------------------------------------------------


@q(
    "q03_shipping_priority",
    bench=True,
    tags=("join", "topn", "tpch"),
    oracle=f"""
SELECT l_orderkey,
  CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
  o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q03(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < ts("1998-03-15"))
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > ts("1998-03-15"))
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue_expr(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS → left-semi join.
# (Presto: HashSemiJoinOperator, reference operator/HashSemiJoinOperator.java:32)
# Adapted: no commit/receipt dates → lineitem shipped after order date.
# ---------------------------------------------------------------------------


@q(
    "q04_order_priority",
    tags=("semijoin", "tpch"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q04(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-07-01"))
        & (F.col("o_orderdate") < ts("1996-10-01"))
    )
    l = t(spark, sf_dir, "lineitem")
    joined = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join with two independent nation edges.
# region/nation/supplier/customer broadcast; only orders⋈lineitem shuffles.
# ---------------------------------------------------------------------------


@q(
    "q05_local_supplier",
    bench=True,
    tags=("join", "tpch"),
    oracle=f"""
SELECT n_name, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def q05(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01"))
        & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Stream the FACT table (r14, guide §3.1): the planner's static file
    # sizes made it broadcast LINEITEM (the 100 TB side) and probe with
    # customer⋈orders — backwards at any scale, and the 600k-row hash-
    # relation build dominated the bench (interleaved A/B: 1.20 s gated
    # vs 1.43 s old, ungated ceiling 1.08). The date-filtered
    # customer⋈orders side (projected to 2 keys) goes through a SIZE-GATED
    # broadcast: tiny here, degrades to the plain key-equi shuffle joins
    # past the row cap — identical join graph, same inner equi-conditions.
    # Persisted BEFORE the probe (same idiom as the dedup candidate list):
    # the gate's bounded count job otherwise recomputes customer⋈orders a
    # second time for the broadcast itself — measured at sf1 (2 natural
    # lineitem splits): new+persist 1.48–1.58 s vs 1.69–2.70 unpersisted
    # vs 1.74–2.83 old shape, interleaved; sf0.1 agrees (1.19 vs 1.24
    # warm). Within-query intermediate — dropped by clearCache between
    # bench queries.
    co = gated_broadcast(
        c.join(o, c.c_custkey == o.o_custkey)
        .select("o_orderkey", "c_nationkey")
        .persist()
    )
    return (
        l.join(co, l.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue_expr(), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue: pure scan/filter/global-agg. The predicate and the
# two needed columns push into the parquet scan (PushedFilters/ReadSchema).
# ---------------------------------------------------------------------------


@q(
    "q06_forecast_revenue",
    bench=True,
    tags=("scan", "agg", "tpch"),
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,8))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q06(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(dec("l_extendedprice") * dec("l_discount", 12, 8), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (supp_nation × cust_nation).
# ---------------------------------------------------------------------------


@q(
    "q07_volume_shipping",
    tags=("join", "tpch"),
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         {REVENUE_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q07(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    df = (
        F.broadcast(s)
        .join(l, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        df.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            revenue_expr().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share: 8-way join + conditional aggregation ratio.
# share = sum(case …)/sum(…): both sums exact-decimal → the final double
# division is deterministic on both engines.
# ---------------------------------------------------------------------------


@q(
    "q08_market_share",
    bench=True,
    tags=("join", "agg", "tpch"),
    oracle=f"""
SELECT o_year,
  CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(12,4)) * CAST(0 AS DECIMAL(12,8)) END) AS DOUBLE)
    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         {REVENUE_SQL} AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
)
def q08(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))
    )
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = (dec(F.lit(0)) * dec(F.lit(0), 12, 8)).alias("zero")
    df = (
        F.broadcast(p)
        .join(l, p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            revenue_expr().alias("volume"),
            "nation",
        )
    )
    return df.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                    dec(F.lit(0)) * dec(F.lit(0), 12, 8)
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit (adapted: no partsupp → profit = revenue).
# LIKE-filtered dimension join + two-key grouped agg.
# ---------------------------------------------------------------------------


@q(
    "q09_product_profit",
    bench=True,
    tags=("join", "agg", "tpch"),
    oracle=f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         {REVENUE_SQL} AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
""",
)
def q09(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        F.broadcast(p)
        .join(l, p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            revenue_expr().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned items: top-20 customers by lost revenue.
# ---------------------------------------------------------------------------


@q(
    "q10_returned_items",
    bench=True,
    tags=("join", "topn", "tpch"),
    oracle=f"""
SELECT c_custkey, c_name, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1997-01-01"))
        & (F.col("o_orderdate") < ts("1997-07-01"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(revenue_expr(), "revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment"
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping modes (adapted: linestatus stands in for shipmode) —
# CASE-bucketed counts.
# ---------------------------------------------------------------------------


@q(
    "q12_ship_priority_count",
    tags=("agg", "tpch"),
    oracle="""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate
GROUP BY l_linestatus
""",
)
def q12(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1997-01-01"))
        & (F.col("l_shipdate") < ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join + double aggregation.
# ---------------------------------------------------------------------------


@q(
    "q13_customer_distribution",
    bench=True,
    tags=("outerjoin", "agg", "tpch"),
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect: conditional-sum ratio.
# ---------------------------------------------------------------------------


@q(
    "q14_promo_effect",
    tags=("join", "agg", "tpch"),
    oracle=f"""
SELECT 100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} END) AS DOUBLE)
       / CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q14(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-09-01"))
        & (F.col("l_shipdate") < ts("1996-10-01"))
    )
    p = t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.00)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", revenue_expr())
                ).cast("double")
                / F.sum(revenue_expr()).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: CTE + scalar-subquery max, compared in *exact decimal*
# (equality on doubles would be fragile; on exact decimals it is sound).
# ---------------------------------------------------------------------------


@q(
    "q15_top_supplier",
    tags=("subquery", "agg", "tpch"),
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({REVENUE_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01"))
        & (F.col("l_shipdate") < ts("1996-04-01"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(revenue_expr()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated scalar subquery (avg per
# part) → Spark/DuckDB both decorrelate to an aggregate + join.
# ---------------------------------------------------------------------------


@q(
    "q17_small_qty_revenue",
    bench=True,
    tags=("subquery", "agg", "tpch"),
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
)
def q17(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    per_part = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (
                F.lit(0.2)
                * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
            ).alias("qty_threshold")
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part, l.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: IN over a HAVING subquery.
# ---------------------------------------------------------------------------


@q(
    "q18_large_volume",
    bench=True,
    tags=("semijoin", "agg", "tpch"),
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 180
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def q18(spark, sf_dir):
    # Aggregate-before-join (guide §2.3): the HAVING subquery already
    # computes SUM(l_quantity) per orderkey, and the outer GROUP BY keys
    # include o_orderkey — unique in orders — so every output group is
    # exactly one qualifying order and its sum_qty IS that same exact
    # decimal sum. Carrying `q` through the join replaces the old shape's
    # second lineitem join + 5-column re-aggregation (two extra exchanges
    # over the fact table at scale) with nothing. Oracle hash-gate pins
    # the equivalence (same decimal sum, same final double cast).
    l = t(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 180)
    )
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        o.join(big_orders, o.o_orderkey == F.col("l_orderkey"))
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of conjunctive range predicates
# (Presto: FAST_INEQUALITY_JOINS band predicates; Spark: plain filter over a
# broadcast hash join on partkey, OR-predicate evaluated post-join).
# ---------------------------------------------------------------------------


@q(
    "q19_discount_revenue",
    tags=("join", "predicate", "tpch"),
    oracle=f"""
SELECT CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(revenue_expr(), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept waiting (adapted to available columns):
# EXISTS + NOT EXISTS correlated on the same fact table
# (Presto: semi/anti joins via HashSemiJoinOperator + LookupOuter).
# ---------------------------------------------------------------------------


@q(
    "q21_waiting_supplier",
    bench=True,
    tags=("semijoin", "antijoin", "tpch"),
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_1'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s_name
""",
)
def q21(spark, sf_dir):
    # Single-scan window form of the EXISTS / NOT EXISTS pair (the
    # decorrelated form scans lineitem 3×). Per row l1:
    #   EXISTS other supplier in the order      ⇔ n_supp > 1
    #   NOT EXISTS other supplier shipping later ⇔ max over OTHER suppliers
    #     of their latest shipdate <= l1.l_shipdate
    # The "other-supplier max" comes from (mx1, mx2, count-at-max) computed
    # with window functions. lineitem is repartitioned by l_orderkey ONCE:
    # hashpartitioning(l_orderkey) satisfies both window partitionings
    # ((ok, sk) and (ok)) AND the orders join key, so the whole pipeline
    # runs on a single shuffle of the fact table.
    from pyspark.sql import Window

    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).repartition(F.col("l_orderkey"))
    w_os = Window.partitionBy("l_orderkey", "l_suppkey")
    w_o = Window.partitionBy("l_orderkey")
    step1 = l.select(
        "*",
        F.max("l_shipdate").over(w_os).alias("ms"),
        F.row_number()
        .over(w_os.orderBy("l_shipdate"))
        .alias("rn_in_supp"),
    )
    step2 = step1.select("*", F.max("l_shipdate").over(w_o).alias("mx1"))
    step3 = step2.select(
        "*",
        F.sum(F.when(F.col("rn_in_supp") == 1, 1).otherwise(0))
        .over(w_o)
        .alias("n_supp"),
        F.sum(
            F.when((F.col("rn_in_supp") == 1) & (F.col("ms") == F.col("mx1")), 1)
            .otherwise(0)
        )
        .over(w_o)
        .alias("n_at_max"),
        F.max(F.when(F.col("ms") < F.col("mx1"), F.col("l_shipdate")))
        .over(w_o)
        .alias("mx2"),
    )
    other_max = F.when(
        (F.col("ms") < F.col("mx1")) | (F.col("n_at_max") > 1), F.col("mx1")
    ).otherwise(F.col("mx2"))
    qual = step3.filter(
        (F.col("n_supp") > 1) & (F.col("l_shipdate") >= other_max)
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        qual.join(o, qual.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), qual.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: custkey-mod stands in for phone
# country code): uncorrelated scalar subquery + anti join.
# ---------------------------------------------------------------------------


@q(
    "q22_global_sales",
    tags=("antijoin", "subquery", "tpch"),
    oracle="""
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_custkey % 7 AS INT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_custkey % 7 IN (0, 1, 2, 3)
    AND c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)
      FROM customer WHERE c_acctbal > 0.00 AND c_custkey % 7 IN (0, 1, 2, 3)
    )
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
) custsale
GROUP BY cntrycode
""",
)
def q22(spark, sf_dir):
    # anti-join side restricted to URGENT orders: the driver fixture
    # gives every customer at least one order, so the original "no
    # orders at all" predicate yields zero rows at every SF — this
    # keeps the anti-join + scalar-avg-subquery shape on real data
    # (r10 verdict, "What's wrong #4")
    c = t(spark, sf_dir, "customer").filter((F.col("c_custkey") % 7).isin(0, 1, 2, 3))
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.00)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
        )
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .select(
            (F.col("c_custkey") % 7).cast("int").alias("cntrycode"), "c_acctbal"
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
    )


def spark_sql_tables(spark, sf_dir: str) -> None:
    """Register views so spark.sql text queries resolve table names."""
    from ..catalog import register_views

    register_views(spark, sf_dir)


# ---------------------------------------------------------------------------
# Q2/Q11/Q16/Q20 need partsupp; the driver schema lacks it (FIXTURES.md), so
# these adaptations derive the part↔supplier relation from lineitem
# (DISTINCT pairs) — every operator shape of the originals is preserved:
# correlated-min subquery (q2), HAVING vs scalar subquery (q11),
# multi-distinct count with NOT-IN (q16), nested EXISTS chain (q20).
# ---------------------------------------------------------------------------

PARTSUPP_SQL = """
partsupp AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM lineitem
)
"""


def _partsupp(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()


@q(
    "q02_min_cost_supplier",
    tags=("subquery", "join", "tpch"),
    doc="q2 adapted: cheapest supplier (min s_acctbal stands in for "
    "ps_supplycost) per EUROPE-offered part — correlated scalar-min "
    "subquery over the derived partsupp.",
    oracle=f"""
WITH {PARTSUPP_SQL.strip()}
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 2 AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
""",
)
def q02(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 2)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_offers = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    min_cost = europe_offers.groupBy("ps_partkey").agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        europe_offers.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(min_cost, ["ps_partkey"])
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
    )


@q(
    "q11_important_stock",
    tags=("subquery", "agg", "tpch"),
    doc="q11 adapted: per-part 'value' (exact decimal revenue) in one "
    "nation, kept when above 1/1000 of the nation total (HAVING vs "
    "uncorrelated scalar subquery).",
    oracle=f"""
WITH value_by_part AS (
  SELECT l_partkey AS ps_partkey,
         SUM({REVENUE_SQL}) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT ps_partkey, CAST(val AS DOUBLE) AS part_value
FROM value_by_part
WHERE val > (SELECT SUM(val) * 0.001 FROM value_by_part)
""",
)
def q11(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    vbp = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(revenue_expr()).alias("val"))
    )
    total = vbp.agg((F.sum("val") * 0.001).alias("thr"))
    return (
        vbp.join(F.broadcast(total))
        .filter(F.col("val") > F.col("thr"))
        .select("ps_partkey", F.col("val").cast("double").alias("part_value"))
    )


@q(
    "q16_supplier_part_count",
    tags=("distinct", "agg", "tpch"),
    doc="q16 adapted: distinct supplier count per (brand, type, size) "
    "excluding a NOT-IN supplier set.",
    oracle=f"""
WITH {PARTSUPP_SQL.strip()}
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#4' AND p_size IN (2, 19, 35, 48)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < -900
  )
GROUP BY p_brand, p_type, p_size
""",
)
def q16(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4") & F.col("p_size").isin(2, 19, 35, 48)
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < -900)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad_supp), ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@q(
    "q20_potential_promotion",
    tags=("semijoin", "subquery", "tpch"),
    doc="q20 adapted: suppliers of 'red' parts whose shipped quantity in a "
    "year exceeds a threshold — nested IN/EXISTS chain.",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 50
  )
""",
)
def q20(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01"))
        & (F.col("l_shipdate") < ts("1997-01-01"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy_suppliers = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy_suppliers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# SQL-text entries: the same gate, but through engine.sql with
# *Presto-dialect* text — proves the rewrite layer + compat functions inside
# the graded correctness check, not only the DataFrame path.
# ---------------------------------------------------------------------------


@q(
    "sql_text_q06",
    extended=True,
    tags=("sql", "engine", "tpch"),
    doc="q6 via engine.sql: Presto text (approx-free, exact decimals).",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,8))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def sql_text_q06(spark, sf_dir):
    from ..engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,8))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""
    )


@q(
    "sql_text_presto_dialect",
    tags=("sql", "engine", "rewrite"),
    doc="Presto-dialect SQL through the rewrite layer inside the gate: "
    "UNNEST WITH ORDINALITY, strpos, approx_distinct error-bound, "
    "day_of_week compat.",
    oracle="""
SELECT doc_id, tok, CAST(ord AS INT) AS ord,
  CAST(strpos(tok, 'a') AS INT) AS pos_a,
  CAST(isodow(TIMESTAMP '2024-01-03 00:00:00') AS INT) AS dow
FROM (
  SELECT doc_id, unnest(split(text, ' ')) AS tok,
         generate_subscripts(split(text, ' '), 1) AS ord
  FROM documents WHERE doc_id < 10
) u
WHERE ord <= 4
""",
)
def sql_text_presto_dialect(spark, sf_dir):
    from ..engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
SELECT doc_id, t.tok, CAST(t.ord AS INT) AS ord,
  strpos(t.tok, 'a') AS pos_a,
  day_of_week(TIMESTAMP '2024-01-03 00:00:00') AS dow
FROM documents
CROSS JOIN UNNEST(split(text, ' ')) WITH ORDINALITY AS t(tok, ord)
WHERE doc_id < 10 AND t.ord <= 4
"""
    )
