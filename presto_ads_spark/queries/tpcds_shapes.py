"""TPC-DS-shaped stress queries adapted onto the TPC-H-ish testdata.

The reference benchmarks 103 TPC-DS queries
(presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/q*.sql);
their recurring *shapes* — ROLLUP with GROUPING() flags (q27), rank over
rollup margins partitioned by aggregation level (q36), multi-channel
UNION ALL rollups (q5/q77), windowed revenue-share ratios (q12/q98),
year-over-year CTE self-joins (q11/q4), before/after conditional-sum
pivots (q21), cross-joined scalar-count batteries (q88), and
HAVING-count bucket joins (q34/q73) — are portable to the existing
tables and stress grouping-sets + window + multi-branch plans beyond
TPC-H. Each entry cites the TPC-DS query whose shape it adapts.

Round 11 batch 2 closes the ledger: every one of the 99 reference
TPC-DS query families now has an oracle-verified shape representative
here (shared shapes cite every family they stand for) — the canonical
star (q3/q42/q52/q55), avg-measure batteries under OR'd bands
(q7/q13/q26), count-gated CASE buckets (q9/q28), day-of-week YoY
pivots (q2), rollup average levels (q18/q22), three-fact channel
joins (q25/q29), above-nation-average return detail (q30/q81),
price-band stock windows (q37/q82), month-pair volatility (q39),
before/after returns netting (q40), trip dimension mismatches
(q46/q68/q79), monthly deviation from partition average
(q53/q63/q89), cross-year resales (q64), top-k-prefiltered rollup
ranks (q70/q86), non-returned channel ratios (q78), dimension-chain
banded counts (q84/q85/q91/q96), and INTERSECT-IN membership (q8).

Round 11 batch 1 widened breadth by 20 families: group-average join-backs
(q1/q30), EXISTS-OR-EXISTS demographics (q10/q69), OR'd predicate
unions (q15/q45/q48), frequent-items × best-customers CTE chains
(q23/q24), three-channel UNION re-aggregation (q33/q56/q60/q71/q76),
INTERSECT/EXCEPT channel counts (q38/q87), asc/desc dual-rank joins
(q44), spend-segment histograms (q54), cross-channel revenue bands
(q58), agg-vs-group-average inequality joins (q65/q72/q92), distinct
multi-supplier orders (q95), OR-heavy dimension filters (q41),
ship-lag buckets (q50/q62/q99), FULL OUTER channel overlap (q97),
day/quarter pivots (q43/q66), promo ratios (q61), yearly deltas
(q75), HAVING-above-scalar-average (q24), and date-IN-subquery
returns (q83) — ~50 of the reference's TPC-DS queries now have an
oracle-verified shape representative.

All entries are ``extended``: oracle-verified in the pytest mirror
(tests/test_oracle_parity.py) rather than driver-scored.

Determinism: every double that reaches the output goes through exact
decimal sums (dsum); LIMIT queries carry a full deterministic ORDER BY
with explicit NULLS FIRST on both engines (Spark ASC default).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import q
from ._util import dec, dsum, t, ts


@q(
    "tpcds_rollup_grouping",
    extended=True,
    tags=("tpcds", "agg", "groupid"),
    doc="q27 shape: multi-dim ROLLUP with GROUPING() flag over a 3-table "
    "star join, averages per level, deterministic ORDER BY + LIMIT "
    "(tpcds/q27.sql: GROUP BY ROLLUP (i_item_id, s_state)).",
    oracle="""
SELECT n_name, c_mktsegment,
  CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders, customer, nation
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  AND o_orderstatus = 'F'
GROUP BY ROLLUP (n_name, c_mktsegment)
ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
LIMIT 100
""",
)
def tpcds_rollup_grouping(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping("c_mktsegment").cast("bigint").alias("g_seg"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice", 18), "total_price"),
        )
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
        )
        .limit(100)
    )


@q(
    "tpcds_rank_over_rollup",
    extended=True,
    tags=("tpcds", "agg", "groupid", "window"),
    doc="q36 shape: gross-margin ROLLUP with RANK() partitioned by the "
    "aggregation level (lochierarchy) — window over grouping-sets output "
    "(tpcds/q36.sql rank_within_parent).",
    oracle="""
WITH m AS (
  SELECT
    CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS BIGINT) AS lochierarchy,
    n_name, c_mktsegment,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  GROUP BY ROLLUP (n_name, c_mktsegment)
)
SELECT lochierarchy, n_name, c_mktsegment, total_price,
  RANK() OVER (PARTITION BY lochierarchy
               ORDER BY total_price DESC, n_name ASC NULLS FIRST,
                        c_mktsegment ASC NULLS FIRST) AS rank_within_parent
FROM m
""",
)
def tpcds_rank_over_rollup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name") + F.grouping("c_mktsegment"))
            .cast("bigint")
            .alias("lochierarchy"),
            dsum(dec("o_totalprice", 18), "total_price"),
        )
    )
    w = Window.partitionBy("lochierarchy").orderBy(
        F.col("total_price").desc(),
        F.col("n_name").asc_nulls_first(),
        F.col("c_mktsegment").asc_nulls_first(),
    )
    return m.select(
        "lochierarchy",
        "n_name",
        "c_mktsegment",
        "total_price",
        F.rank().over(w).alias("rank_within_parent"),
    )


@q(
    "tpcds_channel_union_rollup",
    extended=True,
    tags=("tpcds", "setop", "agg"),
    doc="q5/q77/q80 shape: per-channel profit statements via multi-branch "
    "UNION ALL (sales / returns / orders as channels), then one grouped "
    "rollup over the union (tpcds/q77.sql channel UNION ALL).",
    oracle="""
WITH channels AS (
  SELECT 'store sales' AS channel, l_suppkey % 10 AS unit,
         CAST(l_extendedprice AS DECIMAL(18,4)) AS amt
  FROM lineitem WHERE l_returnflag <> 'R'
  UNION ALL
  SELECT 'store returns' AS channel, l_suppkey % 10 AS unit,
         -CAST(l_extendedprice AS DECIMAL(18,4)) AS amt
  FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT 'catalog' AS channel, o_custkey % 10 AS unit,
         CAST(o_totalprice AS DECIMAL(18,4)) AS amt
  FROM orders
)
SELECT channel, unit, COUNT(*) AS n,
  CAST(SUM(amt) AS DOUBLE) AS total
FROM channels
GROUP BY ROLLUP (channel, unit)
""",
)
def tpcds_channel_union_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    sales = li.filter(F.col("l_returnflag") != "R").select(
        F.lit("store sales").alias("channel"),
        (F.col("l_suppkey") % 10).alias("unit"),
        dec("l_extendedprice", 18).alias("amt"),
    )
    returns = li.filter(F.col("l_returnflag") == "R").select(
        F.lit("store returns").alias("channel"),
        (F.col("l_suppkey") % 10).alias("unit"),
        (-dec("l_extendedprice", 18)).alias("amt"),
    )
    catalog = o.select(
        F.lit("catalog").alias("channel"),
        (F.col("o_custkey") % 10).alias("unit"),
        dec("o_totalprice", 18).alias("amt"),
    )
    return (
        sales.unionAll(returns)
        .unionAll(catalog)
        .rollup("channel", "unit")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("amt"), "total"))
    )


@q(
    "tpcds_revenue_share_window",
    extended=True,
    tags=("tpcds", "window"),
    doc="q12/q20/q98 shape: per-item revenue and its share of the item-class "
    "total via SUM() OVER (PARTITION BY class) ratio "
    "(tpcds/q98.sql revenueratio).",
    oracle="""
WITH itemrev AS (
  SELECT p_type, p_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev_dec
  FROM lineitem, part
  WHERE l_partkey = p_partkey AND p_size <= 10
  GROUP BY p_type, p_partkey
)
SELECT p_type, p_partkey,
  CAST(rev_dec AS DOUBLE) AS revenue,
  CAST(rev_dec AS DOUBLE) * 100.0
    / CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE) AS revenueratio
FROM itemrev
""",
)
def tpcds_revenue_share_window(spark, sf_dir):
    # the window total is summed over exact DECIMALS (associative, so
    # shuffle order can't move a ulp); only the final ratio divides
    # identical doubles on both engines.
    #
    # One shuffle, not two: repartition by p_type BEFORE the groupBy —
    # HashPartitioning(p_type) satisfies the (p_type, p_partkey) grouped
    # aggregation's clustered distribution AND the window's
    # PARTITION BY p_type, so neither adds an exchange (same trick as
    # q21's single-scan window rewrite). ~150 distinct p_type values
    # bound the skew; the window needs that partitioning regardless.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .repartition("p_type")
        .groupBy("p_type", "p_partkey")
        .agg(
            F.sum(
                dec("l_extendedprice", 18) * (1 - dec("l_discount", 18))
            ).alias("rev_dec")
        )
    )
    w = Window.partitionBy("p_type")
    return rev.select(
        "p_type",
        "p_partkey",
        F.col("rev_dec").cast("double").alias("revenue"),
        (
            F.col("rev_dec").cast("double")
            * 100.0
            / F.sum("rev_dec").over(w).cast("double")
        ).alias("revenueratio"),
    )


@q(
    "tpcds_yoy_ratio",
    extended=True,
    tags=("tpcds", "join", "cte"),
    doc="q11/q4/q74 shape: year-over-year customer spend from a yearly-total "
    "CTE self-joined across two years, with a growth-ratio filter "
    "(tpcds/q11.sql year_total self-join).",
    oracle="""
WITH year_total AS (
  SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS yr,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
  FROM orders GROUP BY 1, 2
)
SELECT t1.o_custkey,
  t1.total AS total_1994, t2.total AS total_1995,
  t2.total / t1.total AS growth
FROM year_total t1
JOIN year_total t2 ON t1.o_custkey = t2.o_custkey
WHERE t1.yr = 1994 AND t2.yr = 1995
  AND t1.total > 0 AND t2.total / t1.total > 1.2
""",
)
def tpcds_yoy_ratio(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    year_total = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(dsum(dec("o_totalprice", 18), "total"))
    t1 = year_total.filter(F.col("yr") == 1994).alias("t1")
    t2 = year_total.filter(F.col("yr") == 1995).alias("t2")
    return (
        t1.join(t2, F.col("t1.o_custkey") == F.col("t2.o_custkey"))
        .filter(
            (F.col("t1.total") > 0)
            & (F.col("t2.total") / F.col("t1.total") > 1.2)
        )
        .select(
            F.col("t1.o_custkey").alias("o_custkey"),
            F.col("t1.total").alias("total_1994"),
            F.col("t2.total").alias("total_1995"),
            (F.col("t2.total") / F.col("t1.total")).alias("growth"),
        )
    )


@q(
    "tpcds_before_after_pivot",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q21 shape: conditional-sum pivot — inventory before/after a "
    "pivot date per (supplier, part), keeping rows whose balance ratio "
    "is inside a band (tpcds/q21.sql inv_before/inv_after).",
    oracle="""
SELECT l_suppkey, l_partkey,
  CAST(SUM(CASE WHEN l_shipdate < DATE '1995-06-01'
                THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
       AS DOUBLE) AS qty_before,
  CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-06-01'
                THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
       AS DOUBLE) AS qty_after
FROM lineitem
GROUP BY l_suppkey, l_partkey
HAVING SUM(CASE WHEN l_shipdate < DATE '1995-06-01'
                THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) > 0
   AND SUM(CASE WHEN l_shipdate >= DATE '1995-06-01'
                THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
     / SUM(CASE WHEN l_shipdate < DATE '1995-06-01'
                THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
       BETWEEN 0.5 AND 2.0
""",
)
def tpcds_before_after_pivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pivot = F.lit("1995-06-01").cast("date")
    zero = F.lit(0).cast("decimal(18,4)")
    before = F.sum(
        F.when(F.col("l_shipdate") < pivot, dec("l_quantity", 18)).otherwise(
            zero
        )
    )
    after = F.sum(
        F.when(F.col("l_shipdate") >= pivot, dec("l_quantity", 18)).otherwise(
            zero
        )
    )
    return (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(
            before.cast("double").alias("qty_before"),
            after.cast("double").alias("qty_after"),
            before.alias("__b"),
            after.alias("__a"),
        )
        .filter(
            (F.col("__b") > 0)
            & (F.col("__a") / F.col("__b")).between(0.5, 2.0)
        )
        .drop("__b", "__a")
    )


@q(
    "tpcds_multi_count_battery",
    extended=True,
    tags=("tpcds", "join", "subquery"),
    doc="q88 shape: a battery of independent filtered counts cross-joined "
    "into one row (8 single-row aggregate subqueries, tpcds/q88.sql "
    "s1..s8) — stresses scalar-subquery × broadcast-NL planning.",
    oracle="""
SELECT * FROM
  (SELECT COUNT(*) AS h1 FROM lineitem WHERE l_quantity BETWEEN 1 AND 5) s1,
  (SELECT COUNT(*) AS h2 FROM lineitem WHERE l_quantity BETWEEN 6 AND 10) s2,
  (SELECT COUNT(*) AS h3 FROM lineitem WHERE l_quantity BETWEEN 11 AND 15) s3,
  (SELECT COUNT(*) AS h4 FROM lineitem WHERE l_quantity BETWEEN 16 AND 20) s4,
  (SELECT COUNT(*) AS h5 FROM lineitem WHERE l_quantity BETWEEN 21 AND 25) s5,
  (SELECT COUNT(*) AS h6 FROM lineitem WHERE l_quantity BETWEEN 26 AND 30) s6,
  (SELECT COUNT(*) AS h7 FROM lineitem WHERE l_quantity BETWEEN 31 AND 35) s7,
  (SELECT COUNT(*) AS h8 FROM lineitem WHERE l_quantity BETWEEN 36 AND 40) s8
""",
)
def tpcds_multi_count_battery(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    out = None
    for i in range(8):
        lo, hi = 1 + 5 * i, 5 + 5 * i
        band = (
            li.filter(F.col("l_quantity").between(lo, hi))
            .agg(F.count(F.lit(1)).alias(f"h{i + 1}"))
        )
        out = band if out is None else out.crossJoin(band)
    return out


@q(
    "tpcds_bucket_having",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q34/q73 shape: customers bucketed by order count with a "
    "HAVING-count band, joined back to the customer dimension "
    "(tpcds/q73.sql cnt BETWEEN 1 AND 5).",
    oracle="""
SELECT c_name, c_mktsegment, cnt
FROM (
  SELECT o_custkey, COUNT(*) AS cnt
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY o_custkey
  HAVING COUNT(*) BETWEEN 2 AND 5
) b
JOIN customer ON b.o_custkey = c_custkey
""",
)
def tpcds_bucket_having(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    c = t(spark, sf_dir, "customer")
    buckets = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(2, 5))
    )
    return buckets.join(c, buckets.o_custkey == c.c_custkey).select(
        "c_name", "c_mktsegment", "cnt"
    )


@q(
    "tpcds_topn_over_rollup",
    extended=True,
    tags=("tpcds", "agg", "groupid", "window"),
    doc="q67 shape: top-N within each category over a rollup'd sales "
    "summary — RANK() <= k filter over grouping-sets output (tpcds/"
    "q67.sql rk <= 100); the rank filter is a WindowGroupLimit push.",
    oracle="""
WITH s AS (
  SELECT n_name, c_mktsegment,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sales
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  GROUP BY ROLLUP (n_name, c_mktsegment)
)
SELECT n_name, c_mktsegment, sales, rk FROM (
  SELECT n_name, c_mktsegment, sales,
    RANK() OVER (PARTITION BY n_name
                 ORDER BY sales DESC, c_mktsegment ASC NULLS FIRST) AS rk
  FROM s
) ranked
WHERE rk <= 3
""",
)
def tpcds_topn_over_rollup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(dsum(dec("o_totalprice", 18), "sales"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("sales").desc(), F.col("c_mktsegment").asc_nulls_first()
    )
    return (
        s.select("*", F.rank().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@q(
    "tpcds_channel_intersect",
    extended=True,
    tags=("tpcds", "setop", "join", "agg"),
    doc="q14 shape: cross-channel item set via INTERSECT (items present "
    "in every channel), then sales aggregated over only those items "
    "(tpcds/q14_1.sql cross_items).",
    oracle="""
WITH cross_items AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_quantity <= 10
)
SELECT p_brand, COUNT(*) AS n_sales,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM lineitem, part, cross_items
WHERE lineitem.l_partkey = p_partkey
  AND lineitem.l_partkey = cross_items.l_partkey
GROUP BY p_brand
""",
)
def tpcds_channel_intersect(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cross_items = (
        li.filter(F.col("l_returnflag") == "N")
        .select("l_partkey")
        .intersect(
            li.filter(F.col("l_returnflag") == "A").select("l_partkey")
        )
        .intersect(
            li.filter(F.col("l_quantity") <= 10).select("l_partkey")
        )
    )
    return (
        li.join(cross_items, "l_partkey")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            dsum(dec("l_extendedprice", 18), "total"),
        )
    )


@q(
    "tpcds_exists_retention",
    extended=True,
    tags=("tpcds", "subquery", "semijoin", "agg"),
    doc="q16/q94 shape: grouped order stats filtered by a correlated "
    "EXISTS (a bulk line on the same order) AND NOT EXISTS (any "
    "returned line) — semi + anti join into one grouped agg "
    "(tpcds/q94.sql ws_wh exists / wr_order_number not exists).",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem r
    WHERE r.l_orderkey = o.o_orderkey AND r.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def tpcds_exists_retention(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_quantity") >= 45).select("l_orderkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice", 18), "total_price"),
        )
    )


@q(
    "tpcds_cumulative_full_outer",
    extended=True,
    tags=("tpcds", "window", "join"),
    doc="q51 shape: two per-(item, date) cumulative revenue series "
    "(running SUM windows over grouped aggregates) FULL OUTER joined on "
    "(item, date) with a null-safe ahead/behind flag (tpcds/q51.sql "
    "web_v1 / store_v1 full outer join).",
    oracle="""
WITH web AS (
  SELECT l_partkey AS item, l_shipdate AS d,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS amt
  FROM lineitem WHERE l_returnflag = 'N' AND l_partkey % 41 = 0
  GROUP BY 1, 2
), web_c AS (
  SELECT item, d,
    SUM(amt) OVER (PARTITION BY item ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cume
  FROM web
), store AS (
  SELECT l_partkey AS item, l_shipdate AS d,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS amt
  FROM lineitem WHERE l_returnflag = 'A' AND l_partkey % 41 = 0
  GROUP BY 1, 2
), store_c AS (
  SELECT item, d,
    SUM(amt) OVER (PARTITION BY item ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cume
  FROM store
)
SELECT COALESCE(w.item, s.item) AS item, COALESCE(w.d, s.d) AS d,
  CAST(w.cume AS DOUBLE) AS web_cume,
  CAST(s.cume AS DOUBLE) AS store_cume,
  COALESCE(w.cume > s.cume, FALSE) AS web_ahead
FROM web_c w FULL OUTER JOIN store_c s ON w.item = s.item AND w.d = s.d
""",
)
def tpcds_cumulative_full_outer(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 41 == 0)
    wd = Window.partitionBy("item").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    def series(flag):
        # one exchange per series: HashPartitioning(item) satisfies both
        # the (item, d) grouped agg's clustered distribution AND the
        # window's PARTITION BY item (subset partitioning) — same trick
        # as tpcds_revenue_share_window. The (item, d) join still adds
        # its own pair of exchanges (requireAllClusterKeysForCoPartition
        # rejects the subset for co-partitioning); those are plain hash
        # shuffles AQE can skew-split, unlike the windows.
        return (
            li.filter(F.col("l_returnflag") == flag)
            .select(
                F.col("l_partkey").alias("item"),
                F.col("l_shipdate").alias("d"),
                F.col("l_extendedprice"),
            )
            .repartition("item")
            .groupBy("item", "d")
            .agg(F.sum(dec("l_extendedprice", 18)).alias("amt"))
            .select("item", "d", F.sum("amt").over(wd).alias("cume"))
        )

    w, s = series("N").alias("w"), series("A").alias("s")
    return w.join(
        s,
        (F.col("w.item") == F.col("s.item")) & (F.col("w.d") == F.col("s.d")),
        "full",
    ).select(
        F.coalesce(F.col("w.item"), F.col("s.item")).alias("item"),
        F.coalesce(F.col("w.d"), F.col("s.d")).alias("d"),
        F.col("w.cume").cast("double").alias("web_cume"),
        F.col("s.cume").cast("double").alias("store_cume"),
        F.coalesce(F.col("w.cume") > F.col("s.cume"), F.lit(False)).alias(
            "web_ahead"
        ),
    )


@q(
    "tpcds_period_growth_compare",
    extended=True,
    tags=("tpcds", "join", "cte"),
    doc="q31 shape: per-nation quarterly totals self-joined across three "
    "consecutive quarters, keeping nations whose Q2/Q1 growth exceeds "
    "Q3/Q2 (tpcds/q31.sql ss1..ss3 web/store growth compare).",
    oracle="""
WITH qt AS (
  SELECT n_name, EXTRACT(quarter FROM o_orderdate) AS qtr,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND EXTRACT(year FROM o_orderdate) = 1994
  GROUP BY 1, 2
)
SELECT a.n_name,
  a.total AS q1_total, b.total AS q2_total, c.total AS q3_total,
  b.total / a.total AS g12, c.total / b.total AS g23
FROM qt a
JOIN qt b ON a.n_name = b.n_name
JOIN qt c ON a.n_name = c.n_name
WHERE a.qtr = 1 AND b.qtr = 2 AND c.qtr = 3
  AND a.total > 0 AND b.total > 0
  AND b.total / a.total > c.total / b.total
""",
)
def tpcds_period_growth_compare(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1994)
    cu = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    qt = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.quarter("o_orderdate").alias("qtr"))
        .agg(dsum(dec("o_totalprice", 18), "total"))
    )
    a = qt.filter(F.col("qtr") == 1).alias("a")
    b = qt.filter(F.col("qtr") == 2).alias("b")
    c = qt.filter(F.col("qtr") == 3).alias("c")
    return (
        a.join(b, F.col("a.n_name") == F.col("b.n_name"))
        .join(c, F.col("a.n_name") == F.col("c.n_name"))
        .filter(
            (F.col("a.total") > 0)
            & (F.col("b.total") > 0)
            & (
                F.col("b.total") / F.col("a.total")
                > F.col("c.total") / F.col("b.total")
            )
        )
        .select(
            F.col("a.n_name").alias("n_name"),
            F.col("a.total").alias("q1_total"),
            F.col("b.total").alias("q2_total"),
            F.col("c.total").alias("q3_total"),
            (F.col("b.total") / F.col("a.total")).alias("g12"),
            (F.col("c.total") / F.col("b.total")).alias("g23"),
        )
    )


@q(
    "tpcds_returns_ratio_rank",
    extended=True,
    tags=("tpcds", "agg", "window"),
    doc="q49 shape: worst return ratios by 'channel' — per-brand return "
    "ratio (returned qty / shipped qty) ranked, top slice returned "
    "(tpcds/q49.sql return_rank/currency_rank).",
    oracle="""
WITH r AS (
  SELECT p_brand,
    CAST(SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE 0 END)
         AS DOUBLE) AS ret_qty,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS tot_qty
  FROM lineitem, part
  WHERE l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, ret_qty, tot_qty,
  RANK() OVER (ORDER BY ret_qty / tot_qty DESC, p_brand ASC) AS return_rank
FROM r
ORDER BY return_rank ASC, p_brand ASC
LIMIT 25
""",
)
def tpcds_returns_ratio_rank(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    r = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(
                F.when(F.col("l_returnflag") == "R", dec("l_quantity", 18))
                .otherwise(F.lit(0).cast("decimal(18,4)")),
                "ret_qty",
            ),
            dsum(dec("l_quantity", 18), "tot_qty"),
        )
    )
    w = Window.orderBy(
        (F.col("ret_qty") / F.col("tot_qty")).desc(), F.col("p_brand").asc()
    )
    return (
        r.select("p_brand", "ret_qty", "tot_qty", F.rank().over(w).alias("return_rank"))
        .orderBy(F.col("return_rank").asc(), F.col("p_brand").asc())
        .limit(25)
    )


@q(
    "tpcds_stddev_cov_filter",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q17 shape: per-brand mean/sample-stddev battery with a "
    "coefficient-of-variation HAVING filter "
    "(tpcds/q17.sql store_sales_quantitycov).",
    oracle="""
SELECT p_brand,
  COUNT(*) AS n,
  ROUND(CAST(AVG(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6) AS qty_mean,
  ROUND(CAST(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6) AS qty_stdev
FROM lineitem, part
WHERE l_partkey = p_partkey
GROUP BY p_brand
HAVING ROUND(CAST(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6)
       / ROUND(CAST(AVG(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6) > 0.5
ORDER BY p_brand ASC
""",
)
def tpcds_stddev_cov_filter(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    qd = F.col("l_quantity").cast("double")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # stddev over doubles is accumulation-order dependent across
            # engines (distributed Welford merge vs single-pass): round
            # per the repo determinism method (queries/__init__.py)
            F.round(F.avg(qd).cast("double"), 6).alias("qty_mean"),
            F.round(F.stddev_samp(qd).cast("double"), 6).alias("qty_stdev"),
        )
        .filter(F.col("qty_stdev") / F.col("qty_mean") > 0.5)
        .orderBy(F.col("p_brand").asc())
    )


@q(
    "tpcds_net_after_returns",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q93 shape: actual sales after returns — shipped lines net of the "
    "returned quantity, summed per customer, top spenders "
    "(tpcds/q93.sql sumsales).",
    oracle="""
SELECT o_custkey,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(0 AS DECIMAL(18,4))
           ELSE CAST(l_extendedprice AS DECIMAL(18,4)) END)
       AS DOUBLE) AS net_sales
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY net_sales DESC, o_custkey ASC
LIMIT 50
""",
)
def tpcds_net_after_returns(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            dsum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.lit(0).cast("decimal(18,4)"),
                ).otherwise(dec("l_extendedprice", 18)),
                "net_sales",
            )
        )
        .orderBy(F.col("net_sales").desc(), F.col("o_custkey").asc())
        .limit(50)
    )


@q(
    "tpcds_above_avg_price_parts",
    extended=True,
    tags=("tpcds", "subquery", "agg"),
    doc="q6 shape: items priced over 1.2x their type's average, counted "
    "per supplier nation, HAVING a minimum count "
    "(tpcds/q6.sql j.i_current_price > 1.2 * avg(i_current_price)).",
    oracle="""
SELECT n_name, COUNT(*) AS cnt
FROM part, lineitem, supplier, nation
WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND CAST(p_retailprice AS DOUBLE) > 1.2 * (
    SELECT AVG(CAST(p2.p_retailprice AS DOUBLE))
    FROM part p2 WHERE p2.p_type = part.p_type)
GROUP BY n_name
HAVING COUNT(*) >= 10
ORDER BY cnt ASC, n_name ASC
""",
)
def tpcds_above_avg_price_parts(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    type_avg = p.groupBy(F.col("p_type").alias("ta_type")).agg(
        F.avg(F.col("p_retailprice").cast("double")).alias("ta_avg")
    )
    expensive = p.join(
        F.broadcast(type_avg), p.p_type == type_avg.ta_type
    ).filter(F.col("p_retailprice").cast("double") > 1.2 * F.col("ta_avg"))
    return (
        expensive.join(li, expensive.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 10)
        .orderBy(F.col("cnt").asc(), F.col("n_name").asc())
    )


@q(
    "tpcds_hour_band_ratio",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q90 shape: ratio of activity between two hour bands (am/pm "
    "count ratio) per event type (tpcds/q90.sql am_pm_ratio).",
    oracle="""
SELECT event_type,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 6 AND 11
           THEN 1 ELSE 0 END) AS BIGINT) AS am_cnt,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 12 AND 17
           THEN 1 ELSE 0 END) AS BIGINT) AS pm_cnt
FROM events
GROUP BY event_type
ORDER BY event_type ASC
""",
)
def tpcds_hour_band_ratio(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    h = F.hour("ts")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.when(h.between(6, 11), 1).otherwise(0))
            .cast("bigint")
            .alias("am_cnt"),
            F.sum(F.when(h.between(12, 17), 1).otherwise(0))
            .cast("bigint")
            .alias("pm_cnt"),
        )
        .orderBy(F.col("event_type").asc())
    )


@q(
    "tpcds_spend_quartiles",
    extended=True,
    tags=("tpcds", "window", "agg"),
    doc="q51-family windowed-quantile shape: NTILE(4) quartiles of "
    "customer spend within each nation, per-quartile spend totals "
    "(store-sales windowed-quantile family).",
    oracle="""
WITH spend AS (
  SELECT c_nationkey, o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spent
  FROM orders, customer
  WHERE o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
), qt AS (
  SELECT c_nationkey, spent,
    NTILE(4) OVER (PARTITION BY c_nationkey
                   ORDER BY spent ASC, o_custkey ASC) AS quartile
  FROM spend
)
SELECT c_nationkey, quartile, COUNT(*) AS n,
  CAST(SUM(CAST(spent AS DECIMAL(18,4))) AS DOUBLE) AS quartile_spend
FROM qt
GROUP BY c_nationkey, quartile
ORDER BY c_nationkey ASC, quartile ASC
""",
)
def tpcds_spend_quartiles(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(dsum(dec("o_totalprice", 18), "spent"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("spent").asc(), F.col("o_custkey").asc()
    )
    qt = spend.select(
        "c_nationkey", "spent", F.ntile(4).over(w).alias("quartile")
    )
    return (
        qt.groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("spent", 18), "quartile_spend"),
        )
        .orderBy(F.col("c_nationkey").asc(), F.col("quartile").asc())
    )


@q(
    "tpcds_count_battery_exists",
    extended=True,
    tags=("tpcds", "subquery", "agg"),
    doc="q35 shape: customer demographics battery — count/min/max/avg "
    "per group, gated on EXISTS (has orders) and NOT EXISTS (no "
    "returned line) membership probes (tpcds/q35.sql).",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n,
  MIN(CAST(c_acctbal AS DOUBLE)) AS min_bal,
  MAX(CAST(c_acctbal AS DOUBLE)) AS max_bal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND NOT EXISTS (
    SELECT 1 FROM orders o2, lineitem
    WHERE o2.o_custkey = c_custkey AND l_orderkey = o2.o_orderkey
      AND l_returnflag = 'R')
GROUP BY c_mktsegment
ORDER BY c_mktsegment ASC
""",
)
def tpcds_count_battery_exists(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    has_orders = o.select("o_custkey").distinct()
    returned_cust = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_returnflag") == "R")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(has_orders, c.c_custkey == has_orders.o_custkey, "left_semi")
        .join(
            returned_cust,
            c.c_custkey == returned_cust.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("c_acctbal").cast("double")).alias("min_bal"),
            F.max(F.col("c_acctbal").cast("double")).alias("max_bal"),
        )
        .orderBy(F.col("c_mktsegment").asc())
    )


@q(
    "tpcds_moving_avg_deviation",
    extended=True,
    tags=("tpcds", "window", "agg"),
    doc="q47/q57 shape: monthly sales per nation with the partition "
    "average and LAG/LEAD neighbors; emit months deviating >10% above "
    "the nation's average (call-center monthly-deviation family). "
    "The deviation test multiplies exact-decimal-derived doubles "
    "(total*n vs 1.1*part_total) — no division, IEEE-identical across "
    "engines.",
    oracle="""
WITH monthly AS (
  SELECT c_nationkey,
    EXTRACT(YEAR FROM o_orderdate) AS yr,
    EXTRACT(MONTH FROM o_orderdate) AS mon,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
  FROM orders, customer
  WHERE o_custkey = c_custkey
  GROUP BY c_nationkey, EXTRACT(YEAR FROM o_orderdate),
           EXTRACT(MONTH FROM o_orderdate)
), win AS (
  SELECT c_nationkey, yr, mon, total,
    COUNT(*) OVER (PARTITION BY c_nationkey) AS n_months,
    SUM(total) OVER (PARTITION BY c_nationkey) AS part_total,
    LAG(total) OVER (PARTITION BY c_nationkey
                     ORDER BY yr ASC, mon ASC) AS prev_total,
    LEAD(total) OVER (PARTITION BY c_nationkey
                      ORDER BY yr ASC, mon ASC) AS next_total
  FROM monthly
)
SELECT c_nationkey, yr, mon, total, prev_total, next_total
FROM win
WHERE total * CAST(n_months AS DOUBLE) > 1.1 * part_total
ORDER BY c_nationkey ASC, yr ASC, mon ASC
""",
)
def tpcds_moving_avg_deviation(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_nationkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mon"),
        )
        .agg(dsum(dec("o_totalprice", 18), "total"))
    )
    part = Window.partitionBy("c_nationkey")
    seq = part.orderBy(F.col("yr").asc(), F.col("mon").asc())
    win = monthly.select(
        "c_nationkey",
        "yr",
        "mon",
        "total",
        F.count(F.lit(1)).over(part).alias("n_months"),
        F.sum("total").over(part).alias("part_total"),
        F.lag("total").over(seq).alias("prev_total"),
        F.lead("total").over(seq).alias("next_total"),
    )
    return (
        win.filter(
            F.col("total") * F.col("n_months").cast("double")
            > F.lit(1.1) * F.col("part_total")
        )
        .select(
            "c_nationkey", "yr", "mon", "total", "prev_total", "next_total"
        )
        .orderBy(
            F.col("c_nationkey").asc(), F.col("yr").asc(), F.col("mon").asc()
        )
    )


@q(
    "tpcds_week_over_week",
    extended=True,
    tags=("tpcds", "join", "agg"),
    doc="q59 shape: period-over-period self-join — each nation-month's "
    "order total joined to the NEXT month's, ratio emitted "
    "(store-sales week-over-week family). Ratio rounds to 6 digits per "
    "the determinism method.",
    oracle="""
WITH monthly AS (
  SELECT c_nationkey,
    EXTRACT(YEAR FROM o_orderdate) * 12
      + EXTRACT(MONTH FROM o_orderdate) AS seq,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
  FROM orders, customer
  WHERE o_custkey = c_custkey
  GROUP BY c_nationkey,
    EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate)
)
SELECT a.c_nationkey AS nationkey, a.seq AS seq,
  a.total AS cur_total, b.total AS next_total,
  ROUND(b.total / a.total, 6) AS wow_ratio
FROM monthly a, monthly b
WHERE a.c_nationkey = b.c_nationkey AND b.seq = a.seq + 1
ORDER BY nationkey ASC, seq ASC
""",
)
def tpcds_week_over_week(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_nationkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "seq"
            ),
        )
        .agg(dsum(dec("o_totalprice", 18), "total"))
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("b.seq") == F.col("a.seq") + 1),
        )
        .select(
            F.col("a.c_nationkey").alias("nationkey"),
            F.col("a.seq").alias("seq"),
            F.col("a.total").alias("cur_total"),
            F.col("b.total").alias("next_total"),
            F.round(F.col("b.total") / F.col("a.total"), 6).alias(
                "wow_ratio"
            ),
        )
        .orderBy(F.col("nationkey").asc(), F.col("seq").asc())
    )


@q(
    "tpcds_dual_rank_union",
    extended=True,
    tags=("tpcds", "window", "setop"),
    doc="q49 shape: per-part return ratio ranked by ratio AND by "
    "returned amount; a part surfaces when either rank <= 10, the two "
    "rank lists UNION-deduped (worst-return-ratios family). Ranks "
    "order by exact-decimal-derived doubles with full tiebreakers.",
    oracle="""
WITH ratios AS (
  SELECT l_partkey,
    CAST(SUM(CASE WHEN l_returnflag = 'R'
             THEN CAST(l_quantity AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS ret_qty,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS all_qty,
    CAST(SUM(CASE WHEN l_returnflag = 'R'
             THEN CAST(l_extendedprice AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS ret_amt
  FROM lineitem
  GROUP BY l_partkey
  HAVING SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
), ranked AS (
  SELECT l_partkey, ret_qty, all_qty, ret_amt,
    RANK() OVER (ORDER BY ret_qty * 1e6 / all_qty DESC,
                 l_partkey ASC) AS ratio_rank,
    RANK() OVER (ORDER BY ret_amt DESC, l_partkey ASC) AS amt_rank
  FROM ratios
)
SELECT l_partkey, ratio_rank, amt_rank FROM ranked WHERE ratio_rank <= 10
UNION
SELECT l_partkey, ratio_rank, amt_rank FROM ranked WHERE amt_rank <= 10
ORDER BY l_partkey ASC, ratio_rank ASC, amt_rank ASC
""",
)
def tpcds_dual_rank_union(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    ret = F.when(F.col("l_returnflag") == "R", dec("l_quantity", 18)).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    ret_amt = F.when(
        F.col("l_returnflag") == "R", dec("l_extendedprice", 18)
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    ratios = (
        li.groupBy("l_partkey")
        .agg(
            dsum(ret, "ret_qty"),
            dsum(dec("l_quantity", 18), "all_qty"),
            dsum(ret_amt, "ret_amt"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("__nret"),
        )
        .filter(F.col("__nret") > 0)
        .drop("__nret")
    )
    ranked = ratios.select(
        "l_partkey",
        "ret_qty",
        "all_qty",
        "ret_amt",
        F.rank()
        .over(
            Window.orderBy(
                (F.col("ret_qty") * F.lit(1e6) / F.col("all_qty")).desc(),
                F.col("l_partkey").asc(),
            )
        )
        .alias("ratio_rank"),
        F.rank()
        .over(
            Window.orderBy(F.col("ret_amt").desc(), F.col("l_partkey").asc())
        )
        .alias("amt_rank"),
    )
    top_ratio = ranked.filter(F.col("ratio_rank") <= 10).select(
        "l_partkey", "ratio_rank", "amt_rank"
    )
    top_amt = ranked.filter(F.col("amt_rank") <= 10).select(
        "l_partkey", "ratio_rank", "amt_rank"
    )
    return (
        top_ratio.union(top_amt)
        .distinct()
        .orderBy(
            F.col("l_partkey").asc(),
            F.col("ratio_rank").asc(),
            F.col("amt_rank").asc(),
        )
    )


# --- round-11 batch: families with no prior representative ---------------


@q(
    "tpcds_above_group_avg_returns",
    extended=True,
    tags=("tpcds", "subquery", "cte", "agg"),
    doc="q1 shape: per-customer return totals compared against 1.2x the "
    "average of their group (tpcds/q1.sql ctr_total_return > 1.2 * "
    "avg over same store) — CTE + group-average join-back.",
    oracle="""
WITH ctr AS (
  SELECT o_custkey AS cust, o_orderpriority AS grp,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
  FROM orders WHERE o_orderstatus = 'F'
  GROUP BY o_custkey, o_orderpriority
)
SELECT cust, grp, total
FROM ctr c1
WHERE total > 1.2 * (
  SELECT CAST(SUM(CAST(total AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
  FROM ctr c2 WHERE c2.grp = c1.grp)
ORDER BY cust ASC, grp ASC
LIMIT 100
""",
)
def tpcds_above_group_avg_returns(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    ctr = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderpriority").alias("grp"),
    ).agg(dsum(dec("o_totalprice", 18), "total"))
    avg_by_grp = ctr.groupBy("grp").agg(
        (F.sum(dec("total", 18)).cast("double") / F.count(F.lit(1))).alias(
            "grp_avg"
        )
    )
    return (
        ctr.join(F.broadcast(avg_by_grp), "grp")
        .filter(F.col("total") > 1.2 * F.col("grp_avg"))
        .select("cust", "grp", "total")
        .orderBy(F.col("cust").asc(), F.col("grp").asc())
        .limit(100)
    )


@q(
    "tpcds_exists_or_exists",
    extended=True,
    tags=("tpcds", "subquery", "semijoin", "agg"),
    doc="q10/q69 shape: customers with activity in channel A AND "
    "(channel B OR channel C) — EXISTS conjoined with an OR of two "
    "EXISTS (tpcds/q10.sql exists ss / (exists ws or exists cs)), "
    "counted per demographic group.",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_cust
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND (EXISTS (SELECT 1 FROM orders o2
               WHERE o2.o_custkey = c.c_custkey
                 AND o2.o_orderpriority = '5-LOW')
    OR EXISTS (SELECT 1 FROM orders o3
               WHERE o3.o_custkey = c.c_custkey
                 AND o3.o_orderstatus = 'P'))
GROUP BY c_mktsegment
""",
)
def tpcds_exists_or_exists(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    pending = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    # OR-of-EXISTS = semi join against the union of the two channels
    either = low.union(pending).distinct()
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .join(either, c.c_custkey == either.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@q(
    "tpcds_or_predicate_union_zip",
    extended=True,
    tags=("tpcds", "join", "agg"),
    doc="q15 shape: grouped revenue where rows qualify through ANY of "
    "three OR'd predicates spanning dimension attrs and a measure "
    "(tpcds/q15.sql substr(ca_zip) in (...) or ca_state in (...) or "
    "cs_sales_price > 500).",
    oracle="""
SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
  AS total_sales
FROM orders, customer, nation
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  AND (substr(c_name, 1, 12) IN ('Customer#000', 'Customer#001')
       AND c_custkey % 10 = 3
    OR n_name IN ('FRANCE', 'GERMANY', 'EGYPT')
    OR o_totalprice > 400000)
GROUP BY n_name
ORDER BY n_name ASC
""",
)
def tpcds_or_predicate_union_zip(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    cond = (
        (
            F.substring("c_name", 1, 12).isin(
                "Customer#000", "Customer#001"
            )
            & (F.col("c_custkey") % 10 == 3)
        )
        | F.col("n_name").isin("FRANCE", "GERMANY", "EGYPT")
        | (F.col("o_totalprice") > 400000)
    )
    return (
        joined.filter(cond)
        .groupBy("n_name")
        .agg(dsum(dec("o_totalprice", 18), "total_sales"))
        .orderBy(F.col("n_name").asc())
    )


@q(
    "tpcds_frequent_items_best_customers",
    extended=True,
    tags=("tpcds", "cte", "subquery", "semijoin", "agg"),
    doc="q23 shape: frequent items (sold on many distinct dates, HAVING "
    "count > k) semi-joined with best customers (top spenders above a "
    "fraction of the max), summing only their matching sales "
    "(tpcds/q23_1.sql frequent_ss_items / best_ss_customer).",
    oracle="""
WITH frequent_items AS (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey HAVING COUNT(DISTINCT l_shipdate) > 4
), spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s
  FROM orders GROUP BY o_custkey
), best_customers AS (
  SELECT o_custkey FROM spend
  WHERE s > 0.5 * (SELECT MAX(s) FROM spend)
)
SELECT COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM lineitem l, orders o
WHERE l.l_orderkey = o.o_orderkey
  AND l.l_partkey IN (SELECT l_partkey FROM frequent_items)
  AND o.o_custkey IN (SELECT o_custkey FROM best_customers)
""",
)
def tpcds_frequent_items_best_customers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    frequent = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_shipdate").alias("nd"))
        .filter(F.col("nd") > 4)
        .select("l_partkey")
    )
    spend = o.groupBy("o_custkey").agg(dsum(dec("o_totalprice", 18), "s"))
    max_s = spend.agg(F.max("s").alias("m"))
    best = (
        spend.join(F.broadcast(max_s))
        .filter(F.col("s") > 0.5 * F.col("m"))
        .select("o_custkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(frequent, "l_partkey", "left_semi")
        .join(best, "o_custkey", "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(dec("l_extendedprice", 18), "total"),
        )
    )


@q(
    "tpcds_three_channel_union_reagg",
    extended=True,
    tags=("tpcds", "setop", "agg"),
    doc="q33/q56/q60 shape: per-item revenue computed independently in "
    "three channels, UNION ALL'd, then re-aggregated to one total per "
    "item (tpcds/q33.sql ss/cs/ws union all, group by i_manufact_id).",
    oracle="""
WITH ch AS (
  SELECT l_partkey AS pk,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey
  UNION ALL
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
  FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey
  UNION ALL
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
)
SELECT p_brand,
  CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
FROM ch, part WHERE pk = p_partkey
GROUP BY p_brand
ORDER BY p_brand ASC
""",
)
def tpcds_three_channel_union_reagg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")

    def channel(flag):
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(dsum(dec("l_extendedprice", 18), "rev"))
        )

    ch = channel("N").union(channel("A")).union(channel("R"))
    return (
        ch.join(p, ch.pk == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum(dec("rev", 18), "total_rev"))
        .orderBy(F.col("p_brand").asc())
    )


@q(
    "tpcds_intersect_three_channels",
    extended=True,
    tags=("tpcds", "setop", "agg"),
    doc="q38 shape: COUNT(*) over the INTERSECT of three per-channel "
    "distinct customer sets (tpcds/q38.sql select count(*) from "
    "(ss intersect cs intersect ws)).",
    oracle="""
SELECT COUNT(*) AS n_loyal FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
) hot
""",
)
def tpcds_intersect_three_channels(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    ).distinct()
    b = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_custkey"
    ).distinct()
    c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return a.intersect(b).intersect(c).agg(
        F.count(F.lit(1)).alias("n_loyal")
    )


@q(
    "tpcds_except_channel_count",
    extended=True,
    tags=("tpcds", "setop", "agg"),
    doc="q87 shape: COUNT(*) over an EXCEPT chain — customers in channel "
    "A but in neither B nor C (tpcds/q87.sql ss except cs except ws).",
    oracle="""
SELECT COUNT(*) AS n_only_store FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
) cool
""",
)
def tpcds_except_channel_count(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey").distinct()
    c = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey"
    ).distinct()
    return a.subtract(b).subtract(c).agg(
        F.count(F.lit(1)).alias("n_only_store")
    )


@q(
    "tpcds_best_worst_items",
    extended=True,
    tags=("tpcds", "window", "join"),
    doc="q44 shape: top-10 best and top-10 worst performing items via "
    "ascending and descending rank over per-item average revenue, the "
    "two rank tables joined on rank position (tpcds/q44.sql asceding/"
    "descending rnk join).",
    oracle="""
WITH perf AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      / COUNT(*) AS avg_rev
  FROM lineitem GROUP BY l_partkey
), asc_rank AS (
  SELECT l_partkey, RANK() OVER (ORDER BY avg_rev ASC, l_partkey ASC)
    AS rnk FROM perf
), desc_rank AS (
  SELECT l_partkey, RANK() OVER (ORDER BY avg_rev DESC, l_partkey ASC)
    AS rnk FROM perf
)
SELECT a.rnk AS rnk, a.l_partkey AS worst_item, d.l_partkey AS best_item
FROM asc_rank a, desc_rank d
WHERE a.rnk = d.rnk AND a.rnk <= 10
ORDER BY rnk ASC
""",
)
def tpcds_best_worst_items(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    perf = li.groupBy("l_partkey").agg(
        (
            F.sum(dec("l_extendedprice", 18)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_rev")
    )
    wa = Window.orderBy(F.col("avg_rev").asc(), F.col("l_partkey").asc())
    wd = Window.orderBy(F.col("avg_rev").desc(), F.col("l_partkey").asc())
    asc_rank = perf.select(
        "l_partkey", F.rank().over(wa).alias("rnk")
    ).filter(F.col("rnk") <= 10)
    desc_rank = perf.select(
        "l_partkey", F.rank().over(wd).alias("rnk")
    ).filter(F.col("rnk") <= 10)
    return (
        asc_rank.alias("a")
        .join(desc_rank.alias("d"), "rnk")
        .select(
            "rnk",
            F.col("a.l_partkey").alias("worst_item"),
            F.col("d.l_partkey").alias("best_item"),
        )
        .orderBy(F.col("rnk").asc())
    )


@q(
    "tpcds_spend_segment_histogram",
    extended=True,
    tags=("tpcds", "agg", "cte"),
    doc="q54 shape: per-customer revenue bucketed into spend segments "
    "(floor(revenue/N)) and counted per segment — an aggregation over "
    "an aggregation's computed bucket (tpcds/q54.sql segment = "
    "cast(revenue/50 as int), count per segment).",
    oracle="""
WITH cust_rev AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
)
SELECT CAST(FLOOR(revenue / 100000) AS BIGINT) AS segment,
  COUNT(*) AS num_customers
FROM cust_rev
GROUP BY CAST(FLOOR(revenue / 100000) AS BIGINT)
ORDER BY segment ASC
""",
)
def tpcds_spend_segment_histogram(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cust_rev = o.groupBy("o_custkey").agg(
        dsum(dec("o_totalprice", 18), "revenue")
    )
    seg = F.floor(F.col("revenue") / 100000).cast("bigint").alias("segment")
    return (
        cust_rev.groupBy(seg)
        .agg(F.count(F.lit(1)).alias("num_customers"))
        .orderBy(F.col("segment").asc())
    )


@q(
    "tpcds_cross_channel_revenue_band",
    extended=True,
    tags=("tpcds", "join", "agg", "cte"),
    doc="q58 shape: items whose revenue in each of three channels lies "
    "within ±10% of the three-channel average — three per-channel aggs "
    "equi-joined on item with band predicates (tpcds/q58.sql ss_items/"
    "cs_items/ws_items 0.9/1.1 band).",
    oracle="""
WITH chn AS (
  SELECT l_partkey AS pk,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey
), cha AS (
  SELECT l_partkey AS pk,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey
), chr AS (
  SELECT l_partkey AS pk,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
)
SELECT chn.pk AS item,
  chn.rev AS n_rev, cha.rev AS a_rev, chr.rev AS r_rev
FROM chn, cha, chr
WHERE chn.pk = cha.pk AND cha.pk = chr.pk
  AND chn.rev BETWEEN 0.7 * (chn.rev + cha.rev + chr.rev) / 3
                  AND 1.3 * (chn.rev + cha.rev + chr.rev) / 3
  AND cha.rev BETWEEN 0.7 * (chn.rev + cha.rev + chr.rev) / 3
                  AND 1.3 * (chn.rev + cha.rev + chr.rev) / 3
  AND chr.rev BETWEEN 0.7 * (chn.rev + cha.rev + chr.rev) / 3
                  AND 1.3 * (chn.rev + cha.rev + chr.rev) / 3
ORDER BY item ASC
""",
)
def tpcds_cross_channel_revenue_band(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")

    def channel(flag, alias):
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(dsum(dec("l_extendedprice", 18), "rev"))
            .alias(alias)
        )

    chn, cha, chr_ = channel("N", "n"), channel("A", "a"), channel("R", "r")
    avg3 = (
        F.col("n.rev") + F.col("a.rev") + F.col("r.rev")
    ) / 3
    band = (
        F.col("n.rev").between(0.7 * avg3, 1.3 * avg3)
        & F.col("a.rev").between(0.7 * avg3, 1.3 * avg3)
        & F.col("r.rev").between(0.7 * avg3, 1.3 * avg3)
    )
    return (
        chn.join(cha, F.col("n.pk") == F.col("a.pk"))
        .join(chr_, F.col("a.pk") == F.col("r.pk"))
        .filter(band)
        .select(
            F.col("n.pk").alias("item"),
            F.col("n.rev").alias("n_rev"),
            F.col("a.rev").alias("a_rev"),
            F.col("r.rev").alias("r_rev"),
        )
        .orderBy(F.col("item").asc())
    )


@q(
    "tpcds_low_revenue_vs_store_avg",
    extended=True,
    tags=("tpcds", "join", "agg", "cte"),
    doc="q65 shape: supplier-item pairs whose revenue is at most 30% of "
    "that supplier's average item revenue — a per-pair agg joined to a "
    "per-group average of the same agg (tpcds/q65.sql sb.revenue <= "
    "0.1 * sc.ave).",
    oracle="""
WITH pair_rev AS (
  SELECT l_suppkey, l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_suppkey, l_partkey
), supp_avg AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS ave
  FROM pair_rev GROUP BY l_suppkey
)
SELECT s_name, p.l_partkey AS partkey, p.revenue AS revenue
FROM pair_rev p, supp_avg a, supplier
WHERE p.l_suppkey = a.l_suppkey AND p.l_suppkey = s_suppkey
  AND p.revenue <= 0.3 * a.ave
ORDER BY s_name ASC, partkey ASC
LIMIT 100
""",
)
def tpcds_low_revenue_vs_store_avg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    pair_rev = li.groupBy("l_suppkey", "l_partkey").agg(
        dsum(dec("l_extendedprice", 18), "revenue")
    )
    supp_avg = pair_rev.groupBy("l_suppkey").agg(
        (
            F.sum(dec("revenue", 18)).cast("double") / F.count(F.lit(1))
        ).alias("ave")
    )
    return (
        pair_rev.join(supp_avg, "l_suppkey")
        .filter(F.col("revenue") <= 0.3 * F.col("ave"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_name",
            F.col("l_partkey").alias("partkey"),
            "revenue",
        )
        .orderBy(F.col("s_name").asc(), F.col("partkey").asc())
        .limit(100)
    )


@q(
    "tpcds_multi_supplier_orders",
    extended=True,
    tags=("tpcds", "subquery", "agg", "semijoin"),
    doc="q95 shape: orders whose lines span at least two distinct "
    "suppliers (the ws_wh self-join distinct-warehouse pattern of "
    "tpcds/q95.sql), counted and summed per month.",
    oracle="""
WITH multi AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2
)
SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS month,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM multi)
GROUP BY substr(CAST(o_orderdate AS VARCHAR), 1, 7)
ORDER BY month ASC
""",
)
def tpcds_multi_supplier_orders(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    return (
        o.join(multi, o.o_orderkey == multi.l_orderkey, "left_semi")
        .groupBy(
            F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
                "month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice", 18), "total"),
        )
        .orderBy(F.col("month").asc())
    )


@q(
    "tpcds_distinct_dim_or_filter",
    extended=True,
    tags=("tpcds", "subquery", "agg"),
    doc="q41 shape: DISTINCT dimension attribute where a correlated "
    "count over the same dimension with a deeply OR'd predicate is "
    "positive (tpcds/q41.sql distinct i_product_name where item count "
    "> 0 over OR'd color/size/unit combos).",
    oracle="""
SELECT DISTINCT p_name
FROM part p1
WHERE p_partkey <= 400
  AND (SELECT COUNT(*) FROM part p2
       WHERE p2.p_brand = p1.p_brand
         AND ((p2.p_type LIKE '%BRASS%' AND p2.p_size BETWEEN 1 AND 15)
           OR (p2.p_type LIKE '%STEEL%' AND p2.p_size BETWEEN 10 AND 30)
           OR (p2.p_type LIKE '%COPPER%' AND p2.p_size BETWEEN 20 AND 40))
      ) > 0
ORDER BY p_name ASC
LIMIT 100
""",
)
def tpcds_distinct_dim_or_filter(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    cond = (
        (F.col("p_type").like("%BRASS%") & F.col("p_size").between(1, 15))
        | (F.col("p_type").like("%STEEL%") & F.col("p_size").between(10, 30))
        | (
            F.col("p_type").like("%COPPER%")
            & F.col("p_size").between(20, 40)
        )
    )
    brands = p.filter(cond).select("p_brand").distinct()
    return (
        p.filter(F.col("p_partkey") <= 400)
        .join(F.broadcast(brands), "p_brand", "left_semi")
        .select("p_name")
        .distinct()
        .orderBy(F.col("p_name").asc())
        .limit(100)
    )


@q(
    "tpcds_ship_lag_buckets",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q50/q62/q99 shape: conditional-count buckets over the lag "
    "between order and ship dates — SUM(CASE lag <= 30 / 60 / 90 / "
    "120 / more) per group (tpcds/q50.sql '30 days' ... '>120 days').",
    oracle="""
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
      THEN 1 ELSE 0 END) AS BIGINT) AS d30,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30
        AND date_diff('day', o_orderdate, l_shipdate) <= 60
      THEN 1 ELSE 0 END) AS BIGINT) AS d60,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
        AND date_diff('day', o_orderdate, l_shipdate) <= 90
      THEN 1 ELSE 0 END) AS BIGINT) AS d90,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
      THEN 1 ELSE 0 END) AS BIGINT) AS d_more
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority ASC
""",
)
def tpcds_ship_lag_buckets(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def bucket(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(alias)

    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            bucket(lag <= 30, "d30"),
            bucket((lag > 30) & (lag <= 60), "d60"),
            bucket((lag > 60) & (lag <= 90), "d90"),
            bucket(lag > 90, "d_more"),
        )
        .orderBy(F.col("o_orderpriority").asc())
    )


@q(
    "tpcds_channel_overlap_full_outer",
    extended=True,
    tags=("tpcds", "join", "setop", "agg"),
    doc="q97 shape: store-only / catalog-only / both customer-item "
    "overlap counts via FULL OUTER join of two per-channel distinct "
    "pair sets (tpcds/q97.sql ssci full outer join csci).",
    oracle="""
WITH ss AS (
  SELECT DISTINCT o_custkey AS cust, l_partkey AS item
  FROM orders, lineitem
  WHERE o_orderkey = l_orderkey AND l_returnflag = 'N'
), cs AS (
  SELECT DISTINCT o_custkey AS cust, l_partkey AS item
  FROM orders, lineitem
  WHERE o_orderkey = l_orderkey AND l_returnflag = 'A'
)
SELECT
  CAST(SUM(CASE WHEN ss.cust IS NOT NULL AND cs.cust IS NULL
      THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
  CAST(SUM(CASE WHEN ss.cust IS NULL AND cs.cust IS NOT NULL
      THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
  CAST(SUM(CASE WHEN ss.cust IS NOT NULL AND cs.cust IS NOT NULL
      THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
FROM ss FULL OUTER JOIN cs
  ON ss.cust = cs.cust AND ss.item = cs.item
""",
)
def tpcds_channel_overlap_full_outer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    def channel(flag):
        return (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .filter(F.col("l_returnflag") == flag)
            .select(
                F.col("o_custkey").alias("cust"),
                F.col("l_partkey").alias("item"),
            )
            .distinct()
        )

    ss, cs = channel("N").alias("ss"), channel("A").alias("cs")
    joined = ss.join(
        cs,
        (F.col("ss.cust") == F.col("cs.cust"))
        & (F.col("ss.item") == F.col("cs.item")),
        "full_outer",
    )
    return joined.agg(
        F.sum(
            F.when(
                F.col("ss.cust").isNotNull() & F.col("cs.cust").isNull(), 1
            ).otherwise(0)
        ).alias("store_only"),
        F.sum(
            F.when(
                F.col("ss.cust").isNull() & F.col("cs.cust").isNotNull(), 1
            ).otherwise(0)
        ).alias("catalog_only"),
        F.sum(
            F.when(
                F.col("ss.cust").isNotNull() & F.col("cs.cust").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("store_and_catalog"),
    )


@q(
    "tpcds_excess_discount",
    extended=True,
    tags=("tpcds", "subquery", "agg", "join"),
    doc="q92/q32 shape: sum of discounts exceeding 1.3x the item's average "
    "discount — correlated scalar-average subquery re-expressed as a "
    "per-item aggregate join (tpcds/q92.sql ws_ext_discount_amt > 1.3 "
    "* avg).",
    oracle="""
WITH item_avg AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
      AS avg_disc
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
  AS excess_revenue,
  COUNT(*) AS n_lines
FROM lineitem l, item_avg a
WHERE l.l_partkey = a.l_partkey AND l.l_discount > 1.3 * a.avg_disc
""",
)
def tpcds_excess_discount(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    item_avg = li.groupBy("l_partkey").agg(
        (
            F.sum(dec("l_discount", 18, 6)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_disc")
    )
    return (
        li.join(item_avg, "l_partkey")
        .filter(F.col("l_discount") > 1.3 * F.col("avg_disc"))
        .agg(
            dsum(dec("l_extendedprice", 18), "excess_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@q(
    "tpcds_null_channel_union",
    extended=True,
    tags=("tpcds", "setop", "agg"),
    doc="q76 shape: UNION ALL of channels where each branch labels "
    "itself and carries a NULL for the column another channel "
    "populates, grouped over the union (tpcds/q76.sql 'store' / "
    "'web' / 'catalog' branches with null columns).",
    oracle="""
SELECT channel, col_name, COUNT(*) AS sales_cnt,
  CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS sales_amt
FROM (
  SELECT 'flagged' AS channel, l_returnflag AS col_name,
    l_extendedprice AS price
  FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT 'pending', CAST(NULL AS VARCHAR), l_extendedprice
  FROM lineitem WHERE l_linestatus = 'O'
  UNION ALL
  SELECT 'bulk', l_returnflag, l_extendedprice
  FROM lineitem WHERE l_quantity >= 45
) ch
GROUP BY channel, col_name
ORDER BY channel ASC, col_name ASC NULLS FIRST
""",
)
def tpcds_null_channel_union(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.lit("flagged").alias("channel"),
        F.col("l_returnflag").alias("col_name"),
        F.col("l_extendedprice").alias("price"),
    )
    b = li.filter(F.col("l_linestatus") == "O").select(
        F.lit("pending").alias("channel"),
        F.lit(None).cast("string").alias("col_name"),
        F.col("l_extendedprice").alias("price"),
    )
    c = li.filter(F.col("l_quantity") >= 45).select(
        F.lit("bulk").alias("channel"),
        F.col("l_returnflag").alias("col_name"),
        F.col("l_extendedprice").alias("price"),
    )
    return (
        a.union(b)
        .union(c)
        .groupBy("channel", "col_name")
        .agg(
            F.count(F.lit(1)).alias("sales_cnt"),
            dsum(dec("price", 18), "sales_amt"),
        )
        .orderBy(
            F.col("channel").asc(), F.col("col_name").asc_nulls_first()
        )
    )


@q(
    "tpcds_monthly_pivot",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q66 shape: 12-way conditional-sum month pivot per group — "
    "SUM(CASE month = m THEN amount END) columns (tpcds/q66.sql "
    "jan_sales ... dec_sales).",
    oracle="""
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 1 AND 3
    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS q1_sales,
  CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 4 AND 6
    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS q2_sales,
  CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 7 AND 9
    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS q3_sales,
  CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 10 AND 12
    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS q4_sales
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority ASC
""",
)
def tpcds_monthly_pivot(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    mo = F.month("o_orderdate")

    def qtr(lo, hi, alias):
        return (
            F.sum(
                F.when(mo.between(lo, hi), dec("o_totalprice", 18))
            )
            .cast("double")
            .alias(alias)
        )

    return (
        o.groupBy("o_orderpriority")
        .agg(
            qtr(1, 3, "q1_sales"),
            qtr(4, 6, "q2_sales"),
            qtr(7, 9, "q3_sales"),
            qtr(10, 12, "q4_sales"),
        )
        .orderBy(F.col("o_orderpriority").asc())
    )


@q(
    "tpcds_demand_exceeds_stock",
    extended=True,
    tags=("tpcds", "join", "agg"),
    doc="q72 shape: order lines whose quantity exceeds the item's "
    "historical median-ish threshold (an inequality join against a "
    "per-item aggregate — tpcds/q72.sql inv_quantity_on_hand < "
    "cs_quantity).",
    oracle="""
WITH stock AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      AS typical_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand, COUNT(*) AS n_over
FROM lineitem l, stock s, part
WHERE l.l_partkey = s.l_partkey AND l.l_partkey = p_partkey
  AND l.l_quantity > 1.5 * s.typical_qty
GROUP BY p_brand
ORDER BY n_over DESC, p_brand ASC
LIMIT 50
""",
)
def tpcds_demand_exceeds_stock(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    stock = li.groupBy("l_partkey").agg(
        (
            F.sum(dec("l_quantity", 18)).cast("double") / F.count(F.lit(1))
        ).alias("typical_qty")
    )
    return (
        li.join(stock, "l_partkey")
        .filter(F.col("l_quantity") > 1.5 * F.col("typical_qty"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_over"))
        .orderBy(F.col("n_over").desc(), F.col("p_brand").asc())
        .limit(50)
    )


@q(
    "tpcds_zip_or_insubquery",
    extended=True,
    tags=("tpcds", "subquery", "join", "agg"),
    doc="q45 shape: grouped revenue where the row qualifies by a "
    "substring bucket OR membership in an item subquery "
    "(tpcds/q45.sql substr(ca_zip) in (...) or i_item_id in "
    "(select i_item_id ...)).",
    oracle="""
SELECT n_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders, customer, nation
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  AND (substr(c_name, 10, 2) IN ('10', '15', '20', '25')
    OR c_custkey IN (SELECT o_custkey FROM orders
                     WHERE o_totalprice > 450000))
GROUP BY n_name
ORDER BY n_name ASC
""",
)
def tpcds_zip_or_insubquery(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    big_spenders = (
        o.filter(F.col("o_totalprice") > 450000)
        .select("o_custkey")
        .distinct()
        .withColumnRenamed("o_custkey", "big_cust")
    )
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(big_spenders),
            F.col("c_custkey") == F.col("big_cust"),
            "left",
        )
    )
    cond = F.substring("c_name", 10, 2).isin("10", "15", "20", "25") | (
        F.col("big_cust").isNotNull()
    )
    return (
        joined.filter(cond)
        .groupBy("n_name")
        .agg(dsum(dec("o_totalprice", 18), "total"))
        .orderBy(F.col("n_name").asc())
    )


@q(
    "tpcds_weekday_pivot",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q43 shape: day-of-week conditional-sum pivot per dimension "
    "(tpcds/q43.sql sun_sales ... sat_sales via SUM(CASE d_day_name)).",
    oracle="""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 0
    THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS sun_sales,
  CAST(SUM(CASE WHEN dayofweek(l_shipdate) IN (1, 2, 3, 4, 5)
    THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS weekday_sales,
  CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 6
    THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS sat_sales
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag ASC
""",
)
def tpcds_weekday_pivot(spark, sf_dir):
    # Spark dayofweek is 1=Sunday..7=Saturday; DuckDB's is 0=Sunday..6
    # (the oracle spells the 0-based buckets)
    li = t(spark, sf_dir, "lineitem")
    dow = F.dayofweek("l_shipdate")

    def bucket(cond, alias):
        return (
            F.sum(F.when(cond, dec("l_extendedprice", 18)))
            .cast("double")
            .alias(alias)
        )

    return (
        li.groupBy("l_returnflag")
        .agg(
            bucket(dow == 1, "sun_sales"),
            bucket(dow.isin(2, 3, 4, 5, 6), "weekday_sales"),
            bucket(dow == 7, "sat_sales"),
        )
        .orderBy(F.col("l_returnflag").asc())
    )


@q(
    "tpcds_or_band_conjuncts",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q48 shape: one aggregate whose WHERE is an OR of three "
    "band-pair conjuncts (quantity band AND price band) — the "
    "optimizer must not split the scan (tpcds/q48.sql three "
    "(ms/es AND netprofit) disjuncts).",
    oracle="""
SELECT COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM lineitem
WHERE (l_quantity BETWEEN 1 AND 15
       AND l_extendedprice BETWEEN 1000 AND 40000)
   OR (l_quantity BETWEEN 16 AND 30
       AND l_extendedprice BETWEEN 20000 AND 60000)
   OR (l_quantity BETWEEN 31 AND 50
       AND l_extendedprice BETWEEN 40000 AND 95000)
""",
)
def tpcds_or_band_conjuncts(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    qy, px = F.col("l_quantity"), F.col("l_extendedprice")
    cond = (
        (qy.between(1, 15) & px.between(1000, 40000))
        | (qy.between(16, 30) & px.between(20000, 60000))
        | (qy.between(31, 50) & px.between(40000, 95000))
    )
    return li.filter(cond).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(dec("l_quantity", 18), "total_qty"),
    )


@q(
    "tpcds_promo_ratio",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q61 shape: promotional-vs-total revenue ratio — two "
    "independently filtered scalar aggregates cross-joined into one "
    "ratio row (tpcds/q61.sql promotions.total * 100 / total.total).",
    oracle="""
WITH promo AS (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS p
  FROM lineitem WHERE l_discount >= 0.05
), total AS (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS t
  FROM lineitem
)
SELECT p AS promo_revenue, t AS total_revenue,
  p * 100 / t AS promo_pct
FROM promo, total
""",
)
def tpcds_promo_ratio(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    promo = li.filter(F.col("l_discount") >= 0.05).agg(
        dsum(dec("l_extendedprice", 18), "promo_revenue")
    )
    total = li.agg(dsum(dec("l_extendedprice", 18), "total_revenue"))
    return promo.join(F.broadcast(total)).select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") * 100 / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@q(
    "tpcds_brand_multi_predicate",
    extended=True,
    tags=("tpcds", "join", "agg"),
    doc="q19 shape: brand revenue over a 3-table star join with "
    "dimension predicates on two tables (tpcds/q19.sql i_manager_id "
    "+ d_moy + store/customer zip inequality).",
    oracle="""
SELECT p_brand,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
    AS ext_price
FROM lineitem, part, orders
WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
  AND p_size BETWEEN 5 AND 20
  AND o_orderstatus = 'F'
  AND month(CAST(o_orderdate AS DATE)) = 11
GROUP BY p_brand
ORDER BY ext_price DESC, p_brand ASC
LIMIT 25
""",
)
def tpcds_brand_multi_predicate(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size").between(5, 20))
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F")
        & (F.month(F.col("o_orderdate").cast("date")) == 11)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("p_brand")
        .agg(dsum(dec("l_extendedprice", 18), "ext_price"))
        .orderBy(F.col("ext_price").desc(), F.col("p_brand").asc())
        .limit(25)
    )


@q(
    "tpcds_hourly_type_union",
    extended=True,
    tags=("tpcds", "setop", "agg"),
    doc="q71 shape: per-hour revenue unioned across channels then "
    "re-grouped by (type, hour) (tpcds/q71.sql union of ws/cs/ss "
    "grouped by i_brand + t_hour).",
    oracle="""
WITH ch AS (
  SELECT event_type, hour(ts) AS hr, value FROM events
  WHERE event_type IN ('click', 'view')
  UNION ALL
  SELECT event_type, hour(ts) AS hr, value FROM events
  WHERE event_type = 'purchase'
  UNION ALL
  SELECT event_type, hour(ts) AS hr, value FROM events
  WHERE event_type = 'error'
)
SELECT event_type, hr, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM ch
GROUP BY event_type, hr
ORDER BY event_type ASC, hr ASC
""",
)
def tpcds_hourly_type_union(spark, sf_dir):
    ev = t(spark, sf_dir, "events")

    def channel(cond):
        return ev.filter(cond).select(
            "event_type", F.hour("ts").alias("hr"), "value"
        )

    ch = (
        channel(F.col("event_type").isin("click", "view"))
        .union(channel(F.col("event_type") == "purchase"))
        .union(channel(F.col("event_type") == "error"))
    )
    return (
        ch.groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("value", 18), "total_value"),
        )
        .orderBy(F.col("event_type").asc(), F.col("hr").asc())
    )


@q(
    "tpcds_yearly_channel_delta",
    extended=True,
    tags=("tpcds", "cte", "join", "setop"),
    doc="q75 shape: per-(year, brand) sales from a channel union, "
    "self-joined on year = prev_year + 1 to report count and amount "
    "deltas (tpcds/q75.sql curr_yr.sales_cnt < prev_yr.sales_cnt).",
    oracle="""
WITH yearly AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS yr, p_brand,
    COUNT(*) AS sales_cnt,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      AS sales_amt
  FROM lineitem, orders, part
  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  GROUP BY year(CAST(o_orderdate AS DATE)), p_brand
)
SELECT c.yr AS curr_yr, c.p_brand AS brand,
  p.sales_cnt AS prev_cnt, c.sales_cnt AS curr_cnt,
  c.sales_amt - p.sales_amt AS amt_delta
FROM yearly c, yearly p
WHERE c.yr = p.yr + 1 AND c.p_brand = p.p_brand
  AND c.sales_cnt < p.sales_cnt
ORDER BY curr_yr ASC, brand ASC
LIMIT 100
""",
)
def tpcds_yearly_channel_delta(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part")
    yearly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
            "p_brand",
        )
        .agg(
            F.count(F.lit(1)).alias("sales_cnt"),
            dsum(dec("l_extendedprice", 18), "sales_amt"),
        )
    )
    c, pv = yearly.alias("c"), yearly.alias("p")
    return (
        c.join(
            pv,
            (F.col("c.yr") == F.col("p.yr") + 1)
            & (F.col("c.p_brand") == F.col("p.p_brand")),
        )
        .filter(F.col("c.sales_cnt") < F.col("p.sales_cnt"))
        .select(
            F.col("c.yr").alias("curr_yr"),
            F.col("c.p_brand").alias("brand"),
            F.col("p.sales_cnt").alias("prev_cnt"),
            F.col("c.sales_cnt").alias("curr_cnt"),
            (F.col("c.sales_amt") - F.col("p.sales_amt")).alias(
                "amt_delta"
            ),
        )
        .orderBy(F.col("curr_yr").asc(), F.col("brand").asc())
        .limit(100)
    )


@q(
    "tpcds_having_above_scalar_avg",
    extended=True,
    tags=("tpcds", "subquery", "agg"),
    doc="q23/q24 shape: per-group sums kept only when above a fraction "
    "of a SCALAR average computed over all groups — subquery in "
    "HAVING (tpcds/q24_1.sql having sum(netpaid) > 0.05 * avg).",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey AS cust, s
FROM spend
WHERE s > 1.6 * (SELECT CAST(SUM(CAST(s AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) FROM spend)
ORDER BY s DESC, cust ASC
LIMIT 100
""",
)
def tpcds_having_above_scalar_avg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        dsum(dec("o_totalprice", 18), "s")
    )
    avg_s = spend.agg(
        (F.sum(dec("s", 18)).cast("double") / F.count(F.lit(1))).alias(
            "a"
        )
    )
    return (
        spend.join(F.broadcast(avg_s))
        .filter(F.col("s") > 1.6 * F.col("a"))
        .select(F.col("o_custkey").alias("cust"), "s")
        .orderBy(F.col("s").desc(), F.col("cust").asc())
        .limit(100)
    )


@q(
    "tpcds_returns_date_in_subquery",
    extended=True,
    tags=("tpcds", "subquery", "agg", "join"),
    doc="q83 shape: per-item return counts where the date is IN a "
    "subquery-derived date set (tpcds/q83.sql d_date in (select "
    "d_date ... where d_week_seq in ...)).",
    oracle="""
SELECT p_brand, COUNT(*) AS n_returns
FROM lineitem, part
WHERE l_partkey = p_partkey AND l_returnflag = 'R'
  AND l_shipdate IN (
    SELECT l_shipdate FROM lineitem
    GROUP BY l_shipdate HAVING COUNT(*) >= 40)
GROUP BY p_brand
ORDER BY n_returns DESC, p_brand ASC
LIMIT 50
""",
)
def tpcds_returns_date_in_subquery(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    busy_dates = (
        li.groupBy("l_shipdate")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 40)
        .select("l_shipdate")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(busy_dates, "l_shipdate", "left_semi")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_returns"))
        .orderBy(F.col("n_returns").desc(), F.col("p_brand").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Round-11 batch 2: the remaining 39 reference families. With these, every
# one of the 99 TPC-DS query families in
# presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/ has an
# oracle-verified shape representative (shared shapes cite every family
# they stand for).
# ---------------------------------------------------------------------------


@q(
    "tpcds_star_brand_year",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q3/q42/q52/q55 shape: the canonical star — fact x date x item "
    "with one dimension filter each, revenue per (year, brand), ORDER BY "
    "year, revenue DESC, brand + LIMIT (tpcds/q3.sql "
    "sum(ss_ext_sales_price) GROUP BY d_year, brand_id; q42/q52/q55 are "
    "the same plan with the filter moved between dimensions).",
    oracle="""
SELECT year(CAST(o_orderdate AS DATE)) AS o_year, p_brand,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_agg
FROM lineitem, orders, part
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND EXTRACT(month FROM o_orderdate) = 11 AND p_size < 15
GROUP BY 1, 2
ORDER BY o_year ASC, sum_agg DESC, p_brand ASC
LIMIT 100
""",
)
def tpcds_star_brand_year(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.month("o_orderdate") == 11)
    p = t(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            F.col("p_brand"),
        )
        .agg(dsum(dec("l_extendedprice", 18), "sum_agg"))
        .orderBy(
            F.col("o_year").asc(),
            F.col("sum_agg").desc(),
            F.col("p_brand").asc(),
        )
        .limit(100)
    )


@q(
    "tpcds_avg_measure_battery",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q7/q26 shape: AVG over four fact measures per item under "
    "dimension predicates; the WHERE carries q13's OR of band-pair "
    "conjuncts (tpcds/q7.sql avg(ss_quantity)..avg(ss_coupon_amt); "
    "q13 avgs under OR'd marital/price bands). Averages are exact "
    "decimal SUM / COUNT surfaced as DOUBLE (accumulation-order "
    "independent on both engines).",
    oracle="""
SELECT p_brand,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*)
    AS avg_disc,
  CAST(SUM(CAST(l_tax AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS avg_tax
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND ((l_quantity BETWEEN 1 AND 15
        AND l_extendedprice BETWEEN 100 AND 20000)
    OR (l_quantity BETWEEN 16 AND 30
        AND l_extendedprice BETWEEN 20000 AND 40000)
    OR (l_quantity BETWEEN 31 AND 50
        AND l_extendedprice BETWEEN 40000 AND 80000))
GROUP BY p_brand
ORDER BY p_brand ASC
""",
)
def tpcds_avg_measure_battery(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    qty, ep = F.col("l_quantity"), F.col("l_extendedprice")
    bands = (
        (qty.between(1, 15) & ep.between(100, 20000))
        | (qty.between(16, 30) & ep.between(20000, 40000))
        | (qty.between(31, 50) & ep.between(40000, 80000))
    )
    n = F.count(F.lit(1))
    return (
        li.filter(bands)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            n.alias("n"),
            (F.sum(dec("l_quantity", 18)).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice", 18)).cast("double") / n).alias(
                "avg_price"
            ),
            (F.sum(dec("l_discount", 18, 8)).cast("double") / n).alias(
                "avg_disc"
            ),
            (F.sum(dec("l_tax", 18, 8)).cast("double") / n).alias("avg_tax"),
        )
        .orderBy(F.col("p_brand").asc())
    )


@q(
    "tpcds_case_count_avg_bands",
    extended=True,
    tags=("tpcds", "agg"),
    doc="q9/q28 shape: five quantity bands over one fact scan, each "
    "yielding a count-gated CASE pick between two averages plus a "
    "per-band distinct count, cross-assembled into a single row "
    "(tpcds/q9.sql CASE WHEN count > k THEN avg1 ELSE avg2 buckets; "
    "q28 avg/count(distinct) per list-price band).",
    oracle="""
SELECT
  CASE WHEN b1_n > 400 THEN b1_price ELSE b1_disc END AS bucket1,
  CASE WHEN b2_n > 400 THEN b2_price ELSE b2_disc END AS bucket2,
  CASE WHEN b3_n > 400 THEN b3_price ELSE b3_disc END AS bucket3,
  CASE WHEN b4_n > 400 THEN b4_price ELSE b4_disc END AS bucket4,
  CASE WHEN b5_n > 400 THEN b5_price ELSE b5_disc END AS bucket5,
  b1_nd, b2_nd, b3_nd, b4_nd, b5_nd
FROM (
  SELECT
    COUNT(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 END) AS b1_n,
    COUNT(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 END) AS b2_n,
    COUNT(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 END) AS b3_n,
    COUNT(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 END) AS b4_n,
    COUNT(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN 1 END) AS b5_n,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 END), 0)
      AS b1_price,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 END), 0)
      AS b2_price,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 END), 0)
      AS b3_price,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 END), 0)
      AS b4_price,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50
             THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN 1 END), 0)
      AS b5_price,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10
             THEN CAST(l_discount AS DECIMAL(18,8)) END) AS DOUBLE) * 1000
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 END), 0)
      AS b1_disc,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20
             THEN CAST(l_discount AS DECIMAL(18,8)) END) AS DOUBLE) * 1000
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 END), 0)
      AS b2_disc,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30
             THEN CAST(l_discount AS DECIMAL(18,8)) END) AS DOUBLE) * 1000
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 END), 0)
      AS b3_disc,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40
             THEN CAST(l_discount AS DECIMAL(18,8)) END) AS DOUBLE) * 1000
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 END), 0)
      AS b4_disc,
    CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50
             THEN CAST(l_discount AS DECIMAL(18,8)) END) AS DOUBLE) * 1000
      / NULLIF(COUNT(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN 1 END), 0)
      AS b5_disc,
    COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 1 AND 10
          THEN l_extendedprice END) AS b1_nd,
    COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 11 AND 20
          THEN l_extendedprice END) AS b2_nd,
    COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 21 AND 30
          THEN l_extendedprice END) AS b3_nd,
    COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 31 AND 40
          THEN l_extendedprice END) AS b4_nd,
    COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 41 AND 50
          THEN l_extendedprice END) AS b5_nd
  FROM lineitem
) b
""",
)
def tpcds_case_count_avg_bands(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    bandspec = [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)]
    aggs = []
    for i, (lo, hi) in enumerate(bandspec, 1):
        inb = qty.between(lo, hi)
        n = F.count(F.when(inb, 1))
        aggs.append(n.alias(f"b{i}_n"))
        aggs.append(
            (
                F.sum(F.when(inb, dec("l_extendedprice", 18))).cast("double")
                / F.nullif(n, F.lit(0))
            ).alias(f"b{i}_price")
        )
        aggs.append(
            (
                F.sum(F.when(inb, dec("l_discount", 18, 8))).cast("double")
                * 1000
                / F.nullif(n, F.lit(0))
            ).alias(f"b{i}_disc")
        )
        aggs.append(
            F.count_distinct(F.when(inb, F.col("l_extendedprice"))).alias(
                f"b{i}_nd"
            )
        )
    b = li.agg(*aggs)
    out = [
        F.when(F.col(f"b{i}_n") > 400, F.col(f"b{i}_price"))
        .otherwise(F.col(f"b{i}_disc"))
        .alias(f"bucket{i}")
        for i in range(1, 6)
    ] + [F.col(f"b{i}_nd") for i in range(1, 6)]
    return b.select(*out)


@q(
    "tpcds_dow_pivot_yoy_ratio",
    extended=True,
    tags=("tpcds", "agg", "join", "cte"),
    doc="q2 shape: day-of-week conditional-sum pivot per year, "
    "self-joined on year = year + 1 to emit the per-day YoY ratios "
    "(tpcds/q2.sql sun_sales..sat_sales, wswscs year join on "
    "d_week_seq1 = d_week_seq2 - 53). DuckDB dow is 0=Sunday; Spark "
    "dayofweek() is 1=Sunday, shifted by -1 to align.",
    oracle="""
WITH wk AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
    CAST(SUM(CASE WHEN EXTRACT(dow FROM o_orderdate) = 0
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
      AS sun_sales,
    CAST(SUM(CASE WHEN EXTRACT(dow FROM o_orderdate) = 1
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
      AS mon_sales,
    CAST(SUM(CASE WHEN EXTRACT(dow FROM o_orderdate) = 2
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
      AS tue_sales,
    CAST(SUM(CASE WHEN EXTRACT(dow FROM o_orderdate) = 3
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
      AS wed_sales,
    CAST(SUM(CASE WHEN EXTRACT(dow FROM o_orderdate) = 4
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
      AS thu_sales,
    CAST(SUM(CASE WHEN EXTRACT(dow FROM o_orderdate) = 5
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
      AS fri_sales,
    CAST(SUM(CASE WHEN EXTRACT(dow FROM o_orderdate) = 6
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
      AS sat_sales
  FROM orders GROUP BY 1
)
SELECT a.yr AS yr,
  a.sun_sales / b.sun_sales AS sun_r, a.mon_sales / b.mon_sales AS mon_r,
  a.tue_sales / b.tue_sales AS tue_r, a.wed_sales / b.wed_sales AS wed_r,
  a.thu_sales / b.thu_sales AS thu_r, a.fri_sales / b.fri_sales AS fri_r,
  a.sat_sales / b.sat_sales AS sat_r
FROM wk a JOIN wk b ON b.yr = a.yr + 1
ORDER BY yr ASC
""",
)
def tpcds_dow_pivot_yoy_ratio(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    dow = F.dayofweek("o_orderdate") - 1  # align to DuckDB 0=Sunday
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    wk = o.groupBy(
        F.year(F.col("o_orderdate").cast("date")).alias("yr")
    ).agg(
        *[
            F.sum(F.when(dow == i, dec("o_totalprice", 18)))
            .cast("double")
            .alias(f"{nm}_sales")
            for i, nm in enumerate(names)
        ]
    )
    a, b = wk.alias("a"), wk.alias("b")
    return (
        a.join(b, F.col("b.yr") == F.col("a.yr") + 1)
        .select(
            F.col("a.yr").alias("yr"),
            *[
                (F.col(f"a.{nm}_sales") / F.col(f"b.{nm}_sales")).alias(
                    f"{nm}_r"
                )
                for nm in names
            ],
        )
        .orderBy(F.col("yr").asc())
    )


@q(
    "tpcds_rollup_avg_levels",
    extended=True,
    tags=("tpcds", "agg", "groupid"),
    doc="q18/q22 shape: 3-level ROLLUP with multiple exact AVG measures "
    "per aggregation level (tpcds/q18.sql agg1..agg7 GROUP BY ROLLUP "
    "(i_item_id, ca_country, ca_state, ca_county); q22 avg qty-on-hand "
    "over a 4-level inventory rollup).",
    oracle="""
SELECT n_name, c_mktsegment, o_orderpriority,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    AS avg_price,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    AS avg_bal
FROM orders, customer, nation
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment, o_orderpriority)
ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST,
         o_orderpriority ASC NULLS FIRST
LIMIT 150
""",
)
def tpcds_rollup_avg_levels(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    cnt = F.count(F.lit(1))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment", "o_orderpriority")
        .agg(
            cnt.alias("n"),
            (F.sum(dec("o_totalprice", 18)).cast("double") / cnt).alias(
                "avg_price"
            ),
            (F.sum(dec("c_acctbal", 18)).cast("double") / cnt).alias(
                "avg_bal"
            ),
        )
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
        .limit(150)
    )


@q(
    "tpcds_three_fact_agg_join",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q25/q29 shape: the same (item, supplier) key observed in three "
    "fact 'channels' (sold / returned / re-sold), one net per channel "
    "(tpcds/q25.sql store_sales x store_returns x catalog_sales joined "
    "on customer+item). Spark-first deviation from the reference plan: "
    "each channel is aggregated BEFORE the 3-way join (aggregate-then-"
    "join), so the join carries one row per key per channel instead of "
    "a fact-x-fact blowup — same result, bounded shuffle at 100 TB.",
    oracle="""
WITH sold AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS amt
  FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1, 2
), ret AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS amt
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2
), resold AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS amt
  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1, 2
)
SELECT s.pk AS pk, s.sk AS sk,
  CAST(s.amt AS DOUBLE) AS sold_amt,
  CAST(r.amt AS DOUBLE) AS ret_amt,
  CAST(c.amt AS DOUBLE) AS resold_amt
FROM sold s
JOIN ret r ON s.pk = r.pk AND s.sk = r.sk
JOIN resold c ON s.pk = c.pk AND s.sk = c.sk
ORDER BY sold_amt DESC, pk ASC, sk ASC
LIMIT 100
""",
)
def tpcds_three_fact_agg_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")

    def chan(flag):
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy(
                F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
            )
            .agg(F.sum(dec("l_extendedprice", 18)).alias("amt"))
        )

    s, r, c = chan("N").alias("s"), chan("R").alias("r"), chan("A").alias("c")
    on = ["pk", "sk"]
    return (
        s.join(r, on)
        .join(c, on)
        .select(
            "pk",
            "sk",
            F.col("s.amt").cast("double").alias("sold_amt"),
            F.col("r.amt").cast("double").alias("ret_amt"),
            F.col("c.amt").cast("double").alias("resold_amt"),
        )
        .orderBy(
            F.col("sold_amt").desc(), F.col("pk").asc(), F.col("sk").asc()
        )
        .limit(100)
    )


@q(
    "tpcds_returns_above_nation_avg_detail",
    extended=True,
    tags=("tpcds", "agg", "join", "subquery"),
    doc="q30/q81 shape: customers whose return total exceeds 1.2x their "
    "nation's average return total, joined back to the customer "
    "dimension for detail columns (tpcds/q30.sql ctr_total_return > "
    "1.2 * avg(ctr_total_return) ... select c_customer_id, c_first_name "
    "...; q81 is the catalog-returns twin).",
    oracle="""
WITH ctr AS (
  SELECT c_custkey AS ck, c_nationkey AS nk,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS total_return
  FROM lineitem, orders, customer
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND l_returnflag = 'R'
  GROUP BY 1, 2
), nat AS (
  SELECT nk, CAST(SUM(total_return) AS DOUBLE) / COUNT(*) AS avg_ret
  FROM ctr GROUP BY nk
)
SELECT c.c_name AS c_name, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
  CAST(ctr.total_return AS DOUBLE) AS total_return
FROM ctr, nat, customer c
WHERE ctr.nk = nat.nk
  AND CAST(ctr.total_return AS DOUBLE) > 1.2 * nat.avg_ret
  AND ctr.ck = c.c_custkey
ORDER BY total_return DESC, c_name ASC
LIMIT 100
""",
)
def tpcds_returns_above_nation_avg_detail(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    ctr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
        )
        .agg(F.sum(dec("l_extendedprice", 18)).alias("total_return"))
    )
    nat = ctr.groupBy("nk").agg(
        (F.sum("total_return").cast("double") / F.count(F.lit(1))).alias(
            "avg_ret"
        )
    )
    return (
        ctr.join(F.broadcast(nat), "nk")
        .filter(F.col("total_return").cast("double") > 1.2 * F.col("avg_ret"))
        .join(c, F.col("ck") == c.c_custkey)
        .select(
            "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("total_return").cast("double").alias("total_return"),
        )
        .orderBy(F.col("total_return").desc(), F.col("c_name").asc())
        .limit(100)
    )


@q(
    "tpcds_price_band_stock_items",
    extended=True,
    tags=("tpcds", "semijoin", "agg"),
    doc="q37/q82 shape: DISTINCT item attributes for items in a retail "
    "price band whose stock movement inside a date window lies in a "
    "quantity band (tpcds/q82.sql i_current_price BETWEEN .. AND "
    "inv_quantity_on_hand BETWEEN 100 AND 500 over a d_date window).",
    oracle="""
SELECT DISTINCT p_name, CAST(p_retailprice AS DOUBLE) AS price
FROM part
WHERE p_retailprice BETWEEN 400 AND 800
  AND p_partkey IN (
    SELECT l_partkey FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01 00:00:00'
                         AND TIMESTAMP '1994-06-30 00:00:00'
    GROUP BY l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) BETWEEN 100 AND 500)
ORDER BY p_name ASC
LIMIT 100
""",
)
def tpcds_price_band_stock_items(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(400, 800)
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            ts("1994-01-01"), ts("1994-06-30")
        )
    )
    in_band = (
        li.groupBy("l_partkey")
        .agg(F.sum(dec("l_quantity", 18)).alias("qoh"))
        .filter(F.col("qoh").between(100, 500))
        .select("l_partkey")
    )
    return (
        p.join(in_band, p.p_partkey == F.col("l_partkey"), "left_semi")
        .select(
            "p_name", F.col("p_retailprice").cast("double").alias("price")
        )
        .distinct()
        .orderBy(F.col("p_name").asc())
        .limit(100)
    )


@q(
    "tpcds_inv_cov_month_pair",
    extended=True,
    tags=("tpcds", "agg", "join", "window"),
    doc="q39 shape: per (warehouse, item, month) mean/stddev with a "
    "coefficient-of-variation filter, self-joined across two "
    "consecutive months so only keys volatile in BOTH survive "
    "(tpcds/q39.sql inv1 x inv2 ON w_warehouse_sk, i_item_sk, "
    "d_moy = d_moy + 1, cov >= 1.5). Stats rounded to 1e-6 per the "
    "repo determinism method before the threshold compare.",
    oracle="""
WITH s AS (
  SELECT l_suppkey AS sk, l_partkey AS pk,
    EXTRACT(month FROM l_shipdate) AS m,
    ROUND(CAST(AVG(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6) AS mean,
    ROUND(CAST(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 6)
      AS sdev
  FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) = 1994
    AND EXTRACT(month FROM l_shipdate) IN (1, 2)
  GROUP BY 1, 2, 3
)
SELECT a.sk AS sk, a.pk AS pk,
  a.mean AS mean1, a.sdev AS sdev1, b.mean AS mean2, b.sdev AS sdev2
FROM s a JOIN s b ON a.sk = b.sk AND a.pk = b.pk
WHERE a.m = 1 AND b.m = 2
  AND a.sdev / a.mean > 1.0 AND b.sdev / b.mean > 1.0
ORDER BY sk ASC, pk ASC
""",
)
def tpcds_inv_cov_month_pair(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 1994) & F.month("l_shipdate").isin(1, 2)
    )
    qd = F.col("l_quantity").cast("double")
    s = li.groupBy(
        F.col("l_suppkey").alias("sk"),
        F.col("l_partkey").alias("pk"),
        F.month("l_shipdate").alias("m"),
    ).agg(
        F.round(F.avg(qd).cast("double"), 6).alias("mean"),
        F.round(F.stddev_samp(qd).cast("double"), 6).alias("sdev"),
    )
    a = s.filter((F.col("m") == 1) & (F.col("sdev") / F.col("mean") > 1.0))
    b = s.filter((F.col("m") == 2) & (F.col("sdev") / F.col("mean") > 1.0))
    return (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.sk") == F.col("b.sk"))
            & (F.col("a.pk") == F.col("b.pk")),
        )
        .select(
            F.col("a.sk").alias("sk"),
            F.col("a.pk").alias("pk"),
            F.col("a.mean").alias("mean1"),
            F.col("a.sdev").alias("sdev1"),
            F.col("b.mean").alias("mean2"),
            F.col("b.sdev").alias("sdev2"),
        )
        .orderBy(F.col("sk").asc(), F.col("pk").asc())
    )


@q(
    "tpcds_before_after_returns_net",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q40 shape: per-item sales net of matched returns, pivoted "
    "before/after a pivot date (tpcds/q40.sql cs_sales_price - "
    "coalesce(cr_refunded_cash, 0), sales_before/sales_after around "
    "d_date cast). The returns side is pre-aggregated per (order, "
    "item) before the LEFT join — one row per key, no fact-x-fact "
    "blowup.",
    oracle="""
WITH r AS (
  SELECT l_orderkey AS ok, l_partkey AS pk,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS ret_amt
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2
)
SELECT p_brand,
  CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1994-07-01 00:00:00'
           THEN v END) AS DOUBLE) AS sales_before,
  CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1994-07-01 00:00:00'
           THEN v END) AS DOUBLE) AS sales_after
FROM (
  SELECT l.l_shipdate, l.l_partkey,
    CAST(l.l_extendedprice AS DECIMAL(18,4))
      - COALESCE(r.ret_amt, CAST(0 AS DECIMAL(18,4))) AS v
  FROM lineitem l
  LEFT JOIN r ON l.l_orderkey = r.ok AND l.l_partkey = r.pk
  WHERE l.l_returnflag <> 'R'
) x, part
WHERE l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand ASC
""",
)
def tpcds_before_after_returns_net(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .agg(F.sum(dec("l_extendedprice", 18)).alias("ret_amt"))
    )
    pivot = ts("1994-07-01")
    v = dec("l_extendedprice", 18) - F.coalesce(
        F.col("ret_amt"), F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.filter(F.col("l_returnflag") != "R")
        .join(
            r,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("l_partkey") == F.col("pk")),
            "left",
        )
        .select("l_shipdate", "l_partkey", v.alias("v"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < pivot, F.col("v")))
            .cast("double")
            .alias("sales_before"),
            F.sum(F.when(F.col("l_shipdate") >= pivot, F.col("v")))
            .cast("double")
            .alias("sales_after"),
        )
        .orderBy(F.col("p_brand").asc())
    )


@q(
    "tpcds_trip_dim_mismatch",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q46/q68/q79 shape: per-(customer, order) trip amounts where a "
    "line dimension disagrees with the customer dimension (the "
    "bought-city <> current-city filter), joined back for the customer "
    "name, ordered detail slice (tpcds/q46.sql ca_city <> bought_city; "
    "q68/q79 same skeleton with extended amounts).",
    oracle="""
SELECT c_name, o_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS amt,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(l_discount AS DECIMAL(12,8))) AS DOUBLE) AS disc_amt
FROM lineitem, orders, customer, supplier
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND s_nationkey <> c_nationkey
GROUP BY c_name, o_orderkey
ORDER BY amt DESC, o_orderkey ASC
LIMIT 100
""",
)
def tpcds_trip_dim_mismatch(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(
            dsum(dec("l_extendedprice", 18), "amt"),
            dsum(
                dec("l_extendedprice") * dec("l_discount", 12, 8), "disc_amt"
            ),
        )
        .orderBy(F.col("amt").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@q(
    "tpcds_monthly_dev_from_brand_avg",
    extended=True,
    tags=("tpcds", "agg", "window"),
    doc="q53/q63/q89 shape: monthly brand sales vs the brand's "
    "full-partition average via SUM()/COUNT() OVER (PARTITION BY "
    "brand), keeping months deviating more than 10% "
    "(tpcds/q89.sql case when avg_monthly_sales <> 0 then "
    "abs(sum_sales - avg_monthly_sales) / avg_monthly_sales end > 0.1).",
    oracle="""
SELECT * FROM (
  SELECT p_brand, m, CAST(s AS DOUBLE) AS monthly,
    CAST(SUM(s) OVER (PARTITION BY p_brand) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
  FROM (
    SELECT p_brand, EXTRACT(month FROM l_shipdate) AS m,
      SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS s
    FROM lineitem, part
    WHERE l_partkey = p_partkey AND EXTRACT(year FROM l_shipdate) = 1994
    GROUP BY 1, 2
  ) mth
) x
WHERE CASE WHEN brand_avg > 0
      THEN ABS(monthly - brand_avg) / brand_avg END > 0.1
""",
)
def tpcds_monthly_dev_from_brand_avg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1994)
    p = t(spark, sf_dir, "part")
    mth = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.month("l_shipdate").alias("m"))
        .agg(F.sum(dec("l_extendedprice", 18)).alias("s"))
    )
    w = Window.partitionBy("p_brand")
    x = mth.select(
        "p_brand",
        "m",
        F.col("s").cast("double").alias("monthly"),
        (
            F.sum("s").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("brand_avg"),
    )
    return x.filter(
        F.when(
            F.col("brand_avg") > 0,
            F.abs(F.col("monthly") - F.col("brand_avg")) / F.col("brand_avg"),
        )
        > 0.1
    )


@q(
    "tpcds_cross_year_resale",
    extended=True,
    tags=("tpcds", "agg", "join", "cte"),
    doc="q64 shape: the same (item, customer) pair observed in two "
    "consecutive years with the later total no higher than the earlier "
    "(tpcds/q64.sql cs1 x cs2 ON item+store, cs2.syear = cs1.syear + 1, "
    "cs2.cnt <= cs1.cnt).",
    oracle="""
WITH y AS (
  SELECT l_partkey AS pk, o_custkey AS ck,
    year(CAST(o_orderdate AS DATE)) AS yr,
    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS tot, COUNT(*) AS cnt
  FROM lineitem, orders WHERE l_orderkey = o_orderkey
  GROUP BY 1, 2, 3
)
SELECT a.pk AS pk, a.ck AS ck, a.yr AS yr1,
  CAST(a.tot AS DOUBLE) AS tot1, a.cnt AS cnt1,
  CAST(b.tot AS DOUBLE) AS tot2, b.cnt AS cnt2
FROM y a JOIN y b
  ON a.pk = b.pk AND a.ck = b.ck AND b.yr = a.yr + 1
WHERE b.tot <= a.tot
ORDER BY tot1 DESC, pk ASC, ck ASC, yr1 ASC
LIMIT 100
""",
)
def tpcds_cross_year_resale(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    y = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.col("o_custkey").alias("ck"),
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        )
        .agg(
            F.sum(dec("l_extendedprice", 18)).alias("tot"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    a, b = y.alias("a"), y.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pk") == F.col("b.pk"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col("b.yr") == F.col("a.yr") + 1),
        )
        .filter(F.col("b.tot") <= F.col("a.tot"))
        .select(
            F.col("a.pk").alias("pk"),
            F.col("a.ck").alias("ck"),
            F.col("a.yr").alias("yr1"),
            F.col("a.tot").cast("double").alias("tot1"),
            F.col("a.cnt").alias("cnt1"),
            F.col("b.tot").cast("double").alias("tot2"),
            F.col("b.cnt").alias("cnt2"),
        )
        .orderBy(
            F.col("tot1").desc(),
            F.col("pk").asc(),
            F.col("ck").asc(),
            F.col("yr1").asc(),
        )
        .limit(100)
    )


@q(
    "tpcds_topk_prefilter_rollup_rank",
    extended=True,
    tags=("tpcds", "agg", "groupid", "window", "subquery"),
    doc="q70/q86 shape: restrict the rollup to the top-5 first-level "
    "groups chosen by a windowed-rank subquery, then RANK within each "
    "aggregation level (tpcds/q70.sql s_state IN (SELECT s_state FROM "
    "(... ranking <= 5)), rank_within_parent over lochierarchy; q86 is "
    "the web twin without the prefilter).",
    oracle="""
WITH top_n AS (
  SELECT n_name FROM (
    SELECT n_name,
      RANK() OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,4))) DESC,
                            n_name ASC) AS r
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    GROUP BY n_name
  ) ranked WHERE r <= 5
), m AS (
  SELECT
    CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS BIGINT)
      AS lochierarchy,
    n_name, c_mktsegment,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND n_name IN (SELECT n_name FROM top_n)
  GROUP BY ROLLUP (n_name, c_mktsegment)
)
SELECT lochierarchy, n_name, c_mktsegment, total_price,
  RANK() OVER (PARTITION BY lochierarchy
               ORDER BY total_price DESC, n_name ASC NULLS FIRST,
                        c_mktsegment ASC NULLS FIRST) AS rank_within_parent
FROM m
""",
)
def tpcds_topk_prefilter_rollup_rank(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    rw = Window.orderBy(F.col("tot").desc(), F.col("n_name").asc())
    top_n = (
        joined.groupBy("n_name")
        .agg(F.sum(dec("o_totalprice", 18)).alias("tot"))
        .select("n_name", F.rank().over(rw).alias("r"))
        .filter(F.col("r") <= 5)
        .select("n_name")
    )
    m = (
        joined.join(F.broadcast(top_n), "n_name", "left_semi")
        .rollup("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name") + F.grouping("c_mktsegment"))
            .cast("bigint")
            .alias("lochierarchy"),
            dsum(dec("o_totalprice", 18), "total_price"),
        )
    )
    w = Window.partitionBy("lochierarchy").orderBy(
        F.col("total_price").desc(),
        F.col("n_name").asc_nulls_first(),
        F.col("c_mktsegment").asc_nulls_first(),
    )
    return m.select(
        "lochierarchy",
        "n_name",
        "c_mktsegment",
        "total_price",
        F.rank().over(w).alias("rank_within_parent"),
    )


@q(
    "tpcds_nonreturned_channel_ratio",
    extended=True,
    tags=("tpcds", "agg", "join", "semijoin"),
    doc="q78 shape: per-(year, customer) channel totals over lines with "
    "NO matching return (ws LEFT JOIN wr ... WHERE wr_order_number IS "
    "NULL), both channels required non-null (tpcds/q78.sql coalesce-"
    "ratio ordering over ws/cs/ss CTEs). The null-filtered LEFT join "
    "is expressed as a left ANTI join against the distinct returned "
    "keys — same semantics, one distinct + one anti shuffle.",
    oracle="""
WITH nr AS (
  SELECT l.l_suppkey, l.l_extendedprice, o.o_custkey,
    year(CAST(o.o_orderdate AS DATE)) AS yr
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  LEFT JOIN (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS rpk
    FROM lineitem WHERE l_returnflag = 'R'
  ) r ON l.l_orderkey = r.ok AND l.l_partkey = r.rpk
  WHERE r.ok IS NULL
)
SELECT yr, o_custkey,
  CAST(SUM(CASE WHEN l_suppkey % 2 = 0
           THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
    AS web_amt,
  CAST(SUM(CASE WHEN l_suppkey % 2 = 1
           THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
    AS store_amt
FROM nr
GROUP BY 1, 2
HAVING SUM(CASE WHEN l_suppkey % 2 = 0
           THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) IS NOT NULL
   AND SUM(CASE WHEN l_suppkey % 2 = 1
           THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) IS NOT NULL
ORDER BY web_amt DESC, yr ASC, o_custkey ASC
LIMIT 100
""",
)
def tpcds_nonreturned_channel_ratio(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("rpk")
        )
        .distinct()
    )
    nr = li.join(
        returned,
        (li.l_orderkey == F.col("ok")) & (li.l_partkey == F.col("rpk")),
        "left_anti",
    ).join(o, li.l_orderkey == o.o_orderkey)
    web = F.sum(
        F.when(F.col("l_suppkey") % 2 == 0, dec("l_extendedprice", 18))
    )
    store = F.sum(
        F.when(F.col("l_suppkey") % 2 == 1, dec("l_extendedprice", 18))
    )
    return (
        nr.groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
            F.col("o_custkey"),
        )
        .agg(
            web.cast("double").alias("web_amt"),
            store.cast("double").alias("store_amt"),
        )
        .filter(
            F.col("web_amt").isNotNull() & F.col("store_amt").isNotNull()
        )
        .orderBy(
            F.col("web_amt").desc(), F.col("yr").asc(), F.col("o_custkey").asc()
        )
        .limit(100)
    )


@q(
    "tpcds_dim_chain_banded_counts",
    extended=True,
    tags=("tpcds", "agg", "join"),
    doc="q84/q85/q91/q96 shape: returns routed through a multi-hop "
    "dimension chain with OR'd value bands on a dimension attribute, "
    "grouped counts plus a concatenated identifier column "
    "(tpcds/q85.sql cd_marital_status bands OR'd; q84 "
    "coalesce(c_last_name,'')||', '||... customername; q91 returns by "
    "call center; q96 the plain filtered COUNT(*)).",
    oracle="""
SELECT n_name, o_orderpriority,
  concat(n_name, ':', o_orderpriority) AS ident,
  COUNT(*) AS cnt,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS ret_amt
FROM lineitem, orders, customer, nation
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
  AND ((c_acctbal BETWEEN 0 AND 2000)
    OR (c_acctbal BETWEEN 4000 AND 6000)
    OR (c_acctbal BETWEEN 8000 AND 10000))
GROUP BY n_name, o_orderpriority
ORDER BY cnt DESC, n_name ASC, o_orderpriority ASC
LIMIT 100
""",
)
def tpcds_dim_chain_banded_counts(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders")
    bal = F.col("c_acctbal")
    c = t(spark, sf_dir, "customer").filter(
        bal.between(0, 2000)
        | bal.between(4000, 6000)
        | bal.between(8000, 10000)
    )
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(dec("l_extendedprice", 18), "ret_amt"),
        )
        .select(
            "n_name",
            "o_orderpriority",
            F.concat_ws(":", "n_name", "o_orderpriority").alias("ident"),
            "cnt",
            "ret_amt",
        )
        .orderBy(
            F.col("cnt").desc(),
            F.col("n_name").asc(),
            F.col("o_orderpriority").asc(),
        )
        .limit(100)
    )


@q(
    "tpcds_intersect_in_membership",
    extended=True,
    tags=("tpcds", "agg", "semijoin", "setop"),
    doc="q8 shape: revenue restricted by IN over the INTERSECT of two "
    "independently-derived dimension sets (tpcds/q8.sql substr(zip) IN "
    "(zip list INTERSECT preferred-customer zips HAVING count > 10)).",
    oracle="""
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS net_sales
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND s_nationkey IN (
    SELECT c_nationkey FROM customer
    GROUP BY c_nationkey HAVING COUNT(*) > 20
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
    GROUP BY c_nationkey HAVING COUNT(*) > 5
  )
GROUP BY n_name
ORDER BY n_name ASC
""",
)
def tpcds_intersect_in_membership(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    set_a = (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cc"))
        .filter(F.col("cc") > 20)
        .select("c_nationkey")
    )
    set_b = (
        c.filter(F.col("c_acctbal") > 5000)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cc"))
        .filter(F.col("cc") > 5)
        .select("c_nationkey")
    )
    nations = set_a.intersect(set_b)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("c_nationkey"),
            "left_semi",
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(dec("l_extendedprice", 18), "net_sales"))
        .orderBy(F.col("n_name").asc())
    )
