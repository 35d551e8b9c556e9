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
from ._util import dec, dsum, t


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
    doc="q5/q77 shape: per-channel profit statements via multi-branch "
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
    doc="q12/q98 shape: per-item revenue and its share of the item-class "
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
    doc="q11/q4 shape: year-over-year customer spend from a yearly-total "
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
