"""ANALYZE TABLE + cost-based optimization (Presto ANALYZE statement and
stats-driven planning: presto-main/.../sql/analyzer + cost/StatsCalculator).

Presto 0.216 collects table/column stats via ANALYZE and feeds the planner's
join-distribution and join-reordering decisions. Spark's equivalence:
``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`` into the session
catalog, ``spark.sql.cbo.enabled`` + ``spark.sql.cbo.joinReorder.enabled``
for stats-driven join planning. At 100 TB this is the mechanism that turns
a star-schema N-way join into broadcast-first order without hand-hinting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def analyzed(spark):
    """Managed copies of two dims + a fact slice, with full column stats."""
    src = "/root/testdata/sf0.001"
    for name in ("nation", "region", "customer"):
        spark.read.parquet(f"{src}/{name}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(f"cbo_{name}")
        spark.sql(f"ANALYZE TABLE cbo_{name} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield
    for name in ("nation", "region", "customer"):
        spark.sql(f"DROP TABLE IF EXISTS cbo_{name}")


def test_analyze_populates_catalog_stats(spark, analyzed):
    desc = spark.sql("DESCRIBE TABLE EXTENDED cbo_nation").collect()
    stats = [r.data_type for r in desc if r.col_name == "Statistics"]
    assert stats and "rows" in stats[0]
    # column-level stats: distinct count for the join key
    col = spark.sql("DESCRIBE EXTENDED cbo_nation n_nationkey").collect()
    info = {r.info_name: r.info_value for r in col}
    assert info.get("distinct_count") not in (None, "NULL")
    assert int(info["distinct_count"]) > 0


def test_cbo_plan_carries_row_counts(spark, analyzed):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        plan = (
            spark.table("cbo_customer")
            .join(spark.table("cbo_nation"), F.col("c_nationkey") == F.col("n_nationkey"))
            ._jdf.queryExecution()
            .stringWithStats()
        )
        # optimized-plan nodes must expose stats-derived rowCount estimates
        assert "rowCount=" in plan
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")


def test_stats_drive_broadcast_choice(spark, analyzed):
    """With stats on, the 25-row nation dim is chosen for broadcast in a
    join written big-side-second — the stats (not hints) make the call."""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        df = spark.sql(
            """
            SELECT n_name, count(*) AS cnt
            FROM cbo_customer
            JOIN cbo_nation ON c_nationkey = n_nationkey
            JOIN cbo_region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            """
        )
        physical = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in physical
        assert "SortMergeJoin" not in physical
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
