"""Plan-inspection helpers: assert the physical plan has the shape you'd
want at 100 TB (pushdown reached the scan, small dims broadcast, no
row-at-a-time Python in the hot path). Used by tests/test_plans.py — the
rebuild's analogue of the reference's plan-assertion framework
(presto-main/src/test/.../sql/planner/assertions/)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the named filter fragments reached the parquet scan."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed: {joined}"


def assert_read_schema_only(df: DataFrame, table_file: str, *cols: str) -> None:
    """Assert column pruning: the scan of ``table_file`` reads exactly cols."""
    plan = formatted_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and table_file in plan:
            schema_part = ln.split("ReadSchema:")[1]
            for c in cols:
                assert c in schema_part, f"{c} missing from ReadSchema: {ln}"
            return
    raise AssertionError(f"no ReadSchema line in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= expect, f"expected ≥{expect} broadcast joins, saw {n}:\n{plan}"


def assert_no_python_udf(df: DataFrame) -> None:
    """The hot path must stay JVM-side (SURVEY §4.2): no row-at-a-time
    Python eval nodes. (ArrowEvalPython/MapInPandas are the sanctioned
    vectorized escapes and are *not* flagged.)"""
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, f"row-at-a-time Python UDF:\n{plan}"


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the (pre-AQE) physical plan.

    Counts tree nodes named ``Exchange`` in the formatted plan — broadcast
    exchanges print as ``BroadcastExchange`` and are NOT counted; each
    ``Exchange hashpartitioning/rangepartitioning`` is one shuffle."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\)\s+Exchange\b", plan, re.MULTILINE))


def expand_count(df: DataFrame) -> int:
    """Number of Expand nodes (grouping-sets lowering) in the plan."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\)\s+Expand\b", plan, re.MULTILINE))


def assert_whole_stage_codegen(df: DataFrame) -> None:
    import re

    # AQE plans only annotate codegen after execution (isFinalPlan=true).
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    # codegen'd nodes print as "*(N) HashAggregate" in executed plans
    ok = "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)\s+\w", plan)
    assert ok, f"no codegen spans:\n{plan}"
