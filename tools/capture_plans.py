"""Dump ``.explain("formatted")`` output for bench-flagged registry queries.

Usage:
    python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` (suffix defaults to "before") for
every bench query, or just the named ones. Pure plan capture — nothing is
executed, so the output is the AQE-initial plan (isFinalPlan=false), which
is what the optimization checklist diffs (Exchange count, join strategy,
PushedFilters/ReadSchema, codegen spans, Python eval nodes).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from presto_ads_spark.queries import load_all
    from presto_ads_spark.session import get_spark

    spark = get_spark("presto-ads-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    targets = names or sorted(n for n, s in registry.items() if s.bench)
    for name in targets:
        spec = registry[name]
        df = spec.spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
