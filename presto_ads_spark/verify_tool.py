"""A/B verifier CLI — the presto-verifier analogue (reference:
presto-verifier/.../Verifier.java:45 replays a query corpus against two
systems and diffs results; here: this engine vs DuckDB over the same
parquet).

Usage:
  python -m presto_ads_spark.verify_tool [sf_dir] [name-substring ...]

Prints one line per query and a final summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import sys
import time


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    name_filters = argv[1:]

    from .queries import load_all
    from .session import get_spark
    from .testing import compare_frames, duckdb_connection

    spark = get_spark("presto-ads-verifier")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    con = duckdb_connection(sf_dir)

    names = [
        n for n in sorted(registry)
        if not name_filters or any(f in n for f in name_filters)
    ]
    failures = 0
    for name in names:
        spec = registry[name]
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n_rows = spec.spark_fn(spark, sf_dir).count()
                status, detail = "ROWS-ONLY", f"{n_rows} rows"
            else:
                res = compare_frames(
                    name, spec.spark_fn(spark, sf_dir), con, spec.oracle
                )
                status = "OK" if res.ok else "MISMATCH"
                detail = f"{res.spark_rows} rows" if res.ok else res.detail[:120]
                failures += 0 if res.ok else 1
        except Exception as e:  # noqa: BLE001 — verifier reports, not raises
            status, detail = "ERROR", str(e).split("\n")[0][:120]
            failures += 1
        elapsed = time.perf_counter() - t0
        print(f"{status:9s} {name:32s} {elapsed:6.2f}s  {detail}")

    print(f"\n{len(names) - failures}/{len(names)} verified against DuckDB at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
