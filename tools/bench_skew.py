"""Skew-stress bench: the three plans whose partition key can go hot in
ways AQE does NOT repair (r6 verdict item #2).

Uniform replication (gen_scale_dir.py) tests VOLUME; this runs the same
queries against a --skew directory (one user with 20% of events, one
source with 50% of documents, 5% identical-text docs hot in every LSH
band) and reports uniform-vs-skew wall clock side by side:

- events_asof_join      window PARTITION BY user_id  (no AQE skew help)
- pipeline_pack_sequences window PARTITION BY source (no AQE skew help)
- dedup_minhash_lsh     band-bucket self-join (AQE can split the join's
                        shuffle, but pair OUTPUT is quadratic in the
                        bucket regardless)

Analysis + mitigations: PERFORMANCE.md "Skew stress".

Usage:
    python tools/gen_scale_dir.py 10 /tmp/sf1
    python tools/gen_scale_dir.py 10 /tmp/sf1skew --skew
    python tools/bench_skew.py [uniform_dir] [skew_dir]   # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = ("events_asof_join", "pipeline_pack_sequences", "dedup_minhash_lsh")


def main() -> None:
    uniform = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    skew = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from presto_ads_spark.queries import load_all
    from presto_ads_spark.session import get_spark

    spark = get_spark("presto-ads-spark-bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    out: dict[str, dict] = {}
    for name in QUERIES:
        spec = registry[name]
        row: dict[str, float] = {}
        for label, d in (("uniform", uniform), ("skew", skew)):
            best = None
            for _ in range(2):  # run 1 warms JVM/footers; keep the min
                t0 = time.perf_counter()
                spec.spark_fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = round(time.perf_counter() - t0, 3)
                best = el if best is None else min(best, el)
            spark.catalog.clearCache()
            row[label] = best
        row["ratio"] = round(row["skew"] / row["uniform"], 2)
        out[name] = row

    try:
        load = [round(v, 2) for v in os.getloadavg()]
    except OSError:
        load = None
    print(
        json.dumps(
            {
                "metric": "skew_stress",
                "unit": "sec",
                "queries": out,
                "dirs": {"uniform": uniform, "skew": skew},
                "host": {"loadavg": load, "cpus": os.cpu_count()},
            }
        )
    )


if __name__ == "__main__":
    main()
