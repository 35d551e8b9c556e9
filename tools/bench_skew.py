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

    # Mitigated leg: the same three queries on the SKEW directory with
    # the skew-path parameters engaged (asof bucketed windows, chunked
    # packing, LSH bucket cap). asof/pack are semantics-preserving; the
    # LSH cap intentionally drops oversized buckets (exact-dup clusters
    # belong to the exact-dedup stage) so its pair count is also shown.
    from pyspark.sql import functions as F  # noqa: F401 (used below)

    from presto_ads_spark.llm import dedup as _dedup
    from presto_ads_spark.llm import pipeline as _pipeline
    from presto_ads_spark.operators import asof_join as _asof
    from presto_ads_spark.queries.llm import near_corpus as _near_corpus

    def _mit_asof(spark, d):
        e = spark.read.parquet(f"{d}/events.parquet")
        clicks = e.filter(e.event_type == "click").select(
            "event_id", "user_id", "ts", "value"
        )
        views = e.filter(e.event_type == "view").select(
            "user_id", "ts", "value"
        )
        return _asof(
            clicks, views, on="ts", by=("user_id",), value_cols=("value",),
            bucket_secs=21600,
        )

    def _mit_pack(spark, d):
        return _pipeline.pack_sequences(
            spark.read.parquet(f"{d}/documents.parquet"),
            budget=512, chunk_docs=2000,
        )

    def _mit_lsh(spark, d):
        return _dedup.minhash_near_dups(
            _near_corpus(spark, d), threshold=0.5, max_bucket=200
        )

    for name, fn in (
        ("events_asof_join", _mit_asof),
        ("pipeline_pack_sequences", _mit_pack),
        ("dedup_minhash_lsh", _mit_lsh),
    ):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, skew).write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            best = el if best is None else min(best, el)
        spark.catalog.clearCache()
        out[name]["skew_mitigated"] = best

    # Wall clock at sf1 under-reports the hazard (a 200k-row hot window
    # partition sorts in ~0.1s on one core); the SCALE-relevant signal is
    # partition imbalance — max/median row share of the shuffle partition
    # each plan's key hashes to. At 1000 executors a max-share partition
    # IS the job's critical path, and it grows linearly with data.
    from pyspark.sql import functions as F

    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _imbalance(df, *keys):
        sizes = (
            df.groupBy(
                F.pmod(
                    F.hash(*[F.col(k) if isinstance(k, str) else k
                             for k in keys]),
                    F.lit(nparts),
                ).alias("p")
            )
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("med"),
            )
            .collect()[0]
        )
        return round(sizes.mx / max(sizes.med, 1), 1)

    imb: dict[str, dict] = {}
    for label, d in (("uniform", uniform), ("skew", skew)):
        ev = spark.read.parquet(f"{d}/events.parquet")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        from presto_ads_spark.llm.dedup import (
            lsh_candidate_pairs,
            minhash_signatures_rowwise,
        )

        sig = minhash_signatures_rowwise(docs).persist()
        pairs = lsh_candidate_pairs(sig).count()
        capped = lsh_candidate_pairs(sig, max_bucket=200).count()
        imb[label] = {
            "asof_partition_max_over_median": _imbalance(ev, "user_id"),
            "asof_bucketed_max_over_median": _imbalance(
                ev, "user_id",
                F.floor(
                    F.col("ts").cast("timestamp").cast("double") / 21600
                ),
            ),
            "pack_partition_max_over_median": _imbalance(docs, "source"),
            "pack_chunked_max_over_median": _imbalance(
                docs, "source", F.floor(F.col("doc_id") / 2000)
            ),
            "lsh_candidate_pairs": pairs,
            "lsh_candidate_pairs_capped_200": capped,
        }
        spark.catalog.clearCache()
    out["straggler_metrics"] = imb

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
