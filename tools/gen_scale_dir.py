"""Generate a scaled-up bench directory from the driver testdata.

The container has no network, so DuckDB's tpch extension can't emit a
real sf1; instead this replicates /root/testdata/sf0.1 K× (default 10,
i.e. ~sf1 row counts) with join-key remapping so referential integrity
and per-copy value distributions are preserved:

- fact/dim surrogate keys get a per-copy offset (orderkey, custkey,
  partkey, suppkey, event_id, doc_id, vec_id); nation/region are shared
  dims and stay as-is, so join fan-outs scale like real TPC-H.
- documents text is prefixed with a per-copy token and embeddings get a
  tiny per-copy offset on one dimension: copies are NEAR-duplicates, not
  exact duplicates — keeping the dedup benches representative instead of
  quadratically exploding every candidate bucket.

Bench-only artifact (written to /tmp by default); NOT driver testdata.

``--skew`` additionally plants three adversarial hot keys (uniform
replication tests VOLUME; this mode tests the shapes AQE's skew-join
splitting does NOT cover — see PERFORMANCE.md "Skew stress"):

- events: ~20%% of all events are remapped to ONE user_id (1) — the
  as-of join's window partition key, so one partition carries 20%% of
  the table.
- documents: ~50%% of docs are remapped to ONE source ('hot_src') —
  pack_sequences' window partition key (baseline sources are uniform
  ~1/20 each, so this is a 10x hot partition).
- documents: ~5%% of docs get IDENTICAL text — every band bucket of the
  MinHash LSH collides for them (the boilerplate-page shape), making
  the bucket self-join quadratic in the hot-bucket size.

Usage: python tools/gen_scale_dir.py [K] [outdir] [--skew]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# ~120-token constant document for the identical-text LSH hot bucket
HOT_TEXT = " ".join(
    f"boiler{w % 17} plate{w % 11} legal{w % 7} footer" for w in range(30)
)

# table -> {column: offset-base column sizing key}; offsets are i * CEIL
# over the source max so copies never collide.
KEYS = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
SHARED_DIMS = ("nation", "region")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    k = int(args[0]) if args else 10
    out = args[1] if len(args) > 1 else (
        f"/tmp/sf{k / 10:g}skew" if skew else f"/tmp/sf{k / 10:g}"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    ceil = {
        name: con.execute(
            f"SELECT max({col}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        for t, cols in KEYS.items()
        for col, name in cols.items()
    }

    for t in SHARED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT parquet)"
        )

    for t, cols in KEYS.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
        ).fetchall()
        sel = []
        for cname, ctype, *_ in desc:
            if skew and t == "events" and cname == "user_id":
                # hot user: 20% of ALL events on one as-of window key
                sel.append(
                    "CASE WHEN event_id % 5 = 0 THEN 1 ELSE user_id END"
                    " AS user_id"
                )
            elif skew and t == "documents" and cname == "source":
                # hot source: half the corpus in one packing partition
                sel.append(
                    "CASE WHEN doc_id % 2 = 0 THEN 'hot_src' ELSE source"
                    " END AS source"
                )
            elif skew and t == "documents" and cname == "text":
                # identical text -> one hot bucket in EVERY LSH band
                sel.append(
                    f"CASE WHEN doc_id % 20 = 0 THEN '{HOT_TEXT}' "
                    "ELSE concat('c', i, ' ', text) END AS text"
                )
            elif cname in cols:
                sel.append(f"{cname} + i * {ceil[cols[cname]]} AS {cname}")
            elif t == "documents" and cname == "text":
                sel.append("concat('c', i, ' ', text) AS text")
            elif t == "embeddings" and cname == "embedding":
                sel.append(
                    "list_transform(embedding, (x, j) -> CASE WHEN j = 1"
                    " THEN x + i * 0.003 ELSE x END) AS embedding"
                )
            else:
                sel.append(cname)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'"
            f" CROSS JOIN (SELECT unnest(range({k})) AS i))"
            f" TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
