"""SetDigest sketch family (Presto BuildSetDigestAggregation /
MergeSetDigestAggregation / SetDigestFunctions.java: make_set_digest,
merge(setdigest), cardinality, intersection_cardinality, jaccard_index).

Presto's SetDigest is a MinHash + HyperLogLog hybrid; the Spark-first
re-expression keeps both components as a plain struct column —

    setdigest :: struct<mh: array<int>, hll: binary>

- ``mh``: K independent min-hashes, each ``min(hash(x, k))`` — a pure
  JVM aggregate fused into the groupBy, no Python anywhere.
- ``hll``: Spark 3.5 DataSketches HLL (hll_sketch_agg), mergeable with
  hll_union / hll_union_agg.

Everything shuffles only K ints + one small binary per group; digests can
be persisted to parquet and merged later (same rollup economics as the
qdigest module). Jaccard between two sets is estimated by the fraction of
agreeing min-hash components (unbiased, stderr ≈ sqrt(J(1-J)/K));
intersection cardinality = Ĵ × |A∪B| with the union size from the merged
HLL — the same estimator SetDigestFunctions uses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_K = 64


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def make_set_digest(col: str | Column, k: int = DEFAULT_K) -> Column:
    """Aggregate: build a setdigest of the column's values (one per group)."""
    c = _c(col)
    return F.struct(
        F.array(*[F.min(F.hash(c, F.lit(i))) for i in range(k)]).alias("mh"),
        F.hll_sketch_agg(c).alias("hll"),
    )


def merge_set_digest(col: str | Column, k: int = DEFAULT_K) -> Column:
    """Aggregate: merge pre-built setdigests (Presto merge(setdigest))."""
    c = _c(col)
    return F.struct(
        F.array(*[F.min(c["mh"].getItem(i)) for i in range(k)]).alias("mh"),
        F.hll_union_agg(c["hll"]).alias("hll"),
    )


def cardinality_setdigest(col: str | Column) -> Column:
    return F.hll_sketch_estimate(_c(col)["hll"])


def jaccard_index(a: str | Column, b: str | Column) -> Column:
    """Estimated Jaccard similarity: fraction of agreeing minhash slots."""
    am, bm = _c(a)["mh"], _c(b)["mh"]
    agree = F.size(F.filter(F.zip_with(am, bm, lambda x, y: x == y), lambda v: v))
    return agree.cast("double") / F.size(am).cast("double")


def intersection_cardinality(a: str | Column, b: str | Column) -> Column:
    """|A∩B| ≈ Ĵ(A,B) × |A∪B|, union size from the merged HLL."""
    union_card = F.hll_sketch_estimate(F.hll_union(_c(a)["hll"], _c(b)["hll"]))
    return F.round(jaccard_index(a, b) * union_card).cast("bigint")
