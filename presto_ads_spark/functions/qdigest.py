"""Mergeable quantile-digest sketches (Presto qdigest function family).

Reference parity: presto-main/src/main/java/com/facebook/presto/operator/
aggregation/QuantileDigestAggregationFunction.java (qdigest_agg, merge) and
presto-main/.../scalar/QuantileDigestFunctions.java (value_at_quantile,
values_at_quantiles, quantile_at_value, scale_qdigest).

Spark-first design — the sketch is a plain Spark value, not an opaque blob:

    qdigest :: array<struct<v: double, w: double>>

at most K weight-compressed centroids, sorted by ``v``. Because it is an
ordinary nested column it can be stored in parquet, shuffled, and read back
by pure JVM expressions — the Presto pattern of persisting per-day qdigests
and ``merge()``-ing them at query time carries over verbatim.

Build uses the scale-honest two-phase pattern mirroring Spark's own partial
aggregation:

    mapInPandas      -> one partial sketch per (group, input partition);
                        raw rows never shuffle, memory is bounded by
                        incremental re-compression of the per-group buffer
    groupBy(keys)    -> concat partials + re-compress (the merge step);
                        only K-centroid sketches cross the wire

so at 100 TB the shuffle carries ``groups x partitions x K`` centroids —
independent of row count. Merging previously persisted sketches is the same
second phase (``merge_qdigest``).

Read-side functions are pure higher-order functions over the centroid array
(whole-stage-codegen'd, no Python in the read path).

Accuracy: equal-weight compression to K centroids bounds any quantile's rank
error by ~1/K per compression level (default K=200 -> ~0.5% per pass,
comfortably inside Presto's default qdigest accuracy of 1%).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

DEFAULT_K = 200

SKETCH_TYPE = ArrayType(
    StructType(
        [
            StructField("v", DoubleType(), False),
            StructField("w", DoubleType(), False),
        ]
    )
)


# ---------------------------------------------------------------- numpy core


def _compress(vs: np.ndarray, ws: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Weight-compress (value, weight) pairs to <= k centroids.

    Sorts by value, splits the cumulative-weight axis into k equal bins, and
    emits each non-empty bin's (weighted mean value, total weight). Conserves
    total weight and weighted mean exactly; rank error <= 1 bin = 1/k.
    """
    order = np.argsort(vs, kind="mergesort")
    vs, ws = vs[order], ws[order]
    if len(vs) <= k:
        return vs, ws
    cw = np.cumsum(ws)
    total = cw[-1]
    # Bin by each point's cumulative-weight midpoint -> stable, total-order.
    mid = cw - ws * 0.5
    edges = total * (np.arange(1, k + 1) / k)
    bins = np.minimum(np.searchsorted(edges, mid, side="left"), k - 1)
    sw = np.bincount(bins, weights=ws, minlength=k)
    svw = np.bincount(bins, weights=vs * ws, minlength=k)
    nz = sw > 0
    return svw[nz] / sw[nz], sw[nz]


def _sketch_to_rows(vs: np.ndarray, ws: np.ndarray) -> list[dict]:
    return [{"v": float(v), "w": float(w)} for v, w in zip(vs, ws)]


def _rows_to_arrays(sketches: Sequence[Sequence[dict]]) -> tuple[np.ndarray, np.ndarray]:
    vs = np.fromiter(
        (c["v"] for sk in sketches for c in sk), dtype=np.float64
    )
    ws = np.fromiter(
        (c["w"] for sk in sketches for c in sk), dtype=np.float64
    )
    return vs, ws


# ------------------------------------------------------------------- builders


def qdigest_agg(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    weight: str | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Grouped qdigest build: one row per key tuple with a ``qdigest`` column.

    Phase 1 (mapInPandas) emits one partial sketch per (group, partition);
    phase 2 merges partials per group. Raw rows never shuffle.
    """
    keys = list(keys)
    key_fields = [df.schema[name] for name in keys]
    partial_schema = StructType(
        [*key_fields, StructField("qdigest", SKETCH_TYPE, False)]
    )
    buffer_cap = 16 * k

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # group key tuple -> [values ndarray chunks, weights ndarray chunks]
        acc: dict[tuple, tuple[list, list]] = {}

        def fold(group_key: tuple, vs: np.ndarray, ws: np.ndarray) -> None:
            vlist, wlist = acc.setdefault(group_key, ([], []))
            vlist.append(vs)
            wlist.append(ws)
            if sum(len(a) for a in vlist) > buffer_cap:
                cv, cw = _compress(
                    np.concatenate(vlist), np.concatenate(wlist), k
                )
                vlist[:] = [cv]
                wlist[:] = [cw]

        for pdf in batches:
            vals = pdf[value].to_numpy(dtype=np.float64)
            wts = (
                pdf[weight].to_numpy(dtype=np.float64)
                if weight is not None
                else np.ones(len(pdf), dtype=np.float64)
            )
            ok = ~np.isnan(vals)
            if weight is not None:
                ok &= ~np.isnan(wts) & (wts > 0)
            if keys:
                key_cols = [pdf[kc].to_numpy() for kc in keys]
                codes, uniques = pd.factorize(
                    pd.MultiIndex.from_arrays(key_cols)
                    if len(keys) > 1
                    else pd.Index(key_cols[0])
                )
                for gi in range(len(uniques)):
                    sel = ok & (codes == gi)
                    if sel.any():
                        kt = uniques[gi]
                        kt = kt if isinstance(kt, tuple) else (kt,)
                        fold(kt, vals[sel], wts[sel])
            elif ok.any():
                fold((), vals[ok], wts[ok])

        if not acc:
            # Empty partition: yield no batch at all — an empty pandas
            # object column can't be Arrow-converted to list<struct>.
            return
        out: dict[str, list] = {name: [] for name in keys}
        out["qdigest"] = []
        for kt, (vlist, wlist) in acc.items():
            cv, cw = _compress(np.concatenate(vlist), np.concatenate(wlist), k)
            for name, kv in zip(keys, kt):
                out[name].append(kv)
            out["qdigest"].append(_sketch_to_rows(cv, cw))
        yield pd.DataFrame(out)

    partial_df = df.select(
        *keys, value, *([weight] if weight is not None else [])
    ).mapInPandas(partials, schema=partial_schema)
    return merge_qdigest(partial_df, keys, "qdigest", k=k)


def merge_qdigest(
    df: DataFrame, keys: Sequence[str], sketch: str = "qdigest", k: int = DEFAULT_K
) -> DataFrame:
    """Presto ``merge(qdigest)``: combine sketches per group.

    Input rows carry pre-built sketches (e.g. loaded from a per-day parquet
    rollup); output has one merged ``qdigest`` per key tuple. This is the
    whole point of mergeability: rollups compose without re-reading raw data.
    """
    keys = list(keys)
    key_fields = [df.schema[name] for name in keys]
    out_schema = StructType(
        [*key_fields, StructField("qdigest", SKETCH_TYPE, False)]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        vs, ws = _rows_to_arrays(pdf[sketch].tolist())
        cv, cw = _compress(vs, ws, k)
        head = pdf.iloc[[0]][keys].reset_index(drop=True) if keys else pd.DataFrame(index=[0])
        head["qdigest"] = [_sketch_to_rows(cv, cw)]
        return head

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(merge_group, schema=out_schema)


# ------------------------------------------------------- JVM-side read path


def _sk(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def total_weight(sketch: str | Column) -> Column:
    sk = _sk(sketch)
    return F.aggregate(sk, F.lit(0.0), lambda acc, x: acc + x["w"])


def value_at_quantile(sketch: str | Column, q: float | Column) -> Column:
    """Presto value_at_quantile(qdigest, q): value whose cumulative weight
    first reaches q * total. Pure JVM fold over the sorted centroid array."""
    sk = _sk(sketch)
    qc = F.lit(q) if not isinstance(q, Column) else q
    target = total_weight(sk) * qc
    acc0 = F.struct(
        F.lit(0.0).alias("cum"), F.lit(None).cast("double").alias("res")
    )
    folded = F.aggregate(
        sk,
        acc0,
        lambda acc, x: F.struct(
            (acc["cum"] + x["w"]).alias("cum"),
            F.coalesce(
                acc["res"],
                F.when(acc["cum"] + x["w"] >= target, x["v"]),
            ).alias("res"),
        ),
        lambda acc: acc["res"],
    )
    # fp slack can leave res null at q=1.0 -> fall back to max centroid
    return F.coalesce(folded, F.element_at(sk, -1)["v"])


def values_at_quantiles(sketch: str | Column, qs: Sequence[float]) -> Column:
    sk = _sk(sketch)
    return F.array(*[value_at_quantile(sk, q) for q in qs])


def quantile_at_value(sketch: str | Column, v: float | Column) -> Column:
    """Presto quantile_at_value: fraction of total weight at or below v
    (null when the sketch is empty, matching QuantileDigestFunctions)."""
    sk = _sk(sketch)
    vc = F.lit(v) if not isinstance(v, Column) else v
    below = F.aggregate(
        F.filter(sk, lambda x: x["v"] <= vc),
        F.lit(0.0),
        lambda acc, x: acc + x["w"],
    )
    tot = total_weight(sk)
    return F.when(tot > 0, below / tot)


def scale_qdigest(sketch: str | Column, factor: float | Column) -> Column:
    """Presto scale_qdigest: multiply every weight by a positive factor."""
    sk = _sk(sketch)
    fc = F.lit(factor) if not isinstance(factor, Column) else factor
    return F.transform(
        sk, lambda x: F.struct(x["v"].alias("v"), (x["w"] * fc).alias("w"))
    )
