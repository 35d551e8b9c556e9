"""Temporal join operators Spark lacks as builtins: as-of join and
banded range join.

Neither exists in the reference (presto 0.216 has no ASOF; Trino added it
much later) — these are the beyond-parity temporal ops a training-data /
event-analytics pipeline needs (attach latest-prior state to an event;
join events into time windows).

Scale design:

- ``asof_join`` is the union+ordered-window formulation: tag both inputs,
  union by name, one shuffle on the `by` keys, one streaming window pass
  carrying the last right-side row forward (``last(..., ignorenulls)``),
  keep left rows. No join node at all — the naive formulation (theta
  join on ``r.ts <= l.ts`` + max) is a BroadcastNestedLoop/cartesian
  blow-up at scale; this is O(n log n) sort within partitions.
- ``range_join`` equi-joins on (by, time-bucket) after exploding each
  right-side interval into the buckets it covers, then filters the exact
  containment predicate. Bucketing turns an inequality join Spark would
  nested-loop into a hash join; bucket width trades explode factor
  against per-bucket fan-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = (),
    value_cols: tuple[str, ...] = (),
    suffix: str = "_r",
    tolerance_secs: float | None = None,
    bucket_secs: int | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (backward as-of,
    inclusive — pandas ``merge_asof`` semantics). Unmatched left rows keep
    NULL right values; ``tolerance_secs`` additionally voids matches
    older than the window.

    Right columns surface as ``<col><suffix>`` plus ``<on><suffix>`` (the
    matched timestamp).

    ``bucket_secs`` is the SKEW path: the default plan windows over
    ``by`` alone, so one hot key (a user with 20% of the events) lands
    its whole history in ONE sort partition — and window stages get no
    AQE skew-split help. With ``bucket_secs`` set, rows window over
    (by, time-bucket) instead — the hot key spreads across its time
    range — and cross-bucket state travels through a tiny per-bucket
    summary frame (one row per (by, bucket) that has right rows):
    bucket-final carried values, windowed by ``by`` over buckets
    (bounded by time-range/bucket_secs rows per key, independent of row
    count), are re-injected as synthetic seed rows sorting before every
    real row of the next bucket. Same semantics, two extra small
    shuffles; choose width so a (key, bucket) cell fits a task.
    """
    by = tuple(by)
    value_cols = tuple(value_cols)
    r = right.select(
        *by,
        F.col(on).alias(on),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    l_tagged = left.withColumn("__side", F.lit(1))
    both = l_tagged.unionByName(r, allowMissingColumns=True)
    carried = [f"{on}{suffix}", *[f"{c}{suffix}" for c in value_cols]]

    if bucket_secs is None:
        part_keys: list = list(by)
    else:
        bkt = F.floor(_to_secs(F.col(on)) / F.lit(int(bucket_secs)))
        both = both.withColumn("__bkt", bkt.cast("bigint"))
        part_keys = [*by, "__bkt"]
        # bucket-final carried values per (by, bucket): lexicographic
        # struct-max ordered by the event time picks the same row the
        # ordered window's last-carry would (ties on `on` are
        # order-unspecified in both formulations)
        rb_rows = both.filter(F.col("__side") == 0)
        # per-column bucket-final values: the default path carries each
        # column INDEPENDENTLY (last ignorenulls reaches past NULLs to an
        # earlier non-null), so the summary must too — a single
        # struct-max row would freeze all columns at one row and surface
        # NULL where the default path carries an older value. Restricting
        # the struct-max to rows where the column is non-null picks, per
        # column, the value at the greatest event time that has one.
        summaries = rb_rows.groupBy(*by, "__bkt").agg(
            *[
                F.max(
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(F.col(on).alias("k"), F.col(c).alias("v")),
                    )
                ).alias(f"__s_{c}")
                for c in carried
            ]
        )
        # every (by, bucket) any row touches needs a seed from the
        # closest PRECEDING bucket that has a value — per column, and
        # windowed over by alone, but on the tiny per-bucket frame, not
        # the data (a column all-NULL in a bucket leaves __s_<c> NULL,
        # so last(ignorenulls) reaches further back, like the default)
        axis = both.select(*by, "__bkt").distinct()
        wprev = (
            Window.partitionBy(*by)
            .orderBy(F.col("__bkt").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        any_seed = None
        seed_cols = []
        for c in carried:
            pc = F.last(F.col(f"__s_{c}"), ignorenulls=True).over(wprev)
            seed_cols.append(pc.alias(f"__p_{c}"))
        seeded = axis.join(summaries, [*by, "__bkt"], "left").select(
            *by, "__bkt", *seed_cols
        )
        for c in carried:
            nn = F.col(f"__p_{c}").isNotNull()
            any_seed = nn if any_seed is None else (any_seed | nn)
        seeds = seeded.filter(any_seed).select(
            *by,
            "__bkt",
            F.lit(None).cast(both.schema[on].dataType).alias(on),
            *[F.col(f"__p_{c}.v").alias(c) for c in carried],
            F.lit(-1).alias("__side"),
        )
        both = both.unionByName(seeds, allowMissingColumns=True)

    # right rows sort before left rows at an equal timestamp, so an exact
    # tie matches (inclusive backward); seed rows (NULL `on`,
    # asc_nulls_first) sort before everything in their bucket
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(F.col(on).asc_nulls_first(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = both.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in carried
        ],
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_secs is not None:
        in_tol = (
            _to_secs(F.col(on)) - _to_secs(F.col(f"__f_{on}{suffix}"))
        ) <= F.lit(float(tolerance_secs))
        sel = [
            F.when(in_tol, F.col(f"__f_{c}")).alias(c) for c in carried
        ]
    else:
        sel = [F.col(f"__f_{c}").alias(c) for c in carried]
    return out.select(*left.columns, *sel)


def _to_secs(col: Column) -> Column:
    # TIMESTAMP_NTZ has no direct numeric cast; route through TIMESTAMP
    # (identical on both sides of a join, so bucketing stays consistent)
    return col.cast("timestamp").cast("double")


def _bucket(col: Column, width_secs: int) -> Column:
    return F.floor(_to_secs(col) / width_secs).cast("bigint")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    by: tuple[str, ...] = (),
    bucket_secs: int = 3600,
    how: str = "inner",
    max_buckets: int = 1024,
) -> DataFrame:
    """Join each left row to every right interval containing its
    timestamp (``start <= t < end``), equi-joining on (by, time bucket)
    so Catalyst picks a hash join instead of a nested loop. Intervals
    longer than ``bucket_secs`` are exploded into each covered bucket
    (sequence() — one row per bucket); a (left, right) pair can match in
    at most one bucket (the left row's own), so no dedup is needed.

    The exact containment predicate is part of the JOIN CONDITION, not a
    post-join filter — with ``how='left'`` the NULL-extended rows of
    unmatched left rows would evaluate a post-filter to NULL and be
    silently dropped, degrading every outer mode to inner.

    ``max_buckets`` bounds the explode: an interval covering more than
    that many buckets raises at runtime instead of silently fanning out
    (a single year-long interval at bucket_secs=1 is a 31M-row explode
    per right row). Size ``bucket_secs`` to the typical interval width;
    raise ``max_buckets`` deliberately if wide intervals are expected.
    A NULL interval bound explodes to no buckets — the row can never
    satisfy the containment predicate (three-valued logic), so in inner/
    left modes it silently drops; in right/full it surfaces once,
    NULL-extended, like any other unmatched interval.

    ``how='right'``/``'full'`` dedupe unmatched intervals by a
    pre-explode row id (an interval spanning k buckets otherwise yields
    k identical NULL-extended rows); ``by`` columns are coalesced across
    sides so unmatched right rows keep their key values.
    """
    by = tuple(by)
    how_n = {
        "left_outer": "left",
        "right_outer": "right",
        "full_outer": "full",
        "fullouter": "full",
        "outer": "full",
    }.get(how, how)
    if how_n not in ("inner", "left", "right", "full"):
        raise ValueError(f"range_join: unsupported how={how!r}")
    right_outer = how_n in ("right", "full")

    lb = left.withColumn("__b", _bucket(F.col(left_time), bucket_secs))
    if right_outer:
        # pre-explode interval id: matched rids are collected from the
        # inner part and the unmatched intervals re-surface exactly once
        # via an anti-join on the original (un-exploded) right frame.
        # monotonically_increasing_id is only stable if both branches
        # (join input and anti-join input) read the SAME materialized
        # ids — after a shuffle or non-deterministic source the two
        # plan branches would otherwise assign different rids, silently
        # dropping or duplicating unmatched rows; localCheckpoint pins
        # the ids once (fails loudly on executor loss, never recomputes)
        right = right.withColumn(
            "__rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
    start_b = _bucket(F.col(right_start), bucket_secs)
    end_b = _bucket(F.col(right_end), bucket_secs)
    nb = end_b - start_b + F.lit(1)
    rb = right.withColumn(
        "__b",
        F.explode(
            # NULL bounds first: nb <= max is NULL there and would fall
            # into the raise_error arm; an empty array drops the row
            # (inner/left) — right/full re-surface it from the rid set
            F.when(
                F.col(right_start).isNull() | F.col(right_end).isNull(),
                F.array().cast("array<bigint>"),
            )
            .when(nb <= F.lit(int(max_buckets)), F.sequence(start_b, end_b))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "range_join: interval covers "
                        ),
                        nb.cast("string"),
                        F.lit(
                            f" buckets of {bucket_secs}s, over the "
                            f"max_buckets={max_buckets} bound; raise "
                            "bucket_secs or max_buckets"
                        ),
                    )
                )
            )
        ),
    )
    cond = [lb["__b"] == rb["__b"]] + [lb[k] == rb[k] for k in by]
    exact = (rb[right_start] <= lb[left_time]) & (
        lb[left_time] < rb[right_end]
    )
    join_how = {"right": "inner", "full": "left"}.get(how_n, how_n)
    joined = lb.join(rb, [*cond, exact], join_how)
    if right_outer:
        keep = (
            [F.coalesce(lb[k], rb[k]).alias(k) for k in by]
            + [lb[c] for c in left.columns if c not in by]
            + [rb[c] for c in right.columns if c not in by and c != "__rid"]
        )
        matched = joined.select(*keep, rb["__rid"].alias("__mrid"))
        # unmatched intervals once each: NULL-bound and zero-bucket rows
        # never reach the join, so anti-join the ORIGINAL right frame
        # against the matched rid set (tiny — one column, distinct)
        mrids = matched.select(F.col("__mrid").alias("__rid")).distinct()
        unmatched = right.join(mrids, "__rid", "left_anti").select(
            *[F.col(k) for k in by],
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in by
            ],
            *[F.col(c) for c in right.columns if c not in by and c != "__rid"],
        )
        out_cols = (
            list(by)
            + [c for c in left.columns if c not in by]
            + [c for c in right.columns if c not in by and c != "__rid"]
        )
        return matched.select(*out_cols).unionByName(unmatched)
    keep = [lb[c] for c in left.columns] + [
        rb[c] for c in right.columns if c not in by
    ]
    return joined.select(*keep)
