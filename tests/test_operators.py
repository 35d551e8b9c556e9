"""Temporal join operators (presto_ads_spark/operators/): semantics and
plan-shape checks for asof_join / range_join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from presto_ads_spark import plans
from presto_ads_spark.operators import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frame(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive_and_unmatched(spark):
    left = _frame(
        spark,
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),  # no prior right row
        ],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [
            ("u1", _ts("2024-01-01 10:00:00"), 10.0),  # exact tie -> match
            ("u1", _ts("2024-01-01 11:00:00"), 11.0),
            ("u2", _ts("2024-01-01 09:30:00"), 9.0),  # after left -> no
        ],
        "k string, ts timestamp, v double",
    )
    out = {
        r.id: (r.ts_r, r.v_r)
        for r in asof_join(
            left, right, on="ts", by=("k",), value_cols=("v",)
        ).collect()
    }
    assert out[1] == (_ts("2024-01-01 10:00:00"), 10.0)
    assert out[2] == (_ts("2024-01-01 11:00:00"), 11.0)
    assert out[3] == (None, None)


def test_asof_tolerance_voids_stale_matches(spark):
    left = _frame(
        spark,
        [(1, "u", _ts("2024-01-01 10:00:00"))],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [("u", _ts("2024-01-01 08:00:00"), 8.0)],
        "k string, ts timestamp, v double",
    )
    ok = asof_join(
        left, right, on="ts", by=("k",), value_cols=("v",),
        tolerance_secs=3 * 3600,
    ).collect()[0]
    assert ok.v_r == 8.0
    stale = asof_join(
        left, right, on="ts", by=("k",), value_cols=("v",),
        tolerance_secs=3600,
    ).collect()[0]
    assert stale.v_r is None and stale.ts_r is None
    # tolerance composes with the skew (bucketed) path: the match is two
    # buckets back, carried through the seed chain, then voided/kept by
    # the same in-tolerance predicate on the matched timestamp
    ok_b = asof_join(
        left, right, on="ts", by=("k",), value_cols=("v",),
        tolerance_secs=3 * 3600, bucket_secs=1800,
    ).collect()[0]
    assert ok_b.v_r == 8.0
    stale_b = asof_join(
        left, right, on="ts", by=("k",), value_cols=("v",),
        tolerance_secs=3600, bucket_secs=1800,
    ).collect()[0]
    assert stale_b.v_r is None and stale_b.ts_r is None


def test_asof_plan_has_no_join_node(spark):
    left = _frame(
        spark, [(1, "u", _ts("2024-01-01 10:00:00"))],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark, [("u", _ts("2024-01-01 08:00:00"), 8.0)],
        "k string, ts timestamp, v double",
    )
    df = asof_join(left, right, on="ts", by=("k",), value_cols=("v",))
    p = plans.formatted_plan(df)
    assert "Join" not in p  # union + window, never a join explosion
    plans.assert_no_python_udf(df)


def test_range_join_interval_spanning_buckets(spark):
    left = _frame(
        spark,
        [
            (1, "u", _ts("2024-01-01 10:30:00")),
            (2, "u", _ts("2024-01-01 13:30:00")),  # outside
            (3, "u", _ts("2024-01-01 12:59:59")),  # inside, 3rd bucket
        ],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [("w1", "u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 13:00:00"))],
        "wid string, k string, s timestamp, e timestamp",
    )
    out = range_join(
        left, right, left_time="ts", right_start="s", right_end="e",
        by=("k",), bucket_secs=3600,
    )
    ids = sorted(r.id for r in out.collect())
    assert ids == [1, 3]
    # end-exclusive: a row exactly at e never matches
    edge = _frame(
        spark, [(9, "u", _ts("2024-01-01 13:00:00"))],
        "id bigint, k string, ts timestamp",
    )
    assert range_join(
        edge, right, left_time="ts", right_start="s", right_end="e",
        by=("k",), bucket_secs=3600,
    ).count() == 0


def test_range_join_left_outer_keeps_unmatched(spark):
    # the containment predicate lives in the join condition, not a
    # post-join filter — a post-filter evaluates to NULL on the
    # NULL-extended rows and silently drops them (every outer mode
    # degraded to inner before round 7)
    left = _frame(
        spark,
        [
            (1, "u", _ts("2024-01-01 10:30:00")),  # matches w1
            (2, "u", _ts("2024-01-01 18:00:00")),  # no interval
            (3, "v", _ts("2024-01-01 10:30:00")),  # wrong key
        ],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [("w1", "u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "wid string, k string, s timestamp, e timestamp",
    )
    out = {
        r.id: r.wid
        for r in range_join(
            left, right, left_time="ts", right_start="s", right_end="e",
            by=("k",), bucket_secs=3600, how="left",
        ).collect()
    }
    assert out == {1: "w1", 2: None, 3: None}


def test_range_join_bounds_interval_explode(spark):
    import pytest

    left = _frame(
        spark, [(1, "u", _ts("2024-01-01 10:30:00"))],
        "id bigint, k string, ts timestamp",
    )
    # a year-long interval at 60s buckets covers ~525k buckets — must
    # raise, not silently explode
    right = _frame(
        spark,
        [("w1", "u", _ts("2024-01-01 00:00:00"), _ts("2025-01-01 00:00:00"))],
        "wid string, k string, s timestamp, e timestamp",
    )
    with pytest.raises(Exception, match="max_buckets"):
        range_join(
            left, right, left_time="ts", right_start="s", right_end="e",
            by=("k",), bucket_secs=60,
        ).collect()
    # raising the bound deliberately makes the same query run
    assert range_join(
        left, right, left_time="ts", right_start="s", right_end="e",
        by=("k",), bucket_secs=60, max_buckets=600_000,
    ).count() == 1


def test_asof_bucketed_carries_past_null_values(spark):
    # the default path carries each column independently: last(v,
    # ignorenulls) reaches past a NULL on the latest right row to an
    # older non-null, while ts_r still reflects the latest row. The
    # bucket_secs skew path must match — a single struct-max bucket
    # summary would freeze all columns at one row and surface NULL.
    left = _frame(
        spark,
        [(1, "u", _ts("2024-01-01 12:00:00"))],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [
            ("u", _ts("2024-01-01 09:00:00"), 9.0, "a"),
            # latest row in its bucket: v is NULL, w has a value
            ("u", _ts("2024-01-01 09:30:00"), None, "b"),
        ],
        "k string, ts timestamp, v double, w string",
    )
    kw = dict(on="ts", by=("k",), value_cols=("v", "w"))
    base = asof_join(left, right, **kw).collect()[0]
    skew = asof_join(left, right, bucket_secs=3600, **kw).collect()[0]
    assert (base.ts_r, base.v_r, base.w_r) == (
        _ts("2024-01-01 09:30:00"), 9.0, "b",
    )
    assert (skew.ts_r, skew.v_r, skew.w_r) == (
        base.ts_r, base.v_r, base.w_r,
    )


def test_range_join_null_bounds_do_not_crash(spark):
    # NULL interval bounds can never satisfy containment (3VL): the row
    # silently drops in inner/left — it must NOT trip the max_buckets
    # raise_error arm (nb <= max is NULL for NULL bounds)
    left = _frame(
        spark, [(1, "u", _ts("2024-01-01 10:30:00"))],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [
            ("w1", "u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("w2", "u", None, _ts("2024-01-01 11:00:00")),
            ("w3", "u", _ts("2024-01-01 10:00:00"), None),
        ],
        "wid string, k string, s timestamp, e timestamp",
    )
    kw = dict(
        left_time="ts", right_start="s", right_end="e",
        by=("k",), bucket_secs=3600,
    )
    inner = range_join(left, right, **kw).collect()
    assert [r.wid for r in inner] == ["w1"]
    # right/full surface the NULL-bound intervals once each, NULL-extended
    rows = range_join(left, right, how="right", **kw).collect()
    got = sorted((r.wid, r.id) for r in rows)
    assert got == [("w1", 1), ("w2", None), ("w3", None)]


def test_range_join_right_full_dedupe_unmatched(spark):
    # an unmatched interval spanning k buckets must surface exactly ONCE
    # in right/full modes (pre-explode rows would otherwise yield k
    # identical NULL-extended copies)
    left = _frame(
        spark,
        [
            (1, "u", _ts("2024-01-01 10:30:00")),
            (2, "v", _ts("2024-01-01 23:00:00")),  # unmatched left
        ],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [
            ("w1", "u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            # spans 5 buckets, matches nothing
            ("w2", "u", _ts("2024-01-01 14:00:00"), _ts("2024-01-01 19:00:00")),
        ],
        "wid string, k string, s timestamp, e timestamp",
    )
    kw = dict(
        left_time="ts", right_start="s", right_end="e",
        by=("k",), bucket_secs=3600,
    )
    rrows = range_join(left, right, how="right", **kw).collect()
    assert sorted((r.wid, r.id) for r in rrows) == [("w1", 1), ("w2", None)]
    # unmatched right rows keep their by-key values (coalesced across sides)
    assert {r.k for r in rrows} == {"u"}
    frows = range_join(left, right, how="full", **kw).collect()
    assert sorted(
        ((r.wid, r.id) for r in frows),
        key=lambda t: (t[0] or "", t[1] or -1),
    ) == [(None, 2), ("w1", 1), ("w2", None)]


def test_range_join_uses_hash_join_not_nested_loop(spark):
    left = _frame(
        spark, [(1, "u", _ts("2024-01-01 10:30:00"))],
        "id bigint, k string, ts timestamp",
    )
    right = _frame(
        spark,
        [("w1", "u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "wid string, k string, s timestamp, e timestamp",
    )
    df = range_join(
        left, right, left_time="ts", right_start="s", right_end="e",
        by=("k",), bucket_secs=3600,
    )
    p = plans.formatted_plan(df)
    assert "NestedLoop" not in p and "CartesianProduct" not in p
