"""Consolidated operator-family suite queries (the <=50 primary registry).

The graded driver scores only the first 50 registry entries, so every
operator family from SURVEY.md §2 must land inside that window. Each suite
below merges several single-purpose probes (now ``extended=True`` in their
home modules — still oracle-verified by pytest/verify_tool) into ONE scored
query, by composing the *absorbed queries themselves*:

- slot-union: sub-results are mapped onto a shared typed column set
  (``probe`` tag + BIGINT/VARCHAR/DOUBLE slots) and UNION ALLed — engine
  and oracle sides use the exact same mapping, so value semantics are
  untouched;
- join-merge: sub-results sharing a grain (same key column) are joined
  into one wide row;
- long-format: varchar-safe sub-results are unpivoted to
  (probe, k, metric, val) rows — Spark via explode(array(struct..)),
  DuckDB via UNPIVOT INCLUDE NULLS.

Doubles never travel through varchar (engine repr differs); timestamps/
dates/ints/booleans do (reprs verified identical).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import REGISTRY, q

# the absorbed queries' modules must be registered before this module reads
# their oracles at decoration time (load_all imports suites last, but keep
# this robust to direct imports):
from . import events  # noqa: F401
from . import functions_sql  # noqa: F401
from . import llm  # noqa: F401
from . import relational  # noqa: F401
from . import sketches  # noqa: F401
from . import tpch  # noqa: F401
from . import window  # noqa: F401

_DUCK_T = {"long": "BIGINT", "string": "VARCHAR", "double": "DOUBLE", "int": "INT"}


def _oracle(name: str) -> str:
    return REGISTRY[name].oracle


def _fn(name: str):
    return REGISTRY[name].spark_fn


# --- slot-union helpers ----------------------------------------------------


def _slots_df(df, probe: str, schema, mapping):
    exprs = [F.lit(probe).alias("probe")]
    for slot, typ in schema:
        src = mapping.get(slot)
        col = F.col(src) if src is not None else F.lit(None)
        exprs.append(col.cast(typ).alias(slot))
    return df.select(*exprs)


def _slots_sql(inner: str, probe: str, schema, mapping) -> str:
    cols = ", ".join(
        f"CAST({mapping.get(slot) if mapping.get(slot) is not None else 'NULL'}"
        f" AS {_DUCK_T[typ]}) AS {slot}"
        for slot, typ in schema
    )
    return f"SELECT '{probe}' AS probe, {cols} FROM (\n{inner}\n) __{probe}"


def _union_df(frames):
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# --- long-format helpers ---------------------------------------------------


def _long_df(df, probe: str, key: str, cols):
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("metric"), F.col(c).cast("string").alias("val")
            )
            for c in cols
        ]
    )
    return df.select(
        F.lit(probe).alias("probe"),
        F.col(key).cast("long").alias("k"),
        F.explode(entries).alias("e"),
    ).select("probe", "k", F.col("e.metric").alias("metric"), F.col("e.val").alias("val"))


def _long_sql(inner: str, probe: str, key: str, cols) -> str:
    casts = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in cols)
    collist = ", ".join(cols)
    return (
        f"SELECT '{probe}' AS probe, __k AS k, metric, val FROM (\n"
        f"  SELECT CAST({key} AS BIGINT) AS __k, {casts} FROM (\n{inner}\n) __t\n"
        f") UNPIVOT INCLUDE NULLS (val FOR metric IN ({collist}))"
    )


# ===========================================================================
# relational_surface — Values / DistinctLimit / OrderBy-NULLS-LAST / Sample
# (absorbs values_inline, distinct_limit, orderby_nulls_last,
#  sample_hash_deterministic; reference ValuesOperator.java:27,
#  DistinctLimitOperator.java:37, OrderByOperator.java:30, SampleNode)
# ===========================================================================

_REL_SCHEMA = [("k", "long"), ("s1", "string"), ("s2", "string"), ("d", "double")]
_REL_PARTS = [
    ("values", "values_inline", {"k": "id", "s1": "name", "s2": "r_name"}),
    ("distinct_limit", "distinct_limit", {"s1": "o_orderpriority"}),
    ("orderby_nulls_last", "orderby_nulls_last", {"k": "o_orderkey", "s1": "pri"}),
    ("sample", "sample_hash_deterministic", {"k": "n", "d": "total"}),
]


@q(
    "relational_surface",
    tags=("relational", "suite"),
    doc="Slot-union suite of the small relational operator probes.",
    oracle="\nUNION ALL\n".join(
        _slots_sql(_oracle(src), probe, _REL_SCHEMA, m) for probe, src, m in _REL_PARTS
    ),
)
def relational_surface(spark, sf_dir):
    return _union_df(
        [
            _slots_df(_fn(src)(spark, sf_dir), probe, _REL_SCHEMA, m)
            for probe, src, m in _REL_PARTS
        ]
    )


# ===========================================================================
# join_outer_cross_theta — full/right outer + cross/theta joins
# (absorbs join_full_outer, join_right_outer, join_cross_theta;
#  reference LookupJoinOperators.java:45-60, NestedLoopJoinOperator.java:36)
# ===========================================================================

_JOIN_SCHEMA = [("k", "long"), ("name", "string"), ("n", "long")]
_JOIN_PARTS = [
    ("full", "join_full_outer", {"k": "custkey", "name": "c_name", "n": "n_orders"}),
    ("right", "join_right_outer", {"k": "s_suppkey", "name": "s_name", "n": "n_items"}),
    ("cross_theta", "join_cross_theta", {"name": "r_name", "n": "n"}),
]


@q(
    "join_outer_cross_theta",
    tags=("join", "suite"),
    doc="Slot-union suite of the outer/cross/theta join probes.",
    oracle="\nUNION ALL\n".join(
        _slots_sql(_oracle(src), probe, _JOIN_SCHEMA, m) for probe, src, m in _JOIN_PARTS
    ),
)
def join_outer_cross_theta(spark, sf_dir):
    return _union_df(
        [
            _slots_df(_fn(src)(spark, sf_dir), probe, _JOIN_SCHEMA, m)
            for probe, src, m in _JOIN_PARTS
        ]
    )


# ===========================================================================
# setop_all — UNION ALL / INTERSECT / EXCEPT
# (absorbs setop_union_all, setop_intersect_except;
#  reference ImplementIntersectAndExceptAsUnion.java:105)
# ===========================================================================

_SETOP_SCHEMA = [("k", "long"), ("tag", "string")]
_SETOP_PARTS = [
    ("union_all", "setop_union_all", {"k": "k", "tag": "src"}),
    ("intersect_except", "setop_intersect_except", {"k": "k", "tag": "tag"}),
]


@q(
    "setop_all",
    tags=("setop", "suite"),
    doc="Set-operation suite: UNION ALL + INTERSECT + EXCEPT probes.",
    oracle="\nUNION ALL\n".join(
        _slots_sql(_oracle(src), probe, _SETOP_SCHEMA, m)
        for probe, src, m in _SETOP_PARTS
    ),
)
def setop_all(spark, sf_dir):
    return _union_df(
        [
            _slots_df(_fn(src)(spark, sf_dir), probe, _SETOP_SCHEMA, m)
            for probe, src, m in _SETOP_PARTS
        ]
    )


# ===========================================================================
# subquery_forms — scalar subquery (EnforceSingleRow) + correlated LATERAL
# (absorbs subquery_scalar_quantified, lateral_correlated)
# ===========================================================================

_SUBQ_SCHEMA = [("k", "long"), ("s", "string"), ("d", "double"), ("n", "long")]
_SUBQ_PARTS = [
    (
        "scalar_quantified",
        "subquery_scalar_quantified",
        {"k": "p_partkey", "s": "p_name", "d": "p_retailprice"},
    ),
    (
        "lateral",
        "lateral_correlated",
        {"k": "o_orderkey", "s": "max_ship_s", "n": "n_items"},
    ),
]


@q(
    "subquery_forms",
    tags=("subquery", "suite"),
    doc="Scalar-subquery + correlated-LATERAL suite (timestamps travel as "
    "VARCHAR — engine reprs verified identical).",
    oracle="\nUNION ALL\n".join(
        [
            _slots_sql(_oracle("subquery_scalar_quantified"), "scalar_quantified",
                       _SUBQ_SCHEMA, _SUBQ_PARTS[0][2]),
            _slots_sql(
                "SELECT o_orderkey, CAST(max_ship AS VARCHAR) AS max_ship_s, n_items "
                f"FROM (\n{_oracle('lateral_correlated')}\n) __lat",
                "lateral", _SUBQ_SCHEMA, _SUBQ_PARTS[1][2]),
        ]
    ),
)
def subquery_forms(spark, sf_dir):
    scalar = _slots_df(
        _fn("subquery_scalar_quantified")(spark, sf_dir),
        "scalar_quantified", _SUBQ_SCHEMA, _SUBQ_PARTS[0][2],
    )
    lat = _fn("lateral_correlated")(spark, sf_dir).select(
        "o_orderkey", F.col("max_ship").cast("string").alias("max_ship_s"), "n_items"
    )
    return scalar.unionAll(_slots_df(lat, "lateral", _SUBQ_SCHEMA, _SUBQ_PARTS[1][2]))


# ===========================================================================
# agg_groupid — GROUPING SETS + CUBE + ROLLUP (GroupIdOperator.java:32)
# (absorbs agg_grouping_sets, agg_cube, agg_rollup)
# ===========================================================================

_GID_SCHEMA = [
    ("s1", "string"), ("s2", "string"), ("n", "long"), ("d", "double"),
    ("g1", "int"), ("g2", "int"),
]
_GID_PARTS = [
    ("sets", "agg_grouping_sets",
     {"s1": "l_returnflag", "s2": "l_linestatus", "n": "n", "d": "sum_qty",
      "g1": "g_rf", "g2": "g_ls"}),
    ("cube", "agg_cube",
     {"s1": "o_orderstatus", "s2": "o_orderpriority", "n": "n", "d": "total"}),
    ("rollup", "agg_rollup",
     {"s1": "rk_s", "s2": "nk_s", "n": "n"}),
]

_ROLLUP_STR = (
    "SELECT CAST(n_regionkey AS VARCHAR) AS rk_s, "
    "CAST(n_nationkey AS VARCHAR) AS nk_s, n FROM (\n{inner}\n) __ru"
)


@q(
    "agg_groupid",
    tags=("agg", "suite"),
    doc="GroupId suite: GROUPING SETS + CUBE + ROLLUP with GROUPING() "
    "markers (reference GroupIdOperator.java:32).",
    oracle="\nUNION ALL\n".join(
        [
            _slots_sql(_oracle("agg_grouping_sets"), "sets", _GID_SCHEMA, _GID_PARTS[0][2]),
            _slots_sql(_oracle("agg_cube"), "cube", _GID_SCHEMA, _GID_PARTS[1][2]),
            _slots_sql(
                _ROLLUP_STR.format(inner=_oracle("agg_rollup")),
                "rollup", _GID_SCHEMA, _GID_PARTS[2][2]),
        ]
    ),
)
def agg_groupid(spark, sf_dir):
    sets = _slots_df(
        _fn("agg_grouping_sets")(spark, sf_dir), "sets", _GID_SCHEMA, _GID_PARTS[0][2]
    )
    cube = _slots_df(
        _fn("agg_cube")(spark, sf_dir), "cube", _GID_SCHEMA, _GID_PARTS[1][2]
    )
    ru = _fn("agg_rollup")(spark, sf_dir).select(
        F.col("n_regionkey").cast("string").alias("rk_s"),
        F.col("n_nationkey").cast("string").alias("nk_s"),
        "n",
    )
    rollup = _slots_df(ru, "rollup", _GID_SCHEMA, _GID_PARTS[2][2])
    return _union_df([sets, cube, rollup])


# ===========================================================================
# agg_misc_forms — multi-DISTINCT (MarkDistinct) + FILTER clause + min_by/
# max_by (absorbs agg_multi_distinct, agg_filter_clause, agg_min_max_by)
# ===========================================================================

_MISC_SCHEMA = [
    ("grp", "string"), ("n1", "long"), ("n2", "long"), ("n3", "long"),
    ("n4", "long"), ("d", "double"),
    ("t1", "string"), ("t2", "string"), ("t3", "string"), ("t4", "string"),
]
_MMB_STR = (
    "SELECT l_returnflag, CAST(first_line_ship AS VARCHAR) AS fls,"
    " CAST(last_line_ship AS VARCHAR) AS lls, CAST(min_ship AS VARCHAR) AS mns,"
    " CAST(max_ship AS VARCHAR) AS mxs FROM (\n{inner}\n) __mb"
)
_MISC_PARTS = [
    ("multi_distinct", "agg_multi_distinct",
     {"grp": "l_returnflag", "n1": "nd_part", "n2": "nd_supp", "n3": "nd_order",
      "n4": "n"}),
    ("filter_clause", "agg_filter_clause",
     {"grp": "o_orderstatus", "n1": "n_urgent", "n2": "n_low", "d": "urgent_total"}),
    ("min_max_by", "agg_min_max_by",
     {"grp": "l_returnflag", "t1": "fls", "t2": "lls", "t3": "mns", "t4": "mxs"}),
]


@q(
    "agg_misc_forms",
    tags=("agg", "suite"),
    doc="MarkDistinct + filtered aggregation + min_by/max_by suite.",
    oracle="\nUNION ALL\n".join(
        [
            _slots_sql(_oracle("agg_multi_distinct"), "multi_distinct",
                       _MISC_SCHEMA, _MISC_PARTS[0][2]),
            _slots_sql(_oracle("agg_filter_clause"), "filter_clause",
                       _MISC_SCHEMA, _MISC_PARTS[1][2]),
            _slots_sql(_MMB_STR.format(inner=_oracle("agg_min_max_by")),
                       "min_max_by", _MISC_SCHEMA, _MISC_PARTS[2][2]),
        ]
    ),
)
def agg_misc_forms(spark, sf_dir):
    md = _slots_df(
        _fn("agg_multi_distinct")(spark, sf_dir), "multi_distinct",
        _MISC_SCHEMA, _MISC_PARTS[0][2],
    )
    fc = _slots_df(
        _fn("agg_filter_clause")(spark, sf_dir), "filter_clause",
        _MISC_SCHEMA, _MISC_PARTS[1][2],
    )
    mb_raw = _fn("agg_min_max_by")(spark, sf_dir).select(
        "l_returnflag",
        F.col("first_line_ship").cast("string").alias("fls"),
        F.col("last_line_ship").cast("string").alias("lls"),
        F.col("min_ship").cast("string").alias("mns"),
        F.col("max_ship").cast("string").alias("mxs"),
    )
    mb = _slots_df(mb_raw, "min_max_by", _MISC_SCHEMA, _MISC_PARTS[2][2])
    return _union_df([md, fc, mb])


# ===========================================================================
# agg_structures — histogram/map_agg + array_agg + listagg/checksum
# (absorbs agg_histogram_map, agg_collect_structures, agg_listagg_checksum;
#  reference HistogramAggregation, ArrayAggregationFunction,
#  ChecksumAggregationFunction)
# ===========================================================================

_STRUCT_SCHEMA = [("grp", "string"), ("s", "string"), ("n", "long")]
_CS_STR = (
    "SELECT CAST(n_regionkey AS VARCHAR) AS grp_s, nations, n FROM (\n{inner}\n) __cs"
)
_LC_STR = (
    "SELECT CAST(n_regionkey AS VARCHAR) AS grp_s, names, checksum FROM (\n{inner}\n) __lc"
)
_STRUCT_PARTS = [
    ("histogram", "agg_histogram_map", {"grp": "l_returnflag", "s": "status_hist"}),
    ("array_agg", "agg_collect_structures", {"grp": "grp_s", "s": "nations", "n": "n"}),
    ("listagg_checksum", "agg_listagg_checksum",
     {"grp": "grp_s", "s": "names", "n": "checksum"}),
]


@q(
    "agg_structures",
    tags=("agg", "suite"),
    doc="Structure-building aggregate suite: histogram(map), array_agg, "
    "listagg + order-independent checksum (serialized to strings — the "
    "graded driver cannot hash raw array/map cells).",
    oracle="\nUNION ALL\n".join(
        [
            _slots_sql(_oracle("agg_histogram_map"), "histogram",
                       _STRUCT_SCHEMA, _STRUCT_PARTS[0][2]),
            _slots_sql(_CS_STR.format(inner=_oracle("agg_collect_structures")),
                       "array_agg", _STRUCT_SCHEMA, _STRUCT_PARTS[1][2]),
            _slots_sql(_LC_STR.format(inner=_oracle("agg_listagg_checksum")),
                       "listagg_checksum", _STRUCT_SCHEMA, _STRUCT_PARTS[2][2]),
        ]
    ),
)
def agg_structures(spark, sf_dir):
    hist = _slots_df(
        _fn("agg_histogram_map")(spark, sf_dir), "histogram",
        _STRUCT_SCHEMA, _STRUCT_PARTS[0][2],
    )
    cs_raw = _fn("agg_collect_structures")(spark, sf_dir).select(
        F.col("n_regionkey").cast("string").alias("grp_s"), "nations", "n"
    )
    cs = _slots_df(cs_raw, "array_agg", _STRUCT_SCHEMA, _STRUCT_PARTS[1][2])
    lc_raw = _fn("agg_listagg_checksum")(spark, sf_dir).select(
        F.col("n_regionkey").cast("string").alias("grp_s"), "names", "checksum"
    )
    lc = _slots_df(lc_raw, "listagg_checksum", _STRUCT_SCHEMA, _STRUCT_PARTS[2][2])
    return _union_df([hist, cs, lc])


# ===========================================================================
# window_suite — ranking + TopNRowNumber + windowed aggs/stats
# (absorbs window_ranking, window_topn_per_group, window_agg_stats;
#  reference WindowOperator.java:47, TopNRowNumberOperator.java:38)
# ===========================================================================

_WIN_SCHEMA = [
    ("k1", "long"), ("k2", "long"),
    ("n1", "long"), ("n2", "long"), ("n3", "long"), ("n4", "long"),
    ("d1", "double"), ("d2", "double"), ("d3", "double"),
]
_WIN_PARTS = [
    ("ranking", "window_ranking",
     {"k1": "o_custkey", "k2": "o_orderkey", "n1": "rn", "n2": "rk",
      "n3": "drk", "n4": "nt"}),
    ("topn", "window_topn_per_group",
     {"k1": "o_custkey", "k2": "o_orderkey", "d1": "o_totalprice"}),
    ("agg_stats", "window_agg_stats",
     {"k1": "l_orderkey", "k2": "l_linenumber", "n1": "order_lines",
      "d1": "order_qty", "d2": "pr", "d3": "cd"}),
]


@q(
    "window_suite",
    tags=("window", "suite"),
    doc="Window-function suite: row_number/rank/dense_rank/ntile, "
    "top-N-per-group (WindowGroupLimit pushdown), partition aggregates and "
    "percent_rank/cume_dist.",
    oracle="\nUNION ALL\n".join(
        _slots_sql(_oracle(src), probe, _WIN_SCHEMA, m) for probe, src, m in _WIN_PARTS
    ),
)
def window_suite(spark, sf_dir):
    return _union_df(
        [
            _slots_df(_fn(src)(spark, sf_dir), probe, _WIN_SCHEMA, m)
            for probe, src, m in _WIN_PARTS
        ]
    )


# ===========================================================================
# window_values_frames — offset/value window functions + frame specs,
# join-merged on the shared events grain (absorbs window_offset_values,
# window_frames; reference operator/window/ value functions + FrameInfo.java)
# ===========================================================================


@q(
    "window_values_frames",
    tags=("window", "suite"),
    doc="lag/lead/first/last/nth_value + ROWS/RANGE frame aggregates in one "
    "wide row per event (join-merge on event_id).",
    oracle=f"""
SELECT a.event_id, a.user_id, a.value, a.prev_v, a.prev2_v, a.next_v,
       a.first_v, a.last_v, a.second_v,
       b.moving_sum, b.running_sum, b.cnt_range
FROM (
{_oracle("window_offset_values")}
) a JOIN (
{_oracle("window_frames")}
) b ON a.event_id = b.event_id
""",
)
def window_values_frames(spark, sf_dir):
    off = _fn("window_offset_values")(spark, sf_dir)
    fr = _fn("window_frames")(spark, sf_dir).select(
        "event_id", "moving_sum", "running_sum", "cnt_range"
    )
    return off.join(fr, "event_id")


# ===========================================================================
# fn_scalars — string + binary/crypto + conditional + math scalar functions
# (absorbs fn_string, fn_binary_crypto, fn_conditional, fn_math; reference
# StringFunctions.java, VarbinaryFunctions.java, MathFunctions.java)
# ===========================================================================

_FNS_SCHEMA = [
    ("k", "long"), ("s", "string"),
    ("d1", "double"), ("d2", "double"), ("d3", "double"), ("d4", "double"),
    ("n1", "long"), ("n2", "long"), ("n3", "long"), ("n4", "long"),
]

_STRING_COLS = ["up", "lo", "len", "sub", "rep", "rev", "pad", "trm", "spart",
                "pos", "cw", "l8", "r3", "sw", "ct", "asc_c", "rep3", "lev"]
_BINARY_COLS = ["h_md5", "h_sha256", "b64", "hx", "roundtrip"]
_COND_COLS = ["bucket", "status2", "urgent", "pri_num"]


def _concat_sql(cols) -> str:
    pieces = ", ".join(f"COALESCE(CAST({c} AS VARCHAR), '<null>')" for c in cols)
    return f"concat_ws('|', {pieces})"


def _concat_df(cols):
    return F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols]
    )


@q(
    "fn_scalars",
    tags=("functions", "suite"),
    doc="Scalar-function suite over the varchar-safe string/binary/"
    "conditional probes (rows serialized to one '|'-joined string) plus the "
    "double-typed math probe in typed slots (two rows per supplier).",
    oracle="\nUNION ALL\n".join(
        [
            _slots_sql(
                f"SELECT c_custkey, {_concat_sql(_STRING_COLS)} AS s_all FROM (\n"
                f"{_oracle('fn_string')}\n) __s",
                "string", _FNS_SCHEMA, {"k": "c_custkey", "s": "s_all"}),
            _slots_sql(
                f"SELECT c_custkey, {_concat_sql(_BINARY_COLS)} AS s_all FROM (\n"
                f"{_oracle('fn_binary_crypto')}\n) __b",
                "binary_crypto", _FNS_SCHEMA, {"k": "c_custkey", "s": "s_all"}),
            _slots_sql(
                f"SELECT o_orderkey, {_concat_sql(_COND_COLS)} AS s_all, safe_div "
                f"FROM (\n{_oracle('fn_conditional')}\n) __c",
                "conditional", _FNS_SCHEMA,
                {"k": "o_orderkey", "s": "s_all", "d1": "safe_div"}),
            _slots_sql(_oracle("fn_math"), "math_a", _FNS_SCHEMA,
                       {"k": "s_suppkey", "d1": "ab", "d2": "rd", "d3": "sq",
                        "d4": "sg", "n1": "ce", "n2": "fl", "n3": "md",
                        "n4": "bucket"}),
            _slots_sql(_oracle("fn_math"), "math_b", _FNS_SCHEMA,
                       {"k": "s_suppkey", "d1": "gr", "d2": "le", "d3": "sqr"}),
        ]
    ),
)
def fn_scalars(spark, sf_dir):
    st = _fn("fn_string")(spark, sf_dir).select(
        "c_custkey", _concat_df(_STRING_COLS).alias("s_all")
    )
    bi = _fn("fn_binary_crypto")(spark, sf_dir).select(
        "c_custkey", _concat_df(_BINARY_COLS).alias("s_all")
    )
    co = _fn("fn_conditional")(spark, sf_dir).select(
        "o_orderkey", _concat_df(_COND_COLS).alias("s_all"), "safe_div"
    )
    ma = _fn("fn_math")(spark, sf_dir)
    return _union_df(
        [
            _slots_df(st, "string", _FNS_SCHEMA, {"k": "c_custkey", "s": "s_all"}),
            _slots_df(bi, "binary_crypto", _FNS_SCHEMA, {"k": "c_custkey", "s": "s_all"}),
            _slots_df(co, "conditional", _FNS_SCHEMA,
                      {"k": "o_orderkey", "s": "s_all", "d1": "safe_div"}),
            _slots_df(ma, "math_a", _FNS_SCHEMA,
                      {"k": "s_suppkey", "d1": "ab", "d2": "rd", "d3": "sq",
                       "d4": "sg", "n1": "ce", "n2": "fl", "n3": "md",
                       "n4": "bucket"}),
            _slots_df(ma, "math_b", _FNS_SCHEMA,
                      {"k": "s_suppkey", "d1": "gr", "d2": "le", "d3": "sqr"}),
        ]
    )


# ===========================================================================
# fn_mixed_scalars — datetime + json + url + regexp, long-format
# (absorbs fn_datetime, fn_json, fn_url, fn_regexp; reference
# DateTimeFunctions.java, JsonFunctions.java, UrlFunctions.java,
# JoniRegexpFunctions.java) — all outputs varchar-safe.
# ===========================================================================

_DT_COLS = ["y", "qt", "mo", "d", "dow_iso", "doy", "woy", "mstart", "plus30",
            "days_since", "unix_s", "ym"]
_MIXED_PARTS = [
    ("datetime", "fn_datetime", "o_orderkey", _DT_COLS),
    ("json", "fn_json", "event_id", ["k", "inner_v", "arr_1", "arr_len", "tag"]),
    ("url", "fn_url", "event_id",
     ["url", "proto", "host", "path", "query", "param_k"]),
    ("regexp", "fn_regexp", "p_partkey",
     ["w1", "w2", "starred", "is_color", "n_vowels"]),
]


@q(
    "fn_mixed_scalars",
    tags=("functions", "suite"),
    doc="Long-format (probe, key, metric, val) suite of the datetime/json/"
    "url/regexp probes — every value varchar-safe (int/bool/date/timestamp "
    "string reprs verified identical across engines).",
    oracle="\nUNION ALL\n".join(
        _long_sql(
            # DuckDB date_trunc('month', ts) yields DATE (Spark: timestamp)
            # → re-cast mstart so the varchar reprs agree.
            "SELECT o_orderkey, "
            + ", ".join("CAST(mstart AS TIMESTAMP) AS mstart" if c == "mstart" else c
                        for c in _DT_COLS)
            + f" FROM (\n{_oracle(src)}\n) __dt"
            if probe == "datetime" else _oracle(src),
            probe, key, cols)
        for probe, src, key, cols in _MIXED_PARTS
    ),
)
def fn_mixed_scalars(spark, sf_dir):
    return _union_df(
        [
            _long_df(_fn(src)(spark, sf_dir), probe, key, cols)
            for probe, src, key, cols in _MIXED_PARTS
        ]
    )


# ===========================================================================
# fn_array_unnest — array HOF lambdas + UNNEST WITH ORDINALITY, long-format
# (absorbs fn_array_lambda, unnest_ordinality; reference Array*.java +
# FunctionRegistry.java:642, UnnestOperator.java:35)
# ===========================================================================

_LAMBDA_COLS = ["n_toks", "first_tok", "last_tok", "n_distinct", "has_spark",
                "first3", "min_tok", "n_long", "total_chars", "top2_upper"]


@q(
    "fn_array_unnest",
    tags=("functions", "array", "unnest", "suite"),
    doc="Array-lambda probe (long-format per doc) + UNNEST WITH ORDINALITY "
    "rows (metric = 'tok_<ordinal>').",
    oracle="\nUNION ALL\n".join(
        [
            _long_sql(_oracle("fn_array_lambda"), "lambda", "doc_id", _LAMBDA_COLS),
            "SELECT 'unnest' AS probe, CAST(doc_id AS BIGINT) AS k, "
            "'tok_' || CAST(ord AS VARCHAR) AS metric, tok AS val FROM (\n"
            + _oracle("unnest_ordinality") + "\n) __u",
        ]
    ),
)
def fn_array_unnest(spark, sf_dir):
    lam = _long_df(_fn("fn_array_lambda")(spark, sf_dir), "lambda", "doc_id", _LAMBDA_COLS)
    un = _fn("unnest_ordinality")(spark, sf_dir).select(
        F.lit("unnest").alias("probe"),
        F.col("doc_id").cast("long").alias("k"),
        F.concat(F.lit("tok_"), F.col("ord").cast("string")).alias("metric"),
        F.col("tok").alias("val"),
    )
    return lam.unionAll(un)


# ===========================================================================
# sketch_digests — qdigest_agg/value_at_quantile + merge() mergeability +
# SetDigest similarity, long-format slot union
# (absorbs qdigest_quantiles, qdigest_merge_rollup, setdigest_jaccard;
#  reference QuantileDigestAggregationFunction.java / SetDigestFunctions.java)
# ===========================================================================


@q(
    "sketch_digests",
    tags=("functions", "approx", "sketch", "suite"),
    doc="Mergeable-sketch suite: qdigest direct per-group sketches, "
    "fine→coarse merge() rollup, and SetDigest (minhash+HLL) pairwise "
    "set similarity — every probe emits error-bound checks (oracle TRUE).",
    oracle=f"""
SELECT 'direct' AS probe, o_orderpriority AS key,
       p50_ok AS c1, p90_ok AS c2, p99_ok AS c3, weight_ok AS c4
FROM (
{_oracle("qdigest_quantiles")}
) __qa
UNION ALL
SELECT 'merged' AS probe, o_orderpriority AS key,
       p50_ok AS c1, p90_ok AS c2, p99_ok AS c3, weight_ok AS c4
FROM (
{_oracle("qdigest_merge_rollup")}
) __qb
UNION ALL
SELECT 'setdigest' AS probe, pa || '|' || pb AS key,
       card_ok AS c1, jaccard_ok AS c2, inter_ok AS c3, TRUE AS c4
FROM (
{_oracle("setdigest_jaccard")}
) __sd
""",
)
def sketch_digests(spark, sf_dir):
    def shape(df, probe, key_col, checks):
        return df.select(
            F.lit(probe).alias("probe"),
            key_col.alias("key"),
            *[c.alias(f"c{i + 1}") for i, c in enumerate(checks)],
        )

    direct = _fn("qdigest_quantiles")(spark, sf_dir)
    merged = _fn("qdigest_merge_rollup")(spark, sf_dir)
    setd = _fn("setdigest_jaccard")(spark, sf_dir)
    qcols = [F.col(c) for c in ("p50_ok", "p90_ok", "p99_ok", "weight_ok")]
    return (
        shape(direct, "direct", F.col("o_orderpriority"), qcols)
        .unionAll(shape(merged, "merged", F.col("o_orderpriority"), qcols))
        .unionAll(
            shape(
                setd,
                "setdigest",
                F.concat(F.col("pa"), F.lit("|"), F.col("pb")),
                [
                    F.col("card_ok"),
                    F.col("jaccard_ok"),
                    F.col("inter_ok"),
                    F.lit(True),
                ],
            )
        )
    )
