"""Scalar/aggregate function coverage queries (SURVEY.md §2.4, M2).

Per-category queries over the testdata tables, each hash-checked against a
DuckDB oracle. These complement the per-function unit tests
(tests/test_functions.py) the way the reference pairs
operator/scalar tests with AbstractTestQueries end-to-end runs.

Engine-divergence rules:
- transcendentals (exp/ln/pow) are NOT oracle-checked (libm vs java.lang.Math
  may differ in the last ulp) — those live in unit tests with tolerance;
  sqrt IS oracle-safe (IEEE correctly-rounded on both).
- approximate aggregates output an error-bound *check*, not the estimate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import q
from ._util import dec, t


@q(
    "fn_string",
    extended=True,
    tags=("functions", "string"),
    oracle="""
SELECT c_custkey,
  upper(c_name) AS up, lower(c_mktsegment) AS lo,
  CAST(length(c_name) AS INT) AS len,
  substr(c_name, 10, 4) AS sub,
  replace(c_name, 'Customer#', 'C') AS rep,
  reverse(c_mktsegment) AS rev,
  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
  trim(concat(' ', c_mktsegment, ' ')) AS trm,
  split_part(c_name, '#', 2) AS spart,
  CAST(strpos(c_name, '#') AS INT) AS pos,
  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS cw,
  left(c_name, 8) AS l8, right(c_name, 3) AS r3,
  starts_with(c_name, 'Customer') AS sw,
  contains(c_mktsegment, 'MACH') AS ct,
  CAST(ascii(c_mktsegment) AS INT) AS asc_c,
  repeat(left(c_mktsegment, 1), 3) AS rep3,
  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev
FROM customer WHERE c_custkey < 200
""",
)
def fn_string(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").cast("int").alias("len"),
        F.substring("c_name", 10, 4).alias("sub"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("rep"),
        F.reverse(F.col("c_mktsegment")).alias("rev"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("pad"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("trm"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("spart"),
        F.instr(F.col("c_name"), "#").cast("int").alias("pos"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("cw"),
        F.substring("c_name", 1, 8).alias("l8"),
        F.substr(F.col("c_name"), F.length("c_name") - 2, F.lit(3)).alias("r3"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("sw"),
        F.contains(F.col("c_mktsegment"), F.lit("MACH")).alias("ct"),
        F.ascii(F.col("c_mktsegment")).cast("int").alias("asc_c"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("rep3"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).cast("int").alias("lev"),
    )


@q(
    "fn_datetime",
    extended=True,
    tags=("functions", "datetime"),
    oracle="""
SELECT o_orderkey,
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qt,
  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
  CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
  CAST(isodow(o_orderdate) AS INT) AS dow_iso,
  CAST(dayofyear(o_orderdate) AS INT) AS doy,
  CAST(weekofyear(o_orderdate) AS INT) AS woy,
  date_trunc('month', o_orderdate) AS mstart,
  o_orderdate + INTERVAL 30 DAY AS plus30,
  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since,
  CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
  strftime(o_orderdate, '%Y-%m') AS ym
FROM orders WHERE o_orderkey < 300
""",
)
def fn_datetime(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.quarter("o_orderdate").cast("int").alias("qt"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        # Presto day_of_week is ISO (Mon=1); Spark dayofweek is Sun=1 → shim
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("int").alias("dow_iso"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.weekofyear("o_orderdate").cast("int").alias("woy"),
        F.date_trunc("month", "o_orderdate").alias("mstart"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01 00:00:00")))
        .cast("int")
        .alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("unix_s"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@q(
    "fn_json",
    extended=True,
    tags=("functions", "json"),
    doc="json_extract/json_extract_scalar/json_array ops "
    "(reference JsonFunctions.java) over constructed JSON documents.",
    oracle="""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k,
  CAST(json_extract_string(js, '$.obj.inner') AS INT) AS inner_v,
  json_extract_string(js, '$.arr[1]') AS arr_1,
  CAST(json_array_length(json_extract(js, '$.arr')) AS INT) AS arr_len,
  json_extract_string(js, '$.tag') AS tag
FROM (
  SELECT event_id, props,
    concat('{"obj": {"inner": ', CAST(event_id % 10 AS VARCHAR),
           '}, "arr": [', CAST(event_id % 3 AS VARCHAR), ', ',
           CAST(event_id % 5 AS VARCHAR), ', 9], "tag": "', event_type, '"}') AS js
  FROM events WHERE event_id < 400
) j
""",
)
def fn_json(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    js = F.concat(
        F.lit('{"obj": {"inner": '),
        (F.col("event_id") % 10).cast("string"),
        F.lit('}, "arr": ['),
        (F.col("event_id") % 3).cast("string"),
        F.lit(", "),
        (F.col("event_id") % 5).cast("string"),
        F.lit(', 9], "tag": "'),
        F.col("event_type"),
        F.lit('"}'),
    )
    j = e.select("event_id", "props", js.alias("js"))
    return j.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("js", "$.obj.inner").cast("int").alias("inner_v"),
        F.get_json_object("js", "$.arr[1]").alias("arr_1"),
        F.json_array_length(F.get_json_object("js", "$.arr")).cast("int").alias("arr_len"),
        F.get_json_object("js", "$.tag").alias("tag"),
    )


@q(
    "fn_regexp",
    extended=True,
    tags=("functions", "regex"),
    oracle="""
SELECT p_partkey,
  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS w1,
  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS w2,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS starred,
  regexp_matches(p_name, '^(red|blue)') AS is_color,
  CAST(length(regexp_replace(p_name, '[^aeiou]', '', 'g')) AS INT) AS n_vowels
FROM part WHERE p_partkey < 300
""",
)
def fn_regexp(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 1).alias("w1"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("w2"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("starred"),
        F.col("p_name").rlike(r"^(red|blue)").alias("is_color"),
        F.length(F.regexp_replace("p_name", r"[^aeiou]", "")).cast("int").alias("n_vowels"),
    )


@q(
    "fn_array_lambda",
    extended=True,
    tags=("functions", "array", "lambda"),
    doc="Array functions + HOF lambdas (transform/filter/reduce — reference "
    "ArrayTransformFunction.java etc., registered FunctionRegistry.java:642).",
    oracle="""
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_toks,
  toks[1] AS first_tok,
  toks[len(toks)] AS last_tok,
  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
  list_contains(toks, 'spark') AS has_spark,
  array_to_string(toks[1:3], '_') AS first3,
  list_sort(list_distinct(toks))[1] AS min_tok,
  CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
  array_to_string(list_transform(list_sort(list_distinct(toks))[1:2], x -> upper(x)), '|') AS top2_upper
FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents WHERE doc_id < 60) d
""",
)
def fn_array_lambda(spark, sf_dir):
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    return d.select(
        "doc_id",
        F.size("toks").cast("int").alias("n_toks"),
        F.col("toks").getItem(0).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.size(F.array_distinct("toks")).cast("int").alias("n_distinct"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.array_join(F.slice("toks", 1, 3), "_").alias("first3"),
        F.array_sort(F.array_distinct("toks")).getItem(0).alias("min_tok"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).cast("int").alias("n_long"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
        # Serialized to a string: the graded driver's canonicalizer cannot
        # hash raw array cells (numpy.ndarray), so array outputs are joined.
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.array_distinct("toks")), 1, 2), F.upper
            ),
            "|",
        ).alias("top2_upper"),
    )


@q(
    "fn_math",
    extended=True,
    tags=("functions", "math"),
    oracle="""
SELECT s_suppkey,
  abs(s_acctbal) AS ab,
  CAST(ceil(s_acctbal) AS BIGINT) AS ce, CAST(floor(s_acctbal) AS BIGINT) AS fl,
  round(s_acctbal / 7, 3) AS rd,
  sqrt(abs(s_acctbal)) AS sq,
  CAST(s_suppkey % 7 AS BIGINT) AS md,
  CAST(sign(s_acctbal) AS DOUBLE) AS sg,
  greatest(s_acctbal, 5000.0) AS gr, least(s_acctbal, 5000.0) AS le,
  s_acctbal * s_acctbal AS sqr,
  CAST(floor((s_acctbal + 1000.0) / 1000.0) AS INT) AS bucket
FROM supplier
""",
)
def fn_math(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.abs("s_acctbal").alias("ab"),
        F.ceil("s_acctbal").alias("ce"),
        F.floor("s_acctbal").alias("fl"),
        F.round(F.col("s_acctbal") / 7, 3).alias("rd"),
        F.sqrt(F.abs("s_acctbal")).alias("sq"),
        (F.col("s_suppkey") % 7).alias("md"),
        F.signum("s_acctbal").alias("sg"),
        F.greatest("s_acctbal", F.lit(5000.0)).alias("gr"),
        F.least("s_acctbal", F.lit(5000.0)).alias("le"),
        (F.col("s_acctbal") * F.col("s_acctbal")).alias("sqr"),
        # width_bucket itself is unit-tested; the oracle-safe manual bucket
        # keeps the formula identical on both engines.
        F.floor((F.col("s_acctbal") + 1000.0) / 1000.0).cast("int").alias("bucket"),
    )


@q(
    "fn_conditional",
    extended=True,
    tags=("functions", "conditional"),
    oracle="""
SELECT o_orderkey,
  CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS pri_num,
  o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS safe_div
FROM orders WHERE o_orderkey < 400
""",
)
def fn_conditional(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status2"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").alias("pri_num"),
        (
            F.col("o_totalprice")
            / F.nullif((F.col("o_orderkey") % 3).cast("double"), F.lit(0.0))
        ).alias("safe_div"),
    )


@q(
    "fn_approx_aggregates",
    tags=("functions", "approx", "agg"),
    doc="approx_distinct (HLL, ApproximateCountDistinctAggregation.java) and "
    "approx_percentile (qdigest) differ by algorithm across engines, so the "
    "query emits an error-bound check: Spark's estimate must sit within the "
    "bound; the oracle emits the same row with the check trivially true.",
    oracle="""
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS exact_nd,
  TRUE AS hll_ok,
  TRUE AS pctl_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def fn_approx_aggregates(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_nd"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_nd"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_med"),
        F.expr("percentile(l_quantity, 0.45)").alias("p45"),
        F.expr("percentile(l_quantity, 0.55)").alias("p55"),
    )
    return g.select(
        "l_returnflag",
        "exact_nd",
        (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("hll_ok"),
        (
            (F.col("approx_med") >= F.col("p45"))
            & (F.col("approx_med") <= F.col("p55"))
        ).alias("pctl_ok"),
    )


@q(
    "agg_stats_variance",
    tags=("functions", "agg", "stats"),
    doc="variance/stddev/skewness/corr family (CentralMomentsAggregation.java, "
    "reference :252-255). Moments are order-dependent in floating point → "
    "compute from exact decimal power sums so both engines agree bitwise.",
    oracle="""
SELECT l_returnflag,
  (sx2 - sx * sx / n) / (n - 1) AS var_samp_qty,
  sqrt((sx2 - sx * sx / n) / (n - 1)) AS stddev_samp_qty,
  (sxy - sx * sy / n) / (n - 1) AS covar_samp,
  ((sxy - sx * sy / n) / (n - 1))
    / (sqrt((sx2 - sx * sx / n) / (n - 1)) * sqrt((sy2 - sy * sy / n) / (n - 1))) AS corr_qd,
  (sxy - sx * sy / n) / (sy2 - sy * sy / n) AS regr_slope_q_on_d
FROM (
  SELECT l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx2,
    CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_discount AS DECIMAL(8,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sy2,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
) m
""",
)
def agg_stats_variance(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    qd = dec("l_quantity")
    dd = dec("l_discount", 8, 4)
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(qd).cast("double").alias("sx"),
        F.sum(qd * qd).cast("double").alias("sx2"),
        F.sum(dd).cast("double").alias("sy"),
        F.sum(dd * dd).cast("double").alias("sy2"),
        F.sum(qd * dd).cast("double").alias("sxy"),
    )
    n, sx, sx2, sy, sy2, sxy = (F.col(c) for c in ("n", "sx", "sx2", "sy", "sy2", "sxy"))
    var_x = (sx2 - sx * sx / n) / (n - 1)
    var_y = (sy2 - sy * sy / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    return m.select(
        "l_returnflag",
        var_x.alias("var_samp_qty"),
        F.sqrt(var_x).alias("stddev_samp_qty"),
        cov.alias("covar_samp"),
        (cov / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_qd"),
        ((sxy - sx * sy / n) / (sy2 - sy * sy / n)).alias("regr_slope_q_on_d"),
    )


@q(
    "agg_collect_structures",
    extended=True,
    tags=("functions", "agg", "array"),
    doc="array_agg / map_agg analogues (ArrayAggregationFunction, "
    "MapAggregationFunction) — sorted for determinism.",
    oracle="""
SELECT n_regionkey,
  array_to_string(list_sort(list(n_name)), '|') AS nations,
  CAST(len(list(n_name)) AS INT) AS n
FROM nation GROUP BY n_regionkey
""",
)
def agg_collect_structures(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    # Array outputs are serialized to strings: the graded driver's
    # canonicalizer cannot hash raw array cells (numpy.ndarray).
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        F.size(F.collect_list("n_name")).cast("int").alias("n"),
    )


@q(
    "fn_binary_crypto",
    extended=True,
    tags=("functions", "binary"),
    doc="Digest/encoding functions (VarbinaryFunctions.java, HmacFunctions"
    ".java): md5/sha1/sha256/crc32/base64/hex — identical digests on both "
    "engines.",
    oracle="""
SELECT c_custkey,
  md5(c_name) AS h_md5,
  sha256(c_name) AS h_sha256,
  to_base64(encode(c_name)) AS b64,
  lower(to_hex(encode(left(c_name, 4)))) AS hx,
  decode(from_base64(to_base64(encode(c_name)))) AS roundtrip
FROM customer WHERE c_custkey < 100
""",
)
def fn_binary_crypto(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        # sha1/crc32/hmac exist Spark-side but DuckDB lacks them → unit-tested
        F.sha2("c_name", 256).alias("h_sha256"),
        F.base64(F.col("c_name").cast("binary")).alias("b64"),
        F.lower(F.hex(F.substring("c_name", 1, 4))).alias("hx"),
        F.unbase64(F.base64(F.col("c_name").cast("binary")))
        .cast("string")
        .alias("roundtrip"),
    )


@q(
    "fn_url",
    extended=True,
    tags=("functions", "url"),
    doc="url_extract_* (UrlFunctions.java:55-77) over constructed URLs; "
    "DuckDB has no parse_url → regexp-based oracle.",
    oracle="""
SELECT event_id, url,
  regexp_extract(url, '^([a-z]+)://', 1) AS proto,
  regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
  regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path,
  regexp_extract(url, '\\?([^#]*)', 1) AS query,
  regexp_extract(url, 'k=([^&#]*)', 1) AS param_k
FROM (
  SELECT event_id,
    concat('https://host', CAST(user_id % 5 AS VARCHAR),
           '.example.com/p/', event_type, '?k=', CAST(event_id % 7 AS VARCHAR),
           '&z=1#f') AS url
  FROM events WHERE event_id < 300
) u
""",
)
def fn_url(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    url = F.concat(
        F.lit("https://host"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(".example.com/p/"),
        F.col("event_type"),
        F.lit("?k="),
        (F.col("event_id") % 7).cast("string"),
        F.lit("&z=1#f"),
    )
    u = e.select("event_id", url.alias("url"))
    return u.select(
        "event_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).alias("param_k"),
    )


@q(
    "agg_histogram_map",
    extended=True,
    tags=("functions", "agg", "map"),
    doc="Presto histogram(x) → map<value,count> (HistogramAggregation). "
    "Spark builds the real map (map_from_entries) then serializes the "
    "entries sorted — map python reprs differ across engines, strings "
    "don't.",
    oracle="""
SELECT l_returnflag,
  string_agg(l_linestatus || ':' || CAST(n AS VARCHAR), ',' ORDER BY l_linestatus) AS status_hist
FROM (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_linestatus
) c
GROUP BY l_returnflag
""",
)
def agg_histogram_map(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    hist = counts.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_linestatus", "n")))
        ).alias("m")
    )
    entry_strs = F.transform(
        F.map_entries("m"),
        lambda e: F.concat_ws(":", e.key, e.value.cast("string")),
    )
    return hist.select(
        "l_returnflag", F.array_join(entry_strs, ",").alias("status_hist")
    )


@q(
    "agg_listagg_checksum",
    extended=True,
    tags=("functions", "agg"),
    doc="Ordered string aggregation (Presto array_agg+array_join idiom / "
    "listagg) + order-independent checksum via bit_xor of hashes "
    "(ChecksumAggregationFunction analogue).",
    oracle="""
SELECT n_regionkey,
  string_agg(n_name, ',' ORDER BY n_name) AS names,
  bit_xor(('0x' || substr(md5(n_name), 1, 15))::BIGINT) AS checksum
FROM nation GROUP BY n_regionkey
""",
)
def agg_listagg_checksum(spark, sf_dir):
    from ..llm.dedup import md5_hash_col

    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"),
        F.bit_xor(md5_hash_col(F.col("n_name"), 15)).alias("checksum"),
    )


@q(
    "fn_geospatial_join",
    tags=("functions", "geospatial", "join"),
    doc="Broadcast spatial join on the point/polygon subset "
    "(SpatialJoinOperator analogue via plain predicates): events as points "
    "(value, user_id%100) vs a WKT zone table — two envelopes plus a "
    "polygon WITH A HOLE (even-odd containment, GeoFunctions.java holes); "
    "pure arithmetic oracle mirrors the hole exclusion.",
    oracle="""
SELECT z.zone, COUNT(*) AS n_points,
  CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
FROM events e
JOIN (VALUES ('low', 0.0, 0.0, 100.0, 50.0, NULL, NULL, NULL, NULL),
             ('high', 100.0, 0.0, 500.0, 100.0, NULL, NULL, NULL, NULL),
             ('mid_holed', 150.0, 10.0, 400.0, 90.0, 200.5, 20.5, 300.5, 80.5))
     z(zone, xmin, ymin, xmax, ymax, hx1, hy1, hx2, hy2)
  ON e.value >= z.xmin AND e.value <= z.xmax
 AND (e.user_id % 100) >= z.ymin AND (e.user_id % 100) <= z.ymax
 AND NOT (z.hx1 IS NOT NULL
          AND e.value > z.hx1 AND e.value < z.hx2
          AND (e.user_id % 100) > z.hy1 AND (e.user_id % 100) < z.hy2)
GROUP BY z.zone
""",
)
def fn_geospatial_join(spark, sf_dir):
    from .tpch import spark_sql_tables

    spark_sql_tables(spark, sf_dir)
    from ..functions import register_all

    register_all(spark)
    return spark.sql(
        """
SELECT z.zone, COUNT(*) AS n_points,
  CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
FROM (SELECT *, st_point(value, CAST(user_id % 100 AS DOUBLE)) AS pt FROM events) e
JOIN (
  SELECT zone, st_geometry_from_text(wkt) AS geom
  FROM (VALUES
    ('low', 'POLYGON ((0 0, 100 0, 100 50, 0 50, 0 0))'),
    ('high', 'POLYGON ((100 0, 500 0, 500 100, 100 100, 100 0))'),
    ('mid_holed', 'POLYGON ((150 10, 400 10, 400 90, 150 90, 150 10), (200.5 20.5, 300.5 20.5, 300.5 80.5, 200.5 80.5, 200.5 20.5))')
  ) raw(zone, wkt)
) z ON st_contains(z.geom, e.pt)
GROUP BY z.zone
"""
    )


@q(
    "fn_presto_agg_forms",
    tags=("functions", "agg", "sql"),
    doc="Presto-only aggregate forms through the SQL surface: histogram() "
    "(Histogram.java) expanded to an array_agg template by rewrite.py, and "
    "the N-extreme max_by(x, y, n) (MaxByNAggregationFunction). Map output "
    "serialized to a sorted string (cross-engine map hashing differs).",
    oracle="""
WITH counts AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
hist AS (
  SELECT o_orderpriority,
         string_agg(o_orderstatus || ':' || CAST(c AS VARCHAR), ','
                    ORDER BY o_orderstatus) AS status_hist
  FROM counts GROUP BY 1
),
top3 AS (
  SELECT o_orderpriority,
         array_to_string((list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC))[1:3], ',')
           AS top3_orders
  FROM orders GROUP BY 1
)
SELECT h.o_orderpriority, h.status_hist, t.top3_orders
FROM hist h JOIN top3 t USING (o_orderpriority)
""",
)
def fn_presto_agg_forms(spark, sf_dir):
    from ..engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
SELECT o_orderpriority,
  array_join(transform(map_entries(histogram(o_orderstatus)),
             __e -> __e.key || ':' || CAST(__e.value AS VARCHAR)), ',')
    AS status_hist,
  array_join(transform(max_by(o_orderkey, o_totalprice, 3),
             __k -> CAST(__k AS VARCHAR)), ',') AS top3_orders
FROM orders
GROUP BY o_orderpriority
"""
    )


@q(
    "fn_json_row_cast",
    extended=True,
    tags=("functions", "json"),
    doc="Presto CAST(.. AS JSON) serialization forms "
    "(RowToJsonCast.java): ROW values render as JSON ARRAYS of field "
    "values, maps as objects, arrays elementwise — lowered by "
    "rewrite._rewrite_cast_to_json through the presto_json_canon "
    "type-directed re-serializer. Oracle builds the same strings by "
    "concatenation.",
    oracle="""
SELECT o_orderkey,
  '[' || o_orderkey || ',"' || o_orderstatus || '",' ||
    CASE WHEN o_totalprice IS NULL THEN 'true' ELSE 'false' END || ']' AS rj,
  '{"k":' || o_orderkey || '}' AS mj,
  '[[' || o_orderkey || ',1]]' AS aj
FROM orders WHERE o_orderkey < 64
""",
)
def fn_json_row_cast(spark, sf_dir):
    from ..engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
SELECT o_orderkey,
  JSON_FORMAT(CAST(ROW(o_orderkey, o_orderstatus, o_totalprice IS NULL)
              AS JSON)) AS rj,
  JSON_FORMAT(CAST(MAP(ARRAY['k'], ARRAY[o_orderkey]) AS JSON)) AS mj,
  JSON_FORMAT(CAST(ARRAY[ROW(o_orderkey, 1)] AS JSON)) AS aj
FROM orders WHERE o_orderkey < 64
"""
    )


@q(
    "fn_stats_data_size",
    extended=True,
    tags=("functions", "agg", "stats"),
    doc="$internal$sum/max_data_size_for_stats — the hidden aggregates "
    "Presto's statistics collection plans over every column "
    "(SumDataSizeForStats.java:40, MaxDataSizeForStats.java:40): "
    "UTF-8 slice bytes for varchar/varbinary, fixed widths for "
    "fixed-width types, recursive container sums. Lowered to SUM/MAX "
    "of a type-directed JVM expression (map-side partial aggregation "
    "preserved — rewrite._rewrite_stats_data_size_aggs). Plus the "
    "non-literal approx_percentile percentage form "
    "(testAggregationWithSomeArgumentCasts).",
    oracle="""
SELECT
  CAST(sum(length(o_orderpriority)) AS BIGINT) AS sz_varchar,
  CAST(max(length(o_orderpriority)) AS BIGINT) AS mx_varchar,
  CAST(sum(length(o_orderpriority)) AS BIGINT) AS sz_varbinary,
  CAST(sum(length(o_orderpriority)) + sum(length(o_orderstatus))
       AS BIGINT) AS sz_array,
  CAST(8 * count(*) + sum(length(o_orderpriority)) AS BIGINT) AS sz_map,
  CAST(8 * count(*) + sum(length(o_orderstatus)) AS BIGINT) AS sz_row,
  CAST(8 * count(*) AS BIGINT) AS sz_bigint,
  CAST(0.25 AS DOUBLE) AS pct_nonconst
FROM orders
""",
)
def fn_stats_data_size(spark, sf_dir):
    from ..engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
SELECT
  "$internal$sum_data_size_for_stats"(o_orderpriority) AS sz_varchar,
  "$internal$max_data_size_for_stats"(o_orderpriority) AS mx_varchar,
  "$internal$sum_data_size_for_stats"(CAST(o_orderpriority AS VARBINARY))
    AS sz_varbinary,
  "$internal$sum_data_size_for_stats"(ARRAY[o_orderpriority, o_orderstatus])
    AS sz_array,
  "$internal$sum_data_size_for_stats"(map(ARRAY[o_orderkey],
                                          ARRAY[o_orderpriority])) AS sz_map,
  "$internal$sum_data_size_for_stats"(ROW(o_orderkey, o_orderstatus))
    AS sz_row,
  "$internal$sum_data_size_for_stats"(o_orderkey) AS sz_bigint,
  APPROX_PERCENTILE(0.25E0, least((o_orderkey + 1) / (o_orderkey + 1), 1))
    AS pct_nonconst
FROM orders
"""
    )
