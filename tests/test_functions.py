"""Per-function unit tests for the compat layer, mirroring the reference's
operator/scalar tests (presto-main/src/test/.../operator/scalar/): literal
in → expected literal out, via the SQL surface the functions are registered
on."""

from __future__ import annotations

import math

import pytest


def one(engine, expr: str):
    return engine.sql(f"SELECT {expr} AS v").collect()[0].v


def test_strpos(engine):
    assert one(engine, "strpos('hello world', 'o w')") == 5
    assert one(engine, "strpos('hello', 'zz')") == 0


def test_hamming_distance(engine):
    assert one(engine, "hamming_distance('karolin', 'kathrin')") == 3
    assert one(engine, "hamming_distance('abc', 'abc')") == 0


def test_codepoint(engine):
    assert one(engine, "codepoint('A')") == 65


def test_split_to_map(engine):
    assert one(engine, "split_to_map('a=1,b=2', ',', '=')") == {"a": "1", "b": "2"}


def test_truncate(engine):
    assert one(engine, "truncate_num(3.7)") == 3.0
    assert one(engine, "truncate_num(-3.7)") == -3.0


def test_bases(engine):
    assert one(engine, "from_base('ff', 16)") == 255
    assert one(engine, "to_base(255, 16)") == "ff"


def test_cosine_similarity(engine):
    v = one(
        engine,
        "cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D))",
    )
    assert v == 0.0
    v = one(engine, "cosine_similarity(array(1.0D, 2.0D), array(1.0D, 2.0D))")
    assert abs(v - 1.0) < 1e-12


def test_wilson_interval(engine):
    lo = one(engine, "wilson_interval_lower(80, 100, 1.96)")
    hi = one(engine, "wilson_interval_upper(80, 100, 1.96)")
    assert 0.70 < lo < 0.80 < hi < 0.88


def test_json_shims(engine):
    assert one(engine, "json_extract_scalar('{\"a\": {\"b\": 7}}', '$.a.b')") == "7"
    assert one(engine, "json_array_get('[10, 20, 30]', 1)") == "20"
    assert one(engine, "json_size('{\"x\": [1, 2, 3]}', '$.x')") == 3
    assert one(engine, "json_size('{\"x\": {\"a\": 1, \"b\": 2}}', '$.x')") == 2
    assert one(engine, "json_size('{\"x\": 5}', '$.x')") == 0
    assert one(engine, "json_array_contains_str('[\"a\",\"b\"]', 'b')") is True


def test_url_functions(engine):
    url = "'https://user@example.com:8443/p/q.php?k=v&z=1#frag'"
    assert one(engine, f"url_extract_protocol({url})") == "https"
    assert one(engine, f"url_extract_host({url})") == "example.com"
    assert one(engine, f"url_extract_port({url})") == 8443
    assert one(engine, f"url_extract_path({url})") == "/p/q.php"
    assert one(engine, f"url_extract_query({url})") == "k=v&z=1"
    assert one(engine, f"url_extract_fragment({url})") == "frag"
    assert one(engine, f"url_extract_parameter({url}, 'z')") == "1"


def test_array_ngrams(engine):
    v = one(engine, "array_ngrams(array('a','b','c','d'), 2)")
    assert v == [["a", "b"], ["b", "c"], ["c", "d"]]
    assert one(engine, "array_ngrams(array('a'), 3)") == [["a"]]


def test_array_sum_avg(engine):
    assert one(engine, "array_sum(array(1.5D, 2.5D))") == 4.0
    assert one(engine, "array_average(array(1.0D, 3.0D))") == 2.0


def test_day_of_week_iso(engine):
    # 2024-01-01 is a Monday → ISO 1; 2024-01-07 Sunday → 7.
    assert one(engine, "day_of_week(TIMESTAMP '2024-01-01 00:00:00')") == 1
    assert one(engine, "day_of_week(TIMESTAMP '2024-01-07 10:00:00')") == 7


def test_date_add_diff_units(engine):
    assert (
        str(one(engine, "date_add_unit('day', 3, TIMESTAMP '2024-01-01 00:00:00')"))
        == "2024-01-04 00:00:00"
    )
    assert (
        one(
            engine,
            "date_diff_unit('hour', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-02 06:00:00')",
        )
        == 30
    )


def test_bitwise(engine):
    assert one(engine, "bitwise_and(12, 10)") == 8
    assert one(engine, "bitwise_or(12, 10)") == 14
    assert one(engine, "bitwise_xor(12, 10)") == 6
    assert one(engine, "bitwise_not(0)") == -1


def test_width_bucket_native(engine):
    assert one(engine, "width_bucket(5.0D, 0.0D, 10.0D, 5)") == 3


def test_transcendentals_close(engine):
    # Not oracle-checked (libm differences); sanity with tolerance here.
    assert math.isclose(one(engine, "exp(1.0D)"), math.e, rel_tol=1e-12)
    assert math.isclose(one(engine, "ln(exp(2.0D))"), 2.0, rel_tol=1e-12)


def test_datetime_pattern_translation():
    from presto_ads_spark.functions.datetime_compat import translate_mysql_pattern

    assert translate_mysql_pattern("%Y-%m-%d") == "yyyy-MM-dd"
    assert translate_mysql_pattern("%H:%i:%s") == "HH:mm:ss"
    assert translate_mysql_pattern("%Y年%m月") == "yyyy'年'MM'月'"
    with pytest.raises(ValueError):
        translate_mysql_pattern("%Q")


def test_date_parse_roundtrip(engine, spark):
    from presto_ads_spark.functions.datetime_compat import date_format, date_parse
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        date_parse(F.lit("2024-03-05 07:08:09"), "%Y-%m-%d %H:%i:%s").alias("ts")
    )
    row = df.select(date_format("ts", "%Y/%m/%d %H:%i").alias("s")).collect()[0]
    assert row.s == "2024/03/05 07:08"
