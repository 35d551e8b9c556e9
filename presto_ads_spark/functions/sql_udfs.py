"""SQL temp-function definitions for Presto functions Spark lacks.

Each is a Spark 4 SQL UDF (``CREATE OR REPLACE TEMPORARY FUNCTION``): the
body is a Spark expression, so calls inline into Catalyst plans and stay
inside whole-stage codegen — unlike Python UDFs there is no serialization
boundary, which is what makes this layer viable at 100 TB.

Reference for each function: presto-main/.../operator/scalar/ (file noted
per group).
"""

# NOTE: keep each body a single deterministic expression. Spark resolves the
# body at CREATE time against function names only, so order within this list
# matters when one shim calls another.
SQL_FUNCTIONS: list[str] = [
    # --- StringFunctions.java -------------------------------------------
    # strpos(s, sub): 1-based position, 0 if absent (same as instr).
    """CREATE OR REPLACE TEMPORARY FUNCTION strpos(haystack STRING, needle STRING)
       RETURNS INT RETURN instr(haystack, needle)""",
    # hamming_distance (StringFunctions.java:721): equal-length strings.
    """CREATE OR REPLACE TEMPORARY FUNCTION hamming_distance(a STRING, b STRING)
       RETURNS BIGINT RETURN
         size(filter(zip_with(split(a, ''), split(b, ''), (x, y) -> x <> y), v -> v))""",
    # codepoint (StringFunctions.java): first codepoint of a 1-char string.
    """CREATE OR REPLACE TEMPORARY FUNCTION codepoint(s STRING)
       RETURNS INT RETURN ascii(s)""",
    # chr (StringFunctions.java chr): codepoint → character. Spark's chr is
    # mod-256 (single byte), so rewrite.py renames chr → this shim, which
    # UTF-8-encodes the codepoint (1/2/3/4-byte branches) and decodes.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_chr(n BIGINT)
       RETURNS STRING RETURN
         CASE
           WHEN n < 128 THEN char(n)
           WHEN n < 2048 THEN decode(unhex(
             lpad(hex(shiftright(n, 6) + 192), 2, '0') ||
             lpad(hex((n & 63) + 128), 2, '0')), 'UTF-8')
           WHEN n < 65536 THEN decode(unhex(
             lpad(hex(shiftright(n, 12) + 224), 2, '0') ||
             lpad(hex((shiftright(n, 6) & 63) + 128), 2, '0') ||
             lpad(hex((n & 63) + 128), 2, '0')), 'UTF-8')
           ELSE decode(unhex(
             lpad(hex(shiftright(n, 18) + 240), 2, '0') ||
             lpad(hex((shiftright(n, 12) & 63) + 128), 2, '0') ||
             lpad(hex((shiftright(n, 6) & 63) + 128), 2, '0') ||
             lpad(hex((n & 63) + 128), 2, '0')), 'UTF-8')
         END""",
    # split_to_map(s, entryDelim, kvDelim) (SplitToMapFunction.java).
    # Empty input is the EMPTY map (the reference's splitter finds no
    # entries; Spark's str_to_map('') gives {'': null}).
    """CREATE OR REPLACE TEMPORARY FUNCTION split_to_map(s STRING, ed STRING, kd STRING)
       RETURNS MAP<STRING, STRING> RETURN
         map_filter(str_to_map(s, ed, kd),
                    (k, v) -> NOT (s = '' AND k = ''))""",
    # split_to_multimap (SplitToMultimapFunction): duplicate keys keep all
    # values, grouped into arrays; empty input → empty map.
    """CREATE OR REPLACE TEMPORARY FUNCTION split_to_multimap(s STRING, ed STRING, kd STRING)
       RETURNS MAP<STRING, ARRAY<STRING>> RETURN
         map_from_arrays(
           array_distinct(transform(
             filter(split(s, ed), e0 -> NOT (s = '' AND e0 = '')),
             e -> split_part(e, kd, 1))),
           transform(
             array_distinct(transform(
               filter(split(s, ed), e0 -> NOT (s = '' AND e0 = '')),
               e -> split_part(e, kd, 1))),
             k -> transform(
               filter(split(s, ed), e -> split_part(e, kd, 1) = k),
               e -> substr(e, instr(e, kd) + length(kd)))))""",
    # split_part (StringFunctions.java:364): Presto returns NULL when the
    # index exceeds the number of fields; Spark's builtin returns ''. The
    # shim splits on the \Q-quoted literal delimiter (empty delimiter →
    # per-character, same as the reference :368).
    # Empty delimiter splits per CODE POINT (reference :368) and an index
    # past the last one is NULL; Spark's split('', '\\Q\\E') yields [''] and
    # split('abc', '\\Q\\E') carries a trailing '' — so that branch indexes
    # the string directly.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_split_part(s STRING, d STRING, n INT)
       RETURNS STRING RETURN
         CASE
           WHEN d = '' THEN
             CASE WHEN n BETWEEN 1 AND length(s) THEN substr(s, n, 1) END
           ELSE try_element_at(split(s, concat('\\\\Q', d, '\\\\E'), -1), n)
         END""",
    # --- trim family (StringFunctions.java:446-520, airlift SliceUtf8) --
    # Presto's 1-arg trim strips the full Java Character.isWhitespace set
    # (tab..CR, 1C-1F, space, and the Zs separators except the non-breaking
    # ones); Spark's builtin strips ASCII space only. The class below spells
    # that set for the JVM regex engine (codegen-resident — regexp_replace,
    # not a Python UDF).
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_trim(s STRING)
       RETURNS STRING RETURN regexp_replace(s,
         '^[\\\\t-\\\\r\\\\u001C-\\\\u001F \\\\u1680\\\\u180E\\\\u2000-\\\\u2006\\\\u2008-\\\\u200A\\\\u2028\\\\u2029\\\\u205F\\\\u3000]+|[\\\\t-\\\\r\\\\u001C-\\\\u001F \\\\u1680\\\\u180E\\\\u2000-\\\\u2006\\\\u2008-\\\\u200A\\\\u2028\\\\u2029\\\\u205F\\\\u3000]+$',
         '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_ltrim(s STRING)
       RETURNS STRING RETURN regexp_replace(s,
         '^[\\\\t-\\\\r\\\\u001C-\\\\u001F \\\\u1680\\\\u180E\\\\u2000-\\\\u2006\\\\u2008-\\\\u200A\\\\u2028\\\\u2029\\\\u205F\\\\u3000]+',
         '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_rtrim(s STRING)
       RETURNS STRING RETURN regexp_replace(s,
         '[\\\\t-\\\\r\\\\u001C-\\\\u001F \\\\u1680\\\\u180E\\\\u2000-\\\\u2006\\\\u2008-\\\\u200A\\\\u2028\\\\u2029\\\\u205F\\\\u3000]+$',
         '')""",
    # replace(s, '', r) inserts r around every character (reference
    # StringFunctions.replace: empty search matches at each position);
    # Spark's replace returns s unchanged for an empty search.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_replace3(s STRING, p STRING, r STRING)
       RETURNS STRING RETURN
         CASE
           WHEN p = '' THEN
             CASE WHEN s = '' THEN r
                  ELSE concat(r, array_join(transform(split(s, ''), c -> concat(c, r)), ''))
             END
           ELSE replace(s, p, r)
         END""",
    # substr (StringFunctions.substr): start 0 → '', |negative start| past
    # the string head → '' — Spark clamps both to the full string. The ''
    # arms spell substr(s, 1, 0) so a NULL input stays NULL.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_substr2(s STRING, st BIGINT)
       RETURNS STRING RETURN
         CASE WHEN st = 0 OR st < -length(s) THEN substr(s, 1, 0)
              ELSE substr(s, st) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_substr3(s STRING, st BIGINT, ln BIGINT)
       RETURNS STRING RETURN
         CASE WHEN st = 0 OR st < -length(s) THEN substr(s, 1, 0)
              ELSE substr(s, st, ln) END""",
    # word_stem: registered as a real Porter2 Python UDF in
    # functions/__init__.py (round 8) — no SQL shim.

    # Presto to_unixtime returns DOUBLE with fractional seconds
    # (DateTimeFunctions.java toUnixTime) — Spark's unix_timestamp returns
    # BIGINT and would truncate; go through unix_micros.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_to_unixtime(ts TIMESTAMP)
       RETURNS DOUBLE RETURN CAST(unix_micros(ts) AS DOUBLE) / 1000000.0""",
    # --- MathFunctions.java ---------------------------------------------
    # Presto truncate(double) is Math.floor/ceil keeping DOUBLE; Spark's
    # floor(double) returns BIGINT and SATURATES at 2^63 (truncate of
    # Double.MAX_VALUE read 9.2e18, MF250). |x| >= 2^53 has no
    # representable fraction (also covers ±Infinity); NaN → NaN.
    """CREATE OR REPLACE TEMPORARY FUNCTION truncate_num(x DOUBLE)
       RETURNS DOUBLE RETURN
         CASE WHEN isnan(x) OR abs(x) >= 9007199254740992D THEN x
              WHEN x >= 0 THEN CAST(floor(x) AS DOUBLE)
              ELSE CAST(ceil(x) AS DOUBLE) END""",
    # Presto ln/log2/log10 are java.lang.Math semantics: 0 → -Infinity,
    # negative → NaN (MathFunctions.java ln/log2/log10). Spark's return
    # NULL for any non-positive input. NULL/NaN args fall to the ELSE
    # (Spark ln(NaN) = NaN, ln(NULL) = NULL — both faithful).
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_ln(x DOUBLE)
       RETURNS DOUBLE RETURN
         CASE WHEN x > 0D THEN ln(x)
              WHEN x = 0D THEN CAST('-Infinity' AS DOUBLE)
              WHEN x < 0D THEN CAST('NaN' AS DOUBLE)
              ELSE ln(x) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_log2(x DOUBLE)
       RETURNS DOUBLE RETURN
         CASE WHEN x > 0D THEN log2(x)
              WHEN x = 0D THEN CAST('-Infinity' AS DOUBLE)
              WHEN x < 0D THEN CAST('NaN' AS DOUBLE)
              ELSE log2(x) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_log10(x DOUBLE)
       RETURNS DOUBLE RETURN
         CASE WHEN x > 0D THEN log10(x)
              WHEN x = 0D THEN CAST('-Infinity' AS DOUBLE)
              WHEN x < 0D THEN CAST('NaN' AS DOUBLE)
              ELSE log10(x) END""",
    # Presto log(x, b) = Math.log(x) / Math.log(b) — ARGUMENT ORDER IS
    # (value, base), the reverse of Spark's log(base, value)
    # (MathFunctions.java log(double, double)). Spark's Divide is NOT
    # IEEE for doubles under ANSI mode — ln(b) = 0 (base 1) would raise
    # DIVIDE_BY_ZERO — so the zero denominator is spelled out: Java
    # ln(x)/0.0 = ±Infinity by ln(x) sign, NaN when ln(x) is 0/NaN.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_logb(x DOUBLE, b DOUBLE)
       RETURNS DOUBLE RETURN
         CASE WHEN presto_ln(b) = 0D THEN
                CASE WHEN presto_ln(x) > 0D THEN CAST('Infinity' AS DOUBLE)
                     WHEN presto_ln(x) < 0D THEN CAST('-Infinity' AS DOUBLE)
                     ELSE CAST('NaN' AS DOUBLE) END
              ELSE presto_ln(x) / presto_ln(b) END""",
    # conv() is unsigned-64-bit — a '-'-prefixed input wraps around, so
    # negatives route through DECIMAL(20,0) negation (MIN_VALUE-safe)
    """CREATE OR REPLACE TEMPORARY FUNCTION from_base(s STRING, b INT)
       RETURNS BIGINT RETURN
         CASE WHEN s LIKE '-%'
              THEN CAST(-CAST(conv(substr(s, 2), b, 10) AS DECIMAL(20,0))
                        AS BIGINT)
              ELSE CAST(conv(s, b, 10) AS BIGINT) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_base(x BIGINT, b INT)
       RETURNS STRING RETURN
         CASE WHEN x < 0
              THEN concat('-', lower(conv(
                     CAST(-CAST(x AS DECIMAL(20,0)) AS STRING), 10, b)))
              ELSE lower(conv(CAST(x AS STRING), 10, b)) END""",
    # cosine_similarity over double arrays (Presto's is over sparse maps;
    # the array form is what the embeddings workload needs).
    """CREATE OR REPLACE TEMPORARY FUNCTION cosine_similarity(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS DOUBLE RETURN
         aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)
         / (sqrt(aggregate(a, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v))
            * sqrt(aggregate(b, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION wilson_interval_lower(successes BIGINT, trials BIGINT, z DOUBLE)
       RETURNS DOUBLE RETURN
         (successes / CAST(trials AS DOUBLE) + z * z / (2 * trials)
          - z * sqrt((successes / CAST(trials AS DOUBLE)) * (1 - successes / CAST(trials AS DOUBLE)) / trials
                     + z * z / (4.0 * trials * trials))) / (1 + z * z / trials)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION wilson_interval_upper(successes BIGINT, trials BIGINT, z DOUBLE)
       RETURNS DOUBLE RETURN
         (successes / CAST(trials AS DOUBLE) + z * z / (2 * trials)
          + z * sqrt((successes / CAST(trials AS DOUBLE)) * (1 - successes / CAST(trials AS DOUBLE)) / trials
                     + z * z / (4.0 * trials * trials))) / (1 + z * z / trials)""",
    # --- JsonFunctions.java ---------------------------------------------
    # json_extract_scalar ≈ get_json_object (same $.path dialect).
    """CREATE OR REPLACE TEMPORARY FUNCTION json_extract_scalar(js STRING, path STRING)
       RETURNS STRING RETURN get_json_object(js, path)""",
    # json_array_get (JsonFunctions.java:376): negative index counts from
    # the end; a JSON null element returns SQL NULL. The int-range guard
    # keeps the negative-offset addition from ANSI-overflowing on
    # Long.MIN_VALUE probes.
    """CREATE OR REPLACE TEMPORARY FUNCTION json_array_get(js STRING, idx BIGINT)
       RETURNS STRING RETURN
         CASE WHEN idx IS NULL OR idx < -2147483648 OR idx > 2147483647 THEN NULL
              ELSE nullif(get_json_object(js, concat('$[', CAST(
                     CASE WHEN idx < 0 THEN json_array_length(js) + idx
                          ELSE idx END AS STRING), ']')), 'null') END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_array_contains_str(js STRING, v STRING)
       RETURNS BOOLEAN RETURN array_contains(from_json(js, 'array<string>'), v)""",
    # json_size (JsonFunctions.java): element count of the array/object at
    # path. Arrays via json_array_length; objects via map keys; scalars → 0.
    """CREATE OR REPLACE TEMPORARY FUNCTION json_size(js STRING, path STRING)
       RETURNS INT RETURN
         CASE
           WHEN get_json_object(js, path) IS NULL THEN NULL
           WHEN startswith(ltrim(get_json_object(js, path)), '[')
             THEN CAST(json_array_length(get_json_object(js, path)) AS INT)
           WHEN startswith(ltrim(get_json_object(js, path)), '{')
             THEN size(json_object_keys(get_json_object(js, path)))
           ELSE 0
         END""",
    # --- UrlFunctions.java:55-77 ----------------------------------------
    # Presto parseUrl = java.net.URI: a parseable URI's absent component
    # is the EMPTY STRING (nullToEmpty over the getters), NULL only on
    # URISyntaxException; opaque URIs (mailto:…) null out host/path/
    # query; relative references keep their path. Spark's Hive-regex
    # parse_url conflates all of those as NULL, so the components route
    # through the __presto_url_part Python mini-URI (compat surface,
    # never a hot path — functions/__init__.py).
    """CREATE OR REPLACE TEMPORARY FUNCTION url_extract_protocol(url STRING)
       RETURNS STRING RETURN __presto_url_part(url, 'protocol')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION url_extract_host(url STRING)
       RETURNS STRING RETURN __presto_url_part(url, 'host')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION url_extract_path(url STRING)
       RETURNS STRING RETURN __presto_url_part(url, 'path')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION url_extract_query(url STRING)
       RETURNS STRING RETURN __presto_url_part(url, 'query')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION url_extract_fragment(url STRING)
       RETURNS STRING RETURN __presto_url_part(url, 'fragment')""",
    # a key present WITHOUT a value returns '' (UrlFunctions
    # urlExtractParameter "first matched key is empty" → EMPTY_SLICE);
    # an absent key returns NULL — Spark's parse_url NULLs both
    # UrlFunctions.java:124-148: the FIRST query arg whose key matches
    # wins — a bare key ('?k1&k1=v1' asked for k1) yields '' even when a
    # later arg carries a value (UF47); parse_url(url,'QUERY',name) would
    # return the later value.
    """CREATE OR REPLACE TEMPORARY FUNCTION url_extract_parameter(url STRING, name STRING)
       RETURNS STRING RETURN
         CASE WHEN size(filter(split(__presto_url_part(url, 'query'), '&'),
                               p -> p = name OR startswith(p, concat(name, '=')))) > 0
              THEN substr(filter(split(__presto_url_part(url, 'query'), '&'),
                                 p -> p = name OR startswith(p, concat(name, '=')))[0],
                          length(name) + 2)
         END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION url_extract_port(url STRING)
       RETURNS BIGINT RETURN CAST(__presto_url_part(url, 'port') AS BIGINT)""",
    # --- ArrayFunctions --------------------------------------------------
    # array_ngrams (Presto ArrayNgramsFunction): n-grams of an array.
    """CREATE OR REPLACE TEMPORARY FUNCTION array_ngrams(arr ARRAY<STRING>, n INT)
       RETURNS ARRAY<ARRAY<STRING>> RETURN
         CASE WHEN size(arr) < n THEN array(arr)
              ELSE transform(sequence(0, size(arr) - n), i -> slice(arr, i + 1, n)) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION array_sum(arr ARRAY<DOUBLE>)
       RETURNS DOUBLE RETURN aggregate(arr, CAST(0 AS DOUBLE), (acc, v) -> acc + v)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION array_average(arr ARRAY<DOUBLE>)
       RETURNS DOUBLE RETURN array_sum(arr) / size(arr)""",
    # arrays_overlap exists in Spark; contains/element_at/cardinality renamed
    # in rewrite.py.
    # --- DateTimeFunctions.java (signature shims; pattern translation is in
    #     datetime_compat.py because it needs literal rewriting) ----------
    """CREATE OR REPLACE TEMPORARY FUNCTION day_of_week(ts TIMESTAMP)
       RETURNS INT RETURN ((dayofweek(ts) + 5) % 7) + 1""",
    """CREATE OR REPLACE TEMPORARY FUNCTION day_of_year(ts TIMESTAMP)
       RETURNS INT RETURN dayofyear(ts)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION year_of_week(ts TIMESTAMP)
       RETURNS INT RETURN CAST(extract(YEAROFWEEK FROM ts) AS INT)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION week_of_year(ts TIMESTAMP)
       RETURNS INT RETURN weekofyear(ts)""",
    # DateTimeFunctions.java day_of_month / millisecond @ScalarFunction
    # aliases (Spark has dayofmonth but no day_of_month spelling; no
    # millisecond at all)
    """CREATE OR REPLACE TEMPORARY FUNCTION day_of_month(ts TIMESTAMP)
       RETURNS INT RETURN day(ts)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION week(ts TIMESTAMP)
       RETURNS INT RETURN weekofyear(ts)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION millisecond(ts TIMESTAMP)
       RETURNS BIGINT RETURN CAST(date_format(ts, 'SSS') AS BIGINT)""",
    # Presto date_add('unit', n, ts) → timestampadd; unit names align.
    # n is BIGINT (Presto's signature); the rewrite routes DATE-typed
    # third arguments to date_add_unit_date below, which returns DATE
    # like Presto (DateTimeFunctions.java date_add @SqlType(DATE)).
    """CREATE OR REPLACE TEMPORARY FUNCTION date_add_unit(unit STRING, n BIGINT, ts TIMESTAMP)
       RETURNS TIMESTAMP RETURN
         CASE lower(unit)
           WHEN 'millisecond' THEN timestampadd(MICROSECOND, n * 1000, ts)
           WHEN 'second' THEN timestampadd(SECOND, n, ts)
           WHEN 'minute' THEN timestampadd(MINUTE, n, ts)
           WHEN 'hour' THEN timestampadd(HOUR, n, ts)
           WHEN 'day' THEN timestampadd(DAY, n, ts)
           WHEN 'week' THEN timestampadd(WEEK, n, ts)
           WHEN 'month' THEN timestampadd(MONTH, n, ts)
           WHEN 'quarter' THEN timestampadd(QUARTER, n, ts)
           WHEN 'year' THEN timestampadd(YEAR, n, ts)
         END""",
    # DATE overload: Presto keeps the DATE type (day-and-coarser units
    # only — sub-day units on a DATE are a type error in Presto, here
    # NULL; documented in SHOW FUNCTIONS notes).
    """CREATE OR REPLACE TEMPORARY FUNCTION date_add_unit_date(unit STRING, n BIGINT, d DATE)
       RETURNS DATE RETURN
         CASE lower(unit)
           WHEN 'day' THEN date_add(d, CAST(n AS INT))
           WHEN 'week' THEN date_add(d, CAST(n * 7 AS INT))
           WHEN 'month' THEN add_months(d, CAST(n AS INT))
           WHEN 'quarter' THEN add_months(d, CAST(n * 3 AS INT))
           WHEN 'year' THEN add_months(d, CAST(n * 12 AS INT))
         END""",
    # TIME overload: Presto date_add on a TIME wraps within the day
    # (DateTimeFunctions.java date_add @SqlType(TIME) modulo
    # MILLISECONDS_IN_DAY); the engine's TIME emulation is an
    # epoch-anchored NTZ timestamp, so wrap the result back onto
    # 1970-01-01 via pmod over day micros.
    """CREATE OR REPLACE TEMPORARY FUNCTION date_add_unit_time(unit STRING, n BIGINT, ts TIMESTAMP)
       RETURNS TIMESTAMP RETURN
         timestamp_micros(pmod(unix_micros(date_add_unit(unit, n, ts)),
                               86400000000))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION date_diff_unit(unit STRING, a TIMESTAMP, b TIMESTAMP)
       RETURNS BIGINT RETURN
         CASE lower(unit)
           WHEN 'millisecond' THEN timestampdiff(MICROSECOND, a, b) DIV 1000
           WHEN 'second' THEN timestampdiff(SECOND, a, b)
           WHEN 'minute' THEN timestampdiff(MINUTE, a, b)
           WHEN 'hour' THEN timestampdiff(HOUR, a, b)
           WHEN 'day' THEN timestampdiff(DAY, a, b)
           WHEN 'week' THEN timestampdiff(WEEK, a, b)
           WHEN 'month' THEN timestampdiff(MONTH, a, b)
           WHEN 'quarter' THEN timestampdiff(QUARTER, a, b)
           WHEN 'year' THEN timestampdiff(YEAR, a, b)
         END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_milliseconds(ts TIMESTAMP)
       RETURNS BIGINT RETURN unix_millis(ts)""",
    # --- VarbinaryFunctions.java digests: Presto md5/sha1/sha256/sha512
    #     take varbinary and RETURN varbinary; Spark builtins return hex
    #     strings and cannot be shadowed, so rewrite.py renames the Presto
    #     spellings to these shims. (xxhash64 is left as Spark's builtin:
    #     Spark seeds xxHash with 42 vs Presto's 0 — values differ by
    #     design; documented.)
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_md5(b BINARY)
       RETURNS BINARY RETURN unhex(md5(b))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_sha1(b BINARY)
       RETURNS BINARY RETURN unhex(sha1(b))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_sha256(b BINARY)
       RETURNS BINARY RETURN unhex(sha2(b, 256))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_sha512(b BINARY)
       RETURNS BINARY RETURN unhex(sha2(b, 512))""",
    # --- VarbinaryFunctions.java: utf8 codec -----------------------------
    """CREATE OR REPLACE TEMPORARY FUNCTION to_utf8(s STRING)
       RETURNS BINARY RETURN encode(s, 'UTF-8')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION from_utf8(b BINARY)
       RETURNS STRING RETURN decode(b, 'UTF-8')""",
    # --- VarbinaryFunctions.java: endian conversions ---------------------
    """CREATE OR REPLACE TEMPORARY FUNCTION to_big_endian_64(x BIGINT)
       RETURNS BINARY RETURN unhex(lpad(hex(x), 16, '0'))""",
    # from_big_endian_64: conv() yields the unsigned decimal string; route
    # through the sign bit to recover two's-complement negatives exactly.
    """CREATE OR REPLACE TEMPORARY FUNCTION from_big_endian_64(b BINARY)
       RETURNS BIGINT RETURN
         CASE WHEN substr(hex(b), 1, 1) IN ('8','9','A','B','C','D','E','F')
              THEN CAST(conv(hex(b), 16, 10) AS DECIMAL(20,0) ) - CAST(18446744073709551616 AS DECIMAL(21,0))
              ELSE CAST(conv(hex(b), 16, 10) AS BIGINT)
         END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_big_endian_32(x INT)
       RETURNS BINARY RETURN unhex(lpad(hex(x & 4294967295), 8, '0'))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION from_big_endian_32(b BINARY)
       RETURNS INT RETURN
         CASE WHEN CAST(conv(hex(b), 16, 10) AS BIGINT) >= 2147483648
              THEN CAST(CAST(conv(hex(b), 16, 10) AS BIGINT) - 4294967296 AS INT)
              ELSE CAST(conv(hex(b), 16, 10) AS INT)
         END""",
    # --- HyperLogLog sketch functions (HyperLogLogFunctions.java:31,
    #     ApproximateSetAggregation) → Spark 3.5+ DataSketches HLL.
    #     approx_set/merge are aggregates (rewrite-level aliases to
    #     hll_sketch_agg/hll_union_agg); the scalar surface is shimmed here.
    """CREATE OR REPLACE TEMPORARY FUNCTION cardinality_hll(sketch BINARY)
       RETURNS BIGINT RETURN hll_sketch_estimate(sketch)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION merge_hll(a BINARY, b BINARY)
       RETURNS BINARY RETURN hll_union(a, b)""",
    # --- MathFunctions.java constants / classification -------------------
    """CREATE OR REPLACE TEMPORARY FUNCTION infinity()
       RETURNS DOUBLE RETURN CAST('Infinity' AS DOUBLE)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION nan()
       RETURNS DOUBLE RETURN CAST('NaN' AS DOUBLE)""",
    # NULL-propagating (MathFunctions isNaN is RETURN_NULL_ON_NULL;
    # Spark's isnan(NULL) is false)
    """CREATE OR REPLACE TEMPORARY FUNCTION is_nan(x DOUBLE)
       RETURNS BOOLEAN RETURN CASE WHEN x IS NULL THEN NULL ELSE isnan(x) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION is_infinite(x DOUBLE)
       RETURNS BOOLEAN RETURN abs(x) = CAST('Infinity' AS DOUBLE)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION is_finite(x DOUBLE)
       RETURNS BOOLEAN RETURN NOT isnan(x) AND abs(x) <> CAST('Infinity' AS DOUBLE)""",
    # --- DateTimeFunctions.java extras -----------------------------------
    """CREATE OR REPLACE TEMPORARY FUNCTION to_iso8601(ts TIMESTAMP)
       RETURNS STRING RETURN date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS")""",
    # current_timezone(): Spark-native, same name — no shim needed.
    # AT TIME ZONE / at_timezone(ts, zone): render the same instant in
    # another zone (DesugarAtTimeZone.java rule in the reference).
    """CREATE OR REPLACE TEMPORARY FUNCTION at_timezone(ts TIMESTAMP, tz STRING)
       RETURNS TIMESTAMP RETURN convert_timezone(current_timezone(), tz, ts)""",
    # --- MathFunctions.java beta_cdf: the reference instantiates
    # commons-math BetaDistribution, whose cumulativeProbability IS the
    # static Beta.regularizedBeta — bit-exact via reflect.
    """CREATE OR REPLACE TEMPORARY FUNCTION beta_cdf(a DOUBLE, b DOUBLE, v DOUBLE)
       RETURNS DOUBLE RETURN
         CASE WHEN a <= 0 OR b <= 0 OR v < 0 OR v > 1
              THEN raise_error('a, b must be > 0, value must be 0 >= v >= 1')
              ELSE CAST(reflect('org.apache.commons.math3.special.Beta',
                                'regularizedBeta', v, a, b) AS DOUBLE) END""",
    # parse_duration (DateTimeFunctions.java): Presto returns INTERVAL
    # DAY TO SECOND at millisecond precision; modeled as DOUBLE millis,
    # composable with the to_milliseconds below (the only consumer the
    # reference tests compose it with).
    # Presto's interval carries LONG millis (SqlIntervalDayTime), so the
    # sub-millisecond part rounds half-up at construction
    # (Duration.roundTo(MILLISECONDS)): parse_duration('1234 ns') = 0,
    # ('1234.567 ms') = 1235.
    """CREATE OR REPLACE TEMPORARY FUNCTION parse_duration(s STRING)
       RETURNS DOUBLE RETURN
         floor(0.5 +
           CAST(regexp_extract(s, '^\\\\s*([0-9.]+)', 1) AS DOUBLE) *
           CASE lower(regexp_extract(s, '([a-zA-Z]+)\\\\s*$', 1))
             WHEN 'ns' THEN 0.000001
             WHEN 'us' THEN 0.001
             WHEN 'ms' THEN 1.0
             WHEN 's' THEN 1000.0
             WHEN 'm' THEN 60000.0
             WHEN 'h' THEN 3600000.0
             WHEN 'd' THEN 86400000.0
           END)""",
    # Presto's to_milliseconds takes INTERVAL DAY TO SECOND; our
    # parse_duration models the interval as DOUBLE millis, and rewrite.py
    # routes to_milliseconds(parse_duration(...)) here. The plain
    # to_milliseconds(TIMESTAMP) spelling (epoch millis) is a separate
    # temp fn — SQL temp functions cannot overload, so two names.
    """CREATE OR REPLACE TEMPORARY FUNCTION __to_millis_dur(ms DOUBLE)
       RETURNS BIGINT RETURN CAST(floor(ms + 0.5) AS BIGINT)""",
    # parse_duration('3.2m') → seconds as double (Presto returns interval;
    # seconds keeps it composable with arithmetic).
    """CREATE OR REPLACE TEMPORARY FUNCTION parse_duration_seconds(s STRING)
       RETURNS DOUBLE RETURN
         CAST(regexp_extract(s, '^([0-9.]+)', 1) AS DOUBLE) *
         CASE regexp_extract(s, '([a-z]+)$', 1)
           WHEN 'ns' THEN 0.000000001
           WHEN 'us' THEN 0.000001
           WHEN 'ms' THEN 0.001
           WHEN 's' THEN 1
           WHEN 'm' THEN 60
           WHEN 'h' THEN 3600
           WHEN 'd' THEN 86400
         END""",
    # --- DataSizeFunctions.java: parse_presto_data_size('2.3MB') → decimal
    #     bytes (unit table :44-57: B kB MB GB TB PB EB ZB YB, 1024-based).
    # Integer and fractional parts multiply separately so the product
    # keeps SCALE 0: a single decimal multiply would carry the quantity's
    # scale into the result and overflow 38 digits for
    # '6917529027641081856EB'-scale inputs (DSF46/47). floor distributes
    # over the split because int_part*unit is exact (Presto
    # BigDecimal.toBigInteger truncates).
    """CREATE OR REPLACE TEMPORARY FUNCTION __data_size_unit(s STRING)
       RETURNS DECIMAL(25, 0) RETURN
           CASE regexp_extract(s, '([A-Za-z]+)$', 1)
             WHEN 'B' THEN CAST(1 AS DECIMAL(25, 0))
             WHEN 'kB' THEN CAST(1024 AS DECIMAL(25, 0))
             WHEN 'MB' THEN CAST(1048576 AS DECIMAL(25, 0))
             WHEN 'GB' THEN CAST(1073741824 AS DECIMAL(25, 0))
             WHEN 'TB' THEN CAST(1099511627776 AS DECIMAL(25, 0))
             WHEN 'PB' THEN CAST(1125899906842624 AS DECIMAL(25, 0))
             WHEN 'EB' THEN CAST(1152921504606846976 AS DECIMAL(25, 0))
             WHEN 'ZB' THEN CAST(1180591620717411303424 AS DECIMAL(25, 0))
             WHEN 'YB' THEN CAST(1208925819614629174706176 AS DECIMAL(25, 0))
           END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION parse_presto_data_size(s STRING)
       RETURNS DECIMAL(38, 0) RETURN
         CAST(CAST(regexp_extract(s, '^([0-9]+)', 1) AS DECIMAL(38, 0))
                * __data_size_unit(s)
              + FLOOR(CAST(concat('0.',
                    coalesce(nullif(regexp_extract(s, '^[0-9]+\\\\.([0-9]+)', 1), ''), '0'))
                  AS DECIMAL(26, 25)) * __data_size_unit(s))
           AS DECIMAL(38, 0))""",
    # Presto JSON type is carried as its canonical string form here:
    # json_parse VALIDATES (JsonFunctions.java json_parse raises
    # INVALID_FUNCTION_ARGUMENT on malformed text — so TRY(json_parse(x))
    # NULLs bad rows) and CANONICALIZES (compact spacing, sorted object
    # keys — JSON equality is string equality over this form, JO348);
    # json_format is the inverse. __presto_json_parse is the Python
    # canonicalizer registered in functions/__init__.py (NULL on
    # malformed).
    # single UDF invocation per row (coalesce short-circuits: raise_error
    # only evaluates when the canonicalizer returned NULL = malformed)
    """CREATE OR REPLACE TEMPORARY FUNCTION json_parse(s STRING)
       RETURNS STRING RETURN
         CASE WHEN s IS NULL THEN NULL
              ELSE coalesce(__presto_json_parse(s),
                raise_error(concat('Cannot convert value to JSON: ', s)))
              END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION json_format(s STRING)
       RETURNS STRING RETURN s""",
    # --- Teradata compat (presto-teradata-functions) ---------------------
    """CREATE OR REPLACE TEMPORARY FUNCTION index(haystack STRING, needle STRING)
       RETURNS INT RETURN instr(haystack, needle)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION char2hexint(s STRING)
       RETURNS STRING RETURN upper(hex(encode(s, 'UTF-16BE')))""",
    # Teradata to_char/to_date/to_timestamp (DateFormatFunctions.java):
    # Teradata tokens YYYY/YY/MM/DD/HH24/HH/MI/SS → java.time patterns.
    # 'H24X' is a collision-free sentinel so HH24 survives the HH pass.
    """CREATE OR REPLACE TEMPORARY FUNCTION teradata_fmt(f STRING)
       RETURNS STRING RETURN
         replace(replace(replace(replace(replace(replace(replace(replace(
           f, 'HH24', 'H24X'), 'YYYY', 'yyyy'), 'YY', 'yy'), 'DD', 'dd'),
           'HH', 'hh'), 'H24X', 'HH'), 'MI', 'mm'), 'SS', 'ss')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION teradata_to_char(ts TIMESTAMP, f STRING)
       RETURNS STRING RETURN date_format(ts, teradata_fmt(f))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION teradata_to_date(s STRING, f STRING)
       RETURNS DATE RETURN to_date(s, teradata_fmt(f))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION teradata_to_timestamp(s STRING, f STRING)
       RETURNS TIMESTAMP RETURN to_timestamp(s, teradata_fmt(f))""",
    # --- BitwiseFunctions.java:50-74 ------------------------------------
    """CREATE OR REPLACE TEMPORARY FUNCTION bitwise_and(a BIGINT, b BIGINT)
       RETURNS BIGINT RETURN a & b""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bitwise_or(a BIGINT, b BIGINT)
       RETURNS BIGINT RETURN a | b""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bitwise_xor(a BIGINT, b BIGINT)
       RETURNS BIGINT RETURN a ^ b""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bitwise_not(a BIGINT)
       RETURNS BIGINT RETURN ~a""",
    # bit_count(num, bits) (BitwiseFunctions.java:31): Presto's is 2-arg —
    # popcount of num within a `bits`-wide two's-complement window (Spark's
    # builtin is 1-arg, so rewrite.py renames bit_count → this shim).
    # shiftleft wraps its shift mod 64 in the JVM, hence the bits=64 branch.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_bit_count(num BIGINT, bits BIGINT)
       RETURNS BIGINT RETURN
         CASE WHEN bits = 64 THEN CAST(bit_count(num) AS BIGINT)
              ELSE CAST(bit_count(num & (shiftleft(CAST(1 AS BIGINT), CAST(bits AS INT)) - 1)) AS BIGINT)
         END""",
    # --- JoniRegexpFunctions.java regexp_split: split on regex, trailing
    #     empty strings KEPT (Java split with limit -1; Presto :count loop).
    #     Distinct from Presto split(s, delim), whose delimiter is a literal.
    #     An EMPTY pattern matches at every boundary INCLUDING both ends
    #     (Joni) — Spark/Java split drop the leading/trailing empties.
    """CREATE OR REPLACE TEMPORARY FUNCTION regexp_split(s STRING, p STRING)
       RETURNS ARRAY<STRING> RETURN
         CASE WHEN p = '' THEN concat(array(''), split(s, ''), array(''))
              ELSE split(s, p, -1) END""",
    # --- DateTimeFunctions.java:1157,1165 timezone_hour / timezone_minute:
    #     offset of the session zone at that instant. date_format 'xx' gives
    #     '+0530' / '-0800'; hour keeps its sign via the leading '+05'.
    """CREATE OR REPLACE TEMPORARY FUNCTION timezone_hour(ts TIMESTAMP)
       RETURNS BIGINT RETURN CAST(substr(date_format(ts, 'xx'), 1, 3) AS BIGINT)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION timezone_minute(ts TIMESTAMP)
       RETURNS BIGINT RETURN
         CASE WHEN startswith(date_format(ts, 'xx'), '-') THEN -1 ELSE 1 END
         * CAST(substr(date_format(ts, 'xx'), 4, 2) AS BIGINT)""",
    # --- JsonFunctions.java is_json_scalar / json_array_contains ---------
    """CREATE OR REPLACE TEMPORARY FUNCTION is_json_scalar(js STRING)
       RETURNS BOOLEAN RETURN
         CASE WHEN js IS NULL THEN NULL
              ELSE NOT (startswith(ltrim(js), '[') OR startswith(ltrim(js), '{'))
         END""",
    # Values compare through their canonical string form (from_json with
    # array<string> coerces JSON numbers/booleans to text), so bigint/double/
    # boolean probes arrive via Spark's implicit cast-to-string. Documented
    # shim: a JSON string "2" and number 2 are indistinguishable here.
    """CREATE OR REPLACE TEMPORARY FUNCTION json_array_contains(js STRING, v STRING)
       RETURNS BOOLEAN RETURN array_contains(from_json(js, 'array<string>'), v)""",
    # --- MathFunctions.java normal_cdf / inverse_normal_cdf --------------
    # The reference (MathFunctions.java:613,624) calls commons-math
    # Erf.erf/erfInv — Spark ships commons-math3, so reflect() (a
    # Catalyst JVM-side static call, no Python boundary) gives BIT-EXACT
    # parity; reflect returns STRING, and Double round-trips through
    # Double.toString losslessly.
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_erf(x DOUBLE)
       RETURNS DOUBLE RETURN
         CAST(reflect('org.apache.commons.math3.special.Erf', 'erf', x) AS DOUBLE)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION normal_cdf(mean DOUBLE, sd DOUBLE, v DOUBLE)
       RETURNS DOUBLE RETURN
         0.5 * (1.0 + CAST(reflect('org.apache.commons.math3.special.Erf', 'erf',
                                   (v - mean) / (sd * 1.4142135623730951)) AS DOUBLE))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION inverse_normal_cdf(mean DOUBLE, sd DOUBLE, p DOUBLE)
       RETURNS DOUBLE RETURN
         mean + sd * 1.4142135623730951 *
           CAST(reflect('org.apache.commons.math3.special.Erf', 'erfInv',
                        2 * p - 1) AS DOUBLE)""",
    # --- VarbinaryFunctions.java IEEE-754 codecs --------------------------
    # Raw bit extraction has no Spark expression, but reflect() (a catalyst
    # expression — JVM-side static call, no Python boundary) gives
    # Double.doubleToLongBits exactly.
    """CREATE OR REPLACE TEMPORARY FUNCTION to_ieee754_64(x DOUBLE)
       RETURNS BINARY RETURN
         to_big_endian_64(CAST(reflect('java.lang.Double', 'doubleToLongBits', x) AS BIGINT))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION from_ieee754_64(b BINARY)
       RETURNS DOUBLE RETURN
         CAST(reflect('java.lang.Double', 'longBitsToDouble', from_big_endian_64(b)) AS DOUBLE)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_ieee754_32(x FLOAT)
       RETURNS BINARY RETURN
         to_big_endian_32(CAST(reflect('java.lang.Float', 'floatToIntBits', x) AS INT))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION from_ieee754_32(b BINARY)
       RETURNS FLOAT RETURN
         CAST(reflect('java.lang.Float', 'intBitsToFloat', from_big_endian_32(b)) AS FLOAT)""",
    # --- VarbinaryFunctions.java:89-112 base64url (RFC 4648 §5: +/ → -_,
    #     padding kept, matching Base64.getUrlEncoder/getUrlDecoder).
    # Spark's base64 MIME-chunks outputs past 76 chars (CRLF inserts);
    # Presto's to_base64 is continuous (VarbinaryFunctions.java:83
    # Base64.getEncoder) — strip the fold characters (VF118/139).
    """CREATE OR REPLACE TEMPORARY FUNCTION presto_to_base64(b BINARY)
       RETURNS STRING RETURN
         replace(replace(base64(b), chr(13), ''), chr(10), '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION to_base64url(b BINARY)
       RETURNS STRING RETURN translate(presto_to_base64(b), '+/', '-_')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION from_base64url(s STRING)
       RETURNS BINARY RETURN unbase64(translate(s, '-_', '+/'))""",
    # --- MapFunctions multimap_from_entries (monomorphic string form, like
    #     split_to_multimap above; first-key order preserved).
    """CREATE OR REPLACE TEMPORARY FUNCTION multimap_from_entries(e ARRAY<STRUCT<key STRING, value STRING>>)
       RETURNS MAP<STRING, ARRAY<STRING>> RETURN
         map_from_arrays(
           array_distinct(transform(e, x -> x.key)),
           transform(
             array_distinct(transform(e, x -> x.key)),
             k -> transform(filter(e, x -> x.key = k), x -> x.value)))""",
    # --- HyperLogLogFunctions.java empty_approx_set(): the canonical empty
    #     DataSketches HLL (lgK 12 — hll_sketch_agg's default), captured as
    #     a literal; hll_union with it is the identity, same as Presto's
    #     empty HLL.
    """CREATE OR REPLACE TEMPORARY FUNCTION empty_approx_set()
       RETURNS BINARY RETURN
         unhex('0201070C030400080000000000000000000000000000000000000000000000000000000000000000')""",
    # --- TIME surface: localtime / current_time (epoch-anchored TIME
    #     emulation, same convention as TIME literals in rewrite.py).
    #     Presto grammar allows the bare keyword — rewrite.py adds parens.
    """CREATE OR REPLACE TEMPORARY FUNCTION localtime()
       RETURNS TIMESTAMP RETURN
         CAST(concat('1970-01-01 ', date_format(now(), 'HH:mm:ss.SSS')) AS TIMESTAMP)""",
]
