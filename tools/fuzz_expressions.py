"""Differential expression fuzzer: random scalar-expression queries run
through Engine.sql AND DuckDB over the same VALUES relation; mismatches
are real rewrite/compat bugs (modulo the documented deviations, which
the generator avoids producing).

Mirrors the reference's H2-differential idea (SURVEY §5) but with a
generative grammar instead of a fixed corpus. Seeded — every failure
reprints with its seed for a deterministic repro.

Usage: python tools/fuzz_expressions.py [n_queries] [seed]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the relation both engines see
ROWS = (
    "(VALUES (1, 2, 'ab', TIMESTAMP '2024-01-15 10:30:00'), "
    "(3, NULL, 'Cd e', TIMESTAMP '2024-01-15 23:59:59'), "
    "(-5, 7, '', TIMESTAMP '2024-02-29 00:00:00'), "
    "(10, -4, 'fgh', NULL), "
    "(NULL, 0, 'xy z', TIMESTAMP '2023-12-31 07:05:00')) t(a, b, s, d)"
)

INT_COLS = ("a", "b")
STR_COLS = ("s",)
TS_COLS = ("d",)


def int_expr(r: random.Random, depth: int = 0) -> str:
    if depth > 2 or r.random() < 0.35:
        return r.choice(
            [r.choice(INT_COLS), str(r.randint(-9, 20)), "NULL"]
        )
    op = r.choice(["+", "-", "*", "arith", "fn", "case", "cond"])
    x, y = int_expr(r, depth + 1), int_expr(r, depth + 1)
    if op in ("+", "-", "*"):
        return f"({x} {op} {y})"
    if op == "arith":
        # division/modulo by non-zero operands only: /0 raises in Presto
        # but NULLs in DuckDB, a deviation we document. Column `a` holds
        # no zeros, so it is a legal divisor; `b` holds 0 and is not.
        d = r.choice(["2", "3", "5", "7", "-3", "a"])
        return f"({x} {r.choice(['/', '%'])} {d})"
    if op == "fn":
        f = r.choice(
            ["abs", "least", "greatest", "coalesce", "nullif",
             "try", "array", "strfn", "hof", "tsint"]
        )
        if f == "hof":
            return array_expr(r, depth + 1)
        if f == "tsint":
            return ts_int_expr(r, depth + 1)
        if f == "abs":
            return f"abs({x})"
        if f == "try":
            return f"TRY({x})"
        if f == "array":
            sub = r.randint(1, 3)
            return f"(ARRAY[{x}, {y}, {int_expr(r, depth + 1)}][{sub}])"
        if f == "strfn":
            return r.choice(
                [
                    f"length({str_expr(r, depth + 1)})",
                    f"strpos({str_expr(r, depth + 1)}, 'a')",
                    f"cardinality(ARRAY[{x}, {y}])",
                ]
            )
        return f"{f}({x}, {y})"
    if op == "case":
        return (
            f"(CASE WHEN {bool_expr(r, depth + 1)} THEN {x} ELSE {y} END)"
        )
    return f"if({bool_expr(r, depth + 1)}, {x}, {y})"


def str_expr(r: random.Random, depth: int = 0) -> str:
    if depth > 2 or r.random() < 0.4:
        # multibyte leaves exercise the code-point shims (substr /
        # reverse / pads are code-point-based in Presto AND DuckDB)
        return r.choice(
            [r.choice(STR_COLS), "'ab'", "'X y'", "''",
             "CAST(NULL AS VARCHAR)", "'héÿ'", "'αβ γ'"]
        )
    # Oracle-dialect exclusions (engine is Presto-faithful, DuckDB
    # differs — verified against the reference, not engine bugs):
    # - split_part out-of-range/NULL: Presto NULL, DuckDB ''
    # - substr(s, 0[, n]) and no-length past-head negative starts:
    #   Presto '', DuckDB clamps to the string head
    # - replace(s, '', r): Presto interleaves r around every code point
    #   (StringFunctions.java:121-133), DuckDB returns s unchanged
    op = r.choice(["concat", "upper", "lower", "trim", "ltrim", "rtrim",
                   "substr", "neg_substr", "replace", "strip_replace",
                   "reverse", "case", "lpad", "rpad", "date_format",
                   "split_part"])
    x = str_expr(r, depth + 1)
    if op == "concat":
        return f"({x} || {str_expr(r, depth + 1)})"
    if op == "date_format":
        return ts_str_expr(r, depth + 1)
    if op == "split_part":
        # fixed single-char delimiter; Presto returns NULL past the
        # last field where DuckDB returns '' (presto_split_part macro)
        return f"split_part({x}, ' ', {r.randint(1, 3)})"
    if op == "substr":
        return f"substr({x}, {r.randint(1, 3)}, {r.randint(0, 4)})"
    if op == "neg_substr":
        # negative start counts from the end in both engines; always
        # pass a length (see exclusion note above)
        return f"substr({x}, {r.randint(-5, -1)}, {r.randint(0, 4)})"
    if op == "replace":
        return f"replace({x}, 'a', 'Z')"
    if op == "strip_replace":
        # deletion form (2-arg lowers to this in Presto) over a
        # possibly-multibyte needle
        needle = r.choice(["'a'", "'é'", "' '"])
        return f"replace({x}, {needle}, '')"
    if op in ("lpad", "rpad"):
        pad = r.choice(["'.'", "'ü'"])
        return f"{op}({x}, {r.randint(0, 6)}, {pad})"
    if op == "case":
        return (
            f"(CASE WHEN {bool_expr(r, depth + 1)} THEN {x} "
            f"ELSE {str_expr(r, depth + 1)} END)"
        )
    return f"{op}({x})"


def ts_expr(r: random.Random, depth: int = 0) -> str:
    """Timestamp-valued expressions portable across engine and DuckDB.
    date_trunc is always CAST to TIMESTAMP (DuckDB returns DATE for
    day-and-coarser units, Presto/Spark return TIMESTAMP); date_diff is
    EXCLUDED (Presto counts elapsed full units, DuckDB counts boundary
    crossings — a genuine semantics difference, documented)."""
    if depth > 1 or r.random() < 0.45:
        return r.choice(
            [
                r.choice(TS_COLS),
                "TIMESTAMP '2024-01-20 12:00:00'",
                "TIMESTAMP '2023-11-05 06:30:15'",
                "CAST(NULL AS TIMESTAMP)",
            ]
        )
    op = r.choice(["interval", "trunc", "extreme", "case"])
    x = ts_expr(r, depth + 1)
    if op == "interval":
        n = r.randint(1, 40)
        unit = r.choice(["HOUR", "DAY", "MINUTE"])
        return f"({x} {r.choice(['+', '-'])} INTERVAL '{n}' {unit})"
    if op == "trunc":
        unit = r.choice(["hour", "day", "month", "year", "minute"])
        return f"CAST(date_trunc('{unit}', {x}) AS TIMESTAMP)"
    if op == "extreme":
        return f"{r.choice(['greatest', 'least'])}({x}, {ts_expr(r, depth + 1)})"
    return (
        f"(CASE WHEN {bool_expr(r, depth + 1)} THEN {x} "
        f"ELSE {ts_expr(r, depth + 1)} END)"
    )


def ts_int_expr(r: random.Random, depth: int = 0) -> str:
    """Integer field extraction from a timestamp (portable subset —
    day_of_week/day_of_year/week/quarter map to DuckDB's
    isodow/dayofyear/weekofyear/quarter in duck_dialect; Presto's
    day_of_week is ISO 1=Monday..7=Sunday like isodow)."""
    fn = r.choice(["year", "month", "day", "hour", "minute",
                   "day_of_week", "day_of_year", "week", "quarter"])
    return f"{fn}({ts_expr(r, depth + 1)})"


# date_format MySQL patterns with known DuckDB strftime twins — the
# generator only emits these, so duck_dialect's %i→%M / %s→%S literal
# translation is safe
_DF_PATTERNS = ("%Y-%m-%d", "%H:%i:%s", "%Y/%m", "%d %H", "%Y-%m-%d %H:%i")


def ts_str_expr(r: random.Random, depth: int = 0) -> str:
    """date_format over a SIMPLE operand (no commas — duck_dialect's
    pattern translation regex requires it): exercises the
    datetime_compat MySQL-pattern layer end-to-end."""
    x = r.choice([r.choice(TS_COLS), "TIMESTAMP '2024-01-20 12:34:56'"])
    return f"date_format({x}, '{r.choice(_DF_PATTERNS)}')"


def array_expr(r: random.Random, depth: int = 0) -> str:
    """Scalar-valued expressions over array HOFs (transform/filter —
    lambda syntax is shared with DuckDB's list_* family, mapped on the
    oracle side by _duck_dialect)."""
    elems = ", ".join(
        int_expr(r, depth + 2) for _ in range(r.randint(1, 4))
    )
    arr = f"ARRAY[{elems}]"
    kind = r.choice(
        ["transform_card", "filter_card", "distinct_card", "sort_idx",
         "contains", "index"]
    )
    if kind == "transform_card":
        return f"cardinality(transform({arr}, x -> x + {r.randint(-3, 3)}))"
    if kind == "filter_card":
        return f"cardinality(filter({arr}, x -> x > {r.randint(-4, 6)}))"
    if kind == "distinct_card":
        return f"cardinality(array_distinct({arr}))"
    if kind == "sort_idx":
        return f"(array_sort({arr})[{r.randint(1, 2)}])"
    if kind == "contains":
        return (
            f"(CASE WHEN contains({arr}, {r.randint(-2, 4)}) "
            f"THEN 1 ELSE 0 END)"
        )
    return f"({arr}[{r.randint(1, 5)}])"


def bool_expr(r: random.Random, depth: int = 0) -> str:
    if depth > 2:
        return r.choice(["TRUE", "FALSE", "a > 0", "b IS NULL"])
    kind = r.choice(
        ["cmp", "null", "between", "in", "not", "andor", "strcmp", "tscmp",
         "trycmp"]
    )
    if kind == "trycmp":
        # TRY over a single comparison whose operand may divide by zero
        # (column b holds 0): the engine lowers operands through try_*
        # arithmetic → NULL; DuckDB's /0 is NULL natively, so the
        # TRY-stripped oracle agrees row-wise
        return (
            f"TRY(({int_expr(r, depth + 1)} / b) "
            f"{r.choice(['<', '<=', '=', '>=', '>', '<>'])} "
            f"{int_expr(r, depth + 1)})"
        )
    if kind == "tscmp":
        return (
            f"({ts_expr(r, depth + 1)} "
            f"{r.choice(['<', '<=', '=', '>=', '>'])} "
            f"{ts_expr(r, depth + 1)})"
        )
    if kind == "cmp":
        return f"({int_expr(r, depth + 1)} {r.choice(['<', '<=', '=', '>=', '>', '<>'])} {int_expr(r, depth + 1)})"
    if kind == "strcmp":
        return f"({str_expr(r, depth + 1)} {r.choice(['=', '<>', '<'])} {str_expr(r, depth + 1)})"
    if kind == "null":
        return f"({int_expr(r, depth + 1)} IS {'NOT ' if r.random() < 0.5 else ''}NULL)"
    if kind == "between":
        return f"({int_expr(r, depth + 1)} BETWEEN {r.randint(-5, 3)} AND {r.randint(4, 15)})"
    if kind == "in":
        vals = ", ".join(str(r.randint(-5, 15)) for _ in range(r.randint(1, 4)))
        return f"({int_expr(r, depth + 1)} IN ({vals}))"
    if kind == "not":
        return f"(NOT {bool_expr(r, depth + 1)})"
    return f"({bool_expr(r, depth + 1)} {r.choice(['AND', 'OR'])} {bool_expr(r, depth + 1)})"


def agg_expr(r: random.Random) -> str:
    """Integral-result aggregates only (avg/stddev would need a float
    tolerance; the exact ones exercise the integer-division rewrite)."""
    kind = r.choice(["count_star", "count", "count_distinct", "sum",
                     "min", "max", "sum_distinct", "arith", "div"])
    col = r.choice(INT_COLS)
    if kind == "count_star":
        return "count(*)"
    if kind == "count":
        return f"count({col})"
    if kind == "count_distinct":
        return f"count(DISTINCT {col})"
    if kind == "sum_distinct":
        return f"sum(DISTINCT {col})"
    if kind in ("sum", "min", "max"):
        return f"{kind}({col})"
    if kind == "arith":
        return f"(sum({col}) {r.choice(['+', '-', '*'])} count(*))"
    # integral-aggregate division — Presto truncates (the agg-division
    # rewrite pass); divisor constants avoid /0
    return f"(sum({col}) / {r.choice(['2', '3', '7', 'count(*)'])})"


def gen_agg_query(r: random.Random) -> str:
    """GROUP BY over a derived key + aggregates [+ HAVING] [+ ORDER BY]."""
    key = r.choice(["a % 3", "abs(b % 2)", "length(s) % 3",
                    "(CASE WHEN a > 0 THEN 1 ELSE 0 END)"])
    aggs = ", ".join(
        f"{agg_expr(r)} AS g{i}" for i in range(r.randint(1, 3))
    )
    where = f" WHERE {bool_expr(r)}" if r.random() < 0.4 else ""
    having = (
        f" HAVING count(*) >= {r.randint(1, 2)}" if r.random() < 0.3 else ""
    )
    if r.random() < 0.3:  # global aggregation, no key
        return f"SELECT {aggs} FROM {ROWS}{where}"
    return (
        f"SELECT {key} AS k, {aggs} FROM {ROWS}{where}"
        f" GROUP BY {key}{having} ORDER BY k"
    )


_WIN_TIEBREAK = "coalesce(a, -99), coalesce(b, -99), s NULLS FIRST"


def gen_window_query(r: random.Random) -> str:
    """Window functions over the VALUES relation. The ORDER BY key is a
    total order of the rows (unique tiebreak incl. NULL s), so ranks and
    running frames are deterministic on both engines."""
    part = r.choice(
        ["", "PARTITION BY (abs(coalesce(a, 0)) % 2) ",
         "PARTITION BY (CASE WHEN b IS NULL THEN 0 ELSE abs(b) % 2 END) "]
    )
    over = f"OVER ({part}ORDER BY {_WIN_TIEBREAK})"
    fns = [
        f"row_number() {over}",
        f"rank() {over}",
        f"dense_rank() {over}",
        f"sum(coalesce(b, 0)) {over}",
        f"lag(coalesce(a, -1), 1) {over}",
        f"lead(coalesce(a, -1), 1, 0) {over}",
        f"first_value(coalesce(a, -1)) {over}",
        f"count(*) {over}",
    ]
    picked = r.sample(fns, r.randint(1, 3))
    sel = ", ".join(f"{e} AS w{i}" for i, e in enumerate(picked))
    return (
        f"SELECT coalesce(a, -99) AS k0, {sel} FROM {ROWS}"
        f" ORDER BY {_WIN_TIEBREAK}"
    )


def gen_setop_query(r: random.Random) -> str:
    op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    l_ = f"SELECT {int_expr(r)} AS c0, {str_expr(r)} AS c1 FROM {ROWS}"
    r_ = f"SELECT {int_expr(r)} AS c0, {str_expr(r)} AS c1 FROM {ROWS}"
    return f"({l_}) {op} ({r_})"


def gen_groupid_query(r: random.Random) -> str:
    """GROUPING SETS / ROLLUP / CUBE — the Expand-side rewrite machinery
    (grouping()→grouping_id mapping, set dedup/cross-product expansion,
    empty-input global rows). Two branches:

    - plain-column keys WITH a ``grouping(k1, k2)`` mask item (Presto
      restricts grouping() args to grouping columns; the mask also
      disambiguates set-NULL vs data-NULL rows),
    - expression keys WITHOUT grouping() — the expression-resolution
      path through the Expand.

    WHERE FALSE probes the empty-input global-row shim, which documents
    a bail on grouping()/HAVING — those are never combined with it.
    """
    with_mask = r.random() < 0.5
    if with_mask:
        k1, k2 = r.sample(["a", "b", "s"], 2)
    else:
        k1 = r.choice(["a % 2", "abs(coalesce(b, 0)) % 2", "length(s) % 2"])
        k2 = r.choice(["(CASE WHEN a > 0 THEN 1 ELSE 0 END)",
                       "coalesce(b, -1)"])
    form = r.choice(["sets", "sets_global", "rollup", "cube"])
    if form == "sets":
        sets = f"GROUPING SETS (({k1}), ({k1}, {k2}))"
    elif form == "sets_global":
        sets = f"GROUPING SETS (({k1}), ({k2}), ())"
    elif form == "rollup":
        sets = f"ROLLUP ({k1}, {k2})"
    else:
        sets = f"CUBE ({k1}, {k2})"
    aggs = ", ".join(
        f"{agg_expr(r)} AS g{i}" for i in range(r.randint(1, 2))
    )
    # aggregate-only HAVING rides the empty-input arm (count(*) >= 0 is
    # TRUE on the empty-input global row — the Presto-keeps-it corner)
    having = r.choice(
        ["", " HAVING count(*) >= 0", " HAVING count(*) >= 1",
         f" HAVING sum(coalesce({r.choice(INT_COLS)}, 0)) IS NOT NULL"]
    ) if r.random() < 0.4 else ""
    empty = r.random() < 0.15
    if empty:  # empty-input shim bails on grouping() select items
        return (
            f"SELECT {k1} AS k1, {k2} AS k2, {aggs} FROM {ROWS}"
            f" WHERE FALSE GROUP BY {sets}{having}"
        )
    mask = ""
    if with_mask:
        # full, reversed, and subset arg lists — Presto allows any
        # subset of the grouping columns in any order (the engine
        # lowers to an MSB-weighted sum of 1-arg grouping() bits)
        args = r.choice([f"{k1}, {k2}", f"{k2}, {k1}", k1, k2])
        mask = f", grouping({args}) AS gid"
    where = f" WHERE {bool_expr(r)}" if r.random() < 0.35 else ""
    return (
        f"SELECT {k1} AS k1, {k2} AS k2{mask}, {aggs} FROM {ROWS}"
        f"{where} GROUP BY {sets}{having}"
    )


# second relation for join/subquery shapes — k overlaps t.a's domain and
# both columns carry NULLs (the three-valued corner every IN/quantified
# rewrite must survive)
ROWS2 = (
    "(VALUES (1, 'x'), (3, 'y'), (4, NULL), (NULL, 'z'), (10, 'ww'))"
    " u(k, v)"
)


def gen_join_query(r: random.Random) -> str:
    """Two-relation joins (equi/theta/cross, all outer modes) over the
    VALUES relations — exercises the paren-join unwrap, outer-join ON
    rewrites and NULL join-key semantics."""
    jt = r.choice(
        ["JOIN", "INNER JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN",
         "CROSS JOIN"]
    )
    if jt == "CROSS JOIN":
        cond = ""
    else:
        cond = " ON " + r.choice(
            ["t.a = u.k", "t.b = u.k", "t.a < u.k", "t.a + 1 = u.k",
             "t.a = u.k AND u.v IS NOT NULL"]
        )
    cols = r.sample(["t.a", "t.b", "t.s", "u.k", "u.v"], r.randint(2, 4))
    sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(cols))
    where = f" WHERE {bool_expr(r)}" if r.random() < 0.3 else ""
    return f"SELECT {sel} FROM {ROWS} {jt} {ROWS2}{cond}{where}"


def gen_subquery_query(r: random.Random) -> str:
    """IN / NOT IN / EXISTS / quantified / scalar subquery predicates, in
    WHERE and in PROJECTION context — the decorrelation and three-valued
    rewrite paths. The subquery's NULL row is kept half the time."""
    sub_filter = r.choice(["", " WHERE k IS NOT NULL", f" WHERE k > {r.randint(-1, 3)}"])
    sub = f"SELECT k FROM {ROWS2}{sub_filter}"
    kind = r.choice(["in", "not_in", "exists", "corr_exists", "quant", "scalar"])
    if kind == "in":
        pred = f"a IN ({sub})"
    elif kind == "not_in":
        pred = f"a NOT IN ({sub})"
    elif kind == "exists":
        pred = f"EXISTS ({sub})"
    elif kind == "corr_exists":
        pred = f"EXISTS (SELECT 1 FROM {ROWS2} WHERE u.k = t.a{sub_filter.replace('WHERE', 'AND')})"
    elif kind == "quant":
        op = r.choice(["=", "<>", "<", ">", "<=", ">="])
        q_ = r.choice(["ANY", "ALL", "SOME"])
        pred = f"a {op} {q_} ({sub})"
    else:
        pred = f"a = (SELECT max(k) FROM {ROWS2})"
    if r.random() < 0.35 and kind not in ("corr_exists",):
        # projection context: the three-valued CASE rewrite path
        return (
            f"SELECT coalesce(a, -99) AS c0, ({pred}) AS c1 FROM {ROWS}"
        )
    return f"SELECT a AS c0, b AS c1 FROM {ROWS} WHERE {pred}"


def gen_query(r: random.Random) -> str:
    shape = r.random()
    if shape < 0.17:
        return gen_agg_query(r)
    if shape < 0.23:
        return gen_groupid_query(r)
    if shape < 0.3:
        return gen_setop_query(r)
    if shape < 0.38:
        return gen_window_query(r)
    if shape < 0.48:
        return gen_join_query(r)
    if shape < 0.57:
        return gen_subquery_query(r)
    items = []
    for _ in range(r.randint(1, 4)):
        kind = r.random()
        if kind < 0.4:
            items.append(int_expr(r))
        elif kind < 0.7:
            items.append(str_expr(r))
        elif kind < 0.85:
            items.append(bool_expr(r))
        else:
            items.append(ts_expr(r))
    sel = ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(items)
    )
    where = f" WHERE {bool_expr(r)}" if r.random() < 0.5 else ""
    return f"SELECT {sel} FROM {ROWS}{where}"


# Presto spellings → DuckDB spellings for the oracle side (the engine
# side goes through Engine.sql's own rewrites). Lambda syntax (x -> ..)
# is shared, only the function names differ.
_DUCK_RENAMES = [
    (r"\btransform\(", "list_transform("),
    (r"\bfilter\(", "list_filter("),
    (r"\bcardinality\(", "len("),
    # DuckDB's list_distinct DROPS nulls; Presto/Spark array_distinct keeps
    # exactly one — route through the compensating macro (run_fuzz installs)
    (r"\barray_distinct\(", "presto_array_distinct("),
    (r"\barray_sort\(", "list_sort("),
    (r"\bcontains\(", "list_contains("),
    # DuckDB has no TRY; the grammar only wraps non-failing operands
    # (division avoids zero divisors), so TRY(x) == (x) on the oracle
    (r"\bTRY\(", "("),
    # Presto 0.216 greatest/least NULL-propagate (AbstractGreatestLeast);
    # DuckDB ignores NULLs — route through compensating macros
    (r"\bgreatest\(", "presto_greatest("),
    (r"\bleast\(", "presto_least("),
    # Presto substr with a negative start past the string head is ''
    # (StringFunctions.java:237 startCodePoint < 0); DuckDB clamps the
    # window to the head — compensating macro (3-arg, the only arity
    # the grammar emits)
    (r"\bsubstr\(", "presto_substr("),
    # datetime field spellings (Presto → DuckDB)
    (r"\bday_of_week\(", "isodow("),
    (r"\bday_of_year\(", "dayofyear("),
    (r"\bweek\(", "weekofyear("),
    # Presto split_part returns NULL past the last field; DuckDB ''
    (r"\bsplit_part\(", "presto_split_part("),
]


def duck_dialect(q: str) -> str:
    import re as _re

    from presto_ads_spark.rewrite import (
        _rewrite_int_literal_division,
        infer_values_int_cols,
        rewrite_integral_column_division,
    )

    dq = rewrite_integral_column_division(
        _rewrite_int_literal_division(q),
        frozenset(INT_COLS) | infer_values_int_cols(q),
    ).replace(" DIV ", " // ")
    # MySQL %-patterns → strftime C patterns (the grammar only emits
    # comma-free first operands and the _DF_PATTERNS whitelist)
    dq = _re.sub(
        r"date_format\(([^,()]+(?:\([^()]*\))?[^,()]*),\s*'([^']*)'\)",
        lambda m: "strftime({}, '{}')".format(
            m.group(1), m.group(2).replace("%i", "%M").replace("%s", "%S")
        ),
        dq,
    )
    for pat, rep in _DUCK_RENAMES:
        dq = _re.sub(pat, rep, dq)
    return dq


def install_duck_macros(duck) -> None:
    """Install the Presto-semantics compensating macros every DuckDB
    oracle connection needs before running ``duck_dialect`` output
    (shared by run_fuzz and tests/test_property.py)."""
    # Presto array_distinct keeps one NULL (ArrayDistinctFunction treats
    # null as a distinct value); DuckDB's list_distinct drops all nulls.
    duck.execute(
        "CREATE OR REPLACE MACRO presto_array_distinct(l) AS "
        "list_distinct(l) || CASE WHEN len(list_filter(l, e -> e IS NULL)) "
        "> 0 THEN [NULL] ELSE [] END"
    )
    # Presto 0.216 greatest/least are RETURN_NULL_ON_NULL
    # (AbstractGreatestLeast.java:118); DuckDB ignores NULLs.
    for gl in ("greatest", "least"):
        duck.execute(
            f"CREATE OR REPLACE MACRO presto_{gl}(a, b) AS "
            f"CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE {gl}(a, b) END"
        )
    # Presto substr (StringFunctions.java:260-293): start 0 / length<=0
    # → ''; negative start is end-relative and '' when it lands before
    # the head — DuckDB clamps that window to the head instead
    duck.execute(
        "CREATE OR REPLACE MACRO presto_substr(s, st, ln) AS "
        "CASE WHEN s IS NULL OR st IS NULL OR ln IS NULL THEN NULL "
        "WHEN st = 0 OR ln <= 0 THEN '' "
        "WHEN st < 0 AND length(s) + st < 0 THEN '' "
        "WHEN st < 0 THEN substr(s, length(s) + st + 1, ln) "
        "ELSE substr(s, st, ln) END"
    )
    # Presto split_part returns NULL past the last field
    # (StringFunctions.splitPart); DuckDB returns ''
    duck.execute(
        "CREATE OR REPLACE MACRO presto_split_part(s, d, n) AS "
        "CASE WHEN s IS NULL OR d IS NULL OR n IS NULL THEN NULL "
        "WHEN len(string_split(s, d)) < n THEN NULL "
        "ELSE split_part(s, d, n) END"
    )


# --- TSWTZ / locale self-oracle cases ---------------------------------
# Zone-carrying temporal expressions can't use DuckDB as the oracle
# (TIMESTAMPTZ semantics differ); the expected value is computed HERE
# with plain datetime/zoneinfo — an independent evaluator exercising the
# rewrite layer's literal folds, operator lowerings, interval-chain
# commutes and AT TIME ZONE splices (where the r12/r13 bugs lived),
# not the zone math it shares with functions/tstz_compat.

_TSTZ_OFFSETS = ("+07:09", "-05:00", "+05:30", "-11:00", "+13:45")
_TSTZ_REGIONS = (
    "Europe/Berlin", "America/Los_Angeles", "Asia/Kathmandu", "Asia/Oral",
)


def _pyzone(z: str):
    import datetime as _dt
    import re as _re
    from zoneinfo import ZoneInfo

    if _re.fullmatch(r"[+-]\d{2}:\d{2}", z):
        sign = -1 if z[0] == "-" else 1
        return _dt.timezone(
            sign * _dt.timedelta(hours=int(z[1:3]), minutes=int(z[4:6]))
        )
    return ZoneInfo(z)


def _tstz_render(instant_ms: int, zone: str) -> str:
    """Presto CAST(TSWTZ AS VARCHAR): local millis clock + zone id."""
    import datetime as _dt

    dt = _dt.datetime.fromtimestamp(instant_ms / 1000.0, _pyzone(zone))
    return dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{instant_ms % 1000:03d}" \
        .rjust(3, "0") + " " + zone


def _add_months_clamped(instant_ms: int, zone: str, months: int) -> int:
    """Presto YM-interval add on TSWTZ: calendar add on the local clock
    in the value's zone (day clamped), repacked. Fuzz restricts YM ops
    to OFFSET zones, so the repack is unambiguous."""
    import calendar
    import datetime as _dt

    tz = _pyzone(zone)
    loc = _dt.datetime.fromtimestamp(instant_ms / 1000.0, tz)
    y = loc.year + (loc.month - 1 + months) // 12
    m = (loc.month - 1 + months) % 12 + 1
    d = min(loc.day, calendar.monthrange(y, m)[1])
    out = loc.replace(year=y, month=m, day=d)
    return round(out.timestamp() * 1000)  # millis ride on .microsecond


def gen_tstz_case(r: random.Random):
    """One zone-carrying query + its python-computed expected row."""
    import datetime as _dt

    zone = r.choice(_TSTZ_OFFSETS + _TSTZ_REGIONS)
    y, mo, d = r.randint(2001, 2024), r.randint(1, 12), r.randint(1, 28)
    h, mi, s, ms = (r.randint(0, 23), r.randint(0, 59), r.randint(0, 59),
                    r.choice([0, 321, 999]))
    tz = _pyzone(zone)
    instant = int(
        _dt.datetime(y, mo, d, h, mi, s, ms * 1000, tzinfo=tz)
        .timestamp() * 1000
    )
    frac = f".{ms:03d}" if ms else ""
    expr = f"TIMESTAMP '{y}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}{frac} {zone}'"

    for _ in range(r.randint(0, 2)):
        op = r.choice(["dts", "dts_first", "ym", "attz", "attz_ivl"])
        if op in ("dts", "dts_first"):
            n = r.randint(1, 72)
            unit = r.choice(["HOUR", "MINUTE", "DAY", "SECOND"])
            ms_per = {"SECOND": 1000, "MINUTE": 60_000,
                      "HOUR": 3_600_000, "DAY": 86_400_000}[unit]
            if op == "dts_first":
                expr = f"INTERVAL '{n}' {unit} + {expr}"
                instant += n * ms_per
            else:
                sign = r.choice(["+", "-"])
                expr = f"{expr} {sign} INTERVAL '{n}' {unit}"
                instant += (n if sign == "+" else -n) * ms_per
        elif op == "ym" and zone in _TSTZ_OFFSETS:
            n = r.randint(1, 30)
            sign = r.choice(["+", "-"])
            expr = f"{expr} {sign} INTERVAL '{n}' MONTH"
            instant = _add_months_clamped(
                instant, zone, n if sign == "+" else -n
            )
        elif op == "attz":
            zone = r.choice(_TSTZ_OFFSETS + _TSTZ_REGIONS)
            expr = f"({expr}) AT TIME ZONE '{zone}'"
        elif op == "attz_ivl":
            hh, mm = r.randint(0, 13), r.choice([0, 30, 45])
            zone = f"+{hh:02d}:{mm:02d}" if hh or mm else "UTC"
            expr = f"({expr}) AT TIME ZONE INTERVAL '{hh:02d}:{mm:02d}' HOUR TO MINUTE"

    final = r.choice(["varchar", "hour", "tz_hour", "to_unixtime"])
    if final == "varchar":
        want = _tstz_render(instant, zone)
        return f"SELECT CAST({expr} AS VARCHAR) AS x", [(want,)]
    loc = _dt.datetime.fromtimestamp(instant / 1000.0, _pyzone(zone))
    if final == "hour":
        return f"SELECT hour({expr}) AS x", [(loc.hour,)]
    if final == "tz_hour":
        off = loc.utcoffset() or _dt.timedelta(0)
        total_min = int(off.total_seconds()) // 60
        tzh = int(total_min / 60)  # truncation toward zero, like Presto
        return f"SELECT timezone_hour({expr}) AS x", [(tzh,)]
    return (
        f"SELECT round(to_unixtime({expr}), 3) AS x",
        [(round(instant / 1000.0, 3),)],
    )


_KO_WD = ["월요일", "화요일", "수요일", "목요일", "금요일", "토요일",
          "일요일"]
_KO_MON = [f"{i}월" for i in range(1, 13)]


def gen_locale_case(r: random.Random):
    """format_datetime under the ko session locale — expected computed
    from an independent hardcoded name table + python weekday()."""
    import datetime as _dt

    y, mo, d = r.randint(2001, 2024), r.randint(1, 12), r.randint(1, 28)
    h = r.randint(0, 23)
    lit = f"TIMESTAMP '{y}-{mo:02d}-{d:02d} {h:02d}:15:00'"
    kind = r.choice(["EEEE", "MMMM", "a"])
    if kind == "EEEE":
        want = _KO_WD[_dt.date(y, mo, d).weekday()]
    elif kind == "MMMM":
        want = _KO_MON[mo - 1]
    else:
        want = "오전" if h < 12 else "오후"
    return f"SELECT format_datetime({lit}, '{kind}') AS x", [(want,)], "ko"


def run_fuzz(n: int, seed: int, eng, duck, verbose: bool = True):
    """Run n seeded queries through Engine.sql and DuckDB; returns the
    list of mismatch descriptions (empty = clean)."""
    import _golden_util as gu

    install_duck_macros(duck)
    rng = random.Random(seed)
    failures: list[str] = []
    oracle_skipped = 0
    for i in range(n):
        locale = None
        roll = rng.random()
        if roll < 0.15:
            q, want = gen_tstz_case(rng)   # python self-oracle (TSWTZ)
        elif roll < 0.20:
            q, want, locale = gen_locale_case(rng)
        else:
            q = gen_query(rng)
            try:
                want = [
                    tuple(r)
                    for r in duck.execute(duck_dialect(q)).fetchall()
                ]
            except Exception:
                oracle_skipped += 1
                continue  # oracle-side dialect gap, not our bug
        try:
            if locale is not None:
                eng.session_locale = locale
            got = [tuple(r) for r in eng.sql(q).collect()]
            diff = gu.compare_pyrows(got, want)
        except Exception as e:  # noqa: BLE001
            diff = f"ENGINE EXC {type(e).__name__}: {str(e)[:160]}"
        finally:
            if locale is not None:
                eng.session_locale = "en"
        if diff is not None:
            failures.append(
                f"query {i} seed {seed}: {q}\n  {str(diff)[:300]}"
            )
            if verbose:
                print(f"\nMISMATCH #{len(failures)}:\n  {failures[-1]}")
    if verbose:
        print(
            f"\n{n} queries, {len(failures)} mismatches, "
            f"{oracle_skipped} oracle-dialect skips"
        )
    return failures


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260814
    import duckdb

    from presto_ads_spark.engine import Engine
    from presto_ads_spark.session import get_spark

    spark = get_spark("fuzz", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark.newSession(), sf_dir=None)
    run_fuzz(n, seed, eng, duckdb.connect())


if __name__ == "__main__":
    main()
