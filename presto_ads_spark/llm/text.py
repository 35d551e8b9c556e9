"""Text analysis operators: stats/quality, language-ID heuristic, token
counting, document fingerprinting. All pure Spark expressions (JVM-side,
codegen) — no Python in the hot path.

Each probe is exposed standalone (text_stats, lang_id, fingerprint,
repetition_stats) AND fused (``metrics``): every probe is a 1:1 row-local
projection of the same table, so the suite that wants all of them should
run ONE staged projection chain instead of join-merging four scans on
doc_id. The expression builders are shared so the fused outputs are
bit-identical to the standalone probes by construction."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash_col

STOPWORDS = ("the", "a", "of", "and", "to")

# Tiny per-language marker profiles for the n-gram/stopword language-ID
# heuristic. (The synthetic corpus shares one vocabulary, so this exercises
# the scoring plumbing; real profiles drop in without plan changes.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "das"),
    "fr": ("le", "la", "les"),
    "zh": ("的", "是", "了"),
}

FINGERPRINT_P = 268435399


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def _stats_exprs(text: Column, toks: Column, dtoks: Column) -> list[Column]:
    """Quality-scoring feature expressions over a text column and its
    token / distinct-token arrays (pass staged columns to avoid
    re-splitting; pass the raw expressions for the standalone probe)."""
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    total_tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return [
        F.length(text).cast("int").alias("n_chars"),
        n_toks.cast("int").alias("n_tokens"),
        F.size(dtoks).cast("int").alias("n_types"),
        (F.size(dtoks).cast("double") / n_toks.cast("double")).alias(
            "type_token_ratio"
        ),
        (total_tok_chars.cast("double") / n_toks.cast("double")).alias("avg_token_len"),
        (stop_hits.cast("double") / n_toks.cast("double")).alias("stopword_ratio"),
        (n_toks >= 20).alias("len_ok"),
    ]


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Quality-scoring features: token/char counts, token length stats,
    stopword ratio, type-token ratio. One projection — no shuffle.

    ``carry_cols`` are passed through unchanged so downstream consumers
    don't need a self-join back to the source table for them."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        *_stats_exprs(F.col(text_col), toks, F.array_distinct(toks)),
    )


def _lang_score_exprs(toks: Column) -> list[Column]:
    return [
        F.size(F.filter(toks, lambda x: x.isin(*marks))).alias(f"score_{lang}")
        for lang, marks in LANG_MARKERS.items()
    ]


def _lang_pred_exprs() -> list[Column]:
    """lang_pred/best_score from staged score_<lang> columns: argmax with
    fixed lang order tiebreak."""
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return [pred.alias("lang_pred"), best.cast("int").alias("best_score")]


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language scoring; argmax with fixed lang order tiebreak."""
    scored = df.select(
        F.col(id_col),
        F.col("lang").alias("lang_true"),
        *_lang_score_exprs(tokens(F.col(text_col))),
    )
    return scored.select(id_col, "lang_true", *_lang_pred_exprs())


def _fingerprint_exprs(lowered: Column) -> list[Column]:
    """Rolling polynomial hash + md5 digest over a lower(trim(text))
    column (order-sensitive content fingerprint, exact integer left fold —
    oracle-reproducible)."""
    rolled = F.aggregate(
        F.transform(tokens(lowered), lambda x: md5_hash_col(x) % FINGERPRINT_P),
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 131 + h) % FINGERPRINT_P,
    )
    return [rolled.alias("fingerprint"), F.md5(lowered).alias("digest")]


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rolling polynomial hash over normalized tokens (order-sensitive
    content fingerprint, exact integer left fold — oracle-reproducible)."""
    return df.select(
        F.col(id_col), *_fingerprint_exprs(F.lower(F.trim(F.col(text_col))))
    )


def _bigram_expr(toks: Column) -> Column:
    """Adjacent-bigram array of a token array column.

    guard: sequence(1, size-1) on a single-token doc is sequence(1, 0) =
    [1, 0] (descending), and element_at(t, 0) throws
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT — 0/1-token docs have no bigrams,
    return []."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _rep_count_exprs() -> list[Column]:
    """Repetition counting scans over staged __t/__bg/__db/__dw columns.
    The per-distinct-gram count scan is O(distinct x total) per document,
    bounded by document length — not by corpus size."""
    return [
        F.size("__t").alias("__n"),
        F.size("__bg").alias("__nbi"),
        F.size("__db").alias("__ndb"),
        F.array_max(
            F.transform(
                "__db", lambda g: F.size(F.filter("__bg", lambda x: x == g))
            )
        ).alias("__topb"),
        F.array_max(
            F.transform(
                "__dw", lambda wd: F.size(F.filter("__t", lambda x: x == wd))
            )
        ).alias("__topw"),
    ]


def _rep_out_exprs(keep_alias: str = "keep") -> list[Column]:
    """Final repetition fractions + keep cut from the staged __n/__nbi/
    __ndb/__topb/__topw counters."""
    nbi = F.col("__nbi")
    dup_bigram_frac = F.when(
        nbi > 0,
        F.lit(1.0) - F.col("__ndb").cast("double") / nbi.cast("double"),
    ).otherwise(F.lit(0.0))
    top_bigram_frac = F.when(
        nbi > 0, F.col("__topb").cast("double") / nbi.cast("double")
    ).otherwise(F.lit(0.0))
    top_token_frac = F.when(
        F.col("__n") > 0,
        F.col("__topw").cast("double") / F.col("__n").cast("double"),
    ).otherwise(F.lit(0.0))
    return [
        dup_bigram_frac.alias("dup_bigram_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        top_token_frac.alias("top_token_frac"),
        (
            (dup_bigram_frac < 0.5)
            & (top_bigram_frac < 0.2)
            & (top_token_frac < 0.3)
        ).alias(keep_alias),
    ]


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText quality
    rules' repetition family): duplicate-bigram fraction, most-frequent
    bigram fraction, most-frequent token fraction, and a keep cut.

    Entirely row-local HOF arithmetic — a projection, no shuffle, no
    Python; at 100 TB this costs one codegen'd pass over the text column.

    The arrays are STAGED as real columns: inlining `bigrams` inside the
    per-distinct-gram lambda would re-evaluate the whole construction
    once per element (no CSE across HOF lambda boundaries) — staged,
    each array is built once per row and the scans run on materialized
    values."""
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).select(
        id_col, "__t", _bigram_expr(F.col("__t")).alias("__bg")
    ).select(
        id_col,
        "__t",
        "__bg",
        F.array_distinct("__bg").alias("__db"),
        F.array_distinct("__t").alias("__dw"),
    )
    scored = staged.select(id_col, *_rep_count_exprs())
    return scored.select(F.col(id_col), *_rep_out_exprs())


def metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            lang_col: str = "lang") -> DataFrame:
    """All four probes fused into ONE staged projection chain — zero joins
    (formerly: 4 scans of the same table join-merged on doc_id, i.e. three
    1:1 self-joins that only re-attach columns a single pass computes).
    Output columns match the join order of
    stats ⋈ lang ⋈ fingerprint ⋈ repetition(keep→rep_keep).

    Staging discipline as in repetition_stats: expensive arrays/counters
    are real columns referenced >1 time, so CollapseProject leaves them
    staged; every output expression is the same builder the standalone
    probes use over the same values — bit-identical results."""
    text_c = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.col(lang_col).alias("lang_true"),
        text_c,
        tokens(text_c).alias("__t"),
        F.lower(F.trim(text_c)).alias("__lt"),
    ).select(
        id_col, "lang_true", text_col, "__t", "__lt",
        _bigram_expr(F.col("__t")).alias("__bg"),
        *_lang_score_exprs(F.col("__t")),
    ).select(
        "*",
        F.array_distinct("__bg").alias("__db"),
        F.array_distinct("__t").alias("__dw"),
    )
    counted = staged.select(
        id_col, "lang_true", text_col, "__t", "__lt", "__dw",
        *[F.col(f"score_{lang}") for lang in LANG_MARKERS],
        *_rep_count_exprs(),
    )
    return counted.select(
        F.col(id_col),
        *_stats_exprs(text_c, F.col("__t"), F.col("__dw")),
        F.col("lang_true"),
        *_lang_pred_exprs(),
        *_fingerprint_exprs(F.col("__lt")),
        *_rep_out_exprs(keep_alias="rep_keep"),
    )
