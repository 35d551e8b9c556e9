"""Text analysis operators: stats/quality, language-ID heuristic, token
counting, document fingerprinting. All pure Spark expressions (JVM-side,
codegen) — no Python in the hot path."""

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


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Quality-scoring features: token/char counts, token length stats,
    stopword ratio, type-token ratio. One projection — no shuffle.

    ``carry_cols`` are passed through unchanged so downstream consumers
    don't need a self-join back to the source table for them."""
    toks = tokens(F.col(text_col))
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    total_tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.length(F.col(text_col)).cast("int").alias("n_chars"),
        n_toks.cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_types"),
        (F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double")).alias(
            "type_token_ratio"
        ),
        (total_tok_chars.cast("double") / n_toks.cast("double")).alias("avg_token_len"),
        (stop_hits.cast("double") / n_toks.cast("double")).alias("stopword_ratio"),
        (n_toks >= 20).alias("len_ok"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language scoring; argmax with fixed lang order tiebreak."""
    toks = tokens(F.col(text_col))
    scores = [
        F.size(F.filter(toks, lambda x: x.isin(*marks))).alias(f"score_{lang}")
        for lang, marks in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), F.col("lang").alias("lang_true"), *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col,
        "lang_true",
        pred.alias("lang_pred"),
        best.cast("int").alias("best_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rolling polynomial hash over normalized tokens (order-sensitive
    content fingerprint, exact integer left fold — oracle-reproducible)."""
    p = 268435399
    toks = tokens(F.lower(F.trim(F.col(text_col))))
    rolled = F.aggregate(
        F.transform(toks, lambda x: md5_hash_col(x) % p),
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 131 + h) % p,
    )
    return df.select(
        F.col(id_col),
        rolled.alias("fingerprint"),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("digest"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText quality
    rules' repetition family): duplicate-bigram fraction, most-frequent
    bigram fraction, most-frequent token fraction, and a keep cut.

    Entirely row-local HOF arithmetic — a projection, no shuffle, no
    Python; at 100 TB this costs one codegen'd pass over the text column.
    The per-distinct-gram count scan is O(distinct x total) per document,
    bounded by document length — not by corpus size.
    """
    # stage the arrays as real columns: inlining `bigrams` inside the
    # per-distinct-gram lambda would re-evaluate the whole construction
    # once per element (no CSE across HOF lambda boundaries) — staged,
    # each array is built once per row and the scans run on materialized
    # values
    toks = tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col), toks.alias("__t")
    ).select(
        id_col,
        "__t",
        # guard: sequence(1, size-1) on a single-token doc is
        # sequence(1, 0) = [1, 0] (descending), and element_at(t, 0)
        # throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT — 0/1-token docs
        # have no bigrams, return []
        F.when(
            F.size("__t") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("__t", i), F.element_at("__t", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("__bg"),
    ).select(
        id_col,
        "__t",
        "__bg",
        F.array_distinct("__bg").alias("__db"),
        F.array_distinct("__t").alias("__dw"),
    )
    scored = staged.select(
        id_col,
        F.size("__t").alias("__n"),
        F.size("__bg").alias("__nbi"),
        F.size("__db").alias("__ndb"),
        F.array_max(
            F.transform(
                "__db",
                lambda g: F.size(F.filter("__bg", lambda x: x == g)),
            )
        ).alias("__topb"),
        F.array_max(
            F.transform(
                "__dw",
                lambda wd: F.size(F.filter("__t", lambda x: x == wd)),
            )
        ).alias("__topw"),
    )
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
    return scored.select(
        F.col(id_col),
        dup_bigram_frac.alias("dup_bigram_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        top_token_frac.alias("top_token_frac"),
        (
            (dup_bigram_frac < 0.5)
            & (top_bigram_frac < 0.2)
            & (top_token_frac < 0.3)
        ).alias("keep"),
    )
