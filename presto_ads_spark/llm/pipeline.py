"""Corpus-preparation pipeline operators beyond dedup/similarity: line/
n-gram boilerplate removal, PII redaction, sequence packing, and
domain-weighted mixture sampling — the remaining ops a training-data
pipeline runs between raw crawl and tokenizer.

All are pure DataFrame compositions (JVM-side, codegen; no Python UDFs):

- boilerplate: CCNet/RefinedWeb-style document-frequency filtering — an
  n-gram that appears in a large fraction of documents is template
  boilerplate. One explode + one grouped count (map-side partial agg) +
  one broadcast join back (the boilerplate set is tiny by construction:
  it's the grams above a high doc-frequency threshold).
- PII redaction: single projection of regexp_replace/extract chains
  (Java regex, whole-stage codegen). At 100 TB this is the cheapest kind
  of operator — embarrassingly parallel, no shuffle.
- sequence packing: greedy in-order bin-packing of documents into fixed
  token budgets via a running-sum window partitioned by source — one
  shuffle on the partition key, then a streaming window. (Per-source
  streams mirror how packing runs per input shard in practice; a skewed
  source can be salted into sub-streams without changing the algebra.)
- mixture sampling: deterministic hash-gated per-domain rates (the
  "data mixture" step) — a filter, no shuffle, reproducible across runs
  and engines because the gate is an md5 fold, not Spark's sample().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import md5_hash_col, shingles_sql
from .hints import gated_broadcast
from .text import tokens

# --- boilerplate n-gram removal -------------------------------------------


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 3,
    min_doc_frac: float = 0.20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document boilerplate ratio from document-frequency n-grams.

    A distinct word n-gram occurring in >= ``min_doc_frac`` of all
    documents is boilerplate; each document reports how many of its
    grams are boilerplate and whether it passes a 50% cut. Plan: explode
    (no shuffle) -> gram doc-frequency groupBy (one shuffle, partial
    aggs) -> tiny high-DF set joined back (broadcastable) -> per-doc
    regroup. Reference analog: none in presto-ads — corpus-prep
    extension (CCNet §4.2-style df filtering).
    """
    # Per-doc gram arrays hashed to 64-bit (xxhash64): the df-count
    # shuffle carries 16-byte (hash, count) pairs instead of gram strings,
    # and the membership test is a long-array intersect. A 64-bit
    # collision merges two grams' doc frequencies — vanishing at any
    # realistic distinct-gram count and harmless near the threshold.
    # token array staged first: slicing the raw split() inside shingles()
    # re-evaluates the split per gram (O(len²) per document). SQL-string
    # projections: one JVM parse instead of per-column py4j trees (r14).
    # NULL-text docs are dropped EXPLICITLY (r13 verdict item 7): the old
    # explode-based shape dropped them implicitly, the row-wise base would
    # keep them with NULL gram counts, and the oracle (which groups over
    # the exploded gram table) drops them — pin the contract here.
    # n_docs below still counts every document, matching the oracle's nd.
    docs = df.filter(F.col(text_col).isNotNull()).selectExpr(
        f"`{id_col}` AS doc_id", f"split(`{text_col}`, ' ') AS __t"
    ).selectExpr(
        "doc_id",
        f"transform({shingles_sql('__t', n)}, g -> xxhash64(g)) AS grams",
    )
    # persist the hashed gram arrays — the df-count branch and the
    # join-back branch would otherwise each re-run scan+split+shingle
    # (at 100 TB this is the natural stage boundary to a temp table)
    docs = docs.persist()
    exploded = docs.select("doc_id", F.explode("grams").alias("g"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    # shingles() is per-doc distinct, so (doc, gram) pairs are unique and
    # doc-frequency is a plain COUNT — one shuffle with map-side partial
    # aggs. The high-DF survivor set is bounded by grams_per_doc /
    # min_doc_frac regardless of corpus size, so the join-back is a
    # broadcast hash join on 8-byte keys.
    gram_df = (
        exploded.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") >= F.col("n_docs") * F.lit(min_doc_frac))
        .select("g")
    )
    # n_grams is size(grams) row-wise — no need to push every gram through
    # the per-doc regroup just to count it; only BOILERPLATE hits survive
    # the inner join, so the regroup aggregates the hit stream alone and
    # the bounded per-doc hit counts broadcast back onto the row-wise base.
    base = docs.select("doc_id", F.size("grams").cast("bigint").alias("n_grams"))
    hits = (
        exploded.join(F.broadcast(gram_df), "g", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n_boiler"))
        .persist()
    )
    n_boiler = F.coalesce(F.col("__n_boiler"), F.lit(0)).cast("bigint")
    return (
        base.join(gated_broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_boiler.alias("n_boiler"),
            (n_boiler / F.col("n_grams")).alias("boiler_ratio"),
            (n_boiler * 2 < F.col("n_grams")).alias("keep"),
        )
    )


# --- benchmark decontamination ---------------------------------------------


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Eval-set decontamination (GPT-3 appx-C / Llama-style): flag
    training documents that share any word ``n``-gram with a benchmark
    set, so they can be dropped before training.

    Scale plan: the eval side is usually tiny relative to the corpus
    (benchmark suites are 10^3–10^6 documents vs 10^9+ train docs), so
    its DISTINCT gram-hash set — 8-byte xxhash64 keys bounded by eval
    token count, no strings — is persisted once and broadcast THROUGH A
    SIZE-GATED HINT (hints.gated_broadcast): "eval is tiny" is a
    data-dependent assumption, and an eval suite past the row cap
    (10^6 docs × ~500 grams ≈ 4 GB of keys) must degrade to a plain
    key-equi shuffle join AQE can still plan, not die at the 8 GB
    broadcast wall. The train side explodes per-doc distinct gram
    hashes and left-joins the (hinted) set: the corpus never shuffles
    until the per-doc regroup (one exchange, with map-side partial
    aggs; (doc, gram) pairs are per-doc distinct so the hit count is a
    plain SUM). A 64-bit gram-hash collision can only over-flag (false
    contamination) — the safe direction for training hygiene — at
    ~2^-64 per gram pair.

    Output: one row per train document — ``n_grams``, ``n_hit`` (grams
    also in the eval set), ``contaminated``, ``keep``.
    Reference analog: none in presto-ads — corpus-prep extension.
    """
    def gram_frame(frame: DataFrame, txt: str, keep_cols: list) -> DataFrame:
        # token array STAGED as a projection before shingles(): slicing
        # the raw split() inside the per-gram lambda re-evaluates the
        # split once per gram — O(len²) per document (same fix as
        # dedup.shingle_table; the pre-r13 shape paid it on every doc).
        # SQL-string projections: one JVM parse per select (r14).
        # NULL-text rows dropped explicitly — the oracle groups over the
        # exploded gram table, which never sees them (r13 verdict item 7).
        toked = frame.filter(F.col(txt).isNotNull()).selectExpr(
            *keep_cols, f"split(`{txt}`, ' ') AS __t"
        )
        return toked.selectExpr(
            *keep_cols,
            f"transform({shingles_sql('__t', n)}, g -> xxhash64(g)) AS __g",
        )

    eval_grams = (
        gram_frame(eval_df, eval_text_col, [])
        .select(F.explode(F.col("__g")).alias("g"))
        .distinct()
        .persist()  # the gate probe doubles as materialization
    )
    # Per-doc gram arrays persisted once: the row-wise n_grams branch and
    # the exploded hit branch both read it (at 100 TB this is the natural
    # stage boundary to a temp table).
    doc_grams = gram_frame(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col,
        ["doc_id"],
    ).persist()
    # n_grams is size(__g) — a row-wise projection; no reason to explode
    # every gram through an aggregate just to count it.
    base = doc_grams.select("doc_id", F.size("__g").cast("bigint").alias("n_grams"))
    # Only HITS survive the inner join (most grams miss the eval set), so
    # the per-doc regroup aggregates the tiny hit stream instead of every
    # (doc, gram) pair. The hit-count frame is bounded by the number of
    # contaminated docs — gated broadcast back onto the row-wise base.
    hits = (
        doc_grams.select("doc_id", F.explode(F.col("__g")).alias("g"))
        .join(gated_broadcast(eval_grams), "g", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n_hit"))
        .persist()
    )
    return (
        base.join(gated_broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("__n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
            (F.coalesce(F.col("__n_hit"), F.lit(0)) > 0).alias("contaminated"),
            (F.coalesce(F.col("__n_hit"), F.lit(0)) == 0).alias("keep"),
        )
    )


# --- PII redaction ---------------------------------------------------------

# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB oracle): no lookarounds, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and mask emails / phone numbers / IPv4 literals.

    One projection — regexp_extract_all for the counts, chained
    regexp_replace for the masked text. No shuffle; scales linearly.
    """
    red = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}"),
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


# --- sequence packing ------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "source",
    chunk_docs: int | None = None,
) -> DataFrame:
    """Greedy in-order packing of documents into fixed token budgets.

    Within each ``part_col`` stream (ordered by id), a document joins the
    sequence numbered ``floor(tokens_before / budget)`` — the standard
    streaming approximation of first-fit packing (a document may overflow
    its bin boundary; bins are token-budget aligned on average). Output
    is one row per packed sequence with its fill statistics. One shuffle
    (window partition key), streaming window, grouped agg on the same
    key — no second exchange.

    ``chunk_docs`` is the SKEW path: the default windows over
    ``part_col`` alone, so one hot source (half the corpus) serializes
    on a single sort partition with no AQE help. Chunked, rows window
    over (source, id-range chunk) — bounded partitions — and the
    chunk-base token offsets travel through a tiny per-chunk frame
    (broadcast back). The prefix sum decomposes exactly
    (tokens_before = chunk_base + within-chunk prefix), so results are
    IDENTICAL to the unchunked plan, not an approximation.
    """
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    if chunk_docs is None:
        w = (
            Window.partitionBy(part_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        with_seq = df.select(
            F.col(part_col), F.col(id_col), n_tok.alias("n_tok")
        ).withColumn(
            "seq_id",
            F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget),
        )
    else:
        staged = df.select(
            F.col(part_col),
            F.col(id_col),
            n_tok.alias("n_tok"),
            F.floor(F.col(id_col) / F.lit(int(chunk_docs))).alias("__ck"),
        )
        wck = (
            Window.partitionBy(part_col)
            .orderBy("__ck")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        base = (
            staged.groupBy(part_col, "__ck")
            .agg(F.sum("n_tok").alias("__ct"))
            .select(
                part_col,
                "__ck",
                F.coalesce(F.sum("__ct").over(wck), F.lit(0))
                .alias("__base"),
            )
        )
        win = (
            Window.partitionBy(part_col, "__ck")
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        with_seq = staged.join(
            F.broadcast(base), [part_col, "__ck"]
        ).withColumn(
            "seq_id",
            F.floor(
                (
                    F.col("__base")
                    + F.coalesce(F.sum("n_tok").over(win), F.lit(0))
                )
                / budget
            ),
        )
    return (
        with_seq.groupBy(part_col, "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
        )
        .select(
            part_col,
            F.col("seq_id").cast("bigint").alias("seq_id"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("seq_tokens").cast("bigint").alias("seq_tokens"),
        )
    )


# --- mixture sampling ------------------------------------------------------


def mix_gate(id_col: Column, rate_permille: Column) -> Column:
    """Deterministic keep-gate: md5-fold of the id modulo 1000 under the
    per-row permille rate (engine-independent, reproducible)."""
    return (md5_hash_col(id_col.cast("string")) % 1000) < rate_permille


def mixture_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    id_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Domain-weighted subsampling ("data mixture"): each domain keeps a
    deterministic hash-gated fraction (permille). Pure filter + one
    grouped count — the sample itself never shuffles.
    """
    mapping = F.create_map(
        *[
            x
            for k, v in rates_permille.items()
            for x in (F.lit(k), F.lit(int(v)))
        ]
    )
    rate = F.coalesce(
        F.element_at(mapping, F.col(part_col)),
        F.lit(int(default_permille)),
    )
    kept = df.filter(mix_gate(F.col(id_col), rate))
    return (
        kept.groupBy(part_col)
        .agg(F.count("*").alias("n_kept"))
        .select(part_col, F.col("n_kept").cast("bigint").alias("n_kept"))
    )
