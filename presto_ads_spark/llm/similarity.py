"""Similarity search over embedding columns (array<float>).

Determinism contract (so DuckDB oracles hash-match): float→double casts are
exact; dot products are *left folds* in index order (Spark ``aggregate`` HOF
≡ DuckDB ``list_reduce``) — identical IEEE operation sequences on both
engines, so cosines are bit-identical and safe to compare/rank on.

Scale design:
- brute-force top-k: O(Q×N) — fine when one side broadcasts (queries small).
- sign-LSH bucketed: hyperplane LSH using axis-aligned planes (sign bits of
  the first B dims) — candidates shuffle by an 8-bit bucket key, so the
  quadratic term only applies within buckets. Swap the planes for learned
  ones (IVF centroids) without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pairs(emb: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", threshold: float = 0.8,
                 max_rows: int = 100_000) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact; for modest N or verification).

    SIZE-GATED: this is an O(N²) cross join by construction — a
    verification op, never a production path (use ``embedding_near_dups``
    / ``lsh_topk`` for the bucketed scale shapes). Inputs larger than
    ``max_rows`` are refused instead of silently launching an N² plan;
    pass ``max_rows=None`` to override explicitly."""
    if max_rows is not None:
        # limit(max_rows+1) bounds the probe: the guard never scans more
        # than max_rows+1 rows even when the input is huge.
        if emb.limit(max_rows + 1).count() > max_rows:
            raise ValueError(
                f"cosine_pairs is exact-all-pairs (O(N²)) and input has "
                f"more than max_rows={max_rows} rows; use embedding_near_dups "
                f"(LSH-bucketed) at scale, or pass max_rows=None to force."
            )
    e = emb.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors for each query vector (broadcast the queries).

    Ties broken by neighbor id → fully deterministic ranking.

    The norms are hoisted into per-SIDE columns below the join: the naive
    ``cosine(q, v)`` per pair runs THREE O(d) folds (dot + both norms) in
    the pair projection — 3x the arithmetic of the one fold that actually
    depends on the pair. ``dot/(nq*nv)`` is the same IEEE operation
    sequence on the same values (each norm fold unchanged, just computed
    once per row instead of once per pair), so cos_sim stays bit-identical
    to the oracle. Projects don't collapse across a join, so the hoist
    survives optimization."""
    e = emb.select(F.col(id_col).alias("nbr_id"), as_double(F.col(vec_col)).alias("v"))
    e = e.select("nbr_id", "v", norm(F.col("v")).alias("__nv"))
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q")
    )
    qs = qs.select("query_id", "q", norm(F.col("q")).alias("__nq"))
    scored = (
        e.join(F.broadcast(qs), F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (dot(F.col("q"), F.col("v")) / (F.col("__nq") * F.col("__nv"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("nbr_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def sign_lsh_bucket(vec: Column, bits: int = 8) -> Column:
    """Hyperplane-LSH bucket id: sign bits of the first ``bits`` dims."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0),
        lambda acc, i: acc * 2
        + F.when(F.element_at(vec, i + 1) >= 0, 1).otherwise(0),
    )


def normalized(arr: Column) -> Column:
    """v / ||v|| — so pairwise cosine is a single dot fold (norms computed
    once per vector, not once per pair).

    Shaped as ONE aggregate with a finish lambda: the sum-of-squares fold
    runs once per vector and the finish transform divides each element by
    sqrt(acc). The naive ``transform(arr, x -> x / norm(arr))`` embeds the
    whole norm fold inside the per-element lambda — O(d²) arithmetic per
    vector (measured r13: the normalize projection dominates every LSH/IVF
    bucketing stage). Same operands, same IEEE op sequence per element
    (x / sqrt(Σv²)), so outputs are bit-identical to the naive form."""
    return F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, v: acc + v * v,
        lambda acc: F.transform(arr, lambda x: x / F.sqrt(acc)),
    )


def lsh_topk(emb: DataFrame, k: int = 5, bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: candidates share an LSH bucket; exact cosine inside buckets via
    pre-normalized vectors (dot-only per pair).

    The self-join shuffles on the bucket key — at 100 TB the pairwise work is
    confined to buckets (~N²/2^bits instead of N²)."""
    # persist: CollapseProject would otherwise inline the normalization
    # into the per-pair dot lambda (O(d²) per pair instead of per vector).
    e = (
        emb.select(
            F.col(id_col).alias("id"),
            normalized(as_double(F.col(vec_col))).alias("v"),
        )
        .withColumn("bucket", sign_lsh_bucket(F.col("v"), bits))
        .persist()
    )
    a = e.select(F.col("id").alias("query_id"), F.col("v").alias("q"), "bucket")
    b = e.select(F.col("id").alias("nbr_id"), F.col("v").alias("v"), "bucket")
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", dot(F.col("q"), F.col("v")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("nbr_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def _centroid_frame(e: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic coarse-quantizer centroids as a ONE-ROW broadcast
    DataFrame carrying a ``cents: array<struct<cid,cv>>`` column — the
    normalized vectors of the ``n_cells`` smallest ids (landmark selection;
    swap in MLlib KMeans centroids for learned cells, the IVF plan shape is
    unchanged). Unlike a plan literal, C×d doubles never bloat the plan
    text: they ship once via broadcast, so real cell counts (C in the
    thousands) stay cheap."""
    w = Window.orderBy("id")
    return (
        e.orderBy("id")
        .limit(n_cells)
        .select((F.row_number().over(w) - 1).alias("cid"), "v")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cid"), F.col("v").alias("cv")))
            ).alias("cents")
        )
    )


def _nearest_cells(v: Column, cents: Column, nprobe: int) -> Column:
    """ids of the ``nprobe`` centroids nearest to v (desc dot, ties by cid
    — array_sort on (neg_dot, cid) structs keeps it total-ordered)."""
    scored = F.transform(
        cents,
        lambda c: F.struct((-dot(v, c["cv"])).alias("nd"), c["cid"].alias("cid")),
    )
    return F.slice(
        F.transform(F.array_sort(scored), lambda s: s["cid"]), 1, nprobe
    )


def ivf_topk(emb: DataFrame, k: int = 5, n_cells: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate nearest neighbors (the classic inverted-file index,
    Spark-shaped):

    1. coarse quantizer: n_cells centroids (deterministic landmarks here;
       learned KMeans centroids drop in without plan changes),
    2. index: every vector assigned to its nearest cell — one JVM fold per
       row, embarrassingly parallel with the scan,
    3. probe: each query expands to its ``nprobe`` nearest cells; the
       cell-key equi-join confines exact scoring to probed cells, so the
       shuffle carries (query × nprobe) + N rows keyed by cell instead of
       the N×Q cross product. At 100 TB the index side partitions by cell
       — the same layout IVF files use on disk.

    nprobe = n_cells degenerates to exact search (recall 1.0) — asserted by
    the sim_ivf_topk registry query's oracle check.
    """
    e = emb.select(
        F.col(id_col).alias("id"), normalized(as_double(F.col(vec_col))).alias("v")
    ).persist()  # see lsh_topk: stop projection inlining into per-pair dots
    # broadcast-join the one-row centroid frame: every row sees the
    # `cents` array column and runs the same JVM-side nearest-cell fold as
    # before — no extra shuffle, no plan-literal bloat.
    withc = e.crossJoin(F.broadcast(_centroid_frame(e, n_cells)))
    cents = F.col("cents")
    index = withc.select(
        F.col("id").alias("nbr_id"),
        F.col("v"),
        F.element_at(_nearest_cells(F.col("v"), cents, 1), 1).alias("cell"),
    )
    probes = withc.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("q"),
        F.explode(_nearest_cells(F.col("v"), cents, nprobe)).alias("cell"),
    )
    scored = (
        probes.join(index, "cell")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", dot(F.col("q"), F.col("v")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("nbr_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def connected_components(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Min-label propagation over an undirected edge list: (id, comp)
    where comp is the smallest id reachable from id.

    Classic iterative CC (the bounded iterate-to-fixpoint option for
    embedding dedup): each round joins the symmetrized edges to the
    current labels, takes the neighborhood min, and stops early when a
    round changes nothing. Rounds needed = graph diameter; near-dup
    clusters are shallow (dup clusters are near-cliques), so the
    ``max_iter`` bound is a safety net, not the expected exit. Scale
    notes: one shuffle per round keyed by id; ``localCheckpoint`` cuts
    the growing lineage so round N's plan doesn't replay rounds 1..N-1;
    the convergence probe is a metadata-light count, not a collect.
    """
    edges = pairs.select("id_a", "id_b")
    edges = (
        edges.union(
            edges.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("id_a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.id_b == labels.id)
            .groupBy("id_a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.id_a, "left")
            .select(
                labels.id,
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", threshold: float = 0.2,
                        bits: int = 4, connected: bool = False,
                        max_iter: int = 10) -> DataFrame:
    """Embedding-cosine near-duplicate detection: LSH-bucketed candidate
    pairs above ``threshold``, each item assigned a canonical id.

    Default (``connected=False``): canonical id = min id among direct
    neighbors (single-pass star assignment — one shuffle, but a chain
    A-B-C keeps two canonicals). ``connected=True`` runs bounded
    min-label propagation (connected_components) so every chain
    collapses to one canonical id per component.

    Output: (id, canonical_id, best_cos) for every item in a near-dup pair.
    """
    e = (
        emb.select(
            F.col(id_col).alias("id"),
            normalized(as_double(F.col(vec_col))).alias("v"),
        )
        .withColumn("bucket", sign_lsh_bucket(F.col("v"), bits))
        .persist()  # see lsh_topk: stop projection inlining into the join
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    star = pairs.groupBy(F.col("id_a").alias("id")).agg(
        F.least(F.min("id_b"), F.min("id_a")).alias("canonical_id"),
        F.max("cos_sim").alias("best_cos"),
    )
    if not connected:
        return star
    comps = connected_components(pairs, max_iter=max_iter)
    return (
        star.drop("canonical_id")
        .join(comps, "id")
        .select("id", F.col("comp").alias("canonical_id"), "best_cos")
    )
