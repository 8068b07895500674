"""Pairwise TF-IDF cosine similarity + auto-thresholding (FLAME parity).

Reproduces the reference's sparse pipeline (flame.py:741-813) relationally:

- TF-IDF: sklearn ``TfidfTransformer`` defaults (flame.py:795) —
  idf = ln((1+N)/(1+df)) + 1, w = tf*idf, row-L2-normalised.
- cosine: the sparse product X·Xᵀ becomes a self-equi-join of the
  normalised posting table on ``term`` (SURVEY §2 J1); only doc pairs
  sharing >= 1 term produce rows — exactly the nonzero structure of the
  reference's CSR result. Upper triangle (i < j) like the reports
  (flame.py:1169-1170).
- auto threshold: Otsu over the nonzero similarity entries INCLUDING
  the diagonal 1.0 self-similarities and both (i,j)/(j,i) copies
  (flame.py:689-701, :810); skimage's 256-bin histogram algorithm is
  reimplemented exactly (skimage.filters.threshold_otsu, public).

Determinism: norms and pair scores use fixed-order summation
(contributions sorted by term, left fold) so results are bit-identical
across partitionings and match the NumPy oracle.

Stated dtype deviation from the reference: flame.py builds its
doc-feature matrices as float32 (create_sparse_matrix dtype=np.float32),
so reference TF-IDF/cosine/Otsu values are float32; this pipeline (and
its in-repo NumPy oracle) computes float64 throughout. Parity is
bit-exact against the float64 oracle, and agrees with an actual
float32 reference run only to ~1e-7 — same spirit as the documented
'\\n'-join histogram note in normalize.py.

Scale: the term self-join is the one genuinely quadratic-risk stage;
AQE skew-join splitting is enabled in the session and extremely hot
terms can be excluded via ``max_df_fraction`` (a documented engine
extension — the reference keeps all terms).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .bm25 import _det_sum


def tfidf_normalized(
    postings: DataFrame, term_stats_df: DataFrame, n_docs: int
) -> DataFrame:
    """postings(term, doc_id, tf) -> (term, doc_id, wn) L2-normalised."""
    from .floatops import np_log

    n = float(n_docs)
    # idf over the per-term table (distinct terms) via np.log so the
    # libm matches the oracle bit-for-bit; then joined onto postings.
    stats_idf = term_stats_df.select(
        "term",
        np_log((1.0 + F.lit(n)) / (1.0 + F.col("df"))).alias("_lg"),
    ).withColumn("idf", F.col("_lg") + 1.0).drop("_lg")
    w = postings.join(stats_idf, "term").withColumn(
        "w", F.col("tf").cast("double") * F.col("idf")
    )
    norms = (
        w.select(
            "doc_id", F.col("term").alias("t"), (F.col("w") * F.col("w")).alias("val")
        )
        .groupBy("doc_id")
        .agg(
            F.sqrt(
                _det_sum(F.col("t").alias("t"), F.col("val").alias("val"))
            ).alias("norm")
        )
    )
    return (
        w.join(norms, "doc_id")
        .withColumn("wn", F.col("w") / F.col("norm"))
        .select("term", "doc_id", "wn")
    )


def cosine_pairs(
    weights: DataFrame, max_df_fraction: float | None = None, n_docs: int | None = None
) -> DataFrame:
    """-> (doc_i, doc_j, score), i < j, score > 0 pairs only."""
    # cache before the self-join: without it Catalyst recomputes the
    # whole tf-idf pipeline (back to the scan) for BOTH join branches
    w = weights.persist()
    if max_df_fraction is not None and n_docs:
        hot = (
            w.groupBy("term")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df_fraction * n_docs)
            .select("term")
        )
        w = w.join(F.broadcast(hot), "term", "left_anti")
    a = w.alias("a")
    b = w.alias("b")
    prods = (
        a.join(b, "term")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_i"),
            F.col("b.doc_id").alias("doc_j"),
            F.col("term").alias("t"),
            (F.col("a.wn") * F.col("b.wn")).alias("val"),
        )
    )
    return prods.groupBy("doc_i", "doc_j").agg(
        _det_sum(F.col("t").alias("t"), F.col("val").alias("val")).alias("score")
    )


def auto_hot_df_threshold(term_stats_df: DataFrame, n_partitions: int) -> int:
    """df cutoff above which a term should be salted, from the already-
    computed term stats: a term with document frequency d contributes
    d(d-1)/2 pair rows all landing on ONE reducer in the plain
    self-join. Mark a term hot when its pair work exceeds 4x the mean
    per-partition pair work — i.e. d_hot = sqrt(8·W/P) with
    W = Σ df(df-1)/2 and P the shuffle partitions. One tiny aggregate;
    floor of 64 so small corpora never salt."""
    row = term_stats_df.agg(
        F.sum(
            F.col("df").cast("double") * (F.col("df").cast("double") - 1.0) / 2.0
        ).alias("w")
    ).collect()[0]
    total_pair_work = float(row["w"] or 0.0)
    if total_pair_work <= 0:
        return 64
    return max(64, int(np.sqrt(8.0 * total_pair_work / max(1, n_partitions))))


def salted_self_join(
    rows: DataFrame,
    hot_keys: DataFrame,
    key_col: str,
    n_splits: int = 8,
) -> DataFrame:
    """Skew-split self-join on ``key_col``: returns one row per
    (key, unordered doc pair), with every non-key payload column of
    ``rows`` duplicated as ``<col>_a`` / ``<col>_b``. Rows of a hot key
    (``hot_keys``: single-column DataFrame of keys to split) are hashed
    into ``n_splits`` doc groups; group-pair replication guarantees the
    EXACT pair set of the plain self-join while a hot key's quadratic
    pair work spreads over G(G+1)/2 reducers. Non-hot keys keep their
    single (g, g) key — never replicated through the shuffle."""
    payload = [c for c in rows.columns if c != key_col and c != "doc_id"]
    hot = hot_keys.select(F.col(key_col), F.lit(True).alias("_hot"))
    w = (
        rows.join(F.broadcast(hot), key_col, "left")
        .withColumn("_hot", F.col("_hot").isNotNull())
        .withColumn(
            "_g",
            F.when(
                F.col("_hot"), F.pmod(F.xxhash64("doc_id"), F.lit(n_splits))
            ).otherwise(F.lit(0)).cast("int"),
        )
        .persist()
    )
    splits = F.lit(n_splits)
    a = w.withColumn(
        "_gb",
        F.explode(
            F.sequence(
                F.col("_g"), F.when(F.col("_hot"), splits - 1).otherwise(F.col("_g"))
            )
        ),
    ).select(
        key_col, F.col("_g").alias("_ga"), "_gb",
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload],
    )
    b = w.withColumn(
        "_ga",
        F.explode(
            F.sequence(
                F.when(F.col("_hot"), F.lit(0)).otherwise(F.col("_g")), F.col("_g")
            )
        ),
    ).select(
        key_col, "_ga", F.col("_g").alias("_gb"),
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    # cross-group pairs meet in exactly ONE role order (the lower-group
    # member arrives on the a-side), so both doc orders must pass;
    # same-group pairs meet in BOTH role orders, so doc_a < doc_b
    # dedups them. Canonicalize to (least, greatest) afterwards,
    # swapping payloads to follow their doc.
    joined = (
        a.join(b, [key_col, "_ga", "_gb"])
        .where(
            (F.col("_ga") != F.col("_gb")) | (F.col("doc_a") < F.col("doc_b"))
        )
        .where(F.col("doc_a") != F.col("doc_b"))
    )
    swap = F.col("doc_a") > F.col("doc_b")
    out_cols = [
        F.least("doc_a", "doc_b").alias("doc_i"),
        F.greatest("doc_a", "doc_b").alias("doc_j"),
        F.col(key_col),
    ]
    for c in payload:
        out_cols.append(
            F.when(swap, F.col(f"{c}_b")).otherwise(F.col(f"{c}_a")).alias(f"{c}_i")
        )
        out_cols.append(
            F.when(swap, F.col(f"{c}_a")).otherwise(F.col(f"{c}_b")).alias(f"{c}_j")
        )
    return joined.select(*out_cols)


def cosine_pairs_salted(
    weights: DataFrame,
    term_stats_df: DataFrame,
    hot_df_threshold: int | None = None,
    n_splits: int = 8,
) -> DataFrame:
    """Skew-aware variant of ``cosine_pairs`` (north rule: hot formulaic
    n-grams are Zipf-extreme; AQE only splits moderate join skew).
    This is the DEFAULT pairwise path (pipeline.pairwise_similarity,
    registry j1_tfidf_cosine_pairs); ``hot_df_threshold=None`` derives
    the cutoff from term stats via ``auto_hot_df_threshold``.

    Terms with df > ``hot_df_threshold`` get their posting rows split
    into ``n_splits`` doc-hash groups; the all-pairs work of a hot term
    then runs as G*(G+1)/2 independent reducer partitions instead of
    one. The a-side row in group ga replicates to keys (ga, gb>=ga),
    the b-side row in group gb to keys (ga<=gb, gb); the (ga, gb)
    equi-join + doc_i < doc_j filter yields EXACTLY the same pair set
    as the plain self-join (verified bit-identical in tests).
    Non-hot terms keep their single (g, g) key — the explode bounds
    collapse to one element, so they are never replicated through the
    shuffle; only hot-term rows pay the split cost.
    """
    spark = weights.sparkSession
    if hot_df_threshold is None:
        hot_df_threshold = auto_hot_df_threshold(
            term_stats_df, int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    hot = term_stats_df.filter(F.col("df") > hot_df_threshold).select("term")
    pairs = salted_self_join(
        weights.select("term", "doc_id", "wn"), hot, "term", n_splits
    )
    prods = pairs.select(
        "doc_i",
        "doc_j",
        F.col("term").alias("t"),
        (F.col("wn_i") * F.col("wn_j")).alias("val"),
    )
    return prods.groupBy("doc_i", "doc_j").agg(
        _det_sum(F.col("t").alias("t"), F.col("val").alias("val")).alias("score")
    )


# ---------------------------------------------------------------------------
# inter-corpus mode (flame.py:793-801): IDF fit on the UNION of both
# corpora, transform each, cosine = matrix1 x matrix2^T
# ---------------------------------------------------------------------------


def tfidf_normalized_inter(
    postings1: DataFrame,
    postings2: DataFrame,
    n_docs_union: int,
) -> tuple[DataFrame, DataFrame]:
    """Inter-corpus TF-IDF: df/N come from the vstacked union
    (flame.py:794-798), then each corpus is weighted + L2-normalised
    with those shared idfs."""
    from .bm25 import _det_sum as _ds
    from .floatops import np_log

    union = postings1.select("term", "doc_id", "tf").unionByName(
        postings2.select("term", "doc_id", "tf")
    )
    df_union = union.groupBy("term").agg(F.count("*").alias("df"))
    n = float(n_docs_union)
    stats_idf = df_union.select(
        "term",
        (np_log((1.0 + F.lit(n)) / (1.0 + F.col("df"))) + 1.0).alias("idf"),
    )

    def weight(p):
        w = p.join(stats_idf, "term").withColumn(
            "w", F.col("tf").cast("double") * F.col("idf")
        )
        norms = (
            w.select("doc_id", F.col("term").alias("t"), (F.col("w") * F.col("w")).alias("val"))
            .groupBy("doc_id")
            .agg(F.sqrt(_ds(F.col("t").alias("t"), F.col("val").alias("val"))).alias("norm"))
        )
        return (
            w.join(norms, "doc_id")
            .withColumn("wn", F.col("w") / F.col("norm"))
            .select("term", "doc_id", "wn")
        )

    return weight(postings1), weight(postings2)


def cosine_pairs_inter(weights1: DataFrame, weights2: DataFrame) -> DataFrame:
    """(doc_i from corpus1, doc_j from corpus2, score) — ALL nonzero
    cells of matrix1 x matrix2^T (no triangle filter: the inter-corpus
    matrix is rectangular, flame.py:801)."""
    a = weights1.persist().alias("a")
    b = weights2.persist().alias("b")
    prods = a.join(b, "term").select(
        F.col("a.doc_id").alias("doc_i"),
        F.col("b.doc_id").alias("doc_j"),
        F.col("term").alias("t"),
        (F.col("a.wn") * F.col("b.wn")).alias("val"),
    )
    return prods.groupBy("doc_i", "doc_j").agg(
        _det_sum(F.col("t").alias("t"), F.col("val").alias("val")).alias("score")
    )


# ---------------------------------------------------------------------------
# auto threshold (flame.py:689-708)
# ---------------------------------------------------------------------------


def otsu_from_histogram(counts: np.ndarray, centers: np.ndarray) -> float:
    """Otsu's method on a precomputed histogram — the exact formula
    skimage.filters.threshold_otsu applies to its internal histogram."""
    counts = counts.astype(np.float64)
    weight1 = np.cumsum(counts)
    weight2 = np.cumsum(counts[::-1])[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mean1 = np.cumsum(counts * centers) / weight1
        mean2 = (
            np.cumsum((counts * centers)[::-1]) / np.cumsum(counts[::-1])
        )[::-1]
    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    idx = int(np.argmax(variance12))
    return float(centers[idx])


def otsu_threshold_local(scores: np.ndarray, nbins: int = 256) -> float:
    if scores.size == 0:
        return 0.01  # flame.py:690-692 fallback
    lo, hi = float(scores.min()), float(scores.max())
    if lo == hi:
        return lo
    counts, edges = np.histogram(scores, bins=nbins, range=(lo, hi))
    centers = (edges[:-1] + edges[1:]) / 2.0
    return otsu_from_histogram(counts, centers)


def similarity_score_multiset(
    pairs: DataFrame, n_docs_with_features: int
) -> DataFrame:
    """The nonzero-entry multiset of the reference's intra-corpus
    dist_mat: every i<j pair twice + one 1.0 diagonal per doc with a
    nonzero feature vector (flame.py:810)."""
    spark = pairs.sparkSession
    doubled = pairs.select(F.col("score")).union(pairs.select(F.col("score")))
    ones = spark.range(n_docs_with_features).select(
        F.lit(1.0).alias("score")
    )
    return doubled.union(ones)


def otsu_threshold_distributed(scores_df: DataFrame, nbins: int = 256) -> float:
    """Two-pass distributed Otsu: global min/max, then per-batch
    np.histogram against the SAME driver-computed edges (searchsorted
    binning — bit-identical to the local/oracle path), summed."""
    row = scores_df.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if row["n"] == 0:
        return 0.01
    lo, hi = float(row["lo"]), float(row["hi"])
    if lo == hi:
        return lo
    edges = np.histogram_bin_edges(
        np.array([lo, hi]), bins=nbins, range=(lo, hi)
    )

    import pandas as pd

    def batches(it):
        for pdf in it:
            c, _ = np.histogram(pdf["score"].to_numpy(np.float64), bins=edges)
            yield pd.DataFrame({"bin": np.arange(nbins), "cnt": c})

    hist_rows = (
        scores_df.mapInPandas(batches, schema="bin int, cnt long")
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    counts = np.zeros(nbins, dtype=np.int64)
    for r in hist_rows:
        counts[int(r["bin"])] = int(r["cnt"])
    centers = (edges[:-1] + edges[1:]) / 2.0
    return otsu_from_histogram(counts, centers)


def percentile_threshold(scores_df: DataFrame, percentile: float = 99.0) -> float:
    """Exact percentile fallback (flame.py:702-706; np.percentile's
    linear interpolation matches Spark's ``percentile``)."""
    row = scores_df.agg(
        F.expr(f"percentile(score, {percentile / 100.0})").alias("p")
    ).collect()[0]
    return float(row["p"]) if row["p"] is not None else 0.01
