"""Training-data pipeline text operators (deduplication + text analysis).

These are the large-scale-corpus operations a 100 TB training-data
pipeline needs on top of the FLAME index core: exact dedup, MinHash/LSH
and SimHash near-dup, n-gram Jaccard, language-ID heuristic, quality
scoring, token counting, document fingerprinting.

Every operator here is expressed with JVM-side built-ins
(``pyspark.sql.functions``) wherever possible so Catalyst can push
down/prune/codegen; the only pandas UDF is the exact-arithmetic
fingerprint. Each operator is deliberately DuckDB-SQL-expressible so
the driver's oracle gate can verify it (see ``__spark_entry__.py``).

Determinism contracts (shared with the SQL oracles):
- base shingle hash = first 8 hex chars of md5 -> uint32-range int
- MinHash permutation i: h_i(x) = (A_i * x + B_i) mod P with
  P = 4294967311 (prime > 2^32), A_i = 1000003 + 7919*i,
  B_i = 12345 + 104729*i  — products < 2^53: exact in int64 AND float64
- SimHash uses the first 15 md5 hex chars (60 bits) per token
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

MINHASH_P = 4294967311  # prime > 2^32
MINHASH_A0, MINHASH_A_STEP = 1000003, 7919
MINHASH_B0, MINHASH_B_STEP = 12345, 104729
SIMHASH_BITS = 60

ENGLISH_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "with", "as", "was", "on", "be", "by", "this", "are", "or", "at",
]
LATIN_STOPWORDS = [
    "et", "in", "de", "ad", "cum", "per", "quod", "est", "non", "ut",
    "sit", "qui", "quam", "omnibus", "rei", "sancte", "amen", "domini",
]


def norm_text_col(col):
    r"""lowercase + whitespace-collapsed text (flame.py:396 + :433).

    Every whitespace decision is EXPLICIT because the engines disagree
    on defaults: Java \s includes \x0B where RE2 (DuckDB) does not,
    and DuckDB's default trim() strips unicode Zs spaces (\xa0,
    　) where Spark's strips only ' ' (both found by the gate-
    surface fuzz). The contract is therefore: collapse runs of the
    6-char class to one space FIRST (edge runs become a single ' '),
    then trim exactly ' ' — identical semantics in both engines, with
    unicode spaces outside the class preserved verbatim on both."""
    return F.lower(
        F.trim(F.regexp_replace(col, "[ \t\n\x0b\f\r]+", " "))
    )


def word_tokens_col(col):
    """lower-alnum word tokens; JVM-side split, matches the SQL oracle."""
    return F.filter(F.split(norm_text_col(col), "[^a-z0-9]+"), lambda x: x != "")


def word_ngrams_col(tokens_col, n: int):
    """Space-joined word n-grams from a token array (JVM-side transform)."""
    idx = F.sequence(F.lit(0), F.size(tokens_col) - F.lit(n))
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.slice(tokens_col, i + 1, n)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on md5 of normalized text -> duplicate groups.
    (hash-groupBy; one shuffle, map-side partial agg)."""
    return (
        docs.select(
            F.md5(norm_text_col(F.col(text_col))).alias("text_hash"),
            "doc_id",
        )
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs by Jaccard over DISTINCT word n-gram sets.

    |A∩B| via a self-join on the shingle, |A|,|B| precomputed; Jaccard
    = inter / (|A|+|B|-inter). Shuffles on shingle then on the pair."""
    sh = docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(word_ngrams_col(word_tokens_col(F.col(text_col)), n))
        ).alias("shingle"),
    ).filter(F.col("shingle").isNotNull())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_i"), F.col("sz").alias("sz_i"))
    sb = sizes.select(F.col("doc_id").alias("doc_j"), F.col("sz").alias("sz_j"))
    return (
        inter.join(sa, "doc_i")
        .join(sb, "doc_j")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_i") + F.col("sz_j") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_i", "doc_j", "inter", "jaccard")
    )


def ngram_jaccard_pairs_salted(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    hot_df_threshold: int | None = None,
    n_splits: int = 8,
) -> DataFrame:
    """Skew-safe ``ngram_jaccard_pairs`` — the DEFAULT (registry
    ``dedup_jaccard3_pairs``): a Zipf-hot shingle's quadratic
    intersection work is split across reducers via the shared
    ``similarity.salted_self_join`` (exact same pair set and counts as
    the plain self-join, tested); the cutoff derives from the shingle
    document frequencies like the cosine path's."""
    from .similarity import auto_hot_df_threshold, salted_self_join

    spark = docs.sparkSession
    sh = docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(word_ngrams_col(word_tokens_col(F.col(text_col)), n))
        ).alias("shingle"),
    ).filter(F.col("shingle").isNotNull()).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    df_stats = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    if hot_df_threshold is None:
        hot_df_threshold = auto_hot_df_threshold(
            df_stats, int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    hot = df_stats.filter(F.col("df") > hot_df_threshold).select("shingle")
    inter = (
        salted_self_join(sh.select("shingle", "doc_id"), hot, "shingle", n_splits)
        .groupBy("doc_i", "doc_j")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_i"), F.col("sz").alias("sz_i"))
    sb = sizes.select(F.col("doc_id").alias("doc_j"), F.col("sz").alias("sz_j"))
    return (
        inter.join(sa, "doc_i")
        .join(sb, "doc_j")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_i") + F.col("sz_j") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_i", "doc_j", "inter", "jaccard")
    )


def shingle_base_hash_col(shingle_col):
    """First 8 md5 hex chars -> int in [0, 2^32); same in DuckDB."""
    return F.conv(F.substring(F.md5(shingle_col), 1, 8), 16, 10).cast("long")


def _minhash_wide(
    docs: DataFrame, n: int, num_hashes: int, text_col: str
) -> DataFrame:
    """(doc_id, _h0..) — one MIN aggregate per permutation over the
    shingle rows: one codegen'd groupBy(doc_id) pass, NO row
    multiplication. (The previous shape exploded a hash-index range
    against every shingle row — rows x num_hashes through a two-column
    hash aggregate, the dominant cost of the LSH gate at bench scale;
    the wide form feeds the aggregate exactly the shingle rows and
    shuffles one row per doc.)"""
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams_col(word_tokens_col(F.col(text_col)), n))
        ).alias("shingle"),
    ).withColumn("x", shingle_base_hash_col(F.col("shingle")))
    mins = [
        F.min(
            (
                F.lit(MINHASH_A0 + MINHASH_A_STEP * i) * F.col("x")
                + F.lit(MINHASH_B0 + MINHASH_B_STEP * i)
            )
            % F.lit(MINHASH_P)
        ).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 32, text_col: str = "text"
) -> DataFrame:
    """(doc_id, i, minhash) — MinHash over word n-gram shingles.

    The permutations are affine (A_i x + B_i) mod P with exact int64
    arithmetic (products < 2^53). Computed via the wide per-doc
    aggregate (``_minhash_wide``); the (i, minhash) long form is a
    trivial ``inline`` over the finished per-doc row (num_hashes *
    n_docs rows, nothing upstream multiplied). Values identical to the
    explode-the-index-range formulation: min over the same affine-hash
    multiset, per i."""
    wide = _minhash_wide(docs, n, num_hashes, text_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.col(f"_h{i}").alias("minhash")
            )
            for i in range(num_hashes)
        ]
    )
    return wide.select("doc_id", F.inline(pairs))


def _band_slices(num_hashes: int, band_rows: int) -> list[tuple[int, list[int]]]:
    """[(band, [hash indices in i order]), ...] — band = i // band_rows."""
    return [
        (b, list(range(b * band_rows, min((b + 1) * band_rows, num_hashes))))
        for b in range(-(-num_hashes // band_rows))
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    band_rows: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """LSH banding candidate pairs straight from the wide signature
    aggregate: band keys are a pure projection over the per-doc row
    (concat_ws of the band's minhash columns in i order — exactly the
    string ``minhash_lsh_candidates`` assembles from the long form via
    collect_list/array_sort), so the whole pipeline is one shingle
    explode + one groupBy(doc_id) + one equi-join on (band, band_key).
    Same pair set as minhash_lsh_candidates(minhash_signatures(...))."""
    wide = _minhash_wide(docs, n, num_hashes, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "-", *[F.col(f"_h{i}").cast("string") for i in idxs]
                ).alias("band_key"),
            )
            for b, idxs in _band_slices(num_hashes, band_rows)
        ]
    )
    banded = wide.select("doc_id", F.inline(bands))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j")
        )
        .distinct()
    )


def minhash_lsh_candidates(
    signatures: DataFrame, band_rows: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    band key = '-'-joined minhashes of the band's rows in i order."""
    banded = (
        signatures.withColumn("band", (F.col("i") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "minhash"))),
                    lambda s: s.getField("minhash").cast("string"),
                ),
            ).alias("band_key")
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j")
        )
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit-family SimHash (60 bits): per-bit weighted majority over
    token md5 hashes, weight = token tf. JVM-side only.

    Kept as the bit-index explode + two-stage hash aggregate ON
    PURPOSE: the measured alternative — 60 parallel conditional SUM
    aggregates in one groupBy(doc_id) — is ~25% SLOWER here (60
    aggregate buffers blow the whole-stage-codegen budget and the
    aggregate falls back to interpreted evaluation), while the explode
    rows are narrow and partial aggregation collapses them before the
    exchange (measured r6: 1.6 s vs 2.0 s at sf0.1/32 cores; the
    16-buffer MinHash wide aggregate stays comfortably inside codegen
    and IS the faster shape there)."""
    toks = (
        docs.select("doc_id", F.explode(word_tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn(
            "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        )
    )
    bits = toks.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
    ).withColumn(
        "contrib",
        F.when(F.expr("(h >> j) & 1") == 1, F.col("tf")).otherwise(-F.col("tf")),
    )
    return (
        bits.groupBy("doc_id", "j")
        .agg(F.sum("contrib").alias("s"))
        .withColumn("bit", F.when(F.col("s") >= 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("bit").cast("long") * F.pow(F.lit(2.0), F.col("j")).cast("long")
            ).alias("simhash")
        )
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic (en vs la); deterministic
    tie-break by language name."""
    toks = docs.select(
        "doc_id", F.explode(word_tokens_col(F.col(text_col))).alias("tok")
    )
    scored = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum(F.when(F.col("tok").isin(ENGLISH_STOPWORDS), 1).otherwise(0))
         / F.count("*")).alias("en_ratio"),
        (F.sum(F.when(F.col("tok").isin(LATIN_STOPWORDS), 1).otherwise(0))
         / F.count("*")).alias("la_ratio"),
    )
    return scored.withColumn(
        "pred_lang",
        F.when(
            (F.col("en_ratio") < 0.05) & (F.col("la_ratio") < 0.05), F.lit("unknown")
        )
        .when(F.col("en_ratio") >= F.col("la_ratio"), F.lit("en"))
        .otherwise(F.lit("la")),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality metrics + composite."""
    norm = norm_text_col(F.col(text_col))
    toks = word_tokens_col(F.col(text_col))
    n_chars = F.length(norm)
    n_tokens = F.size(toks)
    stop_ratio = F.when(
        n_tokens > 0,
        F.size(F.filter(toks, lambda x: x.isin(ENGLISH_STOPWORDS))) / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace(norm, r"[^a-z0-9 ]", ""))) / n_chars.cast("double"),
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))) * 0.3
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_norm"),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count
    (word runs + punctuation runs, the HF Whitespace pattern)."""
    norm = norm_text_col(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split(norm, " "), lambda x: x != "")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(norm, F.lit(r"[a-z0-9_]+|[^a-z0-9_\s]+"), 0)
        ).alias("bpeish_tokens"),
    )


@F.pandas_udf(T.LongType())
def _fingerprint_udf(s: pd.Series) -> pd.Series:
    """Exact polynomial rolling-hash fingerprint (mod 2^61-1, base
    1000003) of an ALREADY-normalized string column. Module-level so
    the pd.Series type hints resolve under future-annotations.

    Vectorized over the WHOLE Arrow batch: all documents' codepoints
    are concatenated into one buffer (utf-32le of the joined string ==
    the concatenation of per-doc encodings — no BOM), the power table
    is built once to the longest doc, per-position products run in one
    mulmod61 pass, and the per-document sums mod M come from two
    np.add.reduceat passes over the 32-bit halves of each product
    (hi < 2^29 and lo < 2^32, so neither half's segment sum can
    overflow uint64 for any realistic document) recombined mod M —
    zero per-row Python, unlike the previous s.map(per_doc) loop
    (5.6-18.5x on 64k docs x 200 chars, measured warm — the spread is
    host memory-bandwidth weather; the kernel is allocation-heavy, so
    stolen-bandwidth windows compress the gap)."""
    from .constants import MOD
    from .hashing import _U64, _reduce61, mulmod61, powers_mod61

    texts = s.fillna("").tolist()
    n_docs = len(texts)
    if not n_docs:
        return pd.Series([], dtype="int64")
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    total = int(lens.sum())
    if total == 0:
        return pd.Series(np.zeros(n_docs, dtype=np.int64))
    codes = np.frombuffer(
        "".join(texts).encode("utf-32le"), dtype=np.uint32
    ).astype(_U64)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    starts = bounds[:-1]
    # position of each codepoint within its own document
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    powers = powers_mod61(1_000_003, int(lens.max()))
    terms = mulmod61(powers[pos], codes)  # each < M < 2^61
    # exact segment sums: reduceat needs a sentinel element so a start
    # index == total (trailing empty docs) stays a valid index, and
    # zero-length segments (reduceat returns a[start] for them, not 0)
    # are masked to the empty-document hash 0 afterwards
    zero = np.zeros(1, dtype=_U64)
    hi = np.concatenate([terms >> _U64(32), zero])
    lo = np.concatenate([terms & _U64(0xFFFFFFFF), zero])
    sums_hi = _reduce61(np.add.reduceat(hi, starts))
    sums_lo = _reduce61(np.add.reduceat(lo, starts))
    out = _reduce61(mulmod61(sums_hi, _U64((1 << 32) % MOD)) + sums_lo)
    out[lens == 0] = 0
    return pd.Series(out.astype(np.int64))


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint over JVM-normalized text — normalization
    stays in Catalyst (matches the SQL oracle's RE2 semantics); only
    the exact mod-2^61-1 arithmetic runs in the Arrow UDF."""
    return docs.select(
        "doc_id",
        _fingerprint_udf(norm_text_col(F.col(text_col))).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# training-set curation: decontamination, repetition filters, PII
# redaction, deterministic stratified sampling
# ---------------------------------------------------------------------------


def _distinct_doc_shingles(docs, n, text_col, keep_empty):
    """(doc_id, shingle) over DISTINCT word n-grams; with keep_empty a
    doc shorter than n tokens yields one NULL-shingle row (so it stays
    countable downstream), else it vanishes."""
    arr = F.array_distinct(word_ngrams_col(word_tokens_col(F.col(text_col)), n))
    ex = F.explode_outer(arr) if keep_empty else F.explode(arr)
    return docs.select("doc_id", ex.alias("shingle"))


def decontamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.05,
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    fraction of its DISTINCT word n-gram shingles that appear anywhere
    in the evaluation (benchmark) corpus; ``contaminated`` flags docs
    at or above ``threshold``.

    Scale shape: benchmark suites are MBs while the training corpus is
    the 100 TB side, so the eval shingle set is aggregated distinct and
    BROADCAST (default) — the training side then does one map-side
    probe + one shuffle to its own doc_id aggregation; no all-pairs
    join anywhere. Set ``broadcast_eval=False`` for a pathological
    giant eval set to fall back to a shuffle equi-join on the shingle.
    """
    ev = (
        _distinct_doc_shingles(eval_docs, n, text_col, keep_empty=False)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _distinct_doc_shingles(train, n, text_col, keep_empty=True)
    agg = (
        tr.join(ev, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_overlap"),
        )
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.col("n_overlap") / F.col("n_shingles").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round(frac, 6).alias("overlap_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    top2_threshold: float = 0.06,
    dup3_threshold: float = 0.05,
) -> DataFrame:
    """Gopher-style within-document repetition signals:

    - ``top2gram_frac``: occurrence share of the single most frequent
      word 2-gram (high = the doc loops one phrase),
    - ``dup3gram_frac``: share of 3-gram occurrences whose 3-gram
      appears more than once in the doc,
    - ``uniq_token_ratio``: distinct / total tokens,
    - ``repetitive``: top2 OR dup3 over its threshold.

    Scale shape: ONE tagged explode of the 2- and 3-grams together ->
    one (doc_id, n, gram) count -> one per-doc conditional aggregate —
    two shuffles keyed by doc_id with map-side partial aggregation,
    linear in corpus tokens (the per-size-explode formulation paid the
    tokenize + explode + both exchanges once PER SIZE). The all-JVM
    array alternative (count each distinct gram via a filter over the
    gram array) is shuffle-free but O(distinct x total) per doc, which
    dies on book-length docs; the explode path survives them."""
    toks = docs.select("doc_id", word_tokens_col(F.col(text_col)).alias("tk"))
    base = toks.select(
        "doc_id",
        F.size("tk").alias("n_tokens"),
        F.size(F.array_distinct("tk")).alias("n_distinct"),
        "tk",
    )

    def tagged(n):
        return F.transform(
            word_ngrams_col(F.col("tk"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    counts = (
        base.select(
            "doc_id",
            F.explode(F.concat(tagged(2), tagged(3))).alias("s"),
        )
        .groupBy("doc_id", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
        .agg(F.count("*").alias("c"))
    )
    # conditional sums reproduce the per-size aggregates exactly,
    # including their null semantics: a doc with no grams of size n has
    # only non-matching rows here, so the filtered sums/max are NULL —
    # the same NULL its missing row produced under the left joins
    is2, is3 = F.col("n") == 2, F.col("n") == 3
    aggs = counts.groupBy("doc_id").agg(
        F.sum(F.when(is2, F.col("c"))).alias("t2"),
        F.max(F.when(is2, F.col("c"))).alias("m2"),
        F.sum(F.when(is3, F.col("c"))).alias("t3"),
        F.sum(
            F.when(is3 & (F.col("c") > 1), F.col("c")).otherwise(
                F.when(is3, F.lit(0))
            )
        ).alias("d3"),
    )
    out = base.drop("tk").join(aggs, "doc_id", "left")
    top2 = F.when(F.col("t2") > 0, F.col("m2") / F.col("t2").cast("double")).otherwise(
        F.lit(0.0)
    )
    dup3 = F.when(F.col("t3") > 0, F.col("d3") / F.col("t3").cast("double")).otherwise(
        F.lit(0.0)
    )
    uniq = F.when(
        F.col("n_tokens") > 0,
        F.col("n_distinct") / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(uniq, 6).alias("uniq_token_ratio"),
        F.round(top2, 6).alias("top2gram_frac"),
        F.round(dup3, 6).alias("dup3gram_frac"),
        ((top2 > F.lit(top2_threshold)) | (dup3 > F.lit(dup3_threshold))).alias(
            "repetitive"
        ),
    )


#: redaction rules applied IN ORDER (emails before IPv4 before phone:
#: the placeholders contain no digits, so later rules can't re-match
#: earlier redactions). Patterns restricted to syntax Java regex and
#: RE2 (the DuckDB oracle) interpret identically: literal classes,
#: bounded repeats, ASCII \b.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub: redact emails / IPv4 addresses / phone-like numbers
    with typed placeholders and count each kind. Each count is taken
    on the text AS IT STOOD before that rule's replacement (the rules
    chain), all inside one Catalyst projection — whole-stage-codegen,
    zero Python, trivially parallel at 100 TB."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select("doc_id", *counts, cur.alias("redacted"))


def curate_docs(
    docs: DataFrame,
    text_col: str = "text",
    top2_threshold: float = 0.06,
    dup3_threshold: float = 0.05,
    min_tokens: int = 30,
) -> DataFrame:
    """Standard pre-index curation composition: PII-redact every
    document, drop repetitive documents (Gopher top-2-gram /
    dup-3-gram signals), then exact-dedup on the REDACTED normalized
    text (so duplicates that differ only in redacted PII collapse),
    keeping the min-doc_id copy of each group.

    Documents under ``min_tokens`` are EXEMPT from the repetition
    flag: for an n-token doc with all-distinct grams top2gram_frac is
    1/(n-1), so the corpus-calibrated thresholds would drop every
    short turn — short docs are a length-filter concern
    (cfg.min_text_length downstream), not a repetition one.

    Returns ``(doc_id, text)`` with the redacted text — ready to feed
    ``prepare_docs``/the index build. Scale shape: redaction is one
    codegen projection; the repetition filter and the dedup are each
    one hash-shuffle aggregation plus an equi-join — no all-pairs
    anywhere, linear in corpus tokens.
    """
    red = pii_redact(docs, text_col).select(
        "doc_id", F.col("redacted").alias("text")
    )
    keep_ids = (
        repetition_scores(
            red, top2_threshold=top2_threshold, dup3_threshold=dup3_threshold
        )
        .filter(~F.col("repetitive") | (F.col("n_tokens") < min_tokens))
        .select("doc_id")
    )
    kept = red.join(keep_ids, "doc_id")
    hashed = kept.select(
        "doc_id", F.md5(norm_text_col(F.col("text"))).alias("text_hash"), "text"
    )
    keepers = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
    return hashed.join(keepers, ["text_hash", "doc_id"]).select("doc_id", "text")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int,
    denom: int = 1000,
    text_col: str = "text",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic content-hash stratified sampling: keep a document
    iff ``md5_hash(norm_text) mod denom < rates[stratum]`` (parts per
    ``denom``). Keyed by CONTENT, not doc_id, so byte-identical
    duplicates always sample identically (rerun-stable and consistent
    with dedup decisions); strata come from a column (here the corpus
    ``lang``), the standard domain-mixing knob for training sets.

    Scale shape: pure per-row filter — no shuffle, no state, and no
    Python: the bucket hash is the same JVM-side md5-prefix used by
    MinHash (``shingle_base_hash_col``), so the whole operator is one
    whole-stage-codegen projection+filter. (The Arrow fingerprint UDF
    would work too, but Catalyst pushes the keep-filter through the
    projection and DUPLICATES the UDF — the md5 path is cheap enough
    that the duplicated evaluation is free, and it never leaves the
    JVM.) Sampled fraction per stratum converges to rate/denom by md5
    uniformity."""
    c = None
    for k, v in sorted(rates.items()):
        c = (F.when if c is None else c.when)(F.col(strata_col) == k, F.lit(v))
    rate = c.otherwise(F.lit(default_rate)) if c is not None else F.lit(default_rate)
    bucket = shingle_base_hash_col(norm_text_col(F.col(text_col))) % F.lit(denom)
    return (
        docs.select(
            "doc_id",
            F.col(strata_col).alias("stratum"),
            bucket.alias("bucket"),
            rate.cast("long").alias("keep_rate"),
        )
        .filter(F.col("bucket") < F.col("keep_rate"))
    )


def collocations(
    docs: DataFrame, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Corpus-level bigram collocation mining by pointwise mutual
    information — the distributional signal behind the reference's
    formulaic-language focus (FLAME surfaces recurring multi-word
    formulae; PMI ranks exactly those over chance co-occurrence):

    pmi(w1, w2) = ln( P(w1 w2) / (P(w1) * P(w2)) ), with P(w1 w2) =
    c12 / T2 over bigram occurrences and P(w) = c / T1 over token
    occurrences. Bigrams under ``min_count`` are dropped (PMI is
    unstable for rare pairs — standard practice).
    -> (w1, w2, c12, pmi) with pmi rounded to 6 dp.

    Scale shape: ONE tagged token+bigram explode feeding one hash
    aggregation with map-side combine — the unigram and bigram counts
    are filters over the same (n, gram) count table, so the executed
    plan computes the explode and its exchange once and reuses them for
    every marginal branch (the per-size formulation tokenized and
    exploded separately per size); two vocabulary-keyed equi-joins
    attach the marginals; the T1/T2 totals are JVM-side sums over
    per-doc token counts (no extra explode). Linear in corpus tokens,
    no all-pairs anywhere.
    """
    from .floatops import np_log

    toks = docs.select(word_tokens_col(F.col(text_col)).alias("tk"))
    totals = toks.agg(
        F.sum(F.size("tk")).alias("t1"),
        F.sum(F.greatest(F.size("tk") - 1, F.lit(0))).alias("t2"),
    ).first()
    t1, t2 = float(totals["t1"] or 0), float(totals["t2"] or 0)
    if t2 == 0:
        raise ValueError("collocations: corpus has no bigrams")
    tagged = F.concat(
        F.transform(
            F.col("tk"), lambda t: F.struct(F.lit(1).alias("n"), t.alias("g"))
        ),
        F.transform(
            word_ngrams_col(F.col("tk"), 2),
            lambda g: F.struct(F.lit(2).alias("n"), g.alias("g")),
        ),
    )
    counts = (
        toks.select(F.explode(tagged).alias("s"))
        .groupBy(F.col("s.n").alias("n"), F.col("s.g").alias("g"))
        .agg(F.count("*").alias("cnt"))
    )
    uni = counts.where(F.col("n") == 1).select(
        F.col("g").alias("w"), F.col("cnt").cast("double").alias("c")
    )
    big = (
        counts.where((F.col("n") == 2) & (F.col("cnt") >= min_count))
        .select(
            F.split("g", " ").getItem(0).alias("w1"),
            F.split("g", " ").getItem(1).alias("w2"),
            F.col("cnt").alias("c12"),
        )
    )
    joined = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
    )
    pmi = np_log(
        (F.col("c12").cast("double") / F.lit(t2))
        / ((F.col("c1") / F.lit(t1)) * (F.col("c2") / F.lit(t1)))
    )
    return joined.select(
        "w1", "w2", F.col("c12").cast("long").alias("c12"),
        F.round(pmi, 6).alias("pmi"),
    )


def keywords_per_doc(
    postings: DataFrame, stats_df: DataFrame, m: int
) -> DataFrame:
    """Per-document keyword extraction: each document's ``m`` most
    characteristic index terms — the labeling/tagging pass a curation
    pipeline runs over every document before routing or sampling.

    Selection is the integer-deterministic tf-idf intent shared with
    searchops.more_like_this's seed-term step: rank a doc's terms by
    (tf DESC, df ASC, term ASC) — most frequent first, rarity breaking
    frequency ties — never comparing float products, so the selected
    set is bit-reproducible across engines.
    postings: (term, doc_id, tf); stats_df: (term, df, ...).
    -> (doc_id, rank, term, tf, df).

    Scale shape: one term-keyed shuffle join (postings x stats — both
    corpus-derived, no broadcast pretense) and one doc_id-partitioned
    window; per-doc state in the window is O(terms per doc). At 100 TB
    both exchanges are unavoidable for exact df; an approximate df
    (e.g. a broadcast CountMinSketch) could cut the first, traded
    against exactness.
    """
    if m <= 0:
        raise ValueError("keywords_per_doc: m must be positive")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        postings.join(stats_df.select("term", "df"), "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
        )
    )


#: winnowing sort-key packing: fp hash < 2^32 rides the high bits,
#: (cap-1 - pos) the low bits, so "min hash, rightmost position" is
#: one integer MIN; caps document length at 2^20-1 chars (longer docs
#: must be chunked upstream, e.g. convops.conversation_windows)
WINNOW_POS_CAP = 1 << 20


def winnow_fingerprints(
    docs: DataFrame, k: int = 7, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every char k-gram of the
    normalized text, slide a length-``w`` window over the hash
    sequence, and select each window's MINIMUM hash (rightmost
    occurrence on ties — the classic winnowing rule), deduplicated.
    Guarantee: any substring match of length >= w + k - 1 between two
    documents yields at least one SHARED fingerprint, while only
    ~2/(w+1) of all k-grams are kept.
    -> distinct (doc_id, pos, fp); pos is the 1-based char position of
    the selected k-gram, fp its 32-bit hash.

    All JVM-side: one k-gram projection (no Python), md5-prefix hashes
    (the cross-engine hash used by the MinHash family), and ONE
    doc-partitioned sliding window over a packed (hash, rightmost-pos)
    int64 key — min-per-window plus tie-break in a single MIN. Docs
    longer than WINNOW_POS_CAP-1 chars raise (pack overflow); chunk
    them upstream.
    """
    if k <= 0 or w <= 0:
        raise ValueError("winnow_fingerprints: k and w must be positive")
    cap = WINNOW_POS_CAP
    d = docs.select("doc_id", norm_text_col(F.col(text_col)).alias("t"))
    guard = F.when(
        F.length("t") >= cap,
        F.raise_error(
            F.concat(
                F.lit(f"winnow_fingerprints: doc longer than {cap - 1} "
                      "chars (chunk upstream): doc_id "),
                F.col("doc_id").cast("string"),
            )
        ),
    ).otherwise(F.col("t"))
    d = d.withColumn("t", guard)
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN length(t) >= {k} THEN "
                f"transform(sequence(1, length(t) - {k - 1}), "
                f"i -> substring(t, i, {k})) ELSE array() END"
            )
        ).alias("off", "g"),
    ).select(
        "doc_id",
        (F.col("off") + 1).cast("long").alias("pos"),
        shingle_base_hash_col(F.col("g")).alias("x"),
    )
    key = F.col("x") * F.lit(cap) + (F.lit(cap - 1) - F.col("pos"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    wins = grams.select(
        "doc_id",
        F.min(key).over(win).alias("mk"),
        F.count(F.lit(1)).over(win).alias("cnt"),
    ).where(F.col("cnt") == w)
    return wins.select(
        "doc_id",
        (F.lit(cap - 1) - F.col("mk") % F.lit(cap)).alias("pos"),
        (F.col("mk") / F.lit(cap)).cast("long").alias("fp"),
    ).distinct()


def winnow_pairs(
    docs: DataFrame,
    k: int = 7,
    w: int = 4,
    min_shared: int = 40,
    text_col: str = "text",
    hot_df_threshold: int | None = None,
    n_splits: int = 8,
) -> DataFrame:
    """Near-dup / text-reuse candidate pairs by shared winnowing
    fingerprints: doc pairs sharing >= ``min_shared`` distinct
    fingerprints, with the count. The skew story is the Jaccard one —
    a hot fingerprint (boilerplate substring) is split across reducers
    via the shared similarity.salted_self_join (exact pair set).
    -> (doc_i, doc_j, shared).
    """
    from .similarity import auto_hot_df_threshold, salted_self_join

    spark = docs.sparkSession
    fps = (
        winnow_fingerprints(docs, k, w, text_col)
        .select("doc_id", "fp")
        .distinct()
        .persist()
    )
    df_stats = fps.groupBy("fp").agg(F.count("*").alias("df"))
    if hot_df_threshold is None:
        hot_df_threshold = auto_hot_df_threshold(
            df_stats, int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    hot = df_stats.filter(F.col("df") > hot_df_threshold).select("fp")
    return (
        salted_self_join(fps.select("fp", "doc_id"), hot, "fp", n_splits)
        .groupBy("doc_i", "doc_j")
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
