"""BM25 top-k query scoring (SURVEY §2 J6/O7; project-defined semantics).

Frozen formula (constants.py): idf = ln((N - df + 0.5)/(df + 0.5) + 1),
tf_comp = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)), contribution =
qtf * idf * tf_comp, k1=1.2, b=0.75. Document length dl = number of
index terms; N and avgdl cover ALL docs including zero-feature ones.

Rank-identity engineering:
- scores are summed in a FIXED order (contributions sorted by term,
  left fold) via collect_list -> array_sort -> aggregate — all JVM-side,
  so the result is bit-identical across partitionings and matches the
  NumPy oracle's sorted-term summation.
- top-k tie-break: score desc, doc_id asc (deterministic).

Plan shape: query terms are tiny -> broadcast against term stats and
postings; one shuffle for the (query_id, doc_id) aggregation; window
top-k per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .postings import CorpusStats


def explode_query_terms(queries: DataFrame, term_col: str = "terms") -> DataFrame:
    """queries(query_id, terms: array) -> (query_id, term, qtf)."""
    return (
        queries.select("query_id", F.explode(term_col).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").cast("int").alias("qtf"))
    )


def _det_sum(col_struct_term, col_val):
    """Deterministic fixed-order sum: sort (term, val) structs by term,
    left-fold the values. JVM-side, bit-stable across partitionings."""
    arr = F.array_sort(F.collect_list(F.struct(col_struct_term, col_val)))
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x.getField("val")
    )


def contributions(
    qterms: DataFrame,
    postings_with_dl: DataFrame,
    term_stats_df: DataFrame,
    stats: CorpusStats,
    k1: float,
    b: float,
) -> DataFrame:
    """Per-(query, doc, term) contribution rows — the pre-aggregation
    stage of ``score_bm25`` (ONE formula definition) and the payload of
    the explain surface: (query_id, doc_id, t, tf, df, dl, idf, val)
    with val = qtf * (idf * tf_comp). qterms is small (broadcast)."""
    n, avgdl = float(stats.n_docs), float(stats.avgdl)
    q = F.broadcast(qterms)
    from .floatops import np_log

    q_with_idf = q.join(term_stats_df, "term", "inner").withColumn(
        "idf",
        np_log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
    )
    joined = postings_with_dl.join(
        F.broadcast(
            q_with_idf.select("query_id", "term", "qtf", "df", "idf")
        ),
        "term",
        "inner",
    )
    denom_dl = 1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl)
    tf_comp = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * denom_dl
    )
    # association order qtf * (idf * tf_comp) is load-bearing: the
    # segment/WAND path precomputes s = idf*tf_comp at build time and
    # multiplies by qtf at query time — same float ops, bit-identical.
    contrib = F.col("qtf") * (F.col("idf") * tf_comp)
    return joined.select(
        "query_id",
        "doc_id",
        F.col("term").alias("t"),
        "tf",
        "df",
        "dl",
        "idf",
        contrib.alias("val"),
    )


def score_bm25(
    qterms: DataFrame,
    postings_with_dl: DataFrame,
    term_stats_df: DataFrame,
    stats: CorpusStats,
    k1: float,
    b: float,
) -> DataFrame:
    """-> (query_id, doc_id, score). qterms is small (broadcast side)."""
    scored = contributions(
        qterms, postings_with_dl, term_stats_df, stats, k1, b
    ).select("query_id", "doc_id", "t", "val")
    return scored.groupBy("query_id", "doc_id").agg(
        _det_sum(F.col("t").alias("t"), F.col("val").alias("val")).alias("score")
    )


def topk(scored: DataFrame, k: int) -> DataFrame:
    """-> (query_id, rank, doc_id, score); tie-break doc_id asc."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
