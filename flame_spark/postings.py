"""Posting-list construction + corpus statistics (SURVEY §2 A1/A3, §3.2).

The reference materializes a scipy CSR doc×feature matrix
(flame.py:774-786); the relational equivalent is the posting table
``(term, doc_id, tf)`` built with one explode + one hash aggregation —
partial (map-side) + final agg, a single shuffle, fully Catalyst-native.

Works for either term space:
- ``lno``  : term = int64 LNO-gram hash  (features column)
- ``token``: term = token string         (tokens column)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


def build_postings(docs: DataFrame, term_col: str = "features") -> DataFrame:
    """docs(doc_id, <term_col>: array) -> postings(term, doc_id, tf).

    tf counts multiplicity (flame.py:778 np.unique return_counts).
    """
    return (
        docs.select("doc_id", F.explode(term_col).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def doc_lengths(docs: DataFrame, term_col: str = "features") -> DataFrame:
    """doc_id -> dl = number of index terms (0 allowed: docs shorter than
    the n-gram window yield zero features, flame.py:717-718)."""
    return docs.select(
        "doc_id", F.size(term_col).cast("long").alias("dl")
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """term -> (df, cf). postings rows are already (term, doc) distinct."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


@dataclass
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(doc_lens: DataFrame) -> CorpusStats:
    row = doc_lens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))
