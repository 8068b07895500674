"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship run — the full FLAME-parity engine
  (normalize -> BPE -> LNO-gram shingle -> postings -> compressed
  block-max segments -> WAND BM25 top-k) over the sf0.001 documents
  table.
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 plus the training-data pipeline operators
  (dedup / similarity search / text analysis / embeddings ANN /
  curation: decontamination, repetition, PII redaction, stratified
  sampling).
- ``oracle_sql()``: DuckDB twins for every SQL-expressible entry
  (rows-only for WAND pruning, Otsu, LSH-ANN, BPE — non-SQL paths,
  each covered by oracle-differential pytest instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BPE + LNO postings + segments + block-max WAND top-k."""
    from pyspark.sql import functions as F

    from flame_spark.config import FlameConfig
    from flame_spark.pipeline import build_index, build_segment_table, wand_bm25_topk
    from flame_spark.queries import BM25_QUERIES

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    cfg = FlameConfig(
        ngram=3, n_out=1, min_text_length=0, tokenizer="bpe",
        vocab_size=800, term_mode="lno", n_shards=8,
    )
    index = build_index(docs, cfg)
    segments = build_segment_table(index)
    queries = [{"query_id": qid, "query_text": qt} for qid, qt in BM25_QUERIES]
    return wand_bm25_topk(spark, queries, index, segments, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flame_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from flame_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
