"""FLAME-native source: a directory of ``*.txt`` files (S1-S3).

The reference glob-scans ``*{suffix}`` recursively, reads UTF-8,
whitespace-collapses, drops docs shorter than ``min_text_length`` and
stops at ``keep_texts`` (flame.py:386-414). Its first-k is rglob-order-
dependent; ours is first-k in SORTED PATH order (SURVEY §2 S3 documented
deviation — deterministic at any parallelism).

Spark mapping: ``spark.read.text(..., wholetext=True)`` +
``input_file_name()``; whitespace canonicalization is JVM regexp; the
year column (P10) comes from the filename."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..reports import year_col


def load_text_dir(
    spark: SparkSession,
    path: str,
    suffix: str = ".txt",
    min_text_length: int = 0,
    keep_texts: int | None = None,
) -> DataFrame:
    """-> (doc_id, name, year, text) — doc_id dense over sorted path."""
    from ..corpus import add_doc_id

    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", f"*{suffix}")
        .text(path, wholetext=True)
        .withColumn("path", F.input_file_name())
        .select(
            "path",
            F.regexp_replace(F.trim(F.col("value")), r"\s+", " ").alias("text"),
        )
        .filter(F.length("text") >= min_text_length)
    )
    docs = add_doc_id(raw, ["path"])
    if keep_texts is not None:
        docs = docs.filter(F.col("doc_id") < keep_texts)
    return docs.select(
        "doc_id",
        F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
        year_col(F.element_at(F.split(F.col("path"), "/"), -1)).alias("year"),
        "text",
    )
