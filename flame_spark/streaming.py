"""Structured Streaming extensions (SURVEY §2.9: the reference is
strictly batch; these are the target-side incremental paths).

1. ``incremental_postings``: new transcript turns arriving as files ->
   streaming posting-delta aggregation (the append-only half of an
   incremental index build; merging deltas into segments reuses the
   batch segment writer via ``foreachBatch``).
2. ``windowed_event_counts``: watermarked tumbling-window aggregation
   over the events stream (late data handled by the watermark).

Both are driven to completion synchronously in tests with the memory
sink + ``processAllAvailable`` (no always-on daemon in the sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .textops import word_tokens_col

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def incremental_postings(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a transcripts directory -> per-microbatch posting
    deltas (term, conv_id, turn_idx, tf). Keyed by the stable turn key
    (doc ids are assigned at merge time); complete-mode agg is avoided —
    deltas are append-only and idempotent to merge."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    toks = stream.select(
        "conv_id", "turn_idx", F.explode(word_tokens_col(F.col("text"))).alias("term")
    )
    return toks.groupBy("conv_id", "turn_idx", "term").agg(
        F.count("*").alias("tf")
    )


def run_incremental_postings_once(
    spark: SparkSession, input_dir: str, query_name: str = "postings_delta"
):
    """Drive the stream to completion over the files currently present;
    returns the collected delta table (memory sink, complete mode)."""
    agg = incremental_postings(spark, input_dir)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    out = spark.sql(f"SELECT * FROM {query_name}")
    rows = out.collect()
    q.stop()
    return rows


def windowed_event_counts(spark: SparkSession, input_dir: str) -> DataFrame:
    """Watermarked 5-minute tumbling windows over the events stream."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_windowed_event_counts_once(
    spark: SparkSession, input_dir: str, query_name: str = "event_windows"
):
    agg = windowed_event_counts(spark, input_dir)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(f"SELECT * FROM {query_name}").collect()
    q.stop()
    return rows
