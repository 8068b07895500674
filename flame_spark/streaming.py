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
    """readStream over a transcripts directory -> RUNNING posting
    counts (term, conv_id, turn_idx, tf), keyed by the stable turn key
    (doc ids are assigned at merge time).

    Contract: this is a streaming AGGREGATION — each emission is the
    key's cumulative tf, not a per-batch delta. A downstream merge must
    UPSERT by (conv_id, turn_idx, term) (last value wins); appending
    emissions as if they were increments would double-count any turn
    the source re-delivers. (The per-batch-delta shape lives in
    incremental.ingest_stream, which indexes each microbatch exactly
    once through foreachBatch.)"""
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


def conversation_state_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    per-conversation running session state — turn count, total text
    chars, max turn_idx — maintained across microbatches and emitted
    (update mode) whenever the conversation receives new turns. The
    arbitrary-state API is the escape hatch for operators watermarked
    windows can't express (running per-key aggregates with custom merge
    logic); state is a single small tuple per conversation, so the
    state store stays O(active conversations)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    out_type = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("n_turns", LongType()),
            StructField("n_chars", LongType()),
            StructField("max_turn_idx", IntegerType()),
        ]
    )
    state_type = StructType(
        [
            StructField("n_turns", LongType()),
            StructField("n_chars", LongType()),
            StructField("max_turn_idx", IntegerType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n_turns, n_chars, max_ti = (
            state.get if state.exists else (0, 0, -1)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
            if len(pdf):
                max_ti = max(max_ti, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_chars, max_ti))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n_turns],
                "n_chars": [n_chars],
                "max_turn_idx": [max_ti],
            }
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update, out_type, state_type, "update", GroupStateTimeout.NoTimeout
    )


def run_conversation_state_once(
    spark: SparkSession, input_dir: str, query_name: str = "conv_state"
):
    """Drive the stateful stream over the files currently present; the
    memory sink accumulates every per-batch emission, so a conversation
    split across microbatches appears multiple times with GROWING
    counts — direct evidence the state carried over."""
    agg = conversation_state_stream(spark, input_dir)
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(f"SELECT * FROM {query_name}").collect()
    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    q.stop()
    return rows, n_batches


def user_event_state_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Stateful per-user event accumulator (applyInPandasWithState):
    running (n_events, sum_value) per user_id across microbatches —
    the gate-checked twin of ``conversation_state_stream`` over the
    events table (final emissions must equal a batch GROUP BY)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out_type = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_type = StructType(
        [
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update, out_type, state_type, "update", GroupStateTimeout.NoTimeout
    )


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


def percolate_stream(
    spark: SparkSession, input_dir: str, stored_queries: list[dict]
) -> DataFrame:
    """Streaming percolation: route each transcript turn against the
    stored-query registry the moment its file lands — the ALERTING
    deployment of searchops.percolate (same contract, one
    ``normalize_stored_queries`` definition).

    Deliberately STATELESS: each turn is matched row-locally against
    the broadcast-literal registry (explode over the query structs,
    array_intersect containment tests — all JVM-side), so the output
    is pure append with no watermark, no state store, and one
    microbatch of alert latency. Row work is O(registry size); for
    registries past a few thousand stored queries, run the batch
    ``percolate`` shape (inverted term->query join) on a cadence
    instead. -> streaming (query_id, conv_id, turn_idx).
    """
    from .searchops import normalize_stored_queries

    qs = normalize_stored_queries(stored_queries)
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # per-file alert latency
        .parquet(input_dir)
    )
    if not qs:
        # all rules retired: a valid alert stream that never fires
        # (the batch path returns an empty frame here — same contract)
        return stream.where(F.lit(False)).select(
            F.lit(None).cast("string").alias("query_id"),
            "conv_id",
            "turn_idx",
        )
    qcol = F.array(*[
        F.struct(
            F.lit(q["query_id"]).alias("query_id"),
            F.array(*[F.lit(t) for t in q["must"]]).cast(
                "array<string>").alias("must"),
            F.array(*[F.lit(t) for t in q["should"]]).cast(
                "array<string>").alias("should"),
            F.array(*[F.lit(t) for t in q["must_not"]]).cast(
                "array<string>").alias("must_not"),
            F.lit(q["min_should"]).alias("min_should"),
        )
        for q in qs
    ])
    rows = stream.select(
        "conv_id",
        "turn_idx",
        F.array_distinct(word_tokens_col(F.col("text"))).alias("dt"),
        F.explode(qcol).alias("q"),
    )
    matched = rows.where(
        (F.size(F.array_intersect("dt", "q.must")) == F.size("q.must"))
        & (F.size(F.array_intersect("dt", "q.should"))
           >= F.col("q.min_should"))
        & (F.size(F.array_intersect("dt", "q.must_not")) == 0)
    )
    return matched.select(
        F.col("q.query_id").alias("query_id"), "conv_id", "turn_idx"
    )


def run_percolate_stream_once(
    spark: SparkSession,
    input_dir: str,
    stored_queries: list[dict],
    query_name: str = "percolate_alerts",
):
    """Drive the alert stream over the files currently present (append
    mode, memory sink); returns (rows, n_batches)."""
    out = percolate_stream(spark, input_dir, stored_queries)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    rows = spark.sql(f"SELECT * FROM {query_name}").collect()
    q.stop()
    return rows, n_batches
