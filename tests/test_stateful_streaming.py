import sys
sys.path.insert(0, "/root/repo")

def test_stateful_conversation_state(spark, tmp_path):
    from pyspark.sql import functions as F
    from flame_spark.data import transcripts_df
    from flame_spark.streaming import run_conversation_state_once

    full = transcripts_df(spark, 6, 8).persist()
    # split EACH conversation across two files so state must carry over
    p1 = full.filter(F.col("turn_idx") < 3)
    p2 = full.filter(F.col("turn_idx") >= 3)
    d = tmp_path / "in"; d.mkdir()
    p1.coalesce(1).write.mode("overwrite").parquet(str(d / "f1.parquet"))
    p2.coalesce(1).write.mode("overwrite").parquet(str(d / "f2.parquet"))

    rows, n_batches = run_conversation_state_once(spark, str(d / "*"))
    assert n_batches >= 2  # really processed multiple microbatches
    # final (max) emission per conversation == batch ground truth
    final = {}
    for r in rows:
        cur = final.get(r["conv_id"])
        if cur is None or r["n_turns"] > cur[0]:
            final[r["conv_id"]] = (r["n_turns"], r["n_chars"], r["max_turn_idx"])
    truth = {
        r["conv_id"]: (r["n"], r["ch"], r["mt"])
        for r in full.groupBy("conv_id").agg(
            F.count("*").alias("n"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("ch"),
            F.max("turn_idx").alias("mt"),
        ).collect()
    }
    assert final == truth
    # statefulness evidence: some conversation emitted more than once
    from collections import Counter
    c = Counter(r["conv_id"] for r in rows)
    assert max(c.values()) >= 2
    full.unpersist()
