"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the two-parallelism-level scaling run
the north rule requires (local[N] vs local[4N] as the N-vs-4N-executor
stand-in — no real cluster in this sandbox).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "sec", "queries": {...},
   "sf": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING_TURNS = int(os.environ.get("FLAME_BENCH_TURNS", "100000"))
SCALING_REPEATS = int(os.environ.get("FLAME_BENCH_REPEATS", "2"))

HEADLINE = [
    "t5_lno31_postings",
    "j6_bm25_topk",
    "j1_tfidf_cosine_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "text_quality",
    "text_fingerprints",
    "ann_cosine_topk",
    "events_window5m",
    "wand_topk_lno",
]


def run_headline(spark) -> dict[str, float]:
    from flame_spark.queries import QUERIES

    times = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()  # materialize the whole plan
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {times[name]}s ({n} rows)", file=sys.stderr)
    return times


def index_build_throughput(cpus: int, n_turns: int) -> float:
    """Full transcripts index build (normalize -> tokenize -> shingle ->
    postings -> stats -> segments) at the given parallelism; returns
    turns/sec. Fresh SparkSession per level."""
    from flame_spark.config import FlameConfig
    from flame_spark.corpus import add_doc_id
    from flame_spark.data import transcripts_df
    from flame_spark.pipeline import build_index, build_segment_table
    from flame_spark.session import get_spark

    spark = get_spark(f"bench_scale_{cpus}", cpus=cpus, shuffle_partitions=cpus)
    try:
        n_conv = max(1, n_turns // 10)
        tdf = add_doc_id(
            transcripts_df(spark, n_conversations=n_conv, avg_turns=10),
            ["conv_id", "turn_idx"],
        )
        tdf = tdf.persist()
        n = tdf.count()
        cfg = FlameConfig(
            ngram=3, n_out=1, min_text_length=80, tokenizer="word",
            term_mode="lno", n_shards=max(cpus, 8),
        )
        t0 = time.perf_counter()
        index = build_index(tdf.select("doc_id", "text"), cfg)
        segments = build_segment_table(index)
        segments.count()
        dt = time.perf_counter() - t0
        return n / dt
    finally:
        spark.stop()


def main():
    from flame_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    t0 = time.perf_counter()
    times = run_headline(spark)
    total = round(time.perf_counter() - t0, 3)
    spark.stop()

    scaling = {}
    if os.environ.get("FLAME_BENCH_SCALING", "1") != "0":
        # The sandbox host is shared (intermittent CPU steal), so each
        # level runs SCALING_REPEATS times and reports the best — the
        # least-contended measurement is the honest one for scaling.
        lo_cpus = max(2, CPUS // 4)
        tp_lo = max(
            index_build_throughput(lo_cpus, SCALING_TURNS)
            for _ in range(SCALING_REPEATS)
        )
        tp_hi = max(
            index_build_throughput(CPUS, SCALING_TURNS)
            for _ in range(SCALING_REPEATS)
        )
        scaling = {
            "turns": SCALING_TURNS,
            f"turns_per_sec_local[{lo_cpus}]": round(tp_lo, 1),
            f"turns_per_sec_local[{CPUS}]": round(tp_hi, 1),
            "scaling_efficiency": round(tp_hi / (4.0 * tp_lo), 3),
        }
        print(f"  scaling: {scaling}", file=sys.stderr)

    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
