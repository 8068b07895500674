"""The two-exchange build path must produce BYTE-IDENTICAL segment
tables to the general postings/stats/join path, and WAND over them must
equal the exhaustive scorer."""

from pyspark.sql import functions as F

from flame_spark.config import FlameConfig
from flame_spark.corpus import add_doc_id
from flame_spark.data import transcripts_df
from flame_spark.fastbuild import build_serving_index
from flame_spark.pipeline import (
    bm25_topk,
    build_index,
    build_segment_table,
    query_terms_local,
)

CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=80, tokenizer="word",
    term_mode="lno", n_shards=5, block_size=4,  # small blocks force WAND paths
)


def _seg_key(r):
    return (r["shard"], r["term"])


def _seg_val(r):
    return (
        r["n_docs"], r["first_doc"], r["last_doc"],
        bytes(r["doc_deltas"]), bytes(r["tfs"]), bytes(r["scores"]),
        tuple(r["block_max"]),
    )


def test_fast_segments_byte_equal_to_general_path(spark):
    raw = add_doc_id(transcripts_df(spark, 20, 7), ["conv_id", "turn_idx"]).select(
        "doc_id", "text"
    ).persist()
    index = build_index(raw, CFG)
    general = {_seg_key(r): _seg_val(r) for r in build_segment_table(index).collect()}
    serving = build_serving_index(raw, CFG)
    fast = {_seg_key(r): _seg_val(r) for r in serving.segments.collect()}
    assert fast == general
    assert len(fast) > 50
    assert serving.stats.n_docs == index.stats.n_docs
    assert serving.stats.avgdl == index.stats.avgdl
    raw.unpersist()


def test_fast_wand_equals_exhaustive(spark):
    from flame_spark.wand import wand_topk

    raw = add_doc_id(transcripts_df(spark, 20, 7), ["conv_id", "turn_idx"]).select(
        "doc_id", "text"
    ).persist()
    index = build_index(raw, CFG)
    serving = build_serving_index(raw, CFG)
    serving.segments.persist().count()
    queries = [
        {"query_id": "q0", "query_text": "the merge of the table scan"},
        {"query_id": "q1", "query_text": "window filter stream batch sort"},
    ]
    exhaustive = [tuple(r) for r in bm25_topk(spark, queries, index, k=8).collect()]
    qterms = query_terms_local(spark, queries, serving)
    wand = [
        tuple(r)
        for r in wand_topk(qterms, serving.segments, 8, CFG.block_size).collect()
    ]
    assert sorted(wand) == sorted(exhaustive)

    # one-stage serving path: identical (query_id, rank, doc_id, score)
    from flame_spark.pipeline import wand_bm25_serve
    from flame_spark.wand import segments_for_serving, wand_topk

    sharded = segments_for_serving(serving.segments, 4)
    sharded.count()
    served = wand_bm25_serve(queries, serving, sharded, k=8)
    dist = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand_topk(qterms, serving.segments, 8, CFG.block_size).collect()
    ]
    assert sorted(served) == sorted(dist)

    # batch serving path (one job for all queries): tuple-identical to
    # the per-query serve path, including scores and tie-breaks
    from flame_spark.pipeline import wand_bm25_serve_batch

    batch = wand_bm25_serve_batch(queries, serving, sharded, k=8)
    assert batch == served
    raw.unpersist()
