"""Oracle-differential end-to-end tests (SURVEY.md §5.2 layer 1).

Spark engine vs single-process NumPy oracle on the deterministic
synthetic transcripts table: per-turn normalized-text equality, token
equality, identical posting sets, identical stats, rank-identical
bit-exact BM25 top-k, bit-exact TF-IDF cosine pairs, identical Otsu
threshold.
"""

import pytest

from flame_spark.config import FlameConfig
from flame_spark.corpus import add_doc_id
from flame_spark.data import generate_transcripts, reference_queries, transcripts_df
from flame_spark.oracle import (
    build_oracle_index,
    oracle_bm25_topk,
    oracle_cosine_pairs,
    oracle_otsu_threshold,
    oracle_query_terms,
)
from flame_spark.pipeline import (
    auto_threshold,
    bm25_topk,
    build_index,
    pairwise_similarity,
)

N_CONV, AVG_TURNS = 8, 7
CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=80, tokenizer="bpe", vocab_size=400,
    term_mode="lno",
)


@pytest.fixture(scope="module")
def built(spark):
    tdf = add_doc_id(transcripts_df(spark, N_CONV, AVG_TURNS), ["conv_id", "turn_idx"])
    index = build_index(tdf.select("doc_id", "text"), CFG)
    rows = sorted(
        generate_transcripts(N_CONV, AVG_TURNS), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    oidx = build_oracle_index([(i, r["text"]) for i, r in enumerate(rows)], CFG)
    return index, oidx


def test_doc_id_dense_rank(spark):
    tdf = add_doc_id(transcripts_df(spark, N_CONV, AVG_TURNS), ["conv_id", "turn_idx"])
    got = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in tdf.select("conv_id", "turn_idx", "doc_id").collect()
    }
    rows = sorted(
        generate_transcripts(N_CONV, AVG_TURNS), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    assert got == {(r["conv_id"], r["turn_idx"]): i for i, r in enumerate(rows)}


def test_norm_text_and_tokens_equal(built):
    index, oidx = built
    got = {
        r["doc_id"]: (r["norm_text"], list(r["tokens"]))
        for r in index.docs.select("doc_id", "norm_text", "tokens").collect()
    }
    assert set(got) == set(oidx.norm_texts)
    for d in got:
        assert got[d][0] == oidx.norm_texts[d]
        assert got[d][1] == oidx.tokens[d]
    assert index.artifacts.encoder == oidx.encoder
    assert index.artifacts.vocab_size == oidx.vocab_size


def test_postings_and_stats_equal(built):
    index, oidx = built
    got = {(r["doc_id"], r["term"]): r["tf"] for r in index.postings.collect()}
    assert got == oidx.tf
    stats = {r["term"]: (r["df"], r["cf"]) for r in index.stats_df.collect()}
    assert stats == {t: (oidx.term_df[t], oidx.term_cf[t]) for t in oidx.term_df}
    assert index.stats.n_docs == oidx.n_docs
    assert abs(index.stats.avgdl - oidx.avgdl) < 1e-12


def test_bm25_rank_identical_bit_exact(spark, built):
    index, oidx = built
    queries = reference_queries(k=10)
    got = {}
    for r in bm25_topk(spark, queries, index, k=10).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for q in queries:
        qtf = oracle_query_terms(oidx, q["query_text"], CFG)
        exp = [
            (i + 1, d, s)
            for i, (d, s) in enumerate(oracle_bm25_topk(oidx, qtf, 10))
        ]
        assert sorted(got.get(q["query_id"], [])) == exp, q["query_id"]


def test_cosine_pairs_bit_exact(built):
    index, oidx = built
    got = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in pairwise_similarity(index).collect()
    }
    exp = oracle_cosine_pairs(oidx)
    assert set(got) == set(exp)
    assert all(got[k] == exp[k] for k in exp)


def test_otsu_identical(built):
    index, oidx = built
    pairs = pairwise_similarity(index)
    assert auto_threshold(index, pairs) == oracle_otsu_threshold(
        oidx, oracle_cosine_pairs(oidx)
    )


def test_add_doc_id_conv_matches_generic(spark):
    from flame_spark.corpus import add_doc_id_conv

    tdf = transcripts_df(spark, N_CONV, AVG_TURNS)
    generic = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in add_doc_id(tdf, ["conv_id", "turn_idx"]).collect()
    }
    fast = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in add_doc_id_conv(tdf).collect()
    }
    assert fast == generic


def test_identical_outputs_across_parallelism(spark):
    """SURVEY §5.2(3): same corpus, two parallelism levels -> identical
    outputs. Shuffle partitions are changed dynamically (5 vs 23, both
    co-prime with everything) and the full pipeline result digests must
    match bit-for-bit — the fixed-order-summation design under test."""
    import json

    results = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ["5", "23"]:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            tdf = add_doc_id(
                transcripts_df(spark, N_CONV, AVG_TURNS), ["conv_id", "turn_idx"]
            )
            index = build_index(tdf.select("doc_id", "text"), CFG)
            tk = sorted(
                (r["query_id"], r["rank"], r["doc_id"], r["score"])
                for r in bm25_topk(
                    spark, reference_queries(k=10), index, k=10
                ).collect()
            )
            pairs = sorted(
                (r["doc_i"], r["doc_j"], r["score"])
                for r in pairwise_similarity(index).collect()
            )
            results.append(json.dumps({"tk": tk, "pairs": pairs}))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results[0] == results[1]
