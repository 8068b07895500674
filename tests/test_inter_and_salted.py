"""Inter-corpus similarity parity + salted self-join equivalence."""

import pytest
from pyspark.sql import functions as F

from flame_spark.config import FlameConfig
from flame_spark.corpus import add_doc_id
from flame_spark.data import generate_transcripts, transcripts_df
from flame_spark.oracle import build_oracle_index, oracle_cosine_pairs_inter
from flame_spark.pipeline import build_index, pairwise_similarity
from flame_spark.postings import term_stats
from flame_spark.similarity import (
    cosine_pairs_inter,
    cosine_pairs_salted,
    tfidf_normalized,
    tfidf_normalized_inter,
)

CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=80, tokenizer="word", term_mode="lno"
)


@pytest.fixture(scope="module")
def two_indexes(spark):
    tdf = add_doc_id(transcripts_df(spark, 10, 7), ["conv_id", "turn_idx"])
    # corpus split by doc_id parity; shared artifacts NOT required for
    # this test (word tokenizer; encoders differ per corpus but terms
    # are LNO hashes over each corpus's own encoder... so build BOTH
    # corpora with ONE shared index pipeline): build a single index,
    # then split its postings by parity — exactly the reference's
    # "learn together, split after tokenize" (flame.py:575-580).
    index = build_index(tdf.select("doc_id", "text"), CFG)
    p1 = index.postings.filter(F.col("doc_id") % 2 == 0)
    p2 = index.postings.filter(F.col("doc_id") % 2 == 1)
    n_union = index.stats.n_docs
    rows = sorted(
        generate_transcripts(10, 7), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    oidx = build_oracle_index([(i, r["text"]) for i, r in enumerate(rows)], CFG)
    return index, p1, p2, n_union, oidx


def _split_oracle(oidx):
    """Split the oracle index into parity sub-indexes (views over tf)."""
    import copy

    o1, o2 = copy.copy(oidx), copy.copy(oidx)
    o1.doc_ids = [d for d in oidx.doc_ids if d % 2 == 0]
    o2.doc_ids = [d for d in oidx.doc_ids if d % 2 == 1]
    o1.tf = {(d, t): v for (d, t), v in oidx.tf.items() if d % 2 == 0}
    o2.tf = {(d, t): v for (d, t), v in oidx.tf.items() if d % 2 == 1}
    o1.n_docs = len(o1.doc_ids)
    o2.n_docs = len(o2.doc_ids)
    return o1, o2


def test_inter_corpus_bit_exact(spark, two_indexes):
    index, p1, p2, n_union, oidx = two_indexes
    w1, w2 = tfidf_normalized_inter(p1, p2, n_union)
    got = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in cosine_pairs_inter(w1, w2).collect()
    }
    o1, o2 = _split_oracle(oidx)
    exp = oracle_cosine_pairs_inter(o1, o2)
    assert set(got) == set(exp)
    assert all(got[k] == exp[k] for k in exp)


def test_salted_join_identical_to_plain(spark, two_indexes):
    from flame_spark.similarity import cosine_pairs

    index, *_ = two_indexes
    weights = tfidf_normalized(index.postings, index.stats_df, index.stats.n_docs)
    plain = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in cosine_pairs(weights).collect()
    }
    # absurdly low threshold -> EVERY term is "hot" and split 4 ways
    salted = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in cosine_pairs_salted(
            weights, index.stats_df, hot_df_threshold=0, n_splits=4
        ).collect()
    }
    assert salted == plain  # same pair set, bit-identical scores
    # the default pipeline path (auto threshold) must also be identical
    default = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in pairwise_similarity(index).collect()
    }
    assert default == plain


def test_salted_jaccard_identical_to_plain(spark):
    """Every doc shares one hot shingle ('a b c' in all) — the salted
    intersection counts must equal the plain self-join's exactly."""
    from flame_spark.textops import ngram_jaccard_pairs, ngram_jaccard_pairs_salted

    rows = [
        (d, "a b c " + " ".join(f"w{d % 7}x{k}" for k in range(6)) + " a b c")
        for d in range(80)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = {
        (r["doc_i"], r["doc_j"]): (r["inter"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.05).collect()
    }
    salted = {
        (r["doc_i"], r["doc_j"]): (r["inter"], r["jaccard"])
        for r in ngram_jaccard_pairs_salted(
            docs, n=3, threshold=0.05, hot_df_threshold=10, n_splits=4
        ).collect()
    }
    assert plain  # the shared hot shingle produces pairs
    assert salted == plain


def test_skewed_fixture_takes_salted_path(spark):
    """A deliberately Zipf-hot term must cross the automatic df cutoff
    (so the default path actually salts it), and the salted result must
    still equal the plain self-join bit-for-bit."""
    from flame_spark.similarity import auto_hot_df_threshold, cosine_pairs

    n_docs = 120
    rows = []
    for d in range(n_docs):
        rows.append((d, 777, 1))  # one term in EVERY doc: df = 120
        rows.append((d, 1000 + d % 9, 2))  # cold terms: df ~ 13
    postings = spark.createDataFrame(rows, "doc_id long, term long, tf int")
    stats_df = term_stats(postings)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cutoff = auto_hot_df_threshold(stats_df, parts)
    assert cutoff < n_docs  # the hot term IS above the auto cutoff
    weights = tfidf_normalized(postings, stats_df, n_docs)
    plain = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in cosine_pairs(weights).collect()
    }
    salted = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in cosine_pairs_salted(weights, stats_df).collect()
    }
    assert salted == plain
