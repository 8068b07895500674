"""Oracle-differential e2e on a HOSTILE corpus: the full reference
pipeline (whitespace canon, MUFI folds, adaptive NFKD char-LUT
learning, BPE train+encode, LNO hashing, BM25, cosine) run by the
Spark engine vs the single-process NumPy oracle over documents laced
with MUFI codepoints, unicode whitespace, combining marks, astral
characters and degenerate shapes. The committed e2e differential
proves plumbing equality on clean synthetic transcripts; this one
hammers the same contract where the plumbing is most likely to drift —
Arrow string round-trips, distributed lost-char histogram tie-breaks
vs the oracle's local Counter, BPE merges over rare hostile
characters, zero-feature documents in stats."""

import pytest

from flame_spark.config import FlameConfig
from flame_spark.oracle import (
    build_oracle_index,
    oracle_bm25_topk,
    oracle_cosine_pairs,
    oracle_query_terms,
)
from flame_spark.pipeline import bm25_topk, build_index, pairwise_similarity

CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=0, tokenizer="bpe", vocab_size=200,
    term_mode="lno",
)

BASE_SENTENCES = [
    "in nomine sancte et individue trinitatis amen",
    "notum sit omnibus tam presentibus quam futuris",
    "ego comes dono et concedo deo et ecclesie sancte marie",
    "huius rei testes sunt petrus et iohannes et martinus",
    "facta carta mense maio sub era millesima",
    "si quis hanc cartam infringere voluerit iram dei incurrat",
]
HOSTILE_BITS = [
    "ſancte", "ꝛegis", "æcclesie", "señor", "dominé",
    "gŕatia", "tëstis",  # combining marks mid-word
    "word\xa0nbsp", "ideo　gram", "tab\there", "vt\x0bsplit",
    "😀emoji𝔘frak", "ß-sharp",
]


def _hostile_corpus() -> list[tuple[int, str]]:
    docs = []
    i = 0
    for rep in range(3):  # repetition so BPE has merges + cosine has pairs
        for s in BASE_SENTENCES:
            bit = HOSTILE_BITS[(i * 7) % len(HOSTILE_BITS)]
            words = s.split()
            words.insert((i * 3) % (len(words) + 1), bit)
            docs.append((i, " ".join(words)))
            i += 1
    # degenerate shapes
    for t in ["", "  \t\x0b  ", "a", "ſꝛæ", "amen amen amen"]:
        docs.append((i, t))
        i += 1
    return docs


@pytest.fixture(scope="module")
def built(spark):
    docs = _hostile_corpus()
    tdf = spark.createDataFrame(docs, "doc_id long, text string")
    index = build_index(tdf, CFG)
    oidx = build_oracle_index(docs, CFG)
    return index, oidx


def test_hostile_norm_tokens_vocab_equal(built):
    index, oidx = built
    got = {
        r["doc_id"]: (r["norm_text"], list(r["tokens"]))
        for r in index.docs.select("doc_id", "norm_text", "tokens").collect()
    }
    assert set(got) == set(oidx.norm_texts)
    for d in got:
        assert got[d][0] == oidx.norm_texts[d], d
        assert got[d][1] == oidx.tokens[d], d
    assert index.artifacts.encoder == oidx.encoder


def test_hostile_postings_stats_equal(built):
    index, oidx = built
    got = {(r["doc_id"], r["term"]): r["tf"] for r in index.postings.collect()}
    assert got == oidx.tf
    assert index.stats.n_docs == oidx.n_docs  # zero-feature docs counted
    assert abs(index.stats.avgdl - oidx.avgdl) < 1e-12


def test_hostile_bm25_and_cosine_bit_exact(spark, built):
    index, oidx = built
    queries = [
        {"query_id": "q0", "query_text": "ſancte trinitatis amen"},
        {"query_id": "q1", "query_text": "tëstes petrus"},
        {"query_id": "q2", "query_text": "😀emoji𝔘frak carta"},
    ]
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in bm25_topk(spark, queries, index, k=5).collect()
    }
    want = {}
    for q in queries:
        qt = oracle_query_terms(oidx, q["query_text"], CFG)
        for rank, (doc, score) in enumerate(
            oracle_bm25_topk(oidx, qt, k=5), start=1
        ):
            want[(q["query_id"], rank)] = (doc, score)
    assert got == want  # bit-exact scores, identical ranks

    pairs = {
        (r["doc_i"], r["doc_j"]): r["score"]
        for r in pairwise_similarity(index).collect()
    }
    assert pairs == oracle_cosine_pairs(oidx)  # bit-exact
