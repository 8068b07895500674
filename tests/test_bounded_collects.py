"""Driver-memory bounds: word-mode vocabularies above the collect cap
stay distributed (join-encode path) and produce IDENTICAL indexes;
BPE training samples are capped by default."""

from pyspark.sql import functions as F

from flame_spark.config import FlameConfig
from flame_spark.corpus import add_doc_id
from flame_spark.data import transcripts_df
from flame_spark.pipeline import build_index, bm25_topk


def _raw(spark):
    return add_doc_id(
        transcripts_df(spark, 12, 6), ["conv_id", "turn_idx"]
    ).select("doc_id", "text")


def test_word_mode_joined_encoder_identical_to_collected(spark):
    """Force the distributed-encoder path with a tiny cap: the build
    must never collect more than max_collect_vocab tokens (encoder dict
    is None) and postings/doc_lens must be bit-identical to the
    collected-dict build."""
    raw = _raw(spark).persist()
    base_cfg = dict(
        ngram=3, n_out=1, min_text_length=40, tokenizer="word", term_mode="lno"
    )
    collected = build_index(raw, FlameConfig(**base_cfg))
    joined = build_index(raw, FlameConfig(**base_cfg, max_collect_vocab=5))

    assert collected.artifacts.encoder is not None
    assert joined.artifacts.encoder is None  # nothing vocab-sized collected
    assert joined.artifacts.encoder_df is not None
    assert joined.artifacts.n_vocab == len(collected.artifacts.encoder)

    p_c = sorted(tuple(r) for r in collected.postings.collect())
    p_j = sorted(tuple(r) for r in joined.postings.collect())
    assert p_c == p_j
    assert p_c  # non-trivial

    # the query path must work without a driver-side vocab dict
    qs = [{"query_id": "q0", "query_text": "the merge of the table"}]
    top_c = [tuple(r) for r in bm25_topk(spark, qs, collected, k=5).collect()]
    top_j = [tuple(r) for r in bm25_topk(spark, qs, joined, k=5).collect()]
    assert top_c == top_j
    raw.unpersist()


def test_learn_sample_docs_defaults_to_bounded(spark):
    cfg = FlameConfig()
    assert cfg.learn_sample_docs is not None  # scale-safe default
    assert cfg.max_collect_vocab >= 1000


def test_bpe_capped_sample_build_runs(spark):
    """BPE with a small learn cap still builds a working index (the
    sample is a deterministic doc_id-ordered prefix)."""
    raw = _raw(spark)
    cfg = FlameConfig(
        ngram=3, n_out=1, min_text_length=40, tokenizer="bpe",
        term_mode="lno", learn_sample_docs=10, vocab_size=200,
    )
    index = build_index(raw, cfg)
    assert index.stats.n_docs > 0
    assert index.postings.count() > 0
