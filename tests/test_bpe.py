"""Unit tests for the deterministic BPE tokenizer + vocab heuristics."""

import pickle

from flame_spark.bpe import (
    BpeModel,
    build_encoder,
    pretokenize,
    suggest_vocab_size,
    train_bpe,
)
from flame_spark.constants import BPE_UNK


CORPUS = [
    "in nomine sancte et individue trinitatis amen",
    "in nomine domini nostri amen amen",
    "notum sit omnibus presentibus et futuris",
] * 5


def test_pretokenize_whitespace_style():
    assert pretokenize("hello, world!") == ["hello", ",", "world", "!"]
    assert pretokenize("a  b\tc") == ["a", "b", "c"]


def test_train_deterministic():
    m1 = train_bpe(CORPUS, 80)
    m2 = train_bpe(list(CORPUS), 80)
    assert m1.vocab == m2.vocab and m1.merges == m2.merges


def test_encode_roundtrip_concat():
    m = train_bpe(CORPUS, 120)
    for doc in CORPUS:
        toks = m.encode(doc)
        assert "".join(toks) == doc.replace(" ", "")
        assert BPE_UNK not in toks


def test_unknown_chars_become_unk():
    m = train_bpe(CORPUS, 60)
    toks = m.encode_word("amén")
    assert BPE_UNK in toks  # 'é' never seen in training


def test_vocab_size_respected():
    m = train_bpe(CORPUS, 50)
    assert len(m.vocab) <= 50


def test_model_pickle_roundtrip():
    m = train_bpe(CORPUS, 80)
    m2 = pickle.loads(pickle.dumps(m))
    assert m2.encode(CORPUS[0]) == m.encode(CORPUS[0])


def test_serialization_dict():
    m = train_bpe(CORPUS, 80)
    m2 = BpeModel.from_dict(m.to_dict())
    assert m2.encode(CORPUS[1]) == m.encode(CORPUS[1])


def test_build_encoder_sorted_dense():
    enc = build_encoder([["b", "a"], ["c", "a"]])
    assert enc == {"a": 0, "b": 1, "c": 2}


def test_suggest_vocab_size_stable():
    v1 = suggest_vocab_size(CORPUS, min_word_freq=2)
    v2 = suggest_vocab_size(list(CORPUS), min_word_freq=2)
    assert v1 == v2
    assert v1 >= 256


def test_suggest_vocab_size_empty_default():
    assert suggest_vocab_size(["x y z"], min_word_freq=5) == 2000
