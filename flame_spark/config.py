"""Engine configuration (mirrors the reference CLI defaults,
flame.py:273-305) plus target-side knobs (BM25, segments, sharding)."""

from __future__ import annotations

from dataclasses import dataclass

from . import constants as C


@dataclass
class FlameConfig:
    # shingling (flame.py:277-278)
    ngram: int = C.DEFAULT_NGRAM
    n_out: int = C.DEFAULT_N_OUT
    # corpus filters (flame.py:276-280)
    min_text_length: int = C.DEFAULT_MIN_TEXT_LENGTH
    keep_texts: int | None = None
    # normalization (flame.py:283-291)
    alphabet: str = C.DEFAULT_ALPHABET
    char_norm_min_freq: int = 1
    bigram_enabled: bool = False
    phonetic_enabled: bool = False
    # tokenizer: 'bpe' (reference parity) or 'word' (whitespace words;
    # SQL-oracle-expressible mode)
    tokenizer: str = "bpe"
    vocab_size: int | str = "auto"
    vocab_min_word_freq: int = C.DEFAULT_VOCAB_MIN_WORD_FREQ
    vocab_coverage: float = C.DEFAULT_VOCAB_COVERAGE
    # term space for the inverted index: 'lno' (LNO-gram hashes, the
    # reference's feature space) or 'token' (raw tokens; word-level BM25)
    term_mode: str = "lno"
    # BM25
    bm25_k1: float = C.BM25_K1
    bm25_b: float = C.BM25_B
    # index layout
    block_size: int = C.BLOCK_SIZE
    n_shards: int = 32  # doc-range shards for segment build/query
    # artifact learning cap: max docs (in (doc_id) order) used to train
    # BPE + adaptive char rules on the driver. The trained artifacts are
    # corpus-level hyperparameters, not per-row state, so a bounded
    # deterministic sample is the scale-safe DEFAULT (100k docs); set
    # None explicitly to train on the whole corpus (reference parity on
    # small corpora — identical below the cap since sample == corpus).
    learn_sample_docs: int | None = 100_000
    # word-mode encoder collect cap: above this many distinct tokens
    # the token->id mapping stays distributed (corpus.build_vocab_df /
    # encode_tokens_joined) instead of a driver collect+broadcast.
    max_collect_vocab: int = 1_000_000

    def validate(self) -> None:
        if self.ngram - self.n_out < 1:
            # reference guard flame.py:1345-1346
            raise ValueError("ngram - n_out must be >= 1")
        if self.tokenizer not in ("bpe", "word"):
            raise ValueError(f"unknown tokenizer {self.tokenizer!r}")
        if self.term_mode not in ("lno", "token"):
            raise ValueError(f"unknown term_mode {self.term_mode!r}")
