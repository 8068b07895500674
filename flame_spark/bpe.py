"""Deterministic byte-pair-encoding tokenizer (pure Python, no deps).

The reference trains a HuggingFace ``tokenizers`` BPE with a Whitespace
pre-tokenizer, ``unk_token="[UNK]"`` and 5 special tokens
(reference: flame.py:543-555). That library is not available in this
environment, so this module implements the classic BPE algorithm
(Sennrich et al. 2015, public) with the same interface semantics:

- pre-tokenizer: HF ``Whitespace`` == runs of word chars or runs of
  punctuation (``\\w+|[^\\w\\s]+``);
- training: greedy most-frequent-pair merges until ``vocab_size``;
  tie-break = lexicographically smallest pair (HF's internal tie order
  is unspecified across versions — ours is pinned and documented);
- encoding: merges applied in rank order per word; symbols absent from
  the vocab become ``[UNK]`` (flame.py:543 ``BPE(unk_token="[UNK]")``).

Training happens ONCE on the driver over a canonically-ordered corpus
export and the resulting model (a small dict) is broadcast to executors
— the same single-model-per-corpus property the reference has.

If HuggingFace ``tokenizers`` is importable, ``HAVE_HF_TOKENIZERS`` is
True and callers may opt into it; the in-repo oracle always uses this
implementation so engine/oracle rank-identity holds by construction.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from dataclasses import dataclass, field

from .constants import BPE_SPECIAL_TOKENS, BPE_UNK

try:  # pragma: no cover - optional accelerator
    import tokenizers as _hf_tokenizers  # noqa: F401

    HAVE_HF_TOKENIZERS = True
except Exception:  # pragma: no cover
    HAVE_HF_TOKENIZERS = False

# HF Whitespace pre-tokenizer: word-char runs or punctuation runs.
_PRETOK_RE = re.compile(r"\w+|[^\w\s]+")
_WORD_RE = re.compile(r"\b\w+\b")


def pretokenize(text: str) -> list[str]:
    return _PRETOK_RE.findall(text)


def suggest_vocab_size(
    corpus: list[str],
    min_word_freq: int = 3,
    max_affix_len: int = 6,
    coverage: float = 0.85,
) -> int:
    """Affix-coverage vocab-size heuristic (flame.py:58-145).

    Adjacent-pair common prefixes over the word-sorted list and common
    suffixes over the reversed-word-sorted list, weighted by the pair's
    summed frequencies; take most-common affixes until ``coverage`` of
    total affix mass, +256 base. Tie-break among equal-count affixes is
    lexicographic (documented deviation from Counter insertion order;
    affects only the boundary affix of a hyperparameter).
    """
    word_counts: Counter = Counter()
    for doc in corpus:
        word_counts.update(t.lower() for t in _WORD_RE.findall(doc))
    frequent = {
        w: c for w, c in word_counts.items() if c >= min_word_freq and len(w) > 1
    }
    if not frequent:
        return 2000

    def common_prefix_len(a: str, b: str) -> int:
        n = min(len(a), len(b))
        i = 0
        while i < n and a[i] == b[i]:
            i += 1
        return i

    affix_counts: Counter = Counter()
    words = sorted(frequent)
    for i in range(len(words) - 1):
        w1, w2 = words[i], words[i + 1]
        k = common_prefix_len(w1, w2)
        if 1 < k <= max_affix_len:
            affix_counts[w1[:k]] += frequent[w1] + frequent[w2]
    rev = sorted(frequent, key=lambda w: w[::-1])
    for i in range(len(rev) - 1):
        w1, w2 = rev[i][::-1], rev[i + 1][::-1]
        k = common_prefix_len(w1, w2)
        if 1 < k <= max_affix_len:
            affix_counts[w1[:k][::-1]] += frequent[rev[i]] + frequent[rev[i + 1]]
    if not affix_counts:
        return 2000

    ordered = sorted(affix_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c for _, c in ordered)
    target = total * coverage
    acc = 0
    size = 0
    for _, c in ordered:
        acc += c
        size += 1
        if acc >= target:
            break
    return size + 256


@dataclass
class BpeModel:
    """Trained BPE model: vocabulary + ordered merge rules. Broadcastable."""

    vocab: dict[str, int]
    merges: list[tuple[str, str]]
    _ranks: dict[tuple[str, str], int] = field(default=None, repr=False)
    _cache: dict[str, tuple[str, ...]] = field(default=None, repr=False)

    def __post_init__(self):
        self._ranks = {pair: i for i, pair in enumerate(self.merges)}
        self._cache = {}

    def __getstate__(self):  # keep broadcast payload small
        return {"vocab": self.vocab, "merges": self.merges}

    def __setstate__(self, state):
        self.vocab = state["vocab"]
        self.merges = state["merges"]
        self.__post_init__()

    def encode_word(self, word: str) -> tuple[str, ...]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        symbols = list(word)
        while len(symbols) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(symbols) - 1):
                r = self._ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            symbols[best_i : best_i + 2] = [
                symbols[best_i] + symbols[best_i + 1]
            ]
        out = tuple(
            s if s in self.vocab else BPE_UNK for s in symbols
        )
        if len(self._cache) < 1_000_000:
            self._cache[word] = out
        return out

    def encode(self, text: str) -> list[str]:
        """text -> subword tokens (flame.py:675-678 interface)."""
        toks: list[str] = []
        for word in pretokenize(text):
            toks.extend(self.encode_word(word))
        return toks

    def to_dict(self) -> dict:
        return {"vocab": self.vocab, "merges": [list(m) for m in self.merges]}

    @classmethod
    def from_dict(cls, d: dict) -> "BpeModel":
        return cls(
            vocab=dict(d["vocab"]),
            merges=[tuple(m) for m in d["merges"]],
        )


def train_bpe(corpus: list[str], vocab_size: int) -> BpeModel:
    """Train BPE on pre-tokenized word counts (classic algorithm).

    vocab = specials + sorted initial alphabet + merged symbols in merge
    order. Merging stops at ``vocab_size`` or when no adjacent pair
    occurs at least twice.
    """
    word_counts: Counter = Counter()
    for doc in corpus:
        word_counts.update(pretokenize(doc))

    # word -> current symbol sequence
    seqs: dict[str, list[str]] = {w: list(w) for w in word_counts}

    alphabet = sorted({c for w in word_counts for c in w})
    vocab: dict[str, int] = {}
    for tok in BPE_SPECIAL_TOKENS:
        vocab[tok] = len(vocab)
    for c in alphabet:
        vocab[c] = len(vocab)

    # pair stats + inverted index pair -> words containing it
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for w, seq in seqs.items():
        cnt = word_counts[w]
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] += cnt
            pair_words[(a, b)].add(w)

    merges: list[tuple[str, str]] = []
    while len(vocab) < vocab_size and pair_counts:
        best_pair, best_count = None, 0
        for pair, count in pair_counts.items():
            if count > best_count or (
                count == best_count and (best_pair is None or pair < best_pair)
            ):
                best_pair, best_count = pair, count
        if best_pair is None or best_count < 2:
            break
        a, b = best_pair
        new_sym = a + b
        merges.append(best_pair)
        if new_sym not in vocab:
            vocab[new_sym] = len(vocab)

        affected = list(pair_words.pop(best_pair, ()))
        pair_counts.pop(best_pair, None)
        for w in affected:
            seq = seqs[w]
            cnt = word_counts[w]
            # remove old pair contributions for this word
            for x, y in zip(seq, seq[1:]):
                p = (x, y)
                if p == best_pair:
                    continue
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(w)
            # apply the merge within the word
            i = 0
            new_seq: list[str] = []
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    new_seq.append(new_sym)
                    i += 2
                else:
                    new_seq.append(seq[i])
                    i += 1
            seqs[w] = new_seq
            for x, y in zip(new_seq, new_seq[1:]):
                p = (x, y)
                if p == best_pair:
                    continue
                pair_counts[p] += cnt
                pair_words[p].add(w)

    return BpeModel(vocab=vocab, merges=merges)


def build_encoder(tokenized_docs: list[list[str]]) -> dict[str, int]:
    """Token ids = rank in sorted distinct tokens (flame.py:680-684)."""
    all_tokens = {t for doc in tokenized_docs for t in doc}
    return {t: i for i, t in enumerate(sorted(all_tokens))}
