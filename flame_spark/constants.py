"""Frozen numeric constants shared by the Spark engine and the NumPy oracle.

These pin the semantics the engine must reproduce rank-identically:

- ``MOD`` and the polynomial rolling hash base follow the reference's
  leave-n-out-gram fingerprint (reference: flame.py:710-739 — hash in
  Z_(2^61-1), base = vocabulary size, exact integer arithmetic).
- TF-IDF uses sklearn ``TfidfTransformer`` defaults (reference:
  flame.py:793-807): idf(t) = ln((1+N)/(1+df_t)) + 1, w = tf*idf,
  row-L2-normalised.
- BM25 parameters are defined by this project (the reference has no query
  operator); they are frozen here so the oracle, the Spark engine and the
  DuckDB oracle SQL all agree: k1=1.2, b=0.75,
  idf = ln((N - df + 0.5)/(df + 0.5) + 1), dl = number of index terms in
  the document (0 allowed), avgdl = mean dl over ALL docs, query-term
  multiplicity multiplies the contribution.
"""

# Mersenne prime modulus for the LNO-gram polynomial rolling hash
# (reference: flame.py:712  MOD = 2**61 - 1).
MOD = (1 << 61) - 1

# BM25 (project-defined; no reference analog).
BM25_K1 = 1.2
BM25_B = 0.75

# Default MUFI ligature / medieval-character mappings
# (reference: flame.py:435-440). Order is load-bearing: replacements are
# applied sequentially in this dict order.
MUFI_CHAR_MAPPINGS = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ĳ": "ij", "ð": "dh", "þ": "th",
    "ﬁ": "fi", "ﬂ": "fl", "ﬃ": "ffi", "ﬄ": "ffl", "ﬆ": "st",
    "ſ": "s", "ꝇ": "l", "ꝑ": "p", "ꝛ": "r", "ƿ": "w", "ᵹ": "g",
    "ꝺ": "d", "ꝼ": "f",
}

# Special tokens used by the BPE tokenizer (reference: flame.py:546-549).
BPE_SPECIAL_TOKENS = ["[UNK]", "[PAD]", "[CLS]", "[SEP]", "[MASK]"]
BPE_UNK = "[UNK]"

# Segment format: postings are delta-gap + varbyte encoded in blocks of
# this many documents, with one block-max score annotation per block.
BLOCK_SIZE = 128

# Default engine parameters mirroring the reference CLI defaults
# (reference: flame.py:273-305 DEFAULT_PARAMS).
DEFAULT_NGRAM = 6
DEFAULT_N_OUT = 1
DEFAULT_MIN_TEXT_LENGTH = 150
DEFAULT_KEEP_TEXTS = 10000
DEFAULT_ALPHABET = "abcdefghijklmnopqrstuvwxyz"
DEFAULT_PHONETIC_ALPHABET = "aefiklmnopqrstuwxz"
DEFAULT_PHONETIC_RULES = "b>p,c>k,d>t,g>k,j>i,q>k,v>f,y>i,z>s"
DEFAULT_BIGRAM_RULES = (
    "ss>s,ff>f,tt>t,ll>l,ie>i,au>u,ei>i,eu>u,oh>o,ah>a,eh>e,uh>u"
)
DEFAULT_VOCAB_MIN_WORD_FREQ = 5
DEFAULT_VOCAB_COVERAGE = 0.85
