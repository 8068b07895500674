"""Character-level text normalization (reference parity, Arrow-friendly).

Reproduces the reference's preprocessing stack in its exact order
(reference: flame.py:416-512):

  1. whitespace canonicalization  (flame.py:396  — strip + collapse runs)
  2. lowercase                    (flame.py:433)
  3. 1-to-many MUFI ligature replacement, fixed dict order (flame.py:435-447)
  4. optional bigram normalization, rule dict order (flame.py:449-462)
  5. adaptive 1-to-1 char LUT: target alphabet + 1-to-1 MUFI seeds +
     NFKD-learned rules at min_freq over the whole corpus
     (flame.py:161-271, :464-480); out-of-alphabet -> ' '
  6. optional phonetic reduction (flame.py:482-512)

All heavy paths are NumPy LUT gathers over utf-16le codepoint arrays —
the same vectorized trick the reference uses (flame.py:28-56, :175-196) —
applied per Arrow batch inside pandas UDFs, never per Python row.

Known, documented deviation: the reference learns adaptive rules over
``"\\n".join(corpus)`` (flame.py:464), so the separator '\\n' appears
n_docs-1 times in its lost-char histogram. '\\n' can never generate a
rule (NFKD('\\n')[0] == '\\n', not in any alphabet), so we histogram
per-document text only; learned rules are identical.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from .constants import (
    DEFAULT_ALPHABET,
    DEFAULT_BIGRAM_RULES,
    DEFAULT_PHONETIC_ALPHABET,
    DEFAULT_PHONETIC_RULES,
    MUFI_CHAR_MAPPINGS,
)

_WS_RE = re.compile(r"\s+")

ONE_TO_MANY = {k: v for k, v in MUFI_CHAR_MAPPINGS.items() if len(v) > 1}
ONE_TO_ONE = {k: v for k, v in MUFI_CHAR_MAPPINGS.items() if len(v) == 1}


def parse_rules(rules_str: str) -> dict[str, str]:
    """Parse 'src>dst,src>dst' rule strings (flame.py:305-366 semantics).

    Multi-char sources allowed (bigram rules); dst must be one char.
    Invalid rules are skipped silently (the reference warns + skips).
    """
    mapping: dict[str, str] = {}
    if not rules_str or not rules_str.strip():
        return mapping
    for rule in rules_str.split(","):
        rule = rule.strip()
        if not rule:
            continue
        parts = rule.split(">")
        if len(parts) != 2:
            continue
        src, dst = parts[0].strip(), parts[1].strip()
        if len(src) < 1 or len(dst) != 1:
            continue
        mapping[src] = dst
    return mapping


def canonicalize_whitespace(text: str) -> str:
    """strip + collapse internal whitespace runs to single spaces
    (flame.py:396)."""
    return _WS_RE.sub(" ", text.strip())


def stage1_normalize(
    text: str,
    bigram_rules: dict[str, str] | None = None,
) -> str:
    """lowercase -> MUFI 1-to-many -> optional bigram rules, in reference
    order (flame.py:433-462). Pure function; safe in executors."""
    text = text.lower()
    for src, dst in ONE_TO_MANY.items():
        text = text.replace(src, dst)
    if bigram_rules:
        for src, dst in bigram_rules.items():
            text = text.replace(src, dst)
    return text


def build_lut(
    alphabet: str, mapping: dict[str, str], unknown_chr: str = " "
) -> np.ndarray:
    """2^16-entry uint16 char LUT (flame.py:175-184, :210-216).

    Every BMP codepoint maps to unknown, except alphabet chars (identity)
    and explicit mapping entries. Astral chars arrive as utf-16le
    surrogate pairs and map to two unknowns — identical to the reference.
    """
    lut = np.full(1 << 16, ord(unknown_chr), dtype=np.uint16)
    lut[ord(unknown_chr)] = ord(unknown_chr)
    for c in alphabet:
        lut[ord(c)] = ord(c)
    for src, dst in mapping.items():
        lut[ord(src)] = ord(dst)
    return lut


def apply_lut(text: str, lut: np.ndarray) -> str:
    """Vectorized LUT gather over utf-16le codepoints (flame.py:195-196)."""
    codes = np.frombuffer(text.encode("utf-16le"), dtype=np.uint16)
    return lut[codes].tobytes().decode("utf-16le")


def lost_char_counts(text: str, lut: np.ndarray, unknown_chr: str = " ") -> Counter:
    """Histogram of chars the LUT maps to unknown (flame.py:227-239).

    The unknown char itself is excluded.
    """
    codes = np.frombuffer(text.encode("utf-16le"), dtype=np.uint16)
    unk = ord(unknown_chr)
    mapped = lut[codes]
    lost = codes[(mapped == unk) & (codes != unk)]
    vals, counts = np.unique(lost, return_counts=True)
    return Counter({chr(int(v)): int(c) for v, c in zip(vals, counts)})


def learn_nfkd_rules(
    lost: Counter, alphabet: str, min_freq: int = 1
) -> dict[str, str]:
    """NFKD first-char adaptive rules at min_freq (flame.py:241-271).

    Iteration order (count desc) does not affect the result set — each
    char's rule is independent — but we keep it for parity.
    """
    rules: dict[str, str] = {}
    for char, count in sorted(lost.items(), key=lambda kv: kv[1], reverse=True):
        if count >= min_freq:
            seq = unicodedata.normalize("NFKD", char)
            if seq:
                norm = seq[0]
                if norm in alphabet and norm != char:
                    rules[char] = norm
    return rules


@dataclass
class NormArtifacts:
    """Broadcastable normalization artifacts (driver-learned, tiny)."""

    alphabet: str = DEFAULT_ALPHABET
    bigram_enabled: bool = False
    bigram_rules: dict[str, str] = field(default_factory=dict)
    learned_rules: dict[str, str] = field(default_factory=dict)
    phonetic_enabled: bool = False
    phonetic_alphabet: str = DEFAULT_PHONETIC_ALPHABET
    phonetic_rules: dict[str, str] = field(default_factory=dict)
    unknown_chr: str = " "

    def main_lut(self) -> np.ndarray:
        mapping = dict(ONE_TO_ONE)
        mapping.update(self.learned_rules)
        return build_lut(self.alphabet, mapping, self.unknown_chr)

    def phonetic_lut(self) -> np.ndarray | None:
        if not self.phonetic_enabled:
            return None
        alphabet = self.phonetic_alphabet.replace(" ", "")
        rules = {
            s: d for s, d in self.phonetic_rules.items() if d in alphabet
        }
        return build_lut(alphabet, rules, self.unknown_chr)

    def normalize(self, text: str) -> str:
        """Full normalization of one whitespace-canonical document."""
        text = stage1_normalize(
            text, self.bigram_rules if self.bigram_enabled else None
        )
        text = apply_lut(text, self.main_lut())
        plut = self.phonetic_lut()
        if plut is not None:
            text = apply_lut(text, plut)
        return text


def default_artifacts(
    bigram_enabled: bool = False,
    phonetic_enabled: bool = False,
    alphabet: str = DEFAULT_ALPHABET,
) -> NormArtifacts:
    """Static artifacts (no corpus-learned rules) — SQL-expressible mode."""
    return NormArtifacts(
        alphabet=alphabet,
        bigram_enabled=bigram_enabled,
        bigram_rules=parse_rules(DEFAULT_BIGRAM_RULES) if bigram_enabled else {},
        phonetic_enabled=phonetic_enabled,
        phonetic_rules=parse_rules(DEFAULT_PHONETIC_RULES)
        if phonetic_enabled
        else {},
    )


def learn_artifacts_local(
    stage1_texts: list[str],
    alphabet: str = DEFAULT_ALPHABET,
    min_freq: int = 1,
    bigram_enabled: bool = False,
    phonetic_enabled: bool = False,
) -> NormArtifacts:
    """Single-process artifact learning (oracle path; flame.py:464-480)."""
    art = default_artifacts(bigram_enabled, phonetic_enabled, alphabet)
    seed_lut = build_lut(alphabet, dict(ONE_TO_ONE), art.unknown_chr)
    lost: Counter = Counter()
    for t in stage1_texts:
        lost.update(lost_char_counts(t, seed_lut, art.unknown_chr))
    art.learned_rules = learn_nfkd_rules(lost, alphabet, min_freq)
    return art
