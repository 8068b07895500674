"""Exact Mersenne-61 modular arithmetic + LNO-gram polynomial hashing.

Reproduces the reference's leave-n-out-gram fingerprint bit-for-bit
(reference: flame.py:710-739): for window size ``n`` and ``n_out`` dropped
positions, every combination of ``k = n - n_out`` kept positions (in
``itertools.combinations`` order) over every window start yields

    hash = sum_{p=0..k-1} (V^p mod M) * t[s + c_p]   (mod M)

with ``V`` = vocabulary size and ``M = 2^61 - 1``, computed in EXACT
integer arithmetic. The reference uses object-dtype Python ints
(flame.py:735-736); here the same values are produced with branch-free
uint64 NumPy arithmetic (split-multiply reduction for the Mersenne
prime), which vectorises across windows — no Python-int hot loop.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

from .constants import MOD

_MASK31 = (1 << 31) - 1
_MASK30 = (1 << 30) - 1
_U64 = np.uint64


def _reduce61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values (< 2^63) mod 2^61-1."""
    m = _U64(MOD)
    x = (x & m) + (x >> _U64(61))
    x = (x & m) + (x >> _U64(61))
    return x - (x >= m).astype(_U64) * m


def mulmod61(a, b):
    """(a * b) mod (2^61 - 1) for uint64 arrays/scalars with a, b < 2^61-1.

    Standard Mersenne-prime split multiply: a = a1*2^31 + a0,
    b = b1*2^31 + b0; uses 2^61 === 1 (mod M) so 2^62 === 2 and
    mid*2^31 === (mid>>30) + ((mid & (2^30-1)) << 31).
    Every intermediate fits in uint64.
    """
    a = np.asarray(a, dtype=_U64)
    b = np.asarray(b, dtype=_U64)
    a1 = a >> _U64(31)
    a0 = a & _U64(_MASK31)
    b1 = b >> _U64(31)
    b0 = b & _U64(_MASK31)
    # a1*b1*2^62 mod M  ==  a1*b1*2 mod M   (a1,b1 < 2^30 -> product < 2^60)
    hi = _reduce61(a1 * b1 * _U64(2))
    # (a1*b0 + a0*b1) * 2^31 mod M
    mid = a1 * b0 + a0 * b1  # < 2^62, fits
    mid = _reduce61((mid >> _U64(30)) + ((mid & _U64(_MASK30)) << _U64(31)))
    lo = _reduce61(a0 * b0)  # < 2^62
    return _reduce61(hi + mid + lo)


def powmod61(base: int, exp: int) -> int:
    """base^exp mod 2^61-1 (exact, Python ints)."""
    return pow(int(base) % MOD, int(exp), MOD)


def lno_combinations(ngram: int, n_out: int) -> list[tuple[int, ...]]:
    """Kept-position combinations in itertools order (flame.py:729)."""
    keep = ngram - n_out
    return list(combinations(range(ngram), keep))


def lno_gram_hashes(
    token_ids: np.ndarray, vocab_size: int, ngram: int, n_out: int
) -> np.ndarray:
    """All LNO-gram feature hashes for one document's token-id sequence.

    Returns an int64 array, combo-major then window-major, exactly the
    concatenation order of the reference (flame.py:729-739). Documents
    with fewer than ``ngram`` tokens yield an empty array
    (flame.py:717-718).
    """
    keep = ngram - n_out
    ids = np.asarray(token_ids, dtype=np.int64)
    seq_len = ids.shape[0]
    if keep < 1 or seq_len < ngram or vocab_size == 0:
        return np.array([], dtype=np.int64)

    num_windows = seq_len - ngram + 1
    # windows[w, p] = ids[w + p]
    windows = np.lib.stride_tricks.sliding_window_view(ids, ngram)
    u = windows.astype(_U64)

    out = np.empty((0,), dtype=np.int64)
    chunks = []
    for combo in lno_combinations(ngram, n_out):
        acc = np.zeros(num_windows, dtype=_U64)
        for p, c in enumerate(combo):
            power = _U64(powmod61(vocab_size, p))
            acc = _reduce61(acc + mulmod61(power, u[:, c]))
        chunks.append(acc.astype(np.int64))
    if chunks:
        out = np.concatenate(chunks)
    return out


def powers_mod61(base: int, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod 2^61-1 as uint64.

    Built by doubling (powers[f+t] = powers[f] * powers[t]) — O(log n)
    vectorised mulmod passes, no per-element Python loop.
    """
    powers = np.empty(max(n, 1), dtype=_U64)
    powers[0] = 1
    basep = _U64(int(base) % MOD)
    filled = 1
    while filled < n:
        pf = mulmod61(powers[filled - 1], basep)  # powers[filled]
        take = min(filled, n - filled)
        powers[filled : filled + take] = mulmod61(pf, powers[:take])
        filled += take
    return powers[:n]


def summod61(terms: np.ndarray) -> int:
    """Exact sum mod 2^61-1 of uint64 values already < 2^61-1."""
    x = np.asarray(terms, dtype=_U64)
    while x.shape[0] > 1:
        if x.shape[0] % 2:
            x = np.concatenate([x, np.zeros(1, dtype=_U64)])
        x = _reduce61(x[0::2] + x[1::2])  # each addend < M -> sum < 2^62
    return int(x[0]) % MOD if x.shape[0] else 0


def polynomial_hash_codes(codes: np.ndarray, base: int = 1_000_003) -> int:
    """Rolling polynomial hash of a codepoint array mod 2^61-1.

    Used for document fingerprinting: h = sum codes[i] * base^i mod M.
    Exact; fully vectorised in uint64.
    """
    codes = np.asarray(codes, dtype=_U64)
    n = codes.shape[0]
    if n == 0:
        return 0
    powers = powers_mod61(base, n)
    return summod61(mulmod61(powers, codes))


def fingerprint_text(text: str, base: int = 1_000_003) -> int:
    """Deterministic document fingerprint: polynomial hash of codepoints."""
    codes = np.frombuffer(text.encode("utf-32le"), dtype=np.uint32)
    return polynomial_hash_codes(codes.astype(np.uint64), base=base)
