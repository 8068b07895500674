"""Unit tests for exact Mersenne-61 arithmetic + LNO-gram hashing
(SURVEY.md §5.2 layer 2: hash vs hand-computed / object-arithmetic values)."""

from itertools import combinations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from flame_spark.constants import MOD
from flame_spark.hashing import (
    lno_combinations,
    lno_gram_hashes,
    mulmod61,
    polynomial_hash_codes,
    powers_mod61,
    summod61,
)


@given(st.integers(0, MOD - 1), st.integers(0, MOD - 1))
@settings(max_examples=500)
def test_mulmod61_exact(a, b):
    assert int(mulmod61(np.uint64(a), np.uint64(b))) == (a * b) % MOD


def test_powers_mod61():
    for base in [2, 7, 50021, MOD - 1]:
        assert powers_mod61(base, 300).tolist() == [
            pow(base, i, MOD) for i in range(300)
        ]


@given(st.lists(st.integers(0, MOD - 1), min_size=0, max_size=100))
@settings(max_examples=200)
def test_summod61(xs):
    assert summod61(np.array(xs, dtype=np.uint64)) == sum(xs) % MOD


def _reference_lno(ids, V, ngram, n_out):
    """Object-dtype exact arithmetic, lifted semantics of flame.py:710-739."""
    ids = np.array(ids, dtype=np.int64)
    keep = ngram - n_out
    if keep < 1 or len(ids) < ngram or V == 0:
        return []
    num = len(ids) - ngram + 1
    mat = np.array([ids[i : i + num] for i in range(ngram)], dtype=np.int64)
    out = []
    for combo in combinations(range(ngram), keep):
        sub = mat[list(combo), :]
        powers = np.power(V, np.arange(len(combo)), dtype=object) % MOD
        out.extend(np.mod(np.dot(powers, sub), MOD).tolist())
    return out


def test_lno_hand_example():
    # V=7, n=3, n_out=1, tokens [1,2,3,4]: combos (0,1),(0,2),(1,2)
    got = lno_gram_hashes(np.array([1, 2, 3, 4]), 7, 3, 1)
    exp = _reference_lno([1, 2, 3, 4], 7, 3, 1)
    assert got.tolist() == exp
    # combo-major concat: combo (0,1) over both windows first.
    # window [1,2,3] combo (0,1): 1+7*2=15; window [2,3,4]: 2+7*3=23
    assert exp[0] == 15 and exp[1] == 23
    # combo (0,2): window [1,2,3] keeps (t0,t2): 1+7*3=22
    assert exp[2] == 22


@given(
    st.integers(2, 7),
    st.integers(0, 3),
    st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=25),
    st.sampled_from([7, 1000, 2**31 - 1, MOD - 2]),
)
@settings(max_examples=150, deadline=None)
def test_lno_matches_object_arithmetic(ngram, n_out, ids, V):
    if n_out >= ngram:
        n_out = ngram - 1
    ids = [i % min(V, 2**31 - 1) for i in ids]
    got = lno_gram_hashes(np.array(ids, dtype=np.int64), V, ngram, n_out)
    assert got.tolist() == _reference_lno(ids, V, ngram, n_out)


def test_lno_short_doc_yields_empty():
    assert lno_gram_hashes(np.array([1, 2]), 10, 6, 1).size == 0
    assert lno_gram_hashes(np.array([], dtype=np.int64), 10, 3, 0).size == 0


def test_lno_combination_order():
    assert lno_combinations(4, 2) == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def test_polynomial_hash_exact():
    codes = np.array([104, 101, 108, 108, 111], dtype=np.uint64)
    base = 1_000_003
    exp = sum(int(c) * pow(base, i, MOD) for i, c in enumerate(codes)) % MOD
    assert polynomial_hash_codes(codes, base) == exp


# -- vectorized batch fingerprint == scalar rolling hash ----------------------
#
# textops._fingerprint_udf hashes a WHOLE Arrow batch in one vectorized
# pass (concatenated codepoint buffer + np.add.reduceat segment sums);
# the gate checks it end-to-end against the oracle, but the property
# worth pinning directly is bit-identity with the scalar per-document
# hash over every adversarial BATCH shape the concatenation/reduceat
# layout can get wrong: empty batch, all-empty docs, empty docs in the
# middle and (the reduceat sentinel case) at the END of the batch,
# nulls, astral-plane codepoints, and docs of wildly mixed lengths.


def _scalar_fp(t: str) -> int:
    codes = np.frombuffer((t or "").encode("utf-32le"), dtype=np.uint32)
    return polynomial_hash_codes(codes.astype(np.uint64))


def _vec_fp(texts):
    import pandas as pd

    from flame_spark.textops import _fingerprint_udf

    # .func = the raw batch kernel under the @pandas_udf wrapper
    kernel = _fingerprint_udf.func
    return [int(v) for v in kernel(pd.Series(texts, dtype=object))]


def test_fingerprint_vectorized_adversarial_shapes():
    batches = [
        [],
        [""],
        ["", "", ""],
        ["a"],
        ["abc", "", "def"],          # empty in the middle
        ["abc", "def", ""],          # trailing empty (reduceat sentinel)
        ["", "abc"],                 # leading empty
        [None, "abc", None],         # nulls -> empty-doc hash 0
        ["\U0001F600\U00010348", "x" * 5000, "é"],  # astral + long + BMP
        ["x" * 1, "y" * 997, "z" * 13, ""],
    ]
    for texts in batches:
        got = _vec_fp(texts)
        want = [_scalar_fp(t) for t in texts]
        assert got == want, texts


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    min_codepoint=0, max_codepoint=0x10FFFF,
                    blacklist_categories=("Cs",),  # no lone surrogates
                ),
                max_size=64,
            ),
        ),
        max_size=16,
    )
)
def test_fingerprint_vectorized_matches_scalar(texts):
    assert _vec_fp(texts) == [_scalar_fp(t) for t in texts]
