"""Seeded adversarial fuzz of the GATE expression surfaces: the Spark
column expressions and the DuckDB oracle SQL are two independent
implementations of the same contract (norm text, word tokens, MUFI
fold, phonetic reduction), evaluated by two different regex/collation
engines (Java vs RE2/utf8proc). The committed corpora exercise the
medieval-Latin document domain; this fuzz hammers the same contract
with adversarial strings from that domain — whitespace variants,
MUFI codepoints, combining marks, regex metacharacters, quotes —
so an engine-semantics divergence (like Java \\s matching \\x0b where
RE2 does not, found in round 3) surfaces as a test failure instead of
a silent gate mismatch on some future corpus.

The alphabet deliberately stays within the engine's documented
document domain (Latin + MUFI + digits + punctuation + whitespace);
divergences outside it (e.g. Java's context-sensitive final-sigma
lowercasing vs utf8proc's context-free mapping) are out of contract.
"""

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from flame_spark.constants import MUFI_CHAR_MAPPINGS
from flame_spark.textops import norm_text_col, word_tokens_col

POOLS = [
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    " \t\n\x0b\f\r",                       # the explicit whitespace class
    "\xa0   　",        # unicode whitespace OUTSIDE it
    "".join(list(MUFI_CHAR_MAPPINGS)[:24]),  # MUFI 1-to-many sources
    "æœßéüñçāē",  # latin ext
    "́̈̃",                  # combining marks
    ".^$*+?()[]{}|\\'\"%_-:;!#&/@",        # regex + SQL metacharacters
]


def _fuzz_texts(n: int = 1200, seed: int = 7) -> list[str]:
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n):
        length = int(rng.integers(0, 60))
        chars = []
        for _ in range(length):
            pool = POOLS[int(rng.integers(0, len(POOLS)))]
            chars.append(pool[int(rng.integers(0, len(pool)))])
        texts.append("".join(chars))
    # pinned adversarial cases on top of the random draw
    texts += [
        "", " ", "\t", "\x0b", "\xa0", "\t a \x0b b \r",
        "\x0bleading VT", "trailing VT\x0b", "  double  spaces  ",
        "'quoted' %like_% [class]", "áë",
    ]
    return texts


def _duck(texts: list[str]):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="string")}
        ),
    )
    return con


def _spark_df(spark, texts: list[str]):
    return spark.createDataFrame(
        list(zip(range(len(texts)), texts)), "doc_id long, text string"
    )


def _collect(df, col):
    return {r["doc_id"]: r[col] for r in df.collect()}


def test_norm_and_tokens_surfaces_agree(spark):
    from flame_spark.queries import _NORM_SQL, _TOKS_SQL

    texts = _fuzz_texts()
    con = _duck(texts)
    sdf = _spark_df(spark, texts)

    got = _collect(
        sdf.select("doc_id", norm_text_col(F.col("text")).alias("n")), "n"
    )
    want = {
        int(d): n
        for d, n in con.sql(
            f"SELECT doc_id, {_NORM_SQL} AS n FROM documents"
        ).fetchall()
    }
    bad = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not bad, f"norm divergence on {len(bad)} strings: {list(bad.items())[:5]}"

    got_t = _collect(
        sdf.select("doc_id", word_tokens_col(F.col("text")).alias("t")), "t"
    )
    want_t = {
        int(d): t
        for d, t in con.sql(
            f"SELECT doc_id, {_TOKS_SQL} AS t FROM documents"
        ).fetchall()
    }
    bad = {
        d: (got_t[d], want_t[d])
        for d in want_t
        if list(got_t[d]) != list(want_t[d])
    }
    assert not bad, f"token divergence on {len(bad)}: {list(bad.items())[:5]}"


def test_mufi_and_phonetic_surfaces_agree(spark):
    from flame_spark.queries import (
        PHONETIC_ALPHABET,
        PHONETIC_DST,
        PHONETIC_SRC,
        SQL_P2_MUFI_FOLD,
        SQL_P7_PHONETIC,
    )

    texts = _fuzz_texts(seed=11)
    con = _duck(texts)
    sdf = _spark_df(spark, texts)

    col = norm_text_col(F.col("text"))
    for src, dst in MUFI_CHAR_MAPPINGS.items():
        col = F.replace(col, F.lit(src), F.lit(dst))
    got = _collect(sdf.select("doc_id", col.alias("folded")), "folded")
    want = {int(d): v for d, v in con.sql(SQL_P2_MUFI_FOLD).fetchall()}
    bad = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not bad, f"mufi divergence on {len(bad)}: {list(bad.items())[:5]}"

    pcol = F.translate(norm_text_col(F.col("text")), PHONETIC_SRC, PHONETIC_DST)
    pcol = F.regexp_replace(pcol, f"[^{PHONETIC_ALPHABET} ]", " ")
    got_p = _collect(sdf.select("doc_id", pcol.alias("p")), "p")
    want_p = {int(d): v for d, v in con.sql(SQL_P7_PHONETIC).fetchall()}
    bad = {d: (got_p[d], want_p[d]) for d in want_p if got_p[d] != want_p[d]}
    assert not bad, f"phonetic divergence on {len(bad)}: {list(bad.items())[:5]}"
