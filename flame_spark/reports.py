"""Report-path operators: pairwise alignment + summary semantics
(SURVEY §2 S8/S9, F4/F5, P9/P10, A6, U3, O6).

The reference renders these to HTML/TSV files (flame.py:917-1314); the
distributed engine exposes the same information as DataFrames — the
alignment work (difflib ``SequenceMatcher``, ``autojunk=False``, the
exact reference matcher, flame.py:875) runs in ``applyInPandas`` over
the tiny post-threshold pair set only (the reference applies the same
filter-before-align optimization, flame.py:1287-1288).

Documented deviations (reference deps unavailable in this env):
- display tokens: NLTK ``word_tokenize`` -> regex ``\\w+|[^\\w\\s]``
  (word runs / single punct marks); the alnum-lowercase filter on top
  is identical (flame.py:1293-1294);
- ``rapidfuzz.fuzz.ratio`` -> exact indel-distance ratio implemented
  here: ratio = (1 - (la+lb-2*LCS)/(la+lb)) * 100, which is the
  definition rapidfuzz computes.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_DISPLAY_TOK_RE = re.compile(r"\w+|[^\w\s]")
_YEAR_RE = re.compile(r"(?<!\d)(1\d{3}|2\d{3})(?!\d)")


def display_tokens(text: str) -> list[str]:
    return _DISPLAY_TOK_RE.findall(text or "")


def analysis_tokens(tokens: list[str]) -> list[str]:
    """Lowercased alphanumeric display tokens (flame.py:856-859)."""
    return [t.lower() for t in tokens if t.isalnum()]


def lcs_len(a: str, b: str) -> int:
    """Exact longest-common-subsequence length (NumPy DP rows)."""
    if not a or not b:
        return 0
    prev = np.zeros(len(b) + 1, dtype=np.int32)
    for ca in a:
        cur = np.zeros_like(prev)
        bs = np.frombuffer(b.encode("utf-32le"), dtype=np.uint32)
        match = bs == ord(ca)
        # row DP (python loop over b — strings here are short gap words)
        for j in range(1, len(b) + 1):
            if match[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return int(prev[-1])


def fuzz_ratio(a: str, b: str) -> float:
    """Indel-based similarity in [0, 100] (rapidfuzz.fuzz.ratio
    semantics: 1 - indel_distance/(len_a+len_b))."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    return (1.0 - (la + lb - 2 * lcs_len(a, b)) / (la + lb)) * 100.0


def extract_year(name: str) -> int:
    """Year from a document name (flame.py:819-824); default 9999."""
    m = _YEAR_RE.search(name or "")
    return int(m.group(1)) if m else 9999


def year_col(name_col):
    """P10 as a JVM expression."""
    y = F.regexp_extract(name_col, r"(?<!\d)(1\d{3}|2\d{3})(?!\d)", 1)
    return F.when(y == "", F.lit(9999)).otherwise(y.cast("int"))


def long_matching_blocks(tokens_i: list[str], tokens_j: list[str], min_len: int = 5) -> list[str]:
    """Matching blocks longer than 4 tokens (flame.py:1262-1265),
    detokenized by space join."""
    sm = SequenceMatcher(None, tokens_i, tokens_j, autojunk=False)
    out = []
    for a, _, size in sm.get_matching_blocks():
        if size >= min_len:
            out.append(" ".join(tokens_i[a : a + size]))
    return out


def linguistic_variations(
    tokens_i: list[str],
    tokens_j: list[str],
    max_gap: int,
    fuzz_threshold: float,
) -> list[tuple[str, str, str]]:
    """Gap-token classification per pair (flame.py:1296-1311):
    equal-length small gaps -> per-token fuzz classification; unequal ->
    'Different Bridge Word' rows with '-' placeholders."""
    a1 = analysis_tokens(tokens_i)
    a2 = analysis_tokens(tokens_j)
    rows: list[tuple[str, str, str]] = []
    if not a1 or not a2:
        return rows
    sm = SequenceMatcher(None, a1, a2, autojunk=False)
    p1 = p2 = 0
    for a, b, size in sm.get_matching_blocks():
        if size == 0:
            continue
        g1 = a1[p1:a]
        g2 = a2[p2:b]
        if (1 <= len(g1) <= max_gap) or (1 <= len(g2) <= max_gap):
            if len(g1) == len(g2) and len(g1) > 0:
                for t1, t2 in zip(g1, g2):
                    score = fuzz_ratio(t1, t2) / 100.0
                    kind = (
                        "Similar Bridge Word"
                        if score >= fuzz_threshold
                        else "Different Bridge Word"
                    )
                    rows.append((kind, t1, t2))
            else:
                rows.extend(("Different Bridge Word", t1, "-") for t1 in g1)
                rows.extend(("Different Bridge Word", "-", t2) for t2 in g2)
        p1, p2 = a + size, b + size
    return rows


# ---------------------------------------------------------------------------
# distributed report DataFrames
# ---------------------------------------------------------------------------


def _pairs_with_texts(pairs: DataFrame, docs: DataFrame, threshold: float) -> DataFrame:
    """Surviving pairs joined with both documents' texts (J5)."""
    d1 = docs.select(
        F.col("doc_id").alias("doc_i"), F.col("text").alias("text_i")
    )
    d2 = docs.select(
        F.col("doc_id").alias("doc_j"), F.col("text").alias("text_j")
    )
    return (
        pairs.filter(F.col("score") >= threshold)
        .join(d1, "doc_i")
        .join(d2, "doc_j")
    )


def summary_related_docs(
    pairs: DataFrame, docs: DataFrame, threshold: float
) -> DataFrame:
    """S8/A6 semantics: per doc, count + sorted list of related docs and
    the long (>4-token) matching segments, sorted by length desc
    (flame.py:1240-1274). Relations are symmetric (the reference walks
    the full COO matrix, both triangles)."""
    surv = pairs.filter(F.col("score") >= threshold)
    sym = surv.select("doc_i", "doc_j").union(
        surv.select(F.col("doc_j").alias("doc_i"), F.col("doc_i").alias("doc_j"))
    )
    d1 = docs.select(F.col("doc_id").alias("doc_i"), F.col("text").alias("text_i"))
    d2 = docs.select(F.col("doc_id").alias("doc_j"), F.col("text").alias("text_j"))
    joined = sym.join(d1, "doc_i").join(d2, "doc_j")

    def per_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            blocks = long_matching_blocks(
                display_tokens(r["text_i"]), display_tokens(r["text_j"])
            )
            out.append((r["doc_i"], r["doc_j"], blocks))
        return pd.DataFrame(out, columns=["doc_i", "doc_j", "blocks"])

    with_blocks = joined.groupBy("doc_i").applyInPandas(
        per_pair, schema="doc_i long, doc_j long, blocks array<string>"
    )
    return (
        with_blocks.groupBy("doc_i")
        .agg(
            F.count("*").alias("similarity_frequency"),
            F.sort_array(F.collect_list("doc_j")).alias("related_docs"),
            F.array_distinct(F.flatten(F.collect_list("blocks"))).alias("_b"),
        )
        .withColumn(
            "long_similarities",
            F.array_sort(
                F.transform(
                    F.col("_b"),
                    lambda s: F.struct((-F.length(s)).alias("l"), s.alias("s")),
                )
            ).getField("s"),  # length desc (ref flame.py:1270), then lexical
        )
        .drop("_b")
    )


def linguistic_variations_df(
    pairs: DataFrame,
    docs: DataFrame,
    threshold: float,
    max_gap_words: int = 5,
    fuzz_threshold: float = 0.75,
) -> DataFrame:
    """S9 semantics as rows (doc_i, doc_j, variation_type, token_1,
    token_2), i<j (flame.py:1276-1314). Alignment runs per pair batch in
    applyInPandas — only the post-threshold pair set."""
    joined = _pairs_with_texts(pairs, docs, threshold)

    def per_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            toks_i = display_tokens(r["text_i"])
            toks_j = display_tokens(r["text_j"])
            for kind, t1, t2 in linguistic_variations(
                toks_i, toks_j, max_gap_words, fuzz_threshold
            ):
                out.append((r["doc_i"], r["doc_j"], kind, t1, t2))
        return pd.DataFrame(
            out, columns=["doc_i", "doc_j", "variation_type", "token_1", "token_2"]
        )

    return joined.groupBy("doc_i").applyInPandas(
        per_batch,
        schema=(
            "doc_i long, doc_j long, variation_type string, "
            "token_1 string, token_2 string"
        ),
    )
