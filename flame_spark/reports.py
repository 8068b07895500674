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

_YEAR_RE = re.compile(r"(?<!\d)(1\d{3}|2\d{3})(?!\d)")

# Penn-Treebank-style display tokenization (the reference displays
# nltk.word_tokenize tokens, flame.py:856-865; nltk is absent in this
# sandbox). The PTB rules below are the public tokenizer.sed behavior:
# punctuation split-off, quote conversion to ``/'', contraction clitic
# splitting ('s n't 'll 're 've 'm 'd), special bi-words (cannot,
# gonna...). nltk.word_tokenize is Punkt sentence splitting THEN
# Treebank per sentence; _sentences below is a rule-based Punkt
# approximation (boundary = terminal [.?!] + space + capital/digit
# start, vetoed after known abbreviations, initials, and dotted
# acronyms), so mid-string sentence-final periods detach exactly as
# nltk does on the tested canonical behaviors. Residual deviation:
# corpus-adaptive Punkt abbreviation discovery (unsupervised training)
# is approximated by the fixed veto list — report-only.
_PTB_RULES = [
    (re.compile(r'^\"'), r"`` "),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r'([ \(\[{<])(\"|\'{2})'), r"\1 `` "),
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
    (re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
    (re.compile(r'"'), r" '' "),
    (re.compile(r"(\S)('')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]
_PTB_WORDS = [
    (re.compile(r"\b(can)(?#X)(not)\b", re.IGNORECASE), r" \1 \2 "),
    (re.compile(r"\b(gim)(?#X)(me)\b", re.IGNORECASE), r" \1 \2 "),
    (re.compile(r"\b(gon)(?#X)(na)\b", re.IGNORECASE), r" \1 \2 "),
    (re.compile(r"\b(got)(?#X)(ta)\b", re.IGNORECASE), r" \1 \2 "),
    (re.compile(r"\b(lem)(?#X)(me)\b", re.IGNORECASE), r" \1 \2 "),
    (re.compile(r"\b(wan)(?#X)(na)\b", re.IGNORECASE), r" \1 \2 "),
]


# Punkt's pretrained English model treats these (case-insensitively)
# as non-breaking abbreviations; the list covers the common ones so a
# following capitalized word does not start a new sentence.
_PUNKT_ABBREVS = frozenset(
    """mr mrs ms dr prof rev fr gen sen rep gov pres hon st jr sr vs
    etc e.g i.e cf al inc ltd co corp dept univ est approx no vol fig
    p pp ed eds trans ca""".split()
)
# candidate boundary: sentence-terminal punctuation (+ closing quotes/
# brackets) then whitespace then a capital or digit (optionally behind
# opening quotes/brackets)
_SENT_BOUND = re.compile(r'[.?!]+["\')\]]*\s+(?=["\'(\[]*[A-Z0-9])')
_DOTTED_ACRONYM = re.compile(r"^(?:[A-Za-z]\.)+[A-Za-z]?$")


def _sentences(text: str) -> list[str]:
    """Rule-based Punkt approximation: split at terminal [.?!] followed
    by whitespace and a capitalized/numeric sentence start, except when
    the period belongs to a known abbreviation, a single-letter
    initial, or a dotted acronym ("Mr.", "J.", "U.S.")."""
    out, start = [], 0
    for m in _SENT_BOUND.finditer(text):
        seg = text[start : m.end()].rstrip()
        if "." in m.group(0):
            # the word carrying the candidate period
            stripped = seg.rstrip('.?!"\')]')
            word = stripped.rsplit(None, 1)[-1] if stripped.split() else ""
            bare = word.rstrip(".").lower()
            if (
                bare in _PUNKT_ABBREVS
                or len(bare) == 1
                or _DOTTED_ACRONYM.match(word + ".")
            ):
                continue
        out.append(seg)
        start = m.end()
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    return out or [text]


def display_tokens(text: str) -> list[str]:
    """nltk.word_tokenize-style tokens for the alignment reports:
    Punkt-approximate sentence split, then the PTB rules per sentence
    (the same composition as nltk's word_tokenize)."""
    toks: list[str] = []
    for sent in _sentences(text or ""):
        t = " " + sent + " "
        for rx, rep in _PTB_RULES:
            t = rx.sub(rep, t)
        for rx, rep in _PTB_WORDS:
            t = rx.sub(rep, t)
        toks.extend(t.split())
    return toks


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
# HTML comparison report (S6; flame.py:917-1222 semantics, compact CSS)
# ---------------------------------------------------------------------------

_HTML_HEAD = """<!DOCTYPE html><html><head><meta charset="utf-8">
<style>
.pair{border:1px solid #ccc;margin:12px;padding:8px;font-family:serif}
.meta{color:#666;font-size:90%%}
.highlight{background:#ffe08a}
.match-text{background:#cde8ff}
.bridge-words{background:#e8ffe0}
td{vertical-align:top;width:50%%;padding:4px}
</style></head><body>
"""


def _render_pair_html(
    tokens_i: list[str],
    tokens_j: list[str],
    max_gap_words: int,
) -> tuple[str, str]:
    """Aligned HTML for one pair: matching blocks highlighted, small
    gaps marked as bridge words (flame.py:905-915 structure, simplified
    rendering: detokenize == space join)."""
    a1, a2 = analysis_tokens(tokens_i), analysis_tokens(tokens_j)
    if not a1 or not a2:
        return " ".join(tokens_i), " ".join(tokens_j)
    map1 = [i for i, t in enumerate(tokens_i) if t.isalnum()]
    map2 = [i for i, t in enumerate(tokens_j) if t.isalnum()]
    sm = SequenceMatcher(None, a1, a2, autojunk=False)
    out1, out2 = [], []
    pos1 = pos2 = 0
    for a, b, size in sm.get_matching_blocks():
        if size == 0:
            continue
        a_s, b_s = map1[a], map2[b]
        a_e, b_e = map1[a + size - 1] + 1, map2[b + size - 1] + 1
        if pos1 < a_s or pos2 < b_s:
            g1, g2 = tokens_i[pos1:a_s], tokens_j[pos2:b_s]
            w1 = [t for t in g1 if t.isalnum()]
            w2 = [t for t in g2 if t.isalnum()]
            bridge = (
                len(w1) <= max_gap_words
                and len(w2) <= max_gap_words
                and len(w1) + len(w2) > 0
            )
            cls = "bridge-words" if bridge else ""
            if g1:
                out1.append(f'<span class="{cls}">{" ".join(g1)}</span>')
            if g2:
                out2.append(f'<span class="{cls}">{" ".join(g2)}</span>')
        out1.append(f'<span class="highlight">{" ".join(tokens_i[a_s:a_e])}</span>')
        out2.append(f'<span class="match-text">{" ".join(tokens_j[b_s:b_e])}</span>')
        pos1, pos2 = a_e, b_e
    if pos1 < len(tokens_i):
        out1.append(" ".join(tokens_i[pos1:]))
    if pos2 < len(tokens_j):
        out2.append(" ".join(tokens_j[pos2:]))
    return " ".join(out1), " ".join(out2)


def render_comparison_html(
    pairs: DataFrame,
    docs: DataFrame,
    threshold: float,
    out_dir: str,
    max_gap_words: int = 5,
    max_file_size: int = 20 * 1024 * 1024,
    name_col: str | None = None,
) -> list[str]:
    """Write the pairwise comparison report, 20MB-chunked
    (flame.py:918, :1207-1214). Pairs are sorted by score desc
    (flame.py:1172); within a pair the older document (year from the
    name, default 9999; flame.py:1186-1191) renders on the left — falls
    back to doc_id when no name column exists. Driver-side render of the
    (small) post-threshold pair set. Returns written file paths."""
    import html
    import os

    sel = ["doc_id", "text"] + ([name_col] if name_col else [])
    d = docs.select(*sel)
    surv = (
        pairs.filter(F.col("score") >= threshold)
        .join(
            d.select(
                F.col("doc_id").alias("doc_i"),
                F.col("text").alias("text_i"),
                *([F.col(name_col).alias("name_i")] if name_col else []),
            ),
            "doc_i",
        )
        .join(
            d.select(
                F.col("doc_id").alias("doc_j"),
                F.col("text").alias("text_j"),
                *([F.col(name_col).alias("name_j")] if name_col else []),
            ),
            "doc_j",
        )
        .orderBy(F.desc("score"), F.asc("doc_i"), F.asc("doc_j"))
        .collect()
    )
    os.makedirs(out_dir, exist_ok=True)
    files: list[str] = []
    buf: list[str] = [_HTML_HEAD]
    size = len(_HTML_HEAD)

    def flush():
        nonlocal buf, size
        if len(buf) <= 1:
            return
        p = os.path.join(out_dir, f"text_comparisons_{len(files)}.html")
        with open(p, "w", encoding="utf-8") as f:
            f.write("".join(buf) + "</body></html>")
        files.append(p)
        buf = [_HTML_HEAD]
        size = len(_HTML_HEAD)

    for r in surv:
        ni = r["name_i"] if name_col else str(r["doc_i"])
        nj = r["name_j"] if name_col else str(r["doc_j"])
        yi, yj = extract_year(ni), extract_year(nj)
        ti = display_tokens(html.escape(r["text_i"]))
        tj = display_tokens(html.escape(r["text_j"]))
        if (yj, nj) < (yi, ni):  # older doc left (flame.py:1186-1191)
            ni, nj, ti, tj = nj, ni, tj, ti
        h1, h2 = _render_pair_html(ti, tj, max_gap_words)
        block = (
            f'<div class="pair"><div class="meta">{ni} vs {nj} — '
            f'score {r["score"]:.4f}</div><table><tr><td>{h1}</td>'
            f"<td>{h2}</td></tr></table></div>\n"
        )
        if size + len(block) > max_file_size:
            flush()
        buf.append(block)
        size += len(block)
    flush()
    return files


# ---------------------------------------------------------------------------
# similarity heatmap (S7; flame.py:1224-1238 semantics, SVG instead of
# plotly — not available here). Size guard retained (flame.py:1360-1363).
# ---------------------------------------------------------------------------


def render_heatmap_svg(
    pairs: DataFrame, n_docs: int, out_path: str, max_docs: int = 2000
) -> str | None:
    """Dense n x n heatmap of pair scores as a standalone SVG file.
    Skipped (returns None) at >= ``max_docs`` docs like the reference.
    Driver-side densification of the collected sparse pairs."""
    if n_docs >= max_docs:
        return None
    mat = np.zeros((n_docs, n_docs))
    np.fill_diagonal(mat, 1.0)
    for r in pairs.collect():
        i, j = int(r["doc_i"]), int(r["doc_j"])
        if i < n_docs and j < n_docs:
            mat[i, j] = mat[j, i] = float(r["score"])
    cell = max(2, min(12, 800 // max(n_docs, 1)))
    size = cell * n_docs
    rects = []
    for i in range(n_docs):
        for j in range(n_docs):
            v = mat[i, j]
            if v <= 0:
                continue
            shade = int(255 - v * 200)
            rects.append(
                f'<rect x="{j*cell}" y="{i*cell}" width="{cell}" height="{cell}" '
                f'fill="rgb(255,{shade},{shade})"><title>({i},{j}) '
                f"{v:.4f}</title></rect>"
            )
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}">{"".join(rects)}</svg>'
    )
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(svg)
    return out_path


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
