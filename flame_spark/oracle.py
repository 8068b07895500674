"""Single-process NumPy oracle for oracle-differential tests.

Implements the same semantics as the Spark engine (SURVEY.md §1.4) in
plain Python/NumPy, sharing the deterministic primitives (normalize,
BPE, LNO hashing) so that any divergence observed in tests is a Spark
plumbing bug, not a semantics drift. Summation order is sorted-by-term
everywhere — the engine's fixed fold order — so scores must match
bit-for-bit (float64).

Mirrors flame.py's pipeline: load -> normalize (flame.py:416-512) ->
BPE (flame.py:514-560) -> encoder (flame.py:680-684) -> LNO features
(flame.py:710-739) -> TF (flame.py:774-786) -> TF-IDF cosine
(flame.py:793-810) -> Otsu (flame.py:689-701); plus the project-defined
BM25 (constants.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import constants as C
from .bpe import BpeModel, build_encoder, suggest_vocab_size, train_bpe
from .config import FlameConfig
from .hashing import lno_gram_hashes
from .normalize import (
    canonicalize_whitespace,
    learn_artifacts_local,
    stage1_normalize,
    NormArtifacts,
)
from .similarity import otsu_threshold_local


@dataclass
class OracleIndex:
    doc_ids: list[int]
    norm_texts: dict[int, str]
    tokens: dict[int, list[str]]
    features: dict[int, np.ndarray]
    tf: dict[tuple[int, int], int]  # (doc_id, term) -> tf  (term as int key)
    term_df: dict[int, int]
    term_cf: dict[int, int]
    doc_len: dict[int, int]
    n_docs: int
    avgdl: float
    encoder: dict[str, int]
    bpe: BpeModel | None
    norm_art: NormArtifacts
    vocab_size: int = 0


def simple_word_tokens(norm_text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", norm_text) if t]


def build_oracle_index(
    raw_docs: list[tuple[int, str]], cfg: FlameConfig
) -> OracleIndex:
    """raw_docs: (doc_id, raw_text) — doc ids must already be dense/stable."""
    cfg.validate()
    # S2/S3
    docs = []
    for doc_id, text in raw_docs:
        t = canonicalize_whitespace(text or "")
        if len(t) >= cfg.min_text_length:
            docs.append((doc_id, t))
    if cfg.keep_texts is not None:
        docs = [(d, t) for d, t in docs if d < cfg.keep_texts]

    # P1-P3
    from .normalize import parse_rules
    from .constants import DEFAULT_BIGRAM_RULES

    bigram_rules = parse_rules(DEFAULT_BIGRAM_RULES) if cfg.bigram_enabled else None
    stage1 = [(d, stage1_normalize(t, bigram_rules)) for d, t in docs]
    art = learn_artifacts_local(
        [t for _, t in stage1],
        alphabet=cfg.alphabet,
        min_freq=cfg.char_norm_min_freq,
        bigram_enabled=cfg.bigram_enabled,
        phonetic_enabled=cfg.phonetic_enabled,
    )
    lut = art.main_lut()
    from .normalize import apply_lut

    norm_texts = {}
    for d, t in stage1:
        nt = apply_lut(t, lut)
        plut = art.phonetic_lut()
        if plut is not None:
            nt = apply_lut(nt, plut)
        norm_texts[d] = nt

    ordered_ids = sorted(norm_texts)

    # T1-T4
    bpe_model = None
    vocab_size = 0
    if cfg.tokenizer == "bpe":
        sample_ids = ordered_ids
        if cfg.learn_sample_docs is not None:
            sample_ids = ordered_ids[: cfg.learn_sample_docs]
        sample = [norm_texts[d] for d in sample_ids]
        if str(cfg.vocab_size).lower() == "auto":
            vocab_size = suggest_vocab_size(
                sample,
                min_word_freq=cfg.vocab_min_word_freq,
                coverage=cfg.vocab_coverage,
            )
        else:
            vocab_size = int(cfg.vocab_size)
        unique_words = {w for line in sample for w in line.split()}
        vocab_size = min(vocab_size, len(unique_words) + 256)
        bpe_model = train_bpe(sample, vocab_size)
        tokens = {d: bpe_model.encode(norm_texts[d]) for d in ordered_ids}
    else:
        tokens = {d: simple_word_tokens(norm_texts[d]) for d in ordered_ids}

    encoder = build_encoder([tokens[d] for d in ordered_ids])
    V = len(encoder)

    # T5 + A1
    features: dict[int, np.ndarray] = {}
    tf: dict[tuple[int, int], int] = {}
    term_df: dict[int, int] = {}
    term_cf: dict[int, int] = {}
    doc_len: dict[int, int] = {}
    for d in ordered_ids:
        if cfg.term_mode == "lno":
            ids = np.array(
                [encoder[t] for t in tokens[d] if t in encoder], dtype=np.int64
            )
            feats = lno_gram_hashes(ids, V, cfg.ngram, cfg.n_out)
        else:
            feats = np.array(
                [encoder[t] for t in tokens[d] if t in encoder], dtype=np.int64
            )
        features[d] = feats
        doc_len[d] = int(feats.size)
        vals, counts = np.unique(feats, return_counts=True)
        for v, c in zip(vals.tolist(), counts.tolist()):
            tf[(d, v)] = int(c)
            term_df[v] = term_df.get(v, 0) + 1
            term_cf[v] = term_cf.get(v, 0) + int(c)

    n_docs = len(ordered_ids)
    avgdl = float(np.mean([doc_len[d] for d in ordered_ids])) if n_docs else 0.0
    return OracleIndex(
        doc_ids=ordered_ids,
        norm_texts=norm_texts,
        tokens=tokens,
        features=features,
        tf=tf,
        term_df=term_df,
        term_cf=term_cf,
        doc_len=doc_len,
        n_docs=n_docs,
        avgdl=avgdl,
        encoder=encoder,
        bpe=bpe_model,
        norm_art=art,
        vocab_size=vocab_size,
    )


# ---------------------------------------------------------------------------
# TF-IDF cosine pairs (flame.py:793-810, sklearn defaults)
# ---------------------------------------------------------------------------


def oracle_tfidf_weights(idx: OracleIndex) -> dict[int, dict[int, float]]:
    """doc -> {term -> L2-normalised tf-idf weight}; norm summed in
    sorted-term order (the engine's canonical order)."""
    n = float(idx.n_docs)
    doc_terms: dict[int, list[int]] = {d: [] for d in idx.doc_ids}
    for (dd, t) in idx.tf:
        doc_terms[dd].append(t)
    weights: dict[int, dict[int, float]] = {}
    for d in idx.doc_ids:
        terms = sorted(doc_terms[d])
        w = {}
        for t in terms:
            idf = np.log((1.0 + n) / (1.0 + idx.term_df[t])) + 1.0
            w[t] = idx.tf[(d, t)] * idf
        norm_sq = 0.0
        for t in terms:  # sorted order
            norm_sq += w[t] * w[t]
        norm = np.sqrt(norm_sq)
        weights[d] = {t: (w[t] / norm if norm > 0 else 0.0) for t in terms}
    return weights


def oracle_cosine_pairs(idx: OracleIndex) -> dict[tuple[int, int], float]:
    """(i, j) i<j -> cosine; only pairs sharing >= 1 term."""
    weights = oracle_tfidf_weights(idx)
    # invert: term -> [(doc, wn)]
    by_term: dict[int, list[int]] = {}
    for d, w in weights.items():
        for t in w:
            by_term.setdefault(t, []).append(d)
    pair_terms: dict[tuple[int, int], list[int]] = {}
    for t, ds in by_term.items():
        ds = sorted(ds)
        for a in range(len(ds)):
            for b in range(a + 1, len(ds)):
                pair_terms.setdefault((ds[a], ds[b]), []).append(t)
    out = {}
    for (i, j), terms in pair_terms.items():
        s = 0.0
        for t in sorted(terms):  # fixed order == engine fold order
            s += weights[i][t] * weights[j][t]
        out[(i, j)] = s
    return out


def oracle_cosine_pairs_inter(
    idx1: OracleIndex, idx2: OracleIndex
) -> dict[tuple[int, int], float]:
    """Inter-corpus mode (flame.py:793-801): idf fit on the vstacked
    union of both TF matrices, transform each, all nonzero cells of
    matrix1 x matrix2^T (rectangular — no triangle filter)."""
    n_union = float(idx1.n_docs + idx2.n_docs)
    df_union: dict[int, int] = {}
    for idx in (idx1, idx2):
        for (_, t) in idx.tf:
            df_union[t] = df_union.get(t, 0) + 1

    def weights(idx: OracleIndex) -> dict[int, dict[int, float]]:
        doc_terms: dict[int, list[int]] = {d: [] for d in idx.doc_ids}
        for (dd, t) in idx.tf:
            doc_terms[dd].append(t)
        out = {}
        for d in idx.doc_ids:
            terms = sorted(doc_terms[d])
            w = {
                t: idx.tf[(d, t)]
                * (np.log((1.0 + n_union) / (1.0 + df_union[t])) + 1.0)
                for t in terms
            }
            norm_sq = 0.0
            for t in terms:
                norm_sq += w[t] * w[t]
            norm = np.sqrt(norm_sq)
            out[d] = {t: (w[t] / norm if norm > 0 else 0.0) for t in terms}
        return out

    w1, w2 = weights(idx1), weights(idx2)
    by_term2: dict[int, list[int]] = {}
    for d, w in w2.items():
        for t in w:
            by_term2.setdefault(t, []).append(d)
    pair_terms: dict[tuple[int, int], list[int]] = {}
    for d1, w in w1.items():
        for t in w:
            for d2 in by_term2.get(t, ()):
                pair_terms.setdefault((d1, d2), []).append(t)
    return {
        (i, j): sum(w1[i][t] * w2[j][t] for t in sorted(terms))
        for (i, j), terms in pair_terms.items()
    }


def oracle_otsu_threshold(idx: OracleIndex, pairs: dict[tuple[int, int], float]) -> float:
    """Otsu over nonzero dist_mat entries: each pair twice + diagonal 1.0
    per doc with nonzero features (flame.py:689-701, :810)."""
    vals = []
    for s in pairs.values():
        vals.extend([s, s])
    vals.extend(1.0 for d in idx.doc_ids if idx.doc_len[d] > 0)
    return otsu_threshold_local(np.array(vals, dtype=np.float64))


# ---------------------------------------------------------------------------
# BM25 (project-defined, constants.py)
# ---------------------------------------------------------------------------


def oracle_query_terms(idx: OracleIndex, query_text: str, cfg: FlameConfig) -> dict[int, int]:
    """Query pipeline = document pipeline with the SAME artifacts."""
    t = canonicalize_whitespace(query_text or "")
    from .normalize import apply_lut, parse_rules
    from .constants import DEFAULT_BIGRAM_RULES

    bigram_rules = (
        parse_rules(DEFAULT_BIGRAM_RULES) if cfg.bigram_enabled else None
    )
    t = stage1_normalize(t, bigram_rules)
    t = apply_lut(t, idx.norm_art.main_lut())
    plut = idx.norm_art.phonetic_lut()
    if plut is not None:
        t = apply_lut(t, plut)
    if cfg.tokenizer == "bpe":
        toks = idx.bpe.encode(t)
    else:
        toks = simple_word_tokens(t)
    ids = [idx.encoder[x] for x in toks if x in idx.encoder]
    if cfg.term_mode == "lno":
        feats = lno_gram_hashes(
            np.array(ids, dtype=np.int64), len(idx.encoder), cfg.ngram, cfg.n_out
        ).tolist()
    else:
        feats = ids
    qtf: dict[int, int] = {}
    for f in feats:
        qtf[f] = qtf.get(f, 0) + 1
    return qtf


def oracle_bm25_topk(
    idx: OracleIndex,
    qtf: dict[int, int],
    k: int,
    k1: float = C.BM25_K1,
    b: float = C.BM25_B,
) -> list[tuple[int, float]]:
    """-> [(doc_id, score)] sorted score desc, doc_id asc, top k."""
    n = float(idx.n_docs)
    postings_by_term: dict[int, list[tuple[int, int]]] = {}
    for (d, t), tf in idx.tf.items():
        postings_by_term.setdefault(t, []).append((d, tf))
    scores: dict[int, float] = {}
    contribs: dict[int, list[tuple[int, float]]] = {}
    for t in qtf:
        df = idx.term_df.get(t)
        if df is None:
            continue
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, tf in postings_by_term[t]:
            dl = idx.doc_len[d]
            tf_comp = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / idx.avgdl))
            # qtf * (idf * tf_comp): association matches engine + segments
            contribs.setdefault(d, []).append((t, qtf[t] * (idf * tf_comp)))
    for d, lst in contribs.items():
        s = 0.0
        for _, v in sorted(lst):  # sorted by term — engine fold order
            s += v
        scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
