"""Auto-tune grid search (SURVEY §2.11; flame.py:582-673, exact port of
the MATH, Spark-hosted sampling).

The reference tunes (ngram, n_out) on a <=30-doc sample by injecting
seeded 5% token-drop noise and maximizing SNR = mean(matched-pair
cosine) - mean(mismatched-pair cosine), requiring signal > 0.05. The
sample is tiny by construction, so the trial loop runs on the driver —
exactly like the reference — over tokens collected from the DataFrame
in canonical doc_id order. The noise reproduces the reference's
np.random.seed(42) / np.random.rand() call sequence bit-for-bit
(two draws per dropped token, short-circuit order, flame.py:597-606).
"""

from __future__ import annotations

import numpy as np

from .hashing import lno_gram_hashes

CANDIDATE_GRID = [
    (4, 0), (4, 1), (5, 0), (5, 1), (5, 2),
    (6, 0), (6, 1), (6, 2), (7, 1), (7, 2),
]


def perturb_sample(sample_tokens: list[list[str]], seed: int = 42) -> list[list[str]]:
    """The reference's noise model, identical RNG call sequence
    (flame.py:587, :597-606)."""
    np.random.seed(seed)
    perturbed_list = []
    for tokens in sample_tokens:
        perturbed: list[str] = []
        for t in tokens:
            if np.random.rand() < 0.05:
                if np.random.rand() < 0.5 and len(perturbed) > 0:
                    perturbed.pop()
                continue
            perturbed.append(t)
        perturbed_list.append(perturbed)
    return perturbed_list


def _vectors(features_list, vocab):
    vecs = []
    for feats in features_list:
        vec = np.zeros(len(vocab))
        if feats.size > 0:
            u, c = np.unique(feats, return_counts=True)
            for val, count in zip(u, c):
                if val in vocab:
                    vec[vocab[val]] = count
        norm = np.linalg.norm(vec)
        vecs.append(vec / norm if norm > 0 else vec)
    return vecs


def auto_tune(
    sample_tokens: list[list[str]],
    encoder: dict[str, int],
    default_ngram: int,
    default_n_out: int,
    seed: int = 42,
) -> tuple[int, int, float]:
    """-> (best_ngram, best_n_out, best_snr). Pure driver-side math
    (flame.py:608-673)."""
    sample_size = len(sample_tokens)
    if sample_size < 2:
        return default_ngram, default_n_out, float("-inf")
    perturbed = perturb_sample(sample_tokens, seed)
    V = len(encoder)

    def feats(tokens, ngram, n_out):
        ids = np.array([encoder[t] for t in tokens if t in encoder], dtype=np.int64)
        return lno_gram_hashes(ids, V, ngram, n_out)

    best_snr = -float("inf")
    best = (default_ngram, default_n_out)
    for ngram, n_out in CANDIDATE_GRID:
        if ngram - n_out < 1:
            continue
        orig_f = [feats(t, ngram, n_out) for t in sample_tokens]
        pert_f = [feats(t, ngram, n_out) for t in perturbed]
        vocab: dict[int, int] = {}
        for fs in orig_f + pert_f:
            for f in fs:
                if f not in vocab:
                    vocab[f] = len(vocab)
        if not vocab:
            continue
        ov = _vectors(orig_f, vocab)
        pv = _vectors(pert_f, vocab)
        signals = [np.dot(ov[i], pv[i]) for i in range(sample_size)]
        avg_signal = float(np.mean(signals))
        noises = [
            np.dot(ov[i], pv[j])
            for i in range(sample_size)
            for j in range(sample_size)
            if i != j
        ]
        avg_noise = float(np.mean(noises)) if noises else 0.0
        snr = avg_signal - avg_noise
        if snr > best_snr and avg_signal > 0.05:
            best_snr = snr
            best = (ngram, n_out)
    return best[0], best[1], best_snr


def auto_tune_from_docs(docs_df, encoder, sample_size: int = 30,
                        default_ngram: int = 6, default_n_out: int = 1):
    """Spark entry: collect the first ``sample_size`` docs' tokens in
    doc_id order (canonical, deterministic) and tune on the driver."""
    rows = (
        docs_df.select("doc_id", "tokens").orderBy("doc_id").limit(sample_size).collect()
    )
    sample = [list(r["tokens"]) for r in rows]
    return auto_tune(sample, encoder, default_ngram, default_n_out)
