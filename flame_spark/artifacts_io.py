"""Artifact persistence (S10): tokenizer model + normalization rules +
encoder saved as JSON next to the segment warehouse, reloadable for the
query path of a previously-built index (resume/serving)."""

from __future__ import annotations

import json
import os

from .bpe import BpeModel
from .corpus import CorpusArtifacts
from .normalize import NormArtifacts


def save_artifacts(artifacts: CorpusArtifacts, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "norm": {
            "alphabet": artifacts.norm.alphabet,
            "bigram_enabled": artifacts.norm.bigram_enabled,
            "bigram_rules": artifacts.norm.bigram_rules,
            "learned_rules": artifacts.norm.learned_rules,
            "phonetic_enabled": artifacts.norm.phonetic_enabled,
            "phonetic_alphabet": artifacts.norm.phonetic_alphabet,
            "phonetic_rules": artifacts.norm.phonetic_rules,
            "unknown_chr": artifacts.norm.unknown_chr,
        },
        "bpe": artifacts.bpe.to_dict() if artifacts.bpe else None,
        "encoder": artifacts.encoder,
        "vocab_size": artifacts.vocab_size,
        "n_vocab": artifacts.n_vocab,
    }
    if artifacts.encoder is None:
        raise ValueError(
            "distributed-encoder artifacts (vocab > max_collect_vocab) "
            "persist their vocab as a table, not JSON — write "
            "artifacts.encoder_df to the warehouse instead"
        )
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f)


def load_artifacts(path: str) -> CorpusArtifacts:
    with open(path, encoding="utf-8") as f:
        payload = json.load(f)
    norm = NormArtifacts(**payload["norm"])
    bpe = BpeModel.from_dict(payload["bpe"]) if payload["bpe"] else None
    encoder = {k: int(v) for k, v in payload["encoder"].items()}
    return CorpusArtifacts(
        norm=norm,
        bpe=bpe,
        encoder=encoder,
        vocab_size=int(payload["vocab_size"]),
        n_vocab=int(payload.get("n_vocab", len(encoder))),
    )
