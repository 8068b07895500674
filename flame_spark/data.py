"""Deterministic synthetic transcripts + reference query set (FIXTURES.md).

Seed-fixed (seed=42), no wall clock, no external data. One row = one
turn = one document (the reference's unit of comparison is one text
file, flame.py:393-399; ours is one turn keyed by (conv_id, turn_idx)).

The text mixes ~50 formulaic templates (stock phrases echoing the
reference's medieval-charter formulae) with seeded filler, plus
controlled perturbations: token drops, spelling noise, ligature /
diacritic characters (æ œ ß é ſ) so the normalization layers
(flame.py:435-512) and LNO matching (flame.py:710-739) have real work;
some texts < 150 chars (min-length filter, flame.py:408) and some turns
shorter than ``ngram`` tokens (zero-feature path, flame.py:717-718);
deliberate near-duplicate pairs across conversations.
"""

from __future__ import annotations

import numpy as np

_FILLER_WORDS = [
    "status", "report", "check", "update", "value", "result", "system",
    "request", "response", "token", "model", "query", "index", "build",
    "merge", "shard", "batch", "stream", "table", "column", "record",
    "datum", "count", "metric", "trace", "error", "retry", "cache",
    "plan", "stage", "task", "node", "core", "disk", "file", "path",
]

_FORMULAE = [
    "in nomine sancte et individue trinitatis amen",
    "notum sit omnibus tam presentibus quam futuris",
    "ego dei gratia rex confirmo hanc cartam",
    "ad perpetuam rei memoriam presentes litteras",
    "universis presentes litteras inspecturis salutem",
    "per presentes litteras significamus vobis quod",
    "cum omnibus pertinentiis suis iure perpetuo possidendam",
    "salva in omnibus apostolice sedis auctoritate",
    "testibus presentibus et ad hoc vocatis",
    "anno domini millesimo ducentesimo quadragesimo",
    "the assistant will now summarize the conversation so far",
    "please run the following tool with the given arguments",
    "the tool returned the following structured output",
    "let me check the current state of the system",
    "based on the results we should proceed as follows",
    "i will now execute the requested database query",
    "the query returned the expected number of rows",
    "here is the final answer to your question",
    "thank you for the clarification let me revise",
    "the index build completed without any errors",
]

_LIGATURE_VARIANTS = {
    "ae": "æ", "oe": "œ", "ss": "ß", "s": "ſ", "e": "é",
}


def _perturb(words: list[str], rng: np.random.Generator) -> list[str]:
    out = []
    for w in words:
        r = rng.random()
        if r < 0.05:
            continue  # token drop
        if r < 0.10 and len(w) > 3:
            i = int(rng.integers(0, len(w) - 1))
            w = w[:i] + w[i + 1] + w[i] + w[i + 2:]  # transposition
        if r < 0.14:
            for src, dst in _LIGATURE_VARIANTS.items():
                if src in w and rng.random() < 0.5:
                    w = w.replace(src, dst, 1)
                    break
        out.append(w)
    return out


_BASE_TS = 1_700_000_000_000_000  # fixed epoch micros


def _conversation_rows(c: int, avg_turns: int, seed: int) -> list[dict]:
    """All turns of conversation ``c``. Seeded PER CONVERSATION, so the
    corpus is identical whether generated on the driver or distributed
    across any number of partitions (the scaling-bench requirement)."""
    rng = np.random.default_rng(seed * 1_000_003 + c)
    roles = ["user", "assistant", "tool"]
    conv_id = f"conv{c:06d}"
    n_turns = int(rng.integers(max(2, avg_turns - 4), avg_turns + 5))
    rows: list[dict] = []
    for t in range(n_turns):
        role = roles[t % 3]
        r = rng.random()
        n_formulae = int(rng.integers(1, 4))
        if r < 0.2:
            # near-duplicate cluster: canonical formula-only text chosen
            # from a small id space shared by ALL conversations, lightly
            # perturbed -> cross-conversation near-dup pairs
            fi = int(rng.integers(0, len(_FORMULAE)))
            canonical = " ".join(
                [_FORMULAE[fi], _FORMULAE[(fi + 3) % len(_FORMULAE)],
                 _FORMULAE[(fi + 7) % len(_FORMULAE)]]
            )
            text = " ".join(_perturb(canonical.split(), rng))
        else:
            parts = []
            for _ in range(n_formulae):
                f = _FORMULAE[int(rng.integers(0, len(_FORMULAE)))]
                parts.append(f)
                n_fill = int(rng.integers(2, 12))
                parts.append(
                    " ".join(
                        _FILLER_WORDS[int(rng.integers(0, len(_FILLER_WORDS)))]
                        for _ in range(n_fill)
                    )
                )
            text = " ".join(parts)
            if rng.random() < 0.3:
                text = " ".join(_perturb(text.split(), rng))
        if rng.random() < 0.08:
            text = text[:100]  # short text -> min-length filter fodder
        if rng.random() < 0.04:
            text = " ".join(text.split()[:3])  # shorter than ngram window
        # irregular whitespace to exercise canonicalization
        if rng.random() < 0.2:
            text = "  " + text.replace(" ", "   ", 3) + " \t "
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": "search" if role == "tool" else None,
                "ts": _BASE_TS + c * 1_000_000_000 + t * 61_000_000,
            }
        )
    return rows


def generate_transcripts(
    n_conversations: int = 20, avg_turns: int = 10, seed: int = 42
) -> list[dict]:
    """Driver-side reference generator (the oracle's input)."""
    rows: list[dict] = []
    for c in range(n_conversations):
        rows.extend(_conversation_rows(c, avg_turns, seed))
    return rows


_TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def transcripts_df(
    spark, n_conversations: int = 20, avg_turns: int = 10, seed: int = 42
):
    """Distributed generation: one task per conv-id range, identical rows
    to ``generate_transcripts`` at any parallelism (per-conv seeding)."""
    import pandas as pd

    def gen(it):
        for pdf in it:
            out: list[dict] = []
            for c in pdf["id"]:
                out.extend(_conversation_rows(int(c), avg_turns, seed))
            o = pd.DataFrame(
                out,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            )
            o["ts"] = pd.to_datetime(o["ts"], unit="us")
            yield o

    n_parts = max(1, min(n_conversations, int(spark.sparkContext.defaultParallelism)))
    return (
        spark.range(n_conversations, numPartitions=n_parts)
        .mapInPandas(gen, schema=_TRANSCRIPT_SCHEMA)
    )


def reference_queries(seed: int = 42, k: int = 10) -> list[dict]:
    """Frozen reference query set (FIXTURES.md §2): formula phrases,
    perturbed variants, a single-token query, an OOV-token query, and an
    over-long query."""
    rng = np.random.default_rng(seed + 1)
    queries = []
    picks = rng.choice(len(_FORMULAE), size=12, replace=False)
    for i, p in enumerate(picks):
        queries.append({"query_id": f"q{i:03d}", "query_text": _FORMULAE[int(p)], "k": k})
    # perturbed variants (ligatures / misspellings)
    queries.append(
        {"query_id": "q100", "query_text": "in nomine ſancte et individué trinitatis amen", "k": k}
    )
    queries.append(
        {"query_id": "q101", "query_text": "notum sit omnibus tam presentibus quam futurs", "k": k}
    )
    queries.append({"query_id": "q102", "query_text": "trinitatis", "k": k})
    queries.append({"query_id": "q103", "query_text": "zzzunknowntokenzzz", "k": k})
    queries.append(
        {
            "query_id": "q104",
            "query_text": " ".join(_FORMULAE[:8]),  # longer than any doc window
            "k": k,
        }
    )
    return queries
