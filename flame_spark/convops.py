"""Conversation-assembly operators over transcript turns.

The engine's input unit is a transcript TURN (``conv_id, turn_idx,
role, text, ...`` — sources/transcripts.py); training pipelines also
need the CONVERSATION as a unit: one document per ``conv_id`` with the
turns in stable ``turn_idx`` order (the per-turn-ordering invariant the
index build relies on), optionally restricted to a role subset (e.g.
assistant-only targets), plus fixed-size overlapping context windows
cut from the assembled document for context-length-bounded training.

Reference parity note: FLAME's unit is a whole document file
(flame.py ``load_corpus``); turn assembly is the transcript-payload
equivalent of that file concatenation, kept SQL-expressible so the
DuckDB oracle can verify the assembled strings byte-for-byte.

Scale shape: one shuffle keyed by ``conv_id`` with per-group state
bounded by the conversation length (turns per conversation is a
bounded, data-model-level quantity — thousands — unlike corpus-level
groups, so no salting is needed); window cutting is a pure per-row
``posexplode`` over an arithmetic ``sequence`` — no extra shuffle, no
Python anywhere (whole-stage codegen except the single collect_list
aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_docs(
    turns: DataFrame,
    roles: list[str] | None = None,
    include_role_tags: bool = True,
    sep: str = "\n",
) -> DataFrame:
    """Assemble one document per conversation from transcript turns.

    Turns are ordered by ``turn_idx`` regardless of the input's row or
    partition order (``sort_array`` over the collected structs — the
    stable-turn-ordering invariant), rendered as ``role: text`` lines
    (or bare text with ``include_role_tags=False``) and joined with
    ``sep``. ``roles`` restricts assembly to a role subset; a
    conversation with no surviving turns disappears (it has no
    training content).

    Output: ``conv_id, n_turns, n_chars, doc``.
    """
    t = turns
    if roles is not None:
        t = t.filter(F.col("role").isin(list(roles)))
    text = F.coalesce(F.col("text"), F.lit(""))
    line = (
        F.concat(F.coalesce(F.col("role"), F.lit("")), F.lit(": "), text)
        if include_role_tags
        else text
    )
    per = t.select(
        "conv_id", F.struct(F.col("turn_idx"), line.alias("line")).alias("s")
    )
    agg = per.groupBy("conv_id").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list("s")), lambda s: s["line"]),
            sep,
        ).alias("doc"),
        F.count("*").cast("long").alias("n_turns"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        F.length("doc").cast("long").alias("n_chars"),
        "doc",
    )


def conversation_windows(
    conv_docs: DataFrame,
    window: int,
    stride: int,
    doc_col: str = "doc",
    id_col: str = "conv_id",
) -> DataFrame:
    """Cut fixed-size overlapping character windows from assembled
    conversation documents (context-length-bounded training chunks).

    Window ``i`` starts at character ``1 + i*stride`` (1-based, code
    points) and spans ``window`` characters; starts run while they are
    <= the document length, so the tail yields progressively shorter
    final chunks rather than dropping trailing text. An empty document
    still yields one empty chunk (the conversation stays countable).

    Pure projection + ``posexplode`` — no shuffle; at 100 TB this
    pipelines straight out of the assembly aggregation.

    Output: ``conv_id, window_idx, start, n_chars, chunk``.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window/stride must be positive: {window}/{stride}")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(doc_col), F.lit(1)), F.lit(stride)
    )
    ex = conv_docs.select(
        F.col(id_col),
        F.col(doc_col),
        F.posexplode(starts).alias("window_idx", "start"),
    )
    chunk = F.col(doc_col).substr(F.col("start"), F.lit(window))
    return ex.select(
        id_col,
        F.col("window_idx").cast("int").alias("window_idx"),
        F.col("start").cast("long").alias("start"),
        F.length(chunk).cast("long").alias("n_chars"),
        chunk.alias("chunk"),
    )


def conversation_tool_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation agent-behavior profile over raw transcript
    turns — the slicing signal a training pipeline uses to select
    agent data (tool-using conversations only, tool mix, call
    density). ``turns``: the canonical transcript schema
    (conv_id, turn_idx, role, text, tool, ts); a turn "calls a tool"
    iff its ``tool`` column is non-null (the input contract's
    semantics — ``role`` labels the speaker, ``tool`` names the
    invocation).

    -> (conv_id, n_turns, n_tool_calls, n_distinct_tools, tools,
    first_tool_turn): ``tools`` is the sorted distinct non-null tool
    list (empty for tool-free conversations), ``first_tool_turn`` the
    earliest tool-calling turn_idx (NULL when none).

    Scale shape: ONE conv_id-keyed aggregation with map-side partial
    aggregates; per-group state is bounded by the conversation's
    distinct tool set, not its turn count.
    """
    tools_distinct = F.array_distinct(F.collect_list("tool"))
    return turns.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.count("tool").cast("long").alias("n_tool_calls"),
        F.size(tools_distinct).cast("long").alias("n_distinct_tools"),
        F.array_sort(tools_distinct).alias("tools"),
        F.min(
            F.when(F.col("tool").isNotNull(), F.col("turn_idx"))
        ).alias("first_tool_turn"),
    )
