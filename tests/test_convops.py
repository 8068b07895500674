"""Conversation-assembly operators: hand-computed expectations on
micro-transcripts (the sf0.01 DuckDB gates ``transcript_conv_docs`` /
``transcript_conv_windows`` cover the full-corpus differential, and the
adversarial sweep covers hostile codepoints)."""

import pytest

from flame_spark.convops import conversation_docs, conversation_windows

TURN_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _turns(spark, rows):
    return spark.createDataFrame(rows, TURN_SCHEMA)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_assembly_orders_by_turn_idx_not_row_order(spark):
    # rows arrive shuffled across conversations and turn order
    t = _turns(
        spark,
        [
            ("c2", 1, "assistant", "fine"),
            ("c1", 2, "user", "third"),
            ("c1", 0, "user", "first"),
            ("c2", 0, "user", "how are you"),
            ("c1", 1, "assistant", "second"),
        ],
    ).repartition(5)
    out = {r["conv_id"]: r for r in conversation_docs(t).collect()}
    assert out["c1"]["doc"] == "user: first\nassistant: second\nuser: third"
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["n_chars"] == len(out["c1"]["doc"])
    assert out["c2"]["doc"] == "user: how are you\nassistant: fine"


def test_assembly_role_filter_and_bare_text(spark):
    t = _turns(
        spark,
        [
            ("c1", 0, "user", "q1"),
            ("c1", 1, "assistant", "a1"),
            ("c1", 2, "tool", "t1"),
            ("c1", 3, "assistant", "a2"),
            ("c2", 0, "user", "only user"),
        ],
    )
    out = {
        r["conv_id"]: r
        for r in conversation_docs(
            t, roles=["assistant"], include_role_tags=False
        ).collect()
    }
    # c2 has no assistant turns -> disappears
    assert set(out) == {"c1"}
    assert out["c1"]["doc"] == "a1\na2"
    assert out["c1"]["n_turns"] == 2


def test_assembly_custom_sep_and_null_text(spark):
    t = _turns(spark, [("c1", 0, "user", None), ("c1", 1, "assistant", "x")])
    row = conversation_docs(t, sep=" | ").collect()[0]
    assert row["doc"] == "user:  | assistant: x"  # null text -> ''


def test_windows_hand_computed(spark):
    docs = spark.createDataFrame(
        [("c1", "abcdefghij")], "conv_id string, doc string"
    )
    out = sorted(
        map(tuple, conversation_windows(docs, window=4, stride=3).collect())
    )
    # starts 1,4,7,10 -> abcd, defg, ghij, j
    assert out == [
        ("c1", 0, 1, 4, "abcd"),
        ("c1", 1, 4, 4, "defg"),
        ("c1", 2, 7, 4, "ghij"),
        ("c1", 3, 10, 1, "j"),
    ]


def test_windows_exact_cover_no_overlap(spark):
    docs = spark.createDataFrame([("c1", "abcdef")], "conv_id string, doc string")
    out = sorted(
        map(tuple, conversation_windows(docs, window=3, stride=3).collect())
    )
    assert out == [("c1", 0, 1, 3, "abc"), ("c1", 1, 4, 3, "def")]


def test_windows_empty_doc_yields_one_empty_chunk(spark):
    docs = spark.createDataFrame([("c1", "")], "conv_id string, doc string")
    out = conversation_windows(docs, window=4, stride=3).collect()
    assert [tuple(r) for r in out] == [("c1", 0, 1, 0, "")]


def test_windows_reject_bad_knobs(spark):
    docs = spark.createDataFrame([("c1", "x")], "conv_id string, doc string")
    with pytest.raises(ValueError):
        conversation_windows(docs, window=0, stride=3)
    with pytest.raises(ValueError):
        conversation_windows(docs, window=4, stride=0)


def test_assembly_partitioning_invariant(spark):
    rows = [
        (f"c{i % 7}", i // 7, "user" if i % 2 else "assistant", f"w{i} " * (i % 5))
        for i in range(70)
    ]
    a = _rows(conversation_docs(_turns(spark, rows).coalesce(1)))
    b = _rows(conversation_docs(_turns(spark, rows).repartition(13)))
    assert a == b


def test_conversation_tool_stats(spark):
    """Tool-usage profile vs an independent per-row replay over the
    canonical synthetic transcripts (which carry real role/tool
    values), plus a hand-built conversation with multiple tools and a
    tool-free one."""
    from flame_spark.convops import conversation_tool_stats
    from flame_spark.data import transcripts_df

    full = transcripts_df(spark, 10, 6).persist()
    got = {
        r["conv_id"]: (
            r["n_turns"], r["n_tool_calls"], r["n_distinct_tools"],
            list(r["tools"]), r["first_tool_turn"],
        )
        for r in conversation_tool_stats(full).collect()
    }
    exp = {}
    for r in full.collect():
        st = exp.setdefault(r["conv_id"], [0, 0, set(), None])
        st[0] += 1
        if r["tool"] is not None:
            st[1] += 1
            st[2].add(r["tool"])
            if st[3] is None or r["turn_idx"] < st[3]:
                st[3] = r["turn_idx"]
    assert got == {
        c: (n, k, len(ts), sorted(ts), ft)
        for c, (n, k, ts, ft) in exp.items()
    }
    assert any(v[1] > 0 for v in got.values())  # tool turns exist
    full.unpersist()

    hand = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi", None, None),
            ("c1", 1, "assistant", "let me check", "search", None),
            ("c1", 2, "tool", "result", "browser", None),
            ("c1", 3, "assistant", "again", "search", None),
            ("c2", 0, "user", "plain chat", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in conversation_tool_stats(hand).collect()}
    assert out["c1"]["n_tool_calls"] == 3
    assert list(out["c1"]["tools"]) == ["browser", "search"]
    assert out["c1"]["first_tool_turn"] == 1
    assert out["c2"]["n_tool_calls"] == 0
    assert list(out["c2"]["tools"]) == []
    assert out["c2"]["first_tool_turn"] is None
