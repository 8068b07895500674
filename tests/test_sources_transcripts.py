"""Transcript source readers: JSONL/CSV/parquet must yield the same
canonical table, malformed rows must be loud (or counted, never
silent), and an index built from a JSONL export must be byte-equal to
one built from the parquet original."""

import json
import os

import pytest
from pyspark.sql import functions as F

from flame_spark.config import FlameConfig
from flame_spark.data import transcripts_df
from flame_spark.sources.transcripts import (
    read_transcripts,
    read_transcripts_with_stats,
)

CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=0, tokenizer="word",
    term_mode="lno", n_shards=4, block_size=4,
)


def _rows_key(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
         r["ts"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    hard = spark.createDataFrame(
        [
            ("zzz_conv_a", 0, "user", "multi\nline\ntext here", None, None),
            ("zzz_conv_a", 1, "assistant", "", None, None),
            ("zzz_conv_b", 0, "user", "  edge \t whitespace  ", "grep", None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    raw = transcripts_df(spark, 6, 5).unionByName(hard)
    raw.coalesce(1).write.mode("overwrite").parquet(str(d / "pq"))
    raw.coalesce(1).write.mode("overwrite").orc(str(d / "orc"))
    # JSONL export (timestamps as ISO strings, Spark's JSON default)
    raw.coalesce(1).write.mode("overwrite").json(str(d / "jl"))
    # a faithful CSV export must disable whitespace trimming and write
    # nulls as an explicit sentinel (reader side: sources.transcripts)
    from flame_spark.sources.transcripts import CSV_NULL

    raw.coalesce(1).write.mode("overwrite").option("header", "true").option(
        "ignoreLeadingWhiteSpace", "false"
    ).option("ignoreTrailingWhiteSpace", "false").option(
        "nullValue", CSV_NULL
    ).csv(str(d / "cs"))
    return d


def test_formats_roundtrip_identically(spark, staged):
    pq = read_transcripts(spark, str(staged / "pq"), "parquet")
    oc = read_transcripts(spark, str(staged / "orc"), "orc")
    jl = read_transcripts(spark, str(staged / "jl"), "jsonl")
    cs = read_transcripts(spark, str(staged / "cs"), "csv")
    assert pq.schema == oc.schema == jl.schema == cs.schema
    want = _rows_key(pq)
    assert _rows_key(oc) == want
    assert _rows_key(jl) == want
    assert _rows_key(cs) == want
    assert len(want) > 20


def test_orc_malformed_loud_and_counted(spark, tmp_path):
    # ORC goes through the same typed-columnar branch as parquet: a
    # null key column must raise under 'error' and be counted under
    # 'drop' — format-independent contract
    bad = spark.createDataFrame(
        [("c1", 0, "user", "ok", None, None),
         (None, 1, "user", "null conv", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    path = str(tmp_path / "orc_bad")
    bad.coalesce(1).write.orc(path)
    with pytest.raises(Exception, match="malformed row"):
        read_transcripts(spark, path, "orc").count()
    df, stats = read_transcripts_with_stats(
        spark, path, "orc", on_malformed="drop"
    )
    assert df.count() == 1
    assert stats.n_bad == 1


def test_malformed_rows_loud_or_counted(spark, staged, tmp_path):
    bad_dir = tmp_path / "bad"
    os.makedirs(bad_dir)
    good = {"conv_id": "c1", "turn_idx": 0, "role": "user",
            "text": "hello world", "tool": None, "ts": None}
    lines = [
        json.dumps(good),
        "{this is not json",
        json.dumps({**good, "turn_idx": 1, "text": None}),  # null key col
        json.dumps({**good, "turn_idx": 2}),
    ]
    with open(bad_dir / "part.jsonl", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))

    # error mode is SINGLE-PASS: constructing the reader launches no
    # job (the old contract ran an eager bad.count() — a full extra
    # scan per ingest at warehouse scale); the inline check raises
    # from the caller's own action, naming the offending row
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    spark.sparkContext.setJobGroup("src_err_probe", "probe")
    df = read_transcripts(spark, str(bad_dir), "jsonl")
    assert len(tracker.getJobIdsForGroup("src_err_probe")) == 0
    with pytest.raises(Exception, match="malformed row"):
        df.count()
    # the check survives column pruning: a projection that drops every
    # key column still trips it
    with pytest.raises(Exception, match="malformed row"):
        df.select("role").collect()

    # drop mode: one scan too — the count comes from an observe metric
    # inside the caller's own action, not a separate validation job
    spark.sparkContext.setJobGroup("src_drop_probe", "probe")
    df, stats = read_transcripts_with_stats(
        spark, str(bad_dir), "jsonl", on_malformed="drop"
    )
    assert len(tracker.getJobIdsForGroup("src_drop_probe")) == 0
    assert sorted(r["turn_idx"] for r in df.collect()) == [0, 2]
    assert stats.n_bad == 2


def test_csv_unsplittable_warning(spark, tmp_path):
    """multiLine CSV is one-task-per-file: a single-file export must
    warn (the scan cannot parallelize no matter the cluster size); a
    many-files export must not."""
    import warnings

    from flame_spark.sources.transcripts import CSV_NULL

    df = spark.createDataFrame(
        [(f"c{i}", 0, "user", "hi", None, None) for i in range(40)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    one, many = tmp_path / "one", tmp_path / "many"
    for target, n in ((one, 1), (many, 4)):
        df.repartition(n).write.option("header", "true").option(
            "nullValue", CSV_NULL
        ).csv(str(target))
    with pytest.warns(UserWarning, match="unsplittable"):
        read_transcripts(spark, str(one), "csv")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert read_transcripts(spark, str(many), "csv").count() == 40


def test_parquet_missing_column_raises(spark, tmp_path):
    p = tmp_path / "broken"
    spark.createDataFrame(
        [("c1", "hello")], "conv_id string, text string"
    ).write.parquet(str(p))
    with pytest.raises(ValueError, match="turn_idx"):
        read_transcripts(spark, str(p), "parquet")


def test_jsonl_stream_ingest(spark, staged, tmp_path):
    """Tailing a JSONL log dir must ingest identically to the parquet
    stream, and a malformed line must fail the batch loudly."""
    from flame_spark.incremental import IncrementalIndexer, ingest_stream

    full = transcripts_df(spark, 8, 5)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(full.filter(F.col("conv_id") < "conv000004"))
    jdir = tmp_path / "jl"
    full.filter(F.col("conv_id") >= "conv000004").coalesce(1).write.mode(
        "overwrite"
    ).json(str(jdir))
    ingest_stream(idx, spark, str(jdir), str(tmp_path / "ck"),
                  on_oov="drop", fmt="jsonl")
    assert idx._load_state()["n_ingests"] == 2
    assert idx._load_state()["max_conv_id"] == "conv000007"

    with open(jdir / "zz-broken.json", "w", encoding="utf-8") as f:
        f.write('{"conv_id": "conv000009", not json\n')
    with pytest.raises(Exception, match="malformed"):
        ingest_stream(idx, spark, str(jdir), str(tmp_path / "ck"),
                      on_oov="drop", fmt="jsonl")


def test_jsonl_build_equals_parquet_build(spark, staged, tmp_path):
    """The whole point of the readers: a warehouse built from a JSONL
    export must be byte-identical to one built from the parquet
    original."""
    from flame_spark.incremental import IncrementalIndexer

    def seg_map(df):
        return {
            (int(r["shard"]), r["term"]): (
                bytes(r["doc_deltas"]), bytes(r["scores"]),
                tuple(r["block_max"]),
            )
            for r in df.collect()
        }

    a = IncrementalIndexer(str(tmp_path / "wa"), CFG)
    a.initial_build(read_transcripts(spark, str(staged / "pq"), "parquet"))
    b = IncrementalIndexer(str(tmp_path / "wb"), CFG)
    b.initial_build(read_transcripts(spark, str(staged / "jl"), "jsonl"))
    assert seg_map(a.merge_segments(spark)) == seg_map(b.merge_segments(spark))


def test_two_drop_mode_reads_compose_in_one_query(spark, staged, tmp_path):
    """Observation names must be unique per query: a caller unioning
    two drop-mode reads of the same format (routine multi-source
    ingest) must not hit DUPLICATED_METRICS_NAME."""
    a, sa = read_transcripts_with_stats(
        spark, str(staged / "jl"), "jsonl", on_malformed="drop"
    )
    b, sb = read_transcripts_with_stats(
        spark, str(staged / "jl"), "jsonl", on_malformed="drop"
    )
    u = a.unionByName(b)
    assert u.count() == 2 * read_transcripts(spark, str(staged / "jl"), "jsonl").count()
    assert sa.n_bad == 0 and sb.n_bad == 0


def test_drop_mode_empty_source_counts_zero(spark, tmp_path):
    """SUM over zero rows is SQL NULL — n_bad on an empty export (an
    empty day of logs) must be 0, not a TypeError."""
    d = str(tmp_path / "empty_jl")
    os.makedirs(d)
    open(os.path.join(d, "part-0.jsonl"), "w").close()  # zero-row file
    df, stats = read_transcripts_with_stats(
        spark, d, "jsonl", on_malformed="drop"
    )
    assert df.count() == 0
    assert stats.n_bad == 0
