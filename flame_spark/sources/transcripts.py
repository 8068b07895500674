"""Transcript table readers: parquet (the Iceberg stand-in), JSONL and
CSV — the interchange formats conversation logs actually arrive in.

Contract: every reader returns the canonical transcript schema
(streaming.TRANSCRIPT_SCHEMA: conv_id, turn_idx, role, text, tool, ts)
with explicit types — NO schema inference (an inferred all-null column
or a turn_idx that arrives as string would silently corrupt doc-id
assignment downstream). Malformed rows are handled explicitly:

- ``on_malformed="error"`` (default): any row that fails to parse or
  lacks the key columns (conv_id, turn_idx, text) raises with a sample
  of the offending raw records — ingestion must not silently drop
  turns, the per-turn text-equality invariant depends on completeness;
- ``on_malformed="drop"``: malformed rows are filtered out and the
  count is returned alongside the DataFrame for the caller to log.

Scale: both text formats read distributed with the explicit schema (no
inference pass over the data); validation is one null-check filter over
the parsed columns (a malformed PERMISSIVE row nulls every field), not
a second parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming import TRANSCRIPT_SCHEMA

_KEY_COLS = ("conv_id", "turn_idx", "text")
#: null sentinel for CSV: the reader cannot otherwise distinguish a
#: written null from a legitimate empty string (both are an empty
#: field with default options) — faithful exports write with the same
#: ``nullValue`` (see tests); a vanilla export's nulls then read back
#: as '' for string columns, which is safe but lossy.
CSV_NULL = "\\N"


def malformed_pred():
    """Rows ingestion must refuse: any null key column. A malformed
    PERMISSIVE row nulls every schema field, so this one predicate
    catches both parse failures and rows that parsed but lack the
    fields doc-id assignment depends on. Shared by the batch readers
    and the streaming ingest path (incremental.ingest_stream)."""
    pred = F.lit(False)
    for c in _KEY_COLS:
        pred = pred | F.col(c).isNull()
    return pred


def _validated(raw: DataFrame, fmt: str, on_malformed: str):
    # NO corrupt-record column: Spark populates it lazily during the
    # parse of *referenced* columns, so filtering on it without caching
    # returns inconsistent results (count and collect can disagree).
    if on_malformed not in ("error", "drop"):
        raise ValueError(
            f"on_malformed must be 'error' or 'drop', got {on_malformed!r}"
        )
    bad_pred = malformed_pred()
    bad = raw.filter(bad_pred)
    n_bad = bad.count()
    if n_bad and on_malformed == "error":
        sample = [
            str({c: r[c] for c in _KEY_COLS})[:120]
            for r in bad.limit(5).collect()
        ]
        raise ValueError(
            f"read_transcripts({fmt}): {n_bad} malformed rows (parse "
            f"failure or null conv_id/turn_idx/text); first offenders: "
            f"{sample} — fix the export or pass on_malformed='drop'"
        )
    ok = raw.filter(~bad_pred)
    return ok, n_bad


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    on_malformed: str = "error",
) -> DataFrame:
    """Transcript table at ``path`` in the canonical schema."""
    df, _ = read_transcripts_with_stats(spark, path, fmt, on_malformed)
    return df


def read_transcripts_with_stats(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    on_malformed: str = "error",
) -> tuple[DataFrame, int]:
    """As ``read_transcripts`` but also returns the malformed-row count
    (always 0 under ``on_malformed='error'``, which raises instead)."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
        # case-insensitive column resolution: validate AND select
        # through the same lowercase map, so a 'Conv_Id' export cannot
        # pass the presence check and then silently null out in the
        # case-sensitive select
        by_lower = {c.lower(): c for c in df.columns}
        missing = [c for c in _KEY_COLS if c not in by_lower]
        if missing:
            raise ValueError(
                f"read_transcripts(parquet): missing columns {missing} "
                f"in {path} (schema: {df.columns})"
            )
        # cast to the canonical types; extra columns are dropped so
        # every downstream consumer sees one shape
        canon = spark.createDataFrame([], TRANSCRIPT_SCHEMA).schema
        cols = [
            (
                F.col(by_lower[f.name]).cast(f.dataType).alias(f.name)
                if f.name in by_lower
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
            for f in canon.fields
        ]
        # the same malformed contract as the text formats: null key
        # columns (present in the file, or minted by a failed cast —
        # e.g. a non-numeric turn_idx) must be loud, not format-
        # dependent
        return _validated(df.select(*cols), fmt, on_malformed)
    if fmt in ("jsonl", "json"):
        raw = (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("mode", "PERMISSIVE")
            .json(path)
        )
        return _validated(raw, fmt, on_malformed)
    if fmt == "csv":
        raw = (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("header", "true")
            # per-turn text equality is a hard invariant: Spark's CSV
            # reader trims unquoted leading/trailing whitespace by
            # DEFAULT, silently mutating text — disable both (exports
            # must write with the same options, see tests)
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            # transcript text routinely contains newlines: without
            # multiLine the quoted field splits into fragment rows
            # whose key columns are non-null (silent truncation)
            .option("multiLine", "true")
            # distinguish written nulls from legitimate empty strings
            .option("nullValue", CSV_NULL)
            .option("emptyValue", "")
            .csv(path)
        )
        return _validated(raw, fmt, on_malformed)
    raise ValueError(f"unknown transcript format {fmt!r}")
