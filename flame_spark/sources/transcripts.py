"""Transcript table readers: parquet (the Iceberg stand-in), ORC,
JSONL and CSV — the interchange formats conversation logs actually
arrive in.

Contract: every reader returns the canonical transcript schema
(streaming.TRANSCRIPT_SCHEMA: conv_id, turn_idx, role, text, tool, ts)
with explicit types — NO schema inference (an inferred all-null column
or a turn_idx that arrives as string would silently corrupt doc-id
assignment downstream). Malformed rows are handled explicitly, in the
SAME job as the caller's action (single scan — at warehouse scale an
eager validation count would read the whole source twice per ingest):

- ``on_malformed="error"`` (default): every canonical column carries an
  inline per-row check — the first malformed row a job touches raises
  with that row's key values in the message. Ingestion must not
  silently drop turns (the per-turn text-equality invariant depends on
  completeness). Because the check is inline, the guarantee is scoped
  to the rows the caller's action actually processes: a full-scan
  action (count, write, aggregate) validates the whole source; a
  short-circuiting one (``limit``) validates what it read.
- ``on_malformed="drop"``: malformed rows are filtered out and counted
  by a ``df.observe`` metric inside the caller's own job; the count is
  available from the returned stats handle after the first full-scan
  action.

Scale: both text formats read distributed with the explicit schema (no
inference pass over the data); validation is a null-check expression
over the parsed columns (a malformed PERMISSIVE row nulls every
field), not a second parse and not a second scan.

CSV splittability: ``multiLine=true`` is required for transcript text
(it routinely contains newlines; without it a quoted field splits into
fragment rows = silent truncation) but makes each CSV file a SINGLE
input split — one task reads the whole file no matter how many
executors the cluster has. The documented contract is therefore
many-files exports (each file ≲128 MB); a single huge CSV serializes
the scan and ``read_transcripts`` warns loudly (see
``_warn_unsplittable_csv``). JSONL — the preferred log format —
parquet and ORC split fine.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.sql.types import StructType

from ..streaming import TRANSCRIPT_SCHEMA

def _canon_fields():
    """TRANSCRIPT_SCHEMA is DDL text (the readStream-friendly form);
    the typed fields are parsed lazily — ``fromDDL`` needs an active
    SparkContext, which does not exist at import time."""
    return StructType.fromDDL(TRANSCRIPT_SCHEMA).fields

_KEY_COLS = ("conv_id", "turn_idx", "text")
#: null sentinel for CSV: the reader cannot otherwise distinguish a
#: written null from a legitimate empty string (both are an empty
#: field with default options) — faithful exports write with the same
#: ``nullValue`` (see tests); a vanilla export's nulls then read back
#: as '' for string columns, which is safe but lossy.
CSV_NULL = "\\N"
#: per-file size above which a multiLine CSV's one-task-per-file scan
#: is considered a scale hazard worth warning about
CSV_SPLIT_WARN_BYTES = 128 * 1024 * 1024


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


class MalformedStats:
    """Malformed-row count for a ``read_transcripts_with_stats`` read.

    Under ``on_malformed='drop'`` the count comes from a ``df.observe``
    metric collected DURING the caller's first action on the returned
    DataFrame — ``n_bad`` blocks until that action has run (run
    ``df.count()`` or your write first). Under ``on_malformed='error'``
    it is constantly 0: any malformed row would have raised instead."""

    def __init__(self, observation: Observation | None):
        self._obs = observation

    @property
    def n_bad(self) -> int:
        if self._obs is None:
            return 0
        return int(self._obs.get["n_bad"])


def _row_error(fmt: str):
    """Per-row error message column for the inline malformed check —
    carries the offending row's key values, the contract the old eager
    path provided via a driver-side sample collect."""
    return F.format_string(
        "read_transcripts(%s): malformed row (parse failure or null "
        "conv_id/turn_idx/text): conv_id=%s turn_idx=%s text=%s "
        "— fix the export or pass on_malformed='drop'",
        F.lit(fmt),
        F.coalesce(F.col("conv_id").cast("string"), F.lit("NULL")),
        F.coalesce(F.col("turn_idx").cast("string"), F.lit("NULL")),
        F.coalesce(F.substring(F.col("text"), 1, 80), F.lit("NULL")),
    )


def _validated(
    raw: DataFrame, fmt: str, on_malformed: str
) -> tuple[DataFrame, MalformedStats]:
    # NO corrupt-record column: Spark populates it lazily during the
    # parse of *referenced* columns, so filtering on it without caching
    # returns inconsistent results (count and collect can disagree).
    if on_malformed not in ("error", "drop"):
        raise ValueError(
            f"on_malformed must be 'error' or 'drop', got {on_malformed!r}"
        )
    bad_pred = malformed_pred()
    if on_malformed == "error":
        # inline poison FILTER: good rows evaluate to true (kept), a
        # malformed row evaluates raise_error — so the first malformed
        # row ANY action touches raises inside that same job, one scan,
        # no eager pre-count. A filter (not a poisoned projection) is
        # load-bearing: column pruning strips unused projections — a
        # bare df.count() would silently skip a projected check — but a
        # filter executes for every row under every action. The
        # when/raise_error predicate is not translatable to a parquet
        # pushdown filter, so it runs Spark-side above the scan.
        err = _row_error(fmt)
        keep = F.when(
            bad_pred, F.raise_error(err).cast("boolean")
        ).otherwise(F.lit(True))
        return raw.filter(keep), MalformedStats(None)
    # drop mode: the observe node sits ABOVE the scan but BELOW the
    # filter (Catalyst does not push filters through CollectMetrics),
    # so dropped rows are counted in the caller's own job.
    # - anonymous Observation: names must be unique per query, and a
    #   caller unioning two drop-mode reads of the same format would
    #   hit DUPLICATED_METRICS_NAME with any fixed name;
    # - count(when(...)), not sum(cast): SUM over zero rows is SQL
    #   NULL, which would make n_bad crash on an empty export
    obs = Observation()
    observed = raw.observe(
        obs, F.count(F.when(bad_pred, F.lit(1))).alias("n_bad")
    )
    return observed.filter(~bad_pred), MalformedStats(obs)


def _warn_unsplittable_csv(raw: DataFrame) -> None:
    """multiLine CSV = one task per file: warn when the export shape
    serializes the scan (a single file, or any file past the size
    threshold). inputFiles() is listing metadata — no scan."""
    import os

    files = raw.inputFiles()
    big = []
    for uri in files:
        local = uri[7:] if uri.startswith("file:") and uri[5:7] == "//" else (
            uri[5:] if uri.startswith("file:") else uri
        )
        try:
            if os.path.getsize(local) >= CSV_SPLIT_WARN_BYTES:
                big.append(local)
        except OSError:
            pass  # non-local filesystem; the file-count check still runs
    if len(files) == 1 or big:
        what = (
            f"{len(big)} file(s) over {CSV_SPLIT_WARN_BYTES >> 20} MB"
            if big
            else "a single file"
        )
        warnings.warn(
            f"read_transcripts(csv): multiLine CSV is unsplittable — "
            f"each file is read by ONE task, and this export is {what}. "
            "Split the export into many ~128 MB files (or use JSONL/"
            "parquet, which split) so the scan parallelizes.",
            UserWarning,
            stacklevel=3,
        )


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
) -> tuple[DataFrame, MalformedStats]:
    """As ``read_transcripts`` but also returns the malformed-row stats
    handle (``stats.n_bad`` — populated by the first action under
    ``on_malformed='drop'``; constantly 0 under ``'error'``, which
    raises from the action instead)."""
    if fmt in ("parquet", "orc"):
        # ORC shares the typed-columnar contract with parquet (real
        # schema in the footer, splittable stripes/row-groups, pushdown
        # + pruning) — one branch serves both
        df = spark.read.format(fmt).load(path)
        # case-insensitive column resolution: validate AND select
        # through the same lowercase map, so a 'Conv_Id' export cannot
        # pass the presence check and then silently null out in the
        # case-sensitive select
        by_lower = {c.lower(): c for c in df.columns}
        missing = [c for c in _KEY_COLS if c not in by_lower]
        if missing:
            raise ValueError(
                f"read_transcripts({fmt}): missing columns {missing} "
                f"in {path} (schema: {df.columns})"
            )
        # cast to the canonical types; extra columns are dropped so
        # every downstream consumer sees one shape
        cols = [
            (
                F.col(by_lower[f.name]).cast(f.dataType).alias(f.name)
                if f.name in by_lower
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
            for f in _canon_fields()
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
            # whose key columns are non-null (silent truncation).
            # COST: multiLine makes each file ONE input split — see
            # module docstring; _warn_unsplittable_csv below
            .option("multiLine", "true")
            # distinguish written nulls from legitimate empty strings
            .option("nullValue", CSV_NULL)
            .option("emptyValue", "")
            .csv(path)
        )
        _warn_unsplittable_csv(raw)
        return _validated(raw, fmt, on_malformed)
    raise ValueError(f"unknown transcript format {fmt!r}")
