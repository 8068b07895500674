"""Corpus preparation: doc ids, normalization, tokenization, shingling.

This is the scan-side half of the engine (SURVEY.md §3.2 steps 1-2).
Everything is DataFrame-declarative except the four Arrow-vectorized
pandas UDFs (stage1 normalize, LUT apply, BPE tokenize, LNO shingle) —
the per-row work the reference also does vectorized in NumPy
(flame.py:28-56, :175-196, :675-678, :710-739).

Scale notes (100 TB):
- ``add_doc_id`` assigns dense global ids without a single-partition
  global sort: range-repartition by key, per-partition local positions,
  driver-side prefix-sum of partition counts (K integers), broadcast
  offsets. One wide stage + one small job.
- artifact learning (BPE model, NFKD char rules) is driver-side over a
  capped, canonically-ordered sample (``cfg.learn_sample_docs``); the
  lost-char histogram is fully distributed (groupBy char).
- the token vocabulary is bounded by the BPE vocab size, so collecting
  the encoder dict is O(vocab), not O(corpus).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .bpe import BpeModel, build_encoder, suggest_vocab_size, train_bpe
from .config import FlameConfig
from .hashing import lno_gram_hashes
from .normalize import (
    NormArtifacts,
    build_lut,
    canonicalize_whitespace,
    default_artifacts,
    learn_nfkd_rules,
    ONE_TO_ONE,
    stage1_normalize,
)

# ---------------------------------------------------------------------------
# doc id assignment
# ---------------------------------------------------------------------------


def add_doc_id(df: DataFrame, order_cols: list[str], num_range_parts: int | None = None) -> DataFrame:
    """Dense global doc_id = rank over ``order_cols`` (unique keys required).

    Scalable two-phase ranking (no global single-reducer sort):
    range-partition by the key, sort within partitions, local positions
    via a per-partition window, then add driver-computed partition
    offsets. The ranked keyset is persisted so both the count job and
    the assignment read one consistent partitioning.
    """
    spark = df.sparkSession
    if num_range_parts is None:
        num_range_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = (
        df.select(*order_cols)
        .repartitionByRange(num_range_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    keys = keys.persist()
    counts = {
        r["_pid"]: r["n"]
        for r in keys.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (
        keys.withColumn("_local", F.row_number().over(w) - F.lit(1))
        .join(offsets_df, "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )
    out = df.join(ranked, on=order_cols, how="inner")
    keys.unpersist()
    return out


# ---------------------------------------------------------------------------
# pandas UDF factories (broadcast-capturing closures)
# ---------------------------------------------------------------------------


def make_ws_canon_udf():
    @F.pandas_udf(T.StringType())
    def ws_canon(s: pd.Series) -> pd.Series:
        return s.map(lambda t: canonicalize_whitespace(t or ""))

    return ws_canon


def make_stage1_udf(bigram_rules: dict[str, str] | None):
    rules = dict(bigram_rules) if bigram_rules else None

    @F.pandas_udf(T.StringType())
    def stage1(s: pd.Series) -> pd.Series:
        return s.map(lambda t: stage1_normalize(t or "", rules))

    return stage1


def make_lut_udf(lut_bc):
    @F.pandas_udf(T.StringType())
    def lut_apply(s: pd.Series) -> pd.Series:
        lut = lut_bc.value
        def _one(t: str) -> str:
            codes = np.frombuffer((t or "").encode("utf-16le"), dtype=np.uint16)
            return lut[codes].tobytes().decode("utf-16le")
        return s.map(_one)

    return lut_apply


def make_bpe_tokenize_udf(model_bc):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bpe_tokenize(s: pd.Series) -> pd.Series:
        model: BpeModel = model_bc.value
        return s.map(lambda t: model.encode(t or ""))

    return bpe_tokenize


def make_shingle_udf(encoder_bc, ngram: int, n_out: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingle(tokens: pd.Series) -> pd.Series:
        encoder: dict[str, int] = encoder_bc.value
        V = len(encoder)

        def _one(toks) -> list[int]:
            if toks is None:
                return []
            # unknown tokens are dropped, not erred (flame.py:686-687)
            ids = np.array(
                [encoder[t] for t in toks if t in encoder], dtype=np.int64
            )
            return lno_gram_hashes(ids, V, ngram, n_out).tolist()

        return tokens.map(_one)

    return shingle


# ---------------------------------------------------------------------------
# distributed artifact learning
# ---------------------------------------------------------------------------


def distributed_lost_chars(df: DataFrame, text_col: str, alphabet: str, unknown_chr: str = " ") -> dict[str, int]:
    """Distributed lost-char histogram (flame.py:227-239 as a groupBy).

    Per Arrow batch: LUT-gather, np.unique of lost codepoints; then one
    shuffle to sum per char. Result is tiny (distinct BMP chars).
    """
    lut = build_lut(alphabet, dict(ONE_TO_ONE), unknown_chr)
    unk = ord(unknown_chr)

    def batches(it):
        for pdf in it:
            all_codes = []
            for t in pdf[text_col]:
                codes = np.frombuffer((t or "").encode("utf-16le"), dtype=np.uint16)
                mapped = lut[codes]
                all_codes.append(codes[(mapped == unk) & (codes != unk)])
            if all_codes:
                flat = np.concatenate(all_codes)
                vals, counts = np.unique(flat, return_counts=True)
                yield pd.DataFrame(
                    {"code": vals.astype(np.int64), "cnt": counts.astype(np.int64)}
                )

    hist = (
        df.select(text_col)
        .mapInPandas(batches, schema="code long, cnt long")
        .groupBy("code")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    return {chr(int(r["code"])): int(r["cnt"]) for r in hist}


# ---------------------------------------------------------------------------
# full corpus preparation
# ---------------------------------------------------------------------------


@dataclass
class CorpusArtifacts:
    norm: NormArtifacts
    bpe: BpeModel | None
    encoder: dict[str, int]
    vocab_size: int


def load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> + doc_id."""
    df = spark.read.parquet(path)
    return add_doc_id(df, ["conv_id", "turn_idx"])


def docs_from_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: the testdata ``documents`` table already carries doc_id."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )


def prepare_docs(
    df: DataFrame, cfg: FlameConfig
) -> tuple[DataFrame, CorpusArtifacts]:
    """docs(doc_id, text) -> docs(doc_id, norm_text, tokens) + artifacts.

    Reproduces the reference preprocessing order end-to-end
    (flame.py:416-580). ``df`` must have columns (doc_id, text).
    """
    cfg.validate()
    spark = df.sparkSession
    sc = spark.sparkContext

    # S2/S3: whitespace canonicalization + min-length filter (+ first-k)
    ws = make_ws_canon_udf()
    docs = df.select("doc_id", ws(F.col("text")).alias("text"))
    docs = docs.filter(F.length("text") >= cfg.min_text_length)
    if cfg.keep_texts is not None:
        docs = docs.filter(F.col("doc_id") < cfg.keep_texts)

    # P1-P3: lowercase + MUFI 1-to-many + optional bigram rules
    art0 = default_artifacts(cfg.bigram_enabled, cfg.phonetic_enabled, cfg.alphabet)
    stage1 = make_stage1_udf(art0.bigram_rules if cfg.bigram_enabled else None)
    docs = docs.withColumn("stage1", stage1(F.col("text")))
    docs = docs.persist()

    # P6: adaptive rule learning over the distributed lost-char histogram
    lost = distributed_lost_chars(docs, "stage1", cfg.alphabet, art0.unknown_chr)
    from collections import Counter

    art0.learned_rules = learn_nfkd_rules(
        Counter(lost), cfg.alphabet, cfg.char_norm_min_freq
    )

    # P4/P5 (+P7): apply the final LUT(s)
    lut_bc = sc.broadcast(art0.main_lut())
    lut_udf = make_lut_udf(lut_bc)
    docs = docs.withColumn("norm_text", lut_udf(F.col("stage1")))
    plut = art0.phonetic_lut()
    if plut is not None:
        plut_bc = sc.broadcast(plut)
        plut_udf = make_lut_udf(plut_bc)
        docs = docs.withColumn("norm_text", plut_udf(F.col("norm_text")))
    docs = docs.drop("stage1")

    # T1-T4: tokenizer training (driver, canonical order) + tokenization
    bpe_model = None
    vocab_size = 0
    if cfg.tokenizer == "bpe":
        sample_q = docs.select("doc_id", "norm_text").orderBy("doc_id")
        if cfg.learn_sample_docs is not None:
            sample_q = sample_q.limit(cfg.learn_sample_docs)
        sample = [r["norm_text"] for r in sample_q.collect()]
        if str(cfg.vocab_size).lower() == "auto":
            vocab_size = suggest_vocab_size(
                sample,
                min_word_freq=cfg.vocab_min_word_freq,
                coverage=cfg.vocab_coverage,
            )
        else:
            vocab_size = int(cfg.vocab_size)
        # cap at unique words + 256 (flame.py:534-541)
        unique_words = {w for line in sample for w in line.split()}
        vocab_size = min(vocab_size, len(unique_words) + 256)
        bpe_model = train_bpe(sample, vocab_size)
        model_bc = sc.broadcast(bpe_model)
        tok_udf = make_bpe_tokenize_udf(model_bc)
        docs = docs.withColumn("tokens", tok_udf(F.col("norm_text")))
    else:  # 'word': JVM-side split, no UDF
        docs = docs.withColumn(
            "tokens",
            F.filter(
                F.split(F.col("norm_text"), "[^a-z0-9]+"), lambda x: x != ""
            ),
        )

    # encoder: sorted distinct tokens -> dense ids (flame.py:680-684).
    # Bounded by the BPE vocab -> safe to collect at any corpus size.
    distinct_tokens = [
        r["tok"]
        for r in docs.select(F.explode("tokens").alias("tok")).distinct().collect()
    ]
    encoder = {t: i for i, t in enumerate(sorted(distinct_tokens))}

    artifacts = CorpusArtifacts(
        norm=art0, bpe=bpe_model, encoder=encoder, vocab_size=vocab_size
    )
    return docs, artifacts


def add_features(
    docs: DataFrame, artifacts: CorpusArtifacts, cfg: FlameConfig
) -> DataFrame:
    """+ ``features: array<long>`` — LNO-gram hashes (T5)."""
    sc = docs.sparkSession.sparkContext
    encoder_bc = sc.broadcast(artifacts.encoder)
    shingle = make_shingle_udf(encoder_bc, cfg.ngram, cfg.n_out)
    return docs.withColumn("features", shingle(F.col("tokens")))
