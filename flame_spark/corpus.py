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

    Scalable two-phase ranking (no global single-reducer sort, no join):
    range-partition the FULL rows by the key and sort within partitions
    (one wide exchange), persist, count rows per partition (tiny job),
    then a mapInPandas pass stamps ``offset[pid] + local position``.
    """
    spark = df.sparkSession
    if num_range_parts is None:
        num_range_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranked = (
        df.repartitionByRange(num_range_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranked.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_bc = spark.sparkContext.broadcast(offsets)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", doc_id long"

    def stamp(it):
        seen = 0
        pid = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
                base = offsets_bc.value[pid]
            ids = np.arange(seen, seen + len(pdf), dtype=np.int64) + base
            seen += len(pdf)
            out = pdf.drop(columns=["_pid"])
            out["doc_id"] = ids
            yield out

    return ranked.mapInPandas(stamp, schema=out_schema)


def add_doc_id_conv(df: DataFrame) -> DataFrame:
    """Dense doc_id for transcripts with CONTIGUOUS per-conversation
    turn_idx (the FIXTURES.md contract: 0..turns(c)-1).

    doc_id = offset(conv_id) + turn_idx where offsets are a prefix sum
    over per-conversation turn counts — ONE small aggregation (n_conv
    rows), one window over that small table, one broadcast join. No
    full-row sort, no full-row persist: the cheap path the generic
    ``add_doc_id`` cannot take without the contiguity guarantee.
    """
    from pyspark.sql import Window

    counts = df.groupBy("conv_id").agg(F.count("*").alias("_n"))
    w = Window.orderBy("conv_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long")
    ).select("conv_id", "_offset")
    return df.join(F.broadcast(offsets), "conv_id").withColumn(
        "doc_id", (F.col("_offset") + F.col("turn_idx")).cast("long")
    ).drop("_offset")


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


def make_canon_stage1_udf(bigram_rules: dict[str, str] | None):
    """Fused S2 + P1-P3 (one Arrow round trip): whitespace canon AND
    stage1 normalize, returned as a struct so the min-length filter can
    run on the canonical text while stage1 is already computed.

    Vectorized with pandas C string kernels: ``.str.replace`` with
    regex=False is the same sequential literal replacement the
    reference applies per doc (flame.py:435-447), and Python-re
    ``\\s+`` here matches ``canonicalize_whitespace`` exactly.
    """
    from .normalize import ONE_TO_MANY

    rules = dict(bigram_rules) if bigram_rules else None

    import re as _re

    mufi_any = "[" + "".join(map(_re.escape, ONE_TO_MANY)) + "]"

    @F.pandas_udf("text string, stage1 string")
    def canon_stage1(s: pd.Series) -> pd.DataFrame:
        canon = (
            s.fillna("").str.strip().str.replace(r"\s+", " ", regex=True)
        )
        st1 = canon.str.lower()
        # each .str.replace is a full pass over text; MUFI sources are
        # non-ASCII, so ONE membership pass finds the affected rows and
        # the 11 fold passes run on that subset only — on mostly-ASCII
        # corpora this cuts the normalize stage's memory traffic ~3x
        mask = st1.str.contains(mufi_any, regex=True)
        if mask.any():
            sub = st1[mask]
            for src, dst in ONE_TO_MANY.items():
                sub = sub.str.replace(src, dst, regex=False)
            st1 = st1.copy()
            st1[mask] = sub
        if rules:
            for src, dst in rules.items():
                st1 = st1.str.replace(src, dst, regex=False)
        return pd.DataFrame({"text": canon, "stage1": st1})

    return canon_stage1


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


def _hash_windows_flat(
    ids: np.ndarray, doc_of_tok: np.ndarray, n_rows: int,
    n_vocab: int, ngram: int, n_out: int,
) -> list[list[int]]:
    """Shared LNO hashing core over a FLATTENED id stream: vectorized
    Mersenne-61 passes per keep-combination, cross-document windows
    masked out, results re-split per doc. No per-row Python loop."""
    from itertools import combinations

    from .hashing import mulmod61, powmod61, _reduce61

    keep = ngram - n_out
    out_lists: list[list[int]] = [[] for _ in range(n_rows)]
    n_tok = ids.size
    if n_tok >= ngram:
        win = np.lib.stride_tricks.sliding_window_view(ids, ngram)
        win_doc = doc_of_tok[: n_tok - ngram + 1]
        valid = win_doc == doc_of_tok[ngram - 1 :]
        vwin = win[valid].astype(np.uint64)
        vdoc = win_doc[valid]
        if vdoc.size:
            combo_hashes = []
            for combo in combinations(range(ngram), keep):
                acc = np.zeros(vdoc.size, dtype=np.uint64)
                for p, c in enumerate(combo):
                    power = np.uint64(powmod61(n_vocab, p))
                    acc = _reduce61(acc + mulmod61(power, vwin[:, c]))
                combo_hashes.append(acc.astype(np.int64))
            all_h = np.concatenate(combo_hashes)
            all_d = np.tile(vdoc, len(combo_hashes))
            order = np.argsort(all_d, kind="stable")
            all_h = all_h[order]
            counts = np.bincount(all_d, minlength=n_rows)
            offsets = np.concatenate([[0], np.cumsum(counts)])
            for r in range(n_rows):
                if counts[r]:
                    out_lists[r] = all_h[offsets[r] : offsets[r + 1]].tolist()
    return out_lists


def make_shingle_udf(encoder_bc, ngram: int, n_out: int, base: int | None = None):
    """Batch-vectorized LNO shingle: the whole Arrow batch is flattened
    to one token array, encoded with ONE searchsorted against the
    sorted vocab (unknowns dropped, flame.py:686-687), and hashed via
    ``_hash_windows_flat``. Requires the driver-collected encoder dict —
    the bounded-vocab path (BPE, or word mode under
    ``cfg.max_collect_vocab``); the unbounded-vocab path uses
    ``make_shingle_from_ids_udf`` over join-encoded ids instead.

    Feature ORDER within a row differs from the reference's combo-major
    concat (here: window-major per combo block across the batch, then
    re-split per doc). Only the multiset per doc is observable (TF
    counts, flame.py:778), so postings/scores are unaffected.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingle(tokens: pd.Series) -> pd.Series:
        encoder: dict[str, int] = encoder_bc.value
        # rolling-hash base: vocab size by default; a caller-pinned base
        # (incremental OOV-extend mode) keeps term hashes stable while
        # the vocabulary grows across ingests
        V = base if base else len(encoder)
        keep = ngram - n_out
        n_rows = len(tokens)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        if V == 0 or len(encoder) == 0 or keep < 1:
            return pd.Series([[] for _ in range(n_rows)])

        vocab_arr = np.array(sorted(encoder), dtype=object)
        vocab_ids = np.array([encoder[t] for t in vocab_arr], dtype=np.int64)

        tok_lists = tokens.to_numpy()
        lens = np.fromiter(
            (0 if t is None else len(t) for t in tok_lists), dtype=np.int64,
            count=n_rows,
        )
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in tok_lists if t is not None and len(t)]
        ) if lens.sum() else np.array([], dtype=object)

        # encode: one searchsorted; drop unknowns
        pos = np.searchsorted(vocab_arr, flat)
        pos_c = np.clip(pos, 0, vocab_arr.size - 1)
        known = vocab_arr[pos_c] == flat
        doc_of_tok = np.repeat(np.arange(n_rows), lens)[known]
        ids = vocab_ids[pos_c[known]]
        return pd.Series(_hash_windows_flat(ids, doc_of_tok, n_rows, V, ngram, n_out))

    return shingle


def make_shingle_from_ids_udf(n_vocab: int, ngram: int, n_out: int):
    """LNO shingle over PRE-ENCODED token ids (``array<long>``) — the
    unbounded-vocabulary path: no vocab dict ships to executors, only
    the scalar vocab size (the rolling-hash base). Same hashing core as
    ``make_shingle_udf``, so outputs are identical for identical ids."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingle_ids(id_lists: pd.Series) -> pd.Series:
        keep = ngram - n_out
        n_rows = len(id_lists)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        if n_vocab == 0 or keep < 1:
            return pd.Series([[] for _ in range(n_rows)])
        arrs = id_lists.to_numpy()
        lens = np.fromiter(
            (0 if a is None else len(a) for a in arrs), dtype=np.int64, count=n_rows
        )
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrs if a is not None and len(a)]
        ) if lens.sum() else np.array([], dtype=np.int64)
        doc_of_tok = np.repeat(np.arange(n_rows), lens)
        return pd.Series(
            _hash_windows_flat(flat, doc_of_tok, n_rows, n_vocab, ngram, n_out)
        )

    return shingle_ids


def build_vocab_df(docs: DataFrame, token_col: str = "tokens") -> DataFrame:
    """(tok, tid) with tid = dense rank of the token in global sorted
    order — the distributed equivalent of the collected encoder dict
    (flame.py:680-684), built with the same two-phase range-partition
    ranking as ``add_doc_id``: no single-reducer sort, no driver
    collect. Safe at any vocabulary size."""
    distinct = docs.select(F.explode(token_col).alias("tok")).distinct()
    return add_doc_id(distinct, ["tok"]).withColumnRenamed("doc_id", "tid")


def encode_tokens_joined(docs: DataFrame, vocab_df: DataFrame) -> DataFrame:
    """+ ``token_ids: array<long>`` — join-based token encode for
    unbounded vocabularies: posexplode -> equi-join on token ->
    re-assemble in position order. Three shuffles, all linear in token
    count; nothing corpus-sized touches the driver."""
    pos = docs.select("doc_id", F.posexplode("tokens").alias("pos", "tok"))
    ids = pos.join(vocab_df, "tok").select("doc_id", "pos", "tid")
    arr = (
        ids.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("ps"))
        .select(
            "doc_id",
            F.transform("ps", lambda s: s["tid"].cast("long")).alias("token_ids"),
        )
    )
    return docs.join(arr, "doc_id", "left").withColumn(
        "token_ids",
        F.coalesce(F.col("token_ids"), F.array().cast("array<long>")),
    )


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
    # token -> dense id. None when the vocabulary exceeded
    # cfg.max_collect_vocab (word mode at scale): then encoder_df holds
    # the same mapping distributed and n_vocab its size.
    encoder: dict[str, int] | None
    vocab_size: int
    encoder_df: object | None = None  # DataFrame(tok, tid) in joined mode
    n_vocab: int = 0
    # Observation piggybacked on the encoder job: {'n_docs',
    # 'sum_windows'} — lets fastbuild derive (n_docs, avgdl) with zero
    # extra job barriers. None on the pinned-artifact path.
    size_obs: object | None = None
    # LNO rolling-hash base. 0 = "vocab size" (the default, reference
    # parity). The incremental indexer's OOV-extend mode PINS this at
    # initial build so term hashes stay stable while the vocabulary
    # grows across ingests (corpus tokens minted above the pinned
    # range would otherwise change every window hash).
    hash_base: int = 0

    def lookup_ids(self, tokens: list[str]) -> dict[str, int]:
        """token -> id for a BOUNDED token list (e.g. one query's
        tokens): dict lookup when collected, filtered collect from the
        distributed vocab otherwise — never a full-vocab collect."""
        if self.encoder is not None:
            return {t: self.encoder[t] for t in tokens if t in self.encoder}
        want = list({t for t in tokens})
        rows = self.encoder_df.filter(F.col("tok").isin(want)).collect()
        return {r["tok"]: int(r["tid"]) for r in rows}


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
    df: DataFrame, cfg: FlameConfig, artifacts: CorpusArtifacts | None = None
) -> tuple[DataFrame, CorpusArtifacts]:
    """docs(doc_id, text) -> docs(doc_id, norm_text, tokens) + artifacts.

    Reproduces the reference preprocessing order end-to-end
    (flame.py:416-580). ``df`` must have columns (doc_id, text).

    Pass ``artifacts`` to run with PINNED artifacts (a persisted model,
    artifacts_io.load_artifacts — the reference's S10 reuse path, and
    the incremental indexer's append path): every learning step
    (lost-char rules, BPE training, encoder collection) is skipped and
    the pinned state applies verbatim. Tokens outside the pinned
    encoder later drop from the LNO windows exactly like the
    reference's unknown handling (flame.py:686-687).
    """
    if artifacts is not None:
        return _prepare_docs_pinned(df, cfg, artifacts), artifacts
    cfg.validate()
    spark = df.sparkSession
    sc = spark.sparkContext

    # S2/S3 + P1-P3 fused: one Arrow pass computes the whitespace-
    # canonical text and the stage1-normalized text together; the
    # min-length filter applies to the canonical text (flame.py:408).
    art0 = default_artifacts(cfg.bigram_enabled, cfg.phonetic_enabled, cfg.alphabet)
    canon_stage1 = make_canon_stage1_udf(
        art0.bigram_rules if cfg.bigram_enabled else None
    )
    docs = df.select("doc_id", canon_stage1(F.col("text")).alias("cs")).select(
        "doc_id", F.col("cs.text").alias("text"), F.col("cs.stage1").alias("stage1")
    )
    docs = docs.filter(F.length("text") >= cfg.min_text_length)
    if cfg.keep_texts is not None:
        docs = docs.filter(F.col("doc_id") < cfg.keep_texts)
    stage1_cached = docs.persist()
    docs = stage1_cached

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

    # cache the fully-tokenized frame BEFORE the encoder job so the
    # normalize/tokenize UDFs run exactly once; release the stage1 cache
    docs = docs.persist()

    # piggyback the corpus-size statistics onto the encoder job below
    # (Observation = zero extra job barrier): n docs and the window-
    # count sum give fastbuild its (n_docs, avgdl) without a separate
    # corpus_stats action. Windows per doc = max(0, k - ngram + 1).
    from pyspark.sql import Observation

    obs = Observation(f"corpus_stats_{id(docs)}")
    docs_obs = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(F.size("tokens") - (cfg.ngram - 1), F.lit(0)).cast("long")
        ).alias("sum_windows"),
    )

    # encoder: sorted distinct tokens -> dense ids (flame.py:680-684).
    # In BPE mode the vocabulary is bounded by the trained vocab, so a
    # driver collect is O(vocab) at any corpus size. In word mode the
    # vocabulary grows with the corpus: collect ONLY when the distinct
    # count is under cfg.max_collect_vocab, else keep the mapping
    # distributed (encoder_df) and encode via join (add_features).
    encoder = None
    encoder_df = None
    distinct_df = docs_obs.select(F.explode("tokens").alias("tok")).distinct()
    if cfg.tokenizer == "bpe":
        # bounded by the trained vocab: one collect job, any corpus size
        distinct_tokens = [r["tok"] for r in distinct_df.collect()]
    else:
        # word mode: probe with LIMIT cap+1 — one job, bounded driver
        # memory. A full result means we saw the whole vocabulary.
        probe = distinct_df.limit(cfg.max_collect_vocab + 1).collect()
        distinct_tokens = (
            [r["tok"] for r in probe]
            if len(probe) <= cfg.max_collect_vocab
            else None
        )
    if distinct_tokens is not None:
        encoder = {t: i for i, t in enumerate(sorted(distinct_tokens))}
        n_vocab = len(encoder)
    else:
        # vocabulary exceeds the collect cap: keep it distributed
        distinct_df = distinct_df.persist()
        n_vocab = distinct_df.count()
        encoder_df = add_doc_id(distinct_df, ["tok"]).withColumnRenamed(
            "doc_id", "tid"
        ).persist()
    stage1_cached.unpersist()

    artifacts = CorpusArtifacts(
        norm=art0, bpe=bpe_model, encoder=encoder, vocab_size=vocab_size,
        encoder_df=encoder_df, n_vocab=n_vocab, size_obs=obs,
    )
    return docs, artifacts


def _prepare_docs_pinned(
    df: DataFrame, cfg: FlameConfig, artifacts: CorpusArtifacts
) -> DataFrame:
    """The scan pipeline with every artifact pinned (no learning jobs):
    canon+stage1 -> min-length filter -> LUT(s) -> tokenize. One Arrow
    chain, zero driver collects."""
    cfg.validate()
    sc = df.sparkSession.sparkContext
    canon_stage1 = make_canon_stage1_udf(
        artifacts.norm.bigram_rules if cfg.bigram_enabled else None
    )
    docs = df.select("doc_id", canon_stage1(F.col("text")).alias("cs")).select(
        "doc_id", F.col("cs.text").alias("text"), F.col("cs.stage1").alias("stage1")
    )
    docs = docs.filter(F.length("text") >= cfg.min_text_length)
    if cfg.keep_texts is not None:
        docs = docs.filter(F.col("doc_id") < cfg.keep_texts)
    lut_udf = make_lut_udf(sc.broadcast(artifacts.norm.main_lut()))
    docs = docs.withColumn("norm_text", lut_udf(F.col("stage1")))
    plut = artifacts.norm.phonetic_lut()
    if plut is not None:
        docs = docs.withColumn(
            "norm_text", make_lut_udf(sc.broadcast(plut))(F.col("norm_text"))
        )
    docs = docs.drop("stage1")
    if cfg.tokenizer == "bpe":
        docs = docs.withColumn(
            "tokens",
            make_bpe_tokenize_udf(sc.broadcast(artifacts.bpe))(F.col("norm_text")),
        )
    else:
        docs = docs.withColumn(
            "tokens",
            F.filter(F.split(F.col("norm_text"), "[^a-z0-9]+"), lambda x: x != ""),
        )
    return docs.persist()


def add_features(
    docs: DataFrame, artifacts: CorpusArtifacts, cfg: FlameConfig
) -> DataFrame:
    """+ ``features: array<long>`` — LNO-gram hashes (T5).

    Collected-encoder mode broadcasts the dict into one Arrow pass;
    joined mode (vocab > cfg.max_collect_vocab) encodes by join and
    hashes the id arrays — identical features either way (same sorted
    dense-rank ids, same hashing core)."""
    sc = docs.sparkSession.sparkContext
    if artifacts.encoder is not None:
        encoder_bc = sc.broadcast(artifacts.encoder)
        shingle = make_shingle_udf(
            encoder_bc, cfg.ngram, cfg.n_out, base=artifacts.hash_base or None
        )
        return docs.withColumn("features", shingle(F.col("tokens")))
    if artifacts.encoder_df is None:
        raise ValueError(
            "add_features: artifacts carry neither a collected encoder "
            "nor a distributed vocab (encoder_df) — attach one "
            "(incremental warehouses persist it under vocab/)"
        )
    with_ids = encode_tokens_joined(docs, artifacts.encoder_df)
    shingle_ids = make_shingle_from_ids_udf(
        artifacts.hash_base or artifacts.n_vocab, cfg.ngram, cfg.n_out
    )
    return with_ids.withColumn("features", shingle_ids(F.col("token_ids"))).drop(
        "token_ids"
    )
