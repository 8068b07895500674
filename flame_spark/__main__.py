"""CLI mirroring the reference's batch pipeline (flame.py:1316-1386):

    python -m flame_spark --input_path DIR [--input_path2 DIR2]
        [--ngram 6 --n_out 1 --min_text_length 150 --keep_texts 10000]
        [--vocab_size auto] [--similarity_threshold auto]
        [--bigram_normalization_enabled] [--phonetic_reduction_enabled]
        [--auto_tune] [--no_reports] [--output_dir OUT]

Runs: load corpus (directory of *.txt) -> normalize -> BPE -> LNO
shingles -> pairwise TF-IDF cosine -> auto threshold -> writes
sim_pairs.parquet (the dist_mat analog), similarity_summary.tsv-shaped
parquet, linguistic variations parquet, the HTML comparison report, and
the SVG heatmap. A user of the reference points this at the same
directory they point flame.py at.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="flame_spark")
    ap.add_argument("--input_path", required=True)
    ap.add_argument("--input_path2", default="")
    ap.add_argument("--file_suffix", default=".txt")
    ap.add_argument("--keep_texts", type=int, default=10000)
    ap.add_argument("--ngram", type=int, default=6)
    ap.add_argument("--n_out", type=int, default=1)
    ap.add_argument("--min_text_length", type=int, default=150)
    ap.add_argument("--similarity_threshold", default="auto")
    ap.add_argument("--vocab_size", default="auto")
    ap.add_argument("--bigram_normalization_enabled", action="store_true")
    ap.add_argument("--phonetic_reduction_enabled", action="store_true")
    ap.add_argument("--auto_tune", action="store_true")
    ap.add_argument("--max_gap_words", type=int, default=5)
    ap.add_argument("--fuzz_threshold", type=float, default=0.75)
    ap.add_argument("--no_reports", action="store_true")
    ap.add_argument("--output_dir", default="./flame_spark_out")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from .autotune import auto_tune_from_docs
    from .config import FlameConfig
    from .pipeline import auto_threshold, build_index, pairwise_similarity
    from .reports import (
        linguistic_variations_df,
        render_comparison_html,
        render_heatmap_svg,
        summary_related_docs,
    )
    from .session import get_spark
    from .sources import load_text_dir

    if not os.path.isdir(args.input_path):
        # mirror the reference's warn-and-abort (flame.py:388-390, :426-428)
        print(f"Error: input path {args.input_path!r} does not exist or is "
              "not a directory. Aborting.")
        return 1

    spark = get_spark("flame_spark_cli", cpus=args.cpus)
    os.makedirs(args.output_dir, exist_ok=True)

    cfg = FlameConfig(
        ngram=args.ngram,
        n_out=args.n_out,
        min_text_length=args.min_text_length,
        keep_texts=args.keep_texts,
        tokenizer="bpe",
        vocab_size=args.vocab_size,
        bigram_enabled=args.bigram_normalization_enabled,
        phonetic_enabled=args.phonetic_reduction_enabled,
    )
    cfg.validate()

    docs = load_text_dir(
        spark, args.input_path, args.file_suffix, cfg.min_text_length, cfg.keep_texts
    )
    inter_n1 = None
    if args.input_path2 and os.path.isdir(args.input_path2):
        docs2 = load_text_dir(
            spark, args.input_path2, args.file_suffix, cfg.min_text_length, None
        )
        inter_n1 = docs.count()
        docs2 = docs2.withColumn("doc_id", F.col("doc_id") + inter_n1)
        docs = docs.unionByName(docs2)
        print(f"inter-comparison mode: corpus1 ends at doc_id {inter_n1 - 1}")

    n_docs = docs.count()
    if n_docs == 0:
        print("Error: no valid texts loaded. Aborting.")
        spark.stop()
        return 1
    print(f"loaded {n_docs} documents")

    index = build_index(docs.select("doc_id", "text"), cfg)

    if args.auto_tune:
        ng, no, snr = auto_tune_from_docs(index.docs, index.artifacts.encoder, 30,
                                          cfg.ngram, cfg.n_out)
        if (ng, no) != (cfg.ngram, cfg.n_out):
            print(f"auto-tune selected ngram={ng} n_out={no} (snr={snr:.4f}); rebuilding features")
            cfg.ngram, cfg.n_out = ng, no
            index = build_index(docs.select("doc_id", "text"), cfg)

    if inter_n1 is None:
        pairs = pairwise_similarity(index).persist()
        if str(args.similarity_threshold).lower() == "auto":
            threshold = auto_threshold(index, pairs)
            print(f"auto threshold (Otsu): {threshold:.4f}")
        else:
            threshold = float(args.similarity_threshold)
    else:
        # inter-comparison semantics (flame.py:793-801): artifacts and
        # IDF fit on the UNION, then the RECTANGULAR matrix1 x matrix2^T
        # only — no same-corpus pairs, and the auto threshold is Otsu
        # over those rectangular nonzero cells once each (no doubling,
        # no 1.0 diagonal — the inter dist_mat has neither).
        from .similarity import (
            cosine_pairs_inter,
            otsu_threshold_distributed,
            tfidf_normalized_inter,
        )

        p1 = index.postings.filter(F.col("doc_id") < inter_n1)
        p2 = index.postings.filter(F.col("doc_id") >= inter_n1)
        w1, w2 = tfidf_normalized_inter(p1, p2, index.stats.n_docs)
        pairs = cosine_pairs_inter(w1, w2).persist()
        if str(args.similarity_threshold).lower() == "auto":
            threshold = otsu_threshold_distributed(pairs.select("score"))
            print(f"auto threshold (Otsu, inter rectangular): {threshold:.4f}")
        else:
            threshold = float(args.similarity_threshold)

    sim_path = os.path.join(args.output_dir, "sim_pairs.parquet")
    pairs.write.mode("overwrite").parquet(sim_path)
    print(f"wrote {sim_path} (dist_mat analog)")

    from .artifacts_io import save_artifacts

    save_artifacts(index.artifacts, os.path.join(args.output_dir, "artifacts.json"))
    if index.artifacts.encoder is None and index.artifacts.encoder_df is not None:
        # distributed-vocab build: the token->id table lives in parquet
        # (artifacts.json stores encoder: null) — persist it here or the
        # vocabulary would be lost to artifact consumers
        index.artifacts.encoder_df.write.mode("overwrite").parquet(
            os.path.join(args.output_dir, "vocab.parquet")
        )

    if not args.no_reports:
        summary_related_docs(pairs, index.docs, threshold).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.output_dir, "similarity_summary.parquet"))
        linguistic_variations_df(
            pairs, index.docs, threshold, args.max_gap_words, args.fuzz_threshold
        ).write.mode("overwrite").parquet(
            os.path.join(args.output_dir, "linguistic_variations.parquet")
        )
        name_df = docs.select("doc_id", "text", "name")
        files = render_comparison_html(
            pairs, name_df, threshold, args.output_dir, args.max_gap_words,
            name_col="name",
        )
        print(f"wrote {len(files)} HTML comparison file(s)")
        hm = render_heatmap_svg(
            pairs, n_docs, os.path.join(args.output_dir, "heatmap.svg")
        )
        print(f"heatmap: {hm or 'skipped (>=2000 docs)'}")

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
