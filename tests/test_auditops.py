"""Index audit (auditops.py): the decode-and-verify pass must accept a
freshly built segment table and reject every class of corruption it
claims to detect — each tamper is applied to real segment bytes and
must surface as IndexAuditError."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def seg_pdf(spark):
    """A real (tiny) segment table as pandas, for tampering."""
    from pyspark.sql import functions as F

    from flame_spark.config import FlameConfig
    from flame_spark.fastbuild import build_serving_index

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .limit(60)
    )
    cfg = FlameConfig(
        ngram=3, n_out=1, min_text_length=0, tokenizer="word",
        term_mode="lno", n_shards=4,
    )
    serving = build_serving_index(docs, cfg)
    return serving.segments.toPandas()


def _audit(spark, pdf):
    from flame_spark.auditops import audit_segment_stats
    from flame_spark.segments import SEGMENT_SCHEMA

    seg = spark.createDataFrame(pdf, SEGMENT_SCHEMA)
    return audit_segment_stats(seg).collect()


def test_audit_accepts_fresh_index_and_counts_match(spark, seg_pdf):
    rows = _audit(spark, seg_pdf)
    # df per term across shards == sum of per-row n_docs
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    exp_df = seg_pdf.groupby("term")["n_docs"].sum().to_dict()
    assert {t: d for t, (d, _c) in got.items()} == {
        int(t): int(v) for t, v in exp_df.items()
    }
    assert all(c >= d for _t, (d, c) in got.items())  # cf >= df (tf >= 1)


def _expect_audit_error(spark, pdf, fragment):
    with pytest.raises(Exception) as ei:
        _audit(spark, pdf)
    assert "IndexAuditError" in str(ei.value), str(ei.value)[:500]
    assert fragment in str(ei.value), str(ei.value)[:500]


def test_audit_rejects_wrong_block_max(spark, seg_pdf):
    pdf = seg_pdf.copy(deep=True)
    bm = list(pdf.at[0, "block_max"])
    bm[0] = bm[0] + 1.0
    pdf.at[0, "block_max"] = bm
    _expect_audit_error(spark, pdf, "block_max")


def test_audit_rejects_truncated_tf_stream(spark, seg_pdf):
    from flame_spark.segments import varbyte_decode, varbyte_encode

    pdf = seg_pdf.copy(deep=True)
    i = int(pdf["n_docs"].idxmax())  # a row with >1 posting if any exists
    tfs = varbyte_decode(bytes(pdf.at[i, "tfs"]))
    if tfs.size < 2:
        pytest.skip("corpus slice produced no multi-posting term")
    pdf.at[i, "tfs"] = varbyte_encode(tfs[:-1])
    _expect_audit_error(spark, pdf, "stream lengths")


def test_audit_rejects_wrong_doc_endpoint(spark, seg_pdf):
    pdf = seg_pdf.copy(deep=True)
    pdf.at[0, "last_doc"] = int(pdf.at[0, "last_doc"]) + 7
    _expect_audit_error(spark, pdf, "doc range")


def test_audit_rejects_zero_tf(spark, seg_pdf):
    from flame_spark.segments import varbyte_decode, varbyte_encode

    pdf = seg_pdf.copy(deep=True)
    tfs = varbyte_decode(bytes(pdf.at[0, "tfs"])).copy()
    tfs[0] = 0
    pdf.at[0, "tfs"] = varbyte_encode(tfs)
    _expect_audit_error(spark, pdf, "non-positive tf")
