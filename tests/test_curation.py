"""Training-set curation operators: benchmark decontamination,
repetition (Gopher-style) signals, PII redaction, deterministic
stratified sampling. Each asserted against hand-computed expectations
on micro-corpora (the sf0.01 DuckDB gate covers the full-corpus
differential)."""

import pytest

from flame_spark.textops import (
    decontamination,
    pii_redact,
    repetition_scores,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontamination_hand_computed(spark):
    # eval doc: shingles {"a b c", "b c d"}
    ev = _docs(spark, [(100, "a b c d")])
    tr = _docs(
        spark,
        [
            (1, "a b c x y"),   # shingles: a b c | b c x | c x y -> 1/3 hit
            (2, "p q r s"),     # p q r | q r s -> 0/2
            (3, "a b c d e"),   # a b c | b c d | c d e -> 2/3
            (4, "zz yy"),       # < 3 tokens -> 0 shingles
        ],
    )
    out = {
        r["doc_id"]: r
        for r in decontamination(tr, ev, n=3, threshold=0.5).collect()
    }
    assert out[1]["n_shingles"] == 3 and out[1]["n_overlap"] == 1
    assert out[1]["overlap_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert not out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_overlap"] == 2
    assert out[3]["contaminated"]  # 2/3 >= 0.5
    assert out[4]["n_shingles"] == 0 and out[4]["overlap_frac"] == 0.0
    assert not out[4]["contaminated"]


def test_decontamination_counts_distinct_shingles_once(spark):
    # "a b a b a b" has shingles a b a (x2), b a b (x2) -> DISTINCT = 2
    ev = _docs(spark, [(100, "a b a")])
    tr = _docs(spark, [(1, "a b a b a b")])
    row = decontamination(tr, ev, n=3, threshold=0.4).collect()[0]
    assert row["n_shingles"] == 2
    assert row["n_overlap"] == 1  # only "a b a" is in the eval set
    assert row["contaminated"]  # 0.5 >= 0.4


def test_decontamination_broadcast_off_same_result(spark):
    ev = _docs(spark, [(100, "a b c d")])
    tr = _docs(spark, [(1, "a b c x y"), (3, "a b c d e")])
    a = sorted(map(tuple, decontamination(tr, ev).collect()))
    b = sorted(
        map(tuple, decontamination(tr, ev, broadcast_eval=False).collect())
    )
    assert a == b


def test_repetition_hand_computed(spark):
    docs = _docs(
        spark,
        [
            # 2-grams: "a a" x5 -> top2 = 1.0; 3-grams "a a a" x4 dup -> 1.0
            (1, "a a a a a a"),
            # all distinct tokens: top2 = 1/4, dup3 = 0
            (2, "v w x y z"),
            # one token: no 2-grams at all
            (3, "solo"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in repetition_scores(
            docs, top2_threshold=0.5, dup3_threshold=0.5
        ).collect()
    }
    assert out[1]["n_tokens"] == 6
    assert out[1]["uniq_token_ratio"] == pytest.approx(1 / 6, abs=1e-6)
    assert out[1]["top2gram_frac"] == 1.0
    assert out[1]["dup3gram_frac"] == 1.0
    assert out[1]["repetitive"]
    assert out[2]["top2gram_frac"] == 0.25
    assert out[2]["dup3gram_frac"] == 0.0
    assert not out[2]["repetitive"]
    assert out[3]["top2gram_frac"] == 0.0 and out[3]["dup3gram_frac"] == 0.0
    assert not out[3]["repetitive"]


def test_pii_redact_counts_and_text(spark):
    docs = _docs(
        spark,
        [
            (1, "mail a@b.com and c.d+x@e.org from 10.0.0.1 tel 555-1234 end"),
            (2, "clean text no pii here"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[1]["n_email"] == 2
    assert out[1]["n_ipv4"] == 1
    assert out[1]["n_phone"] == 1
    assert (
        out[1]["redacted"]
        == "mail [EMAIL] and [EMAIL] from [IP] tel [PHONE] end"
    )
    assert out[2]["n_email"] == 0 and out[2]["n_ipv4"] == 0
    assert out[2]["redacted"] == "clean text no pii here"


def test_pii_rule_order_no_cross_matching(spark):
    # the email's digits must NOT later match as phone/IP fragments,
    # and the IP must not be half-eaten by the email rule
    docs = _docs(spark, [(1, "u555-1234@ex.com at 10.1.2.3")])
    row = pii_redact(docs).collect()[0]
    assert row["n_email"] == 1 and row["n_ipv4"] == 1 and row["n_phone"] == 0
    assert row["redacted"] == "[EMAIL] at [IP]"


def test_stratified_sample_deterministic_and_content_keyed(spark):
    rows = [
        (i, f"document body number {i}", "en" if i % 2 == 0 else "zh")
        for i in range(40)
    ]
    # two EXTRA docs sharing doc 0's exact text, one in each stratum
    rows += [(1000, "document body number 0", "en"),
             (1001, "document body number 0", "zh")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rates = {"en": 900, "zh": 100}
    out = stratified_sample(docs, rates, default_rate=0)
    got = {r["doc_id"]: r for r in out.collect()}
    # rerun-stable
    again = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == set(again)
    # content-keyed: duplicate text -> same bucket; doc 0 and 1000 share
    # stratum too, so their keep decision is identical
    assert (0 in got) == (1000 in got)
    if 0 in got:
        assert got[0]["bucket"] == got[1000]["bucket"]
    # keep_rate column reflects the stratum
    for r in got.values():
        assert r["keep_rate"] == rates[r["stratum"]]
        assert r["bucket"] < r["keep_rate"]


def test_stratified_sample_bucket_is_md5_prefix_mod(spark):
    import hashlib

    rows = [(i, f"text sample {i}", "en") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_sample(docs, {"en": 1000}, default_rate=0)
    for r in out.collect():  # rate 1000/1000 keeps everything
        expect = int(hashlib.md5(f"text sample {r['doc_id']}".encode()).hexdigest()[:8], 16) % 1000
        assert r["bucket"] == expect
    assert out.count() == 10


def test_stratified_sample_default_rate_for_unknown_stratum(spark):
    rows = [(i, f"text {i}", "xx") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept_all = stratified_sample(docs, {"en": 500}, default_rate=1000).count()
    kept_none = stratified_sample(docs, {"en": 500}, default_rate=0).count()
    assert kept_all == 30 and kept_none == 0


def test_curate_docs_composition(spark):
    """PII-redact -> repetition-filter -> exact-dedup, hand-computed:
    docs that differ only in PII collapse AFTER redaction; the
    repetitive doc is dropped; survivors carry redacted text."""
    from flame_spark.textops import curate_docs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base + " contact alice@example.com for details"),
        (2, base + " contact bob.smith@test.org for details"),  # dup of 1 post-redact
        (3, "spam alert " * 60),                                # repetitive -> dropped
        (4, "a completely different document about medieval charters and notaries"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in curate_docs(docs).collect()}
    assert set(out) == {1, 4}  # 2 deduped into 1 (min doc_id), 3 dropped
    assert "[EMAIL]" in out[1] and "alice" not in out[1]
    assert out[4] == rows[3][1]  # untouched


def test_curate_docs_keeps_singletons_and_clean_docs(spark):
    from flame_spark.textops import curate_docs

    rows = [(i, f"unique clean document number {i} with plenty of distinct words")
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert curate_docs(docs).count() == 10


def test_curate_pipeline_gate_stage_activity(spark):
    """The registry gate's twin-pair derivation must exercise BOTH
    stages: every surviving doc_id is an 'a…' twin (dedup collapsed
    each redaction-identical pair to the min id), and the survivor
    count equals #docs minus the long repetitive ones (repetition
    filter active), never the raw twin count."""
    from flame_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["text_curate_pipeline"](spark, sf).collect()
    ids = [r["doc_id"] for r in out]
    assert ids and all(i.startswith("a") for i in ids)
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(ids) < n_docs          # repetition filter dropped some
    assert len(set(ids)) == len(ids)  # dedup left no twin pairs
    # redaction actually happened on the survivors
    assert all("[EMAIL]" in r["text"] for r in out)
    assert not any("@example.com" in r["text"] for r in out)


def test_collocations_hand_computed(spark):
    """PMI on a corpus small enough to verify by hand, including the
    min_count cutoff and the exact probability normalizations."""
    import math

    from flame_spark.textops import collocations

    docs = spark.createDataFrame(
        [(0, "hot dog hot dog hot dog"), (1, "hot day"), (2, "dog day")],
        "doc_id long, text string",
    )
    out = {(r["w1"], r["w2"]): (r["c12"], r["pmi"])
           for r in collocations(docs, min_count=3).collect()}
    # bigrams: hot dog x3, dog hot x2, hot day x1, dog day x1 -> only
    # "hot dog" survives min_count=3
    assert set(out) == {("hot", "dog")}
    t1, t2 = 10.0, 7.0         # tokens, bigram slots (5 + 1 + 1)
    c1, c2 = 4.0, 4.0          # hot x4, dog x4
    exp = math.log((3.0 / t2) / ((c1 / t1) * (c2 / t1)))
    assert out[("hot", "dog")] == (3, pytest.approx(round(exp, 6), abs=2e-6))


def test_collocations_no_bigrams_raises(spark):
    from flame_spark.textops import collocations

    docs = spark.createDataFrame(
        [(0, "single"), (1, "")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no bigrams"):
        collocations(docs)


# ---------------------------------------------------------------------------
# winnowing (MOSS) fingerprints
# ---------------------------------------------------------------------------


def _brute_winnow(text, k, w):
    """Independent winnowing replay: md5-prefix k-gram hashes, window
    minimum with rightmost tie-break, distinct (pos, fp)."""
    import hashlib
    import re

    t = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip(" ")
    grams = [t[i:i + k] for i in range(len(t) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    out = set()
    for s in range(len(hs) - w + 1):
        window = hs[s:s + w]
        m = min(window)
        # rightmost occurrence of the minimum
        off = max(i for i, h in enumerate(window) if h == m)
        out.add((s + off + 1, m))  # 1-based char position
    return out


def test_winnow_fingerprints_match_bruteforce(spark):
    from flame_spark.textops import winnow_fingerprints

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my   box with\tfive dozen liquor jugs"),  # ws canon
        (2, "aaaaaaaaaaaa"),       # identical k-grams -> tie-breaks
        (3, "short"),              # shorter than k -> no grams
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=7, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for d, text in docs:
        exp = _brute_winnow(text, 7, 4)
        assert got.get(d, set()) == exp, d


def test_winnow_guarantee_shared_substring(spark):
    """The winnowing guarantee: a shared substring of length >=
    w + k - 1 must yield at least one shared fingerprint."""
    from flame_spark.textops import winnow_fingerprints

    shared = "formulaic diplomatic preamble"
    docs = [(0, f"xxqq {shared} zzttuu"), (1, f"completely other {shared}")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=7, w=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]


def test_winnow_pairs_threshold_and_salting(spark):
    from flame_spark.textops import winnow_fingerprints, winnow_pairs

    docs = [
        (0, "in nomine sancte et individue trinitatis amen feliciter"),
        (1, "in nomine sancte et individue trinitatis amen feliciter"),
        (2, "prorsus aliud documentum sine ulla re communi hic"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_fp0 = (
        winnow_fingerprints(df, k=7, w=4)
        .where("doc_id = 0").select("fp").distinct().count()
    )
    # identical docs share ALL fingerprints; unrelated doc none
    pairs = {
        (r["doc_i"], r["doc_j"]): r["shared"]
        for r in winnow_pairs(df, k=7, w=4, min_shared=2).collect()
    }
    assert pairs == {(0, 1): n_fp0}
    # forcing every fingerprint hot must not change the pair set
    salted = {
        (r["doc_i"], r["doc_j"]): r["shared"]
        for r in winnow_pairs(
            df, k=7, w=4, min_shared=2, hot_df_threshold=0
        ).collect()
    }
    assert salted == pairs


def test_winnow_long_doc_raises(spark):
    from flame_spark.textops import WINNOW_POS_CAP, winnow_fingerprints

    df = spark.createDataFrame(
        [(0, "x" * WINNOW_POS_CAP)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="chunk upstream"):
        winnow_fingerprints(df, k=7, w=4).count()


def test_winnow_guarantee_property(spark):
    """Property (Schleimer et al. Thm 1): for ANY two texts sharing a
    planted substring of length >= w + k - 1, winnowing selects at
    least one shared fingerprint. Driven by hypothesis over random
    low-alphabet texts (worst case for hash ties)."""
    from hypothesis import given, settings, strategies as st

    from flame_spark.textops import winnow_fingerprints

    K, W = 5, 3
    alpha = st.text(alphabet="abc ", min_size=0, max_size=30)
    shared = st.text(alphabet="abc", min_size=K + W - 1, max_size=K + W + 4)

    cases = []

    @settings(max_examples=40, deadline=None)
    @given(pre=alpha, post=alpha, mid=shared, other=alpha)
    def collect(pre, post, mid, other):
        cases.append((pre + mid + post, other + mid))

    collect()
    docs = [(i * 2, a) for i, (a, _b) in enumerate(cases)]
    docs += [(i * 2 + 1, b) for i, (_a, b) in enumerate(cases)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    for i in range(len(cases)):
        a, b = fps.get(i * 2, set()), fps.get(i * 2 + 1, set())
        assert a & b, (i, cases[i])
