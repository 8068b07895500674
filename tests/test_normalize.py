"""Unit tests for the normalization stack (micro-corpus, FIXTURES.md §3)."""

from collections import Counter

from flame_spark.normalize import (
    NormArtifacts,
    apply_lut,
    build_lut,
    canonicalize_whitespace,
    default_artifacts,
    learn_artifacts_local,
    learn_nfkd_rules,
    lost_char_counts,
    parse_rules,
    stage1_normalize,
    ONE_TO_ONE,
)


def test_whitespace_canonicalization():
    assert canonicalize_whitespace("  a\t b \n c  ") == "a b c"
    assert canonicalize_whitespace("") == ""


def test_stage1_mufi_one_to_many():
    # ligatures expand BEFORE the LUT stage (flame.py:435-447)
    assert stage1_normalize("Straße Æther Œuvre") == "strasse aether oeuvre"
    assert stage1_normalize("ﬁnis ﬂamma") == "finis flamma"


def test_stage1_bigram_rules_order():
    rules = parse_rules("ss>s,ie>i")
    # 'ß' -> 'ss' first (MUFI), then bigram 'ss' -> 's'
    assert stage1_normalize("größie", rules) == "grösi"


def test_lut_identity_and_unknown():
    lut = build_lut("abc", {}, " ")
    assert apply_lut("abcxyz", lut) == "abc   "
    # astral chars (surrogate pair) -> two unknowns, like the reference
    assert apply_lut("a\U0001F600b", lut) == "a  b"


def test_lut_one_to_one_mufi_seed():
    lut = build_lut("abcdefghijklmnopqrstuvwxyz", dict(ONE_TO_ONE), " ")
    assert apply_lut("ſol ꝑro", lut) == "sol pro"


def test_lost_char_counts_excludes_unknown():
    lut = build_lut("ab", {}, " ")
    lost = lost_char_counts("a b c d c", lut, " ")
    assert lost == Counter({"c": 2, "d": 1})


def test_nfkd_learning():
    # é -> e (NFKD first char), ñ -> n; both in alphabet
    lost = Counter({"é": 3, "ñ": 1, "§": 5})
    rules = learn_nfkd_rules(lost, "abcdefghijklmnopqrstuvwxyz", min_freq=1)
    assert rules == {"é": "e", "ñ": "n"}  # § has no alpha NFKD
    rules2 = learn_nfkd_rules(lost, "abcdefghijklmnopqrstuvwxyz", min_freq=2)
    assert rules2 == {"é": "e"}


def test_full_pipeline_micro_corpus():
    # README example corpus (reference README.md:18-21)
    docs = [
        "In nomine sancte et individue trinitatis amen",
        "In nómine ſancte et indiuidue trinitatis ámen",
    ]
    stage1 = [stage1_normalize(d) for d in docs]
    art = learn_artifacts_local(stage1, min_freq=1)
    assert art.learned_rules.get("ó") == "o"
    assert art.learned_rules.get("á") == "a"
    out = [art.normalize(d) for d in docs]
    assert out[0] == "in nomine sancte et individue trinitatis amen"
    assert out[1] == "in nomine sancte et indiuidue trinitatis amen"


def test_phonetic_reduction():
    art = default_artifacts(phonetic_enabled=True)
    # b>p, c>k, d>t, g>k, j>i, q>k, v>f, y>i, z>s (flame.py:288)
    assert art.normalize("abc dog jazz") == "apk tok iass"
