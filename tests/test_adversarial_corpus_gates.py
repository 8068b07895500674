"""Driver-style value gates on ADVERSARIAL corpora.

The per-round correctness harness proves Spark == DuckDB on the
committed synthetic corpora; this test re-runs the pure-SQL document
gates on hostile mutations of that corpus so an engine-semantics
divergence or an edge-case crash (empty token lists, zero-division in
ratios, ngram windows longer than the doc) shows up here instead of on
some future corpus.

Two hostility envelopes, matching the two gate contracts:

- SIMPLE-CONTRACT gates (norm_text_col / word_tokens_col both sides):
  full hostility — control/unicode whitespace, MUFI codepoints,
  combining marks, accented latin, regex/SQL metacharacters.
- FULL-PIPELINE gates (the WAND pair: the index is built through
  prepare_docs, i.e. the complete FLAME normalization with MUFI folds
  and the adaptive char LUT): their DuckDB twin tokenizes with the
  simple norm, which coincides with the full pipeline exactly on
  corpora inside the engine's ALPHABET (the committed corpora; a MUFI
  'æ' mid-word folds to 'ae' and re-joins the word in the full
  pipeline but splits it in the simple one — by design, the full
  normalization is separately verified bit-exactly against
  flame_spark.oracle). Hostility for these stays inside that
  contract: whitespace variants + degenerate documents (empty,
  whitespace-only, single-token, shorter than the ngram window) —
  which is precisely what exercises the zero-feature-doc N/avgdl
  semantics through the whole index+serve path.

Fixture-oracle gates (digest-keyed to the committed corpora) and gates
over other tables (events, embeddings, media, incremental warehouses)
are out of scope by construction.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SIMPLE_GATES = [
    "s2_normalize",
    "p2_mufi_fold",
    "p7_phonetic",
    "a4_word_counts",
    "a1_tf",
    "a3_term_stats",
    "o4_vocab",
    "t5_shingles3",
    "t5_lno31_postings",
    "j6_bm25_topk",
    "j1_tfidf_cosine_pairs",
    "j1_cosine_inter",
    "o1_top_pairs",
    "a9_percentile99",
    "a8_otsu_threshold",
    "s3_corpus_filter",
    "dedup_exact_groups",
    "dedup_jaccard3_pairs",
    "dedup_minhash_sigs",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_groups",
    "dedup_simhash",
    # winnowing stresses substring/length/md5 code-point parity plus
    # the packed-key window min on degenerate docs
    "dedup_winnow_fps",
    "dedup_winnow_pairs",
    "text_langid",
    "text_quality",
    "text_token_counts",
    "text_fingerprints",
    # curation ops share the simple norm/tokens contract; pii_redact
    # additionally stresses Java-regex vs RE2 agreement on hostile
    # codepoints around its ASCII-literal classes
    "text_decontaminate",
    "text_repetition",
    "text_pii_redact",
    "text_stratified_sample",
    # conversation assembly stresses substring/length/string_agg
    # code-point parity (vs UTF-16) on astral-plane + combining chars
    "transcript_conv_docs",
    "transcript_conv_windows",
    # structured search shares the simple norm/tokens contract; phrase
    # additionally stresses positional parity (posexplode vs range())
    # and boolean the BM25 dl/avgdl semantics on degenerate docs
    "search_boolean_topk",
    "search_phrase_topk",
    "search_prefix_suggest",
    # fuzzy matching is ASCII-token-level by construction (tokens are
    # [a-z0-9] runs), but the expansion join must agree with DuckDB's
    # levenshtein on whatever tokens hostile docs produce; snippets
    # stress slice/array_join vs list-slice/array_to_string parity
    "search_fuzzy_expand",
    "search_fuzzy_topk",
    "search_bm25f_roles",
    "search_snippets",
    "search_more_like_this",
    "text_collocations",
    # round-5 ranking/analytics gates: dirichlet stresses the ln/cf/C
    # parity on degenerate docs (dl=0 normalizer), near the positional
    # parity, facets the null-metadata bucket (documents fixture has
    # non-null lang/source; hostile TEXT is the stressor), prf the
    # two-pass rank determinism, keywords the tf/df tie-breaks
    "search_lm_dirichlet",
    "search_facets",
    "search_near_topk",
    "search_prf_topk",
    "text_keywords",
    # percolator: reverse boolean matching over distinct-token sets
    "search_percolate",
    # explain: the per-term breakdown must re-sum to the served score
    # on hostile corpora too
    "search_explain",
]
FULL_PIPELINE_GATES = [
    "wand_topk_lno",
    "wand_serve_batch",
    "wand_boolean_lno",
    "wand_boolean_serve",
    # second ranking family served from the same stored segments:
    # stresses the tf-stream decode (cf/C/dl reconstruction) on
    # degenerate and hostile docs
    "wand_dirichlet_lno",
]

HOSTILE = list("\t\n\x0b\f\r\xa0　ſꝛæß'%[](){}\\^$|*+?éü😀𝔘") + ["́"]
WS_ONLY = list("\t\n\x0b\f\r ")

EDGE_DOCS = [
    "",
    "   ",
    "\x0b\t\r",
    "a",
    "et in terra pax",
    "merge merge merge scan table filter join",
    "x" * 500,
    "0123456789 42 7 2024",
    "'quoted' %like_% [class] (paren) {brace}",
    "word\xa0with　unicode\x0bspaces\teverywhere",
]
WS_EDGE_DOCS = [
    "",
    "   ",
    "\x0b\t\r",
    "a",
    "et in terra pax",
    "merge merge merge scan table filter join",
    "\tleading tab and trailing feed\x0c",
]


def _mutate(seed: int, alphabet: list, edge_docs: list, out_dir: str) -> str:
    rng = np.random.default_rng(seed)
    base = duckdb.sql(
        "SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        "ORDER BY doc_id"
    ).df()
    texts = []
    for t in base["text"]:
        if rng.random() < 0.35:  # splice hostile chars into real text
            chars = list(t)
            for _ in range(int(rng.integers(1, 6))):
                pos = int(rng.integers(0, len(chars) + 1))
                chars.insert(pos, alphabet[int(rng.integers(0, len(alphabet)))])
            t = "".join(chars)
        texts.append(t)
    base["text"] = pd.Series(texts, dtype="string")
    next_id = int(base["doc_id"].max()) + 1
    edges = pd.DataFrame(
        {
            "doc_id": range(next_id, next_id + len(edge_docs)),
            "text": pd.Series(edge_docs, dtype="string"),
            "lang": "la",
            "source": "edge",
            "n_chars": [len(t) for t in edge_docs],
        }
    )
    adv = pd.concat([base, edges], ignore_index=True)
    con = duckdb.connect()
    con.register("adv", adv)
    con.sql(
        f"COPY (SELECT * FROM adv ORDER BY doc_id) TO "
        f"'{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    return out_dir


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run_gates(spark, sf_dir: str, gates: list) -> list:
    from flame_spark.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    failures = []
    for gate in gates:
        try:
            sdf = _canon(QUERIES[gate](spark, sf_dir).toPandas())
            odf = _canon(con.sql(ORACLE_SQL[gate]).df())
            if len(sdf) != len(odf):
                failures.append((gate, f"rows {len(sdf)} vs {len(odf)}"))
                continue
            try:
                pd.testing.assert_frame_equal(
                    sdf, odf, check_dtype=False, check_exact=False, rtol=0,
                    atol=1e-9,
                )
            except AssertionError as e:
                failures.append((gate, str(e).splitlines()[0]))
        except Exception as e:  # crash on hostile input is also a failure
            failures.append((gate, f"{type(e).__name__}: {e}"))
    return failures


def test_simple_contract_gates_full_hostility(spark, tmp_path):
    adv = _mutate(1234, HOSTILE, EDGE_DOCS, str(tmp_path))
    assert not _run_gates(spark, adv, SIMPLE_GATES)


def test_full_pipeline_gates_ws_hostility(spark, tmp_path):
    adv = _mutate(99, WS_ONLY, WS_EDGE_DOCS, str(tmp_path))
    assert not _run_gates(spark, adv, FULL_PIPELINE_GATES)
