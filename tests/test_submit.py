"""End-to-end packaged run: the north rule's deployment shape is
``spark-submit --py-files flame_spark.zip`` on a multi-executor
cluster. This drives tools/submit_job.py exactly that way (local[4]
master standing in for the cluster): zip the package, submit, assert
the build publishes a snapshot and answers WAND queries, then
re-submit the same input and assert snapshot idempotency.
"""

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    return os.path.join(pyspark.__path__[0], "bin", "spark-submit")


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "flame_spark.zip")
    pkg = os.path.join(REPO, "flame_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for dp, _, fs in os.walk(pkg):
            if "__pycache__" in dp:
                continue
            for f in fs:
                if f.endswith(".py"):
                    full = os.path.join(dp, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _run(zpath, src, wh, queries, fmt=None, expect_rc=0, curate=False,
         unit=None, ranker=None, route=None):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["PYSPARK_PYTHON"] = sys.executable
    fmt_args = [f"--format={fmt}"] if fmt else []
    if curate:
        fmt_args.append("--curate")
    if unit:
        fmt_args.append(f"--unit={unit}")
    if ranker:
        fmt_args.append(f"--ranker={ranker}")
    if route:
        fmt_args.append(f"--route={route}")
    r = subprocess.run(
        [
            _spark_submit(), "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "submit_job.py"),
            *fmt_args, src, wh, "3", json.dumps(queries),
        ],
        capture_output=True, text=True, timeout=600, cwd="/tmp", env=env,
    )
    if expect_rc != 0:
        assert r.returncode != 0, "expected the submit to fail"
        return r.stderr
    assert r.returncode == 0, r.stderr[-2000:]
    out = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert out, r.stdout
    return out


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from flame_spark.data import transcripts_df

    src = str(tmp_path / "transcripts")
    transcripts_df(spark, 20, 6).write.parquet(src)
    zpath = _zip_package(str(tmp_path))
    wh = str(tmp_path / "wh")
    queries = [
        {"query_id": "q0",
         "query_text": "in nomine sancte et individue trinitatis amen"},
    ]

    out = _run(zpath, src, wh, queries)
    build, results = out[0], out[1:]
    assert build["segments"] > 0 and build["n_docs"] > 0
    assert results, "WAND returned no rows for a formulaic query"
    ranks = [r["rank"] for r in results if r["query_id"] == "q0"]
    assert ranks == sorted(ranks) and ranks[0] == 1
    scores = [r["score"] for r in results]
    assert scores == sorted(scores, reverse=True)

    # warehouse on disk: snapshot log with HEAD, immutable data dir
    assert os.path.exists(os.path.join(wh, "snapshots", "HEAD"))

    # re-submitting the SAME input is a no-op commit: same snapshot id,
    # identical query results
    out2 = _run(zpath, src, wh, queries)
    assert out2[0]["snapshot"] == build["snapshot"]
    assert out2[1:] == results


def test_spark_submit_routing(spark, tmp_path):
    """--route percolates every indexed doc against stored queries and
    writes the routing table into the warehouse."""
    from flame_spark.data import transcripts_df

    src = str(tmp_path / "transcripts")
    transcripts_df(spark, 10, 5).write.parquet(src)
    zpath = _zip_package(str(tmp_path))
    wh = str(tmp_path / "wh")
    rfile = str(tmp_path / "routes.json")
    with open(rfile, "w") as f:
        json.dump([
            {"query_id": "r0", "must": ["nomine"]},
            {"query_id": "r1", "must": ["zzzqqq"]},
        ], f)
    out = _run(zpath, src, wh, [], route=rfile)
    build = out[0]
    assert build["routing"]["matches"].get("r0", 0) > 0
    assert "r1" not in build["routing"]["matches"]
    # versioned alongside the snapshot model (review fix): the table
    # lives under routing/<input_snapshot> and covers only INDEXED docs
    assert build["input_snapshot"] in build["routing"]["path"]
    assert build["routing"]["matches"]["r0"] <= build["n_docs"]
    routed = spark.read.parquet(build["routing"]["path"])
    got = {r["query_id"] for r in routed.select("query_id").distinct().collect()}
    assert got == {"r0"}
    # every routed doc really contains the must term
    docmap_docs = routed.count()
    assert docmap_docs == build["routing"]["matches"]["r0"]


def test_spark_submit_dirichlet_ranker(spark, tmp_path):
    """--ranker=dirichlet serves the second family from the same
    warehouse through the packaged entry: same snapshot (idempotent
    no-op commit), well-formed ranked rows tagged with the ranker."""
    from flame_spark.data import transcripts_df

    src = str(tmp_path / "transcripts")
    transcripts_df(spark, 16, 6).write.parquet(src)
    zpath = _zip_package(str(tmp_path))
    wh = str(tmp_path / "wh")
    queries = [
        {"query_id": "q0",
         "query_text": "in nomine sancte et individue trinitatis amen"},
    ]
    out_bm = _run(zpath, src, wh, queries)
    out_di = _run(zpath, src, wh, queries, ranker="dirichlet")
    assert out_di[0]["snapshot"] == out_bm[0]["snapshot"]
    res = out_di[1:]
    assert res and all(r["ranker"] == "dirichlet" for r in res)
    ranks = [r["rank"] for r in res if r["query_id"] == "q0"]
    assert ranks == list(range(1, len(ranks) + 1))
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    # different ranking family, same candidate universe: every served
    # doc must also be a doc the BM25 path could see (valid ids)
    assert all(0 <= r["doc_id"] < out_di[0]["n_docs"] for r in res)


def test_spark_submit_jsonl_format(spark, tmp_path):
    """--format=jsonl routes the packaged entry through
    read_transcripts: a JSONL export builds the same index (same input
    digest, same query answers) as the parquet original, and a
    malformed line fails the submit loudly end-to-end."""
    from flame_spark.data import transcripts_df

    raw = transcripts_df(spark, 20, 6)
    pq, jl = str(tmp_path / "pq"), str(tmp_path / "jl")
    raw.write.parquet(pq)
    raw.coalesce(1).write.json(jl)
    zpath = _zip_package(str(tmp_path))
    queries = [
        {"query_id": "q0",
         "query_text": "in nomine sancte et individue trinitatis amen"},
    ]
    out_pq = _run(zpath, pq, str(tmp_path / "wh_pq"), queries)
    out_jl = _run(zpath, jl, str(tmp_path / "wh_jl"), queries, fmt="jsonl")
    assert out_jl[0]["input_snapshot"] == out_pq[0]["input_snapshot"]
    assert out_jl[1:] == out_pq[1:]

    # malformed line -> the single-pass inline check fails the job
    with open(os.path.join(jl, "zz-broken.json"), "w") as f:
        f.write('{"conv_id": "cX", not json\n')
    err = _run(zpath, jl, str(tmp_path / "wh_bad"), queries,
               fmt="jsonl", expect_rc=1)
    assert "malformed row" in err


def test_spark_submit_curate(spark, tmp_path):
    """--curate runs PII-redact -> repetition-filter -> exact-dedup
    before the build: the repetitive conversation never reaches the
    index, PII-only near-duplicates collapse to one doc, and the
    summary line reports the curation counts."""
    from flame_spark.data import transcripts_df

    base = " ".join(f"distinctword{i}" for i in range(40)) + " uniquedupword"
    extra = spark.createDataFrame(
        [
            ("zz_dup", 0, "user", base + " reach me at alice@example.com now",
             None, None),
            ("zz_dup", 1, "user", base + " reach me at bob.smith@test.org now",
             None, None),
            ("zz_rep", 0, "user", "spammy token " * 80, None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    src = str(tmp_path / "transcripts")
    transcripts_df(spark, 12, 6).unionByName(extra).write.parquet(src)
    zpath = _zip_package(str(tmp_path))
    # term_mode="lno" shingles word TRIGRAMS — a query under 3 tokens
    # has zero terms, so each query carries a trigram from its target
    queries = [
        {"query_id": "qdup",
         "query_text": "distinctword38 distinctword39 uniquedupword"},
        {"query_id": "qrep", "query_text": "spammy token spammy token"},
    ]

    plain = _run(zpath, src, str(tmp_path / "wh_plain"), queries)
    cur = _run(zpath, src, str(tmp_path / "wh_cur"), queries, curate=True)

    assert plain[0]["curation"] is None
    c = cur[0]["curation"]
    assert c["n_kept"] < c["n_input"]
    # the index built over curated docs is smaller
    assert cur[0]["n_docs"] < plain[0]["n_docs"]

    def hits(out, qid):
        return [r for r in out[1:] if r["query_id"] == qid]

    # near-dups differing only in PII: both served plain, one curated
    assert len(hits(plain, "qdup")) == 2
    assert len(hits(cur, "qdup")) == 1
    # the repetitive doc is gone from the curated index entirely
    assert len(hits(plain, "qrep")) >= 1
    assert len(hits(cur, "qrep")) == 0


def test_spark_submit_conv_unit(spark, tmp_path):
    """--unit=conv indexes one assembled document per conversation:
    n_docs == n_conversations and WAND returns conversation-level
    doc_ids (rank over conv_id, so < n_conversations)."""
    from flame_spark.data import transcripts_df

    src = str(tmp_path / "transcripts")
    transcripts_df(spark, 12, 6).write.parquet(src)
    zpath = _zip_package(str(tmp_path))
    queries = [
        {"query_id": "q0",
         "query_text": "in nomine sancte et individue trinitatis amen"},
    ]
    out = _run(zpath, src, str(tmp_path / "wh_conv"), queries, unit="conv")
    assert out[0]["unit"] == "conv"
    assert out[0]["n_docs"] == 12  # every assembled conversation survives
    results = out[1:]
    assert results, "no hits at conversation granularity"
    assert all(0 <= r["doc_id"] < 12 for r in results)
    ranks = [r["rank"] for r in results]
    assert ranks == sorted(ranks) and ranks[0] == 1
