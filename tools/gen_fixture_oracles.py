"""Generate value-oracle fixture parquets for the two deterministic
engine paths that are not SQL-expressible:

- mm_image_features: synthetic media is seeded by media_id, so the
  expected features are a CONSTANT table.
- autotune_grid: the winner is fixed given the 30-doc sample, so the
  expected row is keyed by an md5 digest of that sample — the oracle
  SQL recomputes the digest from the live documents view and joins, so
  a changed corpus yields zero rows (a visible mismatch), never a
  stale pass.

Run: PYTHONPATH=/root/repo python tools/gen_fixture_oracles.py
Rewrites tests/fixtures/*.parquet (single-file parquet via duckdb).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

FIXDIR = "/root/repo/tests/fixtures"
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    from flame_spark.queries import q_autotune, q_multimodal_features
    from flame_spark.session import get_spark

    spark = get_spark("gen_fixtures", cpus=8)
    con = duckdb.connect()

    mm = q_multimodal_features(spark, SF_DIRS[0]).toPandas()
    con.register("mm", mm)
    con.sql(
        f"COPY (SELECT media_id, n_features, mean_feature FROM mm ORDER BY media_id)"
        f" TO '{FIXDIR}/mm_image_features_expected.parquet' (FORMAT PARQUET)"
    )
    print(f"mm_image_features: {len(mm)} rows")

    rows = []
    for sf in SF_DIRS:
        digest = con.sql(
            "SELECT md5(string_agg(text, '' ORDER BY doc_id)) FROM ("
            f"SELECT doc_id, text FROM '{sf}/documents.parquet' "
            "ORDER BY doc_id LIMIT 30)"
        ).fetchone()[0]
        r = q_autotune(spark, sf).collect()[0]
        rows.append(
            (digest, int(r["best_ngram"]), int(r["best_n_out"]), float(r["snr"]))
        )
        print(f"autotune {sf}: digest={digest[:12]} -> {rows[-1][1:]}")
    import pandas as pd

    at = pd.DataFrame(
        rows, columns=["corpus_md5", "best_ngram", "best_n_out", "snr"]
    ).astype({"best_ngram": "int32", "best_n_out": "int32"})
    con.register("at", at)
    con.sql(
        f"COPY (SELECT * FROM at) TO '{FIXDIR}/autotune_expected.parquet'"
        " (FORMAT PARQUET)"
    )
    spark.stop()
    print("fixtures written")


if __name__ == "__main__":
    main()
