"""Adversarial sweep for the embeddings and events gate surfaces.

Same idea as test_adversarial_corpus_gates, different tables: the
committed embeddings are well-behaved gaussians and the events have
clean timestamps; production vectors and logs are not. Mutations:

- ZERO vectors (norm 0 — every cosine against them must hit the
  division guard identically on both engines, never NaN/inf),
- exact DUPLICATE vectors (cosine 1.0 ties exercise the
  (score desc, id asc) tie-break),
- extreme magnitudes (1e30 / 1e-30 floats — a float32 intermediate
  would overflow to inf on one side only),
- negative-only vectors,
- events exactly ON 5-minute window boundaries, duplicate event ids,
  null values (aggregate null semantics must match).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

EMB_GATES = [
    "ann_cosine_topk",
    "dedup_embed_cosine_pairs",
    "dedup_embed_lsh_pairs",
    "dedup_embed_groups",
]
# the streaming twins share the batch oracles; both stage the whole
# adversarial table (window gate: one file = one microbatch; user-state
# gate: 3 microbatches by event_id mod 3 with state carried across), so
# the hostile rows flow through the stateful machinery too
EV_GATES = ["events_window5m", "stream_events_window5m", "stream_user_state"]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_vec")
    con = duckdb.connect()
    emb = con.sql(
        "SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet' "
        "ORDER BY vec_id"
    ).df()
    dim = len(emb["embedding"].iloc[0])
    base0 = np.asarray(emb["embedding"].iloc[0], dtype=np.float32)
    extra = [
        np.zeros(dim, dtype=np.float32),                    # zero norm
        base0.copy(),                                       # dup of query 0
        (np.ones(dim, dtype=np.float32) * np.float32(1e30)),
        (np.ones(dim, dtype=np.float32) * np.float32(1e-30)),
        -np.abs(base0),
        base0.copy(),                                       # second dup: ties
    ]
    nid = int(emb["vec_id"].max()) + 1
    add = pd.DataFrame(
        {
            "vec_id": range(nid, nid + len(extra)),
            "embedding": [list(map(float, v)) for v in extra],
            "label": 0,
        }
    )
    out = pd.concat([emb, add], ignore_index=True)
    con.register("out", out)
    con.sql(
        f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label "
        f"FROM out ORDER BY vec_id) TO '{d}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )

    ev = con.sql(
        "SELECT * FROM '/root/testdata/sf0.001/events.parquet' "
        "ORDER BY event_id"
    ).df()
    eid = int(ev["event_id"].max()) + 1
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    add_ev = pd.DataFrame(
        {
            "event_id": [eid, eid, eid + 1, eid + 2, eid + 3],
            "ts": [
                t0,                                   # exactly on boundary
                t0,                                   # duplicate event_id
                t0 + pd.Timedelta(seconds=299),       # last second of window
                t0 + pd.Timedelta(seconds=300),       # first of next window
                t0 + pd.Timedelta(seconds=301),
            ],
            "user_id": 1,
            "event_type": "edge",
            "value": [1.5, 2.5, None, 0.0, -3.25],    # null in the aggregate
            "props": None,
        }
    )
    out_ev = pd.concat([ev, add_ev], ignore_index=True)
    con.register("out_ev", out_ev)
    con.sql(
        f"COPY (SELECT * FROM out_ev ORDER BY event_id, ts) TO "
        f"'{d}/events.parquet' (FORMAT PARQUET)"
    )
    return str(d)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _sweep(spark, sf_dir, gates, views):
    from flame_spark.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in views:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
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
        except Exception as e:
            failures.append((gate, f"{type(e).__name__}: {e}"))
    return failures


def test_embedding_gates_adversarial(spark, adv_dir):
    assert not _sweep(spark, adv_dir, EMB_GATES, ["embeddings"])


def test_event_gates_adversarial(spark, adv_dir):
    assert not _sweep(spark, adv_dir, EV_GATES, ["events"])
