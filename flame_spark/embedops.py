"""Similarity search over embedding columns (training-data pipeline).

- brute-force cosine top-k: JVM-side ``zip_with`` + sequential
  ``aggregate`` fold (deterministic index-order summation, double
  accumulator) — no UDF, whole-stage codegen, broadcast of the (small)
  query-vector side; the baseline the LSH path is validated against.
- LSH-bucketed ANN: sign-bit signatures against deterministic seeded
  hyperplanes (broadcast), equi-join on bucket, rerank within bucket.
  Multi-probe (Hamming-1 neighbors) to raise recall. This is the
  100 TB path: candidates shrink by ~2^bits, the join is an equi-join
  on a low-cardinality key with a broadcast query side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _dot(a, b):
    """Deterministic sequential dot product of two array<double> cols."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def load_embeddings(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("vec"),
        "label",
    )


def cosine_topk_bruteforce(
    emb: DataFrame, query_vec_ids: list[int], k: int = 5
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (excluding self).

    Broadcast the query rows; one wide pass over all vectors; window
    top-k with (score desc, vec_id asc) tie-break."""
    q = emb.filter(F.col("vec_id").isin([int(i) for i in query_vec_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    joined = emb.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("qvec"), F.col("vec"))
            / (_norm(F.col("qvec")) * _norm(F.col("vec")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def _kmeans(sample: np.ndarray, k: int, iters: int = 15, seed: int = 42) -> np.ndarray:
    """Seeded NumPy k-means on L2-normalized vectors (driver-side;
    the coarse quantizer is a tiny artifact, broadcast like the
    tokenizer). Empty clusters are re-seeded deterministically."""
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    x = sample / np.where(norms > 0, norms, 1.0)
    cent = x[rng.choice(x.shape[0], size=k, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = x[assign == c]
            if members.shape[0]:
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                cent[c] = m / n if n > 0 else cent[c]
            else:
                cent[c] = x[int(rng.integers(0, x.shape[0]))]
    return cent


def ivf_assignments(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, vec, cluster) — nearest-centroid assignment, one Arrow
    pass (matrix multiply per batch)."""
    spark = emb.sparkSession
    cent_bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf(T.IntegerType())
    def cluster_of(vecs: pd.Series) -> pd.Series:
        cent = cent_bc.value
        mat = np.stack(vecs.to_numpy())
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms > 0, norms, 1.0)
        return pd.Series((mat @ cent.T).argmax(axis=1).astype(np.int32))

    return emb.select("vec_id", "vec", cluster_of(F.col("vec")).alias("cluster"))


def cosine_topk_ivf(
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 5,
    n_clusters: int | None = None,
    n_probe: int = 4,
    seed: int = 42,
    train_sample: int = 20000,
) -> DataFrame:
    """IVF ANN — the 100 TB scale path: a k-means coarse quantizer
    (trained on a driver sample, broadcast) partitions vectors into
    clusters; each query probes its ``n_probe`` nearest clusters and
    reranks exactly. Candidates shrink ~n_probe/n_clusters; the probe
    join is a broadcast equi-join on the cluster id. Approximate —
    recall validated against ``cosine_topk_bruteforce`` in tests."""
    sample_rows = emb.select("vec").limit(train_sample).collect()
    sample = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in sample_rows])
    if n_clusters is None:
        n_clusters = max(4, int(np.sqrt(sample.shape[0])))
    n_clusters = min(n_clusters, sample.shape[0])
    centroids = _kmeans(sample, n_clusters, seed=seed)

    assigned = ivf_assignments(emb, centroids).persist()
    qrows = assigned.filter(
        F.col("vec_id").isin([int(i) for i in query_vec_ids])
    ).collect()
    probes = []
    for r in qrows:
        qv = np.asarray(r["vec"], dtype=np.float64)
        n = np.linalg.norm(qv)
        qn = qv / n if n > 0 else qv
        top_c = np.argsort(-(centroids @ qn))[:n_probe]
        probes.extend((int(r["vec_id"]), r["vec"], int(c)) for c in top_c)
    spark = emb.sparkSession
    q = spark.createDataFrame(
        probes, "query_id long, qvec array<double>, cluster int"
    )
    cands = assigned.join(F.broadcast(q), "cluster").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("qvec"), F.col("vec"))
            / (_norm(F.col("qvec")) * _norm(F.col("vec")))
        ).alias("cosine"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(emb: DataFrame, n_planes: int = 12, seed: int = 42) -> DataFrame:
    """(vec_id, bucket) — sign-bit signature w.r.t. seeded hyperplanes."""
    spark = emb.sparkSession
    dim = len(emb.select("vec").first()["vec"])
    planes = _hyperplanes(dim, n_planes, seed)
    planes_bc = spark.sparkContext.broadcast(planes)

    @F.pandas_udf(T.LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        pl = planes_bc.value
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ pl.T) >= 0  # (batch, n_planes)
        weights = (1 << np.arange(pl.shape[0])).astype(np.int64)
        return pd.Series(bits @ weights)

    return emb.select("vec_id", "vec", bucket_of(F.col("vec")).alias("bucket"))


def cosine_topk_lsh(
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 5,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: candidates = vectors sharing the query's LSH bucket
    (or any Hamming-1 neighbor bucket with multiprobe), reranked by
    exact cosine. Approximate — validated for recall against
    ``cosine_topk_bruteforce`` in tests."""
    sigs = lsh_signatures(emb, n_planes, seed).persist()
    q = sigs.filter(F.col("vec_id").isin([int(i) for i in query_vec_ids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            *([F.col("qbucket")] + [
                F.col("qbucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)
            ])
        )
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("qbucket"))
    cands = sigs.join(F.broadcast(q.select("query_id", "qvec", "bucket")), "bucket").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("qvec"), F.col("vec"))
            / (_norm(F.col("qvec")) * _norm(F.col("vec")))
        ).alias("cosine"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )
