"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k. The small side (queries) is
  broadcast; the corpus scan stays partitioned — the right baseline shape
  even at 10^9 vectors (one pass, no shuffle of the corpus).
- lsh_topk: random-hyperplane LSH (SimHash for vectors, Charikar 2002):
  deterministic hyperplanes, b-bit bucket ids, candidates = bucket-equality
  join (with multi-probe on the query side), exact cosine re-rank within
  candidates. The scale path: candidate set ~ corpus/2^b per probe.
- cosine_pairs: all pairs above a cosine threshold (embedding near-dup).

Cosine math is native Catalyst (zip_with + aggregate in double) so the
DuckDB oracle (list_dot_product on doubles) reproduces it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the first n_queries ids.

    Output: (query_id, rank, neighbor_id, cos_sim rounded to 6dp).
    Ordering: cos desc, neighbor_id asc (deterministic tie-break)."""
    queries = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = corpus.join(F.broadcast(queries)).where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a, b) pairs with cosine >= threshold; optional id cap bounds the
    quadratic join for small-scale oracle runs."""
    df = embeddings
    if max_id is not None:
        df = df.where(F.col(id_col) < max_id)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for cosine near-dup pairs: n_tables independent
    hyperplane-LSH bucketings generate candidates (same bucket in ANY
    table), exact cosine verifies. Candidate volume ~ n_tables *
    sum(bucket^2) instead of corpus^2."""
    cand = None
    for t in range(n_tables):
        b = lsh_buckets(embeddings, dim, n_bits, seed=42 + t, id_col=id_col,
                        vec_col=vec_col)
        a1 = b.select(F.col("vec_id").alias("id_a"), F.col("bucket"))
        a2 = b.select(F.col("vec_id").alias("id_b"), F.col("bucket"))
        pairs = a1.join(a2, ["bucket"]).where(F.col("id_a") < F.col("id_b")) \
            .select("id_a", "id_b")
        cand = pairs if cand is None else cand.unionAll(pairs)
    cand = cand.distinct()
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


# -- IVF (inverted-file) ANN ---------------------------------------------------

def build_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means centroids from a bounded driver-side sample
    (index build = small metadata, like loading any ANN index; the corpus
    itself is never collected). L2-normalized so assignment maximizes
    cosine."""
    rows = (
        embeddings.orderBy(id_col).limit(sample).select(vec_col).collect()
    )
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(seed)
    C = X[rs.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


IVF_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("centroid", T.IntegerType()),
    ]
)


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment — one numpy matmul per Arrow batch."""
    C = centroids

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "centroid": np.argmax(M @ C.T, axis=1).astype(np.int32),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(run, IVF_SCHEMA)


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: corpus partitioned into centroid cells; each query probes
    its n_probe nearest cells; exact cosine re-rank within candidates.
    Candidate volume ~ corpus * n_probe / n_centroids per query."""
    spark = embeddings.sparkSession
    C = build_ivf_centroids(embeddings, n_centroids, seed=seed,
                            id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(embeddings, C, id_col, vec_col)
    corpus = embeddings.join(assigned, embeddings[id_col] == assigned["vec_id"]).select(
        embeddings[id_col].alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "centroid",
    )
    # query-side probe lists (driver-side: n_queries is small by contract)
    q_rows = (
        embeddings.where(F.col(id_col) < n_queries)
        .select(id_col, vec_col)
        .collect()
    )
    probe_rows = []
    for r in q_rows:
        v = np.asarray(r[1], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        order = np.argsort(-(C @ v))[:n_probe]
        for c in order:
            probe_rows.append((int(r[0]), list(map(float, r[1])), int(c)))
    probes = spark.createDataFrame(
        probe_rows, f"query_id long, q_vec array<float>, centroid int"
    )
    scored = corpus.join(
        F.broadcast(probes),
        (corpus["centroid"] == probes["centroid"])
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


# -- random-hyperplane LSH ----------------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.normal(size=(n_bits, dim)).astype(np.float64)


BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)


def lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic sign-random-projection bucket per vector (vectorized
    numpy inside Arrow batches — one matmul per batch)."""
    planes = _hyperplanes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (M @ planes.T) > 0
            buckets = (bits @ weights).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col], "bucket": buckets})

    return embeddings.select(id_col, vec_col).mapInPandas(run, BUCKET_SCHEMA)


def lsh_topk(
    embeddings: DataFrame,
    dim: int,
    n_queries: int = 10,
    k: int = 5,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates from same-bucket vectors, exact cosine
    re-rank. Single-probe per query (demo recall; production would
    multi-probe neighboring buckets)."""
    buckets = lsh_buckets(embeddings, dim, n_bits, seed, id_col, vec_col)
    with_b = embeddings.join(buckets, embeddings[id_col] == buckets["vec_id"]).select(
        embeddings[id_col].alias("id"), F.col(vec_col).alias("vec"), "bucket"
    )
    q = with_b.where(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("vec").alias("q_vec"),
        F.col("bucket").alias("q_bucket"),
    )
    c = with_b.select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"), "bucket"
    )
    scored = c.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket"))
                    & (F.col("neighbor_id") != F.col("query_id"))).select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
