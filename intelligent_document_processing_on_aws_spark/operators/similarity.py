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


def _cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine(a, b) with the norms PRE-STAGED as named columns.

    ``cosine`` inside a pair join re-derives sqrt(dot(v, v)) for both
    vectors on EVERY candidate row — a cluster member's norm gets
    recomputed once per partner (3 interpreted aggregate passes per
    pair instead of 1). Staging each side's norm before the join keeps
    one aggregate per pair. na/nb must be _norm(a)/_norm(b) of the same
    vectors: same expression on the same bytes -> the same double, and
    the na * nb product keeps cosine's multiplication order, so scores
    are bit-identical."""
    return _dot(a, b) / (na * nb)


def _query_df(
    embeddings: DataFrame,
    queries: DataFrame | None,
    n_queries: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, bool]:
    """Normalize the query side of an ANN call.

    Production signature: a separate ``queries(query_id, q_vec)`` DataFrame
    — queries need not live in the corpus id-space. Convenience fallback
    (queries=None): the first n_queries corpus ids, with self-exclusion so
    a vector is not its own neighbor. Returns (queries_df, exclude_self).
    """
    if queries is not None:
        return queries.select("query_id", "q_vec"), False
    return (
        embeddings.where(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        True,
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query over the full corpus scan.

    queries: (query_id, q_vec) DataFrame — broadcast against the
    partitioned corpus scan (the right baseline shape: no shuffle of the
    corpus; queries-side must fit broadcast, repartition-join otherwise).
    Output: (query_id, rank, neighbor_id, cos_sim rounded to 6dp).
    Ordering: cos desc, neighbor_id asc (deterministic tie-break)."""
    qdf, auto_excl = _query_df(embeddings, queries, n_queries, id_col, vec_col)
    if exclude_self is None:
        exclude_self = auto_excl
    qdf = qdf.withColumn("__qn", _norm(F.col("q_vec")))
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("__cn", _norm(F.col("c_vec")))
    scored = corpus.join(F.broadcast(qdf))
    if exclude_self:
        scored = scored.where(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine_pre(F.col("q_vec"), F.col("c_vec"),
                        F.col("__qn"), F.col("__cn")), 6
        ).alias("cos_sim"),
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
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")) \
        .withColumn("__na", _norm(F.col("v_a")))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")) \
        .withColumn("__nb", _norm(F.col("v_b")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                _cosine_pre(F.col("v_a"), F.col("v_b"),
                            F.col("__na"), F.col("__nb")), 6
            ).alias("cos_sim"),
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
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")) \
        .withColumn("__na", _norm(F.col("v_a")))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")) \
        .withColumn("__nb", _norm(F.col("v_b")))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                _cosine_pre(F.col("v_a"), F.col("v_b"),
                            F.col("__na"), F.col("__nb")), 6
            ).alias("cos_sim"),
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
    if not rows:
        # an empty (or fully pre-filtered) corpus has no index to build;
        # callers treat a 0-row centroid table as "nothing to assign"
        return np.zeros((0, 0), dtype=np.float64)
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    return kmeans_centroids(X, n_centroids, n_iters, seed)


def kmeans_centroids(
    X: np.ndarray, n_centroids: int, n_iters: int = 5, seed: int = 42
) -> np.ndarray:
    """Pure spherical-k-means kernel over a (n, dim) float64 sample —
    shared by the Spark index build (build_ivf_centroids) and the DuckDB
    oracle twin (entry_queries._ivf_oracle_centroids), so both derive
    bit-identical centroids from the same sample bytes."""
    from ..kernels.blasctl import limit_blas_threads

    limit_blas_threads(1)
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


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("q_vec", T.ArrayType(T.FloatType())),
        T.StructField("centroid", T.IntegerType()),
    ]
)


def ivf_probes(queries: DataFrame, centroids: np.ndarray, n_probe: int) -> DataFrame:
    """(query_id, q_vec, centroid) x n_probe — nearest-cell assignment runs
    distributed (one numpy matmul per Arrow batch, centroids in closure),
    so the query side never round-trips the driver and can itself be a
    billion-row table."""
    C = centroids
    # a small corpus can yield fewer centroids than n_probe — clip, or the
    # repeat() fan-out and the argsort width disagree and the batch fails
    k = min(n_probe, C.shape[0])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            M = np.stack(pdf["q_vec"].to_numpy()).astype(np.float64)
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(M @ C.T), axis=1)[:, :k]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy().repeat(k),
                    "q_vec": [v for v in pdf["q_vec"] for _ in range(k)],
                    "centroid": order.reshape(-1).astype(np.int32),
                }
            )

    return queries.select("query_id", "q_vec").mapInPandas(run, PROBE_SCHEMA)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool | None = None,
) -> DataFrame:
    """IVF ANN: corpus partitioned into centroid cells; each query probes
    its n_probe nearest cells; exact cosine re-rank within candidates.
    Candidate volume ~ corpus * n_probe / n_centroids per query.
    queries: (query_id, q_vec) DataFrame; probe assignment is distributed
    (ivf_probes), only the centroid table (n_centroids x dim) lives on the
    driver — the bounded index-build sample in build_ivf_centroids."""
    qdf, auto_excl = _query_df(embeddings, queries, n_queries, id_col, vec_col)
    if exclude_self is None:
        exclude_self = auto_excl
    C = build_ivf_centroids(embeddings, n_centroids, seed=seed,
                            id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(embeddings, C, id_col, vec_col)
    corpus = embeddings.join(assigned, embeddings[id_col] == assigned["vec_id"]).select(
        embeddings[id_col].alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "centroid",
    ).withColumn("__cn", _norm(F.col("c_vec")))
    probes = ivf_probes(qdf, C, n_probe).withColumn("__qn", _norm(F.col("q_vec")))
    cond = corpus["centroid"] == probes["centroid"]
    if exclude_self:
        cond = cond & (F.col("neighbor_id") != F.col("query_id"))
    scored = corpus.join(F.broadcast(probes), cond).select(
        "query_id", "neighbor_id",
        F.round(
            _cosine_pre(F.col("q_vec"), F.col("c_vec"),
                        F.col("__qn"), F.col("__cn")), 6
        ).alias("cos_sim"),
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


QPROBE_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("q_vec", T.ArrayType(T.FloatType())),
        T.StructField("q_bucket", T.IntegerType()),
    ]
)


def lsh_query_probes(
    queries: DataFrame,
    dim: int,
    n_bits: int = 8,
    n_probes: int = 1,
    seed: int = 42,
) -> DataFrame:
    """(query_id, q_vec, q_bucket) x n_probes — multi-probe LSH (Lv et al.,
    VLDB 2007, simplified to single-bit perturbation): probe 1 is the
    query's own bucket; probes 2..n flip the hyperplane bits with the
    smallest projection magnitude |q . h_i| — the bits most likely to
    disagree with a true near neighbor's. Distributed (one numpy matmul
    per Arrow batch, planes in closure); probe buckets per query are
    distinct, so a corpus vector (living in exactly one bucket) can never
    enter the candidate set twice."""
    planes = _hyperplanes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    n_probes = max(1, min(n_probes, n_bits + 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            M = np.stack(pdf["q_vec"].to_numpy()).astype(np.float64)
            proj = M @ planes.T                      # (n, n_bits)
            base = ((proj > 0) @ weights).astype(np.int64)
            probes = [base]
            if n_probes > 1:
                # stable sort so exact |projection| ties resolve to the
                # LOWEST bit index — matches the oracle's 'abs(d), bit'
                # ordering (default quicksort ties are arbitrary)
                order = np.argsort(np.abs(proj), axis=1, kind="stable")
                for j in range(n_probes - 1):
                    probes.append(base ^ weights[order[:, j]])
            stacked = np.stack(probes, axis=1)       # (n, n_probes)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy().repeat(n_probes),
                    "q_vec": [v for v in pdf["q_vec"] for _ in range(n_probes)],
                    "q_bucket": stacked.reshape(-1).astype(np.int32),
                }
            )

    return queries.select("query_id", "q_vec").mapInPandas(run, QPROBE_SCHEMA)


def lsh_topk(
    embeddings: DataFrame,
    dim: int,
    queries: DataFrame | None = None,
    n_queries: int = 10,
    k: int = 5,
    n_bits: int = 8,
    n_probes: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool | None = None,
) -> DataFrame:
    """Approximate top-k: candidates from same-bucket vectors, exact cosine
    re-rank. queries: (query_id, q_vec) DataFrame, bucketed with the SAME
    hyperplanes as the corpus. Multi-probe (default 3 buckets/query):
    each query also probes the buckets reached by flipping its
    lowest-|margin| hyperplane bits (lsh_query_probes), recovering most
    of the recall lost to near-boundary bit flips at ~n_probes x the
    candidate volume — still ~corpus * n_probes / 2^n_bits per query."""
    qdf, auto_excl = _query_df(embeddings, queries, n_queries, id_col, vec_col)
    if exclude_self is None:
        exclude_self = auto_excl
    buckets = lsh_buckets(embeddings, dim, n_bits, seed, id_col, vec_col)
    c = embeddings.join(buckets, embeddings[id_col] == buckets["vec_id"]).select(
        embeddings[id_col].alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"), "bucket",
    ).withColumn("__cn", _norm(F.col("c_vec")))
    q = lsh_query_probes(qdf, dim, n_bits, n_probes, seed) \
        .withColumn("__qn", _norm(F.col("q_vec")))
    cond = F.col("bucket") == F.col("q_bucket")
    if exclude_self:
        cond = cond & (F.col("neighbor_id") != F.col("query_id"))
    scored = c.join(F.broadcast(q), cond).select(
        "query_id", "neighbor_id",
        F.round(
            _cosine_pre(F.col("q_vec"), F.col("c_vec"),
                        F.col("__qn"), F.col("__cn")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
