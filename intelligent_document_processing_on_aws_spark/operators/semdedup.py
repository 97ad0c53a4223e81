"""SemDeDup: semantic (embedding-space) deduplication.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" (arXiv:2303.09540): k-means cluster the
embedding space, then compare cosine similarity ONLY within a cluster —
the cluster assignment turns an O(n^2) all-pairs problem into
sum-of-squared-cluster-sizes, and n_centroids is chosen to scale with
the corpus so per-cluster work stays bounded.

100-TB shape
------------
* centroid build: bounded driver-side sample through the shared pure
  ``kmeans_centroids`` kernel (index metadata, like loading any ANN
  index — the corpus is never collected);
* assignment: ONE map-only Arrow pass (numpy matmul per batch), no
  shuffle;
* pair stage: a single self-join keyed on the centroid id — the only
  Exchange in the plan; cluster sizes are bounded by construction
  (n_centroids ∝ corpus size), and ``max_cluster`` drops pathological
  clusters with an audit count rather than letting one hot key go
  quadratic (same guard-rail discipline as the LSH bucket cap in
  ``operators/dedup.py``).

The reference pipeline has no semantic dedup; this is part of the
training-data-curation operator set the 100-TB target needs
(SURVEY.md LLM-pipeline section).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity import build_ivf_centroids, cosine

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("centroid", T.IntegerType()),
        T.StructField("v", T.ArrayType(T.FloatType())),
    ]
)


def assign_with_vec(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, centroid, v): nearest-centroid assignment that CARRIES the
    vector through the Arrow pass, so the pair join downstream needs no
    second scan/join back to the corpus (one pass, zero extra shuffles).
    Ties broken toward the lowest centroid id (np.argmax first-max), the
    same rule the DuckDB oracle expresses as ORDER BY dot DESC, cid ASC."""
    C = centroids

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "centroid": np.argmax(Mn @ C.T, axis=1).astype(np.int32),
                    "v": pdf[vec_col],
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(run, _ASSIGN_SCHEMA)


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    n_iters: int = 5,
    sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """Rows DROPPED by semantic dedup: (vec_id, centroid, dup_of, cos_sim).

    A row is dropped when some LOWER-id member of its k-means cluster has
    cosine >= threshold with it (rounded to 6dp before the compare, the
    same quantization as ``cosine_pairs``).  ``dup_of`` is the smallest
    such witness id and ``cos_sim`` that witness's similarity — both
    deterministic, so the result hash-compares against the DuckDB oracle.

    max_cluster: clusters larger than this are excluded from the pair
    stage entirely (skew guard; callers audit via ``cluster_sizes``)."""
    C = build_ivf_centroids(
        embeddings, n_centroids=n_centroids, n_iters=n_iters,
        sample=sample, seed=seed, id_col=id_col, vec_col=vec_col,
    )
    assign = assign_with_vec(embeddings, C, id_col=id_col, vec_col=vec_col)
    if max_cluster is not None:
        sizes = assign.groupBy("centroid").agg(F.count("*").alias("n"))
        keep = sizes.where(F.col("n") <= max_cluster).select("centroid")
        assign = assign.join(F.broadcast(keep), "centroid")
    # each side stages its vector's norm ONCE before the pair join —
    # cosine() inside the join re-derived both norms per candidate pair
    # (3 interpreted aggregate passes per pair instead of 1); same
    # expression on the same vector -> bit-identical score
    # (similarity._cosine_pre)
    from .similarity import _cosine_pre, _norm

    a = assign.select(
        F.col("centroid"),
        F.col("vec_id").alias("dup_of"),
        F.col("v").alias("v_a"),
    ).withColumn("__na", _norm(F.col("v_a")))
    b = assign.select(
        F.col("centroid"),
        F.col("vec_id").alias("vec_id"),
        F.col("v").alias("v_b"),
    ).withColumn("__nb", _norm(F.col("v_b")))
    pairs = (
        a.join(b, ["centroid"])
        .where(F.col("dup_of") < F.col("vec_id"))
        .select(
            "vec_id",
            "centroid",
            "dup_of",
            F.round(
                _cosine_pre(F.col("v_a"), F.col("v_b"),
                            F.col("__na"), F.col("__nb")), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    return pairs.groupBy("vec_id", "centroid").agg(
        F.min("dup_of").alias("dup_of"),
        F.expr("min_by(cos_sim, dup_of)").alias("cos_sim"),
    )


def cluster_sizes(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(centroid, n) audit table — the operational check that n_centroids
    is keeping cluster sizes bounded before the quadratic pair stage."""
    C = build_ivf_centroids(
        embeddings, n_centroids=n_centroids, n_iters=n_iters,
        sample=sample, seed=seed, id_col=id_col, vec_col=vec_col,
    )
    return (
        assign_with_vec(embeddings, C, id_col=id_col, vec_col=vec_col)
        .groupBy("centroid")
        .agg(F.count("*").alias("n"))
    )
