"""SemDeDup operator semantics (operators/semdedup.py).

Hand-built embedding sets where cluster membership and cosine values are
known exactly, so drop/keep decisions can be asserted without the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_semdedup_drops_higher_id_of_near_identical_pair(spark):
    from intelligent_document_processing_on_aws_spark.operators.semdedup import (
        semdedup,
    )

    # two tight groups on orthogonal axes + one isolated vector
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),      # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.01, 0.999, 0.0, 0.0]),      # near-dup of 2
        (4, [0.0, 0.0, 1.0, 0.0]),         # isolated
    ]
    # 2 clusters: each near-dup pair lands in one cluster (with more
    # centroids than natural groups, kmeans can legitimately split a
    # tight pair across two cells — n_centroids is a corpus-level knob)
    out = {
        r["vec_id"]: r
        for r in semdedup(
            _emb_df(spark, rows), threshold=0.9, n_centroids=2
        ).collect()
    }
    # only the higher id of each near-identical pair is dropped
    assert set(out) == {1, 3}
    assert out[1]["dup_of"] == 0 and out[3]["dup_of"] == 2
    assert out[1]["cos_sim"] >= 0.9 and out[3]["cos_sim"] >= 0.9


def test_semdedup_dup_of_is_smallest_witness(spark):
    from intelligent_document_processing_on_aws_spark.operators.semdedup import (
        semdedup,
    )

    # three colinear vectors: 2 is a near-dup of BOTH 0 and 1 ->
    # dup_of must be the smallest witness (0), cos_sim that pair's value
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.001]),
        (2, [1.0, 0.002]),
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup(
            _emb_df(spark, rows), threshold=0.99, n_centroids=1
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[2]["dup_of"] == 0
    expect = 1.0 / math.sqrt(1 + 0.002**2)
    assert abs(out[2]["cos_sim"] - round(expect, 6)) < 1e-9


def test_semdedup_cross_cluster_pairs_never_compared(spark):
    from intelligent_document_processing_on_aws_spark.operators.semdedup import (
        assign_with_vec,
        semdedup,
    )
    from intelligent_document_processing_on_aws_spark.operators.similarity import (
        build_ivf_centroids,
    )

    # two orthogonal groups: threshold 0.0 would pass EVERY within-cluster
    # pair, so any output row whose dup_of lives in a different cluster
    # would prove a cross-cluster compare happened
    rows = [(i, [1.0 + 0.001 * i, 0.0]) for i in range(5)] + [
        (10 + i, [0.0, 1.0 + 0.001 * i]) for i in range(5)
    ]
    df = _emb_df(spark, rows)
    C = build_ivf_centroids(df, n_centroids=2, seed=7)
    cl = {
        r["vec_id"]: r["centroid"]
        for r in assign_with_vec(df, C).collect()
    }
    out = semdedup(df, threshold=0.0, n_centroids=2, seed=7).collect()
    assert len(out) > 0
    for r in out:
        assert cl[r["vec_id"]] == cl[r["dup_of"]] == r["centroid"]


def test_semdedup_max_cluster_skew_guard(spark):
    from intelligent_document_processing_on_aws_spark.operators.semdedup import (
        cluster_sizes,
        semdedup,
    )

    # one giant tight cluster (60 near-dups) + one small pair
    rows = [(i, [1.0, 0.0001 * i]) for i in range(60)] + [
        (100, [0.0, 1.0]),
        (101, [0.0001, 1.0]),
    ]
    df = _emb_df(spark, rows)
    sizes = {r["centroid"]: r["n"] for r in cluster_sizes(df, n_centroids=2).collect()}
    assert max(sizes.values()) == 60 and min(sizes.values()) == 2
    # cap below the giant cluster: only the small cluster's dup survives
    out = semdedup(df, threshold=0.9, n_centroids=2, max_cluster=10).collect()
    assert [r["vec_id"] for r in out] == [101]
    # uncapped: the giant cluster contributes its 59 drops too
    out_all = semdedup(df, threshold=0.9, n_centroids=2).collect()
    assert len(out_all) == 60


def test_semdedup_deterministic_across_partitioning(spark):
    from intelligent_document_processing_on_aws_spark.operators.semdedup import (
        semdedup,
    )

    rows = [
        (i, [math.cos(0.1 * (i % 7)), math.sin(0.1 * (i % 7)), 0.01 * i, 1.0])
        for i in range(40)
    ]
    df = _emb_df(spark, rows)
    a = semdedup(df, threshold=0.99, n_centroids=4).orderBy("vec_id").collect()
    b = (
        semdedup(df.repartition(13), threshold=0.99, n_centroids=4)
        .orderBy("vec_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_semdedup_empty_input_returns_empty_not_crash(spark):
    """A fully pre-filtered funnel can hand semdedup ZERO embeddings
    (e.g. every doc died at an earlier gate): the centroid build must
    degrade to a 0-row index and the stage must return an empty drops
    table, not raise from np.stack on an empty sample."""
    from pyspark.sql import types as T

    from intelligent_document_processing_on_aws_spark.operators.semdedup import (
        semdedup,
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    empty = spark.createDataFrame([], schema)
    out = semdedup(empty, threshold=0.9)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "centroid", "dup_of", "cos_sim"}
