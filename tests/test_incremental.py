"""Bloom-prefiltered incremental batch-vs-corpus dedup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.operators.incremental import (
    _bloom_params,
    build_text_bloom,
    incremental_exact_dedup,
)


def _corpus(spark):
    rows = [(i, f"corpus document number {i}") for i in range(200)]
    rows.append((900, None))  # NULL text in the corpus
    return spark.createDataFrame(rows, "doc_id long, text string")


def _new_batch(spark):
    # 0..49 duplicate corpus texts; 1000..1049 are fresh; one NULL
    rows = [(10_000 + i, f"corpus document number {i}") for i in range(50)]
    rows += [(20_000 + i, f"fresh document {i}") for i in range(50)]
    rows.append((30_000, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_exact_result(spark):
    out = incremental_exact_dedup(_new_batch(spark), _corpus(spark))
    kept = sorted(r.doc_id for r in out.collect())
    # duplicates dropped, fresh kept, NULL text kept (never matches)
    assert kept == sorted(list(range(20_000, 20_050)) + [30_000])


def test_incremental_dedup_matches_naive_anti_join(spark):
    new_b, corpus = _new_batch(spark), _corpus(spark)
    naive = sorted(
        r.doc_id
        for r in new_b.join(corpus.select("text"), on="text",
                            how="left_anti").collect()
    )
    fast = sorted(
        r.doc_id for r in incremental_exact_dedup(new_b, corpus).collect()
    )
    assert fast == naive


def test_empty_corpus_keeps_everything(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = incremental_exact_dedup(_new_batch(spark), empty)
    assert out.count() == _new_batch(spark).count()


def test_bloom_has_no_false_negatives(spark):
    corpus = _corpus(spark).where(F.col("text").isNotNull())
    bitmap, m, k = build_text_bloom(corpus, expected_items=201)
    # every corpus member must probe positive: dedup the corpus against
    # itself -> nothing survives
    self_dedup = incremental_exact_dedup(corpus, corpus)
    assert self_dedup.count() == 0
    assert bitmap.dtype == np.uint64 and len(bitmap) == m // 64
    assert k >= 1


def test_bloom_params_classic_optima():
    m, k = _bloom_params(1000, 0.01)
    # ~9.6 bits/item, 7 hashes at 1% fpp (rounded to whole words)
    assert 9000 <= m <= 10240
    assert k == 7
    m2, _ = _bloom_params(1000, 0.10)
    assert m2 < m  # looser fpp -> smaller bitmap


def test_plan_big_sides_never_shuffle(spark):
    """The corpus and new-batch scans must reach their joins without an
    Exchange: candidates and matched texts are broadcast."""
    out = incremental_exact_dedup(_new_batch(spark), _corpus(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_sharded_bloom_path_identical_result(spark):
    """Forcing the hash-range-shard path (max_broadcast_bits tiny) must
    produce EXACTLY the broadcast path's result — the Bloom is only a
    pre-filter and the joins are exact, so the paths cannot diverge —
    and its plan must contain the cogrouped Arrow probe instead of a
    driver bitmap broadcast."""
    new, corpus = _new_batch(spark), _corpus(spark)
    expected = sorted(
        r["text"] for r in
        incremental_exact_dedup(new, corpus).select("text").collect()
        if r["text"] is not None
    )
    sharded = incremental_exact_dedup(
        new, corpus, max_broadcast_bits=64, shard_bits=256
    )
    got = sorted(
        r["text"] for r in sharded.select("text").collect()
        if r["text"] is not None
    )
    assert got == expected
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan or "CoGroup" in plan
