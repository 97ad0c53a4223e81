"""DSIR importance-resampling operator (operators/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def _l3(n: int) -> int:
    x = min(n, 2_000_000)
    return (x * x * x).bit_length() - 1


def test_dsir_hand_computed_scores(spark):
    from intelligent_document_processing_on_aws_spark.operators.dsir import (
        dsir_weights,
    )

    # target doc repeats 'good text'; raw-only doc repeats 'bad stuff'
    rows = [
        (1, "good text good text good", "en"),
        (2, "bad stuff bad stuff bad", "zh"),
        (3, "good text and bad stuff", "en"),
        (4, "", "en"),
    ]
    out = {
        r["doc_id"]: r
        for r in dsir_weights(
            _docs(spark, rows), target_cond=F.col("lang") == "en", top_k=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # empty doc: zero grams, zero score
    assert out[4]["n_grams"] == 0 and out[4]["dsir_score"] == 0

    # reproduce doc 1's score by hand: bigrams of doc1 =
    # [good text, text good, good text, text good] -> counts {gt:2, tg:2}
    # corpus: gt appears doc1(2) + doc3(1) = 3 (all), target gt = 3
    #         tg appears doc1(2) = 2, target 2
    # doc3 grams: good text / text and / and bad / bad stuff
    # doc2 grams: bad stuff(2), stuff bad(2)  (raw only)
    ct = {"good text": 3, "text good": 2}
    cr = dict(ct)
    n_t = 4 + 4  # total target grams: doc1 has 4, doc3 has 4
    n_r = 12  # + doc2's 4
    norm = _l3(n_t + 1) - _l3(n_r + 1)
    expect = sum(
        c * (_l3(ct[f] + 1) - _l3(cr[f] + 1)) for f, c in [("good text", 2), ("text good", 2)]
    ) - 4 * norm
    assert out[1]["n_grams"] == 4
    assert out[1]["dsir_score"] == expect
    # target-aligned doc scores above the raw-only doc
    assert out[1]["dsir_score"] > out[2]["dsir_score"]
    # top_k=2 by (score desc, id asc)
    ranked = sorted(out.values(), key=lambda r: (-r["dsir_score"], r["doc_id"]))
    assert [r["doc_id"] for r in ranked if r["selected"]] == [
        r["doc_id"] for r in ranked[:2]
    ]


def test_dsir_selection_tie_break_is_lowest_id(spark):
    from intelligent_document_processing_on_aws_spark.operators.dsir import (
        dsir_weights,
    )

    # identical docs -> identical scores; top_k=2 must pick ids 1,2
    rows = [(i, "same words here", "en") for i in range(1, 5)]
    out = {
        r["doc_id"]: r["selected"]
        for r in dsir_weights(
            _docs(spark, rows), target_cond=F.col("lang") == "en", top_k=2
        ).collect()
    }
    assert out == {1: True, 2: True, 3: False, 4: False}


def test_dsir_hashed_buckets_same_shape_and_determinism(spark):
    from intelligent_document_processing_on_aws_spark.operators.dsir import (
        dsir_weights,
    )

    rows = [
        (i, f"word{i % 5} common word{(i + 1) % 5} tail{i % 3}", "en" if i % 2 else "zh")
        for i in range(40)
    ]
    df = _docs(spark, rows)
    hashed = dsir_weights(
        df, target_cond=F.col("lang") == "en", top_k=10, hash_buckets=64
    )
    a = hashed.orderBy("doc_id").collect()
    b = (
        dsir_weights(
            _docs(spark, rows).repartition(7),
            target_cond=F.col("lang") == "en",
            top_k=10,
            hash_buckets=64,
        )
        .orderBy("doc_id")
        .collect()
    )
    assert a == b
    # bucketing preserves per-doc gram counts exactly
    plain = {
        r["doc_id"]: r["n_grams"]
        for r in dsir_weights(df, F.col("lang") == "en", top_k=10).collect()
    }
    assert {r["doc_id"]: r["n_grams"] for r in a} == plain
    assert sum(r["selected"] for r in a) == 10


def test_dsir_plan_native_and_broadcast_threshold(spark):
    from intelligent_document_processing_on_aws_spark.operators.dsir import (
        dsir_weights,
    )

    df = _docs(spark, [(i, "alpha beta gamma", "en") for i in range(10)])
    out = dsir_weights(df, F.col("lang") == "en", top_k=3, hash_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # zero Python anywhere — the whole pipeline is codegen'd relational ops
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    # hashed mode: score table and k-th threshold join as broadcasts
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
