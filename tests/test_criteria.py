"""Criteria validation: chunker parity, decision ladder, Spark-vs-pure twin.

Mirrors criteria_validation/service.py semantics (LLM judgments replaced by
regex predicates per the north star); the chunker is char-math parity with
``_chunk_text_with_overlap`` plus the documented termination fix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.operators.criteria import (
    chunk_text_with_overlap,
    validate_criteria,
)


def test_chunker_single_chunk_token_estimate_boundary():
    # single chunk iff len // token_size <= max_chunk_size — the estimate
    # boundary, NOT the char-window boundary (403 chars <= 100 est. tokens)
    assert chunk_text_with_overlap("x" * 403, 100, 4, 10) == ["x" * 403]
    assert len(chunk_text_with_overlap("x" * 404, 100, 4, 10)) > 1


def test_chunker_window_boundaries_and_termination():
    text = "".join(chr(ord("a") + i % 26) for i in range(1000))
    chunks = chunk_text_with_overlap(text, 100, 4, 10)  # chunk=400, step=360
    assert chunks[0] == text[0:400]
    assert chunks[1] == text[360:760]
    assert chunks[2] == text[720:1000]  # clamped final window, then stop
    assert len(chunks) == 3
    # overlap preserved between consecutive windows
    assert chunks[0][-40:] == chunks[1][:40]
    # exact multiple of the window layout terminates too (end == len)
    assert len(chunk_text_with_overlap("y" * 760, 100, 4, 10)) == 2
    # zero overlap (the only configuration the reference loop survives)
    z = chunk_text_with_overlap("z" * 1000, 100, 4, 0)
    assert [len(c) for c in z] == [400, 400, 200]


def test_validate_criteria_decisions_and_spark_parity(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha spark beta " * 40),            # Pass (long, multi-chunk)
            (2, "slow machine " * 40),                # Fail
            (3, "nothing relevant here"),             # Not Found (single chunk)
            (4, "pad " * 30 + "spark" + " pad" * 30), # Pass found mid-text
        ],
        "doc_id long, text string",
    )
    crit = spark.createDataFrame(
        [("content", "q1", "spark", "slow")],
        "criteria_type string, question_id string, pass_pattern string, fail_pattern string",
    )
    out = {r.doc_id: r for r in
           validate_criteria(docs, crit, max_chunk_size=25, token_size=4,
                             overlap_percentage=10).collect()}
    assert out[1].decision == "Pass"
    assert out[2].decision == "Fail"
    assert out[3].decision == "Information Not Found"
    assert out[4].decision == "Pass"
    assert out[3].n_chunks == 1
    # chunk counts agree with the pure twin on every row
    texts = {r.doc_id: r.text for r in docs.collect()}
    for did, row in out.items():
        assert row.n_chunks == len(
            chunk_text_with_overlap(texts[did], 25, 4, 10)
        ), did


def test_validate_criteria_null_fail_pattern(spark):
    docs = spark.createDataFrame([(1, "no match here")], "doc_id long, text string")
    crit = spark.createDataFrame(
        [("c", "q", "absent_token", None)],
        "criteria_type string, question_id string, pass_pattern string, fail_pattern string",
    )
    row = validate_criteria(docs, crit).collect()[0]
    assert row.decision == "Information Not Found"


def test_validate_criteria_plan_native(spark):
    """Zero Python stages: sequence/transform/substr/regexp_like/exists are
    all Catalyst expressions; criteria is a broadcast nested loop."""
    docs = spark.createDataFrame([(1, "t " * 500)], "doc_id long, text string")
    crit = spark.createDataFrame(
        [("c", "q", "t", None)],
        "criteria_type string, question_id string, pass_pattern string, fail_pattern string",
    )
    plan = validate_criteria(docs, crit)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "Broadcast" in plan


def test_single_chunk_keeps_full_text_spark(spark):
    """A 103-char doc passes the token estimate (103//4=25<=25) but exceeds
    the 100-char window: the single chunk must keep the FULL text — a
    pattern in the trailing chars still matches (regression: the Spark
    branch once truncated to the window)."""
    text = "x" * 100 + "XYZ"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    crit = spark.createDataFrame(
        [("c", "q", "XYZ", None)],
        "criteria_type string, question_id string, pass_pattern string, fail_pattern string",
    )
    row = validate_criteria(docs, crit, max_chunk_size=25, token_size=4,
                            overlap_percentage=10).collect()[0]
    assert row.decision == "Pass" and row.n_chunks == 1
    assert chunk_text_with_overlap(text, 25, 4, 10) == [text]


def test_chunker_rejects_degenerate_overlap(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_text_with_overlap("x" * 500, 100, 1, 100)
    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    crit = spark.createDataFrame(
        [("c", "q", "t", None)],
        "criteria_type string, question_id string, pass_pattern string, fail_pattern string",
    )
    with _pytest.raises(ValueError):
        validate_criteria(docs, crit, overlap_percentage=100)


def test_validate_criteria_custom_id_col(spark):
    docs = spark.createDataFrame([(7, "spark here")], "page_id long, text string")
    crit = spark.createDataFrame(
        [("c", "q", "spark", None)],
        "criteria_type string, question_id string, pass_pattern string, fail_pattern string",
    )
    row = validate_criteria(docs, crit, id_col="page_id").collect()[0]
    assert row.page_id == 7 and row.decision == "Pass"
