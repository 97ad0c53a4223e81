"""BM25 keyword search ranking."""

from __future__ import annotations

import math

from intelligent_document_processing_on_aws_spark.operators.search import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)


def _corpus(spark):
    rows = [
        (1, "spark table window spark spark"),      # tf-heavy on 'spark'
        (2, "spark and table in one document"),
        (3, "window only here"),
        (4, "no relevant words at all"),
        (5, "table table window spark extra padding words to lengthen"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ranking_and_hits(spark):
    out = bm25_topk(_corpus(spark), ["spark", "table", "window"], k=5)
    rows = out.collect()
    ids = [r.doc_id for r in rows]
    assert set(ids) == {1, 2, 3, 5}          # doc 4 matches nothing
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    hits = {r.doc_id: r.n_hits for r in rows}
    assert hits == {1: 3, 2: 2, 3: 1, 5: 3}
    # 3-distinct-term docs must outrank the 1-term doc
    assert ids.index(3) > ids.index(1) and ids.index(3) > ids.index(5)


def test_rare_term_outweighs_common(spark):
    rows = [(i, "common filler text") for i in range(1, 20)]
    rows += [(100, "common rareword text"), (101, "common text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["common", "rareword"], k=3).collect()
    assert out[0].doc_id == 100  # the only rareword doc ranks first


def test_bm25_formula_single_doc(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    r = bm25_topk(df, ["a"], k=1).first()
    n, df_t, tf, dl, avgdl = 1, 1, 2, 3, 3.0
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    expect = idf * tf * (BM25_K1 + 1) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
    )
    assert abs(r.score - expect) < 1e-12
    assert r.n_hits == 1


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, ["x"], k=5).count() == 0


def test_no_python_in_plan(spark):
    plan = bm25_topk(_corpus(spark), ["spark"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
