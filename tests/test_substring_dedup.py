"""Exact-substring span dedup at k-token windows (Lee et al. 2022)."""

from __future__ import annotations

from intelligent_document_processing_on_aws_spark.operators.dedup import (
    substring_span_dedup,
)

SHARED = "the quick brown fox jumps over the lazy dog today"  # 10 tokens


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in substring_span_dedup(df, **kw).collect()}


def test_canonical_keeps_span_others_lose_it(spark):
    out = _run(
        spark,
        [
            (0, "intro words here " + SHARED + " tail zero"),
            (1, "different opening text " + SHARED + " closing one"),
            (2, "no duplicate content in this document at all right"),
        ],
        k=8,
    )
    assert out[0].n_removed == 0
    assert SHARED in out[0].text_deduped
    # doc 1 loses EXACTLY the 10 shared tokens; its own text survives
    assert out[1].n_removed == 10
    assert out[1].text_deduped == "different opening text closing one"
    assert out[2].n_removed == 0


def test_within_doc_repetition_is_not_cross_doc_duplication(spark):
    # the window occurs twice in ONE doc -> distinct-doc count is 1
    text = SHARED + " middle filler words " + SHARED
    out = _run(spark, [(0, text), (1, "unrelated text entirely here")],
               k=8)
    assert out[0].n_removed == 0


def test_min_docs_threshold(spark):
    rows = [
        (0, "a " + SHARED), (1, "b " + SHARED), (2, "c " + SHARED),
    ]
    strict = _run(spark, rows, k=8, min_docs=4)
    assert all(r.n_removed == 0 for r in strict.values())
    loose = _run(spark, rows, k=8, min_docs=2)
    assert loose[0].n_removed == 0
    assert loose[1].n_removed == 10 and loose[2].n_removed == 10


def test_short_docs_pass_through(spark):
    out = _run(spark, [(0, "tiny doc"), (1, "tiny doc"), (2, None)], k=8)
    assert out[0].text_deduped == "tiny doc"
    assert out[1].text_deduped == "tiny doc"  # < k tokens: never windowed
    assert out[2].text_deduped == "" and out[2].n_tokens == 0


def test_long_span_removed_entirely_via_overlapping_windows(spark):
    span = " ".join(f"w{i}" for i in range(30))  # 30-token shared span
    out = _run(
        spark,
        [(0, "x " + span + " y"), (1, "p q r " + span + " s")],
        k=8,
    )
    assert out[0].n_removed == 0
    assert out[1].n_removed == 30
    assert out[1].text_deduped == "p q r s"


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(0, "a b c d e f g h i")],
                               "doc_id long, text string")
    plan = substring_span_dedup(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _naive_span_dedup(docs: list[tuple[int, str]], k: int, min_docs: int):
    """Independent O(n^2) reference implementation of the frozen spec."""
    toks = {d: (t or "").split() for d, t in docs}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    occs: dict[str, list[tuple[int, int]]] = {}
    for d, ws in sorted(toks.items()):
        for p in range(len(ws) - k + 1):
            occs.setdefault(" ".join(ws[p:p + k]), []).append((d, p))
    removed: dict[int, set[int]] = {d: set() for d, _ in docs}
    for key, lst in occs.items():
        if len({d for d, _ in lst}) < min_docs:
            continue
        for d, p in sorted(lst)[1:]:  # canonical = smallest (doc, pos)
            removed[d].update(range(p, p + k))
    out = {}
    for d, ws in toks.items():
        kept = [w for i, w in enumerate(ws) if i not in removed[d]]
        out[d] = (" ".join(kept), len(ws), len(removed[d]))
    return out


def test_differential_fuzz_vs_naive_reference(spark):
    import random

    rng = random.Random(20260818)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> dense collisions
    for trial in range(3):
        docs = []
        for d in range(24):
            n = rng.randint(0, 30)
            docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
        k = rng.choice([3, 5])
        expect = _naive_span_dedup(docs, k=k, min_docs=2)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.text_deduped, r.n_tokens, r.n_removed)
            for r in substring_span_dedup(df, k=k).collect()
        }
        assert got == expect, f"trial {trial} k={k}"
