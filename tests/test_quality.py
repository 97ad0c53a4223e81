"""Gopher/C4 quality-signal operators (operators/quality, kernels/quality)."""

from __future__ import annotations

import numpy as np  # noqa: F401  (session fixture import parity)
from hypothesis import given, settings
from hypothesis import strategies as st

from intelligent_document_processing_on_aws_spark.kernels.quality import (
    REPETITION_COLS,
    repetition_signals,
    trunc6,
)


def test_repetition_signals_hand_computed():
    # 4 lines, one duplicated pair 'X' (1 char each); 'a b c' appears once
    # as a line plus a run-on line
    text = "a b c\nX\nX\na b c a b c a b c"
    dup_f, dup_cf, g2, g3, g4, d5, d10 = repetition_signals(text)
    assert dup_f == trunc6(1 / 4)
    # dup chars: one extra 'X' instance = 1 char; line chars = 5+1+1+17...
    assert dup_cf == trunc6(1 / (5 + 1 + 1 + 17))
    # words: a b c a b c a b c a b c (12); top 2-gram 'a b' count 4, len 3
    assert g2 == trunc6(4 * 3 / len(text))
    assert g3 == trunc6(4 * 5 / len(text))  # 'a b c' x4 (wraps across \n)
    assert g4 == trunc6(2 * 7 / len(text))  # 'a b c a' x2
    # dup-5-gram union coverage over 'a b c x x a b c a b c a b c':
    # 5-grams repeat from 'a b c a b' onward, covering the whole tail
    norm = " ".join(text.lower().split())
    assert 0.0 < d5 <= 1.0 and d10 == 0.0  # only 12 words < 2x10-gram


def test_repetition_signals_edges():
    zeros = (0.0,) * 7
    assert repetition_signals("") == zeros
    assert repetition_signals("\n\n  \n\t\n") == zeros
    assert repetition_signals("one") == zeros
    # all lines identical
    dup_f, dup_cf, *_ = repetition_signals("same\nsame\nsame")
    assert dup_f == trunc6(2 / 3) and dup_cf == trunc6(8 / 12)


def test_top_ngram_tie_break_char_mass_invariant():
    # two 2-grams tie at count 2: 'aa bb' (len 5) and 'bb aa' (len 5) —
    # the emitted char mass is identical whichever wins
    text = "aa bb aa bb aa"
    _, _, g2, g3, g4, _, _ = repetition_signals(text)
    assert g2 == trunc6(2 * 5 / len(text))


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" abX#.\n…\t", max_size=400))
def test_repetition_signal_invariants(text):
    sig = repetition_signals(text)
    dup_f, dup_cf = sig[0], sig[1]
    assert 0.0 <= dup_f <= 1.0 and 0.0 <= dup_cf <= 1.0
    for v in sig[2:5]:
        assert v >= 0.0  # top mass may exceed 1 when occurrences overlap
    for v in sig[5:]:
        assert 0.0 <= v <= 1.0  # union coverage is bounded by definition
    # quantization: 6dp exact
    for v in sig:
        assert v == trunc6(v)


def test_doc_quality_spark_matches_kernel(spark):
    """Arrow-kernel columns == driver-side pure kernel on every row, and
    the native columns match an independent Python re-derivation."""
    from intelligent_document_processing_on_aws_spark.operators.quality import (
        doc_quality,
    )

    rows = [
        (1, "a b c\nX\nX\na b c a b c a b c"),
        (2, "hello world\n- bullet one\n* bullet two\nwait...\n…"),
        (3, ""),
        (4, "# # # tag tag tag tag"),
        (5, "• dot bullet\nplain line\nend with…"),
        (6, "  \n\t\nonly whitespace lines\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in doc_quality(df).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        sig = repetition_signals(text)
        for j, c in enumerate(REPETITION_COLS):
            assert got[doc_id][c] == sig[j], (doc_id, c)

        lines = [ln.strip(" \t\r") for ln in text.split("\n")]
        lines = [ln for ln in lines if ln]
        words = text.lower().split()
        if lines:
            ell = sum(1 for ln in lines if ln.endswith(("...", "…")))
            bul = sum(1 for ln in lines
                      if ln.startswith(("- ", "* ", "•")))
            assert got[doc_id]["ellipsis_line_fraction"] == trunc6(ell / len(lines))
            assert got[doc_id]["bullet_line_fraction"] == trunc6(bul / len(lines))
        if words:
            alpha = sum(1 for w in words if any("a" <= ch <= "z" for ch in w))
            assert got[doc_id]["alpha_word_fraction"] == trunc6(alpha / len(words))
            n_sym = text.count("#") + text.replace("…", "...").count("...")
            assert got[doc_id]["symbol_word_ratio"] == trunc6(n_sym / len(words))


def test_quality_gate_drops_repetitious_docs(spark):
    from intelligent_document_processing_on_aws_spark.operators.quality import (
        quality_gate_ids,
    )

    rows = [
        (1, "a normal paragraph with reasonably varied words in it\n"
            "and a second line that says different things entirely"),
        (2, "buy now " * 40),                  # top-2-gram dominated
        (3, "same line\n" * 10),               # duplicate lines
        (4, "# " * 30 + "word"),               # symbol-heavy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in quality_gate_ids(df).collect()}
    assert kept == {1}


def test_doc_quality_null_text_yields_zero_signals(spark):
    """A NULL text row must flow through the Arrow pass as empty text
    (all-zero repetition signals), not crash the whole task (r5 ADVICE
    fix)."""
    from intelligent_document_processing_on_aws_spark.operators.quality import (
        doc_quality,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "a normal line of words here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in doc_quality(df).collect()}
    assert len(got) == 2
    for c in REPETITION_COLS:
        assert got[1][c] == 0.0, c
    zero_sig = repetition_signals("")
    for j, c in enumerate(REPETITION_COLS):
        assert got[1][c] == zero_sig[j]


def test_doc_quality_plan_vectorized_and_shuffle_free(spark):
    """Map-only lineage: one MapInPandas over the scan with the native
    signals codegen'd beneath it — no BatchEvalPython, no Exchange, no
    join, no second scan."""
    from intelligent_document_processing_on_aws_spark.operators.quality import (
        doc_quality,
    )

    df = spark.createDataFrame([(1, "a b\nc d")], "doc_id long, text string")
    plan = doc_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_compression_signals_kernel_flags_repetition():
    from intelligent_document_processing_on_aws_spark.kernels.quality import (
        compression_signals,
    )

    rep = compression_signals("spam " * 400)
    prose = compression_signals(
        "the quick brown fox jumps over a lazy dog near 12 old barns")
    assert rep[2] < prose[2]            # repetitive junk compresses away
    assert compression_signals("") == (0, 0, 0)
    assert compression_signals(None) == (0, 0, 0)
    nb, nz, ppm = prose
    assert ppm == nz * 1_000_000 // nb  # exact integer contract


def test_compression_ratio_operator_map_only(spark):
    from intelligent_document_processing_on_aws_spark.kernels.quality import (
        compression_signals,
    )
    from intelligent_document_processing_on_aws_spark.operators.quality import (
        compression_ratio,
    )

    docs = spark.createDataFrame(
        [(1, "abc " * 100), (2, "mixed entropy words 123"), (3, None),
         (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_bytes"], r["n_zlib"], r["compression_ppm"])
           for r in compression_ratio(docs).collect()}
    assert got[1] == compression_signals("abc " * 100)
    assert got[2] == compression_signals("mixed entropy words 123")
    assert got[3] == (0, 0, 0) and got[4] == (0, 0, 0)
    plan = compression_ratio(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and plan.count("MapInPandas") == 1
