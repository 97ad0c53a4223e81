"""From-scratch RTF text extraction (kernels/rtf)."""

from __future__ import annotations

import pytest

from intelligent_document_processing_on_aws_spark.kernels.rtf import (
    RtfError,
    rtf_to_text,
)


def test_basic_paragraphs_and_tables_skipped():
    raw = (rb"{\rtf1\ansi\ansicpg1252{\fonttbl{\f0 Arial;}}"
           rb"{\colortbl ;\red0\green0\blue0;}"
           rb"Hello, world!\par Second line.\par}")
    assert rtf_to_text(raw) == "Hello, world!\nSecond line."


def test_escape_families():
    assert rtf_to_text(rb"{\rtf1 caf\'e9}") == "café"
    assert rtf_to_text(rb"{\rtf1\uc1 \u955 ?x}") == "λx"
    assert rtf_to_text(rb"{\rtf1\uc2 \u955 ??x}") == "λx"     # 2 fallbacks
    assert rtf_to_text(rb"{\rtf1 \u-10179 ?\u-8704 ?}") == "😀"  # pair
    assert rtf_to_text(rb"{\rtf1 \{x\} \\ \~}") == "{x} \\  "
    assert rtf_to_text(rb"{\rtf1 a\emdash b\tab c}") == "a—b\tc"


def test_skip_destinations_and_formatting_groups():
    raw = (rb"{\rtf1{\*\generator Writer 7;}{\info{\title secret}}"
           rb"{\pict\wmetafile8 00112233}one {\b two} three\par}")
    assert rtf_to_text(raw) == "one two three"


def test_bin_run_skipped_whole():
    # \bin payload may contain { } \ bytes — they must not be parsed
    # (the 5 raw bytes here are 'ABC{\')
    raw = rb"{\rtf1 a{\pict\bin5 ABC{\}b}"
    assert rtf_to_text(raw) == "ab"


def test_codepage_switch():
    # \ansicpg1251 switches \'hh decode: 0xE9 is й in cp1251 (é in 1252)
    assert rtf_to_text(rb"{\rtf1\ansicpg1251 \'e9}") == "й"
    assert rtf_to_text(rb"{\rtf1\ansicpg1252 \'e9}") == "é"


@pytest.mark.parametrize("bad", [
    b"plain text not rtf",
    rb"{\rtf1 unbalanced",
    rb"{\rtf1 too many}}",
    rb"{\rtf1 \'q9}",
    rb"{\rtf1 dangling\\",
])
def test_malformed_raises_rtferror(bad):
    with pytest.raises(RtfError):
        rtf_to_text(bad)


def test_fixture_golden_parity_driver_side():
    """Every generated fixture decodes byte-identically to its
    construction-derived golden; corrupt ones land on the error path."""
    from intelligent_document_processing_on_aws_spark.fixtures.rtf_gen import (
        gen_rtf_docs,
    )
    from intelligent_document_processing_on_aws_spark.kernels.extract import (
        extract_page_safe,
    )

    docs = gen_rtf_docs(110)
    n_err = 0
    for d in docs:
        ct, res, err = extract_page_safe(d["payload"], d["url"])
        assert ct == d["kind"], d["doc_id"]
        assert res.extracted_text == d["extracted_text"], d["doc_id"]
        if ct == "error":
            n_err += 1
            assert err and "RtfError" in err
    assert n_err == 10


def test_committed_fixture_bytes_are_stable():
    """The committed parquet matches a fresh generation byte-for-byte —
    regeneration is deterministic (the goldens are trustworthy)."""
    import duckdb

    from intelligent_document_processing_on_aws_spark.fixtures.rtf_gen import (
        gen_rtf_docs,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, payload, kind, extracted_text "
        "FROM read_parquet('fixtures_data/rtf_docs.parquet') d "
        "JOIN read_parquet('fixtures_data/rtf_golden.parquet') g "
        "USING (doc_id) ORDER BY doc_id").fetchall()
    gen = gen_rtf_docs(110)
    assert len(rows) == len(gen)
    for (did, payload, kind, text), d in zip(rows, gen):
        assert did == d["doc_id"] and bytes(payload) == d["payload"]
        assert kind == d["kind"] and text == d["extracted_text"]
