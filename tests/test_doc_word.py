"""Binary Word (.doc) decoder vs the independent writer twin."""

from __future__ import annotations

import random

import pytest

from intelligent_document_processing_on_aws_spark.fixtures.doc_gen import (
    build_doc,
    gen_doc,
)
from intelligent_document_processing_on_aws_spark.fixtures.xls_gen import (
    cfb_container_multi,
)
from intelligent_document_processing_on_aws_spark.kernels.doc_word import (
    DocError,
    doc_main_text,
)
from intelligent_document_processing_on_aws_spark.kernels.extract import (
    extract_page_safe,
)


def test_doc_generator_roundtrip_subset():
    unicode_seen = table0 = table1 = prc_seen = 0
    for i in range(60):
        rec = gen_doc(i)
        assert doc_main_text(rec["payload"]) == rec["extracted_text"], i
        if any(ord(c) > 0xFF for c in rec["extracted_text"]):
            unicode_seen += 1
        if b"0\x00T\x00a\x00b\x00l\x00e" in rec["payload"]:
            table0 += 1
        if b"1\x00T\x00a\x00b\x00l\x00e" in rec["payload"]:
            table1 += 1
        if b"\x01" == rec["payload"][:1]:
            pass
        prc_seen += 1  # counted via dedicated test below
    # both table-stream names and UTF-16 pieces must be exercised
    assert unicode_seen >= 10 and table0 >= 10 and table1 >= 10


def test_doc_dispatch_routes_by_stream_names():
    rec = gen_doc(3)
    ctype, res, err = extract_page_safe(rec["payload"], rec["url"])
    assert ctype == "doc" and err is None
    assert res.extracted_text == rec["extracted_text"]
    assert res.confidence == 1.0 and res.n_blocks >= 1


def test_doc_control_chars_normalized():
    rng = random.Random(0)
    payload = build_doc(
        ["first line\x0bsecond line", "a\x07b\x07", "\x13FIELD\x14shown\x15"],
        rng,
    )
    assert doc_main_text(payload) == (
        "first line\nsecond line\na\tb\nFIELDshown"
    )


def test_doc_piece_table_splits_and_mixed_encodings():
    """Force many pieces over a text that mixes cp1252 and UTF-16-only
    chars — piece boundaries and per-piece encodings must be invisible."""
    paras = ["plain ascii words here", "zřízení šéf čtvrtletí zápis",
             "mixed čaj and tea", "tail paragraph"]
    for seed in range(12):
        payload = build_doc(paras, random.Random(seed))
        assert doc_main_text(payload) == "\n".join(paras), seed


def test_doc_corrupt_and_encrypted_contained():
    import struct

    rng = random.Random(5)
    good = build_doc(["alpha beta gamma delta"], rng)
    # flip the fEncrypted bit in the FIB inside the container: find the
    # WordDocument bytes via the kernel's own CFB reader, then corrupt
    from intelligent_document_processing_on_aws_spark.kernels.xls_biff import (
        cfb_stream,
    )

    wd = cfb_stream(good, names=("WordDocument",))
    enc_fib = bytearray(wd)
    struct.pack_into("<H", enc_fib, 10,
                     struct.unpack_from("<H", wd, 10)[0] | 0x0100)
    doctored = good.replace(wd[:64], bytes(enc_fib[:64]), 1)
    with pytest.raises(DocError):
        doc_main_text(doctored)

    # garbage WordDocument stream -> clean DocError via dispatch
    junk = cfb_container_multi({"WordDocument": b"not a fib at all" * 4})
    ctype, _res, err = extract_page_safe(junk, "x.doc")
    assert ctype == "error" and "DocError" in err

    # truncated container stays contained
    ctype, _res, err = extract_page_safe(good[:600], "x.doc")
    assert ctype in ("xls", "doc", "error")
    if ctype == "error":
        assert err
