"""Legacy .xls (CFB + BIFF8) decoder vs the independent writer twin."""

from __future__ import annotations

import random
import struct

import pytest

from intelligent_document_processing_on_aws_spark.fixtures.xls_gen import (
    build_xls,
    cfb_container,
    gen_xls_doc,
)
from intelligent_document_processing_on_aws_spark.kernels.extract import (
    extract_page_safe,
)
from intelligent_document_processing_on_aws_spark.kernels.xls_biff import (
    XlsError,
    cfb_stream,
    xls_to_markdown,
    xls_to_sheets,
)


def test_xls_generator_roundtrip_subset():
    high_seen = split_seen = book_seen = 0
    for i in range(60):
        rec = gen_xls_doc(i)
        assert xls_to_markdown(rec["payload"]) == rec["extracted_text"], i
        if any(ord(c) > 0xFF for c in rec["extracted_text"]):
            high_seen += 1
        if struct.pack("<H", 0x003C) in rec["payload"]:
            split_seen += 1
        if b"B\x00o\x00o\x00k\x00" in rec["payload"]:
            book_seen += 1
    # the corpus must actually exercise UTF-16 strings, SST CONTINUE
    # splits, and the legacy "Book" stream name
    assert high_seen >= 5 and split_seen >= 5 and book_seen >= 3


def test_xls_dispatch_and_routing():
    rec = gen_xls_doc(1)
    ctype, res, err = extract_page_safe(rec["payload"], rec["url"])
    assert ctype == "xls" and err is None
    assert res.extracted_text == rec["extracted_text"]


def test_cfb_ministream_and_fat_paths():
    """Small workbook -> mini-stream; padding to >=4096 -> FAT stream.
    Same bytes back either way."""
    rng = random.Random("cfb")
    wb = build_xls({"Sheet1": [["A", "B"], ["x", 1]]}, rng)
    assert len(wb) < 4096
    small = cfb_container(wb)
    assert cfb_stream(small) == wb
    big_wb = wb + b"\x00" * (4096 - len(wb) + 64)
    big = cfb_container(big_wb)
    assert cfb_stream(big)[: len(wb)] == wb


def test_sst_continue_split_mid_string():
    """Force tiny SST fragments (mixed latin-1/UTF-16 strings split mid
    character data) — decode must be unaffected."""
    rng = random.Random(3)  # draws a low fragment limit sometimes; force:
    rows = [["Item"], ["alpha beta gamma delta epsilon zeta"],
            ["zřízení šéf zřízení šéf zřízení šéf"],
            ["x" * 300], ["mixed zřízení " + "y" * 200]]
    for seed in range(8):
        rng = random.Random(seed)
        wb = build_xls({"S": rows}, rng)
        got = xls_to_sheets(cfb_container(wb))["S"]
        assert [r[0] for r in got] == [r[0] for r in rows], seed


def test_cell_record_variants():
    rng = random.Random(5)
    sheets = {
        "V": [
            ["n", "rk", "date", "flag", "fnum", "fstr"],
            [1234567.25, 123.45, {"serial": 45000}, {"bool": True},
             {"formula_num": 7.0}, {"formula_str": "cached text"}],
        ]
    }
    rows = xls_to_sheets(cfb_container(build_xls(sheets, rng)))["V"]
    assert rows[1][0] == "1234567.25"
    assert rows[1][1] == "123.45"
    assert rows[1][2] == "2023-03-15"  # serial 45000, 1900 system
    assert rows[1][3] == "TRUE"
    assert rows[1][4] == "7"
    assert rows[1][5] == "cached text"


def test_datemode_1904():
    rng = random.Random(6)
    import datetime as dt

    day = dt.date(2024, 5, 17)
    serial_1900 = day.toordinal() - 693594
    sheets = {"S": [["d"], [{"serial": serial_1900 - 1462}]]}
    wb = build_xls(sheets, rng, date_1904=True)
    assert xls_to_sheets(cfb_container(wb))["S"][1][0] == "2024-05-17"


def test_corrupt_cfb_contained():
    magic = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    cases = [
        magic,                                   # header truncated
        magic + b"\x00" * 600,                   # no valid dir/FAT
        gen_xls_doc(0)["payload"][:700],         # hard truncation
        cfb_container(b"not biff at all" * 10),  # CFB but garbage stream
    ]
    for payload in cases:
        ctype, res, err = extract_page_safe(payload, "f.xls")
        assert ctype in ("xls", "error")
        if ctype == "error":
            assert err
        else:
            assert isinstance(res.extracted_text, str)


def test_non_workbook_cfb_errors_cleanly():
    wb = build_xls({"S": [["a"], ["b"]]}, random.Random(1))
    # a CFB with NEITHER Workbook nor WordDocument streams: clean error
    doc = cfb_container(wb, stream_name="PowerPoint Document")
    with pytest.raises(XlsError):
        cfb_stream(doc)
    ctype, _res, err = extract_page_safe(doc, "legacy.ppt")
    assert ctype == "error" and "XlsError" in err
    # BIFF bytes masquerading as a WordDocument stream: routed to the
    # Word branch, fails the FIB magic check loudly
    masq = cfb_container(wb, stream_name="WordDocument")
    ctype, _res, err = extract_page_safe(masq, "legacy.doc")
    assert ctype == "error" and "DocError" in err


def test_xls_fuzz_template_roundtrip():
    """Randomized template sheets through the writer twin and back:
    values survive for every cell kind, every RNG-dependent serializer
    choice (RK vs NUMBER, MULRK runs, SST splits, mini vs FAT layout)."""
    rng = random.Random(99)
    for trial in range(25):
        n_rows = 1 + rng.randrange(8)
        n_cols = 1 + rng.randrange(6)
        header = [f"col{j}" for j in range(n_cols)]
        rows: list[list] = [header]
        expect: list[list[str]] = [header]
        for _ in range(n_rows):
            row: list = []
            erow: list[str] = []
            for _ in range(n_cols):
                d = rng.random()
                if d < 0.3:
                    v = rng.randrange(-(1 << 28), 1 << 28)
                    row.append(v)
                    erow.append(str(v))
                elif d < 0.5:
                    v = round(rng.uniform(-1000, 1000), 2)
                    row.append(v)
                    erow.append(repr(v) if v != int(v) else str(int(v)))
                elif d < 0.65:
                    text = " ".join(rng.choice(
                        ["plain", "zřízení", "x" * rng.randrange(1, 40)])
                        for _ in range(rng.randrange(1, 4)))
                    row.append(text)
                    erow.append(text)
                elif d < 0.75:
                    row.append({"bool": rng.random() < 0.5})
                    erow.append("TRUE" if row[-1]["bool"] else "FALSE")
                elif d < 0.85:
                    row.append(None)
                    erow.append("")
                else:
                    v = float(rng.randrange(1, 10 ** 9))
                    row.append({"formula_num": v})
                    erow.append(str(int(v)))
            row[-1] = "anchor"  # last col non-empty: pins row width
            erow[-1] = "anchor"
            rows.append(row)
            expect.append(erow)
        wb = build_xls({"F": rows}, rng)
        got = xls_to_sheets(cfb_container(wb))["F"]
        assert got == expect, trial
