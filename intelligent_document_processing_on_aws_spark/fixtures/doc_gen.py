"""Genuine binary Word (.doc) fixtures + independent goldens.

Writes real Word-97 structures from the public MS-DOC spec, independent
of kernels/doc_word: a FIB in the ``WordDocument`` stream, a Clx/piece
table in ``0Table``/``1Table`` (drawn per doc), text pieces split at
arbitrary points with per-piece encoding (CP1252 "compressed" vs
UTF-16LE), optional leading Prc property blocks before the Pcdt, Word
control characters (cell marks, line/page breaks, fields, optional
hyphens) planted in the text. Golden text is composed from the template
paragraphs BEFORE serialization.
"""

from __future__ import annotations

import random
import struct

from .xls_gen import cfb_container_multi

WORDS = ("minutes agenda motion carried quorum адjourn budget liaison "
         "resolution amendment bylaw notice proxy ballot treasurer "
         "secretary čtvrtletí zápis usnesení schůze").split()


def _fib(ccp_text: int, fc_clx: int, lcb_clx: int, which_tbl: int) -> bytes:
    fib = bytearray(154 + 93 * 8 + 2)
    struct.pack_into("<H", fib, 0, 0xA5EC)           # wIdent
    struct.pack_into("<H", fib, 2, 0x00C1)           # nFib (Word 97)
    flags = 0x0200 if which_tbl else 0x0000          # fWhichTblStm
    struct.pack_into("<H", fib, 10, flags)
    struct.pack_into("<H", fib, 12, 0x00BF)          # nFibBack
    struct.pack_into("<H", fib, 32, 0x000E)          # csw
    struct.pack_into("<H", fib, 62, 0x0016)          # cslw
    struct.pack_into("<I", fib, 76, ccp_text)        # FibRgLw.ccpText
    struct.pack_into("<H", fib, 152, 0x005D)         # cbRgFcLcb
    struct.pack_into("<I", fib, 154 + 33 * 8, fc_clx)
    struct.pack_into("<I", fib, 154 + 33 * 8 + 4, lcb_clx)
    return bytes(fib)


def build_doc(paragraphs: list[str], rng: random.Random) -> bytes:
    """Serialize paragraphs into a genuine .doc (CFB + FIB + piece table).

    Raw document text = paragraphs joined by 0x0D marks + trailing mark;
    the text is cut into 1..4 pieces at random char boundaries, each
    piece independently stored compressed (only when CP1252-encodable)
    or as UTF-16LE, at shuffled offsets in the WordDocument stream."""
    raw = "\r".join(paragraphs) + "\r"
    n_pieces = 1 + rng.randrange(min(4, max(1, len(raw))))
    cuts = sorted(rng.sample(range(1, len(raw)), n_pieces - 1)) \
        if n_pieces > 1 and len(raw) > 1 else []
    bounds = [0, *cuts, len(raw)]
    pieces = [raw[a:b] for a, b in zip(bounds, bounds[1:])]

    wd = bytearray(_fib(0, 0, 0, 0))          # placeholder FIB, patched below
    wd += b"\x00" * rng.randrange(0, 64)      # arbitrary slack before text
    pcds: list[tuple[int, int]] = []          # (fc field, nchars)
    for p in pieces:
        compressed = rng.random() < 0.6
        try:
            enc = p.encode("cp1252")
        except UnicodeEncodeError:
            compressed = False
        if compressed:
            fc = (len(wd) * 2) | 0x40000000   # byte offset * 2, flag set
            wd += enc
        else:
            if len(wd) % 2:                   # UTF-16 pieces: even offsets
                wd += b"\x00"
            fc = len(wd)
            wd += p.encode("utf-16-le")
        pcds.append((fc, len(p)))
        wd += b"\x00" * rng.randrange(0, 32)  # inter-piece junk

    # PlcPcd: CPs then PCDs
    cps = [0]
    for _, n in pcds:
        cps.append(cps[-1] + n)
    plc = b"".join(struct.pack("<I", cp) for cp in cps)
    for fc, _n in pcds:
        plc += struct.pack("<HIH", 0, fc, 0)
    clx = b""
    if rng.random() < 0.3:                    # leading Prc property block
        grpprl = bytes(rng.randrange(256) for _ in range(rng.randrange(2, 12)))
        clx += b"\x01" + struct.pack("<h", len(grpprl)) + grpprl
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc

    which_tbl = rng.randrange(2)
    tbl = bytearray(b"\x00" * rng.randrange(0, 128))
    fc_clx = len(tbl)
    tbl += clx
    fib = _fib(len(raw), fc_clx, len(clx), which_tbl)
    wd[:len(fib)] = fib

    streams = {
        "WordDocument": bytes(wd),
        ("1Table" if which_tbl else "0Table"): bytes(tbl),
    }
    if rng.random() < 0.5:                    # decoy streams, like real files
        streams["\x05SummaryInformation"] = b"\xfe\xff\x00\x00" * 8
    return cfb_container_multi(streams)


def _paragraph(rng: random.Random) -> tuple[str, str]:
    """(raw text with Word control chars, expected normalized text)."""
    words = [rng.choice(WORDS) for _ in range(3 + rng.randrange(8))]
    raw = " ".join(words)
    expect = raw
    draw = rng.random()
    if draw < 0.2:   # hard line break mid-paragraph
        raw = raw.replace(" ", "\x0b", 1)
        expect = expect.replace(" ", "\n", 1)
    elif draw < 0.35:  # table cell marks -> tabs
        raw = raw + "\x07cell two\x07"
        expect = expect + "\tcell two"
    elif draw < 0.45:  # field characters stripped
        raw = "\x13 HYPERLINK \x14" + raw + "\x15"
        expect = " HYPERLINK " + expect
    elif draw < 0.55:  # optional hyphen dropped, NBSP -> space
        raw = raw.replace(" ", "\x1f\xa0", 1)
        expect = expect.replace(" ", " ", 1).replace(" ", " ")
    return raw, expect


def gen_doc(i: int) -> dict:
    rng = random.Random(f"doc-{i}-42")
    n_paras = 2 + rng.randrange(6)
    raws, expects = [], []
    for _ in range(n_paras):
        r, e = _paragraph(rng)
        raws.append(r)
        expects.append(e)
    payload = build_doc(raws, rng)
    golden = "\n".join(e.rstrip("\t ") for e in expects).strip("\n")
    return {
        "doc_id": i,
        "url": f"https://host{i % 30:04d}.example/word/{i:06d}.doc",
        "payload": payload,
        "extracted_text": golden,
    }


def gen_docs(n: int) -> list[dict]:
    return [gen_doc(i) for i in range(n)]
