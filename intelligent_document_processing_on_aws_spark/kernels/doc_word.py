"""Legacy binary Word (.doc, Word 97-2003) text extraction — stdlib only.

Implements the public MS-DOC retrieval path: FIB header in the
``WordDocument`` stream -> Clx/piece table in the ``0Table``/``1Table``
stream -> text pieces (CP1252 "compressed" or UTF-16LE) -> main-document
text, with Word's control characters normalized (paragraph mark 0x0D ->
newline, cell/row mark 0x07 -> tab, line break 0x0B / page break 0x0C ->
newline, field characters stripped).

This EXCEEDS the reference: GenAIIDP routes ``.doc`` to python-docx
(ocr/service.py:1653-1654 maps doc->docx), which cannot read the binary
format and errors out. Here the same CFB machinery that reads BIFF8
(kernels/xls_biff.cfb_stream) feeds a from-scratch FIB/piece-table
parser, so real Word 97 files produce text.
"""

from __future__ import annotations

import struct

from .boilerplate import ExtractionResult, Span
from .xls_biff import XlsError, cfb_stream


class DocError(ValueError):
    """Structurally invalid or unsupported (encrypted) .doc file."""


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


# FIB layout constants (MS-DOC 2.5.1): base 32 bytes, csw+FibRgW 2+28,
# cslw+FibRgLw 2+88 -> ccpText at 64+12; cbRgFcLcb u16 at 152,
# FibRgFcLcb97 at 154 with (fcClx, lcbClx) = pair index 33
_CCP_TEXT_OFF = 76
_FCCLX_OFF = 154 + 33 * 8


def doc_main_text(payload: bytes) -> str:
    """The main-document text of a binary .doc, control chars normalized."""
    try:
        wd = cfb_stream(payload, names=("WordDocument",))
    except XlsError as e:
        raise DocError(str(e)) from e
    if len(wd) < _FCCLX_OFF + 8 or wd[:2] != b"\xec\xa5":
        raise DocError("not a Word binary file (bad FIB magic)")
    flags = _u16(wd, 10)
    if flags & 0x0100:
        raise DocError("encrypted .doc (fEncrypted)")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    ccp_text = _u32(wd, _CCP_TEXT_OFF)
    fc_clx = _u32(wd, _FCCLX_OFF)
    lcb_clx = _u32(wd, _FCCLX_OFF + 4)
    if lcb_clx == 0:
        return ""
    try:
        tbl = cfb_stream(payload, names=(table_name,))
    except XlsError as e:
        raise DocError(str(e)) from e
    clx = tbl[fc_clx:fc_clx + lcb_clx]
    i = 0
    # skip Prc property blocks (0x01 + i16 size + grpprl data)
    while i < len(clx) and clx[i] == 0x01:
        if i + 3 > len(clx):
            raise DocError("truncated Clx Prc block")
        i += 3 + struct.unpack_from("<h", clx, i + 1)[0]
    if i >= len(clx) or clx[i] != 0x02:
        raise DocError("Clx missing Pcdt")
    lcb = _u32(clx, i + 1)
    plc = clx[i + 5:i + 5 + lcb]
    if len(plc) < lcb or (lcb - 4) % 12:
        raise DocError("malformed PlcPcd")
    n = (lcb - 4) // 12
    cps = [_u32(plc, 4 * k) for k in range(n + 1)]
    out: list[str] = []
    for k in range(n):
        pcd = plc[4 * (n + 1) + 8 * k:4 * (n + 1) + 8 * k + 8]
        fc = _u32(pcd, 2)
        nchars = cps[k + 1] - cps[k]
        if nchars < 0:
            raise DocError("non-monotonic piece CPs")
        if fc & 0x40000000:  # fCompressed: CP1252 bytes at fc/2
            off = (fc & 0x3FFFFFFF) // 2
            out.append(wd[off:off + nchars].decode("cp1252", "replace"))
        else:  # UTF-16LE at fc
            off = fc & 0x3FFFFFFF
            out.append(wd[off:off + 2 * nchars].decode("utf-16-le", "replace"))
    text = "".join(out)[:ccp_text]
    return _normalize_word_text(text)


_CTRL_MAP = {
    0x0D: "\n",   # paragraph mark
    0x0B: "\n",   # hard line break
    0x0C: "\n",   # page break / section mark
    0x07: "\t",   # cell / row mark
    0x1E: "-",    # non-breaking hyphen
    0x1F: "",     # optional hyphen
    0x13: "",     # field begin
    0x14: "",     # field separator
    0x15: "",     # field end
    0x01: "",     # embedded object marker
    0x08: "",     # drawn-object marker
    0xA0: " ",    # non-breaking space -> space (text parity with docx)
}


def _normalize_word_text(text: str) -> str:
    parts = [
        _CTRL_MAP.get(ord(ch), ch) if ord(ch) < 0x20 or ord(ch) == 0xA0
        else ch
        for ch in text
    ]
    lines = "".join(parts).split("\n")
    return "\n".join(ln.rstrip("\t ") for ln in lines).strip("\n")


def extract_doc(payload: bytes) -> ExtractionResult:
    text = doc_main_text(payload)
    lines = text.split("\n") if text else []
    spans: list[Span] = []
    off = 0
    for i, ln in enumerate(lines):
        spans.append(Span(off, off + len(ln), i))
        off += len(ln) + 1
    return ExtractionResult(text, spans, 1.0 if text else 0.0, len(lines))
