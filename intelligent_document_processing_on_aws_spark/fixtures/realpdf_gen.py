"""Genuine ``%PDF`` fixture corpus + construction-independent goldens.

Each record is a real, spec-conformant PDF written byte-by-byte here
(header, numbered objects, page tree, content streams, xref table with
true offsets, trailer) — no PDF library involved. The golden extracted
text is computed from the template line data BEFORE rendering, so the
parser under test (kernels/real_pdf.py) is validated against independent
construction, mirroring the fixture policy of pages_gen.py.

Coverage knobs exercised across the corpus (seed-addressed, page i fully
determined by Random(f"rpdf-{i}-42")):
- FlateDecode-compressed AND raw content streams;
- /Contents as a single ref AND as an array of stream parts;
- /Length correct, or an indirect reference (parser must not trust it);
- line modes: single Tj, split Tj+Td runs, TJ arrays with kerning,
  hex strings, multi-line TL/T*/'/" blocks, absolute Tm positioning;
- literal-string escapes: \\( \\) \\\\ and octal;
- content-stream comments and graphics noise (q/Q, colors, paths);
- blocks written out of reading order (y-sort must restore it);
- RC4 encryption (standard security handler, R2/40-bit and R3/128-bit,
  random owner password, EMPTY user password): every stream payload
  RC4'd with its per-object key, /Encrypt + /ID in the trailer.
"""

from __future__ import annotations

import base64
import binascii
import json
import random
import re
import zlib
from datetime import timedelta

from .pages_gen import BASE_TS, LANGS, WORDS, _spans_for

PAGE_W, PAGE_H = 612, 792
TOP_Y = 720.0
LEADING = 18.0
LEFT_X = 72.0


def _esc_literal(text: str, rng: random.Random) -> str:
    """Escape a literal string; randomly renders one safe char as octal."""
    out = []
    octal_at = rng.randrange(len(text) * 3) if text else -1  # usually miss
    for idx, ch in enumerate(text):
        if ch in "\\()":
            out.append("\\" + ch)
        elif idx == octal_at and ch.isalpha():
            out.append(f"\\{ord(ch):03o}")
        else:
            out.append(ch)
    return "".join(out)


def _line_ops(text: str, x: float, y: float, rng: random.Random) -> str:
    """Render one line as a self-contained BT/ET block in a random mode."""
    mode = rng.choice(("tj", "tj", "tj2", "tjarr", "tjgap", "hex", "tm"))
    words = text.split(" ")
    if mode == "tjgap" and len(words) >= 2:
        # inter-word spaces encoded ONLY as TJ word-gap adjustments
        # (<= -180 thousandths); some words also sub-split with small
        # kerns that must still concatenate.
        parts: list[str] = []
        for w, word in enumerate(words):
            if w:
                parts.append(str(-(200 + rng.randrange(400))))
            if len(word) >= 4 and rng.random() < 0.3:
                cut = 2 + rng.randrange(len(word) - 3)
                parts.append(f"({_esc_literal(word[:cut], rng)})")
                parts.append(str(-rng.randrange(20, 170)))
                parts.append(f"({_esc_literal(word[cut:], rng)})")
            else:
                parts.append(f"({_esc_literal(word, rng)})")
        return f"BT /F1 12 Tf {x:.1f} {y:.1f} Td [{' '.join(parts)}] TJ ET"
    if mode == "tj2" and len(words) >= 4:
        cut = 1 + rng.randrange(len(words) - 2)
        c1, c2 = " ".join(words[:cut]), " ".join(words[cut:])
        dx = 6.0 * (len(c1) + 1)
        return (
            f"BT /F1 12 Tf {x:.1f} {y:.1f} Td ({_esc_literal(c1, rng)}) Tj "
            f"{dx:.1f} 0 Td ({_esc_literal(c2, rng)}) Tj ET"
        )
    if mode == "tjarr" and len(text) >= 8:
        cuts = sorted(rng.sample(range(2, len(text) - 2), rng.randrange(1, 3)))
        chunks, prev = [], 0
        for c in cuts:
            chunks.append(text[prev:c])
            prev = c
        chunks.append(text[prev:])
        arr = " ".join(
            # kerning-scale only (< WORD_GAP_TJ=180): must concatenate
            f"({_esc_literal(c, rng)}) {-rng.randrange(20, 170)}" for c in chunks
        ).rsplit(" ", 1)[0]  # no trailing kern after last chunk
        return f"BT /F1 12 Tf {x:.1f} {y:.1f} Td [{arr}] TJ ET"
    if mode == "hex":
        hx = text.encode("latin-1").hex().upper()
        if rng.random() < 0.5 and len(hx) > 8:  # whitespace inside hex is legal
            mid = 2 * (len(hx) // 4)
            hx = hx[:mid] + "\n" + hx[mid:]
        return f"BT /F1 12 Tf {x:.1f} {y:.1f} Td <{hx}> Tj ET"
    if mode == "tm":
        return (
            f"BT /F1 12 Tf 1 0 0 1 {x:.1f} {y:.1f} Tm "
            f"({_esc_literal(text, rng)}) Tj ET"
        )
    return f"BT /F1 12 Tf {x:.1f} {y:.1f} Td ({_esc_literal(text, rng)}) Tj ET"


def _multiline_block(lines: list[str], y0: float, rng: random.Random) -> str:
    """One BT block showing several lines via TL + T*/'/" operators."""
    ops = [f"BT /F1 12 Tf {LEFT_X:.1f} {y0:.1f} Td {LEADING:.1f} TL"]
    ops.append(f"({_esc_literal(lines[0], rng)}) Tj")
    for ln in lines[1:]:
        kind = rng.choice(("quote", "dquote", "tstar"))
        if kind == "quote":
            ops.append(f"({_esc_literal(ln, rng)}) '")
        elif kind == "dquote":
            ops.append(f"{rng.randrange(3)} 0 ({_esc_literal(ln, rng)}) \"")
        else:
            ops.append(f"T* ({_esc_literal(ln, rng)}) Tj")
    ops.append("ET")
    return " ".join(ops)


_NOISE = (
    "q 1 0 0 RG 72 100 m 200 100 l S Q",
    "q 0.5 g 100 60 120 30 re f Q",
    "% generator noise comment",
    "q 1 0 0 1 0 0 cm Q",
)


def _page_content_ops(rng: random.Random) -> tuple[list[str], list[str]]:
    """Returns (golden_lines_top_down, op_blocks_in_write_order)."""
    n_lines = 3 + rng.randrange(5)
    lines = [
        " ".join(rng.choice(WORDS) for _ in range(4 + rng.randrange(6)))
        for _ in range(n_lines)
    ]
    # plant escape-needing chars in some lines (golden includes them)
    for k in range(len(lines)):
        r = rng.random()
        if r < 0.15:
            lines[k] += " (note)"
        elif r < 0.22:
            lines[k] += " a\\b"
    blocks: list[str] = []
    idx = 0
    while idx < len(lines):
        y = TOP_Y - LEADING * idx
        take = rng.randrange(2, 4) if (rng.random() < 0.3 and len(lines) - idx >= 2) else 1
        if take > 1:
            span = lines[idx:idx + min(take, len(lines) - idx)]
            blocks.append(_multiline_block(span, y, rng))
            idx += len(span)
        else:
            blocks.append(_line_ops(lines[idx], LEFT_X, y, rng))
            idx += 1
        if rng.random() < 0.25:
            blocks.append(rng.choice(_NOISE))
    rng.shuffle(blocks)  # reading order must be restored by y-sort
    return lines, blocks


def _table_page_ops(rng: random.Random) -> tuple[list[str], list[str]]:
    """A tabular page: a title line plus R rows x C columns of cells at
    FIXED column x-positions — the layout signature
    pdf_layout.lines_to_blocks must reconstruct as one pipe table. Golden
    = [title, format_pipe_table(rows)] via the frozen formatting spec."""
    from ..kernels.tables import format_pipe_table

    n_cols = 3 + rng.randrange(3)
    n_rows = 2 + rng.randrange(4)  # header + >=1 data row
    col_x = [LEFT_X + 110.0 * c for c in range(n_cols)]
    header = [f"Col{c + 1}" for c in range(n_cols)]
    rows = [header]
    for _ in range(n_rows):
        rows.append([
            str(rng.randrange(10000)) if rng.random() < 0.4
            else " ".join(rng.choice(WORDS) for _ in range(1 + rng.randrange(2)))
            for _ in range(n_cols)
        ])
    title = " ".join(rng.choice(WORDS) for _ in range(3 + rng.randrange(3)))
    blocks = [_line_ops(title, LEFT_X, TOP_Y + LEADING, rng)]
    for r, row in enumerate(rows):
        y = TOP_Y - LEADING * r
        for c, cell in enumerate(row):
            blocks.append(
                f"BT /F1 12 Tf {col_x[c]:.1f} {y:.1f} Td "
                f"({_esc_literal(cell, rng)}) Tj ET"
            )
    rng.shuffle(blocks)  # y/x sort must restore both order and columns
    return [title, format_pipe_table(rows)], blocks


def _cmap_page_ops(rng: random.Random) -> tuple[list[str], list[str], dict]:
    """A page shown through a custom-encoded (subsetted) font: byte codes
    bear NO relation to latin-1 — text is recoverable only through the
    /ToUnicode CMap. Returns (golden lines, /F2 hex-string blocks,
    char->code map + params for the CMap builder)."""
    n_lines = 3 + rng.randrange(4)
    lines = []
    for _ in range(n_lines):
        ws = [rng.choice(WORDS) for _ in range(4 + rng.randrange(5))]
        ws = [w.capitalize() if rng.random() < 0.25 else w for w in ws]
        line = " ".join(ws)
        if rng.random() < 0.3:
            line += "."
        lines.append(line)
    two_byte = rng.random() < 0.35
    base = 0x0100 if two_byte else 0
    # 'a'..'z' via ONE bfrange at codes base+0x40.. (deliberately shifted
    # from ASCII so a latin-1 misread is visibly wrong, not coincidentally
    # right); all other chars via bfchar (some as the array-form bfrange)
    char_code = {chr(0x61 + k): base + 0x40 + k for k in range(26)}
    next_code = base + 1
    for ch in sorted(set("".join(lines)) - set(char_code)):
        char_code[ch] = next_code
        next_code += 1
    width = 4 if two_byte else 2
    blocks = []
    for idx, line in enumerate(lines):
        y = TOP_Y - LEADING * idx
        hx = "".join(f"{char_code[c]:0{width}X}" for c in line)
        if rng.random() < 0.3 and len(hx) > 2 * width:
            cut = width * 2 * (len(hx) // (2 * width * 2))
            blocks.append(
                f"BT /F2 12 Tf {LEFT_X:.1f} {y:.1f} Td "
                f"[<{hx[:cut]}> {-rng.randrange(20, 170)} <{hx[cut:]}>] TJ ET"
            )
        else:
            blocks.append(f"BT /F2 12 Tf {LEFT_X:.1f} {y:.1f} Td <{hx}> Tj ET")
    rng.shuffle(blocks)
    return lines, blocks, {"char_code": char_code, "two_byte": two_byte}


_GLYPH_POOL = [
    ("quoteright", "’"), ("quotedblleft", "“"), ("quotedblright", "”"),
    ("emdash", "—"), ("endash", "–"), ("bullet", "•"), ("Euro", "€"),
    ("eacute", "é"), ("adieresis", "ä"), ("ccedilla", "ç"),
    ("ellipsis", "…"), ("oe", "œ"), ("agrave", "à"), ("uacute", "ú"),
]

# cp1252's 0x80-0x9F block: bytes where WinAnsi differs from latin-1
_WINANSI_POOL = ["’", "“", "”", "–", "—", "•", "€", "™", "œ", "…", "ƒ", "Š"]


def _encoding_page_ops(rng: random.Random) -> tuple[list[str], list[str], str]:
    """A page shown through a simple font carrying an /Encoding entry but
    NO ToUnicode CMap: either bare /WinAnsiEncoding (cp1252 high bytes) or
    a /Differences array assigning AGL glyph names to custom codes —
    latin-1 would misread every special character. Returns (golden lines,
    /F3 blocks, the /Encoding value string)."""
    use_winansi = rng.random() < 0.4
    if use_winansi:
        enc_value = "/WinAnsiEncoding"
        code_of = {ch: ch.encode("cp1252")[0] for ch in _WINANSI_POOL}
    else:
        chosen = rng.sample(_GLYPH_POOL, 4 + rng.randrange(4))
        split = rng.randrange(1, len(chosen))
        diff_parts: list[str] = []
        code_of = {}
        code = 0x80 + rng.randrange(0x20)
        for run in (chosen[:split], chosen[split:]):
            if not run:
                continue
            diff_parts.append(str(code))  # restart-number form
            for name, ch in run:
                diff_parts.append("/" + name)
                code_of[ch] = code
                code += 1
            code += 1 + rng.randrange(5)  # gap before the next run
        base = "/BaseEncoding /WinAnsiEncoding " if rng.random() < 0.5 else ""
        enc_value = f"<< {base}/Differences [ {' '.join(diff_parts)} ] >>"
    specials = list(code_of)
    lines, blocks = [], []
    for idx in range(3 + rng.randrange(3)):
        ws = [rng.choice(WORDS) for _ in range(3 + rng.randrange(4))]
        line = " ".join(ws)
        for ch in rng.sample(specials, 2 + rng.randrange(2)):
            pos = rng.randrange(1, len(line))
            line = line[:pos] + ch + line[pos:]
        lines.append(line)
        enc = "".join(chr(code_of.get(c, ord(c))) for c in line)
        y = TOP_Y - LEADING * idx
        if rng.random() < 0.4:
            hx = enc.encode("latin-1").hex().upper()
            blocks.append(f"BT /F3 12 Tf {LEFT_X:.1f} {y:.1f} Td <{hx}> Tj ET")
        else:
            blocks.append(
                f"BT /F3 12 Tf {LEFT_X:.1f} {y:.1f} Td "
                f"({_esc_literal(enc, rng)}) Tj ET"
            )
    rng.shuffle(blocks)
    return lines, blocks, enc_value


def _cid_page_ops(rng: random.Random) -> list[str]:
    """A page shown through a Type0/Identity-H (CID) font WITHOUT a
    /ToUnicode CMap: the 2-byte codes are glyph indices, so the text is
    undecodable and the WHOLE document must degrade to the error column
    (kernels/real_pdf.UnsupportedFont) — never latin-1 mojibake. Returns
    /F4 op blocks only (there is no golden text: the doc errors)."""
    blocks = []
    for idx in range(2 + rng.randrange(3)):
        n_codes = 4 + rng.randrange(8)
        hx = "".join(f"{rng.randrange(0x0100, 0x6000):04X}"
                     for _ in range(n_codes))
        y = TOP_Y - LEADING * idx
        blocks.append(f"BT /F4 12 Tf {LEFT_X:.1f} {y:.1f} Td <{hx}> Tj ET")
    rng.shuffle(blocks)
    return blocks


def _lzw_encode(data: bytes) -> bytes:
    """Fixture-side PDF LZW encoder (EarlyChange=1), width schedule the
    mirror of kernels/real_pdf.lzw_decode (the decoder's table add lags
    one code, so the encoder widens one add late)."""
    table = {bytes([i]): i for i in range(256)}
    size, width = 258, 9
    codes: list[tuple[int, int]] = [(256, 9)]
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = size
        size += 1
        if size - 1 >= (1 << width) - 1 and width < 12:
            width += 1
        w = bytes([b])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    bitbuf = bitcnt = 0
    out = bytearray()
    for code, cw in codes:
        bitbuf = (bitbuf << cw) | code
        bitcnt += cw
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _encode_stream(raw: bytes, rng: random.Random) -> tuple[bytes, str]:
    """Pick a stream encoding; returns (data, /Filter head fragment).
    Exercises every filter the kernel decodes, including the
    ASCII-armor -> compression cascade form."""
    r = rng.random()
    if r < 0.3:
        return raw, ""
    if r < 0.6:
        return zlib.compress(raw), " /Filter /FlateDecode"
    if r < 0.75:
        armored = base64.a85encode(zlib.compress(raw), adobe=True)[2:]
        return armored, " /Filter [ /ASCII85Decode /FlateDecode ]"
    if r < 0.88:
        return binascii.hexlify(raw).upper() + b">", " /Filter /ASCIIHexDecode"
    if r < 0.94:
        return _lzw_encode(raw), " /Filter /LZWDecode"
    return _runlength_encode(raw), " /Filter /RunLengthDecode"


def _runlength_encode(raw: bytes) -> bytes:
    """Independent RunLength writer twin (PDF 1.7 §7.4.5): repeat runs of
    >= 3 as 257-n runs, literal spans otherwise, 128 EOD."""
    out = bytearray()
    i, n = 0, len(raw)
    lit_start = 0

    def flush_literal(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(raw[j:j + k])
            j += k

    while i < n:
        j = i
        while j < n and j - i < 128 and raw[j] == raw[i]:
            j += 1
        if j - i >= 3:
            flush_literal(i)
            out.append(257 - (j - i))
            out.append(raw[i])
            i = j
            lit_start = i
        else:
            i = j
    flush_literal(n)
    out.append(128)
    return bytes(out)


def _cmap_stream(char_code: dict, two_byte: bool, rng: random.Random) -> bytes:
    """Serialize a ToUnicode CMap: codespace + bfchar entries + a bfrange
    for a..z (dstStart increment form) + sometimes the bracketed-array
    bfrange form for a consecutive run of the bfchar codes."""
    width = 4 if two_byte else 2
    cs = ("<0000> <ffff>" if two_byte else "<00> <ff>")
    bfchars = sorted(
        (code, ch) for ch, code in char_code.items() if not ("a" <= ch <= "z")
    )
    arr_form: list[tuple[int, str]] = []
    if len(bfchars) >= 3 and rng.random() < 0.5:
        arr_form, bfchars = bfchars[:3], bfchars[3:]  # consecutive codes
    out = [
        "/CIDInit /ProcSet findresource begin", "12 dict begin", "begincmap",
        "1 begincodespacerange", cs, "endcodespacerange",
    ]
    if bfchars:
        out.append(f"{len(bfchars)} beginbfchar")
        for code, ch in bfchars:
            out.append(f"<{code:0{width}X}> <{ord(ch):04X}>")
        out.append("endbfchar")
    run_start = char_code["a"]
    out.append(f"{1 + bool(arr_form)} beginbfrange")
    out.append(f"<{run_start:0{width}X}> <{run_start + 25:0{width}X}> <0061>")
    if arr_form:
        dsts = " ".join(f"<{ord(ch):04X}>" for _, ch in arr_form)
        out.append(
            f"<{arr_form[0][0]:0{width}X}> <{arr_form[-1][0]:0{width}X}> [{dsts}]"
        )
    out.append("endbfrange")
    out += ["endcmap", "CMapName currentdict /CMap defineresource pop",
            "end", "end"]
    return "\n".join(out).encode("latin-1")


def build_pdf(rng: random.Random) -> tuple[bytes, list[str] | None]:
    """Write a complete multi-page PDF; returns (bytes, golden lines).

    golden is None when the document contains a CID page (Type0 font
    without ToUnicode): such documents are undecodable by contract and
    must land in the error column, so there IS no golden text."""
    n_pages = 1 + rng.randrange(3)
    page_lines: list[list[str]] = []
    page_streams: list[list[bytes]] = []  # per page: 1..2 content parts
    page_cmaps: list[dict | None] = []
    page_encs: list[str | None] = []
    page_cids: list[bool] = []
    for _ in range(n_pages):
        cmap_info = None
        enc_value = None
        is_cid = False
        r = rng.random()
        if r < 0.05:
            lines, blocks, is_cid = [], _cid_page_ops(rng), True
        elif r < 0.25:
            lines, blocks = _table_page_ops(rng)
        elif r < 0.42:
            lines, blocks, cmap_info = _cmap_page_ops(rng)
        elif r < 0.56:
            lines, blocks, enc_value = _encoding_page_ops(rng)
        else:
            lines, blocks = _page_content_ops(rng)
        page_cmaps.append(cmap_info)
        page_encs.append(enc_value)
        page_cids.append(is_cid)
        page_lines.append(lines)
        if len(blocks) >= 2 and rng.random() < 0.3:  # /Contents array form
            cut = 1 + rng.randrange(len(blocks) - 1)
            parts = ["\n".join(blocks[:cut]), "\n".join(blocks[cut:])]
        else:
            parts = ["\n".join(blocks)]
        page_streams.append([p.encode("latin-1") for p in parts])

    # object plan: 1 Catalog, 2 Pages, 3 Font, then page + stream objects
    objects: dict[int, bytes] = {}
    next_num = 4
    page_nums: list[int] = []
    for pg_idx, streams in enumerate(page_streams):
        content_nums = []
        for raw in streams:
            data, filt = _encode_stream(raw, rng)
            if rng.random() < 0.2:  # /Length as indirect ref (untrustable)
                len_num = next_num + 1
                head = f"<< /Length {len_num} 0 R{filt} >>".encode()
                objects[next_num] = head + b"\nstream\n" + data + b"\nendstream"
                content_nums.append(next_num)
                objects[len_num] = str(len(data)).encode()
                next_num += 2
            else:
                head = f"<< /Length {len(data)}{filt} >>".encode()
                objects[next_num] = head + b"\nstream\n" + data + b"\nendstream"
                content_nums.append(next_num)
                next_num += 1
        fonts = "/F1 3 0 R"
        cmap_info = page_cmaps[pg_idx]
        if cmap_info is not None:
            # custom-encoded font: ToUnicode CMap stream + /F2 font dict
            cmap_data = _cmap_stream(
                cmap_info["char_code"], cmap_info["two_byte"], rng
            )
            data, filt = _encode_stream(cmap_data, rng)
            cmap_num, font_num = next_num, next_num + 1
            objects[cmap_num] = (
                f"<< /Length {len(data)}{filt} >>".encode()
                + b"\nstream\n" + data + b"\nendstream"
            )
            objects[font_num] = (
                f"<< /Type /Font /Subtype /TrueType /BaseFont /ABCDEF+Subset "
                f"/ToUnicode {cmap_num} 0 R >>"
            ).encode()
            next_num += 2
            fonts += f" /F2 {font_num} 0 R"
        if page_cids[pg_idx]:
            # Type0/Identity-H with DescendantFonts but NO /ToUnicode:
            # the undecodable-CID shape real subsetted CJK PDFs have
            desc_num, font_num = next_num, next_num + 1
            next_num += 2
            objects[desc_num] = (
                b"<< /Type /Font /Subtype /CIDFontType2 "
                b"/BaseFont /AAAAAA+SourceHanSans /CIDSystemInfo "
                b"<< /Registry (Adobe) /Ordering (Identity) "
                b"/Supplement 0 >> >>"
            )
            objects[font_num] = (
                f"<< /Type /Font /Subtype /Type0 "
                f"/BaseFont /AAAAAA+SourceHanSans /Encoding /Identity-H "
                f"/DescendantFonts [ {desc_num} 0 R ] >>"
            ).encode()
            fonts += f" /F4 {font_num} 0 R"
        enc_value = page_encs[pg_idx]
        if enc_value is not None:
            # simple font with /Encoding (no ToUnicode): bare name, inline
            # dict, or an indirectly-referenced encoding dict
            if enc_value.startswith("<<") and rng.random() < 0.3:
                enc_num = next_num
                next_num += 1
                objects[enc_num] = enc_value.encode("latin-1")
                enc_ref = f"{enc_num} 0 R"
            else:
                enc_ref = enc_value
            font_num = next_num
            next_num += 1
            objects[font_num] = (
                f"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
                f"/Encoding {enc_ref} >>"
            ).encode("latin-1")
            fonts += f" /F3 {font_num} 0 R"
        page_num = next_num
        next_num += 1
        if len(content_nums) == 1:
            contents = f"{content_nums[0]} 0 R"
        else:
            contents = "[ " + " ".join(f"{c} 0 R" for c in content_nums) + " ]"
        if cmap_info is not None and rng.random() < 0.4:
            # /Resources as an indirect object (the common generator shape)
            res_num = next_num
            next_num += 1
            objects[res_num] = f"<< /Font << {fonts} >> >>".encode()
            resources = f"{res_num} 0 R"
        else:
            resources = f"<< /Font << {fonts} >> >>"
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources {resources} /Contents {contents} >>"
        ).encode()
        page_nums.append(page_num)

    kids = " ".join(f"{p} 0 R" for p in page_nums)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [ {kids} ] /Count {len(page_nums)} >>".encode()
    )
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    r_ser = rng.random()
    if r_ser < 0.35:
        out = _serialize_objstm_pdf(objects, next_num, rng)
    elif r_ser < 0.55:
        # RC4-encrypted classic layout (encryption predates ObjStm use:
        # real RC4-era PDFs are overwhelmingly classic-serialized)
        out = _serialize_classic_pdf(objects, encrypt_rng=rng)
    else:
        out = _serialize_classic_pdf(objects)
    if any(page_cids):
        return bytes(out), None
    golden = [ln for pg in page_lines for ln in pg]
    return bytes(out), golden


def _serialize_classic_pdf(objects: dict[int, bytes],
                           encrypt_rng: random.Random | None = None) -> bytes:
    """PDF 1.4 form: every object top-level, classic xref table. With
    encrypt_rng, the document is RC4-encrypted per the standard security
    handler (random owner password, EMPTY user password — the common
    owner-protected web PDF): every stream payload is RC4'd with its
    per-object key, /Encrypt + /ID land in the trailer."""
    trailer_extra = ""
    if encrypt_rng is not None:
        from ..kernels.pdf_crypt import (
            aes_cbc_encrypt,
            aesv2_object_key,
            compute_o_value,
            compute_u_value,
            file_key,
            object_key,
            r6_author_values,
            rc4,
        )

        rng = encrypt_rng
        mode_draw = rng.random()
        if mode_draw < 0.25:
            mode, rev, bits, v = "rc4", 2, 40, 1
        elif mode_draw < 0.6:
            mode, rev, bits, v = "rc4", 3, 128, 2
        elif mode_draw < 0.8:
            mode, rev, bits, v = "aesv2", 4, 128, 4
        else:
            mode, rev, bits, v = "aes256", 6, 256, 5
        owner_pwd = bytes(rng.randrange(33, 126) for _ in range(8))
        p = -44  # typical print-allowed permission mask
        id0 = bytes(rng.randrange(256) for _ in range(16))
        if mode == "aes256":
            key = bytes(rng.randrange(256) for _ in range(32))
            vsalt = bytes(rng.randrange(256) for _ in range(8))
            ksalt = bytes(rng.randrange(256) for _ in range(8))
            u_val, ue_val = r6_author_values(key, b"", vsalt, ksalt)
            o_val = bytes(rng.randrange(256) for _ in range(48))
            oe_val = bytes(rng.randrange(256) for _ in range(32))
            extra = (
                f" /UE <{ue_val.hex().upper()}> /OE <{oe_val.hex().upper()}>"
                f" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
                f" /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
            )
        else:
            o_val = compute_o_value(owner_pwd, b"", rev, bits)
            key = file_key(o_val, p, id0, rev, key_bits=bits)
            u_val = compute_u_value(key, id0, min(rev, 3))
            extra = ""
            if mode == "aesv2":
                extra = (
                    " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                    " /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
                )
        stream_re = re.compile(rb"stream\r?\n")
        for num, body in list(objects.items()):
            m = stream_re.search(body)
            if not m:
                continue
            start = m.end()
            end = body.rfind(b"\nendstream")
            if end == -1:
                end = len(body)
            plain = body[start:end]
            if mode == "rc4":
                data = rc4(object_key(key, num, 0), plain)
            else:
                iv = bytes(rng.randrange(256) for _ in range(16))
                okey = (aesv2_object_key(key, num, 0)
                        if mode == "aesv2" else key)
                data = aes_cbc_encrypt(okey, iv, plain)
            body = body[:start] + data + body[end:]
            if mode != "rc4":
                # AES padding + IV change the stream length: rewrite
                # /Length (direct, or the referenced bare-integer object)
                mlen = re.search(rb"/Length\s+(\d+)\s+\d+\s+R\b",
                                 body[:start])
                if mlen:
                    objects[int(mlen.group(1))] = str(len(data)).encode()
                else:
                    body = re.sub(rb"/Length\s+\d+",
                                  b"/Length " + str(len(data)).encode(),
                                  body, count=1)
            objects[num] = body
        enc_num = max(objects) + 1
        objects[enc_num] = (
            f"<< /Filter /Standard /V {v} /R {rev} /Length {bits} "
            f"/P {p} /O <{o_val.hex().upper()}> /U <{u_val.hex().upper()}>"
            f"{extra} >>"
        ).encode()
        trailer_extra = (
            f" /Encrypt {enc_num} 0 R /ID [ <{id0.hex().upper()}> "
            f"<{id0.hex().upper()}> ]"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objects) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R{trailer_extra} >>\n"
        f"startxref\n{xref_at}\n"
        "%%EOF\n"
    ).encode()
    return bytes(out)


def _png_predict_up(data: bytes, columns: int) -> bytes:
    """PNG Up-filter encode (filter type 2 per row) — generator-side
    twin of the kernel's png_unpredict, implemented independently."""
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r:r + columns]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(columns))
        prev = row
    return bytes(out)


def _serialize_objstm_pdf(
    objects: dict[int, bytes], next_num: int, rng: random.Random
) -> bytes:
    """PDF 1.5 form: every non-stream object (catalog, page tree, font,
    page dicts, indirect /Length integers) is packed into a compressed
    /Type /ObjStm; the cross-reference is a /Type /XRef stream with
    W [1 4 2] entries (type-2 rows point into the ObjStm) encoded with
    the PNG Up predictor — the layout virtually all post-2005 PDF
    generators emit."""
    objstm_num = next_num
    xref_num = next_num + 1
    pack_nums = sorted(n for n, b in objects.items() if b"stream" not in b)
    pack = {n: objects.pop(n) for n in pack_nums}

    bodies = [pack[n] + b"\n" for n in pack_nums]
    offs: list[int] = []
    data = bytearray()
    for b in bodies:
        offs.append(len(data))
        data += b
    header = (" ".join(f"{n} {o}" for n, o in zip(pack_nums, offs)) + "\n").encode()
    first = len(header)
    payload = header + bytes(data)
    if rng.random() < 0.4:  # ObjStm itself predictor-encoded
        cols = 8
        payload += b" " * ((-len(payload)) % cols)  # pad: trailing ws is legal
        comp = zlib.compress(_png_predict_up(payload, cols))
        parms = f" /DecodeParms << /Predictor 12 /Columns {cols} >>"
    else:
        comp = zlib.compress(payload)
        parms = ""
    objects[objstm_num] = (
        f"<< /Type /ObjStm /N {len(pack_nums)} /First {first} "
        f"/Length {len(comp)} /Filter /FlateDecode{parms} >>".encode()
        + b"\nstream\n" + comp + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    offsets[xref_num] = xref_at

    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in pack:
            t, f2, f3 = 2, objstm_num, pack_nums.index(num)
        else:
            t, f2, f3 = 1, offsets[num], 0
        rows.append(t)
        rows += f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    xref_data = zlib.compress(_png_predict_up(bytes(rows), 7))
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root 1 0 R /Length {len(xref_data)} /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 7 >> >>".encode()
        + b"\nstream\n" + xref_data + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def gen_real_pdf(i: int) -> dict:
    """Full deterministic record for real-PDF doc i: input + golden cols,
    schema-compatible with pages_gen (url/warc_ts/html/text/lang)."""
    rng = random.Random(f"rpdf-{i}-42")
    payload, golden_lines = build_pdf(rng)
    host = rng.randrange(1, 200)
    rec = {
        "url": f"https://host{host:04d}.example/realpdf/{i:06d}.pdf",
        "warc_ts": BASE_TS + timedelta(seconds=311 * i),
        "html": payload,
        "lang": LANGS[i % len(LANGS)],
    }
    if golden_lines is None:
        # CID page: undecodable by contract -> whole doc errors loudly
        rec.update(text="", extracted_text="", spans_json="[]",
                   confidence=0.0, content_type="error")
        return rec
    golden = "\n".join(golden_lines)
    rec.update(
        text=golden,
        extracted_text=golden,
        spans_json=json.dumps(_spans_for(golden_lines), separators=(",", ":")),
        confidence=1.0,
        content_type="pdf",
    )
    return rec


def gen_real_pdfs(n: int, start: int = 0) -> list[dict]:
    return [gen_real_pdf(i) for i in range(start, start + n)]
