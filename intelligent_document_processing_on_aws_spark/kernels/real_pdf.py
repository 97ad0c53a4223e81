"""From-scratch text extraction for genuine ``%PDF`` byte streams.

Fills the role of the reference's PDF OCR ingestion
(lib/idp_common_pkg/idp_common/ocr/service.py:1144-1252, which renders
pages and extracts text via PyMuPDF + Textract) with a pure-Python,
stdlib-only mini PDF parser: object scan -> page-tree walk -> content
stream decode (FlateDecode via zlib) -> text-operator interpretation
(BT/ET, Td/TD/Tm/T*/TL, Tj/TJ/'/") -> positioned spans -> the same
reading-order line clustering the span-based branch uses
(kernels/pdf_layout.reading_order_lines), preserving the byte-identity
join contract: spans on a line joined with " ", lines with "\n", pages
with "\n".

Deliberate scope (documented, tested):
- text-extraction only: no rendering, fonts, images, or encryption;
- glyph-width-exact x advances are not computed (no font metrics): each
  show operator emits one span at the current text-line origin, so
  reading order relies on explicit positioning operators — true for the
  overwhelming majority of generated PDFs, which position every run;
- ``TJ`` array elements are concatenated directly (kerning numbers are
  sub-word adjustments, not word gaps);
- embedded text carries no OCR uncertainty: confidence = 1.0.
"""

from __future__ import annotations

import re
import zlib

from .boilerplate import ExtractionResult, Span
from .pdf_layout import LINE_JOIN, assemble_blocks, reading_order_lines

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def scan_objects(data: bytes) -> dict[int, bytes]:
    """Map object number -> raw body (bytes between ``obj`` and ``endobj``).

    Offset-table-free on purpose: real-world PDFs frequently carry stale
    or incremental xref tables, so a linear scan (what PDF readers call
    "repair mode") is the robust path; we never trust xref offsets.
    """
    objects: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        end = data.find(b"endobj", m.end())
        if end == -1:
            end = len(data)
        objects[int(m.group(1))] = data[m.end():end]
    return objects


def _dict_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _dict_refs_array(body: bytes, key: bytes) -> list[int] | None:
    m = re.search(rb"/" + key + rb"\s*\[([^\]]*)\]", body)
    if not m:
        return None
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def page_object_numbers(objects: dict[int, bytes]) -> list[int]:
    """Walk Catalog -> Pages -> Kids (recursively: Kids may hold nested
    Pages nodes) and return page object numbers in document order."""
    root = None
    for num, body in objects.items():
        if re.search(rb"/Type\s*/Catalog\b", body):
            root = _dict_ref(body, b"Pages")
            break
    pages: list[int] = []

    def walk(num: int | None, depth: int = 0) -> None:
        if num is None or num not in objects or depth > 32:
            return
        body = objects[num]
        kids = _dict_refs_array(body, b"Kids")
        if kids is not None and re.search(rb"/Type\s*/Pages\b", body):
            for k in kids:
                walk(k, depth + 1)
        elif re.search(rb"/Type\s*/Page\b", body):
            pages.append(num)

    walk(root)
    if not pages:  # degraded document: fall back to any /Type /Page objects
        pages = sorted(
            n for n, b in objects.items()
            if re.search(rb"/Type\s*/Page(?!s)\b", b)
        )
    return pages


def _resolve_length(objects: dict[int, bytes], body: bytes) -> int | None:
    m = re.search(rb"/Length\s+(\d+)\s+\d+\s+R", body)
    if m:  # indirect ref: the target object body is a bare integer
        ref_body = objects.get(int(m.group(1)))
        m2 = re.match(rb"\s*(\d+)\s*$", ref_body or b"")
        return int(m2.group(1)) if m2 else None
    m = re.search(rb"/Length\s+(\d+)", body)
    return int(m.group(1)) if m else None


def content_stream(objects: dict[int, bytes], num: int) -> bytes:
    """Decode one content-stream object (FlateDecode or raw).

    /Length is used when it resolves AND lands on ``endstream`` (binary
    data may legally end in EOL bytes, which an endstream-keyword
    heuristic would mis-strip); a stale/unresolvable /Length falls back
    to locating ``endstream`` and stripping the delimiter EOL.
    """
    body = objects.get(num, b"")
    m = re.search(rb"stream\r?\n", body)
    if not m:
        return b""
    start = m.end()
    length = _resolve_length(objects, body[:start])
    raw = None
    if length is not None and re.match(rb"\s*endstream", body[start + length:]):
        raw = body[start:start + length]
    if raw is None:
        end = body.rfind(b"endstream")
        if end == -1:
            end = len(body)
        raw = body[start:end]
        # spec: EOL before `endstream` is a delimiter, not stream data
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
    if re.search(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b", body[:start]):
        raw = zlib.decompress(raw)
    return raw


def page_content(objects: dict[int, bytes], page_num: int) -> bytes:
    """Concatenate a page's /Contents stream(s) — the spec treats an array
    of streams as one logical stream with whitespace between parts."""
    body = objects.get(page_num, b"")
    refs = _dict_refs_array(body, b"Contents")
    if refs is None:
        one = _dict_ref(body, b"Contents")
        refs = [one] if one is not None else []
    return b"\n".join(content_stream(objects, r) for r in refs)


# -- content-stream tokenizer -------------------------------------------------

class _Name(str):
    """PDF name token — a distinct type so ``/F1`` on the operand stack can
    never be mistaken for showable text by Tj/TJ."""


_ARRAY_OPEN = object()  # unique sentinel: a literal string "[" is showable

_ESCAPES = {
    b"n"[0]: "\n", b"r"[0]: "\r", b"t"[0]: "\t", b"b"[0]: "\b",
    b"f"[0]: "\f", b"("[0]: "(", b")"[0]: ")", b"\\"[0]: "\\",
}


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string starting at the ``(``; handles
    nested balanced parens, backslash escapes, octal escapes, and
    line-continuation backslashes. Returns (text, index after ``)``)."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < n and j - i < 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    end = data.find(b">", i)
    if end == -1:
        end = len(data)
    hexdigits = re.sub(rb"\s", b"", data[i + 1:end])
    if len(hexdigits) % 2:
        hexdigits += b"0"  # spec: odd final digit implies trailing 0
    return bytes.fromhex(hexdigits.decode("ascii")).decode("latin-1"), end + 1


def text_spans(content: bytes, page: int) -> list[dict]:
    """Interpret text-positioning/showing operators into positioned spans.

    Emits ``{"page", "x", "y", "text"}`` with y negated (PDF y grows
    upward; reading_order_lines sorts ascending y = top-down).
    """
    spans: list[dict] = []
    stack: list = []  # operand stack (numbers + pending strings/arrays)
    tx = ty = 0.0  # text-line origin
    tl = 0.0  # leading
    in_text = False
    i, n = 0, len(content)

    def show(text: str) -> None:
        if text:
            spans.append({"page": page, "x": tx, "y": -ty, "text": text})

    while i < n:
        c = content[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == 0x25:  # % comment to EOL (never inside a string literal)
            j = content.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # (
            s, i = _parse_literal_string(content, i)
            stack.append(s)
        elif c == 0x3C:  # < — hex string or << dict
            if i + 1 < n and content[i + 1] == 0x3C:
                j = content.find(b">>", i + 2)
                i = n if j == -1 else j + 2  # inline dict: skip
            else:
                s, i = _parse_hex_string(content, i)
                stack.append(s)
        elif c == 0x5B:  # [
            stack.append(_ARRAY_OPEN)
            i += 1
        elif c == 0x5D:  # ] — close array: gather back to the marker
            arr: list = []
            while stack and stack[-1] is not _ARRAY_OPEN:
                arr.append(stack.pop())
            if stack:
                stack.pop()
            arr.reverse()
            stack.append(arr)
            i += 1
        elif c == 0x2F:  # /Name
            m = re.match(rb"/[^\s/\[\]()<>{}%]*", content[i:])
            stack.append(_Name(m.group(0).decode("latin-1")))
            i += m.end()
        else:
            m = _NUM_RE.match(content, i)
            if m:
                stack.append(float(m.group(0)))
                i = m.end()
                continue
            m = _NAME_OP_RE.match(content, i)
            if not m:
                i += 1
                continue
            op = m.group(0)
            i = m.end()
            if op == b"BT":
                in_text = True
                tx = ty = 0.0
                tl = 0.0
            elif op == b"ET":
                in_text = False
            elif not in_text:
                stack.clear()
            elif op == b"Td" and len(stack) >= 2:
                dy = stack.pop()
                dx = stack.pop()
                if isinstance(dx, float) and isinstance(dy, float):
                    tx += dx
                    ty += dy
            elif op == b"TD" and len(stack) >= 2:
                dy = stack.pop()
                dx = stack.pop()
                if isinstance(dx, float) and isinstance(dy, float):
                    tl = -dy
                    tx += dx
                    ty += dy
            elif op == b"Tm" and len(stack) >= 6:
                f_ = stack.pop()
                e_ = stack.pop()
                del stack[-4:]
                if isinstance(e_, float) and isinstance(f_, float):
                    tx, ty = e_, f_
            elif op == b"TL" and stack:
                v = stack.pop()
                if isinstance(v, float):
                    tl = v
            elif op == b"T*":
                ty -= tl
            elif op == b"Tj" and stack:
                v = stack.pop()
                if isinstance(v, str) and not isinstance(v, _Name):
                    show(v)
            elif op == b"TJ" and stack:
                v = stack.pop()
                if isinstance(v, list):
                    show("".join(e for e in v if isinstance(e, str) and not isinstance(e, _Name)))
            elif op == b"'" and stack:
                v = stack.pop()
                ty -= tl
                if isinstance(v, str) and not isinstance(v, _Name):
                    show(v)
            elif op == b'"' and len(stack) >= 3:
                v = stack.pop()
                del stack[-2:]  # word + char spacing: no span-level effect
                ty -= tl
                if isinstance(v, str) and not isinstance(v, _Name):
                    show(v)
            else:
                stack.clear()  # any other operator consumes its operands
    return spans


def extract_real_pdf(content: bytes) -> ExtractionResult:
    """Full-document text extraction for a genuine %PDF byte stream."""
    objects = scan_objects(content)
    spans: list[dict] = []
    for idx, pnum in enumerate(page_object_numbers(objects), start=1):
        spans.extend(text_spans(page_content(objects, pnum), idx))
    if not spans:
        return ExtractionResult("", [], 0.0, 0)
    lines = reading_order_lines(spans)
    # layout analysis: x-aligned multi-column runs become pipe tables
    # (pdf_layout.lines_to_blocks), other lines join word-wise
    extracted, line_texts = assemble_blocks(lines)
    out_spans: list[Span] = []
    off = 0
    for i, t in enumerate(line_texts):
        out_spans.append(Span(start=off, end=off + len(t), block_id=i))
        off += len(t) + len(LINE_JOIN)
    return ExtractionResult(extracted, out_spans, 1.0, len(lines))
