"""Content-type detection by magic bytes + decode fallback.

Parity with the reference's `_detect_file_type`
(lib/idp_common_pkg/idp_common/ocr/service.py:1632-1678): magic-byte check
(%PDF, PK+xl/ for xlsx, PK+word/ for docx), then UTF-8 decode fallback to
classify text/html. Extended with the synthetic %SPDF marker used by the
span-based PDF fixtures, plus CSV routing: the reference keys CSV on the
file extension (ocr/service.py:1632-1678 keys on `.csv`), so an optional
``name_hint`` (url/filename) carries that signal here; a conservative
content sniff (>= 2 rows x >= 2 columns with consistent field counts)
covers hint-less payloads.
"""

from __future__ import annotations

import csv as _csv
import io as _io

PDF = "pdf"
HTML = "html"
TEXT = "text"
CSV = "csv"
XLSX = "xlsx"
DOCX = "docx"
IMAGE = "image"
UNKNOWN = "unknown"

_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff", ".tif", ".webp")


def looks_like_csv(text: str) -> bool:
    """Conservative CSV sniff: the first (<=8) non-empty sample lines parse
    to >= 2 rows of the same >= 2 field count."""
    lines = [ln for ln in text[:4096].splitlines() if ln.strip()][:8]
    if len(lines) < 2:
        return False
    try:
        rows = [r for r in _csv.reader(_io.StringIO("\n".join(lines))) if r]
    except _csv.Error:
        return False
    if len(rows) < 2:
        return False
    width = len(rows[0])
    return width >= 2 and all(len(r) == width for r in rows)


def detect_content_type(content: bytes, name_hint: str | None = None) -> str:
    if content.startswith(b"%SPDF") or content.startswith(b"%PDF"):
        return PDF
    if content.startswith(b"PK"):
        head = content[:4096]
        if b"xl/" in head:
            return XLSX
        if b"word/" in head:
            return DOCX
        return UNKNOWN
    # image magic bytes (the reference routes jpg/jpeg/png/gif/bmp/tiff/webp
    # by extension, ocr/service.py:1657-1658; magic is the stronger signal)
    if (content.startswith(b"\x89PNG\r\n\x1a\n") or content.startswith(b"\xff\xd8")
            or content[:6] in (b"GIF87a", b"GIF89a") or content.startswith(b"BM")
            or content[:4] in (b"II*\x00", b"MM\x00*")
            or (content[:4] == b"RIFF" and content[8:12] == b"WEBP")):
        return IMAGE
    try:
        text = content.decode("utf-8")
    except UnicodeDecodeError:
        return UNKNOWN
    lowered = text[:2048].lower()
    if "<html" in lowered or "<!doctype html" in lowered or "<body" in lowered:
        return HTML
    hint = (name_hint or "").split("?")[0].lower()
    if hint.endswith(".csv"):
        return CSV
    if hint.endswith(".txt"):
        return TEXT
    if hint.endswith(_IMAGE_EXTS):
        return IMAGE  # extension says image but bytes decoded as utf-8
    if looks_like_csv(text):
        return CSV
    return TEXT
