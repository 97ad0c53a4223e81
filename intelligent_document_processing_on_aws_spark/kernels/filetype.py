"""Content-type detection by magic bytes + decode fallback.

Parity with the reference's `_detect_file_type`
(lib/idp_common_pkg/idp_common/ocr/service.py:1632-1678): magic-byte check
(%PDF, PK+xl/ for xlsx, PK+word/ for docx), then UTF-8 decode fallback to
classify text/html. Extended with the synthetic %SPDF marker used by the
span-based PDF fixtures.
"""

from __future__ import annotations

PDF = "pdf"
HTML = "html"
TEXT = "text"
XLSX = "xlsx"
DOCX = "docx"
UNKNOWN = "unknown"


def detect_content_type(content: bytes) -> str:
    if content.startswith(b"%SPDF") or content.startswith(b"%PDF"):
        return PDF
    if content.startswith(b"PK"):
        head = content[:4096]
        if b"xl/" in head:
            return XLSX
        if b"word/" in head:
            return DOCX
        return UNKNOWN
    try:
        text = content.decode("utf-8")
    except UnicodeDecodeError:
        return UNKNOWN
    lowered = text[:2048].lower()
    if "<html" in lowered or "<!doctype html" in lowered or "<body" in lowered:
        return HTML
    return TEXT
