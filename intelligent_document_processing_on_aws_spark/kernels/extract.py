"""Per-page extraction dispatcher: content-type detect -> branch kernel.

The single pure entry point the Spark extraction stage calls per page
(inside mapInPandas Arrow batches). Mirrors the reference's OCR service
dispatch (lib/idp_common_pkg/idp_common/ocr/service.py:316-491): detect
file type, route to the decoder branch, produce per-page text artifacts.
"""

from __future__ import annotations

from . import filetype
from .boilerplate import ExtractionResult, Span, extract_html
from .pagination import text_to_pages
from .pdf_layout import extract_pdf


def extract_page_safe(
    content: bytes, name_hint: str | None = None
) -> tuple[str, ExtractionResult, str | None]:
    """Error-contained variant: returns (content_type, result, error).

    A malformed payload must never kill a batch/job — mirrors the
    reference's per-document ``errors: List[str]`` accumulation
    (lib/idp_common_pkg/idp_common/models.py:142-210). On failure the row
    degrades to an empty extraction with the error message recorded.
    """
    try:
        ctype, res = extract_page(content, name_hint)
        return ctype, res, None
    except Exception as e:  # noqa: BLE001 — containment boundary
        return "error", ExtractionResult("", [], 0.0, 0), f"{type(e).__name__}: {e}"


def extract_page(
    content: bytes, name_hint: str | None = None
) -> tuple[str, ExtractionResult]:
    """Returns (content_type, ExtractionResult). ``name_hint`` (url or
    filename) carries the extension signal the reference routes on."""
    ctype, text = filetype.detect_content_type_and_text(content, name_hint)
    if ctype == filetype.PDF:
        if content.startswith(b"%SPDF"):
            return ctype, extract_pdf(content)
        from .real_pdf import extract_real_pdf

        return ctype, extract_real_pdf(content)
    if ctype in (filetype.HTML,):
        return ctype, extract_html(text)  # already decoded by the detector
    if ctype == filetype.OCR_JSON:
        # Textract response JSON -> markdown, with the reference's fallback
        # ladder (ocr/service.py:1580-1625): markdown conversion first,
        # plain LINE text if that fails
        import json as _json

        from .textract_blocks import blocks_plain_text, blocks_to_markdown

        payload = _json.loads(text)
        blocks = payload.get("Blocks", []) if isinstance(payload, dict) else payload
        try:
            md = blocks_to_markdown(blocks)
        except Exception:  # noqa: BLE001 — reference falls back, never dies
            md = blocks_plain_text(blocks)
        n_pages = sum(
            1 for b in blocks
            if isinstance(b, dict) and b.get("BlockType") == "PAGE"
        ) or (1 if md else 0)
        spans = [Span(0, len(md), 0)] if md else []
        return ctype, ExtractionResult(md, spans, 1.0 if md else 0.0, n_pages)
    if ctype == filetype.CSV:
        from .csv_convert import csv_to_markdown

        md = csv_to_markdown(text)
        spans = [Span(0, len(md), 0)] if md else []
        return ctype, ExtractionResult(md, spans, 1.0 if md else 0.0, 1 if md else 0)
    if ctype == filetype.DOCX:
        from .office import extract_docx

        return ctype, extract_docx(content)
    if ctype == filetype.XLS:
        # legacy-office CFB: route by directory stream names — Workbook/
        # Book -> BIFF8 spreadsheet, WordDocument -> Word 97 binary text
        # (beyond the reference: GenAIIDP maps .doc to python-docx, which
        # cannot read the binary format). Anything else errors cleanly.
        from .xls_biff import cfb_stream_names, extract_xls

        stream_names = set(cfb_stream_names(content))
        if stream_names & {"Workbook", "Book"}:
            return ctype, extract_xls(content)
        if "WordDocument" in stream_names:
            from .doc_word import extract_doc

            return "doc", extract_doc(content)
        return ctype, extract_xls(content)  # raises the no-stream XlsError
    if ctype == filetype.XLSX:
        from .office import extract_xlsx

        return ctype, extract_xlsx(content)
    if ctype == filetype.RTF:
        # beyond reference: GenAIIDP's converter matrix has no RTF branch
        from .rtf import rtf_to_text

        md = rtf_to_text(content)
        spans = [Span(0, len(md), 0)] if md else []
        return ctype, ExtractionResult(md, spans, 1.0 if md else 0.0, 1 if md else 0)
    if ctype == filetype.TEXT:
        # plain text: everything is main content, paginated per the
        # reference's text converter math then re-joined page-wise.
        # (text already decoded by the detector — no second decode)
        pages = text_to_pages(text)
        joined = "\n".join(pages)
        spans = []
        off = 0
        for i, p in enumerate(pages):
            spans.append(Span(off, off + len(p), i))
            off += len(p) + 1
        return ctype, ExtractionResult(joined, spans, 1.0 if joined else 0.0, len(pages))
    return ctype, ExtractionResult("", [], 0.0, 0)
