"""Markdown pagination with table-header carryover (reference parity).

Mirrors ``_convert_markdown_to_pages`` minus image rendering
(lib/idp_common_pkg/idp_common/ocr/document_converter.py:1149-1272):
pages are fixed-size chunks of ``lines_per_page = (page_height - 2*margin)
// 18`` original markdown lines; when a page break lands mid-table the
table's header + separator rows are re-inserted at the top of the page
(``_analyze_table_structure`` :1316-1366, ``_ensure_table_headers``
:1368-1397 — byte-level parity including the `start < idx <= end`
boundary semantics).
"""

from __future__ import annotations

from .pagination import LINE_HEIGHT, MARGIN, PAGE_HEIGHT

MD_LINE_HEIGHT = 18  # markdown renderer uses 18px lines (:1181)


def analyze_table_structure(lines: list[str]) -> dict:
    table_info = {"headers": [], "table_ranges": []}
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if (
            line.startswith("|")
            and "|" in line[1:]
            and i + 1 < len(lines)
            and "---" in lines[i + 1]
            and "|" in lines[i + 1]
        ):
            header_line = lines[i]
            separator_line = lines[i + 1]
            table_start = i
            table_end = i + 1
            j = i + 2
            while j < len(lines):
                next_line = lines[j].strip()
                if next_line.startswith("|") and "|" in next_line[1:]:
                    table_end = j
                    j += 1
                else:
                    break
            table_info["headers"].append((i, header_line, separator_line))
            table_info["table_ranges"].append((table_start, table_end))
            i = table_end + 1
        else:
            i += 1
    return table_info


def ensure_table_headers(page_lines: list[str], table_info: dict,
                         start_line_idx: int) -> list[str]:
    if not page_lines or not table_info["table_ranges"]:
        return page_lines
    for table_start, table_end in table_info["table_ranges"]:
        if table_start < start_line_idx <= table_end:
            for header_idx, header_line, separator_line in table_info["headers"]:
                if table_start <= header_idx <= table_end:
                    return [header_line, separator_line] + page_lines
    return page_lines


def markdown_to_pages(markdown_content: str) -> list[str]:
    """Returns per-page markdown text (no images)."""
    text_height = PAGE_HEIGHT - 2 * MARGIN
    lines_per_page = text_height // MD_LINE_HEIGHT
    original_lines = markdown_content.split("\n")
    table_info = analyze_table_structure(original_lines)
    pages: list[str] = []
    idx = 0
    while idx < len(original_lines):
        chunk = original_lines[idx : idx + lines_per_page]
        page_lines = ensure_table_headers(chunk, table_info, idx)
        pages.append("\n".join(page_lines))
        idx += len(chunk)
    return pages if pages else [markdown_content]
