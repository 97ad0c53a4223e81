"""Plain-text pagination with reference-parity wrap math.

Mirrors ``convert_text_to_pages``
(lib/idp_common_pkg/idp_common/ocr/document_converter.py:38-111) minus the
image rendering: wrap long lines at ``chars_per_line = text_width // 7``
(avg monospace char width 7 px), paginate at
``lines_per_page = text_height // 16`` (line height 16 px), where
``text_width/height = page dims - 2 * margin`` and the default page is
8.5x11 in at DPI 150 with a 0.5 in margin (document_converter.py:34-36).
Blank lines are preserved as "" (reference keeps them, :63-66).
"""

from __future__ import annotations

DPI = 150
PAGE_WIDTH = int(8.5 * DPI)   # 1275
PAGE_HEIGHT = int(11 * DPI)   # 1650
MARGIN = int(0.5 * DPI)       # 75
AVG_CHAR_WIDTH = 7
LINE_HEIGHT = 16


def wrap_lines(content: str, chars_per_line: int | None = None) -> list[str]:
    if chars_per_line is None:
        chars_per_line = (PAGE_WIDTH - 2 * MARGIN) // AVG_CHAR_WIDTH
    lines: list[str] = []
    for line in content.split("\n"):
        if not line.strip():
            lines.append("")
            continue
        if len(line) <= chars_per_line:
            lines.append(line)
        else:
            while len(line) > chars_per_line:
                lines.append(line[:chars_per_line])
                line = line[chars_per_line:]
            if line:
                lines.append(line)
    return lines


def text_to_pages(content: str) -> list[str]:
    """Wrap + paginate; returns page texts (page = lines joined with \\n)."""
    lines = wrap_lines(content)
    lines_per_page = (PAGE_HEIGHT - 2 * MARGIN) // LINE_HEIGHT
    pages = [
        "\n".join(lines[i : i + lines_per_page])
        for i in range(0, len(lines), lines_per_page)
    ]
    return pages if pages else [""]
