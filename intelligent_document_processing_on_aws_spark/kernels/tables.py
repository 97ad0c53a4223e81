"""Markdown table formatting with reference-parity semantics.

Mirrors the reference's deterministic CSV→markdown fallback formatter
(lib/idp_common_pkg/idp_common/ocr/document_converter.py:1109-1147):
`| a | b |` rows with a separator line of `max(3, col_width)` dashes after
the header, joined with "\n"; and its numeric cell formats
(document_converter.py:937-957): floats `f"{x:,.2f}".rstrip("0").rstrip(".")`,
ints `f"{x:,}"`.
"""

from __future__ import annotations


def format_float(x: float) -> str:
    """Reference float format: 2dp thousands-grouped, trailing zeros stripped."""
    return f"{x:,.2f}".rstrip("0").rstrip(".")


def format_int(x: int) -> str:
    """Reference int format: thousands-grouped."""
    return f"{x:,}"


def format_pipe_table(rows: list[list[str]]) -> str:
    """Render rows (first row = header) as a pipe-markdown table.

    Parity with the reference's ``_format_csv_as_table``
    (document_converter.py:1109-1147): cells are NOT padded; the separator
    row after the header uses ``max(3, column_width)`` dashes where
    column_width is the max cell length in that column.
    """
    if not rows:
        return ""
    ncols = len(rows[0])
    col_widths = []
    for col_idx in range(ncols):
        max_width = 0
        for row in rows:
            if col_idx < len(row):
                max_width = max(max_width, len(str(row[col_idx])))
        col_widths.append(max_width)

    out: list[str] = []
    for row_idx, row in enumerate(rows):
        cells = [str(cell) for col_idx, cell in enumerate(row) if col_idx < ncols]
        out.append("| " + " | ".join(cells) + " |")
        if row_idx == 0 and len(rows) > 1:
            seps = ["-" * max(3, w) for w in col_widths]
            out.append("| " + " | ".join(seps) + " |")
    return "\n".join(out)


def escape_pipes(text: str) -> str:
    """Escape `|` for markdown cells (reference ocr/service.py:1542-1544)."""
    return text.replace("|", "\\|")
