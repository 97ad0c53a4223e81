"""CSV -> markdown conversion (reference decoder parity).

Mirrors the reference chain (lib/idp_common_pkg/idp_common/ocr/
document_converter.py:113-162, 920-968): parse CSV, format numeric columns
(floats ``f"{x:,.2f}".rstrip("0").rstrip(".")``, ints ``f"{x:,}"``,
dates ``%Y-%m-%d``), render a pipe table. The pandas ``to_markdown`` path
needs tabulate (absent here and optional in the reference too — it falls
back to ``_format_csv_as_table`` on any formatting error, :960-968), so
this kernel formats values the pandas-path way and renders the
fallback-path way: deterministic and dependency-free.
"""

from __future__ import annotations

import csv
import io

from .tables import format_float, format_int, format_pipe_table


def _is_int(s: str) -> bool:
    try:
        int(s.replace(",", ""))
        return True
    except ValueError:
        return False


def _is_float(s: str) -> bool:
    try:
        float(s.replace(",", ""))
        return True
    except ValueError:
        return False


def _format_cell(s: str, col_kind: str) -> str:
    s = s.strip()
    if not s:
        return ""
    if col_kind == "int":
        return format_int(int(s.replace(",", "")))
    if col_kind == "float":
        return format_float(float(s.replace(",", "")))
    return s


def _column_kind(values: list[str]) -> str:
    """Column type sniff: all-int -> int, all-numeric -> float, else str
    (pandas read_csv dtype inference analog)."""
    non_empty = [v.strip() for v in values if v.strip()]
    if not non_empty:
        return "str"
    if all(_is_int(v) for v in non_empty):
        return "int"
    if all(_is_float(v) for v in non_empty):
        return "float"
    return "str"


def csv_to_markdown(content: str) -> str:
    """CSV text -> pipe-markdown table with reference numeric formats."""
    rows = list(csv.reader(io.StringIO(content)))
    rows = [r for r in rows if r]
    if not rows:
        return ""
    header, data = rows[0], rows[1:]
    ncols = len(header)
    kinds = []
    for c in range(ncols):
        kinds.append(_column_kind([r[c] for r in data if c < len(r)]))
    out_rows = [header]
    for r in data:
        out_rows.append(
            [_format_cell(r[c], kinds[c]) if c < len(r) else "" for c in range(ncols)]
        )
    return format_pipe_table(out_rows)


def sheets_to_markdown(sheets: dict[str, str]) -> str:
    """XLSX-style multi-sheet conversion: `## sheet` headers only when more
    than one sheet (document_converter.py:164-221, 969-1107 semantics)."""
    parts = []
    multi = len(sheets) > 1
    for name, csv_content in sheets.items():
        if multi:
            parts.append(f"## {name}")
        md = csv_to_markdown(csv_content)
        if md:
            parts.append(md)
    return "\n\n".join(parts)
