"""Synthetic DOCX/XLSX payload fixtures with independent goldens.

Builds real zip archives (minimal OOXML: word/document.xml,
xl/worksheets/sheetN.xml + sharedStrings + workbook) from known data, and
computes the golden extracted text from that data — the decode path under
test is the zip+XML parse in kernels/office.py. Shares only the frozen
formatting spec (kernels/tables.py) with the kernel, mirroring the
pages-fixture policy.

Doc i is fully determined by random.Random(f"office-{i}-42").
"""

from __future__ import annotations

import io
import random
import zipfile

from ..kernels.tables import format_float, format_int, format_pipe_table
from .pages_gen import WORDS

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _zip_bytes(entries: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in entries.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _docx_payload(paragraphs: list[str], table_rows: list[list[str]] | None) -> bytes:
    body = []
    for p in paragraphs:
        body.append(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>")
    if table_rows:
        trs = []
        for row in table_rows:
            tcs = "".join(
                f"<w:tc><w:p><w:r><w:t>{c}</w:t></w:r></w:p></w:tc>" for c in row
            )
            trs.append(f"<w:tr>{tcs}</w:tr>")
        body.append("<w:tbl>" + "".join(trs) + "</w:tbl>")
    xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body>{"".join(body)}</w:body></w:document>'
    )
    return _zip_bytes(
        {
            "word/document.xml": xml,
            "[Content_Types].xml": "<Types/>",
        }
    )


def _xlsx_payload(sheets: dict[str, list[list[str]]]) -> bytes:
    entries: dict[str, str] = {}
    # use inline strings for text, raw <v> for numerics
    names_xml = "".join(
        f'<sheet name="{name}" sheetId="{i + 1}"/>'
        for i, name in enumerate(sheets)
    )
    entries["xl/workbook.xml"] = (
        f'<?xml version="1.0"?><workbook xmlns="{S}"><sheets>{names_xml}</sheets></workbook>'
    )
    for i, (name, rows) in enumerate(sheets.items(), start=1):
        row_xml = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                try:
                    float(val)
                    cells.append(f"<c><v>{val}</v></c>")
                except ValueError:
                    cells.append(f'<c t="inlineStr"><is><t>{val}</t></is></c>')
            row_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
        entries[f"xl/worksheets/sheet{i}.xml"] = (
            f'<?xml version="1.0"?><worksheet xmlns="{S}">'
            f'<sheetData>{"".join(row_xml)}</sheetData></worksheet>'
        )
    entries["[Content_Types].xml"] = "<Types/>"
    return _zip_bytes(entries)


def gen_office_doc(i: int) -> dict:
    """One office doc: payload bytes + golden extracted text."""
    rng = random.Random(f"office-{i}-42")
    if i % 2 == 0:  # docx
        paragraphs = [_words(rng, 8 + rng.randrange(12)) for _ in range(2 + rng.randrange(3))]
        table = None
        golden_parts = list(paragraphs)
        if rng.random() < 0.7:
            table = [["Name", "Count"]] + [
                [_words(rng, 2), str(rng.randrange(1, 999))]
                for _ in range(2 + rng.randrange(3))
            ]
            golden_parts.append(format_pipe_table(table))
        return {
            "doc_id": i,
            "kind": "docx",
            "payload": _docx_payload(paragraphs, table),
            "extracted_text": "\n".join(golden_parts),
        }
    # xlsx
    n_sheets = 1 + rng.randrange(2)
    sheets: dict[str, list[list[str]]] = {}
    golden_parts: list[str] = []
    multi = n_sheets > 1
    for s in range(n_sheets):
        name = f"Data{s + 1}"
        rows = [["Item", "Qty", "Price"]]
        data = []
        for _ in range(2 + rng.randrange(4)):
            data.append(
                [
                    _words(rng, 2),
                    str(rng.randrange(1, 5000)),
                    f"{rng.uniform(1, 900):.2f}",
                ]
            )
        rows += data
        sheets[name] = rows
        if multi:
            golden_parts.append(f"## {name}")
        formatted = [rows[0]] + [
            [r[0], format_int(int(r[1])), format_float(float(r[2]))] for r in data
        ]
        golden_parts.append(format_pipe_table(formatted))
    return {
        "doc_id": i,
        "kind": "xlsx",
        "payload": _xlsx_payload(sheets),
        "extracted_text": "\n\n".join(golden_parts),
    }


def gen_office_docs(n: int) -> list[dict]:
    return [gen_office_doc(i) for i in range(n)]
