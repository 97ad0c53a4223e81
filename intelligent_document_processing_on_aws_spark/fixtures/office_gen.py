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
            # pinned date_time: writestr(str, ...) would embed wall-clock
            # mtime in the local header, breaking fixture byte-stability
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, content)
    return buf.getvalue()


def _run_xml(text: str, fmt: dict) -> str:
    """One w:r, optionally with bold/italic/underline rPr toggles; text
    uses xml:space='preserve' so run-boundary spaces survive the parse."""
    props = ""
    if fmt.get("b"):
        props += "<w:b/>"
    if fmt.get("i"):
        props += "<w:i/>"
    if fmt.get("u"):
        props += '<w:u w:val="single"/>'
    rpr = f"<w:rPr>{props}</w:rPr>" if props else ""
    return f'<w:r>{rpr}<w:t xml:space="preserve">{text}</w:t></w:r>'


def _docx_payload(paragraphs: list, table_rows: list[list[str]] | None) -> bytes:
    """Paragraphs are strings, (heading_level, text) tuples — headings
    carry the OOXML pStyle Heading{N} marker the decoder maps to markdown
    — or dicts {"runs": [(text, fmt)], "align": str|None} with run-level
    bold/italic/underline formatting."""
    body = []
    for p in paragraphs:
        if isinstance(p, tuple):
            level, text = p
            body.append(
                f'<w:p><w:pPr><w:pStyle w:val="Heading{level}"/></w:pPr>'
                f"<w:r><w:t>{text}</w:t></w:r></w:p>"
            )
        elif isinstance(p, dict):
            ppr = ""
            if p.get("align"):
                ppr = f'<w:pPr><w:jc w:val="{p["align"]}"/></w:pPr>'
            runs = "".join(_run_xml(t, f) for t, f in p["runs"])
            body.append(f"<w:p>{ppr}{runs}</w:p>")
        else:
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


R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PKG_R = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_letter(c: int) -> str:
    s = ""
    c += 1
    while c:
        c, r = divmod(c - 1, 26)
        s = chr(65 + r) + s
    return s


EXCEL_EPOCH_ORDINAL = 693594  # datetime(1899,12,30).toordinal()


def _styles_xml(custom_fmt: bool) -> str:
    """styles.xml with style index 1 = a date number format: either the
    builtin numFmtId 14 or a custom yyyy-mm-dd code (both must be detected
    by the decoder's date-style sniff)."""
    num_fmts = (
        '<numFmts count="1">'
        '<numFmt numFmtId="164" formatCode="yyyy-mm-dd"/></numFmts>'
        if custom_fmt else ""
    )
    date_id = 164 if custom_fmt else 14
    return (
        f'<?xml version="1.0"?><styleSheet xmlns="{S}">{num_fmts}'
        '<cellXfs count="2">'
        '<xf numFmtId="0"/>'
        f'<xf numFmtId="{date_id}" applyNumberFormat="1"/>'
        "</cellXfs></styleSheet>"
    )


def _xlsx_payload(
    sheets: dict[str, list[list]],
    rng: random.Random,
    sparse: bool = True,
    custom_date_fmt: bool = False,
) -> bytes:
    """Real-world-shaped OOXML: cells carry ``r="A1"`` refs, EMPTY CELLS ARE
    OMITTED (the standard sparse encoding), sheet parts map through
    xl/_rels/workbook.xml.rels r:id (part file numbering is deliberately
    decoupled from workbook order so positional/lexicographic mapping is
    caught), inline strings for text and raw <v> for numerics."""
    entries: dict[str, str] = {}
    # part file indices: shifted so file order != workbook order for
    # multi-sheet books (and lexicographic order breaks at 10+ sheets)
    n = len(sheets)
    shift = rng.randrange(n) if n > 1 else 0
    file_idx = [(k + shift) % n + 1 for k in range(n)]
    names_xml = "".join(
        f'<sheet name="{name}" sheetId="{k + 1}" r:id="rId{k + 1}"/>'
        for k, name in enumerate(sheets)
    )
    entries["xl/workbook.xml"] = (
        f'<?xml version="1.0"?><workbook xmlns="{S}" xmlns:r="{R}">'
        f"<sheets>{names_xml}</sheets></workbook>"
    )
    rels_xml = "".join(
        f'<Relationship Id="rId{k + 1}" Type="{R}/worksheet" '
        f'Target="worksheets/sheet{file_idx[k]}.xml"/>'
        for k in range(n)
    )
    entries["xl/_rels/workbook.xml.rels"] = (
        f'<?xml version="1.0"?><Relationships xmlns="{PKG_R}">{rels_xml}'
        "</Relationships>"
    )
    has_dates = False
    for k, rows in enumerate(sheets.values()):
        row_xml = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                if sparse and val == "":
                    continue  # omitted cell: the r= ref on neighbors carries position
                ref = f"{_col_letter(ci)}{ri}"
                if isinstance(val, dict):  # date cell: numeric serial + style
                    has_dates = True
                    cells.append(f'<c r="{ref}" s="1"><v>{val["serial"]}</v></c>')
                    continue
                try:
                    float(val)
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                except ValueError:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>'
                    )
            row_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
        entries[f"xl/worksheets/sheet{file_idx[k]}.xml"] = (
            f'<?xml version="1.0"?><worksheet xmlns="{S}">'
            f'<sheetData>{"".join(row_xml)}</sheetData></worksheet>'
        )
    if has_dates:
        entries["xl/styles.xml"] = _styles_xml(custom_date_fmt)
    entries["[Content_Types].xml"] = "<Types/>"
    return _zip_bytes(entries)


def gen_office_doc(i: int) -> dict:
    """One office doc: payload bytes + golden extracted text."""
    rng = random.Random(f"office-{i}-42")
    if i % 2 == 0:  # docx
        paragraphs: list = []
        golden_parts: list[str] = []
        if rng.random() < 0.5:  # leading heading paragraph
            level = 1 + rng.randrange(3)
            head = _words(rng, 3)
            paragraphs.append((level, head))
            golden_parts.append(f"{'#' * level} {head}")
        for _ in range(2 + rng.randrange(3)):
            if rng.random() < 0.4:
                # formatted-run paragraph: mixed plain/bold/italic/underline
                # runs (+ sometimes alignment); golden renders the markdown
                # emphasis by construction, mirroring render_run_markdown's
                # documented contract (**/*/<u> around the stripped core)
                runs: list = []
                golden_runs: list[str] = []
                for rj in range(2 + rng.randrange(3)):
                    t = _words(rng, 2 + rng.randrange(3))
                    if rj:
                        t = " " + t
                    fd = rng.random()
                    fmt = {}
                    if fd < 0.30:
                        fmt = {"b": True}
                    elif fd < 0.50:
                        fmt = {"i": True}
                    elif fd < 0.62:
                        fmt = {"u": True}
                    elif fd < 0.72:
                        fmt = {"b": True, "i": True}
                    runs.append((t, fmt))
                    core = t.strip()
                    if fmt.get("u"):
                        core = f"<u>{core}</u>"
                    if fmt.get("i"):
                        core = f"*{core}*"
                    if fmt.get("b"):
                        core = f"**{core}**"
                    golden_runs.append((" " if rj else "") + core)
                align = rng.choice((None, None, "center", "right", "both"))
                paragraphs.append({"runs": runs, "align": align})
                golden_parts.append("".join(golden_runs).strip())
            else:
                p = _words(rng, 8 + rng.randrange(12))
                paragraphs.append(p)
                golden_parts.append(p)
        table = None
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
    # xlsx; every ~8th xlsx doc is an 11-sheet workbook (sheet10/sheet11
    # part names break lexicographic mapping — rels must be used)
    n_sheets = 11 if i % 16 == 1 else 1 + rng.randrange(2)
    sheets: dict[str, list[list[str]]] = {}
    golden_parts: list[str] = []
    multi = n_sheets > 1
    custom_date_fmt = rng.random() < 0.5  # builtin numFmtId 14 vs custom code
    for s in range(n_sheets):
        name = f"Data{s + 1}"
        rows: list[list] = [["Item", "Qty", "Price", "Date", "Billed"]]
        data = []
        golden_rows = []
        for _ in range(2 + rng.randrange(4)):
            qty = str(rng.randrange(1, 5000))
            price = f"{rng.uniform(1, 900):.2f}"
            # sparse-row hardening: some cells are empty -> OMITTED from the
            # XML; the golden keeps "" at the true column position
            if rng.random() < 0.15:
                qty = ""
            if rng.random() < 0.15:
                price = ""
            # Date: stored as a styled numeric serial; golden is %Y-%m-%d
            # (reference formats datetime64 columns that way,
            # document_converter.py:795-802)
            import datetime as _dt

            day = _dt.date(2024, 1, 1) + _dt.timedelta(days=rng.randrange(500))
            serial = day.toordinal() - EXCEL_EPOCH_ORDINAL
            # Billed: currency TEXT cell — passes through verbatim
            # (document_converter.py:812-820 keeps $-prefixed text as text)
            billed = f"${rng.uniform(10, 9000):,.2f}" if rng.random() < 0.8 else ""
            item = _words(rng, 2)
            data.append([item, qty, price, {"serial": serial}, billed])
            golden_rows.append([
                item,
                format_int(int(qty)) if qty else "",
                format_float(float(price)) if price else "",
                day.strftime("%Y-%m-%d"),
                billed,
            ])
        rows += data
        sheets[name] = rows
        if multi:
            golden_parts.append(f"## {name}")
        golden_parts.append(format_pipe_table([rows[0]] + golden_rows))
    return {
        "doc_id": i,
        "kind": "xlsx",
        "payload": _xlsx_payload(sheets, rng, custom_date_fmt=custom_date_fmt),
        "extracted_text": "\n\n".join(golden_parts),
    }


def gen_office_docs(n: int) -> list[dict]:
    return [gen_office_doc(i) for i in range(n)]
