"""DOCX / XLSX decoders — stdlib only (zipfile + ElementTree).

Reference parity targets:
- docx -> formatted elements: paragraphs in body order + tables
  (lib/idp_common_pkg/idp_common/ocr/document_converter.py:223-381);
  output = paragraph texts and pipe-markdown tables joined with "\\n".
- xlsx -> markdown: per-sheet tables, `## sheet` headers only when more
  than one sheet (document_converter.py:164-221, 969-1107); numeric cells
  formatted with the reference float/int formats (tables.py).

Both operate on raw bytes (the `html`/payload binary column) inside the
same Arrow-batched extraction stage; no python-docx/openpyxl required.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

from .boilerplate import ExtractionResult, Span
from .csv_convert import _column_kind, _format_cell
from .tables import format_pipe_table

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _run_text(r) -> str:  # noqa: ANN001
    """Document-order text of ONE w:r run, mapping <w:tab/> -> '\\t' and
    <w:br/>/<w:cr/> -> '\\n' exactly as python-docx's run.text does (the
    reference reads run.text, document_converter.py:288-301) — joining
    only w:t nodes silently drops that whitespace. Must be applied to
    runs, never whole paragraphs: w:tab under w:pPr/w:tabs is a tab STOP
    definition, not a tab character."""
    parts: list[str] = []
    for node in r.iter():
        tag = node.tag
        if tag == f"{W_NS}t":
            parts.append(node.text or "")
        elif tag == f"{W_NS}tab":
            parts.append("\t")
        elif tag in (f"{W_NS}br", f"{W_NS}cr"):
            parts.append("\n")
    return "".join(parts)


def _docx_cell_text(tc) -> str:  # noqa: ANN001
    return " ".join(
        "".join(_run_text(r) for r in p.iter(f"{W_NS}r"))
        for p in tc.iter(f"{W_NS}p")
    ).strip()


def _toggle_on(el) -> bool:  # noqa: ANN001
    """OOXML toggle property: present = on unless w:val says off."""
    if el is None:
        return False
    return (el.get(f"{W_NS}val") or "1") not in ("0", "false", "none")


def _run_info(r) -> dict | None:  # noqa: ANN001
    """One w:r -> reference run_info shape (document_converter.py:288-301:
    text, bold, italic, underline, font_size, font_name)."""
    text = _run_text(r)
    if not text:
        return None
    rpr = r.find(f"{W_NS}rPr")
    bold = italic = underline = False
    size = name = None
    if rpr is not None:
        bold = _toggle_on(rpr.find(f"{W_NS}b"))
        italic = _toggle_on(rpr.find(f"{W_NS}i"))
        u = rpr.find(f"{W_NS}u")
        underline = u is not None and (u.get(f"{W_NS}val") or "single") != "none"
        sz = rpr.find(f"{W_NS}sz")
        if sz is not None and (sz.get(f"{W_NS}val") or "").isdigit():
            size = int(sz.get(f"{W_NS}val")) / 2.0  # half-points -> pt
        fonts = rpr.find(f"{W_NS}rFonts")
        if fonts is not None:
            name = fonts.get(f"{W_NS}ascii")
    return {"text": text, "bold": bold, "italic": italic,
            "underline": underline, "font_size": size, "font_name": name}


def render_run_markdown(run: dict) -> str:
    """bold/italic/underline -> markdown emphasis around the stripped core
    (emphasis markers don't tolerate adjacent spaces); leading/trailing
    whitespace of the run is preserved outside the markers."""
    text = run["text"]
    core = text.strip()
    if not core or not (run["bold"] or run["italic"] or run["underline"]):
        return text
    lead = text[: len(text) - len(text.lstrip())]
    trail = text[len(text.rstrip()):]
    if run["underline"]:
        core = f"<u>{core}</u>"
    if run["italic"]:
        core = f"*{core}*"
    if run["bold"]:
        core = f"**{core}**"
    return lead + core + trail


_ALIGN_MAP = {"center": "center", "right": "right", "end": "right",
              "both": "justify", "distribute": "justify"}


def docx_to_elements(payload: bytes) -> list[dict]:
    """Body-ordered element dicts in the reference's extraction shape
    (document_converter.py:223-381): paragraphs carry style, is_heading,
    heading_level, alignment (w:jc: center/right/both->justify, else
    left), and run-level formatting; tables carry per-cell
    text/is_header/bold/alignment rows."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        xml = zf.read("word/document.xml")
    root = ET.fromstring(xml)
    body = root.find(f"{W_NS}body")
    elements: list[dict] = []
    if body is None:
        return elements
    for child in body:
        if child.tag == f"{W_NS}p":
            runs = [ri for ri in (_run_info(r) for r in child.iter(f"{W_NS}r")) if ri]
            text = "".join(r["text"] for r in runs).strip()
            if not text:
                continue
            style = child.find(f"{W_NS}pPr/{W_NS}pStyle")
            sval = (style.get(f"{W_NS}val") or "") if style is not None else ""
            m = re.fullmatch(r"Heading\s*(\d+)", sval)
            jc = child.find(f"{W_NS}pPr/{W_NS}jc")
            align = _ALIGN_MAP.get(
                (jc.get(f"{W_NS}val") or "") if jc is not None else "", "left"
            )
            elements.append({
                "type": "paragraph", "text": text,
                "style": sval or "Normal",
                "is_heading": m is not None,
                "heading_level": min(max(int(m.group(1)), 1), 6) if m else 0,
                "alignment": align, "runs": runs,
            })
        elif child.tag == f"{W_NS}tbl":
            trs = child.findall(f"{W_NS}tr")
            data = [
                [{"text": _docx_cell_text(tc), "is_header": ti == 0,
                  "bold": ti == 0,
                  "alignment": "center" if ti == 0 else "left"}
                 for tc in tr.findall(f"{W_NS}tc")]
                for ti, tr in enumerate(trs)
            ]
            data = [row for row in data if row]
            if data:
                elements.append({"type": "table", "data": data})
    return elements


def docx_to_parts(payload: bytes) -> list[str]:
    """Body-ordered markdown parts: heading-prefixed / emphasis-rendered
    paragraphs (Heading styles -> '#'*N, bold/italic/underline runs ->
    **/*/<u> markers) and pipe tables."""
    parts: list[str] = []
    for el in docx_to_elements(payload):
        if el["type"] == "paragraph":
            text = "".join(render_run_markdown(r) for r in el["runs"]).strip()
            if not text:
                continue
            if el["is_heading"]:
                parts.append(f"{'#' * el['heading_level']} {text}")
            else:
                parts.append(text)
        else:
            md = format_pipe_table(
                [[c["text"] for c in row] for row in el["data"]]
            )
            if md:
                parts.append(md)
    return parts


# builtin OOXML numFmtIds that render as dates/times (ECMA-376 §18.8.30);
# custom formats are date-like when their code carries y/m/d/h tokens
_DATE_NUMFMT_IDS = frozenset(range(14, 23)) | frozenset(range(45, 48))
_EXCEL_EPOCH_ORDINAL = 693594  # datetime(1899,12,30).toordinal()


def _is_date_format_code(code: str) -> bool:
    # strip quoted literals, [brackets] and escapes before token sniffing
    bare = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code).lower()
    return any(c in bare for c in "ymdh")


def xlsx_date_styles(zf: zipfile.ZipFile, names: list[str]) -> frozenset[int]:
    """Style indexes (cellXfs order) whose number format is a date format.

    Mirrors what pandas/openpyxl give the reference for free
    (document_converter.py:795-802 formats datetime64 columns as
    ``%Y-%m-%d``): raw OOXML stores dates as numeric serials whose
    date-ness lives only in styles.xml."""
    if "xl/styles.xml" not in names:
        return frozenset()
    root = ET.fromstring(zf.read("xl/styles.xml"))
    date_ids = set(_DATE_NUMFMT_IDS)
    for fmt in root.iter(f"{S_NS}numFmt"):
        fid, code = fmt.get("numFmtId"), fmt.get("formatCode", "")
        if fid and _is_date_format_code(code):
            date_ids.add(int(fid))
    styles: set[int] = set()
    cell_xfs = root.find(f"{S_NS}cellXfs")
    if cell_xfs is not None:
        for i, xf in enumerate(cell_xfs.findall(f"{S_NS}xf")):
            if int(xf.get("numFmtId", "0")) in date_ids:
                styles.add(i)
    return frozenset(styles)


def _serial_to_date(raw: str) -> str:
    """Excel date serial -> '%Y-%m-%d' (1900 date system; the 1899-12-30
    epoch bakes in Excel's historical 1900-leap-year quirk for serials
    past 60, matching what openpyxl hands pandas)."""
    from datetime import date

    return date.fromordinal(
        _EXCEL_EPOCH_ORDINAL + int(float(raw))
    ).strftime("%Y-%m-%d")


_CELL_REF_RE = re.compile(r"([A-Z]+)\d*")


def _col_index(ref: str | None) -> int | None:
    """'A1' -> 0, 'BC12' -> 54 (OOXML A1-style column letters)."""
    m = _CELL_REF_RE.fullmatch(ref or "")
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _xlsx_sheet_rows(
    xml: bytes, shared: list[str], date_styles: frozenset[int] = frozenset()
) -> list[list[str]]:
    """Rows with cells placed at their true column index: OOXML sparsely
    encodes rows (empty cells are OMITTED, the `r="A1"` ref carries the
    position), so positional append would silently shift all columns
    after a gap. Gaps are padded with "" from the ref."""
    root = ET.fromstring(xml)
    out: list[list[str]] = []
    for row in root.iter(f"{S_NS}row"):
        cells: list[str] = []
        for c in row.findall(f"{S_NS}c"):
            col = _col_index(c.get("r"))
            if col is None:
                col = len(cells)  # ref-less cell: next position
            while len(cells) < col:
                cells.append("")
            t = c.get("t")
            if t == "inlineStr":
                is_el = c.find(f"{S_NS}is")
                val = (
                    "".join(x.text or "" for x in is_el.iter(f"{S_NS}t"))
                    if is_el is not None else ""
                )
            elif t == "s":
                v = c.find(f"{S_NS}v")
                idx = int(v.text) if v is not None and v.text else 0
                val = shared[idx] if idx < len(shared) else ""
            else:
                v = c.find(f"{S_NS}v")
                val = v.text if v is not None and v.text else ""
                s_attr = c.get("s")
                if val and s_attr and int(s_attr) in date_styles:
                    try:
                        val = _serial_to_date(val)
                    except (ValueError, OverflowError):
                        pass  # malformed serial: keep the raw value
            if len(cells) == col:
                cells.append(val)
            else:
                cells[col] = val
        if cells:
            out.append(cells)
    return out


R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _workbook_rels(zf: zipfile.ZipFile, names: list[str]) -> dict[str, str]:
    """r:id -> zip path of the worksheet part, from workbook.xml.rels."""
    rels_path = "xl/_rels/workbook.xml.rels"
    if rels_path not in names:
        return {}
    out: dict[str, str] = {}
    root = ET.fromstring(zf.read(rels_path))
    for rel in root.iter(f"{PKG_REL_NS}Relationship"):
        rid, target = rel.get("Id"), rel.get("Target") or ""
        if not rid:
            continue
        # targets are relative to xl/ unless absolute ("/xl/...")
        out[rid] = target.lstrip("/") if target.startswith("/") else f"xl/{target}"
    return out


def _natural_sheet_key(name: str) -> tuple[int, str]:
    m = re.search(r"(\d+)", name)
    return (int(m.group(1)) if m else 0, name)


def xlsx_to_sheets(payload: bytes) -> dict[str, list[list[str]]]:
    """{sheet_name: rows} in workbook order.

    Sheet name -> part resolution goes through xl/_rels/workbook.xml.rels
    (the r:id mapping — lexicographic filename order would put sheet10.xml
    before sheet2.xml and mismap every workbook with 10+ sheets); when the
    rels part or r:id attributes are absent, sheet files are natural-sorted
    by their numeric index and zipped with workbook names positionally.
    """
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = zf.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sroot = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{S_NS}t"))
                for si in sroot.iter(f"{S_NS}si")
            ]
        rels = _workbook_rels(zf, names)
        date_styles = xlsx_date_styles(zf, names)
        entries: list[tuple[str, str | None]] = []  # (sheet name, zip path)
        if "xl/workbook.xml" in names:
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
            for i, s in enumerate(wb.iter(f"{S_NS}sheet")):
                name = s.get("name", f"Sheet{i + 1}")
                path = rels.get(s.get(f"{R_NS}id") or "")
                entries.append((name, path if path in names else None))
        sheet_files = sorted(
            (n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=_natural_sheet_key,
        )
        if not entries:
            entries = [(f"Sheet{i + 1}", f) for i, f in enumerate(sheet_files)]
        elif any(path is None for _, path in entries):
            # no usable rels: assign natural-sorted files positionally
            entries = [
                (name, sheet_files[i] if i < len(sheet_files) else None)
                for i, (name, _) in enumerate(entries)
            ]
        sheets: dict[str, list[list[str]]] = {}
        for name, path in entries:
            sheets[name] = (
                _xlsx_sheet_rows(zf.read(path), shared, date_styles)
                if path else []
            )
    return sheets


def sheets_to_markdown(sheets: dict[str, list[list[str]]]) -> str:
    """Per-sheet markdown with reference numeric formats; `## sheet`
    headers only when more than one sheet. Shared by the OOXML (xlsx) and
    BIFF8 (.xls, kernels/xls_biff) decode paths — both normalize to the
    same (sheet name -> string rows) shape first."""
    parts: list[str] = []
    multi = len(sheets) > 1
    for name, rows in sheets.items():
        if multi:
            parts.append(f"## {name}")
        if not rows:
            continue
        header, data = rows[0], rows[1:]
        ncols = len(header)
        kinds = [
            _column_kind([r[c] for r in data if c < len(r)]) for c in range(ncols)
        ]
        out_rows = [header] + [
            [_format_cell(r[c], kinds[c]) if c < len(r) else "" for c in range(ncols)]
            for r in data
        ]
        parts.append(format_pipe_table(out_rows))
    return "\n\n".join(parts)


def xlsx_to_markdown(payload: bytes) -> str:
    return sheets_to_markdown(xlsx_to_sheets(payload))


def _result_from_parts(parts: list[str], sep: str = "\n") -> ExtractionResult:
    text = sep.join(parts)
    spans: list[Span] = []
    off = 0
    for i, p in enumerate(parts):
        spans.append(Span(off, off + len(p), i))
        off += len(p) + len(sep)
    return ExtractionResult(text, spans, 1.0 if text else 0.0, len(parts))


def extract_docx(payload: bytes) -> ExtractionResult:
    return _result_from_parts(docx_to_parts(payload), "\n")


def extract_xlsx(payload: bytes) -> ExtractionResult:
    md = xlsx_to_markdown(payload)
    parts = md.split("\n\n") if md else []
    return _result_from_parts(parts, "\n\n")
