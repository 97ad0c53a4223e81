"""Textract-style OCR block tree -> page markdown (tables as pipe grids).

The reference parses AnalyzeDocument responses with the textractor library
and calls ``parsed_response.to_markdown()`` (ocr/service.py:1560-1610,
``_parse_textract_response``); when markdown conversion fails it falls back
to ``parsed_response.text``, and when parsing fails entirely it joins LINE
blocks directly (ocr/service.py:1611-1625). textractor is an AWS client
library (not in this environment and out of scope), so this kernel is a
from-scratch deterministic analog over the same block model:

- blocks: list of dicts with BlockType in {PAGE, LINE, WORD, TABLE, CELL,
  MERGED_CELL, KEY_VALUE_SET, SELECTION_ELEMENT},
  Id, Relationships [{Type: CHILD, Ids: [...]}], Text (WORD/LINE),
  RowIndex/ColumnIndex/RowSpan/ColumnSpan (CELL), Geometry
  {BoundingBox: {Top, Left, ...}} — the documented Textract response shape.
- a TABLE renders as a pipe-markdown grid (first row = header) using the
  same frozen formatting spec as the CSV converter (kernels/tables.py);
  cell text is its child WORDs joined by single spaces, pipes escaped;
  a spanned cell renders its text at the anchor position and '' in the
  covered positions (textractor's merged-cell rendering).
- LINE blocks whose words are all claimed by some table cell are dropped
  from the body text (textractor likewise does not repeat table words as
  prose), and page items — surviving lines + tables — emit in reading
  order by (top, left) of their bounding boxes, matching the geometric
  sort used for PDF spans (kernels/pdf_layout.reading_order_lines).
- KEY_VALUE_SET form pairs (FeatureTypes=FORMS, requested by the
  reference at ocr/service.py:1078-1083): a KEY-entity block's child
  words form the label, its VALUE relationship points at VALUE-entity
  blocks whose child words form the value; rendered as ``**key:** value``
  lines (textractor's form rendering) at the KEY's geometry, with the
  claimed-word LINE dedup extended to form words.
- LAYOUT blocks (FeatureTypes=LAYOUT): LAYOUT_TITLE renders its child
  LINEs as ``# ...`` and LAYOUT_SECTION_HEADER as ``## ...`` —
  textractor's markdown linearization prefixes — consuming those LINEs
  from the prose flow; other LAYOUT_* containers (TEXT/LIST/FOOTER/...)
  are transparent: their lines emit as ordinary prose.

Pure functions over plain dicts: executed only inside Arrow-batched
mapInPandas, never per-row Python in a Spark plan.
"""

from __future__ import annotations

from .tables import escape_pipes, format_pipe_table


def _child_ids(block: dict) -> list[str]:
    out: list[str] = []
    for rel in block.get("Relationships") or []:
        if rel.get("Type") == "CHILD":
            out.extend(rel.get("Ids") or [])
    return out


def _cell_text(cell: dict, by_id: dict[str, dict]) -> str:
    words = []
    for wid in _child_ids(cell):
        w = by_id.get(wid)
        if not w:
            continue
        if w.get("BlockType") == "WORD" and w.get("Text"):
            words.append(w["Text"])
        elif w.get("BlockType") == "SELECTION_ELEMENT":
            # textractor renders checkbox children as :selected:/:unselected:
            # tokens inside cells and key-value values (AnalyzeDocument
            # SelectionStatus in {SELECTED, NOT_SELECTED}).
            status = w.get("SelectionStatus")
            words.append(":selected:" if status == "SELECTED" else ":unselected:")
    return " ".join(words)


def table_to_markdown(table: dict, by_id: dict[str, dict]) -> str:
    """One TABLE block -> pipe-markdown grid.

    Grid size is the max extent of (RowIndex+RowSpan, ColumnIndex+ColumnSpan)
    over the table's CELL children (Textract indices are 1-based). Cells
    covered by a span render as ''.

    Merges are accepted in BOTH public shapes: span attributes directly on
    a CELL, and the real AnalyzeDocument encoding — MERGED_CELL children of
    the TABLE carrying the span and CHILD links to the base cells they
    cover (base cells stay span-1). A merged region renders its combined
    text at the anchor (top-left) position and '' elsewhere, textractor's
    merged-cell rendering.
    """
    children = [by_id[cid] for cid in _child_ids(table) if cid in by_id]
    cells = [c for c in children if c.get("BlockType") == "CELL"]
    merged = [c for c in children if c.get("BlockType") == "MERGED_CELL"]
    if not cells:
        return ""
    n_rows = max(c.get("RowIndex", 1) + c.get("RowSpan", 1) - 1 for c in cells)
    n_cols = max(c.get("ColumnIndex", 1) + c.get("ColumnSpan", 1) - 1 for c in cells)
    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for c in cells:
        r, col = c.get("RowIndex", 1) - 1, c.get("ColumnIndex", 1) - 1
        grid[r][col] = escape_pipes(_cell_text(c, by_id))
    for m in merged:
        r0, c0 = m.get("RowIndex", 1) - 1, m.get("ColumnIndex", 1) - 1
        base = [
            by_id[cid]
            for cid in _child_ids(m)
            if cid in by_id and by_id[cid].get("BlockType") == "CELL"
        ]
        texts = [t for t in (_cell_text(b, by_id) for b in base) if t]
        for b in base:
            br, bc = b.get("RowIndex", 1) - 1, b.get("ColumnIndex", 1) - 1
            if 0 <= br < n_rows and 0 <= bc < n_cols:
                grid[br][bc] = ""
        if 0 <= r0 < n_rows and 0 <= c0 < n_cols:
            grid[r0][c0] = escape_pipes(" ".join(texts))
    return format_pipe_table(grid)


def _top_left(block: dict) -> tuple[float, float]:
    bbox = (block.get("Geometry") or {}).get("BoundingBox") or {}
    return (float(bbox.get("Top", 0.0)), float(bbox.get("Left", 0.0)))


def blocks_to_markdown(blocks: list[dict]) -> str:
    """Full-page analog of textractor ``to_markdown()``: prose lines and
    table grids interleaved in geometric reading order, blank line between
    items of different kinds. Empty/strip-empty pages yield ''."""
    blocks = [b for b in blocks if isinstance(b, dict)]  # tolerate junk rows
    by_id = {b["Id"]: b for b in blocks if b.get("Id")}
    tables = [b for b in blocks if b.get("BlockType") == "TABLE"]

    claimed_words: set[str] = set()
    for t in tables:
        for cid in _child_ids(t):
            cell = by_id.get(cid)
            if cell and cell.get("BlockType") == "CELL":
                claimed_words.update(_child_ids(cell))

    items: list[tuple[tuple[float, float], str, str]] = []
    # LAYOUT: TITLE/SECTION_HEADER containers render their child LINEs as
    # markdown headings and consume them from the prose flow
    claimed_lines: set[str] = set()
    _HEADING = {"LAYOUT_TITLE": "# ", "LAYOUT_SECTION_HEADER": "## "}
    for b in blocks:
        prefix = _HEADING.get(b.get("BlockType") or "")
        if prefix is None:
            continue
        texts: list[str] = []
        for cid in _child_ids(b):
            child = by_id.get(cid)
            if child and child.get("BlockType") == "LINE" and child.get("Text"):
                texts.append(child["Text"])
                claimed_lines.add(cid)
        if texts:
            items.append((_top_left(b), "line", prefix + " ".join(texts)))
    # FORMS: KEY_VALUE_SET pairs -> "**key:** value" lines; their words are
    # claimed so the duplicate prose LINEs Textract also emits are dropped
    for b in blocks:
        if b.get("BlockType") != "KEY_VALUE_SET":
            continue
        if "KEY" not in (b.get("EntityTypes") or []):
            continue
        key_text = _cell_text(b, by_id)
        vals: list[str] = []
        for rel in b.get("Relationships") or []:
            if rel.get("Type") == "VALUE":
                for vid in rel.get("Ids") or []:
                    v = by_id.get(vid)
                    if v:
                        t = _cell_text(v, by_id)
                        if t:
                            vals.append(t)
                        claimed_words.update(_child_ids(v))
        claimed_words.update(_child_ids(b))
        if key_text:
            items.append(
                (_top_left(b), "line", f"**{key_text}:** {' '.join(vals)}".rstrip())
            )
    for b in blocks:
        if b.get("BlockType") == "LINE" and b.get("Text"):
            if b.get("Id") in claimed_lines:
                continue  # rendered as a layout heading above
            wids = _child_ids(b)
            if wids and all(w in claimed_words for w in wids):
                continue  # the line is a table row; the grid renders it
            items.append((_top_left(b), "line", b["Text"]))
    for t in tables:
        md = table_to_markdown(t, by_id)
        if md:
            items.append((_top_left(t), "table", md))

    items.sort(key=lambda it: it[0])
    out: list[str] = []
    prev_kind: str | None = None
    for _pos, kind, text in items:
        if prev_kind is not None and (kind == "table" or prev_kind == "table"):
            out.append("")  # blank line around table grids
        out.append(text)
        prev_kind = kind
    return "\n".join(out)


def blocks_plain_text(blocks: list) -> str:
    """The reference's last-resort fallback: LINE texts joined by newline
    (ocr/service.py:1611-1625). Runs inside the except handler of the
    markdown ladder, so it must never raise itself — non-dict entries
    (nulls, strings) are skipped, not trusted."""
    return "\n".join(
        b["Text"]
        for b in blocks
        if isinstance(b, dict) and b.get("BlockType") == "LINE" and b.get("Text")
    )
