"""Textract-style OCR block fixtures with construction-derived goldens.

Each doc is a synthetic AnalyzeDocument-shaped block list (PAGE/LINE/WORD/
TABLE/CELL with Ids, CHILD relationships, 1-based cell indices, bounding-box
geometry) exercising the ``to_markdown`` analog in kernels/textract_blocks:
prose lines, pipe-bearing cells, merged (spanned) cells, table-row LINEs
that duplicate cell words (must be dropped), interleaved geometry (blocks
emitted lines-first then tables; reading order must come from the boxes,
not list order), table-only pages, empty pages, and KEY_VALUE_SET form
pairs (FeatureTypes=FORMS shape: KEY/VALUE EntityTypes, VALUE
relationships, empty values, plus the duplicate prose LINE Textract also
emits over the same words — must be dropped), SELECTION_ELEMENT
checkboxes both as form values and inside table cells (rendered
:selected:/:unselected:, textractor's convention), and LAYOUT blocks
(TITLE -> `# `, SECTION_HEADER -> `## ` heading renders that consume
their child LINEs; TEXT/LIST/FOOTER containers transparent).

The golden markdown is assembled by this generator's own walk of the
template items in construction order — the kernel never runs here; the one
shared piece is the frozen pipe-table formatting spec (kernels/tables.py),
same as the csv/office families.

Doc i is fully determined by random.Random(f"ocrblocks-{i}-42").
"""

from __future__ import annotations

import json
import random

from ..kernels.tables import escape_pipes, format_pipe_table
from .pages_gen import WORDS


def _words(rng: random.Random, lo: int = 1, hi: int = 3) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randrange(lo, hi + 1)))


class _Ids:
    def __init__(self, doc_id: int) -> None:
        self.doc_id = doc_id
        self.n = 0

    def next(self, kind: str) -> str:
        self.n += 1
        return f"{kind}-{self.doc_id}-{self.n}"


def _bbox(top: float, left: float = 0.1) -> dict:
    return {"BoundingBox": {"Top": round(top, 4), "Left": left,
                            "Width": 0.8, "Height": 0.02}}


def _word_blocks(ids: _Ids, text: str) -> tuple[list[dict], list[str]]:
    blocks, wids = [], []
    for w in text.split(" "):
        wid = ids.next("w")
        blocks.append({"BlockType": "WORD", "Id": wid, "Text": w})
        wids.append(wid)
    return blocks, wids


def gen_ocrblocks_doc(i: int) -> dict:
    rng = random.Random(f"ocrblocks-{i}-42")
    ids = _Ids(i)
    lines: list[dict] = []   # LINE + WORD blocks, emitted first
    tables: list[dict] = []  # TABLE + CELL (+ their WORD) blocks, emitted last
    golden_items: list[str] = []  # (kind, text) in construction order
    golden_kinds: list[str] = []

    top = 0.05
    r = rng.random()
    if r < 0.05:
        n_items = 0                      # empty page
    elif r < 0.12:
        n_items = 1                      # single item (often table-only)
    else:
        n_items = 3 + rng.randrange(6)

    force_table = r < 0.12 and rng.random() < 0.7
    saw_title = False
    for k in range(n_items):
        kind_draw = rng.random()
        is_table = force_table if n_items == 1 else kind_draw < 0.3
        is_form = not is_table and n_items > 1 and kind_draw >= 0.78
        is_heading = (not is_table and not is_form and n_items > 1
                      and 0.68 <= kind_draw < 0.78)
        if is_heading:
            # LAYOUT_TITLE (first heading) / LAYOUT_SECTION_HEADER wrap
            # 1-2 child LINEs; the kernel renders them as #/## headings
            # and must consume the LINEs from the prose flow
            n_hl = 1 + (rng.random() < 0.3)
            line_ids, texts = [], []
            for _ in range(n_hl):
                text = _words(rng, 2, 5)
                wblocks, wids = _word_blocks(ids, text)
                lines.extend(wblocks)
                lid = ids.next("l")
                lines.append({
                    "BlockType": "LINE", "Id": lid, "Text": text,
                    "Geometry": _bbox(top + 0.001),
                    "Relationships": [{"Type": "CHILD", "Ids": wids}],
                })
                line_ids.append(lid)
                texts.append(text)
            btype = "LAYOUT_SECTION_HEADER" if saw_title else "LAYOUT_TITLE"
            prefix = "## " if saw_title else "# "
            saw_title = True
            lines.append({
                "BlockType": btype, "Id": ids.next("y"),
                "Geometry": _bbox(top),
                "Relationships": [{"Type": "CHILD", "Ids": line_ids}],
            })
            golden_items.append(prefix + " ".join(texts))
            golden_kinds.append("line")
            top += 0.03
            continue
        if is_form:
            # -- FORMS: 1-3 KEY_VALUE_SET pairs + the duplicate prose LINE
            # Textract also emits over the same words (must be dropped)
            for _ in range(1 + rng.randrange(3)):
                key_text = _words(rng, 1, 2)
                empty_val = rng.random() < 0.15
                # checkbox form field: the VALUE's child is a
                # SELECTION_ELEMENT, not words (FeatureTypes=FORMS shape);
                # textractor renders it as :selected:/:unselected:
                checkbox = (not empty_val) and rng.random() < 0.25
                val_text = "" if empty_val else _words(rng, 1, 3)
                kw_blocks, kw_ids = _word_blocks(ids, key_text)
                lines.extend(kw_blocks)
                vrel: list[dict] = []
                dup_wids = list(kw_ids)
                dup_texts = [key_text]
                if checkbox:
                    sel_id = ids.next("s")
                    status = ("SELECTED" if rng.random() < 0.5
                              else "NOT_SELECTED")
                    lines.append({"BlockType": "SELECTION_ELEMENT",
                                  "Id": sel_id, "SelectionStatus": status})
                    vid = ids.next("v")
                    lines.append({
                        "BlockType": "KEY_VALUE_SET", "Id": vid,
                        "EntityTypes": ["VALUE"],
                        "Relationships": [{"Type": "CHILD", "Ids": [sel_id]}],
                    })
                    vrel = [{"Type": "VALUE", "Ids": [vid]}]
                    val_text = (":selected:" if status == "SELECTED"
                                else ":unselected:")
                elif not empty_val:
                    vw_blocks, vw_ids = _word_blocks(ids, val_text)
                    lines.extend(vw_blocks)
                    vid = ids.next("v")
                    lines.append({
                        "BlockType": "KEY_VALUE_SET", "Id": vid,
                        "EntityTypes": ["VALUE"],
                        "Relationships": [{"Type": "CHILD", "Ids": vw_ids}],
                    })
                    vrel = [{"Type": "VALUE", "Ids": [vid]}]
                    dup_wids.extend(vw_ids)
                    dup_texts.append(val_text)
                lines.append({
                    "BlockType": "KEY_VALUE_SET", "Id": ids.next("k"),
                    "EntityTypes": ["KEY"], "Geometry": _bbox(top),
                    "Relationships": [{"Type": "CHILD", "Ids": kw_ids}] + vrel,
                })
                lines.append({
                    "BlockType": "LINE", "Id": ids.next("l"),
                    "Text": " ".join(dup_texts), "Geometry": _bbox(top),
                    "Relationships": [{"Type": "CHILD", "Ids": dup_wids}],
                })
                golden_items.append(f"**{key_text}:** {val_text}".rstrip())
                golden_kinds.append("line")
                top += 0.03
            continue
        if not is_table:
            text = _words(rng, 3, 8)
            wblocks, wids = _word_blocks(ids, text)
            lines.extend(wblocks)
            lid = ids.next("l")
            lines.append({
                "BlockType": "LINE", "Id": lid, "Text": text,
                "Geometry": _bbox(top),
                "Relationships": [{"Type": "CHILD", "Ids": wids}],
            })
            if rng.random() < 0.15:
                # transparent LAYOUT container (TEXT/LIST/FOOTER): the
                # prose line must emit unchanged, no heading prefix
                lines.append({
                    "BlockType": rng.choice(
                        ["LAYOUT_TEXT", "LAYOUT_LIST", "LAYOUT_FOOTER"]),
                    "Id": ids.next("y"), "Geometry": _bbox(top),
                    "Relationships": [{"Type": "CHILD", "Ids": [lid]}],
                })
            golden_items.append(text)
            golden_kinds.append("line")
            top += 0.03
            continue

        # -- a table: grid of cells, optional merge (span-attribute style or
        # the real MERGED_CELL encoding), duplicate row-LINEs
        n_rows = 2 + rng.randrange(4)
        n_cols = 2 + rng.randrange(3)
        merge = None
        mr = rng.random()
        if mr < 0.3 and n_rows >= 3:
            merge = (1 + rng.randrange(n_rows - 1), 1 + rng.randrange(n_cols),
                     "row")  # (anchor_row, anchor_col, axis); spans 2 rows
        elif mr < 0.45 and n_cols >= 3:
            merge = (1 + rng.randrange(n_rows), 1 + rng.randrange(n_cols - 1),
                     "col")
        elif mr < 0.6 and n_cols >= 3:
            # MERGED_CELL shape: base cells stay span-1 with their own text;
            # a MERGED_CELL block overlays two horizontal neighbours
            merge = (1 + rng.randrange(n_rows), 1 + rng.randrange(n_cols - 1),
                     "mc")
        cell_blocks: list[dict] = []
        cell_ids: list[str] = []
        mc_members: list[tuple[str, str]] = []  # (cell_id, text) under the MERGED_CELL
        grid: list[list[str]] = [["" for _ in range(n_cols)] for _ in range(n_rows)]
        table_top = top
        for rr in range(1, n_rows + 1):
            row_wids: list[str] = []
            row_texts: list[str] = []
            for cc in range(1, n_cols + 1):
                if merge and merge[2] == "row" and (rr, cc) == (merge[0] + 1, merge[1]):
                    continue  # covered by the row-span anchor above
                if merge and merge[2] == "col" and (rr, cc) == (merge[0], merge[1] + 1):
                    continue  # covered by the col-span anchor to the left
                if rng.random() < 0.08:
                    text = ""  # empty cell
                elif rng.random() < 0.12:
                    text = f"{_words(rng)} | {_words(rng)}"  # pipe in cell
                else:
                    text = _words(rng)
                cell: dict = {"BlockType": "CELL", "Id": ids.next("c"),
                              "RowIndex": rr, "ColumnIndex": cc}
                if merge and merge[2] in ("row", "col") and (rr, cc) == (merge[0], merge[1]):
                    if merge[2] == "row":
                        cell["RowSpan"] = 2
                    else:
                        cell["ColumnSpan"] = 2
                child_ids: list[str] = []
                if text:
                    wblocks, wids = _word_blocks(ids, text)
                    cell_blocks.extend(wblocks)
                    child_ids.extend(wids)
                    row_wids.extend(wids)
                    row_texts.append(text)
                if rng.random() < 0.08:
                    # checkbox inside a table cell (SELECTION_ELEMENT child;
                    # renders after the cell's words in child order)
                    sel_id = ids.next("s")
                    status = ("SELECTED" if rng.random() < 0.5
                              else "NOT_SELECTED")
                    cell_blocks.append({"BlockType": "SELECTION_ELEMENT",
                                        "Id": sel_id,
                                        "SelectionStatus": status})
                    child_ids.append(sel_id)
                    token = (":selected:" if status == "SELECTED"
                             else ":unselected:")
                    text = f"{text} {token}".strip()
                if child_ids:
                    cell["Relationships"] = [{"Type": "CHILD",
                                              "Ids": child_ids}]
                cell_blocks.append(cell)
                cell_ids.append(cell["Id"])
                grid[rr - 1][cc - 1] = escape_pipes(text)
                if (merge and merge[2] == "mc" and rr == merge[0]
                        and cc in (merge[1], merge[1] + 1)):
                    mc_members.append((cell["Id"], text))
            # Textract also emits a LINE per table row over the same words;
            # the kernel must drop it (all words claimed by cells).
            if row_wids:
                lines.append({
                    "BlockType": "LINE", "Id": ids.next("l"),
                    "Text": " ".join(row_texts), "Geometry": _bbox(top),
                    "Relationships": [{"Type": "CHILD", "Ids": row_wids}],
                })
            top += 0.025
        if merge and merge[2] == "mc" and mc_members:
            mc = {"BlockType": "MERGED_CELL", "Id": ids.next("m"),
                  "RowIndex": merge[0], "ColumnIndex": merge[1],
                  "RowSpan": 1, "ColumnSpan": 2,
                  "Relationships": [{"Type": "CHILD",
                                     "Ids": [cid for cid, _ in mc_members]}]}
            cell_blocks.append(mc)
            cell_ids.append(mc["Id"])
            combined = " ".join(t for _, t in mc_members if t)
            grid[merge[0] - 1][merge[1] - 1] = escape_pipes(combined)
            grid[merge[0] - 1][merge[1]] = ""
        tables.append({
            "BlockType": "TABLE", "Id": ids.next("t"),
            "Geometry": _bbox(table_top),
            "Relationships": [{"Type": "CHILD", "Ids": cell_ids}],
        })
        tables.extend(cell_blocks)
        golden_items.append(format_pipe_table(grid))
        golden_kinds.append("table")
        top += 0.01

    # golden assembly mirrors the kernel's documented contract: blank line
    # between items whenever a table is on either side
    out: list[str] = []
    for j, (kind, text) in enumerate(zip(golden_kinds, golden_items)):
        if j > 0 and (kind == "table" or golden_kinds[j - 1] == "table"):
            out.append("")
        out.append(text)
    golden_md = "\n".join(out)

    page = {"BlockType": "PAGE", "Id": ids.next("p"),
            "Relationships": [{"Type": "CHILD",
                               "Ids": [b["Id"] for b in lines
                                       if b["BlockType"] == "LINE"]}]}
    blocks = [page] + lines + tables  # lines-first: order must not matter
    return {"doc_id": i, "blocks_json": json.dumps(blocks, sort_keys=True),
            "page_md": golden_md}


def gen_ocrblocks_docs(n: int) -> list[dict]:
    return [gen_ocrblocks_doc(i) for i in range(n)]
