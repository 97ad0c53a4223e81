"""Synthetic CSV document fixtures with independent goldens.

The payload is real CSV text (csv.writer quoting: embedded commas, quotes,
empty cells); the golden markdown is computed from the template cell data
via the frozen pipe-table formatting spec (kernels/tables.py — same shared
spec the pages/office fixtures use). The decode path under test is
kernels/csv_convert.csv_to_markdown routed through the extract dispatch:
by `.csv` extension hint (the reference keys CSV on extension,
lib/idp_common_pkg/idp_common/ocr/service.py:1632-1678) and by content
sniff for hint-less payloads.

Doc i is fully determined by random.Random(f"csv-{i}-42").
"""

from __future__ import annotations

import csv
import io
import random

from ..kernels.tables import format_float, format_int, format_pipe_table
from .pages_gen import WORDS

COL_KINDS = ("str", "int", "float", "mixed")


def _str_cell(rng: random.Random) -> str:
    w = " ".join(rng.choice(WORDS) for _ in range(1 + rng.randrange(3)))
    r = rng.random()
    if r < 0.10:
        return f"{w}, {rng.choice(WORDS)}"  # embedded comma -> quoting
    if r < 0.15:
        return f'say "{w}"'  # embedded quotes -> doubled-quote escape
    return w


def gen_csv_doc(i: int) -> dict:
    rng = random.Random(f"csv-{i}-42")
    ncols = 2 + rng.randrange(4)
    kinds = [rng.choice(COL_KINDS) for _ in range(ncols)]
    if i % 2 == 1 and not any(k in ("int", "float") for k in kinds):
        # hint-less docs (odd ids) must be DETECTABLY tabular: the
        # conservative content sniff requires a numeric column contrasting
        # with a non-numeric header (filetype.looks_like_csv). All-words
        # CSVs stay covered by the extension-hint family (even ids) —
        # matching the reference, which only ever routes CSV by extension.
        kinds[rng.randrange(ncols)] = rng.choice(("int", "float"))
    header = [f"col_{c}" if rng.random() < 0.5 else _str_cell(rng).split(",")[0]
              for c in range(ncols)]
    nrows = 2 + rng.randrange(6)
    data: list[list[str]] = []
    for _ in range(nrows):
        row = []
        for kind in kinds:
            if rng.random() < 0.10:
                row.append("")  # empty cell
            elif kind == "int":
                row.append(str(rng.randrange(0, 100000)))
            elif kind == "float":
                row.append(f"{rng.uniform(0, 9000):.{rng.randrange(1, 4)}f}")
            elif kind == "mixed":
                row.append(
                    str(rng.randrange(0, 99)) if rng.random() < 0.5
                    else _str_cell(rng)
                )
            else:
                row.append(_str_cell(rng))
        data.append(row)

    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(header)
    w.writerows(data)
    payload = buf.getvalue().encode("utf-8")

    # golden: the kernel's documented column-kind rules applied to template
    # data (all-int -> int format, all-numeric -> float format, else as-is)
    def col_golden_kind(c: int) -> str:
        vals = [r[c] for r in data if r[c].strip()]
        if not vals:
            return "str"
        if all(_is_int(v) for v in vals):
            return "int"
        if all(_is_float(v) for v in vals):
            return "float"
        return "str"

    golden_kinds = [col_golden_kind(c) for c in range(ncols)]
    out_rows = [header]
    for r in data:
        out = []
        for c in range(ncols):
            v = r[c].strip()
            if not v:
                out.append("")
            elif golden_kinds[c] == "int":
                out.append(format_int(int(v)))
            elif golden_kinds[c] == "float":
                out.append(format_float(float(v)))
            else:
                out.append(v)
        out_rows.append(out)
    return {
        "doc_id": i,
        "name": f"export_{i:04d}.csv" if i % 2 == 0 else None,  # odd: sniff path
        "payload": payload,
        "extracted_text": format_pipe_table(out_rows),
    }


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


def gen_csv_docs(n: int) -> list[dict]:
    return [gen_csv_doc(i) for i in range(n)]
