"""Text-confidence markdown table (reference ocr/service.py:1516-1556 parity).

LINE-level (text, confidence, text_type) triples -> compact markdown table:
header `| Text | Confidence |` with `|:-----|:-----------|` alignment row,
pipes escaped, confidence rounded to 1 dp, `(HANDWRITING)` tag appended for
handwritten lines.
"""

from __future__ import annotations

from .tables import escape_pipes

HEADER = ["| Text | Confidence |", "|:-----|:-----------|"]


def text_confidence_table(lines: list[tuple[str, float, str]]) -> str:
    """lines: (text, confidence, text_type) where text_type in
    {"PRINTED", "HANDWRITING"}."""
    out = list(HEADER)
    for text, conf, text_type in lines:
        if not text:
            continue
        text = escape_pipes(text)
        conf = round(conf, 1)
        if text_type == "HANDWRITING":
            out.append(f"| {text} (HANDWRITING) | {conf} |")
        else:
            out.append(f"| {text} | {conf} |")
    return "\n".join(out)


def synthetic_line_blocks(page_text: str, confidence: float = 99.0) -> list[dict]:
    """Each nonblank line -> a synthetic LINE block
    (reference ocr/service.py:1760-1793 parity)."""
    blocks = []
    for line in page_text.split("\n"):
        if line.strip():
            blocks.append(
                {
                    "BlockType": "LINE",
                    "Text": line,
                    "Confidence": confidence,
                    "TextType": "PRINTED",
                }
            )
    return blocks
