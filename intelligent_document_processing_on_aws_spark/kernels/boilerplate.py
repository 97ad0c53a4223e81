"""Boilerpipe/Readability-style main-content selection over DOM blocks.

Deterministic, tunable-but-frozen heuristic (Kohlschütter-style densitometry,
"Boilerplate Detection using Shallow Text Features", WSDM 2010):

1. a-priori drop: blocks under nav/aside/footer/header/form/title ancestors;
2. structural keep: blocks under article/main ancestors with link density
   <= CONTENT_LINK_DENSITY;
3. density rule elsewhere: keep blocks with >= MIN_WORDS words and link
   density <= MAX_LINK_DENSITY (link farms and ad strips fail this);
4. table blocks: keep when structural or >= TABLE_MIN_CHARS chars;
5. neighbour smoothing: a short low-link block sandwiched between two kept
   blocks is rescued (block-fusion analog).

This replaces the reference's OCR+LLM "recover the real text" role
(lib/idp_common_pkg/idp_common/ocr/service.py:1558-1630) with a pure
heuristic per the engine's north star. Output contract: extracted_text is
the kept block texts joined with "\n" — the same page-join separator the
reference uses when concatenating section text
(lib/idp_common_pkg/idp_common/extraction/service.py:979-1016).
"""

from __future__ import annotations

from dataclasses import dataclass

from .html_dom import Block, parse_blocks

MIN_WORDS = 10
SMOOTH_MIN_WORDS = 3
MAX_LINK_DENSITY = 0.33
CONTENT_LINK_DENSITY = 0.5
TABLE_MIN_CHARS = 30

BLOCK_JOIN = "\n"


@dataclass
class Span:
    start: int
    end: int
    block_id: int


@dataclass
class ExtractionResult:
    extracted_text: str
    spans: list[Span]
    confidence: float
    n_blocks: int  # total segmented blocks considered


def select_blocks(blocks: list[Block]) -> list[Block]:
    """Mark ``kept`` on each block; returns the same list."""
    for b in blocks:
        if b.in_drop:
            b.kept = False
        elif b.is_table:
            b.kept = b.in_content or b.n_chars >= TABLE_MIN_CHARS
        elif b.in_content:
            b.kept = b.link_density <= CONTENT_LINK_DENSITY
        else:
            b.kept = b.n_words >= MIN_WORDS and b.link_density <= MAX_LINK_DENSITY

    # neighbour smoothing (single pass, left-to-right, frozen semantics)
    for i, b in enumerate(blocks):
        if b.kept or b.in_drop or b.is_table:
            continue
        if b.n_words >= SMOOTH_MIN_WORDS and b.link_density <= MAX_LINK_DENSITY:
            prev_kept = i > 0 and blocks[i - 1].kept
            next_kept = i + 1 < len(blocks) and blocks[i + 1].kept
            if prev_kept and next_kept:
                b.kept = True
    return blocks


def assemble(blocks: list[Block]) -> ExtractionResult:
    """Join kept blocks with BLOCK_JOIN and compute spans + confidence.

    confidence = kept chars / total candidate chars (title/head blocks are
    excluded from the denominator; they are metadata, not page body).
    """
    kept = [b for b in blocks if b.kept]
    texts = [b.text for b in kept]
    extracted = BLOCK_JOIN.join(texts)
    spans: list[Span] = []
    off = 0
    for i, t in enumerate(texts):
        spans.append(Span(start=off, end=off + len(t), block_id=i))
        off += len(t) + len(BLOCK_JOIN)
    denom_blocks = [b for b in blocks if "title" not in b.path and "head" not in b.path]
    total_chars = sum(b.n_chars for b in denom_blocks)
    kept_chars = sum(b.n_chars for b in kept)
    # contract: confidence is rounded to 6 dp everywhere (kernel, golden,
    # oracle) so float summation order can never flip a comparison.
    confidence = round(kept_chars / total_chars, 6) if total_chars else 0.0
    return ExtractionResult(
        extracted_text=extracted,
        spans=spans,
        confidence=confidence,
        n_blocks=len(blocks),
    )


def extract_html(html: bytes | str) -> ExtractionResult:
    """Full HTML path: segment -> classify -> assemble."""
    blocks = parse_blocks(html)
    select_blocks(blocks)
    return assemble(blocks)
