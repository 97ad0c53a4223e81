"""Summary-section fixtures for the markdown-formatter parity surface.

Each doc plants the behaviors SummaryMarkdownFormatter must handle
(markdown_formatter.py:15-418): duplicate leading titles (section-name
variations at heading levels 1-3), LLM-style leading headings, inline
citations + References blocks needing section-name prefixing, and
classification-less sections (named section_{id}).

The golden combined markdown is composed here from the CLEAN parts — the
stripped body and the already-rewritten citation strings are built
directly from template data, never by running the kernel. The assembly
layout (title/TOC/anchors/back-to-top/separators) is the frozen spec
shared with the kernel, mirroring the pipe-table fixture policy; the
tested surface is title-removal, citation rewriting, naming, and order.

Doc i is fully determined by random.Random(f"summd-{i}-42").
"""

from __future__ import annotations

import random

from .pages_gen import WORDS

CLASSES = ("bank_statement", "invoice", "webpage", None)


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _anchor(text: str) -> str:
    import re

    return re.sub(r"[^a-z0-9-]", "", text.lower().replace(" ", "-"))


def _gen_section(rng: random.Random, section_id: str, classification: str | None):
    """Returns (raw_content, clean_golden_content)."""
    section_name = classification or f"section_{section_id}"
    formatted = section_name.replace("_", " ").replace("-", " ").title()
    body = _words(rng, 12 + rng.randrange(10))
    family = rng.randrange(4)
    if family == 0:  # plain
        return body, body
    if family == 1:  # duplicate title (a name variation, level 1-3)
        variation = rng.choice((
            section_name,
            section_name.replace("_", " "),
            section_name.replace("_", " ").title(),
        ))
        level = 1 + rng.randrange(3)
        return f"{'#' * level} {variation}\n{body}", body
    if family == 2:  # LLM-style leading heading
        return f"## Summary of Document\n\n{body}", body
    # family 3: citations + References block
    n_cites = 1 + rng.randrange(2)
    clean_sec = formatted.replace(" ", "-")
    raw_inline, golden_inline, raw_refs, golden_refs = [], [], [], []
    for n in range(1, n_cites + 1):
        page = 1 + rng.randrange(9)
        src = _words(rng, 3)
        raw_inline.append(f"[[Cite-{n}, Page-{page}]](#cite-{n}-page-{page})")
        golden_inline.append(
            f"[[{clean_sec}-Cite-{n}, Page-{page}]]"
            f"(#{clean_sec.lower()}-cite-{n}-page-{page})"
        )
        raw_refs.append(
            f'[Cite-{n}, Page-{page}]: <a id="cite-{n}-page-{page}"></a> {src}'
        )
        golden_refs.append(
            f"[{clean_sec}-Cite-{n}, Page-{page}]: "
            f'<a id="{clean_sec.lower()}-cite-{n}-page-{page}"></a> {src}'
        )
    raw = (f"{body} {' '.join(raw_inline)}\n\nReferences\n"
           + "\n".join(raw_refs))
    golden = (f"{body} {' '.join(golden_inline)}\n\nReferences for {formatted}\n"
              + "\n".join(golden_refs))
    return raw, golden


def gen_summary_doc(i: int) -> dict:
    rng = random.Random(f"summd-{i}-42")
    n_sections = 1 + rng.randrange(3)
    section_rows = []
    cleaned: list[tuple[str, str]] = []  # (formatted name, clean content)
    for s in range(1, n_sections + 1):
        classification = rng.choice(CLASSES)
        raw, clean = _gen_section(rng, str(s), classification)
        section_rows.append(
            {"doc_id": i, "section_id": str(s),
             "classification": classification, "content": raw}
        )
        name = (classification or f"section_{s}").replace("_", " ").replace("-", " ").title()
        cleaned.append((name, clean))

    # golden assembly — the frozen combined-document layout
    for k in range(len(cleaned)):
        name, content = cleaned[k]
        content += "\n\n[Back to Top](#table-of-contents)\n"
        if k < len(cleaned) - 1:
            content += "\n\n---\n\n"
        cleaned[k] = (name, content)
    toc_lines = ["# Table of Contents\n"]
    for k, (name, _) in enumerate(cleaned, 1):
        toc_lines.append(f"{k}. [{name}](#{k}-{_anchor(name)})")
    parts = ["# Document Summary\n\n", "\n".join(toc_lines), "\n\n"]
    for k, (name, content) in enumerate(cleaned, 1):
        parts.append(f'## {k}. {name} <a id="{k}-{_anchor(name)}"></a>\n\n{content}')
        parts.append("\n\n")
    return {"sections": section_rows, "doc_id": i,
            "summary_markdown": "".join(parts)}


def summary_tables(n: int) -> dict[str, list[dict]]:
    sec_rows, golden_rows = [], []
    for i in range(n):
        d = gen_summary_doc(i)
        sec_rows.extend(d["sections"])
        golden_rows.append(
            {"doc_id": d["doc_id"], "summary_markdown": d["summary_markdown"]}
        )
    return {"summary_sections": sec_rows, "golden_summary_markdown": golden_rows}
