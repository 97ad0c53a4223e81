"""Document-summary markdown formatter (reference parity).

Pure mirror of the reference's SummaryMarkdownFormatter
(lib/idp_common_pkg/idp_common/summarization/markdown_formatter.py:15-418),
the piece that assembles per-section summaries into one navigable document:

- format_section_name (:181-196): underscores/hyphens -> spaces, Title Case;
- create_anchor_link (:197-213): GitHub-style lowercase-hyphen anchors;
- remove_existing_title (:114-180): strip a leading heading matching any
  section-name variation (levels 1-3), then strip any remaining leading
  LLM-style heading;
- process_citations (:215-277): prefix inline citations
  ``[[Cite-N, Page-M]](#cite-n-page-m)`` and the References block's entries
  and ``<a id=...>`` anchors with the section name so per-section citation
  ids stay unique after combining;
- format_document_summary (:37-92, :279-417): title + optional TOC +
  numbered ``## i. Name <a id="i-anchor"></a>`` sections with back-to-top
  links and ``---`` separators.

String-in/string-out so the Spark operator applies it per document inside
an Arrow batch and tests pin each behavior in isolation.
"""

from __future__ import annotations

import re

_HEADING_RE = re.compile(r"^#{1,3}\s+.*$")
_INLINE_CITE_RE = re.compile(r"\[\[Cite-(\d+), Page-(\d+)\]\]\(#cite-\1-page-\2\)")
_REF_ENTRY_RE = re.compile(r"\[Cite-(\d+), Page-(\d+)\]:")
_REF_ANCHOR_RE = re.compile(r'<a id="cite-(\d+)-page-(\d+)"></a>')


def format_section_name(section_name: str) -> str:
    return section_name.replace("_", " ").replace("-", " ").title()


def create_anchor_link(text: str) -> str:
    anchor = text.lower().replace(" ", "-")
    return re.sub(r"[^a-z0-9-]", "", anchor)


def remove_existing_title(content: str, section_name: str) -> str:
    """Strip a leading duplicate/LLM-generated heading (formatter :114-180)."""
    if not content:
        return content
    variations = [
        section_name,
        section_name.replace("_", " "),
        section_name.replace("-", " "),
        section_name.title(),
        section_name.replace("_", " ").title(),
        section_name.replace("-", " ").title(),
    ]
    for variation in variations:
        done = False
        for level in range(1, 4):
            if content.lstrip().startswith(f"{'#' * level} {variation}"):
                # FAITHFUL QUIRK: the reference matches against
                # content.lstrip() but splits the ORIGINAL string at its
                # first newline (formatter :176-184), so content with a
                # LEADING newline only loses that blank line here and the
                # title falls through to the generic-heading strip below.
                # Kept byte-identical; pinned by
                # test_remove_title_leading_newline_quirk.
                parts = content.split("\n", 1)
                content = parts[1].lstrip() if len(parts) > 1 else ""
                done = True
                break
        if done:
            break
    # any remaining leading markdown heading (e.g. "## Summary of Document")
    lines = content.lstrip().split("\n", 1)
    if lines and _HEADING_RE.match(lines[0]):
        content = lines[1].lstrip() if len(lines) > 1 else ""
    return content


def process_citations(content: str, section_name: str) -> str:
    """Prefix citation ids/anchors with the section name (formatter :215-277)."""
    if not content or "[[Cite-" not in content:
        return content
    clean = section_name.replace(" ", "-")
    content = _INLINE_CITE_RE.sub(
        f"[[{clean}-Cite-\\1, Page-\\2]](#{clean.lower()}-cite-\\1-page-\\2)",
        content,
    )
    content = re.sub(r"\nReferences\n", f"\nReferences for {section_name}\n", content)
    blocks = content.split("\n\n")
    for i, block in enumerate(blocks):
        if block.strip().startswith("References") or block.strip().startswith("[Cite-"):
            block = _REF_ENTRY_RE.sub(f"[{clean}-Cite-\\1, Page-\\2]:", block)
            block = _REF_ANCHOR_RE.sub(
                f'<a id="{clean.lower()}-cite-\\1-page-\\2"></a>', block
            )
            blocks[i] = block
    return "\n\n".join(blocks)


def format_document_summary(
    sections: list[tuple[str, str | None, str]], include_toc: bool = True
) -> str:
    """[(section_id, classification, content)] in document order -> one
    combined markdown document (formatter :37-92 pipeline + :279-417
    navigation/separators/TOC/combine)."""
    formatted: list[dict] = []
    for section_id, classification, content in sections:
        section_name = classification or f"section_{section_id}"
        name = format_section_name(section_name)
        content = remove_existing_title(content or "", section_name)
        content = process_citations(content, name)
        formatted.append({"name": name, "content": content})

    for i, sec in enumerate(formatted):  # navigation aids
        if include_toc:
            sec["content"] += "\n\n[Back to Top](#table-of-contents)\n"
        if i < len(formatted) - 1:  # separators (after nav, not on last)
            sec["content"] += "\n\n---\n\n"

    toc = ""
    if include_toc:
        toc_lines = ["# Table of Contents\n"]
        for i, sec in enumerate(formatted, 1):
            anchor = f"{i}-{create_anchor_link(sec['name'])}"
            toc_lines.append(f"{i}. [{sec['name']}](#{anchor})")
        toc = "\n".join(toc_lines)

    md_parts = ["# Document Summary\n\n"]
    if toc:
        md_parts.append(toc)
        md_parts.append("\n\n")
    for i, sec in enumerate(formatted, 1):
        anchor = f"{i}-{create_anchor_link(sec['name'])}"
        md_parts.append(f'## {i}. {sec["name"]} <a id="{anchor}"></a>\n\n{sec["content"]}')
        md_parts.append("\n\n")
    return "".join(md_parts)
