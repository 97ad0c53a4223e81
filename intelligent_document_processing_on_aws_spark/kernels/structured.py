"""YAML/JSON structured-output rescue (reference parity).

Pure mirrors of the reference's format-autodetect ladder
(lib/idp_common_pkg/idp_common/utils/__init__.py:277-621), used there to
parse LLM classification/extraction responses that may arrive as fenced
YAML, fenced JSON, bare documents, or prose-wrapped blocks:

- extract_yaml_from_text: 6-strategy ladder — ```yaml fence (hard return
  even when invalid, matching the reference's early-out), ```yml fence,
  generic ``` fence, --- document markers, >50% yaml-indicator lines,
  indented key-block regex; falls back to the original text.
- detect_format: 'json' | 'yaml' | 'unknown' with the reference's
  tie-break (JSON preferred when both parse; plain scalars are not
  "structured" YAML).
- extract_structured_data_from_text: parse with cross-format fallback.

yaml import is guarded: without PyYAML the functions degrade exactly like
the reference (yaml is None branches).
"""

from __future__ import annotations

import json
import re
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover — PyYAML ships with pyspark here
    yaml = None

from .textnorm import extract_json_from_text

_YAML_INDICATORS = (
    re.compile(r"^\s*\w+\s*:"),  # key: value
    re.compile(r"^\s*-\s+\w+"),  # list item
    re.compile(r"^\s*-\s*$"),    # empty list item
)

_YAML_BLOCK_RE = re.compile(
    r"(?:^|\n)(\w+\s*:(?:\s*\n(?:\s{2,}.*\n?)*|\s*.*(?:\n|$))"
    r"(?:\w+\s*:(?:\s*\n(?:\s{2,}.*\n?)*|\s*.*(?:\n|$)))*)",
    re.MULTILINE,
)


def _valid_yaml(s: str) -> bool:
    try:
        yaml.safe_load(s)
        return True
    except yaml.YAMLError:
        return False


def extract_yaml_from_text(text: str) -> str:
    """Extract a YAML string from response text; returns the original text
    when no strategy yields valid YAML (utils/__init__.py:277-421)."""
    if yaml is None or not text:
        return text

    # strategies 1-3 are an if/elif chain in the reference: a ```yaml tag
    # that fails to parse returns the ORIGINAL text immediately
    if "```yaml" in text:
        start = text.find("```yaml") + len("```yaml")
        end = text.find("```", start)
        if end > start:
            candidate = text[start:end].strip()
            return candidate if _valid_yaml(candidate) else text
    elif "```yml" in text:
        start = text.find("```yml") + len("```yml")
        end = text.find("```", start)
        if end > start:
            candidate = text[start:end].strip()
            if _valid_yaml(candidate):
                return candidate
    elif "```" in text:
        start = text.find("```") + len("```")
        end = text.find("```", start)
        if end > start:
            candidate = text[start:end].strip()
            if _valid_yaml(candidate):
                return candidate

    if "---" in text:
        start = text.find("---")
        end = text.find("---", start + 3)
        candidate = (text[start:end] if end != -1 else text[start:]).strip()
        if _valid_yaml(candidate):
            return candidate

    lines = text.split("\n")
    non_empty = [ln for ln in lines if ln.strip()]
    yaml_like = sum(
        1 for ln in non_empty if any(p.match(ln) for p in _YAML_INDICATORS)
    )
    if len(non_empty) >= 2 and yaml_like / len(non_empty) > 0.5:
        if _valid_yaml(text):
            return text

    for match in _YAML_BLOCK_RE.findall(text):
        if _valid_yaml(match):
            return match.strip()

    return text


def detect_format(text: str) -> str:
    """'json' | 'yaml' | 'unknown' (utils/__init__.py:424-507 ladder)."""
    if not text or not text.strip():
        return "unknown"
    text = text.strip()
    lowered = text.lower()
    if "```json" in lowered:
        return "json"
    if "```yaml" in lowered or "```yml" in lowered:
        return "yaml"
    if text.startswith("---"):
        return "yaml"
    if (text.startswith("{") and text.endswith("}")) or (
        text.startswith("[") and text.endswith("]")
    ):
        try:
            json.loads(text)
            return "json"
        except json.JSONDecodeError:
            pass
    if yaml is not None:
        for pattern in (r"^\s*\w+\s*:", r"^\s*-\s+", r":\s*\n\s+"):
            if re.search(pattern, text, re.MULTILINE):
                if _valid_yaml(text):
                    return "yaml"
                break
    json_works = False
    yaml_works = False
    try:
        json.loads(text)
        json_works = True
    except (json.JSONDecodeError, TypeError):
        pass
    if yaml is not None:
        try:
            parsed = yaml.safe_load(text)
            # plain scalars are not structured YAML
            yaml_works = isinstance(parsed, (dict, list))
        except yaml.YAMLError:
            pass
    if json_works:
        return "json"  # JSON preferred when both parse
    if yaml_works:
        return "yaml"
    return "unknown"


def extract_structured_data_from_text(
    text: str, preferred_format: str = "auto"
) -> tuple[Any, str]:
    """(parsed_data, format) with cross-format fallback
    (utils/__init__.py:510-621). Returns (text, 'unknown') when nothing
    parses."""
    if not text:
        return text, "unknown"
    fmt = detect_format(text) if preferred_format == "auto" else preferred_format.lower()
    if fmt == "json":
        parsed = extract_json_from_text(text)
        if parsed is not None:
            return parsed, "json"
        if yaml is not None:  # reference falls back JSON -> YAML
            try:
                data = yaml.safe_load(extract_yaml_from_text(text))
                if isinstance(data, (dict, list)):
                    return data, "yaml"
            except yaml.YAMLError:
                pass
        return text, "unknown"
    if fmt == "yaml" and yaml is not None:
        try:
            data = yaml.safe_load(extract_yaml_from_text(text))
            if isinstance(data, (dict, list)):
                return data, "yaml"
        except yaml.YAMLError:
            pass
        parsed = extract_json_from_text(text)  # reference falls back YAML -> JSON
        if parsed is not None:
            return parsed, "json"
        return text, "unknown"
    parsed = extract_json_from_text(text)
    if parsed is not None:
        return parsed, "json"
    return text, "unknown"
