"""Scalar normalization + JSON-rescue functions (reference parity).

Pure-Python mirrors of the reference's scalar library so pandas-UDF code and
golden tests share one implementation:

- strip_punctuation_space: evaluation/comparator.py:86-101
- normalize_numeric:       evaluation/comparator.py:104-126
- normalize_boolean_value: utils/__init__.py:255-275
- convert_to_list:         evaluation/comparator.py:196-223
- extract_json_from_text:  utils/__init__.py:115-252 (fence + brace-match
  strategies)
- flatten_nested_data:     evaluation/service.py:194-230 (dot / [i] paths)
"""

from __future__ import annotations

import ast
import json
import re
from typing import Any

_PUNCT_RE = re.compile(r"[^\w\s]")
_WS_RE = re.compile(r"\s+")


def strip_punctuation_space(text: Any) -> str:
    if not isinstance(text, str):
        text = str(text)
    text = _PUNCT_RE.sub("", text)
    return _WS_RE.sub(" ", text).strip().lower()


def normalize_numeric(value: Any) -> float:
    if isinstance(value, (int, float)):
        return float(value)
    if not isinstance(value, str):
        value = str(value)
    value = (
        value.replace("$", "").replace(",", "").replace("(", "").replace(")", "")
    )
    try:
        return float(value)
    except (ValueError, TypeError):
        raise ValueError(f"Cannot convert {value} to numeric value")


_TRUTHY = {"true", "yes", "1", "y", "t"}
_FALSY = {"false", "no", "0", "n", "f"}


def normalize_boolean_value(value: Any) -> bool | None:
    if isinstance(value, bool):
        return value
    s = str(value).strip().lower()
    if s in _TRUTHY:
        return True
    if s in _FALSY:
        return False
    return None


def convert_to_list(value: Any) -> list[str]:
    """Exact mirror of evaluation/comparator.py:196-223: list items are
    stringified, a "[...]"-shaped string is literal_eval'd, and ANY other
    value — including empty and whitespace-only strings — becomes the
    single-element [str(value)] (the reference's 1x1 Hungarian path)."""
    if value is None:
        return []
    if isinstance(value, list):
        return [str(item) for item in value]
    if isinstance(value, str) and value.startswith("[") and value.endswith("]"):
        try:
            parsed = ast.literal_eval(value)
            if isinstance(parsed, list):
                return [str(item) for item in parsed]
        except (ValueError, SyntaxError):
            pass
    return [str(value)]


_JSON_FENCE_RE = re.compile(r"```json\s*(.*?)\s*```", re.DOTALL)
_ANY_FENCE_RE = re.compile(r"```\s*(.*?)\s*```", re.DOTALL)


def _match_braces(text: str) -> str | None:
    """Brace matching with string-escape awareness (utils/__init__.py parity)."""
    start = text.find("{")
    if start < 0:
        return None
    depth = 0
    in_str = False
    escape = False
    for i in range(start, len(text)):
        c = text[i]
        if in_str:
            if escape:
                escape = False
            elif c == "\\":
                escape = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return None


def extract_json_from_text(text: str) -> dict | None:
    """Multi-strategy JSON extraction: ```json fence, ``` fence, brace match."""
    if not text:
        return None
    for pattern in (_JSON_FENCE_RE, _ANY_FENCE_RE):
        m = pattern.search(text)
        if m:
            try:
                return json.loads(m.group(1))
            except json.JSONDecodeError:
                pass
    candidate = _match_braces(text)
    if candidate is not None:
        try:
            return json.loads(candidate)
        except json.JSONDecodeError:
            try:
                return json.loads(_WS_RE.sub(" ", candidate))
            except json.JSONDecodeError:
                return None
    return None


def flatten_nested_data(data: dict, parent_key: str = "") -> dict[str, Any]:
    """dicts -> `a.b`, lists -> `a[0].b` keys (evaluation/service.py:194-230)."""
    flattened: dict[str, Any] = {}
    for key, value in data.items():
        full_key = f"{parent_key}.{key}" if parent_key else key
        if isinstance(value, dict):
            flattened.update(flatten_nested_data(value, full_key))
        elif isinstance(value, list):
            for i, item in enumerate(value):
                if isinstance(item, dict):
                    flattened.update(flatten_nested_data(item, f"{full_key}[{i}]"))
                else:
                    flattened[f"{full_key}[{i}]"] = item
        else:
            flattened[full_key] = value
    return flattened


def flatten_confidence_scores(
    confidence_data: dict, parent_key: str = ""
) -> dict[str, dict[str, float | None]]:
    """explainability_info tree -> {path: {confidence, confidence_threshold}}
    (exact mirror of evaluation/service.py:232-274): a dict carrying a
    ``confidence`` key is a leaf assessment; other dicts recurse; list
    items recurse with ``[i]`` path segments; scalars are ignored."""
    flattened: dict[str, dict[str, float | None]] = {}
    for key, value in confidence_data.items():
        full_key = f"{parent_key}.{key}" if parent_key else key
        if isinstance(value, dict):
            if "confidence" in value:
                thr = value.get("confidence_threshold")
                flattened[full_key] = {
                    "confidence": float(value["confidence"]),
                    "confidence_threshold": float(thr) if thr is not None else None,
                }
            else:
                flattened.update(flatten_confidence_scores(value, full_key))
        elif isinstance(value, list):
            for i, item in enumerate(value):
                if isinstance(item, dict):
                    flattened.update(
                        flatten_confidence_scores(item, f"{full_key}[{i}]")
                    )
    return flattened


def load_extraction_payload(content: Any) -> tuple[dict, dict]:
    """(flat_results, flat_confidence) from one extraction-result document
    (evaluation/service.py:276-321 minus the S3 fetch): unwraps the
    ``inference_result`` envelope and flattens ``explainability_info[0]``."""
    if not isinstance(content, dict):
        return {}, {}
    raw = content.get("inference_result", content)
    results = flatten_nested_data(raw) if isinstance(raw, dict) else {}
    confidences: dict = {}
    info = content.get("explainability_info")
    if isinstance(info, list) and info and isinstance(info[0], dict):
        confidences = flatten_confidence_scores(info[0])
    return results, confidences


_INDEX_RE = re.compile(r"\[\d+\]")


def normalize_attr_pattern(path: str) -> str:
    """`Transactions[3].Amount` -> `Transactions[].Amount` for config lookup
    (evaluation/service.py:546-659 list-pattern matching analog)."""
    return _INDEX_RE.sub("[]", path)


def feature_combination_suffix(features: list[str] | None) -> str:
    """Pure twin of functions/scalars.feature_combination_suffix
    (reference ocr/service.py:500-536): Textract feature set -> the
    pricing suffix appended to the metering service_api key."""
    f = set(features or ())
    if "TABLES" in f and "FORMS" in f:
        return "-Tables+Forms"
    if "TABLES" in f:
        return "-Tables"
    if "FORMS" in f:
        return "-Forms"
    if "LAYOUT" in f:
        return "-Layout"
    if "SIGNATURES" in f:
        return "-Signatures"
    return ""


def token_limit_warning(
    document_text: str, extraction_results_str: str, configured_max_tokens: int | None
) -> str | None:
    """Reference utils/__init__.py:623-652 ``check_token_limit``: tokens are
    estimated as total chars / 4; returns the warning string when the
    configured budget is below the estimate, else None."""
    if not configured_max_tokens:
        return None
    estimated = (len(document_text) + len(extraction_results_str)) / 4
    if int(configured_max_tokens) < estimated:
        return (
            f"The max_tokens value of {configured_max_tokens} is too low "
            f"for this document."
        )
    return None


CLASS_LABEL_PATTERNS = (
    "class: ", "document type: ", "document class: ",
    "classification: ", "type: ",
)


def extract_class_from_text(text: str) -> str:
    """Classification-response fallback parser (reference
    classification/service.py:1432-1453 ``_extract_class_from_text``):
    patterns tried in fixed order, match located case-insensitively, the
    ORIGINAL-case value taken to end-of-line, stripped of whitespace and
    surrounding quotes; '' when nothing matches.

    One documented fix: the reference indexes into the original text with
    offsets computed on ``text.lower()``, which can change string length
    (e.g. 'İ'.lower() is two chars) and corrupt the slice; a
    case-insensitive regex search keeps indices aligned."""
    for pattern in CLASS_LABEL_PATTERNS:
        m = re.search(re.escape(pattern), text, re.IGNORECASE)
        if m:
            end = text.find("\n", m.end())
            if end == -1:
                end = len(text)
            return text[m.end():end].strip().strip("\"'")
    return ""


def convert_value_to_string(value: Any) -> str | None:
    """Reporting-layer robust stringification (reference
    reporting/save_reporting_data.py:163-189 ``_convert_value_to_string``):
    None passes through, bytes decode utf-8 with a hex fallback, lists and
    dicts serialize as JSON, datetimes as isoformat, everything else str()."""
    import datetime as _dt

    if value is None:
        return None
    if isinstance(value, bytes):
        try:
            return value.decode("utf-8")
        except UnicodeDecodeError:
            return value.hex()
    if isinstance(value, (list, dict)):
        return json.dumps(value)
    if isinstance(value, _dt.datetime):
        return value.isoformat()
    return str(value)


def flatten_for_reporting(data: dict, prefix: str = "") -> dict:
    """Reporting-layer flatten (reference save_reporting_data.py:191-221
    ``_flatten_json_data``): nested dicts dot-join, lists become JSON
    strings (None when empty), every scalar stringified via
    :func:`convert_value_to_string`. Distinct from the evaluation flatten
    (kernels attr-path flatten), which EXPLODES lists by index — the
    reporting tables keep lists opaque for Athena type stability."""
    flattened: dict = {}
    for key, value in data.items():
        new_key = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict) and value:
            flattened.update(flatten_for_reporting(value, new_key))
        elif isinstance(value, list):
            flattened[new_key] = json.dumps(value) if value else None
        else:
            flattened[new_key] = convert_value_to_string(value)
    return flattened
