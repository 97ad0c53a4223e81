"""Criteria validation: documents judged against dynamic business rules.

The reference's CriteriaValidationService (criteria_validation/service.py)
chunks each document's text with overlap, asks an LLM every configured
criteria question per chunk, then LLM-summarizes the per-chunk responses
into one decision per question from the recommendation options
(Pass / Fail / Information Not Found — service.py:244-301). Per the north
star the LLM judgments become deterministic rules, keeping the service's
orchestration shape exactly:

- chunking math is byte-parity with ``_chunk_text_with_overlap``
  (service.py:81-126): single chunk iff ``len(text) // token_size <=
  max_chunk_size``, else fixed-width char windows of ``max_chunk_size *
  token_size`` advancing by ``chunk - overlap`` where overlap is
  ``int(chunk * pct / 100)``. One deviation, documented: the reference's
  loop fails to terminate once ``end`` clamps to ``len(text)`` with a
  nonzero overlap (start = len-overlap < len forever); we emit exactly the
  chunks it produces up to and including the first clamped window and stop
  there. The pure twin is :func:`chunk_text_with_overlap`.
- per-chunk judgment: a criteria row carries regex predicates —
  ``pass_pattern`` (decision Pass when matched) and optional
  ``fail_pattern`` (Fail when matched and pass absent); neither matching
  is Information Not Found, the reference's unparseable/absent default.
- cross-chunk summary (the ``_summarize_responses`` role,
  service.py:364-430): any chunk Pass -> Pass, else any Fail -> Fail,
  else Information Not Found.

Everything is native Catalyst: the chunk windows are a ``sequence`` +
``transform``/``substr`` over the text column (no exploded text copies
leave the expression), predicates are ``regexp_like`` with the pattern
from the broadcast criteria dim, and the summary is two ``exists`` folds.
Zero Python, zero shuffle beyond the broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECISION_PASS = "Pass"
DECISION_FAIL = "Fail"
DECISION_NOT_FOUND = "Information Not Found"

DEFAULT_MAX_CHUNK_SIZE = 10000  # tokens (service.py:71-73)
DEFAULT_TOKEN_SIZE = 4          # chars/token (service.py:74-76)
DEFAULT_OVERLAP_PCT = 10        # % of chunk (service.py:77-79)


def chunk_text_with_overlap(
    text: str,
    max_chunk_size: int = DEFAULT_MAX_CHUNK_SIZE,
    token_size: int = DEFAULT_TOKEN_SIZE,
    overlap_percentage: int = DEFAULT_OVERLAP_PCT,
) -> list[str]:
    """Pure twin of the reference chunker (service.py:81-126) with the
    termination fix described in the module docstring."""
    if not 0 <= overlap_percentage < 100:
        raise ValueError("overlap_percentage must be in [0, 100)")
    if len(text) // token_size <= max_chunk_size:
        return [text]
    chunk_chars = max_chunk_size * token_size
    overlap = int(chunk_chars * (overlap_percentage / 100))
    chunks = []
    start = 0
    while start < len(text):
        end = min(start + chunk_chars, len(text))
        chunks.append(text[start:end])
        if end == len(text):
            break
        start = end - overlap
    return chunks


def _chunks_col(
    text,
    max_chunk_size: int,
    token_size: int,
    overlap_percentage: int,
):
    """array<string> of chunk windows, same boundaries as the pure twin.
    The single-chunk branch returns the text UNCUT: the token estimate
    (len // token_size <= max) can admit texts up to token_size-1 chars
    longer than the char window, and the reference keeps them whole."""
    if not 0 <= overlap_percentage < 100:
        raise ValueError("overlap_percentage must be in [0, 100)")
    chunk = max_chunk_size * token_size
    step = chunk - int(chunk * (overlap_percentage / 100))
    n = F.length(text)
    # last window index: first k with k*step + chunk >= len
    last_k = F.ceil((n - F.lit(chunk)) / F.lit(float(step))).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(last_k, F.lit(0))),
        lambda k: text.substr(k * step + 1, F.lit(chunk)),
    )
    return F.when(
        (n / F.lit(token_size)).cast("long") <= max_chunk_size, F.array(text)
    ).otherwise(windows)


def validate_criteria(
    docs: DataFrame,
    criteria: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chunk_size: int = DEFAULT_MAX_CHUNK_SIZE,
    token_size: int = DEFAULT_TOKEN_SIZE,
    overlap_percentage: int = DEFAULT_OVERLAP_PCT,
) -> DataFrame:
    """docs (id_col, text_col) x criteria (criteria_type, question_id,
    pass_pattern, fail_pattern nullable) -> one decision row per
    (doc, question): (id_col, criteria_type, question_id, decision,
    n_chunks)."""
    chunks = _chunks_col(
        F.col(text_col), max_chunk_size, token_size, overlap_percentage
    )
    joined = docs.select(id_col, chunks.alias("chunks")).crossJoin(
        F.broadcast(criteria)
    )
    any_pass = F.exists("chunks", lambda c: F.regexp_like(c, F.col("pass_pattern")))
    any_fail = F.when(F.col("fail_pattern").isNull(), F.lit(False)).otherwise(
        F.exists("chunks", lambda c: F.regexp_like(c, F.col("fail_pattern")))
    )
    decision = (
        F.when(any_pass, F.lit(DECISION_PASS))
        .when(any_fail, F.lit(DECISION_FAIL))
        .otherwise(F.lit(DECISION_NOT_FOUND))
    )
    return joined.select(
        id_col,
        "criteria_type",
        "question_id",
        decision.alias("decision"),
        F.size("chunks").cast("long").alias("n_chunks"),
    )
