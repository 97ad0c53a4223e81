"""Sentence segmentation + sentence-aware chunking.

Training-data pipelines chunk documents into model-context windows; a
chunker that cuts mid-sentence degrades the training signal, so the
standard shape is segment-then-pack (greedy fill of a token budget at
sentence granularity). The reference paginates by page boundaries only
(pagination //7,//16 rules); this adds the linguistic boundary layer a
web corpus needs. From scratch, rule-based, deterministic — no nltk.

Segmentation spec (the fixture generator encodes the same spec as
composition facts; tests are differential against it):

- ``\\n\\n`` (a paragraph break, any horizontal whitespace between the
  newlines) is always a sentence boundary.
- A candidate boundary is a run of ``. ! ? …`` optionally followed by
  closing quotes/brackets (``" ' ” ’ ) ]``), then whitespace, then an
  opener: uppercase letter, digit, or opening quote/bracket/dash.
- A candidate ending in ``.`` is suppressed when the preceding token is
  a known non-terminal abbreviation (Mr., Dr., e.g., Jan., U.S., p.m.,
  ...) or a single-letter initial (``J.``) — mid-sentence "Dr. Smith"
  and "J. K. Rowling" never split. Decimal points (3.14) are not
  followed by whitespace, so they are never candidates.
- Sentences are emitted stripped; single newlines inside a paragraph
  act as plain whitespace.

Chunking spec: greedy in-order fill — a sentence is appended to the
open chunk unless that would push the chunk over ``max_tokens``
whitespace-tokens and the chunk already has content; an oversized
single sentence becomes its own chunk. Chunk text joins sentences with
a single space.

Scale shape: both passes are per-document string scans — map-only
Arrow stages, zero shuffles.
"""

from __future__ import annotations

import re

# Non-terminal abbreviations: a trailing "." after these never ends a
# sentence. Lowercased compare; "u.s." covers "U.S." etc.
ABBREV = frozenset(
    """mr mrs ms dr prof rev gen sen rep st jr sr vs etc e.g i.e cf al
    jan feb mar apr jun jul aug sep sept oct nov dec no fig eq sec ch
    pp vol inc ltd co corp dept est approx u.s u.k e.u a.m p.m""".split()
)

_CLOSERS = "\"'”’)]"
_OPENERS = "\"'“‘([—-"

# terminator run + optional closers, then the whitespace gap
_CAND_RE = re.compile(rf"[.!?…]+[{re.escape(_CLOSERS)}]*\s+")
_PARA_RE = re.compile(r"\n[ \t]*\n\s*")
_TOKEN_RE = re.compile(r"\S+")


def _last_token(text: str) -> str:
    m = _TOKEN_RE.findall(text[-40:])
    return m[-1] if m else ""


def _is_boundary(prev: str, nxt: str) -> bool:
    """Decide whether the candidate gap between prev-text and next-text
    is a real sentence boundary."""
    if not nxt:
        return True
    if not (nxt[0].isupper() or nxt[0].isdigit() or nxt[0] in _OPENERS):
        return False
    tok = _last_token(prev)
    # strip closing quotes/brackets off the token, keep its terminator
    tok = tok.rstrip(_CLOSERS)
    if not tok.endswith("."):
        return True  # ! ? … always terminate
    word = tok[:-1].rstrip(".")  # "e.g." -> "e.g" -> lowercase compare
    low = word.lower()
    if low in ABBREV and low != "etc":
        return False
    # single-letter initial: "J." — but "I." legitimately ends sentences
    # rarely; spec: any single alpha letter is an initial
    if len(word) == 1 and word.isalpha():
        return False
    return True


def split_sentences(text: str) -> list[str]:
    """Segment text into sentences per the module spec. Total: any
    input yields a (possibly empty) list; never raises."""
    out: list[str] = []
    for para in _PARA_RE.split(text or ""):
        if not para.strip():
            continue
        start = 0
        for m in _CAND_RE.finditer(para):
            if m.end() >= len(para):
                break
            if _is_boundary(para[start:m.start() + 1] + para[m.start():m.end()].rstrip(),
                            para[m.end():]):
                sent = " ".join(para[start:m.end()].split())
                if sent:
                    out.append(sent)
                start = m.end()
        tail = " ".join(para[start:].split())
        if tail:
            out.append(tail)
    return out


def n_tokens(sentence: str) -> int:
    return len(sentence.split())


def pack_chunks(sentences: list[str], max_tokens: int) -> list[dict]:
    """Greedy sentence-granular packing per the module spec. Returns
    [{chunk_id, n_sentences, n_tokens, text}]."""
    chunks: list[dict] = []
    cur: list[str] = []
    cur_tok = 0
    for s in sentences:
        t = n_tokens(s)
        if cur and cur_tok + t > max_tokens:
            chunks.append({"chunk_id": len(chunks), "n_sentences": len(cur),
                           "n_tokens": cur_tok, "text": " ".join(cur)})
            cur, cur_tok = [], 0
        cur.append(s)
        cur_tok += t
    if cur:
        chunks.append({"chunk_id": len(chunks), "n_sentences": len(cur),
                       "n_tokens": cur_tok, "text": " ".join(cur)})
    return chunks
