"""Text analysis kernels: language ID, quality scoring, token counting.

Deterministic heuristics designed to be expressible BOTH here (pure Python,
for pandas-UDF paths and tests) and as native Spark SQL expressions
(operators/textstats.py) so the DuckDB oracle can verify them. Specs are
frozen; any change must update both implementations and the oracle SQL.
"""

from __future__ import annotations

import re

# frozen marker-word lists for the language-ID heuristic (stopword-hit
# counting; the classic cheap n-gram/function-word approach).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "es", "una", "que"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # tie-break priority

STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "it", "that", "for")

_BPE_ISH_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def whitespace_tokens(text: str) -> list[str]:
    return text.split()


def token_count(text: str) -> int:
    return len(text.split())


def bpe_ish_token_count(text: str) -> int:
    """Regex token count: letter runs, digit runs, single punctuation marks —
    a deterministic BPE-ish proxy."""
    return len(_BPE_ISH_RE.findall(text))


def stopword_ratio(text: str) -> float:
    toks = [t.lower() for t in text.split()]
    if not toks:
        return 0.0
    hits = sum(1 for t in toks if t in STOPWORDS)
    return hits / len(toks)


def punct_ratio(text: str) -> float:
    if not text:
        return 0.0
    punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    return punct / len(text)


def mean_word_len(text: str) -> float:
    toks = text.split()
    if not toks:
        return 0.0
    return sum(len(t) for t in toks) / len(toks)


def quality_score(text: str) -> float:
    """Composite quality in [0,1]:
    0.4 * length_component (min(n_tokens,256)/256)
    + 0.3 * (1 - min(punct_ratio*4, 1))
    + 0.3 * min(stopword_ratio*5, 1)
    Frozen spec — mirrored 1:1 in operators/textstats.py native SQL."""
    nt = token_count(text)
    length_c = min(nt, 256) / 256
    punct_c = 1.0 - min(punct_ratio(text) * 4.0, 1.0)
    stop_c = min(stopword_ratio(text) * 5.0, 1.0)
    return 0.4 * length_c + 0.3 * punct_c + 0.3 * stop_c


def detect_lang(text: str) -> str:
    """argmax over marker-word hit counts; ties -> LANG_ORDER priority;
    zero hits -> 'und'."""
    toks = [t.lower() for t in text.split()]
    best_lang, best_hits = "und", 0
    for lang in LANG_ORDER:
        markers = LANG_MARKERS[lang]
        hits = sum(1 for t in toks if t in markers)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang
