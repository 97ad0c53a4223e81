"""Gopher/C4-style repetition-and-quality signals — pure per-document kernel.

The curation signals large-scale LLM-data pipelines gate on BEFORE the
expensive near-dup stage (Gopher, Rae et al. 2021 §A1.1; C4, Raffel et
al. 2020 §2.2 — both public papers; no reference-repo analog, the
reference pipeline processes trusted business documents):

- duplicate_line_fraction: duplicate line instances / total lines;
- duplicate_line_char_fraction: characters inside those duplicate
  instances / total line characters;
- top{2,3,4}gram_char_fraction: characters covered by the most frequent
  word n-gram (count * len(gram)) / total text characters;
- dup{5,10}gram_char_fraction: fraction of characters covered by ANY
  occurrence of a duplicated n-gram (count >= 2), overlap-deduplicated
  by interval union over the space-normalized text (' '.join(words)) —
  Gopher's bounded-by-1 definition. The oracle reproduces the union
  with the standard running-max window sweep.

Counting is a single Counter pass per document — O(length), which is the
shape that survives 100k-token documents. (A shuffle-free native-Catalyst
encoding of "mode of n-grams within a row" needs O(L^2) higher-order
array scans per row; an explode + groupBy encoding shuffles every n-gram
of the corpus. Both lose at scale; an Arrow-batched linear kernel wins.)

All fractions are ratios of exact integers quantized by TRUNCATION to
6dp (floor(x * 1e6) / 1e6): round() is rounding-MODE-ambiguous across
engines on exact .5 ulps (Python bankers vs DuckDB half-away — a real
fixture doc landed on 13/128 = 0.1015625), while floor of the identical
IEEE product is engine-invariant. The DuckDB oracle mirrors the floor.

Tie-break contract for the "most frequent n-gram": maximize
(count, len(gram)); any remaining tie has identical char mass, so the
emitted fraction is tie-invariant (what the oracle relies on).
"""

from __future__ import annotations

import math
from collections import Counter

__all__ = ["repetition_signals", "trunc6", "REPETITION_COLS"]

REPETITION_COLS = (
    "dup_line_fraction",
    "dup_line_char_fraction",
    "top2gram_char_fraction",
    "top3gram_char_fraction",
    "top4gram_char_fraction",
    "dup5gram_char_fraction",
    "dup10gram_char_fraction",
)


def trunc6(x: float) -> float:
    """Engine-invariant 6dp quantization (see module docstring)."""
    return math.floor(x * 1e6) / 1e6


def _top_ngram_char_fraction(words: list[str], n: int, denom: int) -> float:
    """Char mass of the most frequent n-gram, 0.0 unless it actually
    REPEATS (count >= 2): a count-1 n-gram is not repetition, and counting
    it would make every short unique-text document look spammy."""
    if len(words) < n or denom == 0:
        return 0.0
    grams = Counter(
        " ".join(words[i:i + n]) for i in range(len(words) - n + 1)
    )
    repeated = [(c, len(g)) for g, c in grams.items() if c >= 2]
    if not repeated:
        return 0.0
    cnt, ln = max(repeated)
    return trunc6(cnt * ln / denom)


def _dup_ngram_char_fraction(words: list[str], n: int) -> float:
    """Union char coverage of duplicated n-grams over the normalized text
    (module docstring contract). Word starts are strictly increasing, so
    the interval sweep needs no same-start tie-break."""
    if len(words) < n:
        return 0.0
    norm_len = sum(len(w) for w in words) + len(words) - 1
    if norm_len <= 0:
        return 0.0
    starts: list[int] = []
    pos = 0
    for w in words:
        starts.append(pos)
        pos += len(w) + 1
    grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    counts = Counter(grams)
    covered = 0
    cur_end = -1
    for i, g in enumerate(grams):
        if counts[g] < 2:
            continue
        s, e = starts[i], starts[i] + len(g)
        if s > cur_end:
            covered += e - s
        elif e > cur_end:
            covered += e - cur_end
        cur_end = max(cur_end, e)
    return trunc6(covered / norm_len)


def repetition_signals(text: str) -> tuple[float, ...]:
    """One value per REPETITION_COLS entry, in order."""
    # explicit strip charset (space/tab/CR): Python str.strip() is
    # Unicode-aware but DuckDB trim() is not — pin the common subset so
    # the oracle's trim(line, ' ' || chr(9) || chr(13)) is identical
    lines = [ln.strip(" \t\r") for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    n_lines = len(lines)
    line_chars = sum(len(ln) for ln in lines)
    if n_lines:
        counts = Counter(lines)
        dup_frac = trunc6((n_lines - len(counts)) / n_lines)
        dup_chars = sum((c - 1) * len(ln) for ln, c in counts.items() if c > 1)
        dup_char_frac = trunc6(dup_chars / line_chars) if line_chars else 0.0
    else:
        dup_frac = dup_char_frac = 0.0
    words = text.lower().split()
    denom = len(text)
    return (
        dup_frac,
        dup_char_frac,
        _top_ngram_char_fraction(words, 2, denom),
        _top_ngram_char_fraction(words, 3, denom),
        _top_ngram_char_fraction(words, 4, denom),
        _dup_ngram_char_fraction(words, 5),
        _dup_ngram_char_fraction(words, 10),
    )


def compression_signals(text: str) -> tuple[int, int, int]:
    """(n_bytes, n_zlib, ratio_ppm) — the compression-ratio quality
    signal (CCNet/Gopher family): highly repetitive or templated junk
    compresses far below prose, so a LOW ratio_ppm flags it.

    zlib level 6 (the production default), utf-8 bytes; ratio is
    integer ppm (floor(n_zlib * 1e6 / n_bytes)) so the value is exact
    and order-free cross-engine — no float formatting hazards.  Empty
    text is (0, 0, 0): never divide, never emit the ~11-byte zlib
    header as if it measured content.
    """
    import zlib

    data = (text or "").encode("utf-8")
    if not data:
        return 0, 0, 0
    comp = len(zlib.compress(data, 6))
    return len(data), comp, comp * 1_000_000 // len(data)
