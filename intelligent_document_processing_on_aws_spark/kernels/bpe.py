"""Byte-pair-encoding tokenizer: training and encoding kernels.

The published algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the construction behind
GPT-2/RoBERTa tokenizers): start from characters, repeatedly merge the
most frequent adjacent symbol pair into a new symbol.

Key property exploited for scale: BPE training and encoding operate on
the WORD-FREQUENCY TABLE, not the corpus.  A 100-TB corpus has a
bounded distinct-word vocabulary; one Spark aggregation produces
(word, count), the merge loop runs on that small table, and encoding
cost is proportional to DISTINCT words (memoized), not corpus tokens.

Conventions (frozen so Spark, the DuckDB oracle, and tests agree):
- words are the corpus-wide tokenization convention: lowercase,
  whitespace split;
- a word's initial symbols are its characters, with the end-of-word
  marker ``</w>`` appended to the LAST character (Sennrich's scheme) —
  so merges cannot cross word boundaries and "low " and "low-" suffix
  contexts stay distinct;
- pair counting counts every adjacent position (overlaps included);
- each training step merges the (count-max, then lexicographically
  smallest (left, right)) pair; ties are therefore deterministic;
- a merge step rewrites every word with ALL left-to-right
  non-overlapping occurrences of the chosen pair merged;
- training stops after ``n_merges`` merges or when the best pair
  occurs fewer than ``min_count`` times.

Pure stdlib; deterministic; no Spark imports (shared by executors,
the driver, and the DuckDB-oracle builder).
"""

from __future__ import annotations

from collections import Counter

EOW = "</w>"


def word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence of a word: chars, last char + EOW."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] += EOW
    return tuple(chars)


def merge_symbols(
    symbols: tuple[str, ...], left: str, right: str
) -> tuple[str, ...]:
    """All left-to-right non-overlapping (left, right) -> left+right."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if (
            i + 1 < n
            and symbols[i] == left
            and symbols[i + 1] == right
        ):
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_merges(
    word_counts: dict[str, int],
    n_merges: int,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to n_merges BPE merges from a word-frequency table."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in word_counts.items():
        syms = word_symbols(word)
        if syms:
            vocab[syms] = vocab.get(syms, 0) + int(cnt)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_count:
            break
        merges.append(best)
        vocab = {
            merge_symbols(syms, *best): cnt for syms, cnt in vocab.items()
        }
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Encode one word: repeatedly apply the lowest-rank applicable
    merge until none applies (Sennrich's apply_bpe loop)."""
    syms = word_symbols(word)
    while len(syms) > 1:
        best = None
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (a, b), r
        if best is None:
            break
        syms = merge_symbols(syms, *best)
    return syms


def make_ranks(
    merges: list[tuple[str, str]]
) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def top_words(word_counts: dict[str, int], max_words: int) -> dict[str, int]:
    """Deterministic vocabulary cap: top max_words by (count desc,
    word asc) — the skew guard for adversarial vocabularies."""
    if len(word_counts) <= max_words:
        return dict(word_counts)
    ordered = sorted(word_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return dict(ordered[:max_words])
