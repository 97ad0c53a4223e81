"""Distributed BPE tokenization: corpus-trained merges, vocab-bounded
encode, exact subword token counts.

Spark-first decomposition of kernels/bpe.py for a 100-TB corpus:

- **train**: one hash aggregation produces the (word, count) table —
  the ONLY pass over the corpus.  The merge loop needs the whole
  frequency table at once (each merge changes the next pair counts), so
  the table is capped to a deterministic top-``max_words`` vocabulary
  (count desc, word asc — kernels/bpe.top_words) and collected; the cap
  bounds the driver transfer the way DEFAULT_MAX_BUCKET bounds LSH
  buckets.  Training itself is the pure kernel — bit-identical whether
  fed from Spark, pyarrow (the DuckDB-oracle builder), or a test dict.
- **encode**: cost is proportional to DISTINCT words, not corpus
  tokens: the distinct-word table goes through one Arrow
  ``mapInPandas`` (memoized per batch), and the encodings join back to
  the (doc, pos, word) explosion — an equi-join on the word key that
  AQE broadcasts when the vocabulary is small.  Document token
  sequences are rebuilt order-exactly with a native
  sort_array(collect_list(struct(pos, ...))) + flatten, so the output
  is deterministic under any partitioning.

Published construction: Sennrich et al. 2016 (see kernels/bpe.py).
Reference scope note: the reference (GenAIIDP) counts tokens only via
its LLM clients; a trainable tokenizer is part of the beyond-reference
training-data operator set required by the task brief.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.bpe import EOW, encode_word, make_ranks, top_words, train_merges

DEFAULT_MAX_WORDS = 50_000


def _token_array(col):
    """Corpus tokenization convention: lowercase, whitespace split,
    NULL-safe (NULL text tokenizes as empty)."""
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"),
        lambda t: t != "",
    )


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The (word, count) frequency table — one explode + hash agg with
    map-side partial aggregation; the single corpus pass training needs."""
    return (
        docs.select(
            F.explode(_token_array(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 200,
    max_words: int = DEFAULT_MAX_WORDS,
    min_count: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn BPE merges from the corpus.

    The collect is bounded by ``max_words`` rows of (word, count) —
    a deliberate, documented driver transfer (the frequency table is
    the training input; there is no distributed formulation of the
    sequential merge loop that changes this, only ones that hide it).
    """
    top = (
        word_counts(docs, text_col)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(int(max_words))
        .collect()
    )
    counts = {r["word"]: r["count"] for r in top}
    # top_words re-applies the cap so Spark-fed and dict-fed training
    # agree even when the caller pre-truncated differently
    return train_merges(
        top_words(counts, max_words), n_merges, min_count=min_count
    )


def encode_distinct_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Arrow-batched encode of a distinct-word table ->
    (word, subtokens array<string>, n_subtokens)."""
    ranks = make_ranks(merges)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[str, ...]] = {}
        for pdf in batches:
            subs = []
            for w in pdf["word"]:
                w = w or ""
                got = memo.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    memo[w] = got
                subs.append(list(got))
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subtokens": subs,
                    "n_subtokens": [len(s) for s in subs],
                }
            )

    return words.mapInPandas(
        run, "word string, subtokens array<string>, n_subtokens int"
    )


def bpe_decode(encoded: DataFrame, bpe_col: str = "bpe_text"):
    """Native-columnar inverse of bpe_encode's bpe_text: drop the
    inter-subtoken spaces, turn each ``</w>`` end-of-word marker back
    into a word boundary, trim the trailing one.

    Exact inverse of encode up to the corpus tokenization convention:
    ``bpe_decode(bpe_encode(text)) == ' '.join(tokens(text))`` (the
    lowercased single-space-joined word sequence) for any corpus whose
    words cannot contain the literal marker string — guaranteed here
    because words are whitespace-split and the marker is only ever
    introduced by word_symbols.  Returns a Column; zero Python, zero
    shuffles — composes into whatever plan the caller is building.
    """
    joined = F.replace(F.col(bpe_col), F.lit(" "), F.lit(""))
    return F.rtrim(F.replace(joined, F.lit(EOW), F.lit(" ")))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document: (doc_id, n_words, n_bpe, bpe_text).

    bpe_text is the space-joined subword sequence (with ``</w>``
    markers), byte-stable under any partitioning.  Empty/NULL documents
    come back with zero counts and an empty string.
    """
    toks = _token_array(F.col(text_col))
    base = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.size(toks).alias("n_words"),
    )
    words = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "word"),
    )
    enc = encode_distinct_words(words.select("word").distinct(), merges)
    rebuilt = (
        words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "subtokens"))
                    ),
                    lambda s: s["subtokens"],
                )
            ).alias("bpe_tokens")
        )
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce(F.size("bpe_tokens"), F.lit(0)).alias("n_bpe"),
            F.coalesce(
                F.array_join("bpe_tokens", " "), F.lit("")
            ).alias("bpe_text"),
        )
    )
