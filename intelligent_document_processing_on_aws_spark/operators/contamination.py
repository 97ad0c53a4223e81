"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

The standard published recipe (GPT-3 Appendix C, Brown et al. 2020;
PaLM §8, Chowdhery et al. 2022): a training document is *contaminated*
if it shares at least one n-token n-gram (n=13 in GPT-3) with any
document in the held-out evaluation set.  Contaminated documents are
dropped (or the spans masked) before training so benchmark scores
measure generalization, not memorization.

Spark-first shape, sized for a 100-TB corpus vs a small eval set:

- the EVAL side is tiny (benchmarks are thousands of prompts, not
  terabytes): its distinct n-gram keys are **broadcast**, so the corpus
  side never shuffles for the match — the explode + semi-join happens
  map-side inside the scan stage;
- corpus n-gram windows are generated with a native ``transform`` over
  the token array (zero Python, stays in whole-stage codegen);
- matches are hashed to 64-bit keys (``xxhash64``) so the broadcast
  table and the join keys are 8 bytes per gram, not the gram text;
  distinct-gram collision probability ~2^-64/pair is the documented
  boundary (same convention as operators/dedup.substring_span_dedup);
- the only shuffle is the final per-document hit aggregation, keyed on
  doc_id — perfectly distributed, no skew possible (a doc's windows are
  bounded by its own length).

Tokenization is the corpus-wide frozen convention of the dedup
operators (lowercase, whitespace split — kernels/fingerprint.tokens_of),
so decontamination and span-dedup agree on token positions.

Reference scope note: the reference (GenAIIDP) has no decontamination
stage — this module is part of the beyond-reference training-data
operator set required by the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N = 13


def _token_array(col):
    """Lowercase whitespace tokens as a native array column.

    NULL text tokenizes as empty (a NULL must not poison the whole
    Arrow/codegen stage — the round-4 quality-operator lesson).
    """
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"),
        lambda t: t != "",
    )


def _gram_windows(tok_col, n: int):
    """All n-token windows of a token array, joined with single spaces.

    Native ``transform`` over a 0..len-n index sequence — no explode yet,
    no Python.  Empty when the document has fewer than n tokens (the
    GPT-3 rule matches full n-grams only; shorter docs cannot collide).

    ``tok_col`` MUST be an already-staged named column: an interpreted
    higher-order lambda re-evaluates the expressions it closes over per
    ELEMENT, so passing the raw split/filter tree makes every window
    re-tokenize the document — O(L^2), measured ~4x slower at sf0.1
    (the operators/dsir staging discipline).
    """
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok_col) - n),
            lambda i: F.array_join(F.slice(tok_col, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_gram_keys(evals: DataFrame, n: int = DEFAULT_N,
                   id_col: str = "eval_id",
                   text_col: str = "text") -> DataFrame:
    """Distinct (gram_key, eval_id) pairs of the evaluation set.

    Output is small by construction (the eval set is small); callers
    broadcast it.  gram_key = xxhash64 of the gram text.
    """
    return (
        evals.select(
            F.col(id_col).alias("eval_id"),
            _token_array(F.col(text_col)).alias("__toks"),
        )
        .select(
            "eval_id",
            F.explode(_gram_windows(F.col("__toks"), n)).alias("gram"),
        )
        .select("eval_id", F.xxhash64("gram").alias("gram_key"))
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    evals: DataFrame,
    n: int = DEFAULT_N,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination report.

    Returns one row per corpus document:
      doc_id, n_windows (n-gram windows in the doc),
      n_hit_grams (distinct doc windows found in the eval set),
      n_eval_ids (distinct eval documents hit),
      contaminated (n_hit_grams > 0).

    Clean documents appear with zero counts, so the output is a total
    function of the corpus (drop-or-keep decisions join back trivially).
    """
    staged = corpus.select(
        F.col(doc_id_col).alias("doc_id"),
        _token_array(F.col(text_col)).alias("__toks"),
    )
    doc_grams = staged.select(
        "doc_id",
        F.explode(_gram_windows(F.col("__toks"), n)).alias("gram"),
    ).select("doc_id", F.xxhash64("gram").alias("gram_key"))

    hits = doc_grams.join(
        F.broadcast(eval_gram_keys(evals, n)), "gram_key", "inner"
    )
    per_doc_hits = hits.groupBy("doc_id").agg(
        F.count_distinct("gram_key").alias("n_hit_grams"),
        F.count_distinct("eval_id").alias("n_eval_ids"),
    )
    base = staged.select(
        "doc_id",
        F.greatest(
            F.size(F.col("__toks")) - F.lit(n - 1), F.lit(0)
        ).alias("n_windows"),
    )
    return (
        base.join(per_doc_hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            F.coalesce("n_eval_ids", F.lit(0)).alias("n_eval_ids"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    evals: DataFrame,
    n: int = DEFAULT_N,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus minus contaminated documents (GPT-3 drop rule).

    Same broadcast-semi-join shape as contamination_report but keeps the
    corpus row intact; the semi join never widens the corpus rows.
    """
    doc_grams = corpus.select(
        F.col(doc_id_col).alias("__cid"),
        _token_array(F.col(text_col)).alias("__toks"),
    ).select(
        "__cid",
        F.explode(_gram_windows(F.col("__toks"), n)).alias("gram"),
    ).select("__cid", F.xxhash64("gram").alias("gram_key"))
    dirty = (
        doc_grams.join(
            F.broadcast(
                eval_gram_keys(evals, n).select("gram_key").distinct()
            ),
            "gram_key",
            "inner",
        )
        .select("__cid")
        .distinct()
    )
    return corpus.join(
        dirty, corpus[doc_id_col] == dirty["__cid"], "left_anti"
    )


def eval_gram_key_list(
    evals: DataFrame, n: int = DEFAULT_N
) -> list[int]:
    """The eval set's distinct gram keys as a plain list — a bounded
    collect (eval sets are small by definition; this is the same
    boundedness argument as broadcast in contamination_report)."""
    return [
        r["gram_key"]
        for r in eval_gram_keys(evals, n).select("gram_key")
        .distinct().collect()
    ]


def decontaminate_stream(
    corpus: DataFrame,
    evals,
    n: int = DEFAULT_N,
    text_col: str = "text",
) -> DataFrame:
    """Streaming-compatible decontamination: a pure MAP-SIDE filter.

    The batch ``decontaminate`` derives its drop set from the corpus
    itself, which a stream cannot anti-join against (stream-stream
    anti joins are unsupported, and would need unbounded state anyway).
    Here the eval gram keys are collected ONCE into an array literal
    and each document checks ``arrays_overlap`` between its own native
    gram-key array and that literal — zero state, zero shuffle, append
    mode; also the cheapest batch shape when the eval set is tiny.

    ``evals`` is either an eval DataFrame or a pre-collected key list
    (so a long-running stream can reuse one collection).
    """
    keys = (
        evals if isinstance(evals, list) else eval_gram_key_list(evals, n)
    )
    if not keys:
        return corpus
    # NOTE on staging: the dsir/_gram_windows staging discipline does
    # NOT apply here — PushDownPredicates substitutes a deterministic
    # projected alias back into a filter predicate, so a staged token
    # column would be re-inlined into the lambda anyway (verified on
    # the optimized plan). The tokenizer therefore closes over the raw
    # expression; acceptable because this filter is the stream path's
    # one pass and its cost profile is unchanged from round 5.
    toks = _token_array(F.col(text_col))
    gram_keys = F.transform(
        _gram_windows(toks, n), lambda g: F.xxhash64(g)
    )
    return corpus.where(
        ~F.arrays_overlap(gram_keys, F.lit(keys).cast("array<bigint>"))
    )
