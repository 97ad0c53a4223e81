"""fastText-style language classifier: bounded training, native inference.

The distributed half of kernels/ft_linear.py (see that module for the
published-architecture citation and the exact-integer scoring spec).
Shape for 100 TB:

* **Training** reads a deterministic bounded sample (`orderBy(doc_id)
  .limit(sample_n)` — a TakeOrdered, never a full sort) to the driver
  and fits the softmax weights with the pure numpy kernel. Same
  bounded-collect pattern as the IVF centroid build
  (operators/similarity.py) and the CCNet LM (operators/lm_filter.py).
* **Inference** is a single map-only projection of pure Catalyst
  higher-order-function expressions — `transform`/`aggregate` over the
  codepoint array with the quantized weights embedded as a folded
  array literal. Zero Python per row, zero shuffles, zero joins: the
  scoring pass scales exactly like the scan. (The reference repo
  classifies documents by calling Bedrock per document —
  classification/service.py — which is out of scope per the north
  star; this is the standard public-pipeline replacement.)

Exactness: per-class scores are exact int64 micro-unit sums (see
kernels/ft_linear.score_micro for the floor-division spelling shared
with the DuckDB oracle); `prob` is the softmax of those integers,
computed by both engines from identical doubles in identical sequential
order, rounded once to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernels.ft_linear import (
    DEFAULT_BUCKETS,
    MAX_CHARS,
    quantize_micro,
    train_softmax,
)


def train_lang_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    sample_n: int = 512,
    n_buckets: int = DEFAULT_BUCKETS,
    n_iters: int = 200,
    lr: float = 0.5,
    max_chars: int = MAX_CHARS,
) -> tuple[list[list[int]], list[int], list[str]]:
    """Fit on the first `sample_n` doc_ids (deterministic TakeOrdered —
    bounded driver memory regardless of corpus size) and return the
    quantized (w_micro, b_micro, classes) triple ready for
    classify_lang. Classes are the sample's distinct labels, sorted."""
    rows = (
        docs.orderBy("doc_id")
        .limit(sample_n)
        .select(F.col(text_col).alias("t"), F.col(label_col).alias("y"))
        .collect()
    )
    texts = [r["t"] or "" for r in rows]
    classes = sorted({r["y"] for r in rows})
    idx = {c: k for k, c in enumerate(classes)}
    labels = [idx[r["y"]] for r in rows]
    W, b = train_softmax(texts, labels, len(classes), n_buckets,
                         n_iters, lr, max_chars)
    w_micro, b_micro = quantize_micro(W, b)
    return w_micro, b_micro, classes


def _int_array(vals: list[int]) -> Column:
    return F.array(*[F.lit(v) for v in vals]).cast("array<bigint>")


def classify_lang(
    docs: DataFrame,
    w_micro: list[list[int]],
    b_micro: list[int],
    classes: list[str],
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    max_chars: int = MAX_CHARS,
) -> DataFrame:
    """Score every document natively. Output per doc:
    (doc_id, lang, n_grams, score_micro, pred_lang, prob, correct).

    Expression pipeline (all JVM-side, no Python):
      codes   = transform(1..L, i -> ascii(substring(t, i, 1)))
      buckets = transform(1..L-2, i -> ((c_i*31 + c_{i+1})*31 + c_{i+2}) % B)
      sums[k] = one aggregate pass with an array accumulator (the
                two-arg transform lambda supplies the class index, so
                all classes accumulate in a single traversal)
      score_k = bias_k + floor(sums[k] / n)   (exact pmod spelling)
      pred    = first argmax (array_position on the max — ties resolve
                to the lowest class index in both engines)
    """
    n_classes = len(classes)
    w_flat = [v for row in w_micro for v in row]  # class-major
    wf = _int_array(w_flat)
    bias = _int_array(b_micro)
    cls = F.array(*[F.lit(c) for c in classes])

    # Staged withColumn pipeline: every intermediate is referenced
    # downstream BY NAME (a cheap attribute), never by re-using the
    # Python expression tree — re-use would inline the whole upstream
    # subtree into each reference and blow the optimizer up
    # combinatorially (observed: minutes of driver-side Catalyst churn
    # for the single-select spelling). CollapseProject keeps non-cheap
    # expressions un-duplicated (SPARK-36718), and whole-stage codegen
    # still fuses the chain into one map stage.
    c = F.col
    out = (
        docs.select(
            "doc_id",
            "lang",
            F.substring(F.coalesce(c(text_col), F.lit("")), 1, max_chars)
            .alias("__t"),
        )
        # split('') yields one element per character, so codes is built in
        # ONE O(L) pass; the substr(t, i, 1)-per-index spelling this
        # replaces re-scans the string to find char i's byte offset on
        # every lookup — O(L^2) per document (~16M char steps at
        # MAX_CHARS=4096), measured as the dominant cost of this stage.
        # Only difference: '' gives codes=[0] instead of the descending-
        # sequence artifact [0,0]; unobservable, since buckets (the sole
        # consumer) is empty whenever n_grams = 0.
        .withColumn(
            "codes",
            F.transform(
                F.split(c("__t"), ""),
                lambda ch: F.ascii(ch).cast("bigint"),
            ),
        )
        .withColumn(
            "n_grams",
            F.greatest(F.length("__t") - 2, F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "buckets",
            F.when(
                c("n_grams") > 0,
                F.transform(
                    F.sequence(F.lit(1),
                               F.greatest(F.length("__t") - 2, F.lit(1))),
                    lambda i: (
                        (F.element_at(c("codes"), i.cast("int")) * 31
                         + F.element_at(c("codes"), (i + 1).cast("int"))) * 31
                        + F.element_at(c("codes"), (i + 2).cast("int"))
                    ) % n_buckets,
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        # single traversal, array-of-class-sums accumulator
        .withColumn(
            "sums",
            F.aggregate(
                c("buckets"),
                F.array(*[F.lit(0)] * n_classes).cast("array<bigint>"),
                lambda acc, bkt: F.transform(
                    acc,
                    lambda s, k: s + F.element_at(
                        wf, (k.cast("bigint") * n_buckets + bkt + 1)
                        .cast("int")),
                ),
            ),
        )
        # score_k = bias_k + exact floor(sum_k / n)  (bias-only at n = 0)
        .withColumn("n_safe", F.greatest(c("n_grams"), F.lit(1)))
        .withColumn(
            "scores",
            F.transform(
                c("sums"),
                lambda s, k: F.element_at(bias, (k + 1).cast("int"))
                + ((s - F.pmod(s, c("n_safe"))) / c("n_safe"))
                .cast("bigint"),
            ),
        )
        .withColumn("score_micro", F.array_max(c("scores")))
        .withColumn(
            "pred_idx",
            F.array_position(c("scores"), c("score_micro")).cast("int"),
        )
        # softmax of the integer scores: sequential fold, identical
        # order in the DuckDB oracle's list_reduce
        .withColumn(
            "denom",
            F.aggregate(
                c("scores"),
                F.lit(0.0),
                lambda a, s: a + F.exp(
                    (s - c("score_micro")).cast("double") / 1e6),
            ),
        )
        .select(
            "doc_id",
            "lang",
            "n_grams",
            "score_micro",
            F.element_at(cls, c("pred_idx")).alias("pred_lang"),
            F.round(F.lit(1.0) / c("denom"), 6).alias("prob"),
            (F.element_at(cls, c("pred_idx")) == c("lang")).alias("correct"),
        )
    )
    return out


def ft_lang_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    sample_n: int = 512,
    n_buckets: int = DEFAULT_BUCKETS,
    max_chars: int = MAX_CHARS,
) -> DataFrame:
    """Full stage: train on the bounded deterministic sample, score the
    whole corpus natively (the fastText lang-ID production shape)."""
    w_micro, b_micro, classes = train_lang_classifier(
        docs, text_col, label_col, sample_n, n_buckets,
        max_chars=max_chars)
    return classify_lang(docs, w_micro, b_micro, classes, text_col,
                         n_buckets, max_chars)


def weak_quality_label(text: Column) -> Column:
    """Weak 'hq'/'lq' label (CCNet-style quality-classifier supervision):
    hq iff >= 40 words AND mean word length <= 6 chars.  The mean test is
    the INTEGER comparison sum_len <= 6*n (no float boundary), sum_len =
    non-whitespace char count — exactly mirrorable in DuckDB and in the
    pure twin kernels/ft_linear.weak_quality_label."""
    t = F.coalesce(text, F.lit(""))
    n = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != F.lit("")))
    s = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when((n >= 40) & (s <= 6 * n), F.lit("hq")).otherwise(F.lit("lq"))


def ft_quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    sample_n: int = 512,
    n_buckets: int = DEFAULT_BUCKETS,
    max_chars: int = MAX_CHARS,
) -> DataFrame:
    """Model-based quality filter, the CCNet/LLaMA-pipeline stage: train
    the fastText-architecture classifier on WEAK labels derived from
    cheap stats (weak_quality_label), then score the whole corpus with
    the same zero-Python Catalyst inference as the lang classifier.

    Output: (doc_id, weak_label, n_grams, score_micro, pred_quality,
    prob, agrees).  Same 100-TB shape as ft_lang_classifier: bounded
    TakeOrdered training sample, map-only scoring projection."""
    labeled = docs.select(
        "doc_id",
        F.col(text_col).alias("text"),
        weak_quality_label(F.col(text_col)).alias("lang"),
    )
    out = ft_lang_classifier(
        labeled, text_col="text", label_col="lang",
        sample_n=sample_n, n_buckets=n_buckets, max_chars=max_chars,
    )
    return out.select(
        "doc_id",
        F.col("lang").alias("weak_label"),
        "n_grams",
        "score_micro",
        F.col("pred_lang").alias("pred_quality"),
        "prob",
        F.col("correct").alias("agrees"),
    )


def ft_quality_gate_ids(
    docs: DataFrame,
    text_col: str = "text",
    sample_n: int = 512,
    n_buckets: int = DEFAULT_BUCKETS,
    max_chars: int = MAX_CHARS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """doc_ids predicted 'hq' — the gate spelling of the classifier,
    safe to join/filter against at any scale.

    Do NOT spell this as `ft_quality_classifier(docs).where(pred ==
    'hq')` on the live plan: higher-order functions are CodegenFallback
    (always interpreted), and PushPredicateThroughNonJoin substitutes
    every staged alias into the filter condition — nesting the O(L)
    codepoint transform INSIDE the per-element bucket lambda, turning
    scoring into O(L^2) interpreted work per row (~0.8 s/doc at
    max_chars=4096; measured 400x slower than evaluating the staged
    projection). Materializing the small verdict table first keeps
    scoring a single staged map pass and makes the filter a trivial
    scan over (doc_id, pred) — also the production shape: score tables
    are landed once and gated many times."""
    from .dedup import _truncate_lineage

    scored = ft_quality_classifier(
        docs, text_col=text_col, sample_n=sample_n,
        n_buckets=n_buckets, max_chars=max_chars,
    ).select("doc_id", "pred_quality")
    scored = _truncate_lineage(scored, checkpoint_dir, eager=True)
    return scored.where(F.col("pred_quality") == "hq").select("doc_id")
