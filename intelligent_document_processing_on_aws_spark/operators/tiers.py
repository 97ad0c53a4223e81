"""Quality-tier extraction over a documents table — integer-exact scoring.

The tier stage of a web-scale curation pipeline (FineWeb-Edu, Penedo et
al. 2024, arXiv:2406.17557; DCLM, Li et al. 2024): instead of a single
keep/drop gate, every document is scored and binned into named quality
tiers so downstream training mixes can sample per-tier ("head" for
high-quality epochs, "mid" for bulk, "junk" never). The reference repo
has no tier stage (its classification is per-document-TYPE via Bedrock,
classification/service.py — oos per the north star); this implements the
standard public-pipeline shape over the same signals as
operators/textstats.quality_score.

Exactness: the composite score is integer ppm (parts-per-million) built
from integer counts with floor division only — `(400000*least(nt,256))
div 256 + 300000*(chars - least(4*punct, chars)) div chars + ...` — so
tier boundaries are exact integer comparisons in Spark and DuckDB alike
(the same no-float-boundary discipline as the metering DECIMAL sums and
the ft classifier's micro-unit scores). No rounding, no epsilon.

100-TB shape:
* `quality_tiers` is ONE map-only projection — zero shuffles, zero
  joins; the only non-codegen expression is the single stopword-set
  membership filter (a higher-order function, CodegenFallback), staged
  as its own column so it is evaluated once per row (CollapseProject
  keeps non-cheap multiply-referenced projections un-collapsed,
  SPARK-36718 — same staging discipline as operators/ft_classifier).
  Tier assignment scales exactly like the scan.
* `tier_rollup` adds one partial-agg shuffle of 5 rows per partition.
* `source_cap` (per-host diversity cap — Gopher/RefinedWeb keep at most
  k documents per host so megasites cannot dominate a training mix) is
  a rank-limit window: Spark >= 3.5 plans it as WindowGroupLimit, which
  prunes each partition to its local top-k BEFORE the exchange — the
  shuffle carries at most k rows per (source, partition), so a hot host
  with 10^8 pages ships k*n_partitions rows, not 10^8 (the plan shape
  is pinned in tests/test_tiers.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count, tokens
from ..kernels.textstats import STOPWORDS

# tier thresholds in score ppm — exact integers, compared with >= only.
# Named after the CCNet head/middle/tail convention extended with an
# explicit junk bucket; chosen to split the synthetic corpus distribution
# (sf0.01 deciles ~397k/481k/558k) into five populated bins.
TIER_BOUNDS: tuple[int, ...] = (360_000, 440_000, 520_000, 600_000)
TIER_LABELS: tuple[str, ...] = ("junk", "low", "mid", "high", "head")


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative integers — the pmod
    spelling shared with kernels/ft_linear.score_micro; mirrored as
    `//` in the DuckDB oracle (identical on non-negative operands)."""
    return ((a - F.pmod(a, b)) / b).cast("bigint")


def tier_score_ppm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, source, n_tokens, score_ppm) — the integer composite of
    the three textstats.quality_score components, in one map pass.

    Tables without a host/source column (e.g. the curation funnel's
    (doc_id, text) slice) still tier; the cap then degenerates to a
    global top-k, which is what a single-source corpus means anyway."""
    src = F.col("source") if "source" in docs.columns else F.lit("__all__")
    slim = docs.select("doc_id", src.alias("source"), F.col(text_col))
    return with_tier(slim, text_col).select(
        "doc_id", "source", "n_tokens", "score_ppm"
    )


def tier_of(score_ppm: Column) -> Column:
    """Exact integer tier: number of TIER_BOUNDS <= score (0..4)."""
    t = F.lit(0)
    for b in TIER_BOUNDS:
        t = t + F.when(score_ppm >= F.lit(b), 1).otherwise(0)
    return t.cast("int")


def quality_tiers(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc tier assignment:
    (doc_id, source, n_tokens, score_ppm, tier, tier_label)."""
    src = F.col("source") if "source" in docs.columns else F.lit("__all__")
    slim = docs.select("doc_id", src.alias("source"), F.col(text_col))
    return with_tier(slim, text_col).select(
        "doc_id", "source", "n_tokens", "score_ppm", "tier", "tier_label"
    )


def with_tier(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append (n_tokens, score_ppm, tier, tier_label) to ALL of the
    input's columns — no join, one map pass — so callers can write the
    corpus partitioned by tier without a second scan. The input must
    not already carry those four column names. The one interpreted HOF
    (stopword membership) is staged alone so CollapseProject leaves it
    evaluated once per row; unused outputs are pruned by Catalyst when
    a caller selects a subset."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    staged = (
        docs
        .withColumn("n_tokens", token_count(c).cast("bigint"))
        .withColumn("__nc", F.length(c).cast("bigint"))
        .withColumn(
            "__np",
            F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")).cast("bigint"),
        )
        .withColumn(
            "__sh",
            F.size(
                F.filter(
                    F.transform(tokens(c), F.lower),
                    lambda t: F.array_contains(
                        F.lit(list(STOPWORDS)), t),
                )
            ).cast("bigint"),
        )
        .withColumn(
            "score_ppm",
            _idiv(F.lit(400_000) * F.least(F.col("n_tokens"), F.lit(256)),
                  F.lit(256))
            + F.when(F.col("__nc") == 0, F.lit(0).cast("bigint")).otherwise(
                _idiv(F.lit(300_000)
                      * (F.col("__nc")
                         - F.least(4 * F.col("__np"), F.col("__nc"))),
                      F.col("__nc")))
            + F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint")).otherwise(
                _idiv(F.lit(300_000)
                      * F.least(5 * F.col("__sh"), F.col("n_tokens")),
                      F.col("n_tokens"))),
        )
        .withColumn("tier", tier_of(F.col("score_ppm")))
        .withColumn(
            "tier_label",
            F.element_at(F.lit(list(TIER_LABELS)),
                         F.col("tier") + 1),
        )
        .drop("__nc", "__np", "__sh")
    )
    return staged


def write_tiered(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Write the corpus Hive-partitioned by tier_label (dynamic
    partitioning — one directory per tier). A mix designer then reads
    a single tier with partition PRUNING: `read.parquet(path).where(
    tier_label = 'head')` scans only head/ files, never the other 4/5
    of a 100-TB corpus. Scoring is the same map-only pass as
    quality_tiers, fused into the write — no extra scan, no join."""
    with_tier(docs, text_col).write.mode(mode).partitionBy(
        "tier_label").parquet(path)


def tier_rollup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-tier corpus composition: (tier, tier_label, n_docs,
    total_tokens, n_sources) — the table a mix designer reads before
    choosing per-tier sampling weights. Map-side partial agg; at most
    5 rows per partition cross the wire."""
    return (
        quality_tiers(docs, text_col)
        .groupBy("tier", "tier_label")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def source_tier_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source tier composition — the crawl-prioritization table:
    which sources/hosts yield head-tier content and which produce junk,
    read before deciding recrawl frequency or per-source budgets.

    Output: (source, tier, tier_label, n_docs, total_tokens, share_ppm,
    is_dominant) — share_ppm is the integer ppm of the source's docs
    landing in this tier; is_dominant marks the source's largest tier
    (ties -> lowest tier), so `WHERE is_dominant` is one row per source.

    Shape: the scoring map pass feeds ONE shuffle (groupBy source+tier
    with map-side partial agg — at most 5 rows per source cross the
    wire); the share/dominant windows run over that already-tiny
    aggregated frame on the same source partitioning."""
    agg = (
        quality_tiers(docs, text_col)
        .groupBy("source", "tier", "tier_label")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    ws = Window.partitionBy("source")
    wd = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), F.col("tier").asc()
    )
    return (
        agg
        .withColumn(
            "share_ppm",
            _idiv(F.lit(1_000_000) * F.col("n_docs"),
                  F.sum("n_docs").over(ws)),
        )
        .withColumn("is_dominant", F.row_number().over(wd) == F.lit(1))
    )


def tier_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-snapshot tier transition matrix — the recrawl-stability
    table: given the same corpus captured in two crawls, how many
    documents moved between quality tiers (content drift, template
    injection, truncated captures all show up as off-diagonal mass).

    Output: (tier_a, label_a, tier_b, label_b, n_docs) — at most 25
    rows. Shape: two map-only scoring passes feed one doc_id equi-join
    (both sides project to (id, tier) first, so the join moves two
    integer columns, never text) and a 25-group partial agg."""
    a = quality_tiers(docs_a, text_col).select(
        F.col(id_col).alias("__id"),
        F.col("tier").alias("tier_a"),
        F.col("tier_label").alias("label_a"),
    )
    b = quality_tiers(docs_b, text_col).select(
        F.col(id_col).alias("__id"),
        F.col("tier").alias("tier_b"),
        F.col("tier_label").alias("label_b"),
    )
    return (
        a.join(b, "__id")
        .groupBy("tier_a", "label_a", "tier_b", "label_b")
        .agg(F.count("*").alias("n_docs"))
    )


def source_cap(
    docs: DataFrame,
    k: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Per-source diversity cap: keep the k best-scored documents per
    source (ties broken by doc_id ASC — deterministic at any
    parallelism). Output: (doc_id, source, score_ppm, rank_in_source).

    Rank-limit spelling so Spark plans WindowGroupLimit: each input
    partition is pruned to its local top-k per source BEFORE the
    exchange — the skew story for megahosts (see module docstring)."""
    w = Window.partitionBy("source").orderBy(
        F.col("score_ppm").desc(), F.col("doc_id").asc()
    )
    return (
        tier_score_ppm(docs, text_col)
        .withColumn("rank_in_source", F.row_number().over(w))
        .where(F.col("rank_in_source") <= k)
        .select("doc_id", "source", "score_ppm", "rank_in_source")
    )
