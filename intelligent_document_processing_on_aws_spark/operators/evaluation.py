"""Evaluation engine: flatten -> align -> compare -> count -> metrics.

The relational layer of the engine, mirroring the reference's evaluation
service semantics with native columnar expressions wherever possible:

- flatten nested attribute JSON to dot/bracket paths
  (evaluation/service.py:194-230) — Arrow-batched mapInPandas on the pure
  kernel flatten;
- attribute alignment = FULL OUTER JOIN of expected vs actual flattened
  rows on (doc, section, path) (service.py:546-659); unconfigured paths
  default to EXACT (reference defaults to LLM judge — no LLM here, noted
  deviation);
- EXACT / NUMERIC_EXACT / FUZZY comparisons are pure Catalyst expressions
  (regexp_replace chains, translate+cast, built-in levenshtein) — whole-
  stage-codegen'd, no Python (comparator.py:44-369 parity);
- tn/fp/fn/tp/fp1/fp2 counting per _count_classifications
  (service.py:323-404);
- metric formulas per metrics.py:13-145;
- HUNGARIAN list matching via applyInPandas on the pure Kuhn-Munkres
  kernel (comparator.py:226-287 parity) — inherently quadratic per group,
  small n, row-parallel across sections.

Scale notes: the config dimension is broadcast (tiny); the outer join
shuffles on (doc_id, section_id, attr_path) — high cardinality, well
distributed; metrics aggregate with map-side partial aggregation.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.compare import compare_hungarian
from ..kernels.textnorm import flatten_nested_data

FLAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("section_id", T.StringType()),
        T.StructField("classification", T.StringType()),
        T.StructField("attr_path", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def flatten_attributes(df: DataFrame, json_col: str = "attributes_json") -> DataFrame:
    """(doc_id, section_id, classification, attributes_json) -> one row per
    flattened attribute path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "section_id", "classification",
                                    "attr_path", "value")}
            for doc_id, sec, cls, aj in zip(
                pdf["doc_id"], pdf["section_id"], pdf["classification"], pdf[json_col]
            ):
                flat = flatten_nested_data(json.loads(aj) if aj else {})
                for path, v in flat.items():
                    rows["doc_id"].append(doc_id)
                    rows["section_id"].append(sec)
                    rows["classification"].append(cls)
                    rows["attr_path"].append(path)
                    rows["value"].append(None if v is None else str(v))
            yield pd.DataFrame(rows)

    return df.select("doc_id", "section_id", "classification", json_col).mapInPandas(
        run, FLAT_SCHEMA
    )


# -- native comparison expressions (comparator.py parity) --------------------

def norm_exact(col):
    """strip punctuation, collapse whitespace, lower, trim
    (comparator.py:86-101). Java \\w == ASCII [a-zA-Z0-9_] — fixture corpus
    is ASCII; unicode parity would use a (?U) flag."""
    return F.lower(F.trim(F.regexp_replace(F.regexp_replace(col, r"[^\w\s]", ""), r"\s+", " ")))


def norm_numeric(col):
    """strip $ , ( ) then cast double (comparator.py:104-126); try_cast so
    unparseable values yield NULL (-> exact-string fallback) instead of an
    ANSI cast error."""
    return F.translate(col, "$,()", "").try_cast("double")


def _is_empty(col):
    return col.isNull() | (F.trim(col) == "")


def evaluate_attributes(
    expected_flat: DataFrame,
    actual_flat: DataFrame,
    eval_config: DataFrame,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """Aligned + counted per-attribute rows.

    eval_config: (classification, norm_path, method, threshold) — broadcast.
    Output adds: method, threshold, score, tn, fp, fn, tp, fp1, fp2.

    embeddings (optional): (text, embedding array<double>) value->vector
    lookup enabling the SEMANTIC method (comparator.py:406-476) with the
    reference's remote Bedrock embedding call replaced by this supplied
    table. Cosine is a pure Catalyst expression (zip_with + aggregate +
    sqrt — no Python), trimming to the shorter vector and returning 0.0
    on zero magnitude exactly like the reference; values missing from the
    table fall back to FUZZY (the reference's failed-embedding path).
    Without the table, SEMANTIC rows use the FUZZY fallback throughout
    (the remote embedding service is out of scope)."""
    e = expected_flat.select(
        "doc_id", "section_id",
        F.col("classification").alias("e_cls"),
        "attr_path", F.col("value").alias("expected"),
    )
    a = actual_flat.select(
        "doc_id", "section_id",
        F.col("classification").alias("a_cls"),
        "attr_path", F.col("value").alias("actual"),
    )
    joined = e.join(a, ["doc_id", "section_id", "attr_path"], "full_outer").select(
        "doc_id", "section_id", "attr_path",
        F.coalesce("e_cls", "a_cls").alias("classification"),
        "expected", "actual",
    )
    norm_path = F.regexp_replace("attr_path", r"\[\d+\]", "[]")
    joined = joined.withColumn("norm_path", norm_path)

    cfg = eval_config.select(
        F.col("classification").alias("c_cls"),
        F.col("norm_path").alias("c_path"),
        "method", "threshold",
    )
    joined = joined.join(
        F.broadcast(cfg),
        (joined["classification"] == cfg["c_cls"]) & (joined["norm_path"] == cfg["c_path"]),
        "left",
    ).drop("c_cls", "c_path")
    # unconfigured (set-difference) paths: default EXACT @0.8
    joined = joined.withColumn("method", F.coalesce("method", F.lit("EXACT")))
    joined = joined.withColumn("threshold", F.coalesce("threshold", F.lit(0.8)))

    if embeddings is not None:
        # enforce one vector per text, or duplicate rows would fan out
        # matches and double-count tp/fp/fn (ADVICE r3). The JOIN KEY is
        # xxhash64(text) — an 8-byte bigint — so the lookup scales past
        # broadcast size without shuffling long string keys (r5 VERDICT
        # #5); the residual text-equality predicate keeps semantics exact
        # under a 64-bit collision.
        emb = embeddings.dropDuplicates(["text"])
        emb_e = emb.select(
            F.xxhash64("text").alias("__e_key"),
            F.col("text").alias("__e_text"),
            F.col("embedding").alias("e_vec"),
        )
        emb_a = emb.select(
            F.xxhash64("text").alias("__a_key"),
            F.col("text").alias("__a_text"),
            F.col("embedding").alias("a_vec"),
        )
        joined = (
            joined.join(
                emb_e,
                (F.xxhash64("expected") == F.col("__e_key"))
                & (F.col("expected") == F.col("__e_text")),
                "left",
            )
            .join(
                emb_a,
                (F.xxhash64("actual") == F.col("__a_key"))
                & (F.col("actual") == F.col("__a_text")),
                "left",
            )
            .drop("__e_key", "__e_text", "__a_key", "__a_text")
        )
    else:
        joined = joined.withColumn(
            "e_vec", F.lit(None).cast("array<double>")
        ).withColumn("a_vec", F.lit(None).cast("array<double>"))

    exp, act = F.col("expected"), F.col("actual")
    ne, na = norm_exact(exp), norm_exact(act)
    nne, nna = norm_numeric(exp), norm_numeric(act)
    exact_eq = ne == na
    # NUMERIC_EXACT: numeric equality; if either side unparseable -> exact
    # string fallback (comparator.py:104-126)
    numeric_eq = F.when(
        nne.isNotNull() & nna.isNotNull(), nne == nna
    ).otherwise(exact_eq)
    # FUZZY: normalized levenshtein similarity (comparator.py:290-369)
    max_len = F.greatest(F.length(ne), F.length(na))
    sim = F.when(ne == na, F.lit(1.0)).when(
        (F.length(ne) == 0) | (F.length(na) == 0), F.lit(0.0)
    ).otherwise(1.0 - F.levenshtein(ne, na) / max_len)

    # SEMANTIC: cosine over supplied vectors, trimmed to the shorter one
    # (comparator.py:372-404); native fold — no Python in the hot path
    tv1 = F.expr("slice(e_vec, 1, least(size(e_vec), size(a_vec)))")
    tv2 = F.expr("slice(a_vec, 1, least(size(e_vec), size(a_vec)))")
    dot = F.aggregate(
        F.zip_with(tv1, tv2, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    mag1 = F.sqrt(F.aggregate(tv1, F.lit(0.0), lambda acc, x: acc + x * x))
    mag2 = F.sqrt(F.aggregate(tv2, F.lit(0.0), lambda acc, x: acc + x * x))
    cos = F.when((mag1 == 0.0) | (mag2 == 0.0), F.lit(0.0)).otherwise(
        dot / (mag1 * mag2)
    )
    # vectors present and non-empty -> cosine; else FUZZY fallback
    # (reference's failed-embedding path, comparator.py:458-462)
    sem_ok = (F.size("e_vec") > 0) & (F.size("a_vec") > 0)
    sem_score = F.when(sem_ok, cos).otherwise(sim)

    method = F.col("method")
    matched = (
        F.when(method == "NUMERIC_EXACT", numeric_eq)
        .when(method == "FUZZY", sim >= F.col("threshold"))
        .when(method == "SEMANTIC", sem_score >= F.col("threshold"))
        .otherwise(exact_eq)
    )
    score = (
        F.when(method == "FUZZY", sim)
        .when(method == "SEMANTIC", sem_score)
        .otherwise(F.when(matched, 1.0).otherwise(0.0))
    )

    e_empty, a_empty = _is_empty(exp), _is_empty(act)
    counted = joined.select(
        "*",
        F.when(e_empty & a_empty, 1).otherwise(0).alias("tn"),
        F.when(e_empty & ~a_empty, 1)
        .when(~e_empty & ~a_empty & ~matched, 1)
        .otherwise(0)
        .alias("fp"),
        F.when(~e_empty & a_empty, 1).otherwise(0).alias("fn"),
        F.when(~e_empty & ~a_empty & matched, 1).otherwise(0).alias("tp"),
        F.when(e_empty & ~a_empty, 1).otherwise(0).alias("fp1"),
        F.when(~e_empty & ~a_empty & ~matched, 1).otherwise(0).alias("fp2"),
        F.when(e_empty & a_empty, 1.0)
        .when(e_empty | a_empty, 0.0)
        .otherwise(score)
        .alias("score"),
    )
    return counted.drop("e_vec", "a_vec")


def _metric_exprs():
    return [
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
        F.sum("tn").alias("tn"), F.sum("fp1").alias("fp1"), F.sum("fp2").alias("fp2"),
    ]


def metrics_rollup(counted: DataFrame, *group_cols: str) -> DataFrame:
    """groupBy(group_cols) -> counts + precision/recall/F1/accuracy/
    false-alarm/false-discovery (metrics.py:13-145 formulas)."""
    g = counted.groupBy(*group_cols).agg(*_metric_exprs()) if group_cols else \
        counted.agg(*_metric_exprs())
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    tn, fp1, fp2 = F.col("tn"), F.col("fp1"), F.col("fp2")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(0.0)
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(0.0)
    g = g.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
    )
    p, r = F.col("precision"), F.col("recall")
    return g.select(
        "*",
        F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0).alias("f1_score"),
        F.when(tp + fp + fn + tn > 0, (tp + tn) / (tp + fp + fn + tn))
        .otherwise(0.0).alias("accuracy"),
        F.when(fp1 + tn > 0, fp1 / (fp1 + tn)).otherwise(0.0).alias("false_alarm_rate"),
        F.when(fp2 + tp > 0, fp2 / (fp2 + tp)).otherwise(0.0).alias("false_discovery_rate"),
    )


# -- HUNGARIAN wholesale list comparison -------------------------------------

HUNGARIAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("section_id", T.StringType()),
        T.StructField("classification", T.StringType()),
        T.StructField("attr_path", T.StringType()),
        T.StructField("tp", T.IntegerType()),
        T.StructField("fp", T.IntegerType()),
        T.StructField("avg_score", T.DoubleType()),
    ]
)


def evaluate_lists_hungarian(
    expected_flat: DataFrame,
    actual_flat: DataFrame,
    list_attr: str,
    field: str,
    comparator: str = "EXACT",
    threshold: float = 0.8,
) -> DataFrame:
    """Wholesale bipartite list matching for `list_attr[].field` values per
    section (comparator.py:226-287). applyInPandas per (doc, section):
    quadratic in list length, lists are small; sections parallelize."""
    pat = rf"^{list_attr}\[\d+\]\.{field}$"

    def prep(df: DataFrame, value_alias: str) -> DataFrame:
        return (
            df.where(F.col("attr_path").rlike(pat))
            .groupBy("doc_id", "section_id")
            .agg(
                F.any_value("classification").alias("classification"),
                F.sort_array(F.collect_list(F.struct("attr_path", "value"))).alias(value_alias),
            )
        )

    e = prep(expected_flat, "e_vals")
    a = prep(actual_flat, "a_vals")
    both = e.join(a, ["doc_id", "section_id"], "full_outer").select(
        "doc_id", "section_id",
        F.coalesce(e["classification"], a["classification"]).alias("classification"),
        "e_vals", "a_vals",
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("doc_id", "section_id", "classification",
                               "attr_path", "tp", "fp", "avg_score")}
        # zip over columns, not iterrows — iterrows builds a Series per row
        # (the slowest pandas idiom; groups here are 1-row, but the operator
        # contract allows arbitrary group sizes)
        for doc_id, section_id, cls, e_raw, a_raw in zip(
            pdf["doc_id"], pdf["section_id"], pdf["classification"],
            pdf["e_vals"], pdf["a_vals"],
        ):
            evs = [x["value"] for x in e_raw] if e_raw is not None and len(e_raw) else []
            avs = [x["value"] for x in a_raw] if a_raw is not None and len(a_raw) else []
            tp, fp, avg = compare_hungarian(evs, avs, comparator, threshold)
            out["doc_id"].append(doc_id)
            out["section_id"].append(section_id)
            out["classification"].append(cls)
            out["attr_path"].append(f"{list_attr}[].{field}")
            out["tp"].append(tp)
            out["fp"].append(fp)
            out["avg_score"].append(avg)
        return pd.DataFrame(out)

    return both.groupBy("doc_id", "section_id").applyInPandas(run, HUNGARIAN_SCHEMA)


def _pct(col):
    """Integer-percent rendering: the report's only float->string boundary.
    2-dp printf formatting differs between JVM String.format (HALF_UP) and
    C-style printf (half-even) on exact-binary halfway values, so the
    report quantizes to whole percents — identical on any engine."""
    return F.concat(F.round(col * 100, 0).cast("int").cast("string"), F.lit("%"))


def evaluation_report(
    counted: DataFrame, confidences: DataFrame | None = None
) -> DataFrame:
    """Per-document evaluation markdown report: (doc_id, report_md).

    Deterministic analog of the reference's EvaluationResult.to_markdown
    (evaluation/models.py:117-330): document header, emoji-coded summary
    with a unicode progress bar, per-section headers with count rollups,
    and one ✅/❌ row per attribute (expected/actual/confidence/score/
    method — the confidence columns come from the UPSTREAM assessment's
    explainability_info rows when a `confidences` DataFrame
    (doc_id, section_id, attr_path, confidence, confidence_threshold) is
    supplied, rendering 'N/A' like the reference when absent).
    Documented deviations: scores render as whole percents (see _pct);
    no execution-time footer (nondeterministic).

    Built entirely from JVM-side string expressions + two aggregations
    (section, then document) — no UDF, no window, no driver collect.
    """
    if confidences is not None:
        counted = counted.join(
            confidences.select(
                "doc_id", "section_id", "attr_path",
                "confidence", "confidence_threshold",
            ),
            ["doc_id", "section_id", "attr_path"],
            "left",
        )
    else:
        counted = counted.withColumn(
            "confidence", F.lit(None).cast("double")
        ).withColumn("confidence_threshold", F.lit(None).cast("double"))
    matched = (F.col("tp") + F.col("tn")) == 1
    status = F.when(matched, F.lit("✅")).otherwise(F.lit("❌"))
    method_display = F.when(
        F.col("method") == "FUZZY",
        F.concat(F.col("method"), F.lit(" (threshold: "),
                 _pct(F.col("threshold")), F.lit(")")),
    ).otherwise(F.col("method"))

    def cell(c):
        return F.coalesce(F.regexp_replace(c, "\n", " "), F.lit("None"))

    def conf_cell(c):  # reference renders N/A for absent confidences
        return F.coalesce(_pct(c), F.lit("N/A"))

    row_md = F.concat(
        F.lit("| "), status,
        F.lit(" | "), F.col("attr_path"),
        F.lit(" | "), cell(F.col("expected")),
        F.lit(" | "), cell(F.col("actual")),
        F.lit(" | "), conf_cell(F.col("confidence")),
        F.lit(" | "), conf_cell(F.col("confidence_threshold")),
        F.lit(" | "), _pct(F.col("score")),
        F.lit(" | "), method_display, F.lit(" |"),
    )
    rows = counted.select(
        "doc_id", "section_id", "classification", "attr_path",
        row_md.alias("row_md"), "tp", "fp", "fn", "tn", "fp1", "fp2",
    )
    sec = rows.groupBy("doc_id", "section_id").agg(
        F.any_value("classification").alias("classification"),
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(attr_path, row_md)))"
                   ", x -> x.row_md)"),
            "\n",
        ).alias("attr_rows"),
        *_metric_exprs(),
    )
    sec_md = F.concat(
        F.lit("## Section: "), F.col("section_id"),
        F.lit(" ("), F.col("classification"), F.lit(")\n\n"),
        F.lit("- counts: tp="), F.col("tp").cast("string"),
        F.lit(" fp="), F.col("fp").cast("string"),
        F.lit(" fn="), F.col("fn").cast("string"),
        F.lit(" tn="), F.col("tn").cast("string"),
        F.lit(" fp1="), F.col("fp1").cast("string"),
        F.lit(" fp2="), F.col("fp2").cast("string"), F.lit("\n\n"),
        F.lit("| Status | Attribute | Expected | Actual | Confidence "
              "| Confidence Threshold | Score | Method |\n"),
        F.lit("| :----: | --------- | -------- | ------ | :--------: "
              "| :------------------: | ----- | ------ |\n"),
        F.col("attr_rows"),
    )
    doc = sec.select("doc_id", F.col("section_id"), sec_md.alias("sec_md"),
                     "tp", "fp", "fn", "tn", "fp1", "fp2").groupBy("doc_id").agg(
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(section_id, sec_md)))"
                   ", x -> x.sec_md)"),
            "\n\n",
        ).alias("sections_md"),
        *_metric_exprs(),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    total = tp + fp + fn + tn
    matched_n = tp + tn
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(0.0)
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    rate_pct = F.round(
        F.when(total > 0, matched_n / total).otherwise(0.0) * 100, 0
    ).cast("int")
    f1_pct = F.round(f1 * 100, 0).cast("int")

    def indicator(pct_col):
        return (
            F.when(pct_col >= 90, "\U0001f7e2").when(pct_col >= 70, "\U0001f7e1")
            .when(pct_col >= 50, "\U0001f7e0").otherwise("\U0001f534")
        )

    fill = F.floor(rate_pct / 5).cast("int")
    bar = F.concat(
        F.lit("["), F.repeat(F.lit("█"), fill),
        F.repeat(F.lit("░"), F.lit(20) - fill),
        F.lit("] "), rate_pct.cast("string"), F.lit("%"),
    )
    report_md = F.concat(
        F.lit("# Document Evaluation: "), F.col("doc_id").cast("string"),
        F.lit("\n\n## Summary\n- **Match Rate**: "), indicator(rate_pct),
        F.lit(" "), matched_n.cast("string"), F.lit("/"), total.cast("string"),
        F.lit(" attributes matched "), bar,
        F.lit("\n- **Precision**: "), _pct(prec),
        F.lit(" | **Recall**: "), _pct(rec),
        F.lit(" | **F1 Score**: "), indicator(f1_pct), F.lit(" "), _pct(f1),
        F.lit("\n\n"), F.col("sections_md"),
    )
    return doc.select("doc_id", report_md.alias("report_md"))


CONFIDENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("section_id", T.StringType()),
        T.StructField("attr_path", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("confidence_threshold", T.DoubleType()),
    ]
)


def flatten_confidence_payloads(
    df: DataFrame, json_col: str = "payload_json"
) -> DataFrame:
    """Extraction-result payloads -> per-path confidence rows.

    Consumes the UPSTREAM assessment's explainability_info (the reference's
    evaluation loads these from the stored result document,
    evaluation/service.py:276-321), rather than recomputing confidences:
    unwraps the inference_result envelope, flattens explainability_info[0]
    to {path: {confidence, confidence_threshold}} rows. Arrow-batched
    mapInPandas over the pure kernel; row-parallel, no shuffle."""
    from ..kernels.textnorm import load_extraction_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "section_id", "attr_path",
                                   "confidence", "confidence_threshold")}
            for doc_id, section_id, raw in zip(
                pdf["doc_id"], pdf["section_id"], pdf[json_col]
            ):
                try:
                    _, confs = load_extraction_payload(json.loads(raw))
                except (json.JSONDecodeError, TypeError):
                    continue  # malformed payload: contribute no rows
                for path, c in confs.items():
                    out["doc_id"].append(doc_id)
                    out["section_id"].append(section_id)
                    out["attr_path"].append(path)
                    out["confidence"].append(c["confidence"])
                    out["confidence_threshold"].append(c["confidence_threshold"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "section_id", json_col).mapInPandas(
        run, CONFIDENCE_SCHEMA
    )
