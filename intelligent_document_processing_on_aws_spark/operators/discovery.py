"""Class-schema discovery from sample documents (deterministic analog).

The reference infers new document-class schemas from sample docs with an
LLM (lib/idp_common_pkg/idp_common/discovery/classes_discovery.py, noted
in SURVEY §2.14). The deterministic Spark analog scans sample section
texts for `KEY: value` marker lines and proposes an attribute config of
the same shape config.py consumes:

- a key seen once per doc -> simple attribute (EXACT/FUZZY by value shape),
- repeated structured lines `TAG a | b | c` -> list attribute template.

All native: regexp_extract_all -> explode -> frequency aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARKER_RE = r"(?m)^([A-Z][A-Z ]{2,30}):[ \t]*(\S[^\n]*)$"


def discover_markers(docs: DataFrame, text_col: str = "text",
                     min_doc_frac: float = 0.3) -> DataFrame:
    """Candidate attribute keys: `KEY:` lines appearing in at least
    min_doc_frac of the sample docs.

    Output: (key, n_docs, doc_frac, n_numeric, numeric_frac) — numeric_frac
    drives the proposed evaluation method (NUMERIC_EXACT vs EXACT/FUZZY).
    """
    n_docs = docs.count()
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(text_col, F.lit(MARKER_RE), F.lit(1)).alias("key"),
                F.regexp_extract_all(text_col, F.lit(MARKER_RE), F.lit(2)).alias("value"),
            )
        ).alias("kv"),
    ).select("doc_id", F.col("kv.key").alias("key"), F.col("kv.value").alias("value"))
    numericish = F.translate("value", "$,()", "").try_cast("double").isNotNull()
    agg = pairs.groupBy("key").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_values"),
        F.sum(F.when(numericish, 1).otherwise(0)).alias("n_numeric"),
    )
    return (
        agg.withColumn("doc_frac", F.col("n_docs") / F.lit(float(n_docs)))
        .withColumn("numeric_frac", F.col("n_numeric") / F.col("n_values"))
        .where(F.col("doc_frac") >= min_doc_frac)
        .orderBy(F.desc("doc_frac"), "key")
    )


def propose_class_config(docs: DataFrame, class_name: str,
                         text_col: str = "text",
                         min_doc_frac: float = 0.3) -> dict:
    """A config.py-shaped class proposal from sample docs."""
    rows = discover_markers(docs, text_col, min_doc_frac).collect()
    attributes = []
    for r in rows:
        is_list = r.n_values > r.n_docs * 1.5  # repeated per doc -> list-ish
        method = "NUMERIC_EXACT" if r.numeric_frac >= 0.8 else (
            "EXACT" if r.numeric_frac == 0.0 and r.doc_frac >= 0.9 else "FUZZY"
        )
        attributes.append(
            {
                "name": r.key.title(),
                "type": "list" if is_list else "simple",
                "pattern": rf"{r.key}:\s*([^\n]+)",
                "method": method,
                **({"threshold": 0.8} if method == "FUZZY" else {}),
            }
        )
    return {"class_name": class_name, "attributes": attributes}
