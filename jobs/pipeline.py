"""End-to-end document-processing pipeline job (the §3.2 notebook chain,
Spark-shaped):

pages -> classify+section -> attribute extraction -> assessment (confidence
alerts) -> summarization -> [optional evaluation vs expected] -> reporting
warehouse (per-class section tables, metrics, alerts, summaries).

Usage:
  python jobs/pipeline.py --pages fixtures_data/packet_pages.parquet \
      --warehouse /tmp/idp_warehouse \
      [--expected fixtures_data/flat_expected.parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from intelligent_document_processing_on_aws_spark.config import eval_config_rows  # noqa: E402
from intelligent_document_processing_on_aws_spark.operators.assessment import (  # noqa: E402
    assess_attributes,
    threshold_alerts,
)
from intelligent_document_processing_on_aws_spark.operators.attributes import (  # noqa: E402
    extract_section_attributes,
)
from intelligent_document_processing_on_aws_spark.operators.classify import (  # noqa: E402
    classify_and_section,
)
from intelligent_document_processing_on_aws_spark.operators.evaluation import (  # noqa: E402
    evaluate_attributes,
    flatten_attributes,
    metrics_rollup,
)
from intelligent_document_processing_on_aws_spark.operators.summarize import (  # noqa: E402
    assemble_document_markdown,
    summarize_sections,
)
from intelligent_document_processing_on_aws_spark.session import get_spark  # noqa: E402
from intelligent_document_processing_on_aws_spark.sources.catalog import (  # noqa: E402
    list_warehouse_tables,
    write_document_sections,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--expected", help="flattened expected attrs parquet (enables evaluation)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("idp-pipeline", master=args.master)
    t0 = time.time()
    wh = args.warehouse
    counts = {}

    from intelligent_document_processing_on_aws_spark.plans.status import (
        append_status,
        status_counts,
    )

    pages = spark.read.parquet(args.pages)
    doc_ids = pages.select(F.col("doc_id")).distinct()
    doc_ids.persist()
    append_status(doc_ids, "QUEUED", wh)
    sections = classify_and_section(pages)
    sections.persist()
    counts["sections"] = sections.count()
    append_status(doc_ids, "CLASSIFYING", wh)

    attrs = extract_section_attributes(sections)
    attrs.persist()
    counts["attributed_sections"] = attrs.count()
    write_document_sections(attrs, wh, mode="overwrite")
    append_status(attrs, "EXTRACTING", wh)

    cfg = spark.createDataFrame(eval_config_rows())
    flat_actual = flatten_attributes(attrs)
    assessed = assess_attributes(flat_actual, sections, cfg)
    alerts = threshold_alerts(assessed)
    alerts.write.mode("overwrite").parquet(os.path.join(wh, "confidence_alerts"))
    counts["alerts"] = spark.read.parquet(os.path.join(wh, "confidence_alerts")).count()
    append_status(assessed, "ASSESSING", wh)

    section_summaries = summarize_sections(sections)
    summaries = assemble_document_markdown(section_summaries)
    # reference-parity combined summary (markdown_formatter.py semantics:
    # duplicate-title removal, citation prefixing, TOC/anchors/navigation)
    from intelligent_document_processing_on_aws_spark.operators.summarize import (
        format_document_summaries,
    )

    format_document_summaries(section_summaries).write.mode("overwrite").parquet(
        os.path.join(wh, "document_summaries_md")
    )
    summaries.write.mode("overwrite").parquet(os.path.join(wh, "document_summaries"))
    counts["summaries"] = summaries.count()
    append_status(summaries, "SUMMARIZING", wh)

    if args.expected:
        from intelligent_document_processing_on_aws_spark.operators.evaluation import (
            evaluation_report,
        )

        expected = spark.read.parquet(args.expected)
        counted = evaluate_attributes(expected, flat_actual, cfg)
        by_class = metrics_rollup(counted, "classification")
        by_class.withColumn("date", F.lit("2025-01-01")).write.mode(
            "overwrite"
        ).partitionBy("date").parquet(os.path.join(wh, "evaluation_metrics_by_class"))
        # overall metrics land in the warehouse like the by-class table
        # (no driver round-trip of the result); the job summary reads the
        # single aggregated row back from the committed table
        metrics_rollup(counted).withColumn("date", F.lit("2025-01-01")).write.mode(
            "overwrite"
        ).partitionBy("date").parquet(os.path.join(wh, "evaluation_metrics_overall"))
        # the report's Confidence columns consume the UPSTREAM assessment
        # (the reference reads explainability_info from the stored result)
        evaluation_report(
            counted,
            assessed.select("doc_id", "section_id", "attr_path",
                            "confidence", "confidence_threshold"),
        ).write.mode("overwrite").parquet(os.path.join(wh, "evaluation_reports"))
        counts["eval_reports"] = spark.read.parquet(
            os.path.join(wh, "evaluation_reports")
        ).count()
        overall = spark.read.parquet(
            os.path.join(wh, "evaluation_metrics_overall")
        ).collect()[0]
        counts["eval_f1"] = round(overall.f1_score, 4)
        counts["eval_accuracy"] = round(overall.accuracy, 4)
        append_status(counted, "EVALUATING", wh)

    # terminal status from the FINAL stage's actual output: a doc that
    # dropped out mid-pipeline (no attributed sections) must read FAILED,
    # not COMPLETED — this is what makes plans/status.py's
    # FAILED-outranks-COMPLETED window live in the shipped job
    finished_ids = attrs.select("doc_id").distinct()
    append_status(finished_ids, "COMPLETED", wh)
    failed_ids = doc_ids.join(finished_ids, "doc_id", "left_anti")
    append_status(failed_ids, "FAILED", wh)
    counts["failed_docs"] = failed_ids.count()
    print(json.dumps({
        "warehouse_tables": list_warehouse_tables(spark, wh),
        "counts": counts,
        "status": status_counts(spark, wh),
        "sec": round(time.time() - t0, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
