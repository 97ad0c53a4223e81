"""Summarization, assessment, metering, markdown pagination, CSV convert."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.config import eval_config_rows
from intelligent_document_processing_on_aws_spark.kernels.csv_convert import (
    csv_to_markdown,
    sheets_to_markdown,
)
from intelligent_document_processing_on_aws_spark.kernels.markdown_pages import (
    markdown_to_pages,
)
from intelligent_document_processing_on_aws_spark.operators.assessment import (
    assess_attributes,
    threshold_alerts,
)
from intelligent_document_processing_on_aws_spark.operators.metering import (
    explode_metering,
    merge_metering,
    with_costs,
)
from intelligent_document_processing_on_aws_spark.operators.summarize import (
    assemble_document_markdown,
    summarize_sections,
)


def test_markdown_pagination_header_carryover():
    """a page break mid-table re-inserts header + separator
    (document_converter.py:1368-1397 parity)."""
    header = "| A | B |"
    sep = "| --- | --- |"
    rows = [f"| a{i} | b{i} |" for i in range(120)]
    md = "\n".join(["intro text", header, sep] + rows)
    pages = markdown_to_pages(md)
    assert len(pages) == 2
    # lines_per_page = (1650-150)//18 = 83
    assert pages[0].split("\n")[1] == header
    p2 = pages[1].split("\n")
    assert p2[0] == header and p2[1] == sep  # carryover
    assert p2[2] == rows[83 - 3]  # continuation row follows


def test_markdown_pagination_no_table():
    md = "\n".join(f"line {i}" for i in range(200))
    pages = markdown_to_pages(md)
    assert len(pages) == 3
    assert pages[1].split("\n")[0] == "line 83"


def test_csv_to_markdown_formats():
    csv_text = "Item,Qty,Price\nwidget,2,1234.5\ngadget,1000,0.25\n"
    md = csv_to_markdown(csv_text)
    lines = md.split("\n")
    assert lines[0] == "| Item | Qty | Price |"
    assert lines[2] == "| widget | 2 | 1,234.5 |"
    assert lines[3] == "| gadget | 1,000 | 0.25 |"


def test_csv_mixed_column_stays_string():
    md = csv_to_markdown("a,b\n1,x\n2,y\n")
    assert "| 1 | x |" in md


def test_sheets_markdown_headers_only_when_multi():
    one = sheets_to_markdown({"Sheet1": "a,b\n1,2\n"})
    assert "## Sheet1" not in one
    two = sheets_to_markdown({"S1": "a\n1\n", "S2": "b\n2\n"})
    assert "## S1" in two and "## S2" in two


def test_summarize_and_assemble(spark):
    rows = [
        (1, "1", "invoice", " ".join(f"w{i}" for i in range(50))),
        (1, "2", "webpage", "short text"),
        (2, "1", "bank_statement", " ".join(f"x{i}" for i in range(30))),
    ]
    secs = spark.createDataFrame(
        rows, "doc_id long, section_id string, classification string, section_text string"
    )
    summ = {(r.doc_id, r.section_id): r.summary
            for r in summarize_sections(secs).collect()}
    assert summ[(1, "1")] == " ".join(f"w{i}" for i in range(25))
    assert summ[(1, "2")] == "short text"

    docs = {r.doc_id: r for r in
            assemble_document_markdown(summarize_sections(secs)).collect()}
    md = docs[1].document_markdown
    assert md.startswith("# Document 1")
    assert "## Table of Contents" in md
    assert "- [Section 1: invoice](#section-1)" in md
    assert "## Section 2: webpage" in md
    assert docs[1].n_sections == 2
    # section order is numeric
    assert md.index("## Section 1:") < md.index("## Section 2:")


def test_assessment_confidence_tiers(spark):
    flat = spark.createDataFrame(
        [
            (1, "1", "invoice", "invoice_number", "INV-1"),     # verbatim
            (1, "1", "invoice", "vendor_name", "ACME CORP."),   # normalized only
            (1, "1", "invoice", "total", "99.99"),              # ungrounded
            (1, "1", "invoice", "date", None),                  # missing
        ],
        "doc_id long, section_id string, classification string, attr_path string, value string",
    )
    secs = spark.createDataFrame(
        [(1, "1", "INVOICE NO: INV-1\nVENDOR: acme corp\nTOTAL: $5.00")],
        "doc_id long, section_id string, section_text string",
    )
    cfg = spark.createDataFrame(eval_config_rows())
    assessed = {r.attr_path: r for r in
                assess_attributes(flat, secs, cfg).collect()}
    assert assessed["invoice_number"].confidence == 0.99
    assert assessed["vendor_name"].confidence == 0.7
    assert assessed["total"].confidence == 0.1
    assert assessed["date"].confidence == 0.0
    # alerts: total (0.1 < 0.8) and date (0.0 < 0.8), vendor 0.7 < 0.8 fuzzy thr
    alerts = threshold_alerts(assess_attributes(flat, secs, cfg)).collect()
    alert_paths = {r.attr_path for r in alerts}
    assert "total" in alert_paths and "date" in alert_paths
    assert "invoice_number" not in alert_paths


def test_assessment_on_fixtures(spark, fixtures_dir):
    flat = spark.read.parquet(os.path.join(fixtures_dir, "flat_actual.parquet"))
    secs = spark.read.parquet(os.path.join(fixtures_dir, "golden_sections.parquet"))
    cfg = spark.createDataFrame(eval_config_rows())
    assessed = assess_attributes(flat, secs, cfg)
    n = assessed.count()
    assert n == flat.count()
    # perturbed values must produce some alerts, and verbatim ones none
    counts = assessed.groupBy("alert").count().collect()
    d = {r.alert: r["count"] for r in counts}
    assert d.get(True, 0) > 0 and d.get(False, 0) > 0


def test_metering_merge_and_costs(spark):
    rows = [
        ("d1", json.dumps({"ocr": {"pages": 3}, "extract": {"tokens": "1200"}})),
        ("d2", json.dumps({"ocr": {"pages": 2}, "extract": {"tokens": 800, "requests": "bad"}})),
    ]
    df = spark.createDataFrame(rows, "document_id string, metering_json string")
    exploded = explode_metering(df)
    merged = {(r.service_api, r.unit): r for r in merge_metering(exploded).collect()}
    assert merged[("ocr", "pages")].value == 5.0
    assert merged[("extract", "tokens")].value == 2000.0
    assert merged[("extract", "requests")].value == 0.0  # str->float coercion failure -> 0
    assert merged[("ocr", "pages")].n_documents == 2

    pricing = spark.createDataFrame(
        [("ocr", "pages", 0.01), ("extract", "tokens", 0.000002)],
        "service_api string, unit string, unit_cost double",
    )
    costed = {(r.service_api, r.unit): r
              for r in with_costs(merge_metering(exploded), pricing).collect()}
    assert costed[("ocr", "pages")].estimated_cost == pytest.approx(0.05)
    assert costed[("extract", "requests")].estimated_cost == 0.0


# ---------------------------------------------------------------------------
# SummaryMarkdownFormatter parity kernel (markdown_formatter.py:15-418)
# ---------------------------------------------------------------------------


def test_summary_md_remove_existing_title():
    from intelligent_document_processing_on_aws_spark.kernels.summary_md import (
        remove_existing_title,
    )

    # section-name variation at any heading level is stripped
    assert remove_existing_title("## Bank Statement\nbody here",
                                 "bank_statement") == "body here"
    assert remove_existing_title("# bank_statement\nbody", "bank_statement") == "body"
    # LLM-style generic heading is stripped even when it matches no variation
    assert remove_existing_title("## Summary of Document\n\nbody",
                                 "invoice") == "body"
    # plain body untouched
    assert remove_existing_title("no heading here", "invoice") == "no heading here"
    # heading-only content degrades to empty
    assert remove_existing_title("## Invoice", "invoice") == ""


def test_summary_md_citation_rewrite():
    from intelligent_document_processing_on_aws_spark.kernels.summary_md import (
        process_citations,
    )

    raw = ("total due [[Cite-1, Page-3]](#cite-1-page-3)\n\nReferences\n"
           '[Cite-1, Page-3]: <a id="cite-1-page-3"></a> source doc')
    out = process_citations(raw, "Bank Statement")
    assert "[[Bank-Statement-Cite-1, Page-3]](#bank-statement-cite-1-page-3)" in out
    assert "References for Bank Statement" in out
    assert '[Bank-Statement-Cite-1, Page-3]: <a id="bank-statement-cite-1-page-3"></a>' in out
    # content without citations passes through untouched
    assert process_citations("plain", "X") == "plain"


def test_summary_md_toc_anchors_and_separators():
    from intelligent_document_processing_on_aws_spark.kernels.summary_md import (
        format_document_summary,
    )

    md = format_document_summary(
        [("1", "bank_statement", "alpha"), ("2", None, "beta")]
    )
    assert md.startswith("# Document Summary\n\n# Table of Contents\n")
    assert "1. [Bank Statement](#1-bank-statement)" in md
    assert "2. [Section 2](#2-section-2)" in md
    assert '## 1. Bank Statement <a id="1-bank-statement"></a>' in md
    assert "[Back to Top](#table-of-contents)" in md
    assert md.count("\n\n---\n\n") == 1  # separator between, not after last
    # include_toc=False: no TOC, no back-to-top
    md2 = format_document_summary([("1", "invoice", "x")], include_toc=False)
    assert "Table of Contents" not in md2 and "Back to Top" not in md2


def test_summary_operator_matches_golden(spark, fixtures_dir):
    import os

    from intelligent_document_processing_on_aws_spark.operators.summarize import (
        format_document_summaries,
    )

    secs = spark.read.parquet(os.path.join(fixtures_dir, "summary_sections.parquet"))
    golden = {r.doc_id: r.summary_markdown for r in spark.read.parquet(
        os.path.join(fixtures_dir, "golden_summary_markdown.parquet")).collect()}
    got = {r.doc_id: r.summary_markdown for r in
           format_document_summaries(secs, content_col="content").collect()}
    assert got == golden


def test_bbox_geometry_conversion(spark):
    """granular_service.py:1238-1310 parity: 0-1000 scale -> 0-1, min/max
    reorder, malformed bbox or missing page -> NULL geometry."""
    from pyspark.sql import functions as F

    from intelligent_document_processing_on_aws_spark.operators.assessment import (
        bbox_geometry,
    )

    df = spark.createDataFrame(
        [(1, [700, 900, 100, 200], 3),     # unordered: x2,y2 first
         (2, [100, 200, 700], 1),          # malformed: 3 coords
         (3, [0, 0, 1000, 1000], None)],   # missing page
        "id long, bbox array<int>, page int",
    )
    out = {r.id: r.g for r in df.select(
        "id", bbox_geometry(F.col("bbox"), F.col("page")).alias("g")).collect()}
    g = out[1]
    assert g.page == 3
    assert (g.boundingBox.left, g.boundingBox.top) == (0.1, 0.2)
    assert (g.boundingBox.width, g.boundingBox.height) == (0.6, 0.7)
    assert out[2] is None and out[3] is None


def test_remove_title_leading_newline_quirk():
    """Faithful reference quirk (markdown_formatter.py:176-184): heading
    match tests content.lstrip() but the split runs on the ORIGINAL
    string, so a leading newline means only the blank line is consumed and
    the duplicate title survives to the generic-heading pass."""
    from intelligent_document_processing_on_aws_spark.kernels.summary_md import (
        remove_existing_title,
    )

    out = remove_existing_title("\n## Invoice\n## Other\nbody", "invoice")
    # first pass eats the blank line, generic pass eats '## Invoice',
    # '## Other' survives — byte-identical to the reference's behavior
    assert out == "## Other\nbody"


def test_granular_task_dim_batching():
    """Task decomposition mirrors granular_service.py:525-664: simples batch
    by 3 in config order, the task counter continues into group tasks."""
    from intelligent_document_processing_on_aws_spark.config import DOC_CLASSES
    from intelligent_document_processing_on_aws_spark.operators.assessment import (
        granular_task_dim,
    )

    dim = {(r["classification"], r["attr_name"]): (r["task_id"], r["task_type"])
           for r in granular_task_dim(DOC_CLASSES)}
    # bank_statement: 2 simples -> one batch (id 0); group continues as 1
    assert dim[("bank_statement", "Account Number")] == ("simple_batch_0", "simple_batch")
    assert dim[("bank_statement", "Statement Period")] == ("simple_batch_0", "simple_batch")
    assert dim[("bank_statement", "Account Holder Address")] == ("group_1", "group")
    # list attrs get no dim row (per-item ids are data-dependent)
    assert ("bank_statement", "Transactions") not in dim
    # invoice: 4 simples -> batch 0 (first 3) + batch 1 (vendor_name)
    assert dim[("invoice", "invoice_number")] == ("simple_batch_0", "simple_batch")
    assert dim[("invoice", "date")] == ("simple_batch_0", "simple_batch")
    assert dim[("invoice", "vendor_name")] == ("simple_batch_1", "simple_batch")


def test_granular_task_dim_batch_size_and_counter():
    """With batch size 1 each simple is its own task and groups continue the
    counter (reference task_counter semantics)."""
    from intelligent_document_processing_on_aws_spark.operators.assessment import (
        granular_task_dim,
    )

    classes = {"c": {"attributes": [
        {"name": "a", "type": "simple"},
        {"name": "b", "type": "simple"},
        {"name": "g", "type": "group", "group": []},
        {"name": "h", "type": "group", "group": []},
    ]}}
    dim = {r["attr_name"]: r["task_id"] for r in granular_task_dim(classes, 1)}
    assert dim == {"a": "simple_batch_0", "b": "simple_batch_1",
                   "g": "group_2", "h": "group_3"}


def test_granular_assess_spark(spark):
    """granular_assess tags every attribute with its task; confidences equal
    the standard assess_attributes output (granular_service aggregation
    shape-compat, :1077-1199)."""
    from intelligent_document_processing_on_aws_spark.config import DOC_CLASSES
    from intelligent_document_processing_on_aws_spark.operators.assessment import (
        granular_assess,
        granular_task_dim,
    )

    flat = spark.createDataFrame(
        [
            (1, "1", "bank_statement", "Account Number", "AC-9"),
            (1, "1", "bank_statement", "Statement Period", "Jan 2024"),
            (1, "1", "bank_statement", "Account Holder Address.City", "Oslo"),
            (1, "1", "bank_statement", "Transactions[0].Date", "01-02"),
            (1, "1", "bank_statement", "Transactions[11].Amount", "4.50"),
        ],
        "doc_id long, section_id string, classification string, attr_path string, value string",
    )
    secs = spark.createDataFrame(
        [(1, "1", "ACCOUNT NO: AC-9\nCITY: Oslo\nTXN 01-02 | coffee | 4.50")],
        "doc_id long, section_id string, section_text string",
    )
    cfg = spark.createDataFrame(eval_config_rows())
    dim = spark.createDataFrame(granular_task_dim(DOC_CLASSES))
    out = {r.attr_path: r for r in granular_assess(flat, secs, cfg, dim).collect()}
    assert out["Account Number"].task_id == "simple_batch_0"
    assert out["Account Number"].task_type == "simple_batch"
    assert out["Account Holder Address.City"].task_id == "group_1"
    assert out["Account Holder Address.City"].task_type == "group"
    assert out["Transactions[0].Date"].task_id == "list_Transactions_item_0"
    assert out["Transactions[11].Amount"].task_id == "list_Transactions_item_11"
    assert out["Transactions[0].Date"].task_type == "list_item"
    # confidence identical to the non-granular path
    base = {r.attr_path: r.confidence
            for r in assess_attributes(flat, secs, cfg).collect()}
    assert {p: r.confidence for p, r in out.items()} == base
