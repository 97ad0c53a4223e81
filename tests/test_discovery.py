"""Schema discovery from sample docs (deterministic classes_discovery analog)."""

from __future__ import annotations

from intelligent_document_processing_on_aws_spark.operators.discovery import (
    discover_markers,
    propose_class_config,
)


def test_discover_invoice_like_schema(spark):
    rows = [
        (1, "INVOICE NO: INV-1\nTOTAL: $5.00\nVENDOR: Acme Corp\nfiller words here"),
        (2, "INVOICE NO: INV-2\nTOTAL: $6.50\nVENDOR: Beta LLC\nDATE: 2025-01-01"),
        (3, "INVOICE NO: INV-3\nTOTAL: $9.99\nVENDOR: Gamma Inc"),
        (4, "unrelated page with no markers at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    markers = {r.key: r for r in discover_markers(docs, min_doc_frac=0.5).collect()}
    assert set(markers) == {"INVOICE NO", "TOTAL", "VENDOR"}
    assert markers["TOTAL"].numeric_frac == 1.0
    assert markers["VENDOR"].numeric_frac == 0.0
    # DATE appears in only 1/4 docs -> filtered at 0.5
    cfg = propose_class_config(docs, "invoice_like", min_doc_frac=0.5)
    by_name = {a["name"]: a for a in cfg["attributes"]}
    assert by_name["Total"]["method"] == "NUMERIC_EXACT"
    assert by_name["Invoice No"]["type"] == "simple"


def test_discover_list_attribute(spark):
    txn = "\n".join(f"TXN LINE: item {i}" for i in range(5))
    rows = [(1, f"ACCOUNT NO: 1\n{txn}"), (2, f"ACCOUNT NO: 2\n{txn}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = propose_class_config(docs, "bank_like", min_doc_frac=0.5)
    by_name = {a["name"]: a for a in cfg["attributes"]}
    assert by_name["Txn Line"]["type"] == "list"
    assert by_name["Account No"]["type"] == "simple"
