"""End-to-end Spark extraction stage vs committed goldens."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.operators.extraction import extract_pages
from intelligent_document_processing_on_aws_spark.sources.pages_source import (
    synthetic_golden,
    synthetic_pages,
)


def test_extract_matches_golden_parquet(spark, fixtures_dir):
    pages = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet"))
    golden = spark.read.parquet(os.path.join(fixtures_dir, "t1_golden.parquet"))
    result = extract_pages(pages, salt_partitions=4)

    joined = result.alias("r").join(golden.alias("g"), "url", "full_outer")
    bad = joined.where(
        ~(
            (F.col("r.extracted_text").eqNullSafe(F.col("g.extracted_text")))
            & (F.col("r.spans_json").eqNullSafe(F.col("g.spans_json")))
            & (F.col("r.content_type").eqNullSafe(F.col("g.content_type")))
            & (F.abs(F.col("r.confidence") - F.col("g.confidence")) < 1e-9)
        )
    )
    assert bad.count() == 0
    assert result.count() == 200


def test_distributed_generation_matches_build(spark, fixtures_dir):
    """Executor-side generated pages == committed parquet (seed addressing)."""
    committed = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet"))
    generated = synthetic_pages(spark, 200, partitions=4)
    a = committed.select("url", F.md5(F.col("html")).alias("h"), "text", "lang")
    b = generated.select("url", F.md5(F.col("html")).alias("h"), "text", "lang")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_extract_on_generated_pages(spark):
    pages = synthetic_pages(spark, 120, partitions=4)
    golden = synthetic_golden(spark, 120, partitions=4)
    result = extract_pages(pages)
    j = result.alias("r").join(golden.alias("g"), "url")
    mismatches = j.where(
        (F.col("r.extracted_text") != F.col("g.extracted_text"))
        | (F.col("r.spans_json") != F.col("g.spans_json"))
    ).count()
    assert mismatches == 0
    assert j.count() == 120


def test_spans_struct_column(spark, fixtures_dir):
    pages = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet"))
    res = extract_pages(pages.limit(20))
    row = res.where(F.size("spans") > 1).first()
    assert row is not None
    s0 = row.spans[0]
    assert s0.start == 0 and s0.end > 0 and s0.block_id == 0
    # offsets consistent with text
    assert row.extracted_text[s0.start : s0.end] == row.extracted_text.split("\n")[0]
