"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship extraction pipeline on the committed t1 fixture —
pages -> vectorized boilerplate/PDF extraction -> main-content rows.

queries()/oracle_sql(): one entry per implemented operator family from
SURVEY.md §2 (see intelligent_document_processing_on_aws_spark/
entry_queries.py for implementations + the matching DuckDB oracles).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from intelligent_document_processing_on_aws_spark.entry_queries import (  # noqa: E402
    QUERIES,
    oracles,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: main-content extraction over the t1 pages fixture."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        ensure_workers,
    )
    from intelligent_document_processing_on_aws_spark.operators.extraction import (
        extract_pages,
    )

    ensure_workers(spark)
    pages = spark.read.parquet(
        os.path.join(REPO_ROOT, "fixtures_data", "t1_pages.parquet")
    )
    return extract_pages(pages, salt_partitions=8).select(
        "url", "extracted_text", "spans_json", "lang", "confidence", "content_type"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return oracles()
