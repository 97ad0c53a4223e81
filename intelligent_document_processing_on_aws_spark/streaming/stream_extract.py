"""Streaming ingestion: pages arrive as files -> extraction -> sink.

The reference ingests via S3 events -> SQS -> per-doc workflows
(docs/architecture.md, src/lambda/queue_sender + queue_processor); Spark's
analog is a Structured Streaming file source over the landing directory
with exactly-once sink semantics via checkpointing. The same extraction
transform (operators/extraction.extract_pages) applies unchanged —
mapInPandas is streaming-compatible.

Backpressure/admission (the reference's MAX_CONCURRENT DynamoDB counter,
queue_processor/index.py:27-68) maps to maxFilesPerTrigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.extraction import extract_pages
from ..sources.pages_source import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def start_extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream -> extraction -> parquet sink with checkpoint.

    available_now=True drains everything currently in input_dir then stops
    (batch-like test mode); False runs continuously."""
    stream = read_pages_stream(spark, input_dir)
    result = extract_pages(stream)
    writer = (
        result.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
