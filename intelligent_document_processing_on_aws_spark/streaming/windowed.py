"""Event-time windowed aggregation — batch and streaming variants.

The reference has no windowed/watermark semantics (SURVEY §2.13), but a
web-scale ingestion pipeline needs them for its metering/throughput feeds;
this is the standard Structured Streaming shape: event-time tumbling
windows + watermark for late data, with an identical batch expression for
backfill (and for the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_rollup(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type: count + value sum.

    Works on a batch DataFrame or a streaming one (add watermark first for
    streams)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


def streaming_windowed_rollup(events_stream: DataFrame,
                              window: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Streaming variant: watermark bounds state for late events."""
    return windowed_event_rollup(
        events_stream.withWatermark("ts", watermark), window
    )
