"""Bucketed warehouse tables: co-located joins with no Exchange.

At 100 TB the dominant cost of re-joining large fact tables (pages ×
extraction results × per-doc signals, all keyed by doc_id/url) is the
shuffle. Spark's bucketing eliminates it: both sides written with
``bucketBy(N, key)`` hash-place rows into the same bucket files, so a
join on the bucket key sort-merges bucket-to-bucket with NO Exchange on
either side (and no sort either when ``sortBy`` matches).

This module wraps the catalog plumbing (bucketing only works through
``saveAsTable`` — plain ``.parquet()`` writes lose the bucket spec) and
is proven by tests/test_bucketed.py, which pins the physical plan of a
bucketed self-join to zero Exchanges.

Sizing guidance (SURVEY.md §4): pick n_buckets so one bucket of the
LARGER table fits an executor's memory (e.g. 100 TB / 8192 buckets ≈
12 GB); both tables must use the SAME bucket count or Spark falls back
to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a parquet table bucketed (and sorted) by ``key``."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with the bucket spec intact (catalog read — a raw
    path-based parquet read would drop it)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    SortMergeJoin over co-located buckets, zero Exchange."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key, how
    )
