"""Bucketed tables: the co-located-join contract (sources/bucketed)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed by the same key with the same bucket count
    sort-merge join with ZERO Exchange (the 100 TB re-join shape); a
    plain path-written pair of the same data DOES shuffle — proving the
    bucket spec, not table size, removes the Exchange."""
    from intelligent_document_processing_on_aws_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17).alias("sig"),
    )
    stats = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("quality"),
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    try:
        write_bucketed(docs, "bktest.docs_b", "doc_id", 8)
        write_bucketed(stats, "bktest.stats_b", "doc_id", 8)
        with _forced_smj(spark):
            joined = bucketed_join(spark, "bktest.docs_b", "bktest.stats_b",
                                   "doc_id")
            n = joined.count()
            assert n == 2000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan[:2000]
            # bucket pruning metadata visible on the scan
            assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan

            # control: identical data via plain parquet paths -> Exchange
            p1, p2 = str(tmp_path / "d"), str(tmp_path / "s")
            docs.write.parquet(p1)
            stats.write.parquet(p2)
            flat = spark.read.parquet(p1).join(spark.read.parquet(p2),
                                               "doc_id")
            flat.count()
            flat_plan = flat._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in flat_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bktest.docs_b")
        spark.sql("DROP TABLE IF EXISTS bktest.stats_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")


class _forced_smj:
    """Context manager: disable broadcast joins so the planner must pick
    SortMergeJoin (the at-scale shape this test pins)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)
        return False
