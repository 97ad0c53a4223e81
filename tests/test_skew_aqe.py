"""Skew handling: AQE skew-join split + the explicit salt repartition.

SURVEY.md §4 skew strategy has two layers: the explicit url-hash salt on
the extraction map (tests in test_extract_pipeline) and Spark AQE's
skew-join splitting for joins with hot keys. This file pins the AQE
layer: a join where one key carries ~all rows must plan skew=true splits
at runtime instead of sending the hot partition to one task.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class _conf:
    def __init__(self, spark, **kv):
        self.spark = spark
        self.kv = {k.replace("_", "."): v for k, v in kv.items()}

    def __enter__(self):
        self.prev = {}
        for k, v in self.kv.items():
            self.prev[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.prev.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
        return False


def test_aqe_splits_skewed_join(spark):
    """90% of fact rows share one hot key; with AQE skew-join enabled and
    thresholds sized for the fixture, the final adaptive plan marks the
    sort-merge join skew=true (hot partition split across tasks)."""
    hot = spark.range(0, 100_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(0, 10_000).select(
        (F.col("id") % 400).alias("k"), F.col("id").alias("payload"))
    fact = hot.unionAll(cold)
    dim = spark.range(0, 400).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("name"))
    with _conf(
        spark,
        **{
            "spark_sql_adaptive_enabled": "true",
            "spark_sql_adaptive_skewJoin_enabled": "true",
            "spark_sql_adaptive_skewJoin_skewedPartitionFactor": "2",
            "spark_sql_adaptive_skewJoin_skewedPartitionThresholdInBytes": "64KB",
            "spark_sql_adaptive_advisoryPartitionSizeInBytes": "64KB",
            "spark_sql_autoBroadcastJoinThreshold": "-1",
            "spark_sql_adaptive_autoBroadcastJoinThreshold": "-1",
        },
    ):
        joined = fact.join(dim, "k")
        # AQE finalizes per QueryExecution: must COLLECT the same
        # DataFrame whose plan we inspect (count() builds a fresh QE)
        rows = joined.collect()
        assert len(rows) == 110_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, plan[:1500]
