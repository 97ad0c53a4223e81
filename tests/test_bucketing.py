"""Bucketed co-located join: shuffle elimination evidence (scale story).

At 100 TB, repeated joins on the same key should be bucketed so the join
is co-located — no Exchange on either side. This test materializes two
bucketed tables on the join key and asserts the join plan has zero
shuffles, vs two shuffles for the plain-parquet equivalent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(0, 10000).select(
        F.col("id").alias("o_key"),
        (F.col("id") % 100).alias("o_cust"),
        (F.rand(7) * 100).alias("o_total"),
    )
    items = spark.range(0, 50000).select(
        (F.col("id") % 10000).alias("i_okey"),
        (F.rand(11) * 10).alias("i_qty"),
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    orders.write.bucketBy(8, "o_key").sortBy("o_key").saveAsTable("b_orders")
    items.write.bucketBy(8, "i_okey").sortBy("i_okey").saveAsTable("b_items")
    return "b_orders", "b_items"


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_items = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(t_orders)
            .join(spark.table(t_items),
                  F.col("o_key") == F.col("i_okey"))
            .groupBy("o_key")
            .agg(F.sum("i_qty").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: no Exchange feeding the SortMergeJoin
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning(o_key" not in plan
        assert "Exchange hashpartitioning(i_okey" not in plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_plain_join_does_shuffle(spark, bucketed_tables):
    """Control: same data from plain DataFrames shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(0, 10000).select(F.col("id").alias("o_key"))
        items = spark.range(0, 50000).select((F.col("id") % 10000).alias("i_okey"))
        joined = orders.join(items, F.col("o_key") == F.col("i_okey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
