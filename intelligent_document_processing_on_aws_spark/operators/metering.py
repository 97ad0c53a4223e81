"""Metering merge + cost computation (reference aggregation parity).

- merge_metering: the reference's nested `{service_api: {unit: value}}`
  additive merge with str->float coercion (utils/__init__.py:76-113)
  becomes explode-to-rows + one groupBy().sum() — map-side combined, the
  canonical Spark counters shape.
- with_costs: join a (service_api, unit, unit_cost) pricing dimension and
  multiply (save_reporting_data.py:949-995 cost computation), producing the
  metering reporting-table rows (:1020-1032 schema analog).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METERING_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("document_id", T.StringType()),
        T.StructField("service_api", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def explode_metering(df: DataFrame, json_col: str = "metering_json",
                     id_col: str = "document_id") -> DataFrame:
    """(id, metering_json) -> one row per (service_api, unit, value); string
    values are float-coerced, unparseable values drop to 0.0 (reference
    coercion semantics, utils/__init__.py:97-106)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("document_id", "service_api", "unit", "value")}
            for doc, mj in zip(pdf[id_col], pdf[json_col]):
                data = json.loads(mj) if mj else {}
                for api, units in data.items():
                    for unit, value in units.items():
                        try:
                            v = float(value)
                        except (TypeError, ValueError):
                            v = 0.0
                        out["document_id"].append(str(doc))
                        out["service_api"].append(api)
                        out["unit"].append(unit)
                        out["value"].append(v)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias(id_col), json_col).mapInPandas(
        run, METERING_ROWS_SCHEMA
    )


def merge_metering(rows: DataFrame, *group_cols: str) -> DataFrame:
    """Additive merge across documents: groupBy(service_api, unit [, ...])."""
    keys = list(group_cols) or []
    return rows.groupBy("service_api", "unit", *keys).agg(
        F.sum("value").alias("value"),
        F.count_distinct("document_id").alias("n_documents"),
    )


def with_costs(merged: DataFrame, pricing: DataFrame) -> DataFrame:
    """pricing: (service_api, unit, unit_cost). estimated_cost = value x
    unit_cost; unmatched rows cost 0 (reference default pricing fallback)."""
    p = pricing.select("service_api", "unit", "unit_cost")
    return (
        merged.join(F.broadcast(p), ["service_api", "unit"], "left")
        .withColumn("unit_cost", F.coalesce("unit_cost", F.lit(0.0)))
        .withColumn("estimated_cost", F.col("value") * F.col("unit_cost"))
    )
