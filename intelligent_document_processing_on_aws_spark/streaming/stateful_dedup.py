"""Streaming exact dedup — custom stateful operator (applyInPandasWithState).

A training-data ingestion stream must drop re-crawled/duplicate pages
across micro-batches. State: per key-bucket, the set of content hashes
seen so far (url-hash bucketing bounds per-group state and spreads it
across partitions — the same salting idea as the batch path). Emits only
first occurrences; subsequent arrivals of the same (url, content-hash) are
suppressed for the lifetime of the stream (GroupState without timeout).

This is the Structured Streaming analog of the reference's dedupe-by-cache
retry semantics (classification cache keyed by doc, service.py:1455-1602)
generalized to content identity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("content_hash", T.StringType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()))]
)


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out_urls, out_hashes = [], []
    for pdf in pdfs:
        for url, h in zip(pdf["url"], pdf["content_hash"]):
            if h not in seen:
                seen.add(h)
                out_urls.append(url)
                out_hashes.append(h)
    state.update((list(seen),))
    yield pd.DataFrame(
        {"bucket": [key[0]] * len(out_urls), "url": out_urls,
         "content_hash": out_hashes}
    )


def stream_dedup(pages_stream: DataFrame, n_buckets: int = 64) -> DataFrame:
    """pages stream -> first-occurrence (url, content_hash) rows."""
    hashed = pages_stream.select(
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "url",
        F.md5(F.col("html")).alias("content_hash"),
    )
    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
