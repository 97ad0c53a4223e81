"""Spark extraction stage: pages -> main-content rows.

The narrow hot path of the engine: one Arrow-batched ``mapInPandas`` over
the `pages` table calling the pure per-page kernel
(kernels/extract.extract_page). No shuffle is introduced by the transform
itself; optional salted repartitioning by url-hash handles giant-host input
skew before the map (SURVEY.md §4 "Skew handling").

Replaces the reference's OCR/classification/extraction Lambda fan-out
(lib/idp_common_pkg/idp_common/ocr/service.py:316-491) with a single
vectorized stage. Zero per-row Python at the plan level: the physical plan
contains only a MapInPandas/ArrowEvalPython node, never BatchEvalPython
(tests/test_plan_vectorized.py asserts this).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.extract import extract_page_safe

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType()),
                        T.StructField("end", T.IntegerType()),
                        T.StructField("block_id", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField("spans_json", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        out = {
            "url": pdf["url"].to_numpy(),
            "warc_ts": pdf["warc_ts"].to_numpy(),
            "lang": pdf["lang"].to_numpy(),
            "content_type": [None] * n,
            "extracted_text": [None] * n,
            "spans": [None] * n,
            "spans_json": [None] * n,
            "confidence": [0.0] * n,
            "n_blocks": [0] * n,
            "error": [None] * n,
        }
        urls = out["url"]
        for i, content in enumerate(pdf["html"]):
            ctype, res, err = extract_page_safe(bytes(content), urls[i])
            out["content_type"][i] = ctype
            out["error"][i] = err
            out["extracted_text"][i] = res.extracted_text
            triples = [[s.start, s.end, s.block_id] for s in res.spans]
            out["spans"][i] = [
                {"start": a, "end": b, "block_id": c} for a, b, c in triples
            ]
            out["spans_json"][i] = json.dumps(triples, separators=(",", ":"))
            out["confidence"][i] = res.confidence
            out["n_blocks"][i] = res.n_blocks
        yield pd.DataFrame(out)


def extract_pages(pages: DataFrame, salt_partitions: int | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> extraction result rows.

    salt_partitions: when set, repartition by pmod(xxhash64(url), P) first —
    spreads a giant host's pages evenly across P partitions (url-hash salt),
    the skew strategy SURVEY.md §4 calls out for 100 TB inputs.
    """
    cols = ["url", "warc_ts", "html", "lang"]
    src = pages.select(*cols)
    if salt_partitions:
        src = src.repartition(
            salt_partitions, F.pmod(F.xxhash64("url"), F.lit(salt_partitions))
        )
    return src.mapInPandas(_extract_batches, RESULT_SCHEMA)
