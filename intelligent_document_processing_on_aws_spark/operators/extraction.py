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
import pyarrow as pa
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


_SPAN_TYPE = pa.list_(
    pa.struct([
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("block_id", pa.int32()),
    ])
)


def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """Arrow-native batch transform (mapInArrow).

    The previous mapInPandas spelling built `spans` as a Python
    list-of-dicts per row and left the struct conversion to the
    pandas->Arrow bridge, which walks every dict key per span — measured
    as ~half the stage's wall time at 100k docs (2.4 s of 4.6 s). Here
    the span triples land in flat Python int lists and become ONE Arrow
    ListArray(StructArray) via from_arrays, and the url/warc_ts/lang
    columns pass through as the input Arrow buffers untouched
    (zero-copy). Row values are bit-identical — only the serialization
    path changes."""
    for rb in batches:
        n = rb.num_rows
        if n == 0:
            continue
        urls = rb.column(0).to_pylist()
        htmls = rb.column(2).to_pylist()
        ctypes: list[str | None] = []
        texts: list[str | None] = []
        spans_json: list[str] = []
        confs: list[float] = []
        nblocks: list[int] = []
        errors: list[str | None] = []
        starts: list[int] = []
        ends: list[int] = []
        bids: list[int] = []
        offsets = [0]
        for i, content in enumerate(htmls):
            ctype, res, err = extract_page_safe(
                content if isinstance(content, bytes) else bytes(content),
                urls[i],
            )
            ctypes.append(ctype)
            errors.append(err)
            texts.append(res.extracted_text)
            triples = [[s.start, s.end, s.block_id] for s in res.spans]
            for a, b, c in triples:
                starts.append(a)
                ends.append(b)
                bids.append(c)
            offsets.append(len(starts))
            spans_json.append(json.dumps(triples, separators=(",", ":")))
            confs.append(res.confidence)
            nblocks.append(res.n_blocks)
        spans = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(starts, pa.int32()),
                    pa.array(ends, pa.int32()),
                    pa.array(bids, pa.int32()),
                ],
                names=["start", "end", "block_id"],
            ),
        ).cast(_SPAN_TYPE)
        yield pa.RecordBatch.from_arrays(
            [
                rb.column(0),                        # url (zero-copy)
                rb.column(1),                        # warc_ts (zero-copy)
                rb.column(3),                        # lang (zero-copy)
                pa.array(ctypes, pa.string()),
                pa.array(texts, pa.string()),
                spans,
                pa.array(spans_json, pa.string()),
                pa.array(confs, pa.float64()),
                pa.array(nblocks, pa.int32()),
                pa.array(errors, pa.string()),
            ],
            names=[
                "url", "warc_ts", "lang", "content_type", "extracted_text",
                "spans", "spans_json", "confidence", "n_blocks", "error",
            ],
        )


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
    return src.mapInArrow(_extract_batches, RESULT_SCHEMA)
