"""Per-section attribute extraction (the heuristic "extraction service").

One Arrow-batched mapInPandas over section rows calling the pure
config-driven regex extractor (config.extract_attributes) — the stand-in
for the reference's per-section LLM extraction
(extraction/service.py:931-1459). Emits attributes as a canonical JSON
string (sort_keys) so goldens compare byte-wise; downstream structured use
goes through from_json with the per-class schema (attribute_schema()).

Extension point parity: `extractor_fn` mirrors the reference's custom
prompt Lambda hook (extraction/service.py:862-930) — a user-supplied
callable (doc_class, text) -> dict plugged into the same vectorized stage.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import DOC_CLASSES, extract_attributes

ATTR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("section_id", T.StringType()),
        T.StructField("classification", T.StringType()),
        T.StructField("attributes_json", T.StringType()),
    ]
)


def extract_section_attributes(
    sections: DataFrame,
    classes: dict | None = None,
    extractor_fn: Callable[[str, str], dict] | None = None,
) -> DataFrame:
    classes = classes or DOC_CLASSES
    fn = extractor_fn or (lambda cls, text: extract_attributes(cls, text, classes))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            attrs = [
                json.dumps(fn(cls, text), sort_keys=True)
                for cls, text in zip(pdf["classification"], pdf["section_text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "section_id": pdf["section_id"],
                    "classification": pdf["classification"],
                    "attributes_json": attrs,
                }
            )

    cols = sections.select("doc_id", "section_id", "classification", "section_text")
    return cols.mapInPandas(run, ATTR_SCHEMA)


def attribute_schema(doc_class: str, classes: dict | None = None) -> T.StructType:
    """Per-class nested StructType for from_json over attributes_json —
    the Spark analog of the reference's dynamically built Pydantic models
    (extraction/service.py:82-156)."""
    classes = classes or DOC_CLASSES
    cfg = classes.get(doc_class, {})
    fields = []
    for attr in cfg.get("attributes", []):
        if attr["type"] == "simple":
            fields.append(T.StructField(attr["name"], T.StringType()))
        elif attr["type"] == "group":
            sub = [T.StructField(s[0], T.StringType()) for s in attr["group"]]
            fields.append(T.StructField(attr["name"], T.StructType(sub)))
        elif attr["type"] == "list":
            item = T.StructType(
                [T.StructField(f[0], T.StringType()) for f in attr["item_fields"]]
            )
            fields.append(T.StructField(attr["name"], T.ArrayType(item)))
    return T.StructType(fields)
