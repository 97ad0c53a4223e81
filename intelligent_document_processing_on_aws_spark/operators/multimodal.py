"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as `binary` columns with a typed metadata
struct; decode/feature-extract/resize/frame-sample run as Arrow-batched
mapInPandas stages. The codec libraries (PIL/cv2/ffmpeg — used by the
reference's image pipeline, lib/idp_common_pkg/idp_common/image/
__init__.py:13-96 resize, :125-188 binarization) are NOT in this container,
so the decode step is STUBBED: `decode=False` (default) computes real,
deterministic byte-level features (the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested);
`decode=True` raises NotImplementedError at the exact point a codec would
be invoked.

Schema contract for a multimodal table:
  (item_id long, modality string, payload binary,
   meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_SCHEMA),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha1", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _byte_entropy(b: bytes) -> float:
    if not b:
        return 0.0
    import math

    counts = [0] * 256
    for x in b:
        counts[x] += 1
    n = len(b)
    return round(-sum(c / n * math.log2(c / n) for c in counts if c), 6)


def _stub_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector (sha256-seeded) standing in for the
    codec-backed extractor; replace with a real decoder in production."""
    h = hashlib.sha256(payload).digest()
    return [round(int.from_bytes(h[4 * i : 4 * i + 4], "little") / 2**32, 6)
            for i in range(dim)]


def extract_features(items: DataFrame, decode: bool = False,
                     feature_dim: int = 8) -> DataFrame:
    """Multimodal feature extraction stage (Arrow-batched).

    decode=False: byte-level features (real) + deterministic stub vector.
    decode=True: would decode media with PIL/cv2/ffmpeg — not available in
    this environment -> NotImplementedError (clearly-marked stub point)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if decode:
                raise NotImplementedError(
                    "media decode requires PIL/cv2/ffmpeg (not in this "
                    "container); run with decode=False for byte-level features"
                )
            out = {
                "item_id": pdf["item_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "payload_sha1": [hashlib.sha1(bytes(p)).hexdigest() for p in pdf["payload"]],
                "byte_entropy": [_byte_entropy(bytes(p)) for p in pdf["payload"]],
                "features": [_stub_features(bytes(p), feature_dim) for p in pdf["payload"]],
            }
            yield pd.DataFrame(out)

    return items.select("item_id", "modality", "payload").mapInPandas(run, FEATURE_SCHEMA)


def probe_image_meta(items: DataFrame) -> DataFrame:
    """Fill meta.width/height for image rows from the payload's own file
    header (stdlib PNG/JPEG/GIF parse, kernels/image_meta.py) — the
    metadata no longer depends on fixture-supplied values. Non-image rows
    and unparseable payloads keep their existing meta unchanged."""
    from ..kernels.image_meta import image_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = []
            for modality, payload, meta in zip(
                pdf["modality"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta) if meta is not None else {
                    "width": None, "height": None,
                    "sample_rate": None, "n_frames": None,
                }
                if modality == "image":
                    size = image_size(bytes(payload) if payload is not None else b"")
                    if size:
                        meta["width"], meta["height"] = size
                metas.append(meta)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return items.select("item_id", "modality", "payload", "meta").mapInPandas(
        run, MULTIMODAL_SCHEMA
    )


def frame_sample(items: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    using metadata only (decode stubbed); schema + fan-out shape are real."""
    from pyspark.sql import functions as F

    frames = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
    ).alias("frame_idx")
    return items.where(F.col("modality") == "video").select(
        "item_id", frames, F.lit(None).cast("binary").alias("frame_payload")
    )
