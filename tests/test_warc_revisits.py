"""Common-Crawl revisit resolution (sources/warc.read_warc_revisits +
resolve_revisits): cross-crawl dedup pointers resolved against the
cc-index, then ranged-fetched — the full CC revisit workflow."""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.entry_queries import (
    _ensure_revisit_fixture,
)
from intelligent_document_processing_on_aws_spark.sources.warc import (
    build_cdx,
    fetch_records,
    read_warc_revisits,
    resolve_revisits,
)

_BASE = "fixtures_data/warc"


def test_revisit_roundtrip_bytes_match_digest(spark):
    """End-to-end: every RESOLVED revisit's capture span, ranged-fetched
    from the base archive, decodes to payload bytes whose sha1-b32 equals
    the revisit's own WARC-Payload-Digest — the referred content is
    byte-recoverable from the pointer alone."""
    rdir = _ensure_revisit_fixture()
    cdx = build_cdx(spark, _BASE)
    revs = read_warc_revisits(spark, rdir)
    res = resolve_revisits(revs, cdx)

    resolved = res.where("resolved").select(
        "payload_digest",
        F.col("capture_file").alias("filename"),
        F.col("capture_offset").alias("offset"),
        F.col("capture_length").alias("length"),
        F.col("capture_ts").alias("ts"),
        F.col("url"),
    )
    want = {r["url"]: r["payload_digest"] for r in resolved.collect()}
    fetched = fetch_records(resolved, emit_text=True).collect()
    assert len(fetched) == 16
    for r in fetched:
        assert r["error"] is None
        # re-derive the digest from the fetched text re-encoded in the
        # capture's charset (the payload bytes fetch_records decoded)
        raw = r["text"].encode(r["charset"])
        got = "sha1:" + base64.b32encode(hashlib.sha1(raw).digest()).decode()
        assert got == want[r["url"]]


def test_unresolved_revisits_are_audit_rows(spark):
    """Dangling digests and digest-less server-not-modified revisits
    come back as unresolved rows with NULL capture columns — never
    dropped."""
    rdir = _ensure_revisit_fixture()
    res = resolve_revisits(
        read_warc_revisits(spark, rdir), build_cdx(spark, _BASE)
    ).collect()
    assert len(res) == 20
    un = [r for r in res if not r["resolved"]]
    assert len(un) == 4  # 2 files x (1 dangling + 1 digest-less)
    for r in un:
        assert r["capture_ts"] is None and r["capture_file"] is None
    assert sum(1 for r in un if r["payload_digest"] is None) == 2


def test_resolution_min_witness_is_deterministic(spark):
    """The same (digest, url) captured twice resolves to the EARLIEST
    ts — pinned with a synthetic index holding a duplicate capture."""
    rdir = _ensure_revisit_fixture()
    revs = read_warc_revisits(spark, rdir).limit(1)
    row = revs.collect()[0]
    cdx = spark.createDataFrame(
        [
            (row["payload_digest"], row["url"], "20250105000000",
             "b.warc.gz", 10, 5),
            (row["payload_digest"], row["url"], "20250101000000",
             "a.warc.gz", 99, 7),
        ],
        "digest string, url string, ts string, filename string, "
        "offset long, length long",
    )
    out = resolve_revisits(revs, cdx).collect()[0]
    assert out["resolved"] and out["capture_ts"] == "20250101000000"
    assert out["capture_file"] == "a.warc.gz"


def test_revisit_plan_shape(spark):
    """Plan audit: Arrow file passes (MapInPandas), the index aggregated
    then equi-joined — no row-at-a-time Python anywhere."""
    rdir = _ensure_revisit_fixture()
    df = resolve_revisits(
        read_warc_revisits(spark, rdir), build_cdx(spark, _BASE)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
