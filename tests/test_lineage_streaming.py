"""Resume-from-checkpoint, streaming extraction, multimodal plumbing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.operators.multimodal import (
    extract_features,
    frame_sample,
)
from intelligent_document_processing_on_aws_spark.plans.lineage import (
    assert_no_duplicates,
    run_with_resume,
)
from intelligent_document_processing_on_aws_spark.sources.pages_source import synthetic_pages
from intelligent_document_processing_on_aws_spark.streaming.stream_extract import (
    start_extract_stream,
)


def test_resume_no_duplicates(spark, tmp_path):
    """Kill-and-rerun semantics: first run commits half the corpus, resume
    processes only the remainder; no url duplicated, all urls present."""
    out = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")
    all_pages = synthetic_pages(spark, 120, partitions=4)
    first_half = all_pages.where(F.xxhash64("url") % 2 == 0)

    r1 = run_with_resume(spark, first_half, out, lineage, salt_partitions=4)
    assert r1["processed"] > 0

    # "resume" over the full input: only the unprocessed urls run
    r2 = run_with_resume(spark, all_pages, out, lineage, salt_partitions=4)
    assert r2["processed"] + r2["skipped"] == 120
    assert r2["skipped"] == r1["processed"]

    assert assert_no_duplicates(spark, out) == 120
    # idempotent third run: nothing to do
    r3 = run_with_resume(spark, all_pages, out, lineage, salt_partitions=4)
    assert r3["processed"] == 0 and r3["skipped"] == 120

    lin = spark.read.parquet(lineage)
    assert lin.count() > 0
    assert lin.agg(F.sum("n_errors")).first()[0] == 0


def test_streaming_extract_matches_batch(spark, tmp_path, fixtures_dir):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    pages = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet"))
    pages.limit(60).write.parquet(src)

    q = start_extract_stream(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)

    result = spark.read.parquet(out)
    golden = spark.read.parquet(os.path.join(fixtures_dir, "t1_golden.parquet"))
    j = result.join(golden, "url")
    assert j.count() == 60
    assert j.where(
        result["extracted_text"] != golden["extracted_text"]
    ).count() == 0

    # restart with same checkpoint: no new data -> no duplicates
    q2 = start_extract_stream(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 60


def test_multimodal_features(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", (640, 480, None, None)),
        (2, "audio", b"RIFF fake wav", (None, None, 16000, None)),
        (3, "video", b"\x00\x00ftyp fake", (1920, 1080, None, 95)),
    ]
    df = spark.createDataFrame(
        rows,
        "item_id long, modality string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    feats = {r.item_id: r for r in extract_features(df).collect()}
    assert feats[1].n_bytes == len(b"\x89PNG fake bytes")
    assert len(feats[2].features) == 8
    assert all(0.0 <= x <= 1.0 for x in feats[3].features)
    # determinism
    again = {r.item_id: r for r in extract_features(df).collect()}
    assert again[1].features == feats[1].features
    assert again[1].payload_sha1 == feats[1].payload_sha1

    # decode path is a clearly-marked stub
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(df, decode=True).collect()

    # frame sampling fan-out: n_frames=95 every 10 -> 10 rows
    fs = frame_sample(df, every_n=10).collect()
    assert len(fs) == 10
    assert [r.frame_idx for r in fs] == list(range(0, 95, 10))


def test_windowed_rollup_stream_equals_batch(spark, tmp_path):
    """Streaming windowed agg (with watermark) over a drained file source
    equals the batch expression on the same data."""
    import datetime as dt

    from intelligent_document_processing_on_aws_spark.streaming.windowed import (
        streaming_windowed_rollup,
        windowed_event_rollup,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), f"t{i % 3}", float(i))
        for i in range(100)
    ]
    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_windowed_rollup(stream, "1 hour", "0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    # append mode only emits windows finalized by the watermark: windows
    # whose end <= max event time (watermark delay 0). The final in-flight
    # window stays in state — expected Structured Streaming semantics.
    max_ts = max(r[1] for r in rows)
    want = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_rollup(df, "1 hour").collect()
        if r.window_start + dt.timedelta(hours=1) <= max_ts
    }
    assert got == want and len(want) > 10


def test_stateful_streaming_dedup(spark, tmp_path, fixtures_dir):
    """applyInPandasWithState dedup: duplicates across micro-batches are
    suppressed; state survives between triggers via the checkpoint."""

    from intelligent_document_processing_on_aws_spark.streaming.stateful_dedup import (
        stream_dedup,
    )

    src = str(tmp_path / "dd_src")
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    os.makedirs(src)
    pages = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet"))
    batch1 = pages.limit(40)
    batch1.write.parquet(src + "/b1.parquet")

    def run_trigger():
        stream = spark.readStream.schema(pages.schema).parquet(src + "/*.parquet")
        q = (
            stream_dedup(stream, n_buckets=8)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_trigger()
    n1 = spark.read.parquet(out).count()
    assert n1 == 40

    # batch 2: 20 duplicates of batch 1 + 20 new pages
    dup = pages.limit(20)
    new = pages.orderBy("url").limit(60).subtract(batch1).limit(20)
    dup.unionAll(new).write.parquet(src + "/b2.parquet")
    run_trigger()

    final = spark.read.parquet(out)
    assert final.count() == 60  # 40 + 20 new, 20 dups suppressed by state
    assert final.select("content_hash").distinct().count() == 60


def test_streaming_mixed_formats_matches_batch(spark, tmp_path, fixtures_dir):
    """Real %PDF, CSV (extension-routed via url), HTML and office payloads
    flow through the SAME streaming extraction unchanged — streamed output
    equals the batch run row-for-row, all content types represented."""
    import os

    from pyspark.sql import functions as F

    from intelligent_document_processing_on_aws_spark.operators.extraction import (
        extract_pages,
    )
    from intelligent_document_processing_on_aws_spark.streaming.stream_extract import (
        start_extract_stream,
    )

    html = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet")).limit(20)
    pdfs = spark.read.parquet(os.path.join(fixtures_dir, "realpdf_pages.parquet")).limit(20)
    csvs = (
        spark.read.parquet(os.path.join(fixtures_dir, "csv_docs.parquet")).limit(20)
        .select(
            F.concat(F.lit("https://x.example/"), F.col("doc_id").cast("string"),
                     F.lit(".csv")).alias("url"),
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
    )
    ocr = (
        spark.read.parquet(os.path.join(fixtures_dir, "ocrblocks_docs.parquet"))
        .limit(20)
        .select(
            F.concat(F.lit("https://x.example/ocr/"), F.col("doc_id").cast("string"),
                     F.lit(".json")).alias("url"),
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.encode(F.col("blocks_json"), "utf-8").alias("html"),
            F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
    )
    xls = (
        spark.read.parquet(os.path.join(fixtures_dir, "xls_docs.parquet"))
        .limit(20)
        .select(
            F.col("url"),
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
    )
    docb = (
        spark.read.parquet(os.path.join(fixtures_dir, "doc_docs.parquet"))
        .limit(20)
        .select(
            F.col("url"),
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
    )
    rtf = (
        spark.read.parquet(os.path.join(fixtures_dir, "rtf_docs.parquet"))
        .limit(20)
        .select(
            F.col("url"),
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit("").alias("text"), F.lit("en").alias("lang"),
        )
    )
    mixed = (html.unionByName(pdfs).unionByName(csvs).unionByName(ocr)
             .unionByName(xls).unionByName(docb).unionByName(rtf))
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    mixed.write.parquet(in_dir)

    q = start_extract_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)
    streamed = spark.read.parquet(out_dir)
    batch = extract_pages(spark.read.parquet(in_dir))

    s_rows = {(r.url, r.content_type, r.extracted_text) for r in streamed.collect()}
    b_rows = {(r.url, r.content_type, r.extracted_text) for r in batch.collect()}
    assert s_rows == b_rows
    types = {r.content_type for r in streamed.collect()}
    assert {"html", "pdf", "csv", "ocr_json", "xls", "doc", "rtf"} <= types


def test_document_status_lifecycle(spark, tmp_path):
    """Tracking-service analog (models.py Status + docs_service updates):
    per-doc transitions append, latest = furthest stage, FAILED outranks
    COMPLETED, unknown status rejected."""
    from intelligent_document_processing_on_aws_spark.plans.status import (
        append_status,
        latest_status,
        status_counts,
    )

    wh = str(tmp_path / "wh")
    ids = lambda *v: spark.createDataFrame([(x,) for x in v], "doc_id long")  # noqa: E731
    append_status(ids(1, 2, 3), "QUEUED", wh)
    append_status(ids(1, 2, 3), "CLASSIFYING", wh)
    append_status(ids(1, 2), "EXTRACTING", wh)
    append_status(ids(1), "COMPLETED", wh)
    append_status(ids(2), "FAILED", wh)

    latest = {r.doc_id: r.status for r in latest_status(spark, wh).collect()}
    assert latest == {1: "COMPLETED", 2: "FAILED", 3: "CLASSIFYING"}
    assert status_counts(spark, wh) == {"COMPLETED": 1, "FAILED": 1,
                                        "CLASSIFYING": 1}
    # FAILED outranks COMPLETED (a failure is never masked)
    append_status(ids(1), "FAILED", wh)
    assert {r.doc_id: r.status for r in
            latest_status(spark, wh).collect()}[1] == "FAILED"
    # duplicate appends are idempotent for latest_status
    append_status(ids(3), "CLASSIFYING", wh)
    assert {r.doc_id: r.status for r in
            latest_status(spark, wh).collect()}[3] == "CLASSIFYING"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        append_status(ids(1), "NOT_A_STATUS", wh)


def test_manifest_parser_parity(tmp_path, spark, fixtures_dir):
    """CLI ManifestParser semantics (manifest_parser.py:20-169): CSV and
    JSON (array / documents-key) forms, s3/local auto-typing, baseline
    passthrough, row-numbered errors, and the Spark batch read over the
    listed local inputs."""
    import json

    from intelligent_document_processing_on_aws_spark.plans.manifest import (
        parse_manifest,
        validate_manifest,
    )

    t1 = os.path.join(fixtures_dir, "t1_pages.parquet")
    csv_m = tmp_path / "m.csv"
    csv_m.write_text(
        "document_path,baseline_source\n"
        f"{t1},\n"
        "s3://bucket/key/doc.pdf,s3://bucket/base/doc.json\n"
    )
    docs = parse_manifest(str(csv_m))
    assert docs[0]["type"] == "local" and docs[0]["baseline_source"] is None
    assert docs[1] == {"path": "s3://bucket/key/doc.pdf", "type": "s3",
                       "filename": "doc.pdf",
                       "baseline_source": "s3://bucket/base/doc.json"}

    for payload in ([{"path": t1}], {"documents": [{"path": t1}]}):
        j = tmp_path / "m.json"
        j.write_text(json.dumps(payload))
        assert parse_manifest(str(j))[0]["type"] == "local"

    # row-numbered errors; validate_manifest never raises
    bad = tmp_path / "bad.csv"
    bad.write_text("document_path,baseline_source\n,orphan-baseline\n")
    ok, err = validate_manifest(str(bad))
    assert not ok and "Row 2" in err
    missing = tmp_path / "missing.csv"
    missing.write_text("document_path\n/no/such/file.parquet\n")
    ok, err = validate_manifest(str(missing))
    assert not ok and "not found" in err
    ok, err = validate_manifest(str(tmp_path / "m.yaml"))
    assert not ok and "Unsupported manifest format" in err

    # the batch surface: Spark reads every local input the manifest names
    local_paths = [d["path"] for d in parse_manifest(str(csv_m))
                   if d["type"] == "local"]
    assert spark.read.parquet(*local_paths).count() == 200
