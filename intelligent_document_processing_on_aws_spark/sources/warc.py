"""WARC ingestion source — Common Crawl `.warc.gz` files -> DataFrame.

The 100-TB entry point for webtext: Spark's `binaryFile` source lists
and distributes the files (gzip WARCs are not byte-range splittable, so
the FILE is the parallel unit — Common Crawl publishes ~1 GB files,
~80k per monthly crawl, far more files than executors at any cluster
size), and one Arrow pass per file runs the from-scratch record parser
(kernels/warc.py). Map-only lineage: ingestion scales exactly like the
listing.

Reference parity: the reference ingests documents from S3 objects/events
(lib/idp_common_pkg/idp_common — S3 fetch + queued processing); a
web-scale corpus arrives as WARC instead, so this source feeds the same
downstream extraction stage (`warc_pages` adapts to the pages schema
consumed by operators/extraction.extract_pages).

Dirty-data contract: a malformed record yields ONE error row (all
payload columns NULL, the message in `error`) and never kills the file
or the job — same loud-degrade convention as the decoders.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_warc(spark: SparkSession, path: str,
              record_types: tuple[str, ...] = ("response",),
              emit_text: bool = True) -> DataFrame:
    """Read `.warc.gz` (or plain `.warc`) files under `path` into one row
    per record of the requested types. Responses get their HTTP envelope
    parsed (status, de-chunk, content-decode) and, when emit_text=True,
    their payload charset-decoded to `text`. Error rows (malformed
    records) always pass the type filter — dropping them silently would
    hide corruption from the audit."""
    from ..kernels.warc import (
        WarcError,
        decode_charset,
        iter_warc_records_lenient,
        parse_http_response,
    )

    wanted = set(record_types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_val, content in zip(pdf["path"], pdf["content"]):
                rows = {f.name: [] for f in WARC_SCHEMA.fields}
                base = os.path.basename(str(path_val))

                def emit(**kw):
                    for f in WARC_SCHEMA.fields:
                        rows[f.name].append(kw.get(f.name))

                for headers, body, err in iter_warc_records_lenient(
                        bytes(content)):
                    if err is not None:
                        emit(warc_file=base, error=err)
                        continue
                    rtype = headers.get("warc-type", "")
                    if rtype not in wanted:
                        continue
                    common = {
                        "warc_file": base,
                        "record_id": headers.get("warc-record-id"),
                        "record_type": rtype,
                        "url": headers.get("warc-target-uri"),
                        "warc_date": headers.get("warc-date"),
                    }
                    if rtype in ("conversion", "metadata"):
                        # WET/WAT records: the body IS the payload (text
                        # or the JSON envelope — no HTTP envelope);
                        # Content-Type is a WARC header
                        ct = headers.get("content-type")
                        text = charset = None
                        if emit_text:
                            text, charset = decode_charset(body, ct)
                        emit(content_type=ct, charset=charset, text=text,
                             **common)
                        continue
                    if rtype != "response":
                        emit(**common)
                        continue
                    try:
                        status, http_headers, payload = \
                            parse_http_response(body)
                        ct = http_headers.get("content-type")
                        text = charset = None
                        if emit_text:
                            text, charset = decode_charset(payload, ct)
                        emit(status=status, content_type=ct,
                             charset=charset, text=text, **common)
                    except WarcError as e:
                        emit(error=f"WarcError: {e}"[:200], **common)
                if rows["warc_file"]:
                    yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(run, WARC_SCHEMA)


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC responses -> the `pages(url, warc_ts, html, text, lang)`
    schema consumed by operators/extraction.extract_pages: the full
    Common-Crawl-to-curated-corpus funnel is `warc_pages` -> extraction
    -> webfilters/quality -> dedup (jobs/ingest_warc.py drives it).
    Charset is already normalized, so html is the utf-8 re-encoding of
    the decoded text; non-200 and error records are dropped here (they
    remain auditable via read_warc itself)."""
    recs = read_warc(spark, path)
    return (
        recs.where(F.col("error").isNull() & (F.col("status") == 200))
        .select(
            F.col("url"),
            F.to_timestamp("warc_date").alias("warc_ts"),
            F.encode("text", "utf-8").alias("html"),
            F.col("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


CDX_SCHEMA = T.StructType(
    [
        T.StructField("urlkey", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("filename", T.StringType()),
    ]
)


def build_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDX index GENERATION: one pass over `.warc.gz` files -> one row
    per fetchable response capture, Common Crawl cc-index column
    conventions (SURT urlkey, 14-digit timestamp, sha1-b32 payload
    digest, COMPRESSED member (offset, length) span, absolute file
    path in `filename` so fetch_records can re-open it).

    Same 100-TB shape as read_warc: the file is the parallel unit, the
    index is a map-only projection of the archive — build once, then
    every later selection (operators/cdx.cdx_select) reads the small
    index instead of 100 TB of WARC.  Non-response records and damaged
    members are not indexed (they are auditable via read_warc; an index
    row must denote a fetchable span)."""
    import base64
    import hashlib

    from ..kernels.warc import (
        WarcError,
        iter_warc_members,
        parse_http_response,
        surt_urlkey,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_val, content in zip(pdf["path"], pdf["content"]):
                fname = str(path_val)
                if fname.startswith("file:"):
                    fname = fname[len("file:"):]
                rows = {f.name: [] for f in CDX_SCHEMA.fields}
                for off, ln, headers, body, err in iter_warc_members(
                        bytes(content)):
                    if err is not None or headers is None:
                        continue
                    if headers.get("warc-type") != "response":
                        continue
                    try:
                        status, http_headers, payload = \
                            parse_http_response(body)
                    except WarcError:
                        continue
                    url = headers.get("warc-target-uri") or ""
                    ts = "".join(
                        c for c in (headers.get("warc-date") or "")
                        if c.isdigit())[:14]
                    mime = (http_headers.get("content-type") or "").split(
                        ";")[0].strip().lower() or None
                    digest = "sha1:" + base64.b32encode(
                        hashlib.sha1(payload).digest()).decode()
                    rows["urlkey"].append(surt_urlkey(url))
                    rows["ts"].append(ts)
                    rows["url"].append(url)
                    rows["status"].append(str(status))
                    rows["mime"].append(mime)
                    rows["digest"].append(digest)
                    rows["length"].append(ln)
                    rows["offset"].append(off)
                    rows["filename"].append(fname)
                if rows["urlkey"]:
                    yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(run, CDX_SCHEMA)


REVISIT_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("profile", T.StringType()),
        T.StructField("payload_digest", T.StringType()),
        T.StructField("refers_to", T.StringType()),
        T.StructField("refers_to_uri", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_warc_revisits(spark: SparkSession, path: str) -> DataFrame:
    """Revisit records only — Common Crawl's cross-crawl dedup pointers.

    A revisit record (WARC 1.0 §6.7, profile identical-payload-digest)
    asserts "this capture's payload is byte-identical to an earlier
    capture" and carries the payload's sha1-b32 digest instead of the
    body; in recent Common Crawl monthlies a large fraction of captures
    arrive this way. Same map-only shape as read_warc: the file is the
    parallel unit, one Arrow pass per file."""
    from ..kernels.warc import iter_warc_records_lenient

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_val, content in zip(pdf["path"], pdf["content"]):
                rows = {f.name: [] for f in REVISIT_SCHEMA.fields}
                base = os.path.basename(str(path_val))

                def emit(**kw):
                    for f in REVISIT_SCHEMA.fields:
                        rows[f.name].append(kw.get(f.name))

                for headers, body, err in iter_warc_records_lenient(
                        bytes(content)):
                    if err is not None:
                        emit(warc_file=base, error=err)
                        continue
                    if headers.get("warc-type") != "revisit":
                        continue
                    emit(
                        warc_file=base,
                        record_id=headers.get("warc-record-id"),
                        url=headers.get("warc-target-uri"),
                        warc_date=headers.get("warc-date"),
                        profile=headers.get("warc-profile"),
                        payload_digest=headers.get("warc-payload-digest"),
                        refers_to=headers.get("warc-refers-to"),
                        refers_to_uri=headers.get(
                            "warc-refers-to-target-uri"),
                    )
                if rows["warc_file"]:
                    yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(run, REVISIT_SCHEMA)


def resolve_revisits(revisits: DataFrame, cdx: DataFrame) -> DataFrame:
    """Resolve revisit records against a capture index (build_cdx
    output): for each revisit, find the earlier capture whose
    (payload digest, url) matches and name its fetchable span — the
    Common-Crawl access pattern (revisit -> cc-index lookup -> ranged
    fetch of the referred bytes via fetch_records). Ties (the same
    url+digest captured more than once) resolve to the EARLIEST ts,
    then lexicographic filename/offset — deterministic min-witness.

    Output: every revisit row + (resolved, capture_ts, capture_file,
    capture_offset, capture_length). Digest-less revisits (profile
    server-not-modified) and digests never captured stay unresolved
    with NULL capture columns — an audit row, never a silent drop.

    100-TB shape: one equi-shuffle join on (digest, url) between the
    revisit table and the (small, columnar) index — the archive itself
    is never touched; only spans a caller then fetches are read."""
    cap = cdx.select(
        F.col("digest").alias("__digest"),
        F.col("url").alias("__url"),
        F.struct(
            F.col("ts").alias("ts"),
            F.col("filename").alias("filename"),
            F.col("offset").alias("offset"),
            F.col("length").alias("length"),
        ).alias("__cap"),
    ).groupBy("__digest", "__url").agg(F.min("__cap").alias("__cap"))
    joined = revisits.join(
        cap,
        (revisits["payload_digest"] == cap["__digest"])
        & (revisits["url"] == cap["__url"]),
        "left",
    )
    return joined.select(
        *[F.col(f.name) for f in revisits.schema.fields],
        F.col("__cap").isNotNull().alias("resolved"),
        F.col("__cap.ts").alias("capture_ts"),
        F.col("__cap.filename").alias("capture_file"),
        F.col("__cap.offset").alias("capture_offset"),
        F.col("__cap.length").alias("capture_length"),
    )


def fetch_records(selected: DataFrame, emit_text: bool = True) -> DataFrame:
    """Ranged fetch of SELECTED captures only — the Common-Crawl access
    pattern: never rescan the archive; read exactly the (offset, length)
    spans the index selection names.

    Input is any cdx_select output (columns filename/offset/length at
    minimum).  The plan is operators/cdx.fetch_plan's: one Exchange on
    the archive filename, offsets sorted within partitions, so each
    task walks every file monotonically — locally a seek+read per span,
    on S3 the same loop issues sequential HTTP range requests.  Each
    span decompresses independently (per-record gzip members), which is
    the whole point of the layout.  A damaged span yields one error row,
    never a task failure."""
    from ..kernels.warc import (
        WarcError,
        decode_charset,
        parse_http_response,
        parse_member_bytes,
    )
    from ..operators.cdx import fetch_plan

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        handle = {"name": None, "f": None}

        def read_span(fname: str, off: int, ln: int) -> bytes:
            if handle["name"] != fname:             # sorted walk: one open
                if handle["f"] is not None:
                    handle["f"].close()
                handle["name"], handle["f"] = fname, open(fname, "rb")
            handle["f"].seek(off)
            return handle["f"].read(ln)

        for pdf in batches:
            rows = {f.name: [] for f in WARC_SCHEMA.fields}

            def emit(**kw):
                for f in WARC_SCHEMA.fields:
                    rows[f.name].append(kw.get(f.name))

            for fname, off, ln in zip(
                    pdf["filename"], pdf["offset"], pdf["length"]):
                base = os.path.basename(str(fname))
                try:
                    chunk = read_span(str(fname), int(off), int(ln))
                    for headers, body in parse_member_bytes(chunk):
                        if headers.get("warc-type") != "response":
                            continue
                        status, http_headers, payload = \
                            parse_http_response(body)
                        ct = http_headers.get("content-type")
                        text = charset = None
                        if emit_text:
                            text, charset = decode_charset(payload, ct)
                        emit(
                            warc_file=base,
                            record_id=headers.get("warc-record-id"),
                            record_type="response",
                            url=headers.get("warc-target-uri"),
                            warc_date=headers.get("warc-date"),
                            status=status, content_type=ct,
                            charset=charset, text=text,
                        )
                except (WarcError, OSError) as e:
                    emit(warc_file=base, error=f"{type(e).__name__}: {e}"[:200])
            if handle["f"] is not None:
                handle["f"].close()
                handle["name"], handle["f"] = None, None
            if rows["warc_file"]:
                yield pd.DataFrame(rows)

    return fetch_plan(selected).mapInPandas(run, WARC_SCHEMA)


def write_wet(
    extracted: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    num_files: int | None = None,
) -> int:
    """Write extracted text as WET files (`.warc.gz` of WARC/1.0
    ``conversion`` records, per-record gzip members — the format Common
    Crawl distributes extracted text in, readable back by read_warc /
    iter_warc_members / build_cdx like any other archive).

    Distributed sink shape: each task serializes its own partition into
    ONE ``wet-<partition>.warc.gz`` (the standard custom-binary-sink
    pattern — parquet/Iceberg writers are file-per-task the same way).
    Rows are hash-partitioned by url and SORTED by url within each
    partition, and every record serializes byte-deterministically
    (uuid5 ids, MTIME=0 gzip), so the same input at the same
    ``num_files`` produces identical files — diffable, resumable
    output.  Returns the number of records written."""
    from ..kernels.warc import build_conversion_record, gzip_member

    n = num_files or extracted.rdd.getNumPartitions()
    cols = [F.col(url_col).alias("url"),
            F.col(text_col).alias("text"),
            (F.col(date_col) if date_col else F.lit(None))
            .cast("string").alias("date")]
    rows = (
        extracted.select(*cols)
        .repartition(n, "url")
        .sortWithinPartitions("url")
    )
    os.makedirs(out_dir, exist_ok=True)

    def write_part(it):
        import os as _os

        f = None
        pid = count = 0
        for r in it:
            if f is None:                           # lazy: skip empty parts
                from pyspark import TaskContext
                pid = TaskContext.get().partitionId()
                f = open(_os.path.join(out_dir, f".wet-{pid:05d}.tmp"), "wb")
            f.write(gzip_member(build_conversion_record(
                r["url"], r["text"], r["date"] or "1970-01-01T00:00:00Z")))
            count += 1
        if f is not None:
            f.close()
            _os.replace(                            # atomic publish
                _os.path.join(out_dir, f".wet-{pid:05d}.tmp"),
                _os.path.join(out_dir, f"wet-{pid:05d}.warc.gz"))
        yield count

    return sum(rows.rdd.mapPartitions(write_part).collect())


_WAT_TITLE_RE = r"(?i)<title[^>]*>([^<]*)</title>"


def wat_metadata(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    date_col: str | None = None,
) -> DataFrame:
    """Per-page link/title metadata — the content of a Common-Crawl WAT
    envelope — derived entirely Catalyst-side.

    Output: (url, date, title, links array<struct<url,text>>). The two
    regexp_extract_all passes + arrays_zip stay in whole-stage codegen
    over the scan (same native shape as linkgraph.anchor_pairs — no
    Python in the parse); at 100 TB this is a map-only projection that
    scales exactly like the scan. WAT lists ALL anchors (relative links
    included), unlike the link graph's cross-host filter.
    """
    from ..operators.linkgraph import _ANCHOR_RE

    h = F.col(html_col).cast("string")
    zipped = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(_ANCHOR_RE), F.lit(1)).alias("url"),
        F.regexp_extract_all(h, F.lit(_ANCHOR_RE), F.lit(2)).alias("text"),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        (F.col(date_col) if date_col else F.lit(None))
        .cast("string").alias("date"),
        F.regexp_extract(h, _WAT_TITLE_RE, 1).alias("title"),
        zipped.alias("links"),
    )


def write_wat(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    html_col: str = "html",
    date_col: str | None = None,
    num_files: int | None = None,
) -> int:
    """Write page metadata as WAT files (`.warc.gz` of WARC/1.0
    ``metadata`` records whose payload is a canonical-JSON envelope —
    the third member of Common Crawl's WARC/WET/WAT triple, readable
    back by iter_warc_members / read_warc like any other archive).

    Same distributed sink shape as write_wet: the html -> (title, links)
    parse happens Catalyst-side (wat_metadata), each task serializes its
    own url-hash partition into ONE ``wat-<partition>.warc.gz`` sorted by
    url, every record byte-deterministic (sorted-key compact JSON, uuid5
    ids, MTIME=0 gzip) — identical input at the same ``num_files``
    produces identical files. Returns the number of records written.
    """
    import json as _json

    from ..kernels.warc import build_metadata_record, gzip_member

    n = num_files or pages.rdd.getNumPartitions()
    rows = (
        wat_metadata(pages, url_col=url_col, html_col=html_col,
                     date_col=date_col)
        .repartition(n, "url")
        .sortWithinPartitions("url")
    )
    os.makedirs(out_dir, exist_ok=True)

    def write_part(it):
        import os as _os

        f = None
        pid = count = 0
        for r in it:
            if f is None:                           # lazy: skip empty parts
                from pyspark import TaskContext
                pid = TaskContext.get().partitionId()
                f = open(_os.path.join(out_dir, f".wat-{pid:05d}.tmp"), "wb")
            date = r["date"] or "1970-01-01T00:00:00Z"
            env = {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": r["url"],
                        "WARC-Date": date,
                    },
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {
                                "Head": {"Title": r["title"] or ""},
                                "Links": [
                                    {"url": li["url"], "text": li["text"]}
                                    for li in (r["links"] or [])
                                ],
                            }
                        }
                    },
                }
            }
            payload = _json.dumps(
                env, sort_keys=True, separators=(",", ":"),
                ensure_ascii=False,
            ).encode("utf-8")
            f.write(gzip_member(
                build_metadata_record(r["url"], date, payload)))
            count += 1
        if f is not None:
            f.close()
            _os.replace(                            # atomic publish
                _os.path.join(out_dir, f".wat-{pid:05d}.tmp"),
                _os.path.join(out_dir, f"wat-{pid:05d}.warc.gz"))
        yield count

    return sum(rows.rdd.mapPartitions(write_part).collect())


_WAT_ENV_SCHEMA = T.StructType([T.StructField("Envelope", T.StructType([
    T.StructField("WARC-Header-Metadata", T.StructType([
        T.StructField("WARC-Target-URI", T.StringType()),
        T.StructField("WARC-Date", T.StringType()),
    ])),
    T.StructField("Payload-Metadata", T.StructType([
        T.StructField("HTTP-Response-Metadata", T.StructType([
            T.StructField("HTML-Metadata", T.StructType([
                T.StructField("Head", T.StructType([
                    T.StructField("Title", T.StringType()),
                ])),
                T.StructField("Links", T.ArrayType(T.StructType([
                    T.StructField("url", T.StringType()),
                    T.StructField("text", T.StringType()),
                ]))),
            ])),
        ])),
    ])),
]))])


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """Read WAT archives back into (url, date, title, links) — the
    inverse of write_wat, so link-graph work can start from a published
    WAT instead of rescanning the WARC bytes (exactly how Common Crawl
    consumers avoid the full-archive scan).

    Shape: the record walk is the same map-only Arrow pass as read_warc;
    the JSON envelope parses with from_json (Jackson, JVM-side) — a
    malformed envelope degrades to a NULL-fields row (from_json returns
    null), never a crash."""
    recs = read_warc(spark, path, record_types=("metadata",))
    env = F.from_json(F.col("text"), _WAT_ENV_SCHEMA)["Envelope"]
    html_meta = env["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"]
    return recs.where(F.col("error").isNull()).select(
        F.coalesce(env["WARC-Header-Metadata"]["WARC-Target-URI"],
                   F.col("url")).alias("url"),
        env["WARC-Header-Metadata"]["WARC-Date"].alias("date"),
        html_meta["Head"]["Title"].alias("title"),
        html_meta["Links"].alias("links"),
    )
