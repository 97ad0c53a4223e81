"""Materialize committed fixture parquet under fixtures_data/.

Run: python -m intelligent_document_processing_on_aws_spark.fixtures.build

Writes (pyarrow, no Spark needed; byte-stable given the seed-addressed
generator):
  fixtures_data/t1_pages.parquet    200 rows  (pytest fast path)
  fixtures_data/t2_pages.parquet   5000 rows  (full byte-identity sweep;
                                               driver-oracle input)
  fixtures_data/t1_golden.parquet / t2_golden.parquet  golden outputs
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .pages_gen import GOLDEN_COLS, INPUT_COLS, gen_pages

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURES_DIR = os.path.join(REPO_ROOT, "fixtures_data")

TIERS = {"t1": 200, "t2": 5000}

PAGES_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)
GOLDEN_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("extracted_text", pa.string()),
        ("spans_json", pa.string()),
        ("lang", pa.string()),
        ("confidence", pa.float64()),
        ("content_type", pa.string()),
    ]
)


def _write(recs: list[dict], cols: tuple, schema: pa.Schema, path: str) -> None:
    table = pa.Table.from_pydict({c: [r[c] for r in recs] for c in cols}, schema=schema)
    pq.write_table(table, path, compression="zstd")


N_PACKETS = 400


def build_packets(out_dir: str = FIXTURES_DIR, n: int = N_PACKETS) -> None:
    from .packets_gen import packet_tables

    tables = packet_tables(n)
    for name, rows in tables.items():
        cols = list(rows[0].keys())
        table = pa.Table.from_pydict({c: [r[c] for r in rows] for c in cols})
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"), compression="zstd")
        print(f"wrote {name}: {len(rows)} rows")


N_OFFICE = 120


def build_office(out_dir: str = FIXTURES_DIR, n: int = N_OFFICE) -> None:
    from .office_gen import gen_office_docs

    docs = gen_office_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "kind": [d["kind"] for d in docs],
            "payload": [d["payload"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("kind", pa.string()), ("payload", pa.binary())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "office_docs.parquet"), compression="zstd")
    golden = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "kind": [d["kind"] for d in docs],
            "extracted_text": [d["extracted_text"] for d in docs],
        }
    )
    pq.write_table(golden, os.path.join(out_dir, "office_golden.parquet"), compression="zstd")
    print(f"wrote office_docs/office_golden: {n} rows")


N_XLS = 120


def build_xls_fixtures(out_dir: str = FIXTURES_DIR, n: int = N_XLS) -> None:
    from .xls_gen import gen_xls_docs

    docs = gen_xls_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "url": [d["url"] for d in docs],
            "payload": [d["payload"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("url", pa.string()), ("payload", pa.binary())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "xls_docs.parquet"),
                   compression="zstd")
    golden = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "extracted_text": [d["extracted_text"] for d in docs],
        }
    )
    pq.write_table(golden, os.path.join(out_dir, "xls_golden.parquet"),
                   compression="zstd")
    print(f"wrote xls_docs/xls_golden: {n} rows")


N_RTF = 110


def build_rtf_fixtures(out_dir: str = FIXTURES_DIR, n: int = N_RTF) -> None:
    from .rtf_gen import gen_rtf_docs

    docs = gen_rtf_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "url": [d["url"] for d in docs],
            "payload": [d["payload"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("url", pa.string()), ("payload", pa.binary())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "rtf_docs.parquet"),
                   compression="zstd")
    golden = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "kind": [d["kind"] for d in docs],
            "extracted_text": [d["extracted_text"] for d in docs],
        }
    )
    pq.write_table(golden, os.path.join(out_dir, "rtf_golden.parquet"),
                   compression="zstd")
    print(f"wrote rtf_docs/rtf_golden: {n} rows")


N_DOC = 100


def build_doc_fixtures(out_dir: str = FIXTURES_DIR, n: int = N_DOC) -> None:
    from .doc_gen import gen_docs

    docs = gen_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "url": [d["url"] for d in docs],
            "payload": [d["payload"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("url", pa.string()), ("payload", pa.binary())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "doc_docs.parquet"),
                   compression="zstd")
    golden = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "extracted_text": [d["extracted_text"] for d in docs],
        }
    )
    pq.write_table(golden, os.path.join(out_dir, "doc_golden.parquet"),
                   compression="zstd")
    print(f"wrote doc_docs/doc_golden: {n} rows")


N_REALPDF = 400


def build_realpdf(out_dir: str = FIXTURES_DIR, n: int = N_REALPDF) -> None:
    from .realpdf_gen import gen_real_pdfs

    recs = gen_real_pdfs(n)
    _write(recs, INPUT_COLS, PAGES_ARROW_SCHEMA,
           os.path.join(out_dir, "realpdf_pages.parquet"))
    _write(recs, GOLDEN_COLS, GOLDEN_ARROW_SCHEMA,
           os.path.join(out_dir, "realpdf_golden.parquet"))
    print(f"wrote realpdf_pages/realpdf_golden: {n} rows")


N_CSV = 150


def build_csv(out_dir: str = FIXTURES_DIR, n: int = N_CSV) -> None:
    from .csv_gen import gen_csv_docs

    docs = gen_csv_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "name": [d["name"] for d in docs],
            "payload": [d["payload"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("name", pa.string()), ("payload", pa.binary())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "csv_docs.parquet"), compression="zstd")
    golden = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "extracted_text": [d["extracted_text"] for d in docs],
        }
    )
    pq.write_table(golden, os.path.join(out_dir, "csv_golden.parquet"), compression="zstd")
    print(f"wrote csv_docs/csv_golden: {n} rows")


N_OCRBLOCKS = 250


def build_ocrblocks(out_dir: str = FIXTURES_DIR, n: int = N_OCRBLOCKS) -> None:
    from .ocrblocks_gen import gen_ocrblocks_docs

    docs = gen_ocrblocks_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "blocks_json": [d["blocks_json"] for d in docs],
        },
        schema=pa.schema([("doc_id", pa.int64()), ("blocks_json", pa.string())]),
    )
    pq.write_table(table, os.path.join(out_dir, "ocrblocks_docs.parquet"),
                   compression="zstd")
    golden = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "page_md": [d["page_md"] for d in docs],
        }
    )
    pq.write_table(golden, os.path.join(out_dir, "ocrblocks_golden.parquet"),
                   compression="zstd")
    print(f"wrote ocrblocks_docs/ocrblocks_golden: {n} rows")


def build_semantic(out_dir: str = FIXTURES_DIR, n: int = N_PACKETS) -> None:
    from .semantic_gen import semantic_tables

    for name, rows in semantic_tables(n).items():
        cols = list(rows[0].keys())
        table = pa.Table.from_pydict({c: [r[c] for r in rows] for c in cols})
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                       compression="zstd")
        print(f"wrote {name}: {len(rows)} rows")


N_SUMMARY = 120


def build_summaries(out_dir: str = FIXTURES_DIR, n: int = N_SUMMARY) -> None:
    from .summary_gen import summary_tables

    for name, rows in summary_tables(n).items():
        cols = list(rows[0].keys())
        table = pa.Table.from_pydict({c: [r[c] for r in rows] for c in cols})
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                       compression="zstd")
        print(f"wrote {name}: {len(rows)} rows")


def build_warc(out_dir: str = FIXTURES_DIR) -> None:
    """Committed `.warc.gz` files (per-record gzip members, byte-stable:
    pinned mtime, fixed zlib level) + the closed-form golden."""
    from .warc_gen import N_FILES, gen_warc_file, golden_rows

    warc_dir = os.path.join(out_dir, "warc")
    os.makedirs(warc_dir, exist_ok=True)
    rows = []
    for k in range(N_FILES):
        name = f"cc-{k:05d}.warc.gz"
        with open(os.path.join(warc_dir, name), "wb") as f:
            f.write(gen_warc_file(k))
        for r in golden_rows(k):
            rows.append({"warc_file": name, **r})
    golden = pa.Table.from_pydict(
        {c: [r[c] for r in rows] for c in rows[0].keys()},
        schema=pa.schema(
            [("warc_file", pa.string()), ("record_id", pa.string()),
             ("url", pa.string()), ("warc_date", pa.string()),
             ("status", pa.int32()), ("content_type", pa.string()),
             ("charset", pa.string()), ("text_sha1", pa.string()),
             ("n_chars", pa.int32()), ("error", pa.string())]
        ),
    )
    pq.write_table(golden, os.path.join(out_dir, "warc_golden.parquet"),
                   compression="zstd")
    print(f"wrote warc/cc-*.warc.gz ({N_FILES} files) + warc_golden: "
          f"{len(rows)} rows")


N_LANGID = 1200


def build_langid(out_dir: str = FIXTURES_DIR, n: int = N_LANGID) -> None:
    from .langid_gen import langid_rows

    rows = langid_rows(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()),
             ("lang", pa.string())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "langid_pages.parquet"),
                   compression="zstd")
    print(f"wrote langid_pages: {n} rows")


N_CHARSET = 280


def build_charset_fixtures(out_dir: str = FIXTURES_DIR, n: int = N_CHARSET) -> None:
    from .charset_gen import gen_charset_docs

    docs = gen_charset_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "family": [d["family"] for d in docs],
            "raw": [d["raw"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("family", pa.string()), ("raw", pa.binary())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "charset_docs.parquet"),
                   compression="zstd")
    golden = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "encoding": [d["encoding"] for d in docs],
            "source": [d["source"] for d in docs],
            "n_chars": [d["n_chars"] for d in docs],
            "text": [d["text"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("encoding", pa.string()),
             ("source", pa.string()), ("n_chars", pa.int64()),
             ("text", pa.string())]
        ),
    )
    pq.write_table(golden, os.path.join(out_dir, "charset_golden.parquet"),
                   compression="zstd")
    print(f"wrote charset_docs/charset_golden: {n} rows")


N_HTML_META = 320

_META_COLS = ("title", "description", "canonical", "lang", "robots_meta",
              "og_title", "og_description", "og_url", "og_image", "og_type")


def build_html_meta_fixtures(out_dir: str = FIXTURES_DIR,
                             n: int = N_HTML_META) -> None:
    from .html_meta_gen import gen_html_meta_docs

    docs = gen_html_meta_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "family": [d["family"] for d in docs],
            "html": [d["html"] for d in docs],
        },
        schema=pa.schema(
            [("doc_id", pa.int64()), ("family", pa.string()),
             ("html", pa.string())]
        ),
    )
    pq.write_table(table, os.path.join(out_dir, "html_meta_docs.parquet"),
                   compression="zstd")
    golden = pa.Table.from_pydict(
        {"doc_id": [d["doc_id"] for d in docs],
         **{c: [d[c] for d in docs] for c in _META_COLS}},
        schema=pa.schema([("doc_id", pa.int64())]
                         + [(c, pa.string()) for c in _META_COLS]),
    )
    pq.write_table(golden, os.path.join(out_dir, "html_meta_golden.parquet"),
                   compression="zstd")
    print(f"wrote html_meta_docs/html_meta_golden: {n} rows")


N_SENTENCES = 320


def build_sentence_fixtures(out_dir: str = FIXTURES_DIR,
                            n: int = N_SENTENCES) -> None:
    from .sentences_gen import gen_sentence_docs, pack_facts

    docs = gen_sentence_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "family": [d["family"] for d in docs],
            "text": [d["text"] for d in docs],
        },
        schema=pa.schema([("doc_id", pa.int64()), ("family", pa.string()),
                          ("text", pa.string())]),
    )
    pq.write_table(table, os.path.join(out_dir, "sentences_docs.parquet"),
                   compression="zstd")

    s_ids, s_sent, s_tok, s_txt = [], [], [], []
    c_ids, c_cid, c_ns, c_nt, c_txt = [], [], [], [], []
    for d in docs:
        for j, s in enumerate(d["sentences"]):
            s_ids.append(d["doc_id"])
            s_sent.append(j)
            s_tok.append(len(s.split()))
            s_txt.append(s)
        for ch in pack_facts(d["sentences"]):
            c_ids.append(d["doc_id"])
            c_cid.append(ch["chunk_id"])
            c_ns.append(ch["n_sentences"])
            c_nt.append(ch["n_tokens"])
            c_txt.append(ch["text"])
    golden = pa.Table.from_pydict(
        {"doc_id": s_ids, "sent_id": s_sent, "n_tokens": s_tok,
         "sentence": s_txt},
        schema=pa.schema([("doc_id", pa.int64()), ("sent_id", pa.int64()),
                          ("n_tokens", pa.int64()), ("sentence", pa.string())]),
    )
    pq.write_table(golden, os.path.join(out_dir, "sentences_golden.parquet"),
                   compression="zstd")
    chunks = pa.Table.from_pydict(
        {"doc_id": c_ids, "chunk_id": c_cid, "n_sentences": c_ns,
         "n_tokens": c_nt, "text": c_txt},
        schema=pa.schema([("doc_id", pa.int64()), ("chunk_id", pa.int64()),
                          ("n_sentences", pa.int64()), ("n_tokens", pa.int64()),
                          ("text", pa.string())]),
    )
    pq.write_table(chunks,
                   os.path.join(out_dir, "sentence_chunks_golden.parquet"),
                   compression="zstd")
    print(f"wrote sentences_docs/sentences_golden/sentence_chunks_golden: "
          f"{n} docs, {len(s_ids)} sentences, {len(c_ids)} chunks")


N_SITEMAPS = 320


def build_sitemap_fixtures(out_dir: str = FIXTURES_DIR,
                           n: int = N_SITEMAPS) -> None:
    from .sitemap_gen import gen_sitemap_docs

    docs = gen_sitemap_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "family": [d["family"] for d in docs],
            "raw": [d["raw"] for d in docs],
        },
        schema=pa.schema([("doc_id", pa.int64()), ("family", pa.string()),
                          ("raw", pa.binary())]),
    )
    pq.write_table(table, os.path.join(out_dir, "sitemap_docs.parquet"),
                   compression="zstd")

    ids, eids, kinds, locs, lms, cfs, prs = [], [], [], [], [], [], []
    for d in docs:
        if d["kind"] == "error":
            ids.append(d["doc_id"]); eids.append(None); kinds.append("error")
            locs.append(None); lms.append(None); cfs.append(None)
            prs.append(None)
            continue
        for j, e in enumerate(d["entries"]):
            ids.append(d["doc_id"]); eids.append(j); kinds.append(d["kind"])
            locs.append(e["loc"]); lms.append(e["lastmod_epoch"])
            cfs.append(e["changefreq"]); prs.append(e["priority"])
    golden = pa.Table.from_pydict(
        {"doc_id": ids, "entry_id": eids, "kind": kinds, "loc": locs,
         "lastmod_epoch": lms, "changefreq": cfs, "priority": prs},
        schema=pa.schema([("doc_id", pa.int64()), ("entry_id", pa.int64()),
                          ("kind", pa.string()), ("loc", pa.string()),
                          ("lastmod_epoch", pa.int64()),
                          ("changefreq", pa.string()),
                          ("priority", pa.float64())]),
    )
    pq.write_table(golden, os.path.join(out_dir, "sitemap_golden.parquet"),
                   compression="zstd")
    print(f"wrote sitemap_docs/sitemap_golden: {n} docs, {len(ids)} rows")


N_FEEDS = 320


def build_feed_fixtures(out_dir: str = FIXTURES_DIR,
                        n: int = N_FEEDS) -> None:
    from .feeds_gen import gen_feed_docs

    docs = gen_feed_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "family": [d["family"] for d in docs],
            "raw": [d["raw"] for d in docs],
        },
        schema=pa.schema([("doc_id", pa.int64()), ("family", pa.string()),
                          ("raw", pa.binary())]),
    )
    pq.write_table(table, os.path.join(out_dir, "feed_docs.parquet"),
                   compression="zstd")

    cols = {k: [] for k in ("doc_id", "entry_id", "kind", "feed_title",
                            "link", "title", "guid", "pub_epoch")}
    for d in docs:
        if d["kind"] == "error":
            cols["doc_id"].append(d["doc_id"]); cols["entry_id"].append(None)
            cols["kind"].append("error"); cols["feed_title"].append(None)
            cols["link"].append(None); cols["title"].append(None)
            cols["guid"].append(None); cols["pub_epoch"].append(None)
            continue
        for j, e in enumerate(d["entries"]):
            cols["doc_id"].append(d["doc_id"]); cols["entry_id"].append(j)
            cols["kind"].append(d["kind"])
            cols["feed_title"].append(d["feed_title"])
            cols["link"].append(e["link"]); cols["title"].append(e["title"])
            cols["guid"].append(e["guid"])
            cols["pub_epoch"].append(e["pub_epoch"])
    golden = pa.Table.from_pydict(
        cols,
        schema=pa.schema([("doc_id", pa.int64()), ("entry_id", pa.int64()),
                          ("kind", pa.string()), ("feed_title", pa.string()),
                          ("link", pa.string()), ("title", pa.string()),
                          ("guid", pa.string()), ("pub_epoch", pa.int64())]),
    )
    pq.write_table(golden, os.path.join(out_dir, "feed_golden.parquet"),
                   compression="zstd")
    print(f"wrote feed_docs/feed_golden: {n} docs, {len(cols['doc_id'])} rows")


N_PAGEDATES = 320


def build_pagedate_fixtures(out_dir: str = FIXTURES_DIR,
                            n: int = N_PAGEDATES) -> None:
    from .pagedate_gen import gen_pagedate_docs

    docs = gen_pagedate_docs(n)
    table = pa.Table.from_pydict(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "family": [d["family"] for d in docs],
            "url": [d["url"] for d in docs],
            "html": [d["html"] for d in docs],
        },
        schema=pa.schema([("doc_id", pa.int64()), ("family", pa.string()),
                          ("url", pa.string()), ("html", pa.string())]),
    )
    pq.write_table(table, os.path.join(out_dir, "pagedate_docs.parquet"),
                   compression="zstd")
    golden = pa.Table.from_pydict(
        {"doc_id": [d["doc_id"] for d in docs],
         "date_epoch": [d["epoch"] for d in docs],
         "date_source": [d["source"] for d in docs]},
        schema=pa.schema([("doc_id", pa.int64()),
                          ("date_epoch", pa.int64()),
                          ("date_source", pa.string())]),
    )
    pq.write_table(golden, os.path.join(out_dir, "pagedate_golden.parquet"),
                   compression="zstd")
    print(f"wrote pagedate_docs/pagedate_golden: {n} rows")


def build(out_dir: str = FIXTURES_DIR) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for tier, n in TIERS.items():
        recs = gen_pages(n)
        _write(recs, INPUT_COLS, PAGES_ARROW_SCHEMA, os.path.join(out_dir, f"{tier}_pages.parquet"))
        _write(recs, GOLDEN_COLS, GOLDEN_ARROW_SCHEMA, os.path.join(out_dir, f"{tier}_golden.parquet"))
        print(f"wrote {tier}: {n} rows")
    build_packets(out_dir)
    build_office(out_dir)
    build_realpdf(out_dir)
    build_xls_fixtures(out_dir)
    build_doc_fixtures(out_dir)
    build_rtf_fixtures(out_dir)
    build_csv(out_dir)
    build_summaries(out_dir)
    build_ocrblocks(out_dir)
    build_semantic(out_dir)
    build_warc(out_dir)
    build_langid(out_dir)
    build_charset_fixtures(out_dir)
    build_html_meta_fixtures(out_dir)
    build_sentence_fixtures(out_dir)
    build_sitemap_fixtures(out_dir)
    build_feed_fixtures(out_dir)
    build_pagedate_fixtures(out_dir)


if __name__ == "__main__":
    build()
