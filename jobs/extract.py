"""Main-content extraction job.

Usage (local or cluster):
  spark-submit --py-files idp_spark.zip jobs/extract.py \
      --input fixtures_data/t2_pages.parquet \
      --output /tmp/extracted \
      [--salt-partitions 64] [--synthetic-rows N] [--snapshots]

Reads a pages table (url, warc_ts, html, text, lang), runs the vectorized
extraction stage, writes the result table partitioned by content_type, and
prints a one-line JSON summary (rows, docs/sec).

With --snapshots the output and per-partition lineage land as atomic
snapshot commits (sources/snapshots.py) under {output}/table and
{output}/lineage: re-running the same command resumes from the last
committed snapshot, processing only not-yet-committed urls — the kill
mid-run / re-run path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intelligent_document_processing_on_aws_spark.operators.extraction import extract_pages  # noqa: E402
from intelligent_document_processing_on_aws_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet path (omit with --synthetic-rows)")
    ap.add_argument("--manifest",
                    help="CSV/JSON manifest of input parquet paths "
                         "(CLI ManifestParser semantics)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument("--synthetic-rows", type=int, default=None,
                    help="generate N synthetic pages on executors instead of reading --input")
    ap.add_argument("--master", default=None)
    ap.add_argument("--snapshots", action="store_true",
                    help="snapshot-committed output + lineage with resume")
    args = ap.parse_args()

    spark = get_spark("idp-extract", master=args.master)
    t0 = time.time()
    if args.synthetic_rows:
        from intelligent_document_processing_on_aws_spark.sources.pages_source import synthetic_pages

        pages = synthetic_pages(spark, args.synthetic_rows,
                                partitions=args.salt_partitions or 32)
    elif args.manifest:
        from intelligent_document_processing_on_aws_spark.plans.manifest import (
            parse_manifest,
        )

        specs = parse_manifest(args.manifest)
        remote = [d["path"] for d in specs if d["type"] != "local"]
        if remote:
            ap.error(f"manifest names non-local inputs (no object store here): {remote[:3]}")
        pages = spark.read.parquet(*[d["path"] for d in specs])
    else:
        if not args.input:
            ap.error("--input or --manifest required unless --synthetic-rows given")
        pages = spark.read.parquet(args.input)
    if args.snapshots:
        from intelligent_document_processing_on_aws_spark.plans.lineage import (
            run_with_resume_snapshots,
        )
        from intelligent_document_processing_on_aws_spark.sources.snapshots import (
            read_table,
        )

        stats = run_with_resume_snapshots(
            spark, pages,
            os.path.join(args.output, "table"),
            os.path.join(args.output, "lineage"),
            salt_partitions=args.salt_partitions or 32,
        )
        tbl = read_table(spark, os.path.join(args.output, "table"))
        n = tbl.count() if tbl is not None else 0
        dt = time.time() - t0
        # throughput reflects THIS run's work; rows is the committed total
        print(json.dumps({"rows": n, "sec": round(dt, 2),
                          "docs_per_sec": round(stats["processed"] / dt, 1),
                          **stats}))
        spark.stop()
        return 0
    result = extract_pages(pages, salt_partitions=args.salt_partitions)
    (
        result.write.mode("overwrite")
        .partitionBy("content_type")
        .parquet(args.output)
    )
    n = spark.read.parquet(args.output).count()
    dt = time.time() - t0
    print(json.dumps({"rows": n, "sec": round(dt, 2),
                      "docs_per_sec": round(n / dt, 1)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
