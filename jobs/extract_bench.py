"""Single-parallelism extraction throughput probe (used by scaling_bench).

Measures the extraction job proper — parquet scan -> url-hash salt
repartition -> mapInPandas extraction -> count — at a fixed core count,
steady-state (a warmup run absorbs JVM JIT + Python worker spin-up).
The input corpus is pre-materialized parquet (--input), so generation cost
is not in the measured path; --synthetic falls back to executor-side
generation for quick checks.

Prints one JSON line {"cores", "rows", "sec", "docs_per_sec"}.
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
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", help="pages parquet path (pre-materialized corpus)")
    ap.add_argument("--synthetic", type=int, default=None,
                    help="generate N rows on executors instead of reading --input")
    ap.add_argument("--warmup-rows", type=int, default=3000)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions; best rep reported (host noise)")
    args = ap.parse_args()

    spark = get_spark(
        f"extract-bench-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    parts = args.cores * 2

    from intelligent_document_processing_on_aws_spark.sources.pages_source import (
        synthetic_pages,
    )

    # warmup: JVM JIT + Python worker pool spin-up
    extract_pages(synthetic_pages(spark, args.warmup_rows, partitions=parts)).count()

    if args.input:
        pages = spark.read.parquet(args.input)
    elif args.synthetic:
        pages = synthetic_pages(spark, args.synthetic, partitions=parts)
    else:
        ap.error("need --input or --synthetic")

    times = []
    n = 0
    for _ in range(args.reps):
        t0 = time.time()
        n = extract_pages(pages, salt_partitions=parts).count()
        times.append(time.time() - t0)
    dt = min(times)
    print(json.dumps({
        "cores": args.cores,
        "rows": n,
        "sec": round(dt, 3),
        "docs_per_sec": round(n / dt, 1),
        "all_reps_sec": [round(t, 3) for t in times],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
