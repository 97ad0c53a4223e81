"""Single-parallelism extraction throughput probe (used by scaling_bench).

Runs synthetic-page generation + extraction at a fixed core count, timing
only the steady-state job (after a warmup run that absorbs JVM/Arrow
startup). Prints one JSON line {"cores", "rows", "sec", "docs_per_sec"}.
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
from intelligent_document_processing_on_aws_spark.sources.pages_source import synthetic_pages  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=40000)
    ap.add_argument("--warmup-rows", type=int, default=2000)
    args = ap.parse_args()

    spark = get_spark(
        f"extract-bench-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    parts = args.cores * 2
    # warmup: JVM JIT + Python worker pool spin-up
    extract_pages(synthetic_pages(spark, args.warmup_rows, partitions=parts)).count()

    t0 = time.time()
    n = extract_pages(
        synthetic_pages(spark, args.rows, partitions=parts),
        salt_partitions=parts,
    ).count()
    dt = time.time() - t0
    print(json.dumps({
        "cores": args.cores,
        "rows": n,
        "sec": round(dt, 3),
        "docs_per_sec": round(n / dt, 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
