"""Corpus deduplication job.

Usage:
  python jobs/dedup.py --input <docs parquet with (doc_id, text)> \
      --output /tmp/dedup_out [--method exact|minhash|jaccard|simhash] \
      [--threshold 0.8]

Writes the duplicate pairs (or per-doc canonical map for exact) and prints
a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intelligent_document_processing_on_aws_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from intelligent_document_processing_on_aws_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", default="minhash",
                    choices=["exact", "minhash", "jaccard", "simhash"])
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("idp-dedup", master=args.master)
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    if args.method == "exact":
        result = exact_dedup(docs)
    elif args.method == "minhash":
        result = minhash_lsh_pairs(docs, threshold=args.threshold)
    elif args.method == "jaccard":
        result = ngram_jaccard_pairs(docs, threshold=args.threshold, max_df=1000)
    else:
        result = simhash_pairs(docs, max_hamming=3)
    result.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"method": args.method, "rows": n,
                      "sec": round(time.time() - t0, 2)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
