"""Round-6 optimization harness: per-query isolation + plan capture.

bench.py is FROZEN for measurement, so the optimization round's extra
instrumentation lives here (guide §1.4): each bench query can be timed
in isolation with the exact action bench.py uses, or with a noop sink
(computes every column, no collect), and its .explain("formatted") plan
written to plans/r06/<name>_{before|after}.txt for the judge.

Usage:
  python bench_extra.py --list
  python bench_extra.py --only dsir_weights,semdedup --reps 3
  python bench_extra.py --only semdedup --plan plans/r06/semdedup_before.txt
  python bench_extra.py --noop --only decontamination
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402


def build_targets(spark, sf_dir):
    """name -> (df_builder, action) exactly mirroring bench.py's lambdas."""
    from intelligent_document_processing_on_aws_spark import entry_queries as eq
    from intelligent_document_processing_on_aws_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from intelligent_document_processing_on_aws_spark.operators.packing import (
        sentence_chunk_docs,
    )

    docs_path = os.path.join(sf_dir, "documents.parquet")

    def q(fn):
        return lambda: fn(spark, sf_dir)

    count = lambda df: df.count()  # noqa: E731
    collect = lambda df: df.collect()  # noqa: E731

    targets = {
        "doc_stats": (q(eq.q_doc_stats),
                      lambda df: df.agg(F.sum("n_tokens"), F.avg("quality")).collect()),
        "doc_quality": (q(eq.q_doc_quality),
                        lambda df: df.agg(F.avg("top2gram_char_fraction"),
                                          F.avg("dup5gram_char_fraction")).collect()),
        "sentence_chunks": (
            lambda: sentence_chunk_docs(spark.read.parquet(docs_path), max_tokens=512),
            count),
        "tier_rollup": (q(eq.q_tier_rollup), collect),
        "tier_mix": (q(eq.q_tier_mix), collect),
        "source_cap": (q(eq.q_source_cap), count),
        "extract_xls": (q(eq.q_extract_xls), count),
        "extract_rtf": (q(eq.q_extract_rtf), count),
        "image_resize": (q(eq.q_image_resize), count),
        "audio_features": (q(eq.q_audio_features), count),
        "lang_classifier": (q(eq.q_lang_classifier),
                            lambda df: df.agg(F.avg(F.col("correct").cast("double"))).collect()),
        "quality_classifier": (q(eq.q_quality_classifier),
                               lambda df: df.agg(F.avg(F.col("agrees").cast("double"))).collect()),
        "lm_perplexity": (q(eq.q_lm_perplexity),
                          lambda df: df.agg(F.sum("n_bigrams"), F.avg("ppl")).collect()),
        "perplexity_tiers": (q(eq.q_perplexity_tiers),
                             lambda df: df.groupBy("ppl_tier").count().collect()),
        "line_dedup": (q(eq.q_line_dedup),
                       lambda df: df.agg(F.sum("n_removed")).collect()),
        "substring_dedup": (q(eq.q_substring_dedup),
                            lambda df: df.agg(F.sum("n_removed")).collect()),
        "incremental_dedup": (q(eq.q_incremental_dedup), count),
        "mojibake_repair": (q(eq.q_mojibake_repair),
                            lambda df: df.agg(F.sum(F.col("was_mojibake").cast("long"))).collect()),
        "decontamination": (q(eq.q_decontamination),
                            lambda df: df.agg(F.sum("n_hit_grams"),
                                              F.sum(F.col("contaminated").cast("long"))).collect()),
        "bpe_tokenize": (q(eq.q_bpe_tokenize),
                         lambda df: df.agg(F.sum("n_bpe"), F.sum("n_words")).collect()),
        "dsir_weights": (q(eq.q_dsir_weights),
                         lambda df: df.agg(F.sum("dsir_score"),
                                           F.sum(F.col("selected").cast("long"))).collect()),
        "semdedup": (q(eq.q_semdedup), count),
        "corpus_shards": (q(eq.q_corpus_shards),
                          lambda df: df.agg(F.max("start_token"), F.sum("n_tokens")).collect()),
        "host_spamrank": (q(eq.q_host_spamrank),
                          lambda df: df.agg(F.sum("rank")).collect()),
        "dedup_ngram_jaccard": (
            lambda: ngram_jaccard_pairs(eq._docs_with_dups(spark, sf_dir), 0.8), count),
        "dedup_minhash_lsh": (
            lambda: minhash_lsh_pairs(eq._docs_with_dups(spark, sf_dir), 0.8), count),
        "ann_brute_topk": (q(eq.q_ann_brute_topk), count),
        "pricing_summary": (q(eq.q_pricing_summary), collect),
        "section_attributes": (q(eq.q_section_attributes), count),
        "eval_metrics": (q(eq.q_eval_metrics), collect),
    }
    return targets


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="time with a noop sink instead of the bench action")
    ap.add_argument("--plan", default=None,
                    help="write explain('formatted') of the (single) query here")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from intelligent_document_processing_on_aws_spark.session import get_spark

    spark = get_spark("idp-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    targets = build_targets(spark, sf_dir)
    if args.list:
        print("\n".join(targets))
        return 0

    names = args.only.split(",") if args.only else list(targets)
    out: dict[str, list[float]] = {}
    for name in names:
        build, action = targets[name]
        if args.plan:
            df = build()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            os.makedirs(os.path.dirname(args.plan) or ".", exist_ok=True)
            with open(args.plan, "w") as f:
                f.write(plan)
            print(f"plan written: {args.plan} ({len(plan)} chars)")
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            df = build()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                action(df)
            reps.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = reps
        print(json.dumps({name: reps}), flush=True)
    print(json.dumps({"min": {k: min(v) for k, v in out.items()}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
