"""Training-sequence packing: assign documents to fixed-token-length
training sequences (the GPT-style "concatenate then chop" batching).

Language-model training consumes fixed-length token sequences; the
standard published recipe (GPT-2/3, PaLM data loaders) concatenates
documents in a deterministic order and chops the stream every
``seq_len`` tokens.  This operator computes, per document, WHERE it
lands: its sequence index and offset — the shuffle-free metadata a
downstream tokenizing writer needs to emit shards independently.

Scale shape (the part that matters at 100 TB): a single global
concatenation order would force a one-partition window — the classic
scalability cliff.  Instead documents are first assigned to
``n_buckets`` deterministic hash buckets (md5-le64 of doc_id — the
sampling-operator convention, engine-portable), and packing runs
independently WITHIN each bucket: one Exchange on the bucket key, a
window cumsum per bucket, no global coordination.  Each bucket yields
its own sequence stream (seq = bucket * 2^32 + index), which is how
production loaders shard anyway (one stream per reader).

All arithmetic is integer (cumulative sums of token counts, DIV /
pmod) — bit-stable under any partitioning, hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import sample_key

SEQ_STRIDE = 1 << 32


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_buckets: int = 1024,
    doc_id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    seed: str = "pack-42",
) -> DataFrame:
    """Per-document packing assignment.

    Returns (doc_id, bucket, seq_id, seq_offset, n_tokens):
      bucket     deterministic hash bucket (stream shard),
      seq_id     bucket * 2^32 + (start_offset DIV seq_len),
      seq_offset start_offset % seq_len  (where in the sequence the
                 document's first token lands; documents straddle
                 sequence boundaries exactly as the chop rule implies).

    Within a bucket documents concatenate in doc_id order (unique key
    -> total order -> deterministic cumsum).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    bucket = (
        sample_key(F.col(doc_id_col), seed) % F.lit(int(n_buckets))
    ).cast("bigint")
    w = (
        Window.partitionBy("bucket")
        .orderBy(doc_id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        bucket.alias("bucket"),
        F.col(token_count_col).cast("long").alias("n_tokens"),
    ).withColumn(
        "start_offset",
        F.sum("n_tokens").over(w) - F.col("n_tokens"),
    )
    return with_cum.select(
        "doc_id",
        "bucket",
        (
            F.col("bucket") * F.lit(SEQ_STRIDE)
            + F.expr(f"start_offset DIV {int(seq_len)}")
        ).alias("seq_id"),
        F.expr(f"start_offset % {int(seq_len)}").alias("seq_offset"),
        "n_tokens",
    )


def packing_summary(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-bucket packing stats: docs, tokens, sequences produced
    (ceil of the bucket's token mass / seq_len) — the shard manifest."""
    return (
        packed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("t_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "t_tokens",
            F.expr(
                f"(t_tokens + {int(seq_len)} - 1) DIV {int(seq_len)}"
            ).alias("n_seqs"),
        )
    )
