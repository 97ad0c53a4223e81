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


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    seed: str = "shard-42",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic global shuffle -> shard assignment -> token offsets.

    The training-data last mile: writers need the corpus in a fixed
    pseudo-random order, split into n_shards independent output files,
    with per-document byte/token offsets so any shard can be written (or
    re-written after a failure) in isolation.  The 'shuffle' is the
    engine-portable md5-le64(seed:doc_id) key (sampling-operator
    convention): shard = key % n_shards, order within a shard =
    (key, doc_id) — a pure function of the row, so retries, re-runs and
    different partitionings produce the IDENTICAL manifest (the same
    resumability argument as hash_sample).

    Output: (doc_id, shard, pos, n_tokens, start_token) where pos is the
    0-based position inside the shard and start_token the exclusive
    cumulative token count before this doc.

    100-TB shape: one Exchange on the shard key, then a per-shard
    sort-based window cumsum; n_shards scales with the corpus (shards
    are output files), so no partition outgrows its executor.  Zero
    Python, all integer arithmetic.
    """
    key = sample_key(F.col(doc_id_col), seed)
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: w != F.lit(""),
    )
    base = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        key.alias("skey"),
        (key % n_shards).cast("int").alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        "n_tokens",
        F.coalesce(
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("start_token"),
    )


def sentence_chunk_docs(
    docs: DataFrame,
    max_tokens: int = 512,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-aware chunking over a document table: segment each
    document (kernels/sentences rule-based splitter), then greedy-pack
    whole sentences into ``max_tokens``-token windows — chunks never
    cut mid-sentence (the segment-then-pack context-window recipe).

    Returns (doc_id, chunk_id, n_sentences, n_tokens, text); chunk_id
    is per-document.

    Scale shape: ONE Arrow mapInPandas pass, zero shuffles — both
    passes are per-document string scans, so the stage scales exactly
    like the scan at any corpus size.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from ..kernels.sentences import pack_chunks, split_sentences

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("chunk_id", T.LongType()),
            T.StructField("n_sentences", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cids, ns, nt, txts = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for ch in pack_chunks(split_sentences(text or ""),
                                      max_tokens):
                    ids.append(doc_id)
                    cids.append(ch["chunk_id"])
                    ns.append(ch["n_sentences"])
                    nt.append(ch["n_tokens"])
                    txts.append(ch["text"])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "chunk_id": pd.Series(cids, dtype="int64"),
                 "n_sentences": pd.Series(ns, dtype="int64"),
                 "n_tokens": pd.Series(nt, dtype="int64"),
                 "text": pd.Series(txts, dtype="object")}
            )

    src = docs.select(F.col(doc_id_col).alias("doc_id"),
                      F.col(text_col).alias("text"))
    return src.mapInPandas(run, schema)
