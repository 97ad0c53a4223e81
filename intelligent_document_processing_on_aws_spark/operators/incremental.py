"""Incremental corpus dedup: filter a new document batch against a huge
historical corpus WITHOUT ever shuffling either side.

The standard production shape (Dolma's bloom-filter dedup, CCNet's
hash-partitioned dedup — public designs): a training corpus is built in
rolling batches, and each new batch must drop documents whose text
already exists in the accumulated corpus. A naive anti-join shuffles the
full corpus per batch — at 100 TB that is the whole job. This operator
instead:

1. builds a Bloom filter over the corpus text hashes — double-hashing
   (Kirsch & Mitzenmacher 2006) over two independent JVM-side
   `xxhash64` columns, per-partition numpy bitmaps OR-combined with a
   single `treeReduce` (no shuffle, log-depth combine);
2. prunes the new batch map-side against the broadcast bitmap — only
   *candidates* (true matches + fpp false positives) survive;
3. confirms candidates exactly: the small candidate set is BROADCAST to
   a map-side semi-join over the corpus scan (corpus never shuffles),
   and the matched texts — at most |candidates| rows — are broadcast
   back for the final anti-join on the new batch.

The result is EXACT (the joins eliminate Bloom false positives; Bloom
false negatives are impossible with build/query sharing the same hash
columns), so the DuckDB oracle is a plain anti-join. The Bloom is purely
the scale lever: both big tables are read once, map-only.

Sizing: bits = -n·ln(p)/ln(2)^2, k = bits/n·ln(2) (classic optima). A
1e9-document corpus at fpp=0.01 needs ~1.2 GiB of bitmap — within
executor/driver broadcast budgets; raise `fpp` to shrink it (false
positives only cost re-checked joins, never correctness).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# second-hash seed: xxhash64 of (BLOOM_SEED, text) is independent of
# xxhash64(text) for double-hashing purposes
_BLOOM_SEED = 0x5EED


def _bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    n = max(expected_items, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64  # whole uint64 words
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _with_hashes(df: DataFrame, text_col: str) -> DataFrame:
    t = F.col(text_col)
    return df.withColumn("__h1", F.xxhash64(t)).withColumn(
        "__h2", F.xxhash64(F.lit(_BLOOM_SEED), t)
    )


def _bit_positions(h1: np.ndarray, h2: np.ndarray, m: int, k: int):
    """(len, k) matrix of bit indices — double hashing h1 + i*h2 mod m,
    all uint64 wraparound arithmetic (deterministic everywhere)."""
    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64)
    return [
        ((a + np.uint64(i) * b) % np.uint64(m)) for i in range(k)
    ]


def build_text_bloom(
    corpus: DataFrame,
    text_col: str = "text",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> tuple[np.ndarray, int, int]:
    """(bitmap uint64[], m, k) over the corpus's text hashes. One
    map-only pass + a log-depth treeReduce of fixed-size bitmaps."""
    if expected_items is None:
        expected_items = corpus.count()
    m, k = _bloom_params(expected_items, fpp)
    hashes = _with_hashes(corpus.select(text_col), text_col).select(
        "__h1", "__h2"
    )
    words = m // 64

    def part(rows) -> list:
        bm = np.zeros(words, dtype=np.uint64)
        h1s, h2s = [], []
        for r in rows:
            h1s.append(r[0])
            h2s.append(r[1])
        if h1s:
            a = np.asarray(h1s, dtype=np.int64)
            b = np.asarray(h2s, dtype=np.int64)
            for idx in _bit_positions(a, b, m, k):
                np.bitwise_or.at(
                    bm, (idx // np.uint64(64)).astype(np.int64),
                    np.uint64(1) << (idx % np.uint64(64)),
                )
        return [bm]

    bitmap = hashes.rdd.mapPartitions(part).treeReduce(np.bitwise_or)
    return bitmap, m, k


# shard-assignment seed (independent of both double-hashing columns)
_SHARD_SEED = 0x51A2D


def _sharded_bloom_candidates(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str,
    m: int,
    k: int,
    shard_bits: int,
) -> DataFrame:
    """Bloom pre-filter candidates via hash-range bitmap SHARDS — the
    at-scale alternative to one driver-held bitmap (see
    incremental_exact_dedup). The corpus's bit space is split into
    ceil(m / shard_bits) shards keyed by an independent xxhash64 of the
    text; each shard's bitmap is built executor-side in a groupBy
    (never on the driver, never broadcast), and the new batch probes it
    through a cogrouped Arrow pass — each task sees ONE shard's batch
    rows plus that shard's single bitmap row. Trade vs the broadcast
    path (documented crossover): the corpus's 16-byte hash pairs are
    shuffled once by shard key (the payload never moves), in exchange
    for O(m / n_shards) peak memory anywhere."""
    n_shards = max(1, -(-m // shard_bits))
    m_s = ((min(shard_bits, m) + 63) // 64) * 64
    words = m_s // 64
    shard = F.pmod(
        F.xxhash64(F.lit(_SHARD_SEED), F.col(text_col)), F.lit(n_shards)
    ).alias("__shard")

    corpus_h = _with_hashes(
        corpus.select(text_col).where(F.col(text_col).isNotNull()),
        text_col,
    ).select(shard, "__h1", "__h2")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(words, dtype=np.uint64)
        a = pdf["__h1"].to_numpy(dtype=np.int64)
        b = pdf["__h2"].to_numpy(dtype=np.int64)
        for idx in _bit_positions(a, b, m_s, k):
            np.bitwise_or.at(
                bm, (idx // np.uint64(64)).astype(np.int64),
                np.uint64(1) << (idx % np.uint64(64)),
            )
        return pd.DataFrame(
            {"__shard": [int(pdf["__shard"].iloc[0])],
             "bm": [bm.tobytes()]}
        )

    bm_df = corpus_h.groupBy("__shard").applyInPandas(
        build, "__shard bigint, bm binary"
    )

    batch_h = _with_hashes(
        new_docs.select(text_col).where(F.col(text_col).isNotNull()),
        text_col,
    ).select(shard, text_col, "__h1", "__h2")

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame({text_col: []}).astype({text_col: object})
        if len(right) == 0:
            # no corpus rows in this shard -> nothing can match
            return pd.DataFrame({text_col: []}).astype({text_col: object})
        bm = np.frombuffer(right["bm"].iloc[0], dtype=np.uint64)
        a = left["__h1"].to_numpy(dtype=np.int64)
        b = left["__h2"].to_numpy(dtype=np.int64)
        hit = np.ones(len(left), dtype=bool)
        for idx in _bit_positions(a, b, m_s, k):
            word = bm[(idx // np.uint64(64)).astype(np.int64)]
            hit &= (word >> (idx % np.uint64(64))) & np.uint64(1) != 0
        return pd.DataFrame({text_col: left[text_col][hit]})

    return (
        batch_h.groupBy("__shard")
        .cogroup(bm_df.groupBy("__shard"))
        .applyInPandas(probe, f"{text_col} string")
        .distinct()
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    expected_items: int | None = None,
    fpp: float = 0.01,
    max_broadcast_bits: int = 1 << 33,
    shard_bits: int = 1 << 30,
) -> DataFrame:
    """new_docs minus rows whose `text_col` already exists in `corpus`
    (NULL text never matches, per SQL join semantics). Exact result;
    Bloom-pruned so the corpus payload is never shuffled.

    Two Bloom paths, chosen by the computed bitmap size m (the result
    is IDENTICAL either way — the Bloom is only a pre-filter and the
    joins are exact, so false positives never leak and the paths can't
    diverge):

    * m <= ``max_broadcast_bits`` (default 2^33 bits = 1 GiB, ~7e8
      corpus docs at fpp=0.01): single driver-held bitmap, log-depth
      treeReduce build, broadcast probe — zero shuffles anywhere.
    * larger: hash-range bitmap shards of ``shard_bits`` bits each,
      built executor-side in a groupBy and probed via a cogrouped
      Arrow pass — no driver bitmap, no broadcast; the corpus's
      16-byte hash pairs shuffle once by shard key (the r5 verdict's
      documented crossover for 10^10-doc corpora, where one bitmap
      would be ~12 GiB on the driver and every executor)."""
    spark = new_docs.sparkSession
    if expected_items is None:
        expected_items = corpus.count()
    m, k = _bloom_params(expected_items, fpp)

    if m > max_broadcast_bits:
        candidates = _sharded_bloom_candidates(
            new_docs, corpus, text_col, m, k, shard_bits
        )
    else:
        bitmap, m, k = build_text_bloom(
            corpus, text_col, expected_items, fpp
        )
        bc = spark.sparkContext.broadcast(bitmap)

        hashed = _with_hashes(new_docs, text_col)
        schema = T.StructType(
            [hashed.schema[text_col],
             T.StructField("__hit", T.BooleanType())]
        )

        def probe(batches):
            bm = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                a = pdf["__h1"].to_numpy(dtype=np.int64)
                b = pdf["__h2"].to_numpy(dtype=np.int64)
                hit = np.ones(len(pdf), dtype=bool)
                for idx in _bit_positions(a, b, m, k):
                    word = bm[(idx // np.uint64(64)).astype(np.int64)]
                    hit &= (word >> (idx % np.uint64(64))) & np.uint64(1) != 0
                yield pd.DataFrame(
                    {text_col: pdf[text_col], "__hit": hit}
                )

        candidates = (
            hashed.select(text_col, "__h1", "__h2")
            .mapInPandas(probe, schema)
            .where(F.col("__hit"))
            .select(text_col)
            .distinct()
        )
    # corpus scanned ONCE, map-side semi-join against the broadcast
    # candidate set; matched texts are at most |candidates| rows
    matched = (
        corpus.select(text_col)
        .join(F.broadcast(candidates), on=text_col, how="left_semi")
        .distinct()
    )
    return new_docs.join(F.broadcast(matched), on=text_col, how="left_anti")
