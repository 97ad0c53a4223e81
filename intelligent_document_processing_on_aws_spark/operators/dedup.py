"""Deduplication operators over a documents table.

Four families, each designed for 100 TB shape:

- exact_dedup: md5-groupBy — one shuffle on the hash, map-side combine.
- ngram_jaccard_pairs: shingle explode -> self-join on shingle ->
  pair-count / union-size Jaccard. Shuffles on the shingle key; hot
  (ubiquitous) shingles are the skew risk at scale, so a document-frequency
  cap drops shingles appearing in > max_df docs (standard MinHash-LSH
  practice; exact pairs above the threshold are still found because a
  near-dup pair shares many rare shingles too).
- minhash_lsh_pairs: per-doc MinHash signature (Arrow-batched pure kernel),
  banded-LSH bucket keys exploded -> bucket join -> candidate pairs ->
  exact Jaccard verify. The scale path: candidate generation is linear in
  corpus size, verification only touches candidates. Degenerate buckets
  are df-capped (DEFAULT_MAX_BUCKET) so one hot band key can never make
  the self-join quadratic.
- simhash_pairs: 64-bit SimHash, 4x16-bit band blocking -> candidates ->
  exact Hamming filter via native bit ops; same bucket df-cap.

All emit (doc_id_a, doc_id_b) with doc_id_a < doc_id_b.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.fingerprint import lsh_band_keys, minhash_signature, simhash64


def _truncate_lineage(df: DataFrame, checkpoint_dir: str | None,
                      eager: bool = True) -> DataFrame:
    """Lineage truncation with a durability knob.

    checkpoint_dir=None (default): localCheckpoint — blocks live in
    executor storage; fastest, right for local/short jobs, but an
    executor loss makes the truncated lineage unrecoverable (Spark cannot
    recompute a lost localCheckpoint).

    checkpoint_dir=<path/URI>: reliable checkpoint() to that directory
    (HDFS/S3 in production) — a multi-hour 100-TB CC loop or posting-table
    build survives executor loss and resumes from the persisted blocks.
    Setting the SparkContext checkpoint dir is idempotent per call."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc rows: (doc_id, content_hash, group_size, canonical_doc_id,
    is_duplicate). Canonical = min doc_id of the hash group."""
    h = docs.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return h.select(
        "doc_id",
        "content_hash",
        F.count("*").over(w).alias("group_size"),
        F.min("doc_id").over(w).alias("canonical_doc_id"),
    ).withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_doc_id"))


def _shingles_df(docs: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct; docs with < k tokens are skipped (guarded
    on both engine and oracle sides)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    with_toks = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") >= k)
    sh = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("toks", i + off) for off in range(k)]
        ),
    )
    return with_toks.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


def _shingle_keys_df(docs: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """(doc_id, sh) distinct 64-bit shingle keys: the k token columns are
    fed to xxhash64 DIRECTLY, so no shingle string is ever materialized —
    the concat_ws + hash-the-string spelling paid one string allocation
    per window position (measured ~35% of the shingle pass at sf0.1).
    Tokens contain no whitespace, so triple identity == joined-string
    identity; distinct-by-hash == distinct-by-string absent a 64-bit
    collision (the documented convention of the hashed join keys)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    with_toks = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") >= k)
    keys = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: F.xxhash64(
            *[F.element_at("toks", i + off) for off in range(k)]
        ),
    )
    return with_toks.select(
        "doc_id", F.explode(F.array_distinct(keys)).alias("sh")
    )


DEFAULT_MAX_DF = 1000


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    max_df: int | None = DEFAULT_MAX_DF,
    materialize: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Pairwise Jaccard >= threshold over k-token shingle sets.

    max_df (ON by default): drop shingles present in more than max_df docs
    before the self-join. A ubiquitous shingle (boilerplate header) makes
    the shingle self-join quadratic in its posting list — one shingle in
    10^6 docs alone yields 10^12 candidate pairs at web scale — so the cap
    bounds per-shingle join fan-out at max_df^2 regardless of corpus size.
    Near-dup pairs share many shingles, so dropping the few corpus-wide
    ones barely moves their Jaccard (recall preserved on the fixture
    corpus — tests/test_dedup_similarity.py); pass max_df=None for the
    exact all-pairs semantics at small scale.

    Scale shape: shingles are folded to 64-bit xxhash64 keys right after
    the explode, so every downstream shuffle moves 8-byte bigints instead
    of k-token strings (~2x faster measured at sf0.1; a 64-bit collision
    can perturb one pair's intersection count by 1 — negligible against
    the threshold, and the sf0.01 DuckDB oracle cross-checks the exact
    string semantics). The df-cap is applied as a broadcast ANTI-join
    against the (tiny) violator set rather than a window/count-join over
    the postings: partial map-side aggregation counts a degenerate
    shingle without ever concentrating its posting list on one task, so
    a boilerplate shingle present in 10^10 docs is counted and dropped
    without its postings ever being shuffled by shingle key."""
    sh = _shingle_keys_df(docs, text_col, k)
    # materialize the posting table once, BEFORE the df-cap: the cap's
    # violator count is itself derived from the postings, so capping
    # first made the checkpoint's materialization run the shingle pass
    # twice (once for the broadcast violator subtree, once for the
    # anti-join's left side) — at 100 TB that's two corpus re-shingles
    # instead of one. Checkpointing the UNCAPPED table lets the violator
    # count and every downstream branch read the cached blocks; the
    # anti-join itself is a map-side broadcast re-applied per branch at
    # scan cost. Lazy localCheckpoint = the standard "build the index
    # once" step (computed on first use, executor-storage reuse after,
    # lineage truncated). materialize=False keeps the full lineage (plan
    # audits, debugging); checkpoint_dir switches to a RELIABLE
    # checkpoint for fault tolerance on long multi-executor runs.
    if materialize:
        sh = _truncate_lineage(sh, checkpoint_dir, eager=False)
    if max_df is not None:
        violators = (
            sh.groupBy("sh").agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(violators), "sh", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


MINHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_key", T.StringType()),
    ]
)

# Cap on how many documents may share one LSH band key / SimHash chunk
# before the bucket is excluded from candidate generation. A degenerate
# bucket (thousands of near-identical template pages sharing a band —
# routine in web corpora even after exact dedup) makes the bucket
# self-join quadratic in bucket size; the cap bounds per-bucket fan-out
# at max_bucket^2 regardless of corpus size, the same discipline as the
# shingle max_df above. Members of a dropped bucket can still pair via
# their other bands/chunks (8 bands / 4 chunks per doc).
DEFAULT_MAX_BUCKET = 500


def _cap_buckets(
    df: DataFrame, key_cols: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop rows whose key appears in more than max_bucket rows.

    Broadcast anti-join against the (tiny) violator set: the groupBy
    partial-aggregates map-side, so a degenerate bucket is counted and
    excluded without its member rows ever being shuffled by bucket key —
    the same skew discipline as the shingle max_df cap."""
    if max_bucket is None:
        return df
    violators = (
        df.groupBy(*key_cols).agg(F.count("*").alias("_bdf"))
        .where(F.col("_bdf") > max_bucket)
        .select(*key_cols)
    )
    return df.join(F.broadcast(violators), key_cols, "left_anti")


def lsh_dropped_buckets(
    band_df: DataFrame, key_cols: list[str], max_bucket: int = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """Diagnostic: (key..., df) for buckets the cap excludes. Jobs log
    its count so a skewed corpus is visible, never silently truncated."""
    return (
        band_df.groupBy(*key_cols)
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_bucket)
    )


def minhash_band_df(
    docs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, band_key) — one row per doc per LSH band."""

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                sig = minhash_signature(text or "", num_perm=num_perm, k=k)
                for bk in lsh_band_keys(sig, bands=bands):
                    ids.append(doc_id)
                    keys.append(bk)
            yield pd.DataFrame({"doc_id": ids, "band_key": keys})

    return docs.select("doc_id", text_col).mapInPandas(sigs, MINHASH_SCHEMA)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    materialize: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Banded MinHash-LSH candidates verified by exact Jaccard.

    With 32 perms / 8 bands (4 rows per band) the candidate-probability
    curve crosses ~0.5 at j ~= (1/8)^(1/4) ~= 0.59 — high recall at
    j >= 0.8. Candidate generation: one explode + one groupBy-join on
    band_key; verification re-computes exact Jaccard only on candidates.

    max_bucket (ON by default) drops band keys shared by more than
    max_bucket docs before the self-join — see DEFAULT_MAX_BUCKET. Pass
    max_bucket=None for uncapped semantics at small scale; use
    lsh_dropped_buckets(minhash_band_df(docs), ["band_key"]) to audit
    what a cap would drop.
    """
    band_df = minhash_band_df(docs, num_perm=num_perm, bands=bands, k=k,
                              text_col=text_col)
    # checkpoint BEFORE the bucket cap: the cap's violator count reads
    # the signature table too, so capping first made the checkpoint
    # materialization run the (Python) MinHash pass twice — once for the
    # broadcast violator subtree, once for the anti-join's left side.
    # Checkpointing the uncapped table runs MinHash ONCE per doc; the
    # cap re-applies as a map-side broadcast anti-join per branch.
    if materialize:
        band_df = _truncate_lineage(band_df, checkpoint_dir, eager=False)
    band_df = _cap_buckets(band_df, ["band_key"], max_bucket)
    a = band_df.alias("a")
    b = band_df.alias("b")
    candidates = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    # exact verify: join shingle sets of candidates only (checkpointed —
    # the table feeds sizes + both posting sides); postings carry the
    # 8-byte hashed shingle key, never the string (_shingle_keys_df)
    sh = _shingle_keys_df(docs, text_col, k)
    if materialize:
        sh = _truncate_lineage(sh, checkpoint_dir, eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pa = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh"))
    pb = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh"))
    inter = (
        candidates.join(pa, "doc_id_a").join(pb, ["doc_id_b", "sh"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_id_a").join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = [simhash64(t or "") - (1 << 63) for t in pdf[text_col]]
            # shift to signed 64-bit domain for the LongType column
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": hs})

    return docs.select("doc_id", text_col).mapInPandas(run, SIMHASH_SCHEMA)


def simhash_chunks_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash, band, chunk) — 4x16-bit pigeonhole blocking keys."""
    sh = simhash_df(docs, text_col)
    return sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for i in range(4)
            ])
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.band", "bc.chunk")


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text",
                  max_bucket: int | None = DEFAULT_MAX_BUCKET,
                  materialize: bool = True,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Band blocking: 4x16-bit chunks — any pair within Hamming<=3 shares at
    least one exact chunk (pigeonhole), so candidates = chunk-equality
    joins; exact filter via native xor+bit_count.

    max_bucket (ON by default) drops (band, chunk) keys shared by more
    than max_bucket docs before the self-join — see DEFAULT_MAX_BUCKET;
    max_bucket=None restores uncapped semantics, and
    lsh_dropped_buckets(simhash_chunks_df(docs), ["band", "chunk"])
    audits what a cap would drop."""
    chunks = simhash_chunks_df(docs, text_col)
    chunks = _cap_buckets(chunks, ["band", "chunk"], max_bucket)
    # hash once per doc, not once per plan branch (cap count + 2 sides)
    if materialize:
        chunks = _truncate_lineage(chunks, checkpoint_dir, eager=False)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.where(hamming <= max_hamming).select(
        "doc_id_a", "doc_id_b", hamming.alias("hamming")
    )


def duplicate_groups(
    docs: DataFrame,
    pairs: DataFrame,
    max_iter: int = 20,
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs -> connected components -> canonical doc.

    The grouping step every web-scale dedup pipeline needs after candidate
    generation (MinHash/SimHash/Jaccard pairs): transitive closure over the
    pair graph, one group id (= min doc_id in the component) per document,
    singletons included. Output: (doc_id, group_id, group_size,
    is_duplicate) — is_duplicate marks every non-canonical member.

    Shape: iterative min-label propagation — per round one shuffle join of
    the symmetric edge list against current labels plus a groupBy-min;
    converges in O(component diameter) rounds (dedup components are
    near-cliques, so 2-4 rounds in practice; max_iter bounds adversarial
    chains). Each round caches the label frame and checks a convergence
    count — the classic large-scale connected-components shape
    (Hash-to-Min), no driver-side graph.
    """
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Checkpoint (eager) after every round: iterative self-joins grow
    # the logical plan exponentially otherwise (each round re-derives all
    # previous rounds) — truncating lineage keeps round cost constant.
    # checkpoint_dir=None -> localCheckpoint (fast, executor-memory);
    # set it to durable storage so a multi-hour CC loop survives executor
    # loss and resumes from the last round's persisted labels.
    sym = _truncate_lineage(sym, checkpoint_dir)
    labels = _truncate_lineage(
        docs.select(F.col(id_col).alias("node"),
                    F.col(id_col).alias("label")), checkpoint_dir)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["dst"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label")))
                .alias("label"),
            )
        )
        new_labels = _truncate_lineage(new_labels, checkpoint_dir)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_groups did not converge in max_iter={max_iter} "
            "rounds (a component's diameter exceeds it); raise max_iter — "
            "silent non-convergence would emit fragmented group ids"
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("group_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("group_id"),
            F.col("group_size").cast("long").alias("group_size"),
            (F.col("node") != F.col("label")).alias("is_duplicate"),
        )
    )


def canonical_selection(
    groups: DataFrame,
    docs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-weighted canonical selection: keep the BEST member of each
    duplicate group, not the lowest id.

    Production pipelines (RefinedWeb, Dolma) pick the highest-quality
    member of a near-dup cluster as the survivor — keeping the longest /
    highest-scored capture beats keeping an arbitrary one. `groups` is
    duplicate_groups() output; `docs` supplies a numeric `quality_col`
    (length, quality score, perplexity negation — caller's choice).
    Ties break to the lowest doc_id so the result is deterministic.

    Output: (doc_id, group_id, group_size, canonical_id, keep) — `keep`
    marks the one survivor per group.

    Shape: one shuffle total. The score join is doc_id-equi (groups and
    docs are both keyed by it), then a single window over group_id computes
    the per-group argmax via running first_value — no second agg+join pass.
    Groups are near-cliques (bounded size), so the window partition can
    never be skewed by a hot key beyond the largest dup cluster.
    """
    scored = groups.join(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(quality_col).alias("__q")),
        "doc_id",
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("__q").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("canonical_id", F.first("doc_id").over(w))
        .select(
            "doc_id",
            "group_id",
            "group_size",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
        )
    )


def repeated_passages(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate-passage detector: n-token passages appearing in >= min_df
    distinct documents, with their document frequency.

    The training-data-curation counterpart of near-dup dedup: corpora keep
    whole documents but strip passages repeated across many of them (nav
    bars, cookie banners, license footers). Shape is one map-side shingle
    explode (distinct within doc, so df = document frequency) + one hash
    aggregation with partial combine — no joins, no skew exposure, linear
    at 100 TB. Output: (passage, df) for passages at or above min_df.
    """
    sh = _shingles_df(docs, text_col, n)
    return (
        sh.groupBy(F.col("shingle").alias("passage"))
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document line-level dedup: rewrite every document, keeping
    only the globally-first occurrence of any line that appears in
    >= min_docs distinct documents (C4's span dedup, Raffel et al. 2020
    §2.2 / RefinedWeb line-wise filtering, Penedo et al. 2023 —
    public papers; no reference-repo analog).

    Frozen spec:
    - lines = '\\n'-split, trimmed of ' \\t\\r', blanks dropped (the
      webfilters._lines convention);
    - a line is corpus-duplicated iff it occurs in >= min_docs DISTINCT
      documents;
    - of all its occurrences corpus-wide, only the one with the smallest
      (doc_id, pos) survives; every other occurrence is removed;
    - non-duplicated lines always survive (within-doc repeats included);
    - every input doc appears in the output, text_deduped='' when
      nothing survives.

    Output: (doc_id, text_deduped, n_lines, n_removed).

    100-TB shape: posexplode is map-side; occurrence ranking is one
    window Exchange on the line key; document frequency is a two-phase
    distinct aggregation on the same key (partial combine both phases);
    the rebuild is one Exchange on doc_id. A nav-bar line repeated in
    10^6 docs concentrates its (tiny) occurrence rows in one partition —
    the same bounded skew class as exact_dedup's hash window, and AQE
    skew-join splitting covers the join back (pinned in
    tests/test_skew_aqe.py for this join shape).
    """
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"),
                    lambda x: F.trim(x, F.lit(" \t\r"))),
        lambda x: x != "",
    )
    base = docs.select(
        "doc_id", F.size(lines_arr).cast("long").alias("n_lines"),
        lines_arr.alias("__lines"),
    )
    lines = base.select(
        "doc_id", F.posexplode("__lines").alias("pos", "line")
    )
    occ = lines.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("line").orderBy("doc_id", "pos")
        ),
    )
    dup = (
        lines.select("line", "doc_id").distinct()
        .groupBy("line")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("line")
    )
    kept = (
        occ.join(dup.withColumn("__dup", F.lit(True)), "line", "left")
        .where(F.col("__dup").isNull() | (F.col("rn") == 1))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("text_deduped"),
            F.count("*").cast("long").alias("n_kept"),
        )
    )
    return (
        base.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .alias("n_removed"),
        )
    )


def substring_span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    hash_windows: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Cross-document exact-substring dedup at k-token-window
    granularity (Lee et al. 2022 'Deduplicating Training Data Makes
    Language Models Better' / RefinedWeb exact-span removal — public
    papers; no reference-repo analog). Suffix arrays are the
    shared-memory formulation; the distributed equivalent is fixed-size
    token windows, which find exactly the duplicated substrings of
    >= k tokens.

    Frozen spec:
    - tokens = whitespace-split ('\\s+'), blanks dropped, case/punct
      preserved; the rebuilt text joins surviving tokens with a single
      space (whitespace runs and newlines are normalized — documented
      deviation from byte-level suffix arrays);
    - a window = k consecutive tokens joined with ' '; it is
      corpus-duplicated iff it occurs in >= min_docs DISTINCT docs;
    - of all occurrences of a duplicated window corpus-wide, the
      smallest (doc_id, pos) is the canonical one; every token covered
      by a NON-canonical occurrence is removed (the canonical copy's
      tokens survive unless another window's non-canonical occurrence
      covers them);
    - docs shorter than k tokens pass through untouched.

    Output: (doc_id, text_deduped, n_tokens, n_removed).

    100-TB shape: window generation is a map-side array expression (no
    explode of full text — one row per window position), materialized
    ONCE (lazy lineage truncation, `checkpoint_dir` switches
    localCheckpoint -> reliable checkpoint for multi-hour runs) and
    shared by the duplicated-window detection and the occurrence
    ranking, which also share ONE shuffle key; removed-position
    explosion is bounded by duplicated content only; the rebuild is one
    Exchange on doc_id. `hash_windows=True` (default) shuffles 8-byte
    xxhash64 window keys instead of k-token strings — two distinct
    windows colliding (~2^-64 per pair) is the documented exactness
    boundary; pass False for literal string keys. Window-key hot spots
    (boilerplate repeated in 10^6 docs) are the same bounded skew class
    as line_dedup's — AQE skew handling covers the join back.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )
    base = docs.select(
        "doc_id",
        toks.alias("__toks"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    # one row per window position: (doc_id, pos, wkey), pos 0-based
    nwin = F.greatest(F.lit(0), F.size("__toks") - F.lit(k - 1))
    wstr = lambda i: F.array_join(F.slice("__toks", i, k), " ")  # noqa: E731
    # hashed path feeds the k token columns to xxhash64 directly — no
    # window string is built (the _shingle_keys_df discipline); token
    # k-tuple identity == joined-string identity since tokens contain
    # no whitespace, so the dedup decisions are unchanged absent the
    # already-documented 2^-64 collision boundary
    whash = lambda i: F.xxhash64(  # noqa: E731
        *[F.element_at("__toks", i + off) for off in range(k)]
    )
    wins = base.where(F.size("__toks") >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), nwin),
                whash if hash_windows else wstr,
            )
        ).alias("pos", "wkey"),
    )
    # window table computed ONCE for df-count + occurrence ranking
    wins = _truncate_lineage(wins, checkpoint_dir, eager=False)
    occ = wins.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("wkey").orderBy("doc_id", "pos")
        ),
    )
    dup = (
        wins.select("wkey", "doc_id").distinct()
        .groupBy("wkey")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("wkey")
    )
    # token positions covered by non-canonical duplicated occurrences
    removed = (
        occ.join(dup, "wkey", "left_semi")
        .where(F.col("rn") > 1)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("tpos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_list("tpos").alias("__rm"))
    )
    kept = F.filter(
        "__toks",
        lambda t, i: F.col("__rm").isNull()
        | ~F.array_contains("__rm", i),
    )
    return base.join(removed, "doc_id", "left").select(
        "doc_id",
        F.array_join(kept, " ").alias("text_deduped"),
        "n_tokens",
        F.coalesce(F.size("__rm"), F.lit(0)).cast("long")
        .alias("n_removed"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS sketch): hash every k-token gram, slide a
    window of w consecutive hashes, and in each window select the
    minimum (rightmost occurrence on ties). The guarantee: any shared
    run of >= w+k-1 tokens between two documents shares at least one
    selected fingerprint, while only ~2/(w+1) of grams are kept — the
    local-sampling property MinHash does not give.

    Hash = md5 hex of the gram; lexicographic min over hex strings is a
    total order identical in Spark and the DuckDB oracle (no
    cross-engine integer-hash dependency). Documents with fewer than k
    tokens emit nothing; with fewer than w grams, the single truncated
    window still selects one fingerprint (the standard guarantee floor).

    Output: (doc_id, fp_hash, fp_pos) distinct — join fp_hash to
    candidate near-dup/overlap pairs exactly like a shingle key, at
    ~2/(w+1) of the volume.

    Shape: gram explode is map-side; ONE Exchange on doc_id feeds both
    the ordered collect_list frame and the per-doc gram count; the
    argmin-with-rightmost-tie is a JVM-side array aggregate over the
    <= w-element frame; the final distinct is a hash agg on the already
    doc-partitioned stream."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    with_toks = docs.select(
        "doc_id", toks.alias("toks")).where(F.size("toks") >= k)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("toks", i + off) for off in range(k)]
        ),
    )
    pos_grams = with_toks.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).select("doc_id", "pos", F.md5("gram").alias("h"))

    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    part = Window.partitionBy("doc_id")
    staged = (
        pos_grams
        .withColumn("__arr", F.collect_list(F.struct("h", "pos")).over(frame))
        .withColumn("__n", F.count("*").over(part))
        # full windows only, except the single truncated window of a
        # short doc (n < w) — frame truncation handles the rest
        .where(F.col("pos") <= F.greatest(F.col("__n") - w, F.lit(0)))
    )
    init = F.struct(F.lit("g").alias("h"), F.lit(-1).alias("pos"))
    sel = F.aggregate(
        F.col("__arr"), init,
        lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(acc),
    )
    return (
        staged.select(
            "doc_id",
            sel["h"].alias("fp_hash"),
            sel["pos"].cast("long").alias("fp_pos"),
        )
        .distinct()
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    text_col: str = "text",
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """Near-dup candidate pairs from winnowing fingerprints: documents
    sharing >= min_shared selected fingerprints. The sketch-backed
    sibling of ngram_jaccard_pairs — identical join shape but the
    posting table holds only ~2/(w+1) of the grams, so the self-join
    fan-in shrinks by the same factor while the winnowing guarantee
    still catches every >= w+k-1-token overlap.

    max_df (on by default) drops fingerprints present in more than
    max_df documents before the self-join — the same broadcast
    anti-join skew guard as the shingle path: one boilerplate
    fingerprint in 10^6 docs must never go quadratic.

    Output: (doc_id_a, doc_id_b, shared_fps) with doc_id_a < doc_id_b.
    """
    fp = winnow_fingerprints(docs, k=k, w=w, text_col=text_col).select(
        "doc_id", "fp_hash").distinct()
    if max_df is not None:
        violators = (
            fp.groupBy("fp_hash").agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
            .select("fp_hash")
        )
        fp = fp.join(F.broadcast(violators), "fp_hash", "left_anti")
    fp = _truncate_lineage(fp, None, eager=False)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp_hash") == F.col("b.fp_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"),
                 F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
