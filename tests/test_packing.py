"""Sequence packing: chop rule, bucket isolation, determinism,
streaming compatibility of the decontamination filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.operators.packing import (
    SEQ_STRIDE,
    pack_sequences,
    packing_summary,
)


def _docs(spark, n=40, tokens=700):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"), F.lit(tokens).alias("n_tokens")
    )


def test_pack_sequences_chop_rule_single_bucket(spark):
    # one bucket -> pure concatenate-then-chop in doc_id order
    out = (
        pack_sequences(_docs(spark, 5, 700), seq_len=1000, n_buckets=1)
        .orderBy("doc_id")
        .collect()
    )
    # offsets: 0, 700, 1400, 2100, 2800 -> seqs 0,0,1,2,2; offs 0,700,400,100,800
    assert [r["seq_id"] for r in out] == [0, 0, 1, 2, 2]
    assert [r["seq_offset"] for r in out] == [0, 700, 400, 100, 800]


def test_pack_sequences_buckets_isolated_and_deterministic(spark):
    docs = _docs(spark, 200, 300)
    out = pack_sequences(docs, seq_len=1024, n_buckets=8).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # seq_id encodes its bucket
    for r in out:
        assert r["seq_id"] // SEQ_STRIDE == r["bucket"]
        assert 0 <= r["seq_offset"] < 1024
    # repartitioning must not move any document
    out2 = pack_sequences(
        docs.repartition(13), seq_len=1024, n_buckets=8
    ).collect()
    assert {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out2} == {
        d: (r["seq_id"], r["seq_offset"]) for d, r in by_doc.items()
    }
    # within a bucket, offsets are the exclusive cumsum in doc_id order
    rows_b = sorted(
        (r for r in out if r["bucket"] == out[0]["bucket"]),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    for r in rows_b:
        assert r["seq_id"] % SEQ_STRIDE == cum // 1024
        assert r["seq_offset"] == cum % 1024
        cum += r["n_tokens"]


def test_packing_summary_ceil_rule(spark):
    packed = pack_sequences(_docs(spark, 10, 700), 1000, n_buckets=2)
    summ = {r["bucket"]: r for r in packing_summary(packed, 1000).collect()}
    for b, r in summ.items():
        assert r["n_seqs"] == (r["t_tokens"] + 999) // 1000
    assert sum(r["n_docs"] for r in summ.values()) == 10


def test_decontaminate_is_streaming_compatible(spark, tmp_path):
    """decontaminate_stream() is a pure map-side filter (eval gram keys
    collected once into an array literal, arrays_overlap per doc) —
    runs under readStream in append mode with zero state, and drops the
    same docs as the batch anti-join path."""
    from intelligent_document_processing_on_aws_spark.operators.contamination import (
        decontaminate,
        decontaminate_stream,
    )

    gram = "a b c d e f g h i j k l m"
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, f"x {gram} y"), (2, "clean doc")],
        "doc_id long, text string",
    ).write.parquet(src)
    evals = spark.createDataFrame(
        [(1, gram)], "eval_id long, text string"
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = decontaminate_stream(stream, evals, n=13)
    q = (
        out.writeStream.format("memory")
        .queryName("decontam_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select doc_id from decontam_stream").collect()
    finally:
        q.stop()
    assert [r["doc_id"] for r in rows] == [2]
    # batch parity on the same data
    batch = spark.read.parquet(src)
    assert [
        r["doc_id"]
        for r in decontaminate(batch, evals, n=13).collect()
    ] == [2]
    assert [
        r["doc_id"]
        for r in decontaminate_stream(batch, evals, n=13).collect()
    ] == [2]


def test_shard_manifest_offsets_and_determinism(spark):
    from intelligent_document_processing_on_aws_spark.operators.packing import (
        shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 5))) for i in range(50)],
        ["doc_id", "text"],
    )
    out = shard_manifest(docs, n_shards=4, seed="t").collect()
    assert len(out) == 50  # every doc lands exactly once
    assert {r["shard"] for r in out} <= set(range(4))
    # per shard: pos is a gapless 0..n-1 sequence and start_token is the
    # exclusive prefix sum of n_tokens in pos order
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(len(rows)))
        run = 0
        for r in rows:
            assert r["start_token"] == run
            run += r["n_tokens"]
    # empty docs count zero tokens
    zero = [r for r in out if r["doc_id"] % 5 == 0]
    assert all(r["n_tokens"] == 0 for r in zero)
    # pure function of the row: identical under different partitioning
    b = shard_manifest(docs.repartition(13), n_shards=4, seed="t").collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, out))
    # different seed -> different order (the shuffle actually shuffles)
    c = shard_manifest(docs, n_shards=4, seed="other").collect()
    assert sorted(map(tuple, c)) != sorted(map(tuple, out))


def test_shard_manifest_plan_no_python_single_exchange(spark):
    from intelligent_document_processing_on_aws_spark.operators.packing import (
        shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], ["doc_id", "text"]
    )
    df = shard_manifest(docs, n_shards=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # exactly one Exchange: the hash partition on the shard key
    assert plan.count("Exchange") == 1
