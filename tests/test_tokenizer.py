"""BPE tokenizer: kernel semantics, Spark operator, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.kernels.bpe import (
    EOW,
    encode_word,
    make_ranks,
    merge_symbols,
    top_words,
    train_merges,
    word_symbols,
)
from intelligent_document_processing_on_aws_spark.operators.tokenizer import (
    bpe_encode,
    bpe_train,
)


def test_word_symbols_eow_on_last_char():
    assert word_symbols("low") == ("l", "o", "w" + EOW)
    assert word_symbols("a") == ("a" + EOW,)
    assert word_symbols("") == ()


def test_merge_symbols_left_to_right_non_overlapping():
    # 'aaaa' with pair (a,a): L2R non-overlap -> (aa, aa)
    assert merge_symbols(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
    # odd run: (aa, a)
    assert merge_symbols(("a", "a", "a"), "a", "a") == ("aa", "a")


def test_train_merges_sennrich_example():
    """The canonical corpus from Sennrich et al. 2016 §3.2:
    low x5, lower x2, newest x6, widest x3. First merges pair the
    frequent 'est</w>' suffix."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_merges(counts, 4)
    # (e,s) and (s,t</w>) both count 9; lexicographic tie-break -> (e,s)
    # (the merge Sennrich's worked example performs first)
    assert merges[0] == ("e", "s"), merges
    assert merges[1] == ("es", "t</w>"), merges
    # l+o appears in low(5)+lower(2)=7 and wins its bracket
    assert ("l", "o") in merges[:4]


def test_encode_word_applies_lowest_rank_first():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ranks = make_ranks(train_merges(counts, 10))
    enc = encode_word("lowest", ranks)
    # 'lowest' was never seen whole; subwords compose from learned merges
    assert "".join(enc) == "lowest" + EOW
    assert len(enc) >= 2
    # unknown characters stay as singleton symbols
    assert encode_word("zq", {}) == ("z", "q" + EOW)


def test_encode_word_count_invariant_concat():
    counts = {"abab": 10, "ab": 8, "ba": 3}
    ranks = make_ranks(train_merges(counts, 6))
    for w in ("abab", "ababab", "ba", "b"):
        assert "".join(encode_word(w, ranks)) == w + EOW


def test_top_words_cap_deterministic():
    wc = {"a": 5, "b": 5, "c": 1, "d": 9}
    assert set(top_words(wc, 2)) == {"d", "a"}  # count desc, word asc
    assert top_words(wc, 10) == wc


def test_bpe_train_and_encode_spark_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower"),
         (2, "newest newest newest newest newest newest"),
         (3, "widest widest widest"),
         (4, None),
         (5, "")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=6)
    # identical to training the pure kernel on the same counts
    expect = train_merges(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6
    )
    assert merges == expect

    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert out[4]["n_bpe"] == 0 and out[4]["bpe_text"] == ""
    assert out[5]["n_words"] == 0
    ranks = make_ranks(merges)
    want_1 = " ".join(
        " ".join(encode_word(w, ranks))
        for w in "low low low low low lower lower".split()
    )
    assert out[1]["bpe_text"] == want_1
    assert out[1]["n_bpe"] == len(want_1.split())
    # stability under repartitioning (order rebuilt from positions)
    out2 = {
        r["doc_id"]: r["bpe_text"]
        for r in bpe_encode(docs.repartition(7), merges).collect()
    }
    assert out2[1] == out[1]["bpe_text"]


def test_bpe_encode_plan_arrow_not_row_python(spark):
    docs = spark.createDataFrame(
        [(1, "a b")], "doc_id long, text string")
    df = bpe_encode(docs, [("a", "b</w>")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1  # encode over distinct words only


def test_bpe_decode_inverts_encode_to_normalized_text(spark):
    from pyspark.sql import functions as F

    from intelligent_document_processing_on_aws_spark.operators.tokenizer import (
        bpe_decode,
    )

    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower"),
         (2, "  Mixed   CASE\twith\nodd   spacing "),
         (3, "unseen-token punct.! 123"),
         (4, None),
         (5, "")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=6)
    enc = bpe_encode(docs, merges)
    got = {
        r["doc_id"]: r["decoded"]
        for r in enc.select(
            "doc_id", bpe_decode(enc).alias("decoded")
        ).collect()
    }
    want = {
        r["doc_id"]: r["norm"]
        for r in docs.select(
            "doc_id",
            F.array_join(
                F.filter(
                    F.split(F.lower(F.coalesce("text", F.lit(""))), r"\s+"),
                    lambda t: t != "",
                ),
                " ",
            ).alias("norm"),
        ).collect()
    }
    assert got == want
    assert got[4] == "" and got[5] == ""
    # decode is native columnar: no Python eval beyond the encode kernel
    plan = (
        enc.select(bpe_decode(enc).alias("d"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
