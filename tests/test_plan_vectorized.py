"""Physical-plan audits: zero per-row Python, pushdown, broadcast, codegen.

The scale guarantees SURVEY.md §7 commits to:
- no BatchEvalPython (row-at-a-time Python UDF) anywhere — Python stages
  must be ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas;
- parquet scans prune columns (ReadSchema) and push filters;
- the small dimension side of evaluation joins is broadcast;
- relational operators land in WholeStageCodegen spans.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from intelligent_document_processing_on_aws_spark.config import eval_config_rows
from intelligent_document_processing_on_aws_spark.operators.classify import classify_and_section
from intelligent_document_processing_on_aws_spark.operators.evaluation import (
    evaluate_attributes,
    flatten_attributes,
)
from intelligent_document_processing_on_aws_spark.operators.extraction import extract_pages
from intelligent_document_processing_on_aws_spark.operators.similarity import brute_force_topk
from intelligent_document_processing_on_aws_spark.operators.textstats import document_stats


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _assert_no_row_python(df):
    plan = _plan(df)
    assert "BatchEvalPython" not in plan, plan[:2000]


def test_extraction_plan_vectorized(spark, fixtures_dir):
    pages = spark.read.parquet(os.path.join(fixtures_dir, "t1_pages.parquet"))
    df = extract_pages(pages, salt_partitions=4)
    plan = _plan(df)
    # r6: the stage is Arrow-native (MapInArrow) — spans are built as
    # Arrow arrays directly instead of through the pandas bridge
    assert "MapInArrow" in plan
    assert "BatchEvalPython" not in plan
    # column pruning: the unused `text` column must not be read
    formatted = _formatted(df)
    assert "text" not in formatted.split("ReadSchema:")[-1].split("\n")[0]


def test_sectioning_plan_no_python(spark, fixtures_dir):
    pages = spark.read.parquet(os.path.join(fixtures_dir, "packet_pages.parquet"))
    df = classify_and_section(pages)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan  # fully native: window + group only
    assert "Window" in plan


def test_evaluation_plan_broadcast_and_native(spark, fixtures_dir):
    expected = spark.read.parquet(os.path.join(fixtures_dir, "flat_expected.parquet"))
    actual = spark.read.parquet(os.path.join(fixtures_dir, "flat_actual.parquet"))
    cfg = spark.createDataFrame(eval_config_rows())
    counted = evaluate_attributes(expected, actual, cfg)
    plan = _plan(counted)
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # config dim is broadcast
    assert "levenshtein" in plan.lower()  # fuzzy is JVM-side


def test_flatten_is_arrow_batched(spark, fixtures_dir):
    attrs = spark.read.parquet(os.path.join(fixtures_dir, "golden_attributes.parquet"))
    df = flatten_attributes(attrs)
    plan = _plan(df)
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_topk_broadcasts_queries(spark, fixtures_dir):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    df = brute_force_topk(emb, n_queries=5, k=3)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_doc_stats_native(spark):
    docs = spark.createDataFrame([(1, "the quick fox")], "doc_id long, text string")
    plan = _plan(document_stats(docs))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_filter_pushdown_to_scan(spark, fixtures_dir):
    pages = spark.read.parquet(os.path.join(fixtures_dir, "t2_pages.parquet"))
    df = pages.where(F.col("lang") == "en").select("url", "lang")
    formatted = _formatted(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in formatted


def test_round2_operator_plans_no_python(spark, fixtures_dir):
    """Round-2 operators keep the zero-per-row-Python contract: the
    evaluation report is pure Catalyst string expressions, holistic
    sectioning is explode+join+agg, confidence flattening is Arrow-batched
    MapInPandas — no BatchEvalPython anywhere."""
    import os

    from intelligent_document_processing_on_aws_spark.config import eval_config_rows
    from intelligent_document_processing_on_aws_spark.operators.classify import (
        holistic_sections,
    )
    from intelligent_document_processing_on_aws_spark.operators.evaluation import (
        evaluate_attributes,
        evaluation_report,
        flatten_confidence_payloads,
    )

    pages = spark.read.parquet(os.path.join(fixtures_dir, "packet_pages.parquet"))
    segs = spark.read.parquet(os.path.join(fixtures_dir, "packet_segments.parquet"))
    plan = holistic_sections(pages, segs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan  # fully native

    cfg = spark.createDataFrame(eval_config_rows())
    counted = evaluate_attributes(
        spark.read.parquet(os.path.join(fixtures_dir, "flat_expected.parquet")),
        spark.read.parquet(os.path.join(fixtures_dir, "flat_actual.parquet")),
        cfg,
    )
    plan = evaluation_report(counted)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

    payloads = spark.read.parquet(
        os.path.join(fixtures_dir, "extraction_payloads.parquet"))
    plan = flatten_confidence_payloads(payloads)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_granular_assessment_plan_native(spark, fixtures_dir):
    """granular_assess is pure Catalyst: regexp task-id derivation + one
    broadcast dim join, zero Python stages of any kind."""
    from intelligent_document_processing_on_aws_spark.config import DOC_CLASSES
    from intelligent_document_processing_on_aws_spark.operators.assessment import (
        granular_assess,
        granular_task_dim,
    )

    flat = spark.read.parquet(os.path.join(fixtures_dir, "flat_actual.parquet"))
    secs = spark.read.parquet(os.path.join(fixtures_dir, "golden_sections.parquet"))
    cfg = spark.createDataFrame(eval_config_rows())
    dim = spark.createDataFrame(granular_task_dim(DOC_CLASSES))
    df = granular_assess(flat, secs, cfg, dim)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # AQE prints isFinalPlan=false before execution; execute THIS query
    # (collect, not count — count builds a new QueryExecution), then
    # confirm the final plan ran inside codegen spans (the `*(n)` stage
    # markers are AQE's WholeStageCodegen notation)
    df.collect()
    final = _plan(df)
    assert "isFinalPlan=true" in final
    assert "*(" in final


def test_ocr_table_markdown_plan_vectorized(spark):
    """The blocks->markdown query is one Arrow-batched MapInPandas over the
    scan — no shuffle, no row-at-a-time Python."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_ocr_table_markdown,
    )

    df = q_ocr_table_markdown(spark, "")
    plan = _plan(df)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # row-parallel: no shuffle at all


def test_round3_ngram_plan_hashed_keys_and_anti_join(spark):
    """The shingle pipeline shuffles 8-byte xxhash64 keys (never the
    shingle strings) and applies the df-cap as a broadcast LeftAnti join
    against the violator set — no per-row Python anywhere."""
    from intelligent_document_processing_on_aws_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared tokens") for i in range(50)],
        "doc_id long, text string",
    )
    # materialize=False keeps full lineage so the audit can see inside
    # the posting-table build (the default lazily checkpoints it)
    df = ngram_jaccard_pairs(docs, max_df=10, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "xxhash64" in plan
    assert "LeftAnti" in plan and "BroadcastExchange" in plan
    # the self-join keys on the hashed bigint column
    assert "sh#" in plan


def test_round3_bucket_cap_anti_join(spark):
    from intelligent_document_processing_on_aws_spark.operators.dedup import (
        _cap_buckets,
    )

    df = spark.createDataFrame(
        [(i, f"k{i % 3}") for i in range(30)], "doc_id long, band_key string")
    plan = (_cap_buckets(df, ["band_key"], 5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "LeftAnti" in plan and "BroadcastExchange" in plan


def test_dedup_posting_tables_checkpointed_by_default(spark):
    """The default pipelines materialize the (capped) posting/signature
    table once: the final plan reads an RDD scan where the checkpoint
    truncated lineage, instead of re-running the kernels per branch."""
    from intelligent_document_processing_on_aws_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared tokens") for i in range(30)],
        "doc_id long, text string",
    )
    for fn in (ngram_jaccard_pairs, minhash_lsh_pairs):
        df = fn(docs)
        df.count()  # checkpoint happens on first compute
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, fn.__name__


def test_round5_webfilter_plans(spark):
    """r4 web operators, pinned (r5 VERDICT #6): c4_clean and pii_stats
    are map-only codegen'd projections (zero Exchange, zero Python);
    url_dedup has exactly ONE Exchange (the canonical-key window) and no
    Python; doc_quality is one MapInPandas over the scan with zero
    Exchange."""
    from intelligent_document_processing_on_aws_spark.operators.quality import (
        doc_quality,
    )
    from intelligent_document_processing_on_aws_spark.operators.webfilters import (
        c4_clean,
        pii_stats,
        url_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "A proper sentence with five words.", "https://x.example/p")],
        "doc_id long, text string, url string")

    for op in (c4_clean, pii_stats):
        plan = _plan(op(docs))
        assert "BatchEvalPython" not in plan, op.__name__
        assert "MapInPandas" not in plan, op.__name__
        assert "Exchange" not in plan, op.__name__

    plan = _plan(url_dedup(docs))
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "Window" in plan

    plan = _plan(doc_quality(docs))
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_canonical_selection_plan_one_window_no_python(spark):
    """canonical_selection stays relational: the argmax-per-group is a
    single Window over group_id (running first_value), never an agg+join
    second pass and never Python — downstream of the score join there is
    exactly one group_id Exchange feeding one Window."""
    from intelligent_document_processing_on_aws_spark.operators.dedup import (
        canonical_selection,
    )

    groups = spark.createDataFrame(
        [(1, 1, 2, True), (2, 1, 2, False)],
        "doc_id long, group_id long, group_size long, is_duplicate boolean")
    quality = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id long, quality long")
    plan = _plan(canonical_selection(groups, quality, "quality"))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert plan.count("Window") == 1, plan[:1500]
    # shuffles: the doc_id equi-join sides + ONE group_id partitioning for
    # the window — no extra agg/join round-trip for the argmax
    assert plan.count("hashpartitioning(group_id") == 1, plan[:2000]


def test_round5_semantic_lookup_hashed_join_key(spark):
    """The SEMANTIC embeddings lookup joins on xxhash64(text) — an 8-byte
    bigint shuffle key — with the raw-string equality kept only as a
    residual predicate (r5 VERDICT #5)."""
    expected = spark.createDataFrame(
        [(1, "s", "p", "c", "hello world")],
        "doc_id long, section_id string, attr_path string, "
        "classification string, value string")
    actual = spark.createDataFrame(
        [(1, "s", "p", "c", "hello word")],
        "doc_id long, section_id string, attr_path string, "
        "classification string, value string")
    cfg = spark.createDataFrame(eval_config_rows())
    emb = spark.createDataFrame(
        [("hello world", [0.1] * 4), ("hello word", [0.1] * 4)],
        "text string, embedding array<double>")
    df = evaluate_attributes(expected, actual, cfg, embeddings=emb)
    plan = _plan(df)
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan


def test_warc_ingestion_plan_map_only(spark):
    """r5 WARC source: one Arrow MapInPandas directly over the binaryFile
    scan — zero Exchange, zero row-Python. At 100 TB the ingestion stage
    must scale exactly like the file listing (the file is the parallel
    unit for non-splittable gzip WARCs)."""
    from intelligent_document_processing_on_aws_spark.sources.warc import (
        read_warc,
    )

    df = read_warc(spark, "fixtures_data/warc")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_round5_lang_classifier_plan_single_arrow_pass(spark):
    """fastText-style lang-ID inference is ONE Arrow batch pass over the
    scan (r6: the interpreted Catalyst lambda chain moved to exact-
    integer numpy inside mapInArrow — the lm_perplexity audit shape):
    a single MapInArrow, zero Exchange, no row-at-a-time Python —
    inference still scales exactly like the scan."""
    from intelligent_document_processing_on_aws_spark.operators.ft_classifier import (
        classify_lang,
    )

    docs = spark.createDataFrame(
        [(1, "en", "the quick brown fox jumps")],
        "doc_id long, lang string, text string")
    df = classify_lang(docs, [[1] * 64, [2] * 64], [0, 0],
                       ["en", "de"], n_buckets=64)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInArrow") == 1
    assert "Exchange" not in plan


def test_round5_lm_perplexity_plan_single_arrow_pass(spark):
    """CCNet perplexity scoring is ONE broadcast-model Arrow pass over
    the corpus: a single MapInPandas, zero Exchange, zero row-Python."""
    from intelligent_document_processing_on_aws_spark.operators.lm_filter import (
        BigramLM,
        score_perplexity,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d")], "doc_id long, text string")
    lm = BigramLM(unigram={"a": 2, "b": 2}, bigram={("a", "b"): 2}, v=3)
    plan = _plan(score_perplexity(docs, lm))
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_round5_line_dedup_plan_pure_relational(spark):
    """Cross-document line dedup stays entirely JVM-side: posexplode +
    window + distinct-agg + joins, no Python stage of any kind, and a
    bounded number of shuffles (line window, distinct DF agg, doc
    rebuild + joins)."""
    from intelligent_document_processing_on_aws_spark.operators.dedup import (
        line_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\nz")], "doc_id long, text string")
    plan = _plan(line_dedup(docs))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Window" in plan
    assert plan.count("Exchange") <= 8, plan.count("Exchange")


def test_round5_audio_plans_map_only(spark):
    """Audio decode/probe stages are one Arrow MapInPandas over the
    payload scan — zero Exchange; at 100 TB they scale exactly like the
    binary-column scan."""
    from intelligent_document_processing_on_aws_spark.operators.multimodal import (
        audio_signal_stats,
        probe_av_meta,
    )

    items = spark.createDataFrame(
        [(1, bytearray(b"RIFF"))], "item_id long, payload binary")
    for op in (audio_signal_stats, probe_av_meta):
        plan = _plan(op(items))
        assert "BatchEvalPython" not in plan, op.__name__
        assert plan.count("MapInPandas") == 1, op.__name__
        assert "Exchange" not in plan, op.__name__


def test_round5_decontamination_plan_broadcast_no_python(spark):
    """Decontamination is scan-shaped: corpus n-gram windows are native
    (transform over sequence, codegen), the eval gram table is
    BROADCAST (the corpus never shuffles for the match), and the only
    Exchange is the per-doc hit aggregation keyed on doc_id."""
    from intelligent_document_processing_on_aws_spark.operators.contamination import (
        contamination_report,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n")], "doc_id long, text string")
    evals = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m")], "eval_id long, text string")
    plan = _plan(contamination_report(corpus, evals, n=13))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    drop_plan = _plan(decontaminate(corpus, evals, n=13))
    assert "BroadcastHashJoin" in drop_plan
    assert "BatchEvalPython" not in drop_plan


def test_round5_sampling_plans(spark):
    """hash_sample is a pure codegen'd filter inside the scan stage
    (zero Exchange, zero Python); temperature_sample shuffles only the
    tiny per-stratum rates table and broadcasts it back."""
    from intelligent_document_processing_on_aws_spark.operators.sampling import (
        hash_sample,
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(1, "en", 10)], "doc_id long, lang string, n_tokens long")
    plan = _plan(hash_sample(df, 500_000))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan
    strat = _plan(hash_sample(df, {"en": 1}, stratum_col="lang"))
    assert "Exchange" not in strat
    temp = _plan(temperature_sample(df, "lang", 100))
    assert "BatchEvalPython" not in temp
    assert "BroadcastHashJoin" in temp or "BroadcastNestedLoopJoin" in temp


def test_semdedup_plan_cluster_join_no_row_python(spark):
    """SemDeDup: assignment is ONE Arrow map pass; the pair stage joins on
    the centroid key (bounded clusters), never an unkeyed cross join."""
    from intelligent_document_processing_on_aws_spark.operators.semdedup import (
        semdedup,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.1 * i, 0.0]) for i in range(40)],
        ["vec_id", "embedding"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = semdedup(df, threshold=0.99, n_centroids=4)
    plan = _plan(out)
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan            # the Arrow assignment pass
    assert "CartesianProduct" not in plan   # pair stage keyed on centroid
    assert "BroadcastNestedLoopJoin" not in plan


def test_round5_tier_family_plans(spark):
    """Central audit for the r5 tier family: tier_mix's corpus side is a
    broadcast-rate compare (no wide shuffle of the corpus), host_split
    is map-only, perplexity_tiers/tier_agreement never sort or
    SortMergeJoin the corpus, and none of them run row-at-a-time
    Python."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_host_split,
        q_perplexity_tiers,
        q_tier_agreement,
        q_tier_mix,
    )

    sf = "/root/testdata/sf0.001"

    hs = _plan(q_host_split(spark, sf))
    assert "Exchange" not in hs and "BatchEvalPython" not in hs

    tm = _plan(q_tier_mix(spark, sf))
    # rate table broadcasts back; the corpus-side filter is a codegen'd
    # md5-bucket compare — no SortMergeJoin anywhere
    assert "BroadcastHashJoin" in tm and "SortMergeJoin" not in tm
    assert "BatchEvalPython" not in tm and "MapInPandas" not in tm

    for q in (q_perplexity_tiers, q_tier_agreement):
        p = _plan(q(spark, sf))
        assert "SortMergeJoin" not in p, q.__name__
        assert p.count("BroadcastExchange") == 1, q.__name__
        assert "BatchEvalPython" not in p, q.__name__


def test_source_tier_profile_plan_two_exchanges(spark):
    """source_tier_profile: the corpus crosses the wire ONCE (partial-agg
    groupBy source+tier); the share/dominant windows both run on a single
    source repartition of the <=5-rows-per-source aggregated frame —
    exactly two physical Exchanges, one Sort, no Python."""
    from intelligent_document_processing_on_aws_spark.operators.tiers import (
        source_tier_profile,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta", "s"), (2, "gamma", "t")],
        "doc_id long, text string, source string")
    plan = _plan(source_tier_profile(df))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert plan.count("Exchange") == 2, plan[:2000]
    assert plan.count("Window") == 2, plan[:2000]


def test_winnow_fingerprints_plan_single_doc_exchange(spark):
    """winnow_fingerprints: gram explode is map-side and the ordered
    frame + per-doc count + final distinct all run off ONE doc_id
    Exchange; the argmin is a JVM array aggregate — no Python, no
    second shuffle before the distinct's partial agg."""
    from intelligent_document_processing_on_aws_spark.operators.dedup import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z w v u t")],
        "doc_id long, text string")
    plan = _plan(winnow_fingerprints(docs))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert plan.count("hashpartitioning(doc_id") <= 2, plan[:2000]
    assert "Window" in plan


def test_sentence_queries_plan_map_only(spark):
    """sentence_segments / sentence_chunks: ONE Arrow MapInPandas
    directly over the pruned parquet scan — zero Exchange, zero
    row-Python. Segmentation and packing are per-document, so at 100 TB
    both stages scale exactly like the scan."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_sentence_chunks,
        q_sentence_segments,
    )

    for q in (q_sentence_segments, q_sentence_chunks):
        df = q(spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan, plan[:2000]
        assert plan.count("MapInPandas") == 1
        formatted = _formatted(df)
        read = formatted.split("ReadSchema:")[-1].split("\n")[0]
        assert "family" not in read  # column pruning: only doc_id, text


def test_sitemap_queries_plan_shapes(spark):
    """sitemap_entries: one Arrow MapInPandas over the binary scan —
    zero Exchange. sitemap_fetchlist: both sides reduce via partial
    hash aggregates before ONE url-key join (<=3 Exchanges total:
    two agg shuffles + AQE artifacts), so only one row per distinct
    url crosses the wire — never one per capture."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_sitemap_entries,
        q_sitemap_fetchlist,
    )

    df = q_sitemap_entries(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("MapInPandas") == 1

    df = q_sitemap_fetchlist(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
    assert plan.count("Exchange") <= 3, plan[:3000]
    # partial aggregation must precede the exchanges on both sides
    assert plan.count("HashAggregate") >= 4, plan[:3000]


def test_feed_entries_plan_map_only(spark):
    """feed_entries: one Arrow MapInPandas over the binary scan — zero
    Exchange; feed parsing scales exactly like the scan."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_feed_entries,
    )

    df = q_feed_entries(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("MapInPandas") == 1


def test_fetch_schedule_plan_windowgrouplimit(spark):
    """fetch_schedule: the max_per_host rank-limit must plan
    WindowGroupLimit (giant hosts prune map-side BEFORE the host
    Exchange); the crawl-delay join must broadcast; zero Python."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_fetch_schedule,
    )

    plan = _plan(q_fetch_schedule(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "WindowGroupLimit" in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_page_dates_plan_map_only(spark):
    """page_dates: one Arrow MapInPandas over the pruned scan — zero
    Exchange; date extraction scales exactly like the scan."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_page_dates,
    )

    df = q_page_dates(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("MapInPandas") == 1
    formatted = _formatted(df)
    read = formatted.split("ReadSchema:")[-1].split("\n")[0]
    assert "family" not in read


def test_recency_mix_plan_map_side_weight(spark):
    """recency_mix: weight + keep-bit are pure row functions (no
    Python, no window); the only Exchange is the tiny per-source
    rollup with a map-side partial aggregate."""
    from intelligent_document_processing_on_aws_spark.entry_queries import (
        q_recency_mix,
    )

    plan = _plan(q_recency_mix(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") == 1, plan[:2000]
    assert plan.count("HashAggregate") == 2, plan[:2000]
