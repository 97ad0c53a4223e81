"""Host link-graph extraction + integer PageRank."""

from __future__ import annotations

from intelligent_document_processing_on_aws_spark.operators.linkgraph import (
    SCALE,
    extract_links,
    pagerank_hosts,
)


def test_extract_links_absolute_cross_host_only(spark):
    html = (
        b'<a href="https://other.example/page">x</a>'
        b"<a href='HTTP://Second.Example:8080/a'>y</a>"
        b'<a href="/relative/path">rel</a>'
        b'<a href="#frag">frag</a>'
        b'<a href="https://self.example/again">self</a>'
        b'<link href="https://assets.example/s.css">'
    )
    pages = spark.createDataFrame(
        [("https://self.example/index", html)], "url string, html binary"
    )
    got = {
        (r["src_host"], r["dst_host"])
        for r in extract_links(pages).collect()
    }
    assert got == {
        ("self.example", "other.example"),
        ("self.example", "second.example"),  # lowercased, port stripped
        ("self.example", "assets.example"),
    }


def _py_pagerank(edges, n_iter=3):
    edges = sorted(set(edges))
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(hosts)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {h: SCALE // n for h in hosts}
    teleport = ((SCALE * 3) // 20) // n
    for _ in range(n_iter):
        incoming = {h: 0 for h in hosts}
        for s, d in edges:
            incoming[d] += rank[s] // deg[s]
        rank = {h: teleport + (17 * incoming[h]) // 20 for h in hosts}
    return rank


def test_pagerank_matches_pure_python_and_is_deterministic(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "c"),  # e dangles into c
        ("a", "b"),  # duplicate edge must collapse
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r["rank"] for r in pagerank_hosts(df, 3).collect()}
    assert got == _py_pagerank(edges)
    # hub 'c' outranks the dangling leaf 'e'
    assert got["c"] > got["e"]
    # bit-stable under repartitioning (integer arithmetic is order-free)
    got2 = {
        r["host"]: r["rank"]
        for r in pagerank_hosts(df.repartition(5), 3).collect()
    }
    assert got2 == got


def test_pagerank_plan_no_python(spark):
    df = spark.createDataFrame(
        [("a", "b")], "src_host string, dst_host string")
    plan = (
        pagerank_hosts(df, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_anchor_pairs_and_terms(spark):
    from pyspark.sql import functions as F

    from intelligent_document_processing_on_aws_spark.operators.linkgraph import (
        anchor_pairs,
        anchor_terms,
    )

    pages = spark.createDataFrame(
        [
            ("https://a.com/1",
             '<a href="https://b.com/x">Great Site</a>'
             '<a href="/rel">relative skipped</a>'
             '<a href="https://a.com/self">same host skipped</a>'
             '<a href="https://b.com/y">great again</a>'),
            ("https://c.com/2",
             '<A HREF="https://b.com/z">GREAT</A>'),   # case-insensitive
            ("https://d.com/3", "<p>no links</p>"),
        ],
        "url string, html string",
    )
    pairs = anchor_pairs(pages).collect()
    assert sorted((r["src_host"], r["dst_host"], r["anchor"])
                  for r in pairs) == [
        ("a.com", "b.com", "Great Site"),
        ("a.com", "b.com", "great again"),
        ("c.com", "b.com", "GREAT"),
    ]
    terms = anchor_terms(pages, k=2).collect()
    got = [(r["dst_host"], r["term"], r["n_anchors"]) for r in terms]
    # 'great' appears 3x (case-folded); tie between 'again'/'site' at 1
    # resolves term-asc -> 'again'
    assert sorted(got) == [("b.com", "again", 1), ("b.com", "great", 3)]
    # native end to end: no Python eval anywhere in the plan
    plan = anchor_terms(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_trustrank_seed_teleport_and_reverse_propagation(spark):
    from intelligent_document_processing_on_aws_spark.operators.linkgraph import (
        SCALE,
        trustrank_hosts,
    )

    # linker -> spam ; clean -> other (disconnected from spam)
    edges = spark.createDataFrame(
        [("linker.com", "spam.com"), ("clean.com", "other.com")],
        ["src_host", "dst_host"],
    )
    seeds = spark.createDataFrame([("spam.com",)], ["host"])
    fwd = {r["host"]: r["rank"]
           for r in trustrank_hosts(edges, seeds, n_iter=2).collect()}
    # forward: spam.com has no outlinks -> nothing propagates; only the
    # seed holds teleport mass
    assert fwd["spam.com"] > 0
    assert fwd["linker.com"] == 0 and fwd["clean.com"] == 0

    rev = {r["host"]: r["rank"]
           for r in trustrank_hosts(edges, seeds, n_iter=2, reverse=True).collect()}
    # Anti-TrustRank: distrust flows BACKWARD -> the host linking into
    # spam inherits mass; the disconnected pair stays at zero
    assert rev["spam.com"] > rev["linker.com"] > 0
    assert rev["clean.com"] == 0 and rev["other.com"] == 0
    # hand-check iteration 2 exactly: rank1(spam) = teleport = 3*SCALE//20
    # (no in-edges), so rank2(linker) = 17 * rank1(spam) DIV 20
    assert rev["linker.com"] == 17 * (SCALE * 3 // 20) // 20
    assert rev["spam.com"] == SCALE * 3 // 20


def test_trustrank_no_seeds_in_graph_is_all_zero(spark):
    from intelligent_document_processing_on_aws_spark.operators.linkgraph import (
        trustrank_hosts,
    )

    edges = spark.createDataFrame(
        [("a.com", "b.com")], ["src_host", "dst_host"]
    )
    seeds = spark.createDataFrame([("absent.com",)], ["host"])
    out = trustrank_hosts(edges, seeds, n_iter=3).collect()
    assert {r["rank"] for r in out} == {0}


def test_trustrank_deterministic_across_partitioning(spark):
    from intelligent_document_processing_on_aws_spark.operators.linkgraph import (
        trustrank_hosts,
    )

    edges_rows = [
        (f"h{i % 11}", f"h{(3 * i + 1) % 11}") for i in range(60)
        if i % 11 != (3 * i + 1) % 11
    ]
    seeds = spark.createDataFrame([("h0",), ("h1",)], ["host"])
    a = trustrank_hosts(
        spark.createDataFrame(edges_rows, ["src_host", "dst_host"]),
        seeds, n_iter=3, reverse=True,
    ).orderBy("host").collect()
    b = trustrank_hosts(
        spark.createDataFrame(edges_rows, ["src_host", "dst_host"])
        .repartition(13),
        seeds, n_iter=3, reverse=True,
    ).orderBy("host").collect()
    assert a == b and len(a) > 0
