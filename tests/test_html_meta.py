"""kernels/html_meta — head-metadata extraction unit + property tests.

Spark-level parity (query vs construction-derived golden) runs in the
oracle sweep; these pin first-wins precedence, the </head>/<body> scan
boundary, attribute-order/quoting/case invariance, entity decoding in
<title>, and no-crash totality on mangled markup.
"""

import random

from intelligent_document_processing_on_aws_spark.fixtures.html_meta_gen import (
    FAMILIES,
    gen_html_meta_docs,
)
from intelligent_document_processing_on_aws_spark.kernels.html_meta import (
    extract_head_meta,
)


def test_plain_fields():
    m = extract_head_meta(
        '<html lang="en-US"><head><title>A Page</title>'
        '<meta name="description" content="hello world">'
        '<link rel="canonical" href="https://x.com/a"></head><body></body></html>'
    )
    assert m.title == "A Page"
    assert m.description == "hello world"
    assert m.canonical == "https://x.com/a"
    assert m.lang == "en-US"


def test_attribute_order_quoting_case_invariance():
    variants = (
        '<meta name="description" content="d1">',
        "<meta content='d1' name='description'>",
        "<META CONTENT=d1 NAME=description>",
    )
    for v in variants:
        m = extract_head_meta(f"<html><head>{v}</head><body></body></html>")
        assert m.description == "d1", v


def test_title_entities_and_whitespace_collapse():
    m = extract_head_meta(
        "<head><TITLE>A &amp; B &#x2014;\n\t  C</TITLE></head>"
    )
    assert m.title == "A & B — C"


def test_first_wins():
    m = extract_head_meta(
        "<head><title>first</title><title>second</title>"
        '<link rel="canonical" href="u1"><link rel="canonical" href="u2">'
        "</head>"
    )
    assert m.title == "first"
    assert m.canonical == "u1"


def test_body_tag_terminates_scan_without_head_close():
    m = extract_head_meta(
        "<html><head><title>t</title><body>"
        '<meta name="description" content="in-body must be ignored">'
    )
    assert m.title == "t"
    assert m.description is None


def test_og_fields_and_robots():
    m = extract_head_meta(
        '<head><meta property="og:title" content="OT">'
        '<meta property="og:image" content="https://x/i.png">'
        '<meta property="og:locale" content="en_US">'  # not promoted
        '<meta name="robots" content="noindex, nofollow"></head>'
    )
    assert m.og_title == "OT"
    assert m.og_image == "https://x/i.png"
    assert m.robots_meta == "noindex, nofollow"


def test_multi_rel_canonical():
    m = extract_head_meta('<head><link rel="alternate canonical" href="u"></head>')
    assert m.canonical == "u"


def test_empty_and_missing_fields_are_none():
    m = extract_head_meta("<html><head></head><body>x</body></html>")
    assert all(
        getattr(m, f) is None
        for f in ("title", "description", "canonical", "lang", "robots_meta",
                  "og_title", "og_description", "og_url", "og_image", "og_type")
    )
    # empty-content meta must stay None, not ""
    m = extract_head_meta('<head><meta name="description" content=""></head>')
    assert m.description is None


def test_eof_inside_title_keeps_partial():
    m = extract_head_meta("<head><title>trunca")
    assert m.title == "trunca"


def test_total_on_mangled_markup():
    rng = random.Random(7)
    pool = "<>=\"'abc title meta og: head body &#x; \x00\xe9"
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(200)))
        extract_head_meta(s)  # must never raise
    extract_head_meta("<head><title>" + "<" * 5000)
    extract_head_meta("<meta " + "a" * 10000 + "=b>")


def test_generator_facts_roundtrip():
    from dataclasses import asdict

    docs = gen_html_meta_docs(len(FAMILIES) * 5)
    for d in docs:
        m = asdict(extract_head_meta(d["html"]))
        for k, v in m.items():
            assert v == d[k], (d["doc_id"], d["family"], k)


def test_spark_query_matches_golden(spark):
    import duckdb

    from intelligent_document_processing_on_aws_spark import entry_queries as eq

    sdf = (eq.q_html_meta(spark, "")  # sf_dir unused: fixture-backed
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    odf = (duckdb.connect().execute(eq._sql_html_meta()).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert sdf.columns.tolist() == odf.columns.tolist()
    assert sdf.equals(odf)
