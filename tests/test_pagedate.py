"""kernels/pagedate — published-date ladder unit + differential tests.

Spark-level parity (query vs composition-fact golden) runs in the
oracle sweep; these pin ladder precedence, the head boundary, URL date
validation (range + calendar), and totality.
"""

from intelligent_document_processing_on_aws_spark.fixtures.pagedate_gen import (
    gen_pagedate_docs,
)
from intelligent_document_processing_on_aws_spark.kernels.pagedate import (
    extract_page_date,
)


def test_meta_published_beats_everything():
    r = extract_page_date(
        "https://a.com/2020/01/01/x",
        '<head><meta property="article:published_time" '
        'content="2024-05-06T07:08:09Z">'
        '<meta property="article:modified_time" content="2023-01-01"></head>'
        '<body><time datetime="2022-02-02">x</time></body>',
    )
    assert (r.epoch, r.source) == (1714979289, "meta")


def test_modified_beats_bare_date_meta():
    r = extract_page_date(
        "https://a.com/x",
        '<head><meta name="date" content="2021-01-01">'
        '<meta property="article:modified_time" content="2022-02-02"></head>',
    )
    assert r.source == "meta" and r.epoch == 1643760000


def test_meta_after_body_ignored():
    r = extract_page_date(
        "https://a.com/x",
        '<head><title>t</title></head><body>'
        '<meta property="article:published_time" content="2024-01-01">'
        "</body>",
    )
    assert (r.epoch, r.source) == (None, None)


def test_time_tag_beats_url():
    r = extract_page_date(
        "https://a.com/2020/01/01/x",
        '<head></head><body><time datetime="2024-05-06">x</time></body>',
    )
    assert (r.epoch, r.source) == (1714953600, "time_tag")


def test_url_forms_and_validation():
    assert extract_page_date("https://a.com/2024/05/06/x", "").source == "url"
    assert extract_page_date("https://a.com/p/2024-05-06.html", "").source == "url"
    # year-month only -> first of month
    r = extract_page_date("https://a.com/2024/05?page=2", "")
    assert r.epoch == 1714521600
    # out-of-range year, bad month, impossible calendar day all rejected
    for u in ("https://a.com/1234/05/06/x", "https://a.com/2024/13/01/x",
              "https://a.com/2024-02-30/x"):
        assert extract_page_date(u, "").source is None, u
    # a bogus early segment is skipped, a later valid one wins
    r = extract_page_date("https://a.com/2024/13/2021-03-04.html", "")
    assert (r.epoch, r.source) == (1614816000, "url")


def test_totality():
    for u, h in (("", ""), (None, None), ("x", "<time datetime='nope'>")):
        r = extract_page_date(u, h)
        assert r.source in (None, "meta", "time_tag", "url")


def test_differential_against_generator_facts():
    for d in gen_pagedate_docs(320):
        r = extract_page_date(d["url"], d["html"])
        assert (r.epoch, r.source) == (d["epoch"], d["source"]), d["doc_id"]


def test_meta_name_prefix_does_not_match():
    """name="dateline" must not produce a published date — the keyword
    has to END the attribute value (the old optional-closing-quote
    spelling matched any name merely starting with 'date')."""
    none = extract_page_date(
        "http://h/x", '<html><head><meta name="dateline" '
        'content="2020-01-01"></head></html>')
    assert none.source != "meta"
    real = extract_page_date(
        "http://h/x", '<html><head><meta name="date" '
        'content="2020-01-01"></head></html>')
    assert real.source == "meta" and real.epoch is not None
