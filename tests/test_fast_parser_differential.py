"""Fast regex-tokenizer frontend vs stdlib html.parser — differential."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from intelligent_document_processing_on_aws_spark.fixtures.pages_gen import gen_pages
from intelligent_document_processing_on_aws_spark.kernels.html_dom import (
    parse_blocks,
    parse_blocks_stdlib,
)


def _sig(blocks):
    return [(b.text, b.link_chars, b.path, b.is_table) for b in blocks]


def test_differential_on_fixtures():
    for rec in gen_pages(300):
        if rec["content_type"] != "html":
            continue
        assert _sig(parse_blocks(bytes(rec["html"]))) == _sig(
            parse_blocks_stdlib(bytes(rec["html"]))
        ), rec["url"]


WELL_FORMED = st.lists(
    st.one_of(
        st.text(alphabet="abc def&amp;", max_size=15),
        st.sampled_from(
            ["<p>", "</p>", "<div>", "</div>", "<a href=\"x\">", "</a>",
             "<article>", "</article>", "<nav>", "</nav>",
             "<script>var x=1;</script>", "<!-- c -->", "<br/>",
             "<ul><li>", "</li></ul>", "&#65;", "&lt;"]
        ),
    ),
    max_size=25,
).map("".join)


@settings(max_examples=120, deadline=None)
@given(WELL_FORMED)
def test_differential_on_generated_soup(html):
    assert _sig(parse_blocks(html)) == _sig(parse_blocks_stdlib(html))
