"""Property-based tests (hypothesis) for the pure kernels."""

from __future__ import annotations

import itertools
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from intelligent_document_processing_on_aws_spark.fixtures.packets_gen import _unflatten
from intelligent_document_processing_on_aws_spark.kernels.compare import (
    compare_fuzzy,
    fuzz_score,
    hungarian_min_cost,
    levenshtein,
)
from intelligent_document_processing_on_aws_spark.kernels.fingerprint import (
    hamming64,
    jaccard,
    simhash64,
)
from intelligent_document_processing_on_aws_spark.kernels.pagination import (
    text_to_pages,
    wrap_lines,
)
from intelligent_document_processing_on_aws_spark.kernels.textnorm import (
    flatten_nested_data,
)

words = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
texts = st.lists(words, min_size=0, max_size=40).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(texts, texts)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert d == 0 if a == b else d >= 1
    assert d <= max(len(a), len(b))


@settings(max_examples=40, deadline=None)
@given(texts, texts)
def test_fuzzy_score_bounds(a, b):
    s = fuzz_score(a, b)
    assert 0.0 <= s <= 1.0
    matched, score = compare_fuzzy(a, b, 0.8)
    assert matched == (score >= 0.8) or (not a.strip() and not b.strip())


@settings(max_examples=25, deadline=None)
@given(st.integers(2, 5), st.integers(0, 10**6))
def test_hungarian_vs_bruteforce(n, seed):
    rng = random.Random(seed)
    cost = [[rng.uniform(0, 1) for _ in range(n)] for _ in range(n)]
    best = min(
        sum(cost[i][p[i]] for i in range(n))
        for p in itertools.permutations(range(n))
    )
    got = sum(cost[i][j] for i, j in hungarian_min_cost(cost))
    assert abs(got - best) < 1e-9


@settings(max_examples=25, deadline=None)
@given(st.integers(2, 4), st.integers(2, 5), st.integers(0, 10**6))
def test_hungarian_rectangular(rows, cols, seed):
    rng = random.Random(seed)
    cost = [[rng.uniform(0, 1) for _ in range(cols)] for _ in range(rows)]
    pairs = hungarian_min_cost(cost)
    assert len(pairs) == min(rows, cols)
    assert len({i for i, _ in pairs}) == len(pairs)
    assert len({j for _, j in pairs}) == len(pairs)


@settings(max_examples=40, deadline=None)
@given(texts)
def test_jaccard_self_identity(t):
    assert jaccard(t, t) == 1.0
    assert 0 <= hamming64(simhash64(t), simhash64(t + " zz")) <= 64


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="ab \n", max_size=400))
def test_pagination_preserves_nonblank_content(content):
    """wrap+paginate must preserve all non-whitespace characters in order."""
    pages = text_to_pages(content)
    joined = "".join(pages)
    assert "".join(joined.split()) == "".join(content.split())
    for line in wrap_lines(content):
        assert len(line) <= 160


html_fragments = st.lists(
    st.one_of(
        st.text(alphabet="abc <>/&;#xp!-=\"'", max_size=20),
        st.sampled_from(
            ["<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>",
             "<table>", "<tr>", "<td>", "</td>", "</tr>", "</table>",
             "<script>", "</script>", "&amp;", "&#65;", "<!--", "-->",
             "<nav>", "</nav>", "<article>", "</article>", "<br>", "<title>"]
        ),
    ),
    max_size=30,
).map("".join)


@settings(max_examples=80, deadline=None)
@given(html_fragments)
def test_html_extraction_total(html):
    """extract_html must never raise on arbitrary tag soup, and always
    return consistent spans/confidence."""
    from intelligent_document_processing_on_aws_spark.kernels.boilerplate import (
        extract_html,
    )

    res = extract_html(html.encode("utf-8"))
    assert 0.0 <= res.confidence <= 1.0
    for s in res.spans:
        assert res.extracted_text[s.start:s.end] != "" or s.start == s.end


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcXYZ_", min_size=1, max_size=8).filter(
            lambda s: "[" not in s and "." not in s
        ),
        st.one_of(
            st.text(max_size=5),
            st.dictionaries(
                st.text(alphabet="mn", min_size=1, max_size=3),
                st.text(max_size=4),
                max_size=3,
            ),
            st.lists(
                st.dictionaries(
                    st.text(alphabet="pq", min_size=1, max_size=3),
                    st.text(max_size=4),
                    min_size=1,
                    max_size=2,
                ),
                max_size=3,
            ),
        ),
        max_size=5,
    )
)
def test_flatten_unflatten_roundtrip(data):
    flat = flatten_nested_data(data)
    # dropping empty containers is expected; compare via re-flatten
    assert flatten_nested_data(_unflatten(flat)) == flat


@settings(max_examples=120, deadline=None)
@given(
    st.text(alphabet="abc \n", min_size=0, max_size=2000),
    st.integers(1, 50),
    st.integers(1, 8),
    st.integers(0, 99),
)
def test_chunker_properties(text, max_chunk, token_size, overlap_pct):
    """criteria chunker invariants for ANY params: terminates, covers every
    char, windows sit at the reference's exact offsets, single-chunk rule
    honored (criteria_validation/service.py:81-126 semantics)."""
    from intelligent_document_processing_on_aws_spark.operators.criteria import (
        chunk_text_with_overlap,
    )

    chunks = chunk_text_with_overlap(text, max_chunk, token_size, overlap_pct)
    if len(text) // token_size <= max_chunk:
        assert chunks == [text]
        return
    chunk_chars = max_chunk * token_size
    overlap = int(chunk_chars * (overlap_pct / 100))
    # reconstruct the reference walk and demand byte-equality per window
    start, covered = 0, 0
    for c in chunks:
        end = min(start + chunk_chars, len(text))
        assert c == text[start:end]
        covered = max(covered, end)
        start = end - overlap
    assert covered == len(text)  # full coverage, no tail loss
    # every boundary except the last overlaps its successor by `overlap`
    for a, b in zip(chunks, chunks[1:]):
        assert a[len(a) - overlap:] == b[:overlap] or len(b) < overlap


# -- round-3: PDF predictor / CMap / TJ properties ---------------------------

@given(st.binary(min_size=0, max_size=256), st.integers(1, 16),
       st.integers(0, 10**6))
@settings(max_examples=60)
def test_png_predictor_roundtrip(data, columns, seed):
    """Up-filter encode (generator) -> png_unpredict (kernel) is identity
    on complete rows for any payload and column width."""
    import random

    from intelligent_document_processing_on_aws_spark.fixtures.realpdf_gen import (
        _png_predict_up,
    )
    from intelligent_document_processing_on_aws_spark.kernels.real_pdf import (
        png_unpredict,
    )

    rng = random.Random(seed)
    pad = data + bytes(rng.randrange(256) for _ in range((-len(data)) % columns))
    assert png_unpredict(_png_predict_up(pad, columns), 12, columns) == pad


@given(st.integers(0, 10**6), st.booleans())
@settings(max_examples=40)
def test_tounicode_cmap_roundtrip(seed, two_byte):
    """Random charset -> generated CMap stream -> parse_tounicode recovers
    every code->char mapping exactly (bfchar, both bfrange forms)."""
    import random

    from intelligent_document_processing_on_aws_spark.fixtures.realpdf_gen import (
        _cmap_stream,
    )
    from intelligent_document_processing_on_aws_spark.kernels.real_pdf import (
        parse_tounicode,
    )

    rng = random.Random(seed)
    base = 0x0100 if two_byte else 0
    char_code = {chr(0x61 + k): base + 0x40 + k for k in range(26)}
    extra = rng.sample(" .,!?0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                       rng.randrange(0, 12))
    next_code = base + 1
    for ch in sorted(extra):
        char_code[ch] = next_code
        next_code += 1
    width, mapping = parse_tounicode(
        _cmap_stream(char_code, two_byte, rng)
    )
    assert width == (2 if two_byte else 1)
    for ch, code in char_code.items():
        assert mapping.get(code) == ch, (ch, code)


@given(st.lists(st.one_of(
    st.text(alphabet="abc XY", min_size=0, max_size=8),
    st.floats(min_value=-900, max_value=900, allow_nan=False),
), max_size=12))
@settings(max_examples=80)
def test_tj_gap_join_invariants(arr):
    """_join_tj: never two adjacent spaces introduced, no leading/trailing
    gap padding, and with no word-gap adjustments it is plain concat."""
    from intelligent_document_processing_on_aws_spark.kernels.real_pdf import (
        WORD_GAP_TJ,
        _join_tj,
    )

    out = _join_tj(arr)
    strs = [e for e in arr if isinstance(e, str)]
    concat = "".join(strs)
    if not any(isinstance(e, float) and e <= -WORD_GAP_TJ for e in arr):
        assert out == concat
    # inserted gaps are single spaces between non-space chars: they can
    # never create a new double-space run
    assert out.count("  ") <= concat.count("  ")
    assert len(out) - len(concat) <= max(0, len(strs) - 1)
    assert out.replace(" ", "") == concat.replace(" ", "")


# -- PDF filter codecs + simple-font encodings (round-3) ---------------------


@given(st.binary(max_size=3000))
@settings(max_examples=60, deadline=None)
def test_ascii85_roundtrip(data):
    import base64

    from intelligent_document_processing_on_aws_spark.kernels.real_pdf import (
        _ascii85_decode,
    )

    armored = base64.a85encode(data, adobe=True)[2:]  # PDF form: no <~
    assert _ascii85_decode(armored) == data
    # whitespace anywhere in the armor is legal
    spaced = b"\n".join(armored[i:i + 7] for i in range(0, len(armored), 7))
    assert _ascii85_decode(spaced) == data


@given(st.binary(max_size=2000))
@settings(max_examples=60, deadline=None)
def test_asciihex_roundtrip(data):
    import binascii

    from intelligent_document_processing_on_aws_spark.kernels.real_pdf import (
        _asciihex_decode,
    )

    assert _asciihex_decode(binascii.hexlify(data) + b">") == data
    assert _asciihex_decode(binascii.hexlify(data).upper() + b">") == data


@given(st.text(alphabet="abcdef \n\t", max_size=4000).map(str.encode))
@settings(max_examples=40, deadline=None)
def test_lzw_roundtrip_property(data):
    from intelligent_document_processing_on_aws_spark.fixtures.realpdf_gen import (
        _lzw_encode,
    )
    from intelligent_document_processing_on_aws_spark.kernels.real_pdf import (
        lzw_decode,
    )

    assert lzw_decode(_lzw_encode(data)) == data


@given(st.binary(max_size=1500))
@settings(max_examples=40, deadline=None)
def test_lzw_roundtrip_arbitrary_bytes(data):
    from intelligent_document_processing_on_aws_spark.fixtures.realpdf_gen import (
        _lzw_encode,
    )
    from intelligent_document_processing_on_aws_spark.kernels.real_pdf import (
        lzw_decode,
    )

    assert lzw_decode(_lzw_encode(data)) == data


@given(st.lists(st.sampled_from(sorted(
    __import__("intelligent_document_processing_on_aws_spark.kernels.pdf_encodings",
               fromlist=["GLYPH_NAMES"]).GLYPH_NAMES)), min_size=1, max_size=12,
    unique=True), st.integers(32, 250))
@settings(max_examples=60, deadline=None)
def test_differences_mapping_consistent(names, start):
    """Every code assigned through a /Differences run decodes to its
    glyph's text (or falls back to latin-1 when the glyph text equals it)."""
    from intelligent_document_processing_on_aws_spark.kernels.pdf_encodings import (
        GLYPH_NAMES,
        parse_encoding,
    )

    diffs = f"{start} " + " ".join("/" + n for n in names)
    mapping = parse_encoding(f"<< /Differences [ {diffs} ] >>".encode()) or {}
    for k, name in enumerate(names):
        code = start + k
        if code > 255:
            continue
        want = GLYPH_NAMES[name]
        got = mapping.get(code, bytes([code]).decode("latin-1"))
        assert got == want


# --- r5 kernels: BPE + robots ------------------------------------------------

_word_st = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
    min_size=1, max_size=12,
)


@given(st.dictionaries(_word_st, st.integers(1, 50), min_size=1, max_size=20),
       st.integers(0, 30))
@settings(max_examples=60, deadline=None)
def test_bpe_encode_concat_invariant(counts, n_merges):
    """Encoding never alters content: joined subtokens == word + EOW,
    for any trained merge table and any word (seen or unseen)."""
    from intelligent_document_processing_on_aws_spark.kernels.bpe import (
        EOW, encode_word, make_ranks, train_merges,
    )

    ranks = make_ranks(train_merges(counts, n_merges))
    for w in list(counts)[:10] + ["unseenword", "a"]:
        enc = encode_word(w, ranks)
        assert "".join(enc) == w + EOW
        assert all(s for s in enc)


@given(st.dictionaries(_word_st, st.integers(1, 50), min_size=1, max_size=15))
@settings(max_examples=30, deadline=None)
def test_bpe_more_merges_never_lengthen(counts):
    """Monotonicity: training more merges never increases any trained
    word's encoded length."""
    from intelligent_document_processing_on_aws_spark.kernels.bpe import (
        encode_word, make_ranks, train_merges,
    )

    r_small = make_ranks(train_merges(counts, 3))
    r_big = make_ranks(train_merges(counts, 12))
    for w in counts:
        assert len(encode_word(w, r_big)) <= len(encode_word(w, r_small))


_path_st = st.text(
    alphabet=st.sampled_from(list("ab/.%_*$x1")), min_size=0, max_size=14)


@given(pattern=_path_st, path=_path_st)
@settings(max_examples=150, deadline=None)
def test_robots_match_equals_like_translation(pattern, path):
    """Differential: the kernel's _matches agrees with its own
    pattern_to_like translation as evaluated by DuckDB's LIKE — the
    exact expression the Spark gate executes."""
    import duckdb

    from intelligent_document_processing_on_aws_spark.kernels.robots import (
        _matches, pattern_to_like,
    )

    # '$' is only an anchor at the end; embedded '$' is literal, and
    # '*' inside patterns is a wildcard — both directions covered by
    # the sampled alphabet.
    like = pattern_to_like(pattern)
    got = duckdb.sql(
        "SELECT ? LIKE ? ESCAPE '\\'", params=[path, like]
    ).fetchone()[0]
    assert got == _matches(pattern, path)
