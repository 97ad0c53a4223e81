"""Text-stat kernels + Spark operator agreement (spec parity)."""

from __future__ import annotations

import pytest

from intelligent_document_processing_on_aws_spark.kernels import textstats as K
from intelligent_document_processing_on_aws_spark.operators.textstats import document_stats


def test_kernel_basics():
    assert K.token_count("a b  c") == 3
    assert K.token_count("") == 0
    assert K.bpe_ish_token_count("hello, world 42") == 4  # hello , world 42
    assert K.detect_lang("the cat and the dog of the house") == "en"
    assert K.detect_lang("der hund und die katze ist nicht da") == "de"
    assert K.detect_lang("xyzzy qwerty") == "und"
    assert 0.0 <= K.quality_score("the quick brown fox is here") <= 1.0
    assert K.stopword_ratio("the the the") == 1.0


def test_bpe_ish_spec():
    # letter runs, digit runs, single punct
    assert K.bpe_ish_token_count("abc123!?x") == 5  # abc,123,!,?,x


def test_spark_matches_kernel(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "der hund und die katze ist nicht da heute"),
        (2, "le chat est dans la maison et le jardin une fois"),
        (3, "el gato es una criatura que vive en las casas"),
        (4, ""),
        (5, "no markers xyzzy qwerty foobar"),
        (6, "punct! heavy? text... with, lots; of: marks!!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in document_stats(df).collect()}
    for doc_id, text in rows:
        r = got[doc_id]
        assert r.n_tokens == K.token_count(text), (doc_id, "n_tokens")
        assert r.n_bpe_tokens == K.bpe_ish_token_count(text), (doc_id, "bpe")
        assert r.stopword_ratio == pytest.approx(K.stopword_ratio(text), abs=1e-9)
        assert r.punct_ratio == pytest.approx(K.punct_ratio(text), abs=1e-9)
        assert r.quality == pytest.approx(K.quality_score(text), abs=1e-6)
        assert r.lang_guess == K.detect_lang(text), (doc_id, "lang")


def test_paragraph_lang_mix_majority_and_ties(spark):
    """Per-paragraph langid: majority by count with (count desc, lang asc)
    tie-break; exact-integer majority share; unmarked lines count as
    'und'; blank-only docs emit no row."""
    from intelligent_document_processing_on_aws_spark.operators.textstats import (
        paragraph_lang_mix,
    )

    rows = [
        # 2 en + 1 fr -> majority en, 666666 ppm, 2 langs
        (1, "the cat and the dog\nthis is the end of it\nle chat et la vie"),
        # 1 en + 1 fr (tie) -> lang asc picks 'en'
        (2, "the cat and the dog\nle chat et la vie est une"),
        # no markers anywhere -> und majority
        (3, "zzz qqq\nxxx yyy"),
        # blank-only doc -> no output row
        (4, "   \n\t\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in paragraph_lang_mix(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].majority_lang == "en" and got[1].n_paras == 3
    assert got[1].majority_ppm == 666666 and got[1].n_langs == 2
    assert got[2].majority_lang == "en" and got[2].majority_ppm == 500000
    assert got[3].majority_lang == "und" and got[3].n_langs == 1
    assert got[3].majority_ppm == 1000000
