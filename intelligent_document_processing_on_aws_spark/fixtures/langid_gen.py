"""Deterministic 5-language labeled corpus for the fastText-style
language classifier (operators/ft_classifier.py).

The testdata documents table's `lang` column is independent metadata
(every doc's text is drawn from the same English-ish vocabulary), so it
cannot be predicted from text — a supervised lang-ID fixture needs text
whose character distribution actually depends on the label. This
generator composes each document from a per-language function-word
vocabulary (the highest-frequency words of each language are public
knowledge; zh is seeded Han-codepoint text without spaces), with a
seed-addressed LCG word walk — byte-stable, no RNG state.

Layout: doc_id 0..n-1, lang = LANGS[doc_id % 5], so any doc_id prefix
is label-balanced (training samples take the first `sample_n` ids).
"""

from __future__ import annotations

LANGS = ("de", "en", "es", "fr", "zh")

_VOCAB = {
    "en": ("the and of to in is was for with that it on as at by this "
           "have from or had not are but they his her she him all were "
           "when there been one would will what about which time said "
           "people water long little very after words called just where "
           "most know").split(),
    "es": ("el la los las de que y en un una es por con no para su al "
           "como mas pero sus le ya o este si porque esta entre cuando "
           "muy sin sobre tambien me hasta hay donde quien desde todo "
           "nos durante todos uno les ni contra otros ese eso ante "
           "ellos").split(),
    "de": ("der die das und ist von zu mit den ein eine nicht auf als "
           "auch es sich an werden aus er hat dass sie nach wird bei "
           "einer um am sind noch wie einem ueber einen so zum war "
           "haben nur oder aber vor zur bis mehr durch man sein wurde "
           "sei").split(),
    "fr": ("le la les des de et un une est que pour dans qui sur pas "
           "avec au par ce plus ne se sont ou mais comme ses il aux "
           "bien elle deux meme nous leur tout peut ces son ont cette "
           "fait ils aussi dont sans autre apres avait votre etait "
           "tres").split(),
}


def langid_text(doc_id: int) -> str:
    """Closed-form document text for doc_id (lang = LANGS[doc_id % 5])."""
    lang = LANGS[doc_id % len(LANGS)]
    if lang == "zh":
        n_ch = 60 + (doc_id * 11) % 120
        chars = []
        for j in range(n_ch):
            cp = 0x4E00 + ((doc_id * 131 + j * 31337) % 2500)
            chars.append(chr(cp))
            if (doc_id + j) % 23 == 0:
                chars.append("。")  # ideographic full stop
        return "".join(chars)
    vocab = _VOCAB[lang]
    n_w = 30 + (doc_id * 7) % 90
    words = []
    for j in range(n_w):
        w = vocab[(doc_id * 1000003 + j * 7919) % len(vocab)]
        if (doc_id * 3 + j) % 17 == 0:
            w += "."
        words.append(w)
        if (doc_id + j) % 29 == 0:
            words.append(str((doc_id * 37 + j) % 1000))
    return " ".join(words)


def langid_rows(n: int) -> list[dict]:
    return [
        {"doc_id": i, "text": langid_text(i), "lang": LANGS[i % len(LANGS)]}
        for i in range(n)
    ]
