"""Sentence-segmentation + chunking fixtures with independent goldens.

Each record is composed *from* a known list of sentences (the facts);
the golden is that list, never the output of running kernels/sentences
back over the document. Families embed one hazard class each, INSIDE
sentences, so the splitter must not fire there:

- ``abbrev``    — Dr. / Mr. / e.g. / Jan. / U.S. / Fig. mid-sentence
- ``initials``  — single-letter initials (J. K. Rowling)
- ``numbers``   — decimals (3.14), versions (10.1.2), digit-initial
                  sentences
- ``quotes``    — terminators inside closing quotes (``."``, ``?"``),
                  quote-initial sentences
- ``exclaim``   — ! ? … ?! terminator runs
- ``etc_bound`` — "etc." both terminal (splits before uppercase) and
                  mid-sentence (no split before lowercase)
- ``paragraphs``— \\n\\n always splits (bare heading, trailing
                  abbreviation rescued by the break); a single interior
                  \\n is plain whitespace
- ``plain``     — tidy declaratives

The chunking golden re-encodes the greedy packing spec inline
(sentence-granular fill of CHUNK_TOKENS whitespace-tokens; an
oversized sentence becomes its own chunk) over the fact sentences.

Determinism: record i derives entirely from
``random.Random(f"sentences-{i}-42")``.
"""

from __future__ import annotations

import random

WORDS = ("market window vector ledger column signal report revenue "
         "system orchard channel network archive summary").split()
NAMES = ("Smith", "Jones", "Rivera", "Chen", "Okafor", "Larsen")

FAMILIES = ("plain", "abbrev", "initials", "numbers", "quotes",
            "exclaim", "etc_bound", "paragraphs")

CHUNK_TOKENS = 24


def _w(rng: random.Random) -> str:
    return rng.choice(WORDS)


def _sent_plain(rng: random.Random) -> str:
    return (f"The {_w(rng)} {rng.choice(('held', 'moved', 'shaped'))} "
            f"the {_w(rng)} through the {_w(rng)}.")


def _sents_abbrev(rng: random.Random) -> list[str]:
    n = rng.choice(NAMES)
    pool = (
        f"Dr. {n} reviewed the {_w(rng)} report before noon.",
        f"We met Mr. {n} near the {_w(rng)} office.",
        f"Prices rose, e.g. {_w(rng)} and {_w(rng)}, during Jan. 2021.",
        f"The U.S. Senate debated the {_w(rng)} bill at length.",
        f"See Fig. 3 and Eq. 2 for the {_w(rng)} case.",
        f"It costs approx. 40 dollars per {_w(rng)}.",
        f"Prof. {n} cited pp. 10 of the {_w(rng)} volume.",
    )
    return list(rng.sample(pool, 3 + rng.randrange(3)))


def _sents_initials(rng: random.Random) -> list[str]:
    pool = (
        f"J. K. Rowling wrote about the {_w(rng)} at dawn.",
        f"T. S. Eliot admired the {_w(rng)} quietly.",
        f"A book by N. Q. {rng.choice(NAMES)} covers the {_w(rng)}.",
        f"W. B. Yeats never saw this {_w(rng)}.",
    )
    return list(rng.sample(pool, 2 + rng.randrange(3)))


def _sents_numbers(rng: random.Random) -> list[str]:
    pool = (
        f"The ratio is 3.14 for the {_w(rng)} series.",
        f"Inflation hit 2.5 percent in the {_w(rng)} sector.",
        f"42 units shipped to the {_w(rng)} depot overnight.",
        f"Version 10.1.2 fixed the {_w(rng)} bug.",
        f"Margins fell 0.75 points across the {_w(rng)}.",
    )
    return list(rng.sample(pool, 3 + rng.randrange(3)))


def _sents_quotes(rng: random.Random) -> list[str]:
    n = rng.choice(NAMES)
    pool = (
        f'He said "stop the {_w(rng)}."',
        f'She shouted "run past the {_w(rng)}!"',
        f'"Begin the {_w(rng)} now," {n} said.',
        f'They asked, "Why move the {_w(rng)}?"',
        f'The sign read "no {_w(rng)} here" in faded paint.',
    )
    return list(rng.sample(pool, 3 + rng.randrange(3)))


def _sents_exclaim(rng: random.Random) -> list[str]:
    pool = (
        f"What a {_w(rng)}!",
        f"Is this the {_w(rng)}?",
        f"Stop the {_w(rng)} now!",
        "It simply vanished…",
        "Really?!",
        f"Could the {_w(rng)} hold?",
    )
    return list(rng.sample(pool, 3 + rng.randrange(3)))


def _sents_etc(rng: random.Random) -> list[str]:
    # terminal etc.: splits before an uppercase opener; mid-sentence
    # etc. before lowercase stays fused.
    return [
        f"We packed pens, paper, etc.",
        f"Then the {_w(rng)} arrived.",
        f"We sorted files, notes, etc. and left the {_w(rng)}.",
    ]


def gen_record(i: int) -> dict:
    rng = random.Random(f"sentences-{i}-42")
    family = FAMILIES[i % len(FAMILIES)]

    if family == "plain":
        sents = [_sent_plain(rng) for _ in range(3 + rng.randrange(4))]
        text = " ".join(sents)
    elif family == "abbrev":
        sents = _sents_abbrev(rng)
        text = " ".join(sents)
    elif family == "initials":
        sents = _sents_initials(rng)
        text = " ".join(sents)
    elif family == "numbers":
        sents = _sents_numbers(rng)
        text = " ".join(sents)
    elif family == "quotes":
        sents = _sents_quotes(rng)
        text = " ".join(sents)
    elif family == "exclaim":
        sents = _sents_exclaim(rng)
        text = " ".join(sents)
    elif family == "etc_bound":
        s = _sents_etc(rng)
        # s[0]+s[1] joined by a space: "etc." + "Then" splits; s[2] is
        # one sentence despite its interior "etc. and".
        sents = s
        text = f"{s[0]} {s[1]} {s[2]}"
    elif family == "paragraphs":
        heading = f"Chapter {1 + rng.randrange(9)}"          # no terminator
        trailing_abbrev = f"We visited Acme Corp."           # rescued by \n\n
        body = [_sent_plain(rng) for _ in range(2 + rng.randrange(2))]
        closing = _sent_plain(rng)
        # one interior single newline inside the first body sentence:
        # plain whitespace, the fact stays normalized.
        body_doc = list(body)
        body_doc[0] = body_doc[0].replace(" the ", " the\n", 1)
        text = (f"{heading}\n\n{' '.join(body_doc)} {trailing_abbrev}"
                f"\n \n{closing}")
        sents = [heading, *body, trailing_abbrev, closing]
    else:  # pragma: no cover
        raise AssertionError(family)

    return {"doc_id": i, "family": family, "text": text, "sentences": sents}


def pack_facts(sentences: list[str], max_tokens: int = CHUNK_TOKENS) -> list[dict]:
    """Greedy sentence-granular packing — the spec, re-encoded for the
    golden (independent of kernels/sentences.pack_chunks)."""
    chunks: list[dict] = []
    cur: list[str] = []
    tok = 0
    for s in sentences:
        t = len(s.split())
        if cur and tok + t > max_tokens:
            chunks.append({"chunk_id": len(chunks), "n_sentences": len(cur),
                           "n_tokens": tok, "text": " ".join(cur)})
            cur, tok = [], 0
        cur.append(s)
        tok += t
    if cur:
        chunks.append({"chunk_id": len(chunks), "n_sentences": len(cur),
                       "n_tokens": tok, "text": " ".join(cur)})
    return chunks


def gen_sentence_docs(n: int) -> list[dict]:
    return [gen_record(i) for i in range(n)]
