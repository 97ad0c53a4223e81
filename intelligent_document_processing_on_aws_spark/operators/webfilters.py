"""Web-corpus cleanup operators: C4 line filters, PII redaction, URL
canonicalization + dedup.

The remaining standard stages of a Common-Crawl-style training-data
pipeline (C4, Raffel et al. 2020 §2.2 — public paper; no reference-repo
analog). All native Catalyst — higher-order array expressions and
regexp_replace — so they whole-stage-codegen over the scan and the
DuckDB oracles re-derive them exactly.

Regex portability note: patterns use explicit ASCII character classes
only (no \\w, no \\d shorthand subtleties) so Java regex (Spark) and
RE2 (DuckDB) agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# -- C4 line filters ----------------------------------------------------------

# C4 keeps lines that end in terminal punctuation and have >= 5 words,
# and drops whole documents containing code braces or boilerplate
# placeholder text (Raffel et al. 2020 §2.2).
C4_MIN_WORDS_PER_LINE = 5
C4_TERMINAL = ('.', '!', '?', '"', "'")
C4_DOC_DROP_SUBSTRINGS = ("lorem ipsum", "{")


def _lines(col: Column) -> Column:
    trimmed = F.transform(
        F.split(col, "\n"), lambda x: F.trim(x, F.lit(" \t\r"))
    )
    return F.filter(trimmed, lambda x: x != "")


def c4_keep_line(line: Column) -> Column:
    """One line passes C4: terminal punctuation AND >= 5 words."""
    ends = None
    for t in C4_TERMINAL:
        e = line.endswith(t)
        ends = e if ends is None else (ends | e)
    n_words = F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))
    return ends & (n_words >= C4_MIN_WORDS_PER_LINE)


def c4_clean(docs: DataFrame, text_col: str = "text",
             min_lines: int = 1) -> DataFrame:
    """(doc_id, clean_text, n_kept_lines, dropped_doc) — the C4 document
    cleanup: filter lines, then drop documents that carry code braces /
    placeholder text or end up with fewer than min_lines survivors.
    Map-only: one codegen'd projection over the scan."""
    t = F.col(text_col)
    kept = F.filter(_lines(t), c4_keep_line)
    lowered = F.lower(t)
    doc_drop = None
    for s in C4_DOC_DROP_SUBSTRINGS:
        d = lowered.contains(s)
        doc_drop = d if doc_drop is None else (doc_drop | d)
    n_kept = F.size(kept)
    return docs.select(
        "doc_id",
        F.when(doc_drop | (n_kept < min_lines), F.lit(None))
         .otherwise(F.array_join(kept, "\n")).alias("clean_text"),
        n_kept.alias("n_kept_lines"),
        (doc_drop | (n_kept < min_lines)).alias("dropped_doc"),
    )


# -- PII redaction ------------------------------------------------------------

# explicit ASCII classes; identical semantics under Java regex and RE2
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
_IPV4_CORE = (r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
              r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}")
# Digit/dot boundaries WITHOUT lookarounds (RE2 has none): one consumed
# boundary char (or string edge) on each side, preserved via $1/$5 in the
# replacement. Rejects partial matches inside longer runs ("1.2.3.4567")
# and five-octet chains ("1.2.3.4.5").
IPV4_RE = r"(^|[^0-9.])" + _IPV4_CORE + r"([^0-9.]|$)"
_IPV4_REPL = "$1<IP>$5"          # Java replacement syntax (Spark)
IPV4_REPL_RE2 = r"\1<IP>\5"      # RE2 replacement syntax (DuckDB oracle)


def redact_pii(col: Column) -> Column:
    """Emails -> <EMAIL>, IPv4 addresses -> <IP> (training-corpus PII
    scrub; the standard regex-redaction pass).

    The IP replace runs TWICE: the consumed-boundary pattern cannot match
    two IPs separated by a single char in one pass (the first match eats
    the shared separator). One pass leaves no two unmatched IPs adjacent,
    so a second pass always finishes the chain."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, _IPV4_REPL)
    return F.regexp_replace(out, IPV4_RE, _IPV4_REPL)


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted, n_emails, n_ips) — redaction plus per-doc PII
    counts (the audit signal a scrub stage reports)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        redact_pii(t).alias("redacted"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
            .alias("n_emails"),
        # count via the redacted-email text so an IP-like octet run inside
        # an email never double-counts
        F.size(F.regexp_extract_all(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), F.lit(IPV4_RE), F.lit(0)
        )).alias("n_ips"),
    )


# -- URL canonicalization + dedup --------------------------------------------

# Param names anchored to a CONSUMED [?&] separator (no lookbehind — RE2
# has none) so suffix collisions ("?href=", "?pref=") survive. A run of
# consecutive tracking params is eaten in one match (the separator between
# run members is consumed, so per-match boundary anchoring still works);
# the trailing '&', if any, is consumed and the leading separator restored
# via $1 / \1.
_TRACK_NAMES = r"utm_[a-z]+|gclid|fbclid|ref|mc_cid|mc_eid"
_TRACKING_PARAM = (
    rf"([?&])({_TRACK_NAMES})=[^&#]*(&({_TRACK_NAMES})=[^&#]*)*&?"
)
_TRACKING_REPL = "$1"            # Java replacement syntax (Spark)
TRACKING_REPL_RE2 = r"\1"        # RE2 replacement syntax (DuckDB oracle)


def canonical_url(col: Column) -> Column:
    """Normalize a URL for dedup grouping: lowercase scheme+host, strip
    the fragment, strip tracking params (utm_*/gclid/fbclid/ref/...),
    collapse a dangling '?'/'&', strip one trailing '/'.

    Pure sequential regexp_replace steps so the DuckDB oracle applies the
    IDENTICAL pipeline."""
    u = F.regexp_replace(col, r"#.*$", "")                  # fragment
    u = F.regexp_replace(u, _TRACKING_PARAM, _TRACKING_REPL)  # tracking params
    u = F.regexp_replace(u, r"[?&]$", "")                    # dangling sep
    u = F.regexp_replace(u, r"/$", "")                       # trailing slash
    # lowercase scheme://host only (path/query stay case-sensitive)
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+://[^/]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z]+://[^/]*", "")
    return F.when(head == "", u).otherwise(F.concat(head, tail))


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canonical_url, is_duplicate) — canonical-URL grouping with
    min-url canonical representative (C4 dedups exact URLs; web pipelines
    canonicalize first). One shuffle on the canonical key."""
    c = canonical_url(F.col(url_col)).alias("canonical_url")
    w = Window.partitionBy("canonical_url")
    return pages.select(F.col(url_col).alias("url"), c).select(
        "url", "canonical_url",
        (F.col("url") != F.min("url").over(w)).alias("is_duplicate"),
    )


# -- C4 blocklist-word document filter ---------------------------------------

# C4 (Raffel et al. 2020 §2.2) drops any page containing a word from a
# public blocklist. The list is deployment-supplied; this frozen default
# covers unambiguous spam/adult markers for tests and the oracle.
DEFAULT_BADWORDS = (
    "viagra", "cialis", "porn", "xxx", "casino", "jackpot",
    "escort", "nude",
)

# word-edge punctuation stripped before membership ('casino!' hits)
_BW_EDGE_PUNCT = ".,;:!?\"'()[]"


def badword_hits(col: Column, words: tuple[str, ...] = DEFAULT_BADWORDS
                 ) -> Column:
    """How many DISTINCT blocklist words appear as whole (lowercased,
    edge-punct-stripped) words. Pure higher-order array expression —
    codegen over the scan, shared byte-for-byte with the SQL oracle.
    NULL text counts as zero hits (a doc with no text has no badwords —
    without the coalesce, NULL hits would silently fail the ==0 gate)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    bare = F.transform(toks, lambda x: F.trim(x, F.lit(_BW_EDGE_PUNCT)))
    hits = F.lit(0)
    for w in words:
        hits = hits + F.array_contains(bare, w).cast("int")
    return hits


def badword_filter(docs: DataFrame, text_col: str = "text",
                   words: tuple[str, ...] = DEFAULT_BADWORDS) -> DataFrame:
    """Drop documents containing ANY blocklist word (C4's page-level
    rule). Map-only: a codegen'd filter over the scan, no shuffle."""
    return docs.where(badword_hits(F.col(text_col), words) == 0)


# -- mojibake repair (CP1252 double-encoding) ---------------------------------

# UTF-8 text mis-decoded as Windows-1252 is the dominant web encoding
# defect ("donâ€™t" for "don’t" — what ftfy calls mojibake; public
# phenomenon, table derived below from the codecs themselves, no lookup
# data shipped). The repair is a fixed chain of LITERAL replaces —
# codegen'd end-to-end in Spark and byte-identical in the DuckDB oracle.

# frozen repair targets: curly quotes/dashes/ellipsis, currency/legal
# marks, and the Latin-1 letter block most common in web text
_MOJI_TARGETS = (
    "’‘“‚„–—…•€™©®°±"
    "éèêëàâçüöäñíóúá£¢¿¡ß"
)


def _cp1252_mojibake(ch: str) -> str | None:
    try:
        return ch.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return None  # UTF-8 byte undefined in cp1252 (0x81/8D/8F/90/9D)


# (mojibake_sequence, repaired_char), longest sequences first so a
# 3-byte repair never leaves a dangling 2-byte prefix for a later step;
# single pass by design (double-encoded text needs a second application)
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = tuple(
    sorted(
        ((m, ch) for ch in _MOJI_TARGETS
         if (m := _cp1252_mojibake(ch)) is not None),
        key=lambda p: (-len(p[0]), p[0]),
    )
)


def fix_mojibake(col: Column) -> Column:
    """Repair CP1252 mojibake with the frozen literal-replace chain.
    Pure codegen — no regex, no Python."""
    out = col
    for moji, ch in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(moji), F.lit(ch))
    return out


def mojibake_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fixed_text, was_mojibake) — repair + detection in one
    map-only codegen'd projection."""
    t = F.col(text_col)
    fixed = fix_mojibake(t)
    return docs.select(
        "doc_id",
        fixed.alias("fixed_text"),
        (~fixed.eqNullSafe(t)).alias("was_mojibake"),
    )


# -- Unicode script profile ---------------------------------------------------

# explicit codepoint ranges in \x{...} syntax — the ONE escape form Java
# regex (Spark) and RE2 (DuckDB) both accept byte-for-byte (\uXXXX is
# Java-only; \p{Latin} spells differently across engines, ranges do
# not). Latin covers ASCII letters + Latin-1/Extended-A/B.
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "A-Za-z\\x{00C0}-\\x{024F}"),
    ("cyrillic", "\\x{0400}-\\x{04FF}"),
    ("greek", "\\x{0370}-\\x{03FF}"),
    ("arabic", "\\x{0600}-\\x{06FF}"),
    ("devanagari", "\\x{0900}-\\x{097F}"),
    ("cjk", "\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}"
            "\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}"),
)


def script_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode script mix: for each of the six major script
    blocks, the fraction of the document's LETTER characters (characters
    belonging to any profiled block) in that block, plus the dominant
    script. The standard precursor to language routing in multilingual
    web pipelines (CCNet splits the crawl by script before lang-ID).

    Pure codegen: one regexp_replace-based count per block over the
    scan — zero Python, zero shuffles. Fractions quantize trunc6 with
    multiply-before-divide; dominant ties break on block order."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        name: F.length(t)
        - F.length(F.regexp_replace(t, f"[{rng}]", ""))
        for name, rng in SCRIPT_RANGES
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    cols = [F.col("doc_id")]
    for name in counts:
        cols.append(
            F.when(total == 0, F.lit(0.0))
            .otherwise(F.floor(counts[name] * F.lit(1e6) / total) / 1e6)
            .alias(f"{name}_frac")
        )
    # dominant = first block with the maximal count (block order ties)
    dom = F.lit("none")
    best = F.lit(-1).cast("long")
    for name in counts:
        is_better = counts[name] > best
        dom = F.when(is_better, F.lit(name)).otherwise(dom)
        best = F.when(is_better, counts[name]).otherwise(best)
    cols.append(
        F.when(total == 0, F.lit("none")).otherwise(dom)
        .alias("dominant_script")
    )
    return docs.select(*cols)


# ---------------------------------------------------------------------------
# URL structural features (DCLM/RefinedWeb-style URL-level filtering inputs)
# ---------------------------------------------------------------------------

# ASCII-only regexes shared verbatim with the DuckDB oracle (Java == RE2).
_URL_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_URL_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_URL_QUERY_RE = r"\?([^#]*)"
_URL_TLD_RE = r"\.([a-zA-Z0-9-]+)$"


def url_features(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Structural URL features — the query-independent inputs URL-level
    quality classifiers (DCLM, RefinedWeb's URL filtering stage) consume
    before ever reading the page body: (url, host, tld, path_depth,
    path_len, n_params, host_has_digit, host_n_dots).

    Long paths, deep hierarchies, and parameter-heavy query strings
    correlate with templated/faceted junk; digit-bearing hosts correlate
    with spam constellations. All-native codegen'd regexp/length columns
    — a map-only projection with zero shuffles that scales exactly like
    the scan, so it can gate a 100-TB corpus BEFORE the expensive text
    stages."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    host = F.lower(F.regexp_extract(u, _URL_HOST_RE, 1))
    # strip :port and user@ — features describe the registrable host
    host = F.regexp_replace(F.regexp_replace(host, r"^[^@]*@", ""),
                            r":[0-9]+$", "")
    path = F.regexp_extract(u, _URL_PATH_RE, 1)
    query = F.regexp_extract(u, _URL_QUERY_RE, 1)
    seg = F.filter(F.split(path, "/"), lambda s: s != "")
    return pages.select(
        u.alias("url"),
        host.alias("host"),
        F.regexp_extract(host, _URL_TLD_RE, 1).alias("tld"),
        F.size(seg).cast("long").alias("path_depth"),
        F.length(path).cast("long").alias("path_len"),
        F.when(query == "", F.lit(0).cast("long"))
        .otherwise(F.size(F.split(query, "&")).cast("long"))
        .alias("n_params"),
        host.rlike("[0-9]").alias("host_has_digit"),
        (F.length(host) - F.length(F.replace(host, F.lit("."), F.lit(""))))
        .cast("long").alias("host_n_dots"),
    )
