"""Domain-level corpus curation: host extraction, registrable-domain
grouping, per-domain aggregates, and blocklist / volume-cap gating.

Production web-corpus pipelines (CCNet, RefinedWeb §3.1, C4) filter at
URL/domain granularity before any per-document work: a blocklisted or
over-represented domain is dropped wholesale. These operators express
that stage Spark-first — host parsing is pure codegen'd regexp over the
scan, the per-domain rollup is ONE hash aggregate on the domain key, and
the gate itself is a broadcast join (blocklists are small) so the big
document table never shuffles.

No reference-repo analog (the reference ingests per-object S3 uploads);
the public-paper stage is implemented from its published description.

Regex portability: explicit ASCII classes only, identical byte-for-byte
in Java regex (Spark) and RE2 (DuckDB) so the oracles can re-derive
every step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hostname from a URL: text between '://' and the next '/', '?', '#' or
# end; credentials and port stripped in separate explicit steps below.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"

# frozen public-suffix-lite: second-level labels that combine with a
# country code to form the effective TLD (the full PSL is a fetched
# artifact; this deterministic subset covers the dominant cc-2LDs).
MULTI_SUFFIX_2LD = (
    "co", "com", "org", "net", "ac", "gov", "edu", "mil",
)


def url_host(col: Column) -> Column:
    """Lowercased hostname of a URL: scheme and path stripped, then
    userinfo ('user:pass@') and port (':8080') removed. Empty string
    when the value has no '<scheme>://' prefix."""
    h = F.regexp_extract(col, _HOST_RE, 1)
    h = F.regexp_replace(h, r"^[^@]*@", "")   # userinfo
    h = F.regexp_replace(h, r":[0-9]*$", "")  # port
    return F.lower(h)


def registrable_domain(col: Column) -> Column:
    """Registrable domain of a hostname (eTLD+1, public-suffix-lite):
    the last two dot-labels, or the last three when the second-to-last
    label is a known multi-suffix 2LD with a 2-letter country code after
    it ('example.co.uk' -> 'example.co.uk', not 'co.uk'). Hostnames with
    fewer labels (or raw IPv4s) pass through unchanged."""
    host = col
    last3 = F.regexp_extract(
        host, r"([^.]+\.(" + "|".join(MULTI_SUFFIX_2LD) + r")\.[a-z][a-z])$", 1
    )
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    is_ip = host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    return (
        F.when(is_ip, host)
        .when(last3 != "", last3)
        .when(last2 != "", last2)
        .otherwise(host)
    )


def domain_stats(
    pages: DataFrame, url_col: str = "url", chars_col: str = "n_chars"
) -> DataFrame:
    """Per-registrable-domain rollup: document count, total/mean chars.
    One codegen'd projection over the scan plus ONE hash aggregate on
    the (low-cardinality relative to docs) domain key — map-side partial
    aggregation makes the shuffle carry domains, not documents."""
    dom = registrable_domain(url_host(F.col(url_col)))
    return (
        pages.select(dom.alias("domain"), F.col(chars_col).alias("__c"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__c").alias("total_chars"),
            F.avg("__c").alias("mean_chars"),
        )
    )


def domain_filter(
    pages: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    max_docs_per_domain: int | None = None,
) -> DataFrame:
    """Keep pages whose registrable domain is NOT blocklisted, and (when
    `max_docs_per_domain` is set) drop ALL pages of domains whose volume
    exceeds the cap (spam farms / crawler traps dominate by volume —
    RefinedWeb drops them wholesale rather than sampling).

    Plan shape at 100 TB: the blocklist is broadcast (anti-join, no big
    shuffle); the volume cap reuses the domain_stats aggregate whose
    output is domains-only, so its join back is broadcastable too. The
    page table itself is never repartitioned.

    `blocklist` must have a single `domain` column of registrable
    domains."""
    dom = registrable_domain(url_host(F.col(url_col)))
    out = pages.withColumn("__domain", dom).join(
        F.broadcast(blocklist.select(F.col("domain").alias("__domain"))),
        on="__domain",
        how="left_anti",
    )
    if max_docs_per_domain is not None:
        heavy = (
            pages.select(dom.alias("__domain"))
            .groupBy("__domain")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_docs_per_domain)
            .select("__domain")
        )
        out = out.join(F.broadcast(heavy), on="__domain", how="left_anti")
    return out.drop("__domain")


# ---------------------------------------------------------------------------
# Host-scoped template lines (RefinedWeb-style per-host boilerplate)
# ---------------------------------------------------------------------------

def _doc_lines(docs: DataFrame, text_col: str) -> Column:
    """'\\n'-split, trimmed of ' \\t\\r', blanks dropped — the shared
    line convention (webfilters._lines / dedup.line_dedup)."""
    return F.filter(
        F.transform(F.split(F.col(text_col), "\n"),
                    lambda x: F.trim(x, F.lit(" \t\r"))),
        lambda x: x != "",
    )


def host_template_lines(
    docs: DataFrame,
    min_docs: int = 3,
    min_share_ppm: int = 500_000,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Per-host template (boilerplate) lines: a line is a template of
    host H iff it appears in >= min_docs DISTINCT documents of H and in
    >= min_share_ppm (integer ppm) of H's documents. Nav bars, cookie
    banners and footers repeat across one site's pages but not across
    the web — host scoping catches them at far lower df than a global
    passage threshold would need (RefinedWeb §3.2 line-wise filtering
    scoped per source; public paper, no reference-repo analog).

    Output: (host, line, df, host_docs, share_ppm).

    100-TB shape: distinct-within-doc explode is map-side; the df count
    is ONE hash aggregate on (host, line) with partial combine; host
    sizes are a second tiny aggregate broadcast back (hosts number in
    the millions, lines in the trillions — the join side that moves is
    the already-thresholded template candidates, never the corpus)."""
    lines = docs.select(
        F.col("doc_id"),
        F.col(host_col).alias("host"),
        F.explode(F.array_distinct(_doc_lines(docs, text_col)))
        .alias("line"),
    )
    df = lines.groupBy("host", "line").agg(
        F.count("*").cast("long").alias("df"))
    sizes = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct("doc_id").cast("long").alias("host_docs"))
    return (
        df.where(F.col("df") >= min_docs)
        .join(F.broadcast(sizes), "host")
        .withColumn(
            # exact integer floor-div (Spark SQL `div`) — no float in the
            # threshold compare; mirrors `//` in the DuckDB oracle
            "share_ppm",
            F.expr("(1000000 * df) div host_docs").cast("bigint"),
        )
        .where(F.col("share_ppm") >= min_share_ppm)
        .select("host", "line", "df", "host_docs", "share_ppm")
    )


def strip_host_templates(
    docs: DataFrame,
    templates: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite every document with its host's template lines removed
    (order preserved; within-doc repeats of a template line all go).
    Output: (doc_id, host, text_stripped, n_lines, n_removed).

    Shape: posexplode -> one left-anti-style join against the (host,
    line) template table -> rebuild on doc_id. The template table is
    the small side by construction (already df/share-thresholded)."""
    base = docs.select(
        "doc_id", F.col(host_col).alias("host"),
        _doc_lines(docs, text_col).alias("__lines"),
    )
    lines = base.select(
        "doc_id", "host",
        F.posexplode("__lines").alias("pos", "line"),
    )
    kept = (
        lines.join(
            F.broadcast(templates.select("host", "line")
                        .withColumn("__tpl", F.lit(True))),
            ["host", "line"], "left",
        )
        .where(F.col("__tpl").isNull())
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("text_stripped"),
            F.count("*").cast("long").alias("n_kept"),
        )
    )
    return (
        base.select("doc_id", "host",
                    F.size("__lines").cast("long").alias("n_lines"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id", "host",
            F.coalesce("text_stripped", F.lit("")).alias("text_stripped"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )
