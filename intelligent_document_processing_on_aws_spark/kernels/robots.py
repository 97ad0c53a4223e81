"""robots.txt parsing and rule matching (RFC 9309).

The Robots Exclusion Protocol, standardized in RFC 9309 (2022) after 25
years of de-facto use.  A crawl-scale curation pipeline gates fetched
URLs against their host's robots rules both for politeness audits and
for retroactive takedown passes over an existing corpus.

Implemented subset (the normative core):
- groups: consecutive ``User-agent:`` lines share the following rules;
  a group applies to a product token case-insensitively, ``*`` is the
  catch-all;
- rules: ``Allow:`` / ``Disallow:`` with path patterns supporting the
  ``*`` wildcard and the ``$`` end anchor (RFC 9309 §2.2.3);
- precedence: the LONGEST matching pattern (octet length as written)
  wins; on a length tie, Allow wins (§2.2.2);
- an empty Disallow value disallows nothing; no matching group or no
  matching rule means the URL is allowed (§2.2.1);
- comments (``#``) and unknown directives are ignored; matching a
  specific agent group suppresses the ``*`` group (per the RFC: a
  crawler obeys the most specific matching group only).

Also parsed: the non-normative ``Crawl-delay`` extension (seconds,
float accepted; first valid value per group wins — the de-facto
behavior), feeding operators/cdx.politeness_schedule.

Not implemented (documented boundary): percent-encoding normalization
of rule/path octets; ``Sitemap`` lines are surfaced by callers, not
interpreted here (kernels/sitemap parses the documents they point at).

Pure stdlib, deterministic; shared by Spark executors, tests, and the
DuckDB-oracle builder (rules embed as literals — the parse of a
literal robots body is a compile-time constant).
"""

from __future__ import annotations


def parse_robots(text: str) -> list[dict]:
    """Parse a robots.txt body into groups.

    Returns [{"agents": [lowercased tokens], "rules": [(allow: bool,
    pattern: str), ...], "crawl_delay": float | None}, ...].  Rules
    keep file order; empty-valued Disallow lines are dropped (they
    forbid nothing); the first valid Crawl-delay per group wins.
    """
    groups: list[dict] = []
    current: dict | None = None
    expecting_rules = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if current is None or expecting_rules:
                current = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(current)
                expecting_rules = False
            current["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            if current is None:
                continue  # rules before any user-agent line: ignored
            expecting_rules = True
            if field == "disallow" and value == "":
                continue
            if field == "allow" and value == "":
                continue
            current["rules"].append((field == "allow", value))
        elif field == "crawl-delay":
            if current is not None:
                expecting_rules = True
                if current["crawl_delay"] is None:
                    try:
                        d = float(value)
                    except ValueError:
                        d = None
                    if d is not None and d >= 0:
                        current["crawl_delay"] = d
        else:
            # unknown directive: ends the user-agent run but stays in
            # the group (sitemap etc. are non-normative)
            if current is not None:
                expecting_rules = True
    return groups


def crawl_delay_for_agent(groups: list[dict], agent: str) -> float | None:
    """The Crawl-delay governing ``agent``: first non-None delay among
    groups naming the agent exactly; absent any, among ``*`` groups;
    absent both, None (caller applies its default)."""
    agent = (agent or "*").lower()
    exact = [g for g in groups if agent in g["agents"]]
    chosen = exact or [g for g in groups if "*" in g["agents"]]
    for g in chosen:
        if g.get("crawl_delay") is not None:
            return g["crawl_delay"]
    return None


def rules_for_agent(groups: list[dict], agent: str) -> list[tuple[bool, str]]:
    """The rule list governing ``agent``: the union of groups naming the
    agent token exactly (case-insensitive); absent any, the union of
    ``*`` groups; absent both, no rules (everything allowed)."""
    agent = (agent or "*").lower()
    exact = [g for g in groups if agent in g["agents"]]
    chosen = exact or [g for g in groups if "*" in g["agents"]]
    rules: list[tuple[bool, str]] = []
    for g in chosen:
        rules.extend(g["rules"])
    return rules


def pattern_to_like(pattern: str) -> str:
    """Translate a robots path pattern to a SQL LIKE pattern (the form
    both Catalyst and DuckDB evaluate natively, ESCAPE '\\'):

      literal ``%`` ``_`` ``\\``  ->  escaped
      ``*``                      ->  ``%``
      trailing ``$``             ->  (anchor: no trailing ``%``)
      otherwise                  ->  prefix match: append ``%``
    """
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        if ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        else:
            out.append(ch)
    like = "".join(out)
    if not anchored:
        like += "%"
    return like


_RX_CACHE: dict[str, "object"] = {}


def _matches(pattern: str, path: str) -> bool:
    """Pattern match (``*`` wildcard, ``$`` anchor) — semantically
    identical to the pattern_to_like translation evaluated by LIKE."""
    import re

    rx = _RX_CACHE.get(pattern)
    if rx is None:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        expr = "".join(
            ".*" if ch == "*" else re.escape(ch) for ch in body
        )
        rx = re.compile("^" + expr + ("$" if anchored else ""))
        _RX_CACHE[pattern] = rx
    return rx.match(path) is not None


def is_allowed(
    rules: list[tuple[bool, str]], path: str
) -> tuple[bool, int]:
    """RFC 9309 §2.2.2 evaluation: (allowed, winning pattern length).

    Longest matching pattern wins; tie -> Allow; no match -> allowed
    with length 0.
    """
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if _matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    if best_len < 0:
        return True, 0
    return best_allow, best_len
