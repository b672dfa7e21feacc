"""robots.txt crawl-policy gate — RFC 9309 (REP) longest-match semantics
over a (host, robots_txt) table joined against a URL table.

A crawl pipeline at Common-Crawl scale must answer "may I keep this url?"
for every fetched page (politeness audits, takedown sweeps, corpus
licensing filters re-run the question long after the crawl). The decision
is per (host, path) against that host's robots.txt:

- groups are selected by User-agent token: an exact (case-insensitive)
  agent group beats the ``*`` group; multiple consecutive UA lines share
  one group (RFC 9309 §2.1);
- within the selected group the rule with the LONGEST pattern wins;
  ``Allow`` wins exact ties (§2.2.2);
- ``*`` matches any char run, a trailing ``$`` anchors at end; no
  matching rule (or no robots.txt for the host) means allowed.

Spark shape: rule parsing is a vectorized pandas UDF over the robots
table — the SMALL side (one row per host, ~millions of hosts vs 10^12
urls), exploded to one row per rule. The url side joins it on the host
equi-key (rules side broadcast by default — a few rules x millions of
hosts is broadcast-sized after the group selection; opt out for the
full-web case), pattern-matches with JVM ``regexp_like`` (the rule regex
is a column — Spark compiles per row on the RULES side cardinality, not
per url-rule pair, thanks to the join pruning matches first), and picks
the winner with the ``min(struct(...))`` argmax — one combinable groupBy,
no window over the url table.

Rule patterns are translated to a regex subset valid in BOTH Java and
RE2 (literals escaped char-class-free, ``*`` -> ``.*``, ``$`` anchor), so
the DuckDB oracle can replay the match/longest/tie logic on the staged
rules independently.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BooleanType, IntegerType,
                               StringType, StructField, StructType)

RULE_TYPE = ArrayType(StructType([
    StructField("pattern", StringType(), False),
    StructField("allow", BooleanType(), False),
    StructField("pattern_len", IntegerType(), False),
    StructField("rule_re", StringType(), False),
    StructField("is_literal", BooleanType(), False),
]))

# characters escaped literally in rule patterns (everything regex-special
# except '*' and the trailing '$', which carry REP meaning)
_SPECIALS = re.compile(r"[.^+?()\[\]{}\\|$]")


def rule_to_regex(pattern: str) -> str:
    """REP path pattern -> anchored regex valid in Java AND RE2."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for piece in body.split("*"):
        out.append(_SPECIALS.sub(lambda m: "\\" + m.group(0), piece))
    return "^" + ".*".join(out) + ("$" if anchored else "")


def parse_robots_rules(txt: str | None, agent: str) -> list[tuple]:
    """(pattern, allow, pattern_len, rule_re) rows for the group that
    governs ``agent`` (exact case-insensitive token beats ``*``). Tolerant:
    unknown directives and malformed lines are ignored; None/empty text
    yields no rules (allowed-by-default)."""
    if not txt:
        return []
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agent_run = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_run:                       # new group starts
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(val.lower())
            continue
        in_agent_run = False
        if key in ("allow", "disallow"):
            if val == "":                              # empty = no rule
                continue
            cur_rules.append((val, key == "allow"))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    exact = [r for agents, r in groups if agent in agents]
    star = [r for agents, r in groups if "*" in agents]
    chosen = exact if exact else star
    rules = [rule for grp in chosen for rule in grp]
    return [(p, a, len(p), rule_to_regex(p),
             "*" not in p and not p.endswith("$")) for p, a in rules]


def robots_rules_df(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, pattern, allow, pattern_len, rule_re) — one row per rule of
    the group governing ``agent``. Vectorized pandas UDF + posexplode over
    the per-host robots table (the small side)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(RULE_TYPE)
    def parse(col):
        return col.map(lambda t: parse_robots_rules(t, agent))

    return (
        robots.select(F.col(host_col).alias("host"),
                      F.explode(parse(F.col(txt_col))).alias("r"))
        .select("host", "r.pattern", "r.allow", "r.pattern_len",
                "r.rule_re", "r.is_literal")
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    broadcast_rules: bool = True,
) -> DataFrame:
    """urls + ``allowed`` boolean under RFC 9309 precedence.

    ``rules`` is the ``robots_rules_df`` output. Hosts absent from it and
    urls matching no rule are allowed. One equi-join on host (rules side
    broadcast by default; pass ``broadcast_rules=False`` at full-web host
    cardinality) + one combinable groupBy argmax — no window, no UDF on
    the url side."""
    r = rules.select(
        F.col("host").alias("_rh"), "pattern", "allow",
        "pattern_len", "rule_re", "is_literal")
    if broadcast_rules:
        r = F.broadcast(r)
    key = urls.select(F.col(host_col).alias("_h"),
                      F.col(path_col).alias("_p")).distinct()
    # literal prefixes (the dominant rule class) match with codegen
    # startswith; only '*'/'$'-bearing patterns pay the per-row regex
    # compile of a non-foldable regexp_like
    hit = F.when(F.col("is_literal"),
                 F.col("_p").startswith(F.col("pattern"))) \
           .otherwise(F.regexp_like(F.col("_p"), F.col("rule_re")))
    matched = key.join(r, key["_h"] == r["_rh"], "inner").where(hit)
    # longest pattern wins; Allow wins ties (allow sorts before disallow)
    verdict = (
        matched.groupBy("_h", "_p")
        .agg(F.min(F.struct(
            (-F.col("pattern_len")).alias("neg_len"),
            F.when(F.col("allow"), F.lit(0)).otherwise(F.lit(1))
             .alias("deny_rank"),
            F.col("allow").alias("allow"))).alias("w"))
        .select("_h", "_p", F.col("w.allow").alias("_allowed"))
    )
    out = urls.join(
        verdict,
        (F.col(host_col) == F.col("_h")) & (F.col(path_col) == F.col("_p")),
        "left")
    return out.select(
        *urls.columns,
        F.coalesce(F.col("_allowed"), F.lit(True)).alias("allowed"))


def robots_sitemaps(txt: str | None) -> list[str]:
    """``Sitemap:`` directive values (absolute URLs per RFC 9309 §2.3) —
    group-independent, so collected over the whole file."""
    if not txt:
        return []
    out = []
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def sitemap_locs(xml) -> "F.Column":
    """``<loc>`` values from a sitemap / sitemap-index document, in order —
    pure column algebra (``regexp_extract_all``); entity-decodes the
    ampersand (the one escape required in sitemap URLs)."""
    xml = F.col(xml) if isinstance(xml, str) else xml
    locs = F.regexp_extract_all(
        xml, F.lit(r"(?is)<loc>\s*(.*?)\s*</loc>"), 1)
    return F.transform(locs, lambda u: F.replace(
        u, F.lit("&amp;"), F.lit("&")))
