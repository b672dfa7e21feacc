"""URL canonicalization and registered-domain extraction — pure column
algebra (zero UDFs) over Spark's built-in ``try_parse_url``.

A Common-Crawl-scale pipeline needs URL identity before anything else:
the same page arrives as ``HTTP://Site.com:80/a//b/?utm_source=x&b=2&a=1``
and ``http://site.com/a/b?a=1&b=2`` across crawls, and host-level policies
(robots budgets, per-site mixing weights, skew salting) key on the
*registered domain*, not the raw hostname. The reference keys its document
collections on raw URL strings (ArangoDB `_key` from the url); at 10^12
rows a canonical form is what makes "same page" an equi-join.

Everything here compiles to JVM expressions (``try_parse_url``, regexes,
array ops), so it rides whole-stage codegen, pushes through shuffles as a
plain column, and costs no Python round-trip. The DuckDB twin for every
rule lives in the ``web_url_host_stats`` oracle (regexp_extract +
list_filter + list_sort re-derivation).

Normalization rules (documented contract, applied in this order):

1. scheme lowercased; rows that don't parse (``try_parse_url`` NULL)
   normalize to NULL — callers filter or route them to a dirt bucket.
2. userinfo (``user:pass@``) stripped; authority lowercased (hostnames
   are case-insensitive per RFC 3986 §3.2.2).
3. default ports stripped (``:80`` for http, ``:443`` for https).
4. path: runs of ``/`` collapsed, trailing ``/`` stripped (root stays
   ``/``), empty path becomes ``/``. Percent-decoding is deliberately NOT
   applied (decoding can change identity; crawl dedup wants the
   conservative direction).
5. query: tracking params dropped (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``ref``), remaining ``k=v`` pairs sorted bytewise, empty
   query dropped entirely.
6. fragment dropped.

``registered_domain`` uses a bundled *subset* of the public-suffix list
(the ~30 highest-traffic two-level suffixes). The real PSL is ~9k rules
and versioned; at deployment the table below is the seam to swap it in —
the column algebra (label slicing against a literal set) is unchanged.
The subset is honest for tests and documented as such.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tracking-parameter kill list: a param is dropped when its key matches.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$)"

# Two-level public suffixes (mini-PSL; see module docstring). Kept sorted
# so the literal array in the plan is deterministic.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = tuple(sorted([
    "ac.jp", "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk",
    "co.za", "com.ar", "com.au", "com.br", "com.cn", "com.mx",
    "com.sg", "com.tr", "com.tw", "edu.au", "gov.uk", "ne.jp",
    "net.au", "or.jp", "org.au", "org.uk",
]))


def _part(url: Column, part: str) -> Column:
    return F.try_parse_url(url, F.lit(part))


def url_scheme(url: Column | str) -> Column:
    """Lowercased scheme, NULL for unparseable urls."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(_part(url, "PROTOCOL"))


def url_host(url: Column | str) -> Column:
    """Lowercased hostname (no userinfo, no port), NULL if unparseable."""
    url = F.col(url) if isinstance(url, str) else url
    auth = F.lower(_part(url, "AUTHORITY"))
    # userinfo ends at the LAST '@' in the authority (RFC 3986 §3.2):
    # greedy match, or 'u@p@h' style dirt leaves a fake userinfo behind
    auth = F.regexp_replace(auth, r"^.*@", "")
    return F.regexp_replace(auth, r":\d+$", "")        # strip any port


def url_normalize(url: Column | str) -> Column:
    """Canonical URL under the module-docstring rules; NULL if unparseable."""
    url = F.col(url) if isinstance(url, str) else url
    proto = url_scheme(url)

    auth = F.regexp_replace(F.lower(_part(url, "AUTHORITY")), r"^.*@", "")
    auth = F.when(proto == "http", F.regexp_replace(auth, r":80$", "")) \
            .when(proto == "https", F.regexp_replace(auth, r":443$", "")) \
            .otherwise(auth)

    path = F.coalesce(_part(url, "PATH"), F.lit(""))
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", "$1")      # trailing /, root kept
    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.split(F.coalesce(_part(url, "QUERY"), F.lit("")), "&")
    params = F.filter(params, lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qs = F.array_join(F.array_sort(params), "&")

    out = F.concat(proto, F.lit("://"), auth, path,
                   F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))
    return F.when(proto.isNull() | (auth == ""), F.lit(None).cast("string")) \
            .otherwise(out)


def extract_hrefs(html: Column | str) -> Column:
    """All ``href`` attribute values in the markup — pure column algebra
    (``regexp_extract_all``), no UDF, no parser. Case-insensitive
    attribute name, optional whitespace around ``=``; the attribute must
    not be a suffix of another name (``data-href`` does not match), and
    each value is delimited by its OWN quote style, so a double-quoted
    URL containing ``'`` survives intact. Two scans (one per quote
    style, RE2-safe — no backreferences, so the DuckDB oracle replays
    the identical patterns): document order holds within each style,
    double-quoted values listed first. Known limit: back-to-back
    attributes with no separator (``href="a"href="b"``) only yield the
    first — the boundary char is consumed by the prior match. Relative
    and non-URL targets come back verbatim; ``url_normalize`` maps them
    to NULL downstream (the dirt route) — link-graph callers filter on
    that."""
    html = F.col(html) if isinstance(html, str) else html
    dq = F.regexp_extract_all(
        html, F.lit(r'''(?i)(?:^|[^\w-])href\s*=\s*"([^"]*)"'''), 1)
    sq = F.regexp_extract_all(
        html, F.lit(r"""(?i)(?:^|[^\w-])href\s*=\s*'([^']*)'"""), 1)
    return F.concat(dq, sq)


def extract_anchor_pairs(html: Column | str) -> Column:
    """``array<struct<href,anchor>>`` — every ``<a ...href=...>text</a>``
    with its plain-texted anchor (inner tags stripped, whitespace
    collapsed/trimmed). Pure column algebra: one ``regexp_extract_all``
    over whole anchor elements, then per-element ``regexp_extract`` inside
    ``transform`` — no UDF. Anchors whose href uses either quote style
    match; elements without a quoted href yield href '' (callers filter
    via ``url_normalize`` NULL). The anchor text is the classic target-
    side relevance signal (what the web calls the page, not what the page
    calls itself)."""
    html = F.col(html) if isinstance(html, str) else html
    tags = F.regexp_extract_all(
        html, F.lit(r"(?is)<a\b[^>]*>.*?</a>"), 0)

    def pair(t: Column) -> Column:
        # same attribute boundary as extract_hrefs: data-href/xhref
        # must not masquerade as the real href
        dq = F.regexp_extract(
            t, r'(?i)(?:^|[^\w-])href\s*=\s*"([^"]*)"', 1)
        sq = F.regexp_extract(
            t, r"(?i)(?:^|[^\w-])href\s*=\s*'([^']*)'", 1)
        inner = F.regexp_extract(t, r"(?is)>(.*)</a>$", 1)
        anchor = F.trim(F.regexp_replace(F.regexp_replace(
            inner, r"(?s)<[^>]*>", " "), r"\s+", " "))
        return F.struct(
            F.when(dq != "", dq).otherwise(sq).alias("href"),
            anchor.alias("anchor"))

    return F.transform(tags, pair)


def registered_domain(host: Column | str) -> Column:
    """eTLD+1 under the bundled mini-PSL: ``a.b.co.uk`` -> ``b.co.uk``,
    ``a.b.com`` -> ``b.com``; hosts with one label (or NULL) pass through.
    """
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), F.element_at(labels, -2),
                        F.element_at(labels, -1))
    suffixes = F.array(*[F.lit(s) for s in TWO_LEVEL_SUFFIXES])
    return (
        F.when(host.isNull() | (n <= 1), host)
         .when((n >= 3) & F.array_contains(suffixes, last2), last3)
         .otherwise(last2)
    )
