"""PII redaction — the scrubbing pass every distributable web corpus runs
before training (emails, phone numbers, IP addresses → typed placeholder
tokens), as pure JVM column expressions.

Patterns are deliberately restricted to the regex subset with IDENTICAL
semantics in Java's engine (Spark) and RE2 (DuckDB, and Go/C++ scrubbers):
character classes, bounded repetition, word boundaries — no lookarounds,
no backreferences. That keeps the DuckDB oracle a true independent
re-derivation and means the same pattern strings port to any downstream
audit tooling. Redaction order is fixed (email → ipv4 → phone) and
documented because the classes can overlap on digit runs; both engines
apply the same order.

Recall/precision posture: these are the standard corpus-scrubbing shapes
(C4/Dolma-style), not a compliance guarantee — a real deployment layers a
learned NER pass for names/addresses on top. The seam is the same column:
``redact_pii`` composes.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"(\b\d{3}|\+\d{3})[-.]\d{3}[-.]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> Column:
    """struct<n_emails, n_ips, n_phones> of match counts (pre-redaction,
    on the raw text — counts and redaction agree because the patterns are
    applied to the same input in the same order)."""
    c = _c(col)
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN),
                       F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(
            F.regexp_replace(F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN),
                             IPV4_RE, IPV4_TOKEN),
            F.lit(PHONE_RE)).alias("n_phones"),
    )


def redact_pii(col: Column | str) -> Column:
    """Text with emails, then IPv4s, then phone numbers replaced by typed
    tokens. Order matters (an email's host can contain digit runs; an
    IPv4 would otherwise part-match the phone pattern) — counts use the
    same staging so the two always agree."""
    c = _c(col)
    step = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    step = F.regexp_replace(step, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(step, PHONE_RE, PHONE_TOKEN)
