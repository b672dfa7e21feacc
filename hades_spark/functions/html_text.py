"""Deterministic HTML -> plain-text extraction (the byte-identical invariant).

Semantics match the reference extractor exactly
(``/root/reference/core/extractors/extractors_markdown.py:619-697`` —
``_html_to_plain_text`` / ``_unescape_html``, and the utf-8 -> latin-1 decode
ladder at ``:80-91``). The transformation MUST run on the Python ``re``
engine inside an Arrow-batched pandas UDF — Spark SQL's Java regex differs
on unicode case folding, DOTALL interplay and ``\\Z``, so translating these
rewrites to ``regexp_replace`` columns would silently break the per-url
byte-identical contract.

The rewrite order is load-bearing:
  1. drop <script>/<style> subtrees,
  2. block-level closing tags -> newlines,
  3. strip every remaining tag,
  4. entity unescape (named table in fixed order, then numeric with U+FFFD
     fallback for out-of-range codepoints),
  5. whitespace normalisation ([ \\t]+ -> single space, 3+ newlines -> 2),
  6. strip.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# --- compiled once per executor process ------------------------------------

_RE_SCRIPT = re.compile(r"<script[^>]*>.*?</script>", re.DOTALL | re.IGNORECASE)
_RE_STYLE = re.compile(r"<style[^>]*>.*?</style>", re.DOTALL | re.IGNORECASE)
_RE_BR = re.compile(r"<br[^>]*>", re.IGNORECASE)
_RE_P_CLOSE = re.compile(r"</p>", re.IGNORECASE)
_RE_DIV_CLOSE = re.compile(r"</div>", re.IGNORECASE)
_RE_H_CLOSE = re.compile(r"</h[1-6]>", re.IGNORECASE)
_RE_LI_CLOSE = re.compile(r"</li>", re.IGNORECASE)
_RE_TR_CLOSE = re.compile(r"</tr>", re.IGNORECASE)
_RE_ANY_TAG = re.compile(r"<[^>]+>")
_RE_SPACES = re.compile(r"[ \t]+")
_RE_MANY_NL = re.compile(r"\n{3,}")
_RE_DEC_ENTITY = re.compile(r"&#(\d+);")
_RE_HEX_ENTITY = re.compile(r"&#x([0-9a-fA-F]+);")

# Ordered named-entity table. Order matters: '&amp;' is replaced AFTER the
# entities whose names it could produce, so '&amp;lt;' ends up as literal
# '&lt;' text — matching the reference behavior exactly.
_NAMED_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
)


def _safe_chr(codepoint: int) -> str:
    """chr() with the reference's U+FFFD fallback for invalid codepoints."""
    try:
        return chr(codepoint)
    except (ValueError, OverflowError):
        return "�"


def unescape_html(text: str) -> str:
    """Resolve the fixed named-entity table, then numeric entities."""
    for entity, char in _NAMED_ENTITIES:
        text = text.replace(entity, char)
    text = _RE_DEC_ENTITY.sub(lambda m: _safe_chr(int(m.group(1))), text)
    text = _RE_HEX_ENTITY.sub(lambda m: _safe_chr(int(m.group(1), 16)), text)
    return text


def html_to_text(content: str) -> str:
    """Convert an HTML document to plain text. Pure, deterministic."""
    text = _RE_SCRIPT.sub("", content)
    text = _RE_STYLE.sub("", text)

    text = _RE_BR.sub("\n", text)
    text = _RE_P_CLOSE.sub("\n\n", text)
    text = _RE_DIV_CLOSE.sub("\n", text)
    text = _RE_H_CLOSE.sub("\n\n", text)
    text = _RE_LI_CLOSE.sub("\n", text)
    text = _RE_TR_CLOSE.sub("\n", text)

    text = _RE_ANY_TAG.sub("", text)
    text = unescape_html(text)

    text = _RE_SPACES.sub(" ", text)
    text = _RE_MANY_NL.sub("\n\n", text)
    return text.strip()


def decode_html_bytes(raw: bytes | bytearray | None) -> str:
    """Decode raw page bytes: utf-8 first, latin-1 fallback (never fails)."""
    if raw is None:
        return ""
    try:
        return bytes(raw).decode("utf-8")
    except UnicodeDecodeError:
        return bytes(raw).decode("latin-1")


def extract_text_from_html_bytes(raw: bytes | None) -> str:
    """decode + html_to_text, the full per-row invariant function."""
    return html_to_text(decode_html_bytes(raw))


# --- Spark bindings ---------------------------------------------------------

@F.pandas_udf(StringType())
def html_to_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched pandas UDF over an ``html: binary`` (or string) column."""
    for s in batches:
        yield s.map(
            lambda v: extract_text_from_html_bytes(v)
            if isinstance(v, (bytes, bytearray)) or v is None
            else html_to_text(v)
        )


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """pages -> pages + deterministic extracted text column.

    Narrow (no shuffle): the UDF runs inside the scan stage, so at 100 TB
    this parallelizes to however many input splits the table has.
    """
    return df.withColumn(out_col, html_to_text_udf(F.col(html_col)))
