"""WARC (ISO 28500) container source — the Common-Crawl ingest front door.

The north-rule input is "an Iceberg table of Common-Crawl-style web pages";
this module is the step BEFORE that table exists: raw ``.warc`` /
``.warc.gz`` crawl files to ``(url, warc_ts, html, text, lang)`` rows in
the ``schemas.PAGES`` contract. The reference ingests pre-extracted
documents only (no crawl-container reader); at 100 TB the crawl archive IS
the source format, so the engine needs one.

Scale shape:

- **Per-file parallelism.** A Common-Crawl snapshot is ~90k WARC files of
  ~1 GiB each; one file per task is the standard CC processing granularity
  (records inside a file are sequential by format — member-gzip has no
  random access without an external index). ``warc_records_df`` reads
  files with the ``binaryFile`` source and parses each inside
  ``mapInPandas``, so 90k files fan out across the cluster while each
  parse stays a single linear pass.
- **Tolerant, never-raising parser.** Crawl archives contain truncated
  records, bad Content-Lengths, and mid-file garbage; ``iter_warc_records``
  skips to the next record boundary instead of failing the task (same
  policy as textcore/pdf.py — a 100-TB ingest cannot die on one bad
  record). Malformed records are simply absent from the output.
- **Gzip handling.** Both plain and gzipped files, including the
  multi-member per-record gzip real WARCs use (``gzip.decompress``
  consumes concatenated members). Decompression is whole-file within the
  task — the right trade at CC file sizes given per-file task granularity.

``make_warc_bytes`` writes spec-shaped fixtures (tests + the
``src_warc_ingest`` oracle query build their archives with it and parse
them back — the writer and parser are independent code paths).
"""

from __future__ import annotations

import datetime as dt
import gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                               StructField, StructType, TimestampType)

GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: str) -> dict[str, str]:
    """Header lines to a lowercase-keyed dict; RFC-822 continuation lines
    (leading whitespace) fold into the previous value."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split("\r\n"):
        if not line:
            continue
        if line[0] in " \t" and last is not None:
            headers[last] += " " + line.strip()
            continue
        if ":" not in line:
            continue
        k, _, v = line.partition(":")
        last = k.strip().lower()
        headers[last] = v.strip()
    return headers


def _gunzip_tolerant(raw: bytes) -> bytes:
    """Decompress member-by-member, keeping every member that decodes —
    a truncated/corrupt TRAILING member must not discard the thousands of
    intact records before it in a ~1 GiB crawl file (``gzip.decompress``
    would raise and lose the whole file)."""
    import zlib

    out, pos, n = [], 0, len(raw)
    while pos < n and raw[pos:pos + 2] == GZIP_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(raw[pos:]) + d.flush()
        except Exception:
            break                                    # corrupt member
        out.append(chunk)
        if not d.eof:
            break                                    # truncated member
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:                            # pragma: no cover
            break
        pos += consumed
    return b"".join(out)


def iter_warc_records(raw: bytes):
    """Yield ``{"version", "headers", "payload"}`` per well-formed record.

    Tolerant: decompresses gzip (multi-member included) transparently,
    skips garbage by scanning to the next ``WARC/`` boundary, drops
    records with unparseable/over-long Content-Length, and stops silently
    at truncation. Never raises on malformed input.
    """
    if raw[:2] == GZIP_MAGIC:
        raw = _gunzip_tolerant(raw)
    pos, n = 0, len(raw)
    while pos < n:
        start = raw.find(b"WARC/", pos)
        if start < 0:
            return
        header_end = raw.find(_CRLF2, start)
        if header_end < 0:
            return                                   # truncated head
        try:
            head = raw[start:header_end].decode("latin-1")
        except Exception:                            # pragma: no cover
            pos = header_end + 4
            continue
        lines = head.split("\r\n", 1)
        version = lines[0].strip()
        headers = _parse_headers(lines[1] if len(lines) > 1 else "")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = header_end + 4                     # bad length: resync
            continue
        body_start = header_end + 4
        if length < 0 or body_start + length > n:
            return                                   # truncated payload
        yield {"version": version, "headers": headers,
               "payload": raw[body_start:body_start + length]}
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer coding; returns what decoded
    cleanly (prefix) on malformed input — never raises."""
    out, pos, n = [], 0, len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break                                    # terminal chunk
        start = eol + 2
        if start + size > n:
            out.append(body[start:])                 # truncated chunk
            break
        out.append(body[start:start + size])
        pos = start + size + 2                       # skip trailing CRLF
    return b"".join(out)


def split_http_response(payload: bytes):
    """``(status, headers, body)`` from an ``application/http`` payload;
    ``(None, {}, payload)`` when it isn't an HTTP response message.

    Real-crawl message codings are undone here so downstream always sees
    the entity bytes: ``Transfer-Encoding: chunked`` is dechunked and
    ``Content-Encoding: gzip``/``x-gzip``/``deflate`` decompressed (both
    tolerant — malformed codings fall back to the raw body rather than
    failing the record)."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    sep = payload.find(_CRLF2)
    if sep < 0:
        return None, {}, payload
    head = payload[:sep].decode("latin-1", errors="replace")
    first, _, rest = head.partition("\r\n")
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, payload
    headers = _parse_headers(rest)
    body = payload[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except Exception:
            pass                                     # keep raw body
    elif enc == "deflate":
        import zlib
        try:                                         # zlib- or raw-deflate
            body = zlib.decompress(body)
        except Exception:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except Exception:
                pass
    return status, headers, body


def parse_warc_date(s: str | None):
    """``WARC-Date`` (ISO 8601 Zulu, optional fractional seconds) to a
    naive UTC datetime; None when absent/invalid. Zone-less dirt values
    are treated as ALREADY UTC — ``astimezone`` on a naive datetime would
    read the executor's local zone, making the result cluster-layout-
    dependent."""
    if not s:
        return None
    try:
        d = dt.datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is None:
        return d
    return d.astimezone(dt.timezone.utc).replace(tzinfo=None)


def make_warc_bytes(records: list[dict], compress: str = "none") -> bytes:
    """Spec-shaped WARC file from ``{"warc_type", "url", "date", "payload",
    "headers"?}`` dicts. ``compress``: ``none`` | ``whole`` (one gzip
    stream) | ``member`` (per-record gzip members, the real-WARC layout).
    """
    if compress not in ("none", "whole", "member"):
        raise ValueError(f"unknown compress mode {compress!r}")
    out = []
    for i, r in enumerate(records):
        payload = r.get("payload", b"")
        headers = [
            ("WARC-Type", r.get("warc_type", "response")),
            ("WARC-Record-ID", f"<urn:uuid:fixture-{i:08d}>"),
            ("WARC-Date", r.get("date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if r.get("url"):
            headers.insert(2, ("WARC-Target-URI", r["url"]))
        headers.extend(r.get("headers", {}).items())
        head = "WARC/1.0\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in headers)
        rec = head.encode("latin-1") + b"\r\n" + payload + b"\r\n\r\n"
        out.append(gzip.compress(rec) if compress == "member" else rec)
    blob = b"".join(out)
    return gzip.compress(blob) if compress == "whole" else blob


def make_http_response(body: bytes, status: int = 200,
                       content_type: str = "text/html") -> bytes:
    """Minimal HTTP/1.1 response message wrapping ``body`` (fixtures)."""
    head = (f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n")
    return head.encode("latin-1") + body


WARC_RECORDS_SCHEMA = StructType([
    StructField("warc_file", StringType(), False),
    StructField("warc_type", StringType(), True),
    StructField("url", StringType(), True),
    StructField("warc_ts", TimestampType(), True),
    StructField("content_type", StringType(), True),
    StructField("http_status", IntegerType(), True),
    StructField("payload", BinaryType(), True),
])


def warc_records_df(spark: SparkSession, path: str) -> DataFrame:
    """All WARC records under ``path`` (glob ok), one row per record.

    ``payload`` is the raw record block; for ``application/http`` response
    records the HTTP message is split off — ``http_status`` filled,
    ``content_type`` taken from the HTTP headers, ``payload`` reduced to
    the entity body. Per-file tasks (see module docstring).
    """
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    h = rec["headers"]
                    wtype = h.get("warc-type")
                    ctype = h.get("content-type")
                    status, payload = None, rec["payload"]
                    if wtype == "response" and ctype and \
                            ctype.startswith("application/http"):
                        status, hh, body = split_http_response(payload)
                        if status is not None:
                            payload = body
                            ctype = hh.get("content-type", ctype)
                    rows.append((fpath, wtype, h.get("warc-target-uri"),
                                 parse_warc_date(h.get("warc-date")),
                                 ctype, status, payload))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORDS_SCHEMA])

    return files.mapInPandas(gen, WARC_RECORDS_SCHEMA)


def warc_pages_df(spark: SparkSession, path: str) -> DataFrame:
    """HTTP-200 response records as the ``schemas.PAGES`` input contract
    ``(url, warc_ts, html, text, lang)`` — text/lang NULL until the
    extraction stage fills them."""
    from pyspark.sql import functions as F

    from ..schemas import PAGES

    recs = warc_records_df(spark, path)
    pages = (
        recs.where((F.col("warc_type") == "response")
                   & (F.col("http_status") == 200)
                   & F.col("url").isNotNull())
        .select(F.col("url"), F.col("warc_ts"),
                F.col("payload").alias("html"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("string").alias("lang"))
    )
    assert [(f.name, f.dataType) for f in pages.schema] == \
           [(f.name, f.dataType) for f in PAGES], pages.schema
    return pages
