"""Canonical key normalization — the reference's identity layer as pure
string rules, provided both as plain Python (for UDF internals / tests) and
as Spark Column expressions (JVM-side, codegen-friendly — the hot path).

Semantics per ``/root/reference/core/database/keys.py:15-87`` and
``core/analyzers/python_edge_resolver.py:28-47``; edge content-hash keys per
``core/cli/commands/codebase.py:240-248`` and the composite dedup key of
``core/database/nl_graph_materialize.py:175-184``.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_VERSION_SUFFIX = re.compile(r"v\d+$")


# --- pure python ------------------------------------------------------------

def normalize_document_key(raw_id: str) -> str:
    """Strip a trailing ``v<digits>`` version suffix; '.'/'/' -> '_'."""
    return _VERSION_SUFFIX.sub("", raw_id).replace(".", "_").replace("/", "_")


def chunk_key(document_key: str, chunk_index: int) -> str:
    return f"{document_key}_chunk_{chunk_index}"


def embedding_key(chunk_key_value: str) -> str:
    return f"{chunk_key_value}_emb"


def file_key(rel_path: str) -> str:
    return rel_path.replace("/", "_").replace(".", "_")


def strip_version(raw_id: str) -> str:
    return _VERSION_SUFFIX.sub("", raw_id)


def symbol_key(file_rel_path: str, qualified_name: str) -> str:
    """File-scoped symbol key: sanitize name, collapse 3+ underscores to 2."""
    safe = qualified_name.replace(".", "_")
    safe = re.sub(r"[^a-zA-Z0-9_]", "_", safe)
    safe = re.sub(r"_{3,}", "__", safe).strip("_")
    return f"{file_key(file_rel_path)}__{safe}"


def edge_content_key(src: str, dst: str, rel: str) -> str:
    """sha256 content-hash edge key (stable, idempotent upserts)."""
    return hashlib.sha256(f"{src}|{dst}|{rel}".encode()).hexdigest()


_ARXIV_YYMM = re.compile(r"^(\d{2})(\d{2})\.")


def arxiv_year_month(arxiv_id: str) -> tuple[int, int] | None:
    """Year/month from a modern ``YYMM.NNNNN`` arXiv id
    (``sync.py:617-625`` semantics): 2301.12345 -> (2023, 1)."""
    m = _ARXIV_YYMM.match(arxiv_id or "")
    if not m:
        return None
    yy, mm = int(m.group(1)), int(m.group(2))
    if not 1 <= mm <= 12:
        return None
    return 2000 + yy, mm


# --- Spark column expressions (JVM-side; stay in whole-stage codegen) -------

def normalize_document_key_col(c: Column) -> Column:
    return F.translate(F.regexp_replace(c, r"v\d+$", ""), "./", "__")


def chunk_key_col(doc_key: Column, chunk_index: Column) -> Column:
    return F.concat_ws("_chunk_", doc_key, chunk_index.cast("string"))


def embedding_key_col(chunk_key_c: Column) -> Column:
    return F.concat(chunk_key_c, F.lit("_emb"))


def file_key_col(c: Column) -> Column:
    return F.translate(c, "/.", "__")


def symbol_key_col(file_rel_path: Column, qualified_name: Column) -> Column:
    safe = F.regexp_replace(qualified_name, r"\.", "_")
    safe = F.regexp_replace(safe, r"[^a-zA-Z0-9_]", "_")
    safe = F.regexp_replace(safe, r"_{3,}", "__")
    safe = F.regexp_replace(safe, r"^_+|_+$", "")
    return F.concat(file_key_col(file_rel_path), F.lit("__"), safe)


def edge_content_key_col(src: Column, dst: Column, rel: Column) -> Column:
    return F.sha2(F.concat_ws("|", src, dst, rel), 256)


def composite_dedup_key_col(src: Column, dst: Column) -> Column:
    """``{from}__{to}`` with '/' -> '_' — the materializer's dedup key."""
    return F.concat_ws(
        "__", F.translate(src, "/", "_"), F.translate(dst, "/", "_")
    )
