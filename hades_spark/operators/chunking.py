"""Document chunking — token windows with overlap, as a pandas UDF.

Restates the reference's chunking strategies
(``core/processors/text/chunking_strategies.py``: token ``:109-238``,
sliding-window ``:478-601``) as a vectorized UDF returning
``array<struct>`` rows that are ``posexplode``d into the ``chunks`` table.
This is intra-document windowing (W4 in SURVEY §2.5) — per-row generation,
NOT a SQL window.

Tokens are whitespace runs; character offsets are tracked so ``start_char``
/ ``end_char`` slice the original text exactly (the reference's span
contract, ``schemas.py:95-148``). Chunk keys follow ``keys.py:36-46``:
``{doc_id}_chunk_{i}``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from ..functions.keys import chunk_key_col

_TOKEN = re.compile(r"\S+")

CHUNK_SPAN = StructType([
    StructField("text", StringType(), False),
    StructField("start_char", IntegerType(), False),
    StructField("end_char", IntegerType(), False),
])


def chunk_text(text: str, chunk_size: int = 500, overlap: int = 200) -> list[dict]:
    """Split text into token windows of ``chunk_size`` tokens advancing by
    ``chunk_size - overlap``; spans cover the original characters of the
    first..last token of each window. Deterministic; last partial window
    is kept (remainder rule)."""
    if not text or chunk_size <= 0:
        return []
    if overlap >= chunk_size:
        overlap = chunk_size - 1
    spans = [(m.start(), m.end()) for m in _TOKEN.finditer(text)]
    if not spans:
        return []
    step = chunk_size - overlap
    out = []
    i = 0
    while i < len(spans):
        window = spans[i: i + chunk_size]
        s, e = window[0][0], window[-1][1]
        out.append({"text": text[s:e], "start_char": s, "end_char": e})
        if i + chunk_size >= len(spans):
            break
        i += step
    return out


def make_chunk_udf(chunk_size: int, overlap: int):
    @F.pandas_udf(ArrayType(CHUNK_SPAN))
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: chunk_text(t or "", chunk_size, overlap))
    return _udf


def chunks_table(docs: DataFrame, doc_id_col: str = "doc_id",
                 text_col: str = "text",
                 chunk_size: int = 500, overlap: int = 200) -> DataFrame:
    """documents -> chunks(doc_id, chunk_index, chunk_id, text, spans,
    total_chunks). One narrow UDF + posexplode; total_chunks comes from the
    array size (no second pass / no window shuffle)."""
    udf = make_chunk_udf(chunk_size, overlap)
    with_arr = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        udf(F.col(text_col)).alias("_chunks"),
    ).withColumn("total_chunks", F.size("_chunks"))
    return (
        with_arr
        .select("doc_id", "total_chunks",
                F.posexplode("_chunks").alias("chunk_index", "c"))
        .select(
            "doc_id",
            F.col("chunk_index").cast("int").alias("chunk_index"),
            chunk_key_col(F.col("doc_id"), F.col("chunk_index")).alias("chunk_id"),
            F.col("c.text").alias("text"),
            F.col("c.start_char").alias("start_char"),
            F.col("c.end_char").alias("end_char"),
            F.col("total_chunks").cast("int").alias("total_chunks"),
        )
    )
