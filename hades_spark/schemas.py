"""Fixed StructType schemas for every table in the pipeline.

Explicit schemas everywhere (never inferred), one ``map<string,string>``
escape hatch per table — mirroring the reference's dataclass layer
(``core/database/schemas.py:37-203``) restated columnar. The ``pages``
shape is the authoritative input contract from BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STR = StringType()
META = MapType(StringType(), StringType())

# Input: Common-Crawl-style web pages (BASELINE.json input_hint).
PAGES = StructType([
    StructField("url", STR, False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", STR, True),
    StructField("lang", STR, True),
])

DOCUMENTS = StructType([
    StructField("doc_id", STR, False),
    StructField("url", STR, True),
    StructField("title", STR, True),
    StructField("authors", ArrayType(STR), True),
    StructField("source_type", STR, True),
    StructField("source_metadata", META, True),
    StructField("created_at", TimestampType(), True),
])

CHUNKS = StructType([
    StructField("doc_id", STR, False),
    StructField("chunk_index", IntegerType(), False),
    StructField("chunk_id", STR, False),
    StructField("text", STR, True),
    StructField("start_char", IntegerType(), True),
    StructField("end_char", IntegerType(), True),
    StructField("total_chunks", IntegerType(), True),
])

EMBEDDINGS = StructType([
    StructField("doc_id", STR, False),
    StructField("chunk_index", IntegerType(), False),
    StructField("embedding_id", STR, False),
    StructField("embedding", ArrayType(FloatType()), True),
    StructField("model", STR, True),
])

# Detected spans: links / code / tables / citations / entities.
MENTION = StructType([
    StructField("surface", STR, True),
    StructField("kind", STR, False),
    StructField("start_char", IntegerType(), True),
    StructField("end_char", IntegerType(), True),
    StructField("attrs", META, True),
    StructField("confidence", DoubleType(), True),
])

MENTIONS = StructType(
    [StructField("url", STR, False), StructField("mention_id", STR, False)]
    + list(MENTION.fields)
)

TRIPLES = StructType([
    StructField("subj", STR, False),
    StructField("pred", STR, False),
    StructField("obj", STR, False),
    StructField("url", STR, True),
    StructField("edge_key", STR, False),
    StructField("confidence", DoubleType(), True),
    StructField("chain_position", IntegerType(), True),
])

NODES = StructType([
    StructField("node_id", STR, False),
    StructField("node_type", STR, False),
    StructField("surface", STR, True),
    StructField("canonical_id", STR, True),
    StructField("props", META, True),
])

MANIFEST = StructType([
    StructField("stage", STR, False),
    StructField("partition_id", IntegerType(), False),
    StructField("status", STR, False),
    StructField("rows_out", LongType(), True),
    StructField("error", STR, True),
    StructField("run_id", STR, False),
    StructField("ts", TimestampType(), True),
])

METRICS = StructType([
    StructField("run_id", STR, False),
    StructField("stage", STR, False),
    StructField("rows_in", LongType(), True),
    StructField("rows_out", LongType(), True),
    StructField("duration_sec", DoubleType(), True),
    StructField("extra", META, True),
])
