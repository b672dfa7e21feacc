"""OpenIE-style SVO triple extraction over extracted page text.

Pattern-based (deterministic, lexicon-driven) subject-verb-object span
extraction: within each line, a sentence is bounded by start-of-line or a
period+whitespace; a triple is emitted per predicate-lexicon verb with the
non-greedy spans on either side. This restates the reference's
field-reference edge semantics (``nl_graph_schema.py:253-467`` — fixed
relation vocabulary, source span -> target span) and its citation triples
over free text (``academic_citation_toolkit.py:545-665``) as a text-level
extractor.

Runs on the Python ``re`` engine inside an Arrow-batched pandas UDF
(per input_hint: vectorized pandas/Arrow UDFs, no per-row Python UDFs).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
)

# Relation vocabulary: the reference's edge-relation verbs (SURVEY §2 /
# nl_graph_schema edge defs) — configurable per deployment.
DEFAULT_PREDICATES: tuple[str, ...] = (
    "uses", "extends", "replaces", "stores", "embeds", "indexes",
    "links", "cites", "defines", "calls", "imports", "mentions",
)

RAW_TRIPLE = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("start_char", IntegerType(), True),
    StructField("confidence", DoubleType(), True),
])


def _pattern(predicates: tuple[str, ...]) -> re.Pattern:
    alt = "|".join(re.escape(p) for p in predicates)
    # subject: from line start or after '.'+space, non-greedy, same line,
    # never crossing a sentence boundary ('.' + whitespace) — a '.' is only
    # allowed inside the span when followed by a non-space (H.A.D.E.S.);
    # object: non-greedy up to a '.' followed by whitespace or line end.
    return re.compile(
        rf"(?:^|(?<=\.)\s+)((?:[^.\n]|\.(?=\S))+?)\.?\s+({alt})\s+(\S[^\n]*?)\.(?=\s|$)",
        re.MULTILINE,
    )


_DEFAULT_RE = _pattern(DEFAULT_PREDICATES)


def extract_triples(text: str, pattern: re.Pattern = _DEFAULT_RE) -> list[dict]:
    """All (subj, pred, obj) span matches in one document's text."""
    out = []
    for m in pattern.finditer(text or ""):
        subj = m.group(1).strip().strip(".").strip()
        obj = m.group(3).strip()
        # drop degenerate spans (pure numbers, single chars)
        if len(subj) < 2 or len(obj) < 2:
            continue
        # confidence: 1.0 for short clean spans, decays with span length
        conf = max(0.5, 1.0 - 0.01 * max(0, len(subj) + len(obj) - 40))
        out.append({
            "subj": subj,
            "pred": m.group(2),
            "obj": obj,
            "start_char": m.start(1),
            "confidence": round(conf, 4),
        })
    return out


@F.pandas_udf(ArrayType(RAW_TRIPLE))
def extract_triples_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(lambda t: extract_triples(t))


def raw_triples(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages -> one row per extracted (surface) triple, with provenance url.

    Narrow transform (UDF inside the scan stage) followed by explode — no
    shuffle until someone aggregates downstream.
    """
    return (
        pages
        .select("url", F.explode(extract_triples_udf(F.col(text_col))).alias("t"))
        .select("url", "t.subj", "t.pred", "t.obj", "t.start_char", "t.confidence")
    )
