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


_RE_PARA = re.compile(r"\n\n+")
_RE_SENT = re.compile(r"(?<=[.!?])\s+")
_RE_HSPACE = re.compile(r"[ \t]+")


def clean_text(text: str) -> str:
    """Whitespace normalization for chunking. DOCUMENTED DEVIATION from the
    reference's ``_clean_text`` (``chunking_strategies.py:96-106``): the
    reference collapses ALL whitespace (including newlines), which erases
    the very paragraph boundaries its semantic splitter then looks for —
    we collapse only horizontal whitespace so paragraph splitting works as
    the strategy's contract describes."""
    text = _RE_HSPACE.sub(" ", text.replace("\x00", ""))
    return text.strip()


def split_paragraphs(text: str) -> list[str]:
    return [p.strip() for p in _RE_PARA.split(text) if p.strip()]


def split_sentences(text: str) -> list[str]:
    return [s.strip() for s in _RE_SENT.split(text) if s.strip()]


def semantic_chunks(
    text: str,
    max_chunk_size: int = 1500,
    min_chunk_size: int = 100,
    respect_sentences: bool = True,
) -> list[dict]:
    """Structure-respecting chunking (``chunking_strategies.py:241-475``
    semantics): accumulate paragraphs up to ``max_chunk_size`` tokens;
    oversized paragraphs split at sentence boundaries (or token-forced);
    undersized trailing chunks merge back into the previous chunk when the
    merge stays under the cap. Char offsets are cumulative estimates, as in
    the reference."""
    text = clean_text(text)
    if not text:
        return []
    out: list[dict] = []
    cur = ""
    pos = 0

    def flush():
        nonlocal cur, pos
        if not cur:
            return
        if len(cur.split()) < min_chunk_size and out:
            merged = out[-1]["text"] + "\n\n" + cur
            if len(merged.split()) <= max_chunk_size:
                out[-1] = {"text": merged, "start_char": out[-1]["start_char"],
                           "end_char": out[-1]["start_char"] + len(merged)}
                pos += len(cur) + 1
                cur = ""
                return
        out.append({"text": cur, "start_char": pos,
                    "end_char": pos + len(cur)})
        pos += len(cur) + 1
        cur = ""

    for para in split_paragraphs(text):
        p_tokens = len(para.split())
        if p_tokens > max_chunk_size:
            flush()
            pieces = (split_sentences(para) if respect_sentences
                      else [para])
            for piece in pieces:
                words = piece.split()
                if len(words) > max_chunk_size:
                    flush()
                    for i in range(0, len(words), max_chunk_size):
                        cur = " ".join(words[i: i + max_chunk_size])
                        flush()
                elif len(cur.split()) + len(words) > max_chunk_size:
                    flush()
                    cur = piece
                else:
                    cur = (cur + " " + piece).strip()
        elif len(cur.split()) + p_tokens <= max_chunk_size:
            cur = (cur + "\n\n" + para).strip()
        else:
            flush()
            cur = para
    flush()
    return out


def hybrid_chunks(
    text: str,
    max_chunk_size: int = 1500,
    min_chunk_size: int = 100,
    min_overlap_tokens: int = 50,
    respect_sentences: bool = True,
) -> list[dict]:
    """Semantic boundaries + guaranteed overlap
    (``chunking_strategies.py:604-757``): chunk semantically, then prepend
    the last ``min_overlap_tokens`` tokens of each previous chunk so no
    boundary loses context."""
    if min_overlap_tokens < 0:
        raise ValueError("min_overlap_tokens must be non-negative")
    base = semantic_chunks(text, max_chunk_size, min_chunk_size,
                           respect_sentences)
    if len(base) <= 1 or min_overlap_tokens == 0:
        return base
    out = [base[0]]
    for prev, chunk in zip(base, base[1:]):
        tail = " ".join(prev["text"].split()[-min_overlap_tokens:])
        out.append({
            "text": (tail + " " + chunk["text"]).strip(),
            # span still points at the chunk's own content; the prepended
            # overlap is context, not provenance
            "start_char": chunk["start_char"],
            "end_char": chunk["end_char"],
        })
    return out


def make_chunk_udf(chunk_size: int, overlap: int):
    @F.pandas_udf(ArrayType(CHUNK_SPAN))
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: chunk_text(t or "", chunk_size, overlap))
    return _udf


def make_strategy_udf(strategy: str, **kw):
    """Chunker UDF for any strategy: token (windowed), semantic
    (boundary-respecting), hybrid (semantic + guaranteed overlap)."""
    if strategy == "token":
        return make_chunk_udf(kw.get("chunk_size", 500),
                              kw.get("overlap", 200))
    if strategy == "semantic":
        fn = lambda t: semantic_chunks(  # noqa: E731
            t or "", kw.get("max_chunk_size", 1500),
            kw.get("min_chunk_size", 100),
            kw.get("respect_sentences", True))
    elif strategy == "hybrid":
        fn = lambda t: hybrid_chunks(  # noqa: E731
            t or "", kw.get("max_chunk_size", 1500),
            kw.get("min_chunk_size", 100),
            kw.get("min_overlap_tokens", 50),
            kw.get("respect_sentences", True))
    else:
        raise ValueError(f"unknown chunking strategy: {strategy}")

    @F.pandas_udf(ArrayType(CHUNK_SPAN))
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(fn)
    return _udf


def chunks_table(docs: DataFrame, doc_id_col: str = "doc_id",
                 text_col: str = "text",
                 chunk_size: int = 500, overlap: int = 200,
                 strategy: str = "token", **strategy_kw) -> DataFrame:
    """documents -> chunks(doc_id, chunk_index, chunk_id, text, spans,
    total_chunks). One narrow UDF + posexplode; total_chunks comes from the
    array size (no second pass / no window shuffle)."""
    if strategy == "token":
        udf = make_chunk_udf(chunk_size, overlap)
    else:
        udf = make_strategy_udf(strategy, **strategy_kw)
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


def cdc_chunks(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    target: int = 8,
    seed: int = 0,
):
    """Content-defined chunking at token granularity — boundaries where
    the rolling window's hash lands in a 1/``target`` band (the
    gear/Rabin device of dedup storage, restated over tokens): a cut
    falls AFTER token ``j`` when ``pmod(xxhash64(tokens[j-w+1..j]),
    target) == 0``. Unlike fixed-size chunking, an insertion near the
    head only moves boundaries until the window re-synchronizes, so
    downstream exact/near dedup keeps matching the unchanged tail —
    the property fixed windows structurally lack.

    Returns one row per chunk: ``id_col, chunk_idx, chunk_text,
    n_tokens``; expected chunk length ≈ ``target`` tokens (geometric).
    Empty/NULL docs yield no rows (no tokens, no chunks).

    Plan: per-doc gram hashes via the transform/slice device (no UDF),
    ONE doc-partitioned window for the running cut count (width = doc
    token count, bounded by doc length, not corpus size), one
    combinable groupBy to assemble. The 10^12-doc shuffle keys on the
    doc id — uniform.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    if window < 1 or target < 1:
        raise ValueError("window and target must be >= 1")
    kid = F.col(id_col)
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "")
    toks = df.select(kid.alias("_id"), words.alias("_w")).select(
        "_id", F.posexplode("_w").alias("_pos", "_tok"),
        F.col("_w").alias("_all"))
    # hash of the window ENDING at _pos (only defined once _pos >= w-1)
    # start clamped to 1: rows with _pos < window-1 never pass the cut
    # guard, but the slice must be safe BY CONSTRUCTION (a 0/negative
    # start is a runtime error / from-the-end slice if any evaluation
    # order change reaches it)
    gram = F.array_join(
        F.slice("_all",
                F.greatest(F.lit(1), F.col("_pos") - (window - 2)),
                window), " ")
    cut = F.when(
        (F.col("_pos") >= window - 1)
        & (F.pmod(F.xxhash64(gram, F.lit(seed)), F.lit(target)) == 0), 1
    ).otherwise(0)
    marked = toks.select("_id", "_pos", "_tok", cut.alias("_cut"))
    prev_cuts = F.sum("_cut").over(
        W.partitionBy("_id").orderBy("_pos")
         .rowsBetween(W.unboundedPreceding, -1))
    assigned = marked.select(
        "_id", "_pos", "_tok",
        F.coalesce(prev_cuts, F.lit(0)).alias("chunk_idx"))
    return (
        assigned.groupBy("_id", "chunk_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("_pos"), F.col("_tok")))),
                    lambda s: s["_tok"]),
                " ").alias("chunk_text"),
            F.count("*").alias("n_tokens"))
        .select(F.col("_id").alias(id_col), "chunk_idx", "chunk_text",
                "n_tokens")
    )
